"""Bucketed co-located join property (100 TB layout): equal-bucketed
tables joined on their bucket key must plan WITHOUT an Exchange, and
must return the same rows as the plain shuffled join."""

import pytest
from pyspark.sql import functions as F

from etl_pipeline_from_mongo_json_to_postgre_spark.sources.parquet import load_table
from etl_pipeline_from_mongo_json_to_postgre_spark.storage import (
    join_is_shuffle_free,
    physical_plan,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    write_bucketed(
        orders.withColumnRenamed("o_orderkey", "orderkey"),
        "bkt_orders", ["orderkey"], n_buckets=8, sort_keys=["orderkey"],
    )
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "orderkey"),
        "bkt_lineitem", ["orderkey"], n_buckets=8, sort_keys=["orderkey"],
    )
    yield "bkt_orders", "bkt_lineitem"
    spark.sql("DROP TABLE IF EXISTS bkt_orders")
    spark.sql("DROP TABLE IF EXISTS bkt_lineitem")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    left, right = bucketed_tables
    # disable auto-broadcast so the test exercises the co-location path,
    # not a broadcast join that trivially has no shuffle
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        assert join_is_shuffle_free(spark, left, right, "orderkey")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_unbucketed_join_does_shuffle(spark, sf_dir):
    """Control: the same join over plain parquet plans an Exchange."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = load_table(spark, sf_dir, "orders")
        lineitem = load_table(spark, sf_dir, "lineitem")
        joined = lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        assert "Exchange" in physical_plan(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    left, right = bucketed_tables
    got = (
        spark.table(left).join(spark.table(right), "orderkey")
        .agg(F.count("*").alias("n"),
             F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q"))
        .collect()[0]
    )
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    want = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .agg(F.count("*").alias("n"),
             F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q"))
        .collect()[0]
    )
    assert (got["n"], got["q"]) == (want["n"], want["q"])


def test_cbo_join_reorder_with_stats(spark, sf_dir):
    """CBO + catalog stats must reorder a fact-first join graph so the
    big fact joins LAST (AQE cannot do this — it only re-plans
    strategies). Pin: without CBO the optimized plan keeps the
    syntactic fact-first order; with CBO + ANALYZE the fact moves
    behind the selective dim chain."""
    import re

    from etl_pipeline_from_mongo_json_to_postgre_spark.sources.parquet import (
        load_table,
    )
    from etl_pipeline_from_mongo_json_to_postgre_spark.storage import (
        analyze_tables,
    )

    tables = ["region", "nation", "customer", "supplier", "orders", "lineitem"]
    for t in tables:
        # DROP first: a stale warehouse dir from an interrupted run is
        # not reclaimable by mode("overwrite") when the catalog entry
        # is gone (LOCATION_ALREADY_EXISTS)
        spark.sql(f"DROP TABLE IF EXISTS cbo_{t}")
        import shutil
        shutil.rmtree(f"spark-warehouse/cbo_{t}", ignore_errors=True)
        load_table(spark, sf_dir, t).write.mode("overwrite").saveAsTable(
            f"cbo_{t}")
    analyze_tables(spark, [f"cbo_{t}" for t in tables])
    q = """
        SELECT n_name, count(*) AS n
        FROM cbo_lineitem
        JOIN cbo_orders   ON l_orderkey = o_orderkey
        JOIN cbo_customer ON o_custkey = c_custkey
        JOIN cbo_supplier ON l_suppkey = s_suppkey
                          AND c_nationkey = s_nationkey
        JOIN cbo_nation   ON s_nationkey = n_nationkey
        JOIN cbo_region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA' GROUP BY n_name
    """

    def first_table(cbo: bool) -> list[str]:
        spark.conf.set("spark.sql.cbo.enabled", str(cbo).lower())
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", str(cbo).lower())
        try:
            plan = spark.sql(q)._jdf.queryExecution().optimizedPlan().toString()
        finally:
            spark.conf.set("spark.sql.cbo.enabled", "false")
            spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
        seen = []
        for t in re.findall(r"cbo_(\w+)", plan):
            if t not in seen:
                seen.append(t)
        return seen

    plain = first_table(False)
    reordered = first_table(True)
    assert plain[0] == "lineitem", plain
    assert reordered[-1] == "lineitem", (
        f"CBO with stats should join the fact last, got {reordered}")
    # results identical either way (same rows, different order)
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    try:
        a = {tuple(r) for r in spark.sql(q).collect()}
    finally:
        spark.conf.set("spark.sql.cbo.enabled", "false")
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
    b = {tuple(r) for r in spark.sql(q).collect()}
    assert a == b and a
    for t in tables:
        spark.sql(f"DROP TABLE IF EXISTS cbo_{t}")
