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
