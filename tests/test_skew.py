"""Skew-mitigation structural properties (results are oracle-checked in
test_oracle_parity; these pin the *mechanism*)."""

from pyspark.sql import functions as F

from etl_pipeline_from_mongo_json_to_postgre_spark.operators.skew import (
    N_SALTS,
    salted_groupby,
    skew_salted_agg,
)
from etl_pipeline_from_mongo_json_to_postgre_spark.sources.parquet import load_table
from etl_pipeline_from_mongo_json_to_postgre_spark.storage import physical_plan


def test_salt_spreads_hot_key(spark, sf_dir):
    """Each hot key's rows must occupy all N_SALTS phase-1 groups —
    that spread IS the skew fix (one reducer -> N_SALTS reducers)."""
    l = load_table(spark, sf_dir, "lineitem")
    phase1_groups = (
        l.withColumn("_salt", F.pmod(F.col("l_orderkey"), F.lit(N_SALTS)))
        .groupBy("l_returnflag", "_salt")
        .count()
        .groupBy("l_returnflag")
        .agg(F.countDistinct("_salt").alias("n"))
    )
    assert all(r["n"] == N_SALTS for r in phase1_groups.collect())


def test_salted_agg_two_shuffle_plan(spark, sf_dir):
    """The salted aggregate plans exactly two Exchanges: (key, salt)
    then (key) — each preceded by a map-side partial."""
    plan = physical_plan(skew_salted_agg(spark, sf_dir))
    assert plan.count("Exchange") == 2
    assert plan.count("HashAggregate") == 4


def test_salt_is_deterministic(spark, sf_dir):
    """Stable-attribute salting: two runs produce identical phase-1
    groups (rand() salting would break task-retry idempotency)."""
    l = load_table(spark, sf_dir, "lineitem").limit(1000)
    qty = F.col("l_quantity").cast("decimal(18,2)")
    args = dict(
        keys=["l_returnflag"],
        salt_from=F.col("l_orderkey"),
        partials=[(F.count("*"), "pc"), (F.sum(qty), "ps")],
        finals=[F.sum("pc").alias("cnt"),
                F.sum("ps").cast("double").alias("sum_qty")],
    )
    a = {tuple(r) for r in salted_groupby(l, **args).collect()}
    b = {tuple(r) for r in salted_groupby(l, **args).collect()}
    assert a == b
