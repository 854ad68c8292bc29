"""Semantic invariants of the incremental-load operators (oracle
parity is covered registry-wide by test_oracle_parity.py; these pin
the merge laws the oracle can't express)."""

from pyspark.sql import functions as F

from etl_pipeline_from_mongo_json_to_postgre_spark.operators import incremental as inc


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_upsert_latest_is_idempotent(spark, sf_dir):
    """Applying the same change batch twice must be a no-op: the
    re-applied rows tie with themselves and exactly one survives."""
    base = inc._orders(spark, sf_dir).withColumn("version", F.lit(1))
    changes = inc._changes(inc._orders(spark, sf_dir))
    once = inc.upsert_latest(base, changes, ["o_orderkey"])
    twice = inc.upsert_latest(once, changes, ["o_orderkey"])
    assert _sorted_rows(once) == _sorted_rows(twice)


def test_upsert_latest_keys_unique_and_versions_win(spark, sf_dir):
    out = inc.inc_upsert_latest(spark, sf_dir)
    n = out.count()
    assert out.select("o_orderkey").distinct().count() == n
    # every key in the update slice must carry the new version + status
    upd = out.where(
        (F.col("o_orderkey") % inc.UPD_MOD == 0)
        & (F.col("o_orderkey") < inc.INSERT_KEY_OFFSET)
    )
    assert upd.where((F.col("version") != 2) | (F.col("o_orderstatus") != "U")).count() == 0
    # untouched keys keep version 1
    keep = out.where(
        (F.col("o_orderkey") % inc.UPD_MOD != 0)
        & (F.col("o_orderkey") < inc.INSERT_KEY_OFFSET)
    )
    assert keep.where(F.col("version") != 1).count() == 0


def test_snapshot_diff_counts_match_slices(spark, sf_dir):
    base = inc._orders(spark, sf_dir)
    diff = inc.inc_snapshot_diff(spark, sf_dir).cache()
    by_type = dict(
        diff.groupBy("change_type").count().collect()
    )
    n_del = base.where(F.col("o_orderkey") % inc.DEL_MOD == 0).count()
    n_ins = base.where(F.col("o_orderkey") % inc.INS_MOD == 0).count()
    n_upd = base.where(
        (F.col("o_orderkey") % inc.UPD_MOD == 0)
        & (F.col("o_orderkey") % inc.DEL_MOD != 0)
    ).count()
    assert by_type.get("DELETE", 0) == n_del
    assert by_type.get("INSERT", 0) == n_ins
    assert by_type.get("UPDATE", 0) == n_upd
    diff.unpersist()


def test_scd2_intervals_are_well_formed(spark, sf_dir):
    out = inc.inc_scd2_intervals(spark, sf_dir).cache()
    # islands are 1..n consecutive per customer
    agg = out.groupBy("o_custkey").agg(
        F.min("island").alias("lo"),
        F.max("island").alias("hi"),
        F.count("*").alias("n"),
    )
    assert agg.where((F.col("lo") != 1) | (F.col("hi") != F.col("n"))).count() == 0
    # exactly one open (current) interval per customer; closed intervals
    # never end before they start
    assert (
        out.where(F.col("valid_to").isNull()).groupBy("o_custkey").count()
        .where(F.col("count") != 1).count() == 0
    )
    assert out.where(F.col("valid_to") < F.col("valid_from")).count() == 0
    # adjacent intervals chain: valid_to == next island's valid_from
    from pyspark.sql.window import Window

    w = Window.partitionBy("o_custkey").orderBy("island")
    chained = out.withColumn("nxt", F.lead("valid_from").over(w))
    assert chained.where(
        F.col("nxt").isNotNull() & (F.col("valid_to") != F.col("nxt"))
    ).count() == 0
    out.unpersist()
