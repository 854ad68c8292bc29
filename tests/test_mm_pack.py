"""mm_interleaved_pack (r9): plan-shape + manifest-invariant pins.

The scale claim is "zero shuffle beyond the doc⋈media join": both join
inputs are laid out on the shard key (a pure function of the join key),
and the packing window plus the (shard, pack_id) aggregate reuse that
layout — so the ONLY hash exchanges in the whole plan are the two
join-input repartitions (fan_out's round-robin scan spreaders and a
broadcast of the small side at test scale don't count: neither is a
key shuffle, and neither grows with a second pipeline stage)."""

from pyspark.sql import functions as F


def _plan(df) -> str:
    spark = df.sparkSession
    key = "spark.sql.debug.maxToStringFields"
    prev = spark.conf.get(key)
    spark.conf.set(key, "10000")
    try:
        return df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set(key, prev)


def test_pack_plan_has_no_shuffle_past_the_join(spark, sf_dir):
    from etl_pipeline_from_mongo_json_to_postgre_spark.operators import mm_pack

    plan = _plan(mm_pack.mm_interleaved_pack(spark, sf_dir))
    n_hash = plan.count("Exchange hashpartitioning")
    assert n_hash == 2, (
        f"expected exactly the two join-input shard exchanges, got "
        f"{n_hash}:\n{plan}")
    # the window and the final aggregate must sit directly on the join
    # output: no exchange may appear between them in the tree (the plan
    # prints top-down, so everything before the join line is downstream)
    join_pos = min(
        p for p in (plan.find("SortMergeJoin"), plan.find("BroadcastHashJoin"),
                    plan.find("ShuffledHashJoin")) if p >= 0)
    downstream = plan[:join_pos]
    assert "Exchange hashpartitioning" not in downstream, (
        f"shuffle after the doc/media join:\n{plan}")
    assert "Window" in downstream and "HashAggregate" in downstream


def test_pack_manifest_invariants(spark, sf_dir):
    """Every pack except a shard's last must hold >= PACK_LEN total
    tokens MINUS its last doc's spillover (greedy first-token rule:
    a pack closes only once its cumulative cost crosses the budget),
    doc counts must sum to the corpus, and media counts must match the
    MEDIA_EVERY rule exactly."""
    from etl_pipeline_from_mongo_json_to_postgre_spark.operators import mm_pack
    from etl_pipeline_from_mongo_json_to_postgre_spark.sources.parquet import (
        load_table,
    )

    out = mm_pack.mm_interleaved_pack(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    n_media = docs.where(F.col("doc_id") % mm_pack.MEDIA_EVERY == 0).count()
    assert sum(r["n_docs"] for r in out) == n_docs
    assert sum(r["n_media"] for r in out) == n_media
    # pack ids are dense non-negative per shard
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r["pack_id"])
    for shard, ids in by_shard.items():
        ids.sort()
        assert ids == list(range(len(ids))), (shard, ids)
