"""mm_interleaved_pack (r9): plan-shape + manifest-invariant pins.

The scale claim is "zero shuffle beyond the doc⋈media join": both join
inputs are laid out on the shard key (a pure function of the join key),
and the packing window plus the (shard, pack_id) aggregate reuse that
layout — so the ONLY hash exchanges in the whole plan are the two
join-input repartitions (fan_out's round-robin scan spreaders and a
broadcast of the small side at test scale don't count: neither is a
key shuffle, and neither grows with a second pipeline stage)."""

from pyspark.sql import functions as F

from etl_pipeline_from_mongo_json_to_postgre_spark.storage import physical_plan

_JOIN_NODES = ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin")


def test_pack_plan_has_no_shuffle_past_the_join(spark, sf_dir):
    from etl_pipeline_from_mongo_json_to_postgre_spark.operators import mm_pack

    plan = physical_plan(mm_pack.mm_interleaved_pack(spark, sf_dir))
    n_hash = plan.count("Exchange hashpartitioning")
    assert n_hash == 2, (
        f"expected exactly the two join-input shard exchanges, got "
        f"{n_hash}:\n{plan}")
    # the window and the final aggregate must sit directly on the join
    # output: no exchange may appear between them in the tree (the plan
    # prints top-down, so everything before the join line is downstream)
    join_positions = [p for p in (plan.find(n) for n in _JOIN_NODES)
                      if p >= 0]
    assert join_positions, (
        f"no known join node ({_JOIN_NODES}) in the plan:\n{plan}")
    downstream = plan[:min(join_positions)]
    assert "Exchange hashpartitioning" not in downstream, (
        f"shuffle after the doc/media join:\n{plan}")
    assert "Window" in downstream and "HashAggregate" in downstream


def test_pack_manifest_invariants(spark, sf_dir):
    """Greedy first-token packing, checked from the census alone: the
    cumulative token total BEFORE each pack k (= the stream offset of
    its first doc) must lie inside bin k's range
    [k*PACK_LEN, (k+1)*PACK_LEN) — which is exactly the 'a doc belongs
    to the bin containing its first token' rule, and fails on any
    early-close bug (cum instead of cum - cost, wrong PACK_LEN). Doc
    counts must sum to the corpus and media counts must match the
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
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, packs in by_shard.items():
        packs.sort(key=lambda r: r["pack_id"])
        # pack ids dense non-negative per shard
        assert [r["pack_id"] for r in packs] == list(range(len(packs))), (
            shard, [r["pack_id"] for r in packs])
        running = 0
        for r in packs:
            k = r["pack_id"]
            assert k * mm_pack.PACK_LEN <= running < (k + 1) * mm_pack.PACK_LEN, (
                f"shard {shard} pack {k}: first-doc offset {running} "
                f"outside bin range")
            running += r["text_tokens"] + r["media_tokens"]


def test_pack_plan_stays_colocated_in_smj_regime(spark, sf_dir):
    """The 100 TB story: when the media side is too big to broadcast
    (autoBroadcastJoinThreshold=-1), the join must run SMJ/SHJ directly
    on the two shard-keyed exchanges WITHOUT re-shuffling onto the join
    key — hashpartitioning(shard) satisfies the join's clustering
    requirement because shard appears in the equi-join condition — and
    the window + aggregate must still add no exchange."""
    from etl_pipeline_from_mongo_json_to_postgre_spark.operators import mm_pack

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = mm_pack.mm_interleaved_pack(spark, sf_dir)
        plan = physical_plan(df)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "BroadcastHashJoin" not in plan
    n_hash = plan.count("Exchange hashpartitioning")
    assert n_hash == 2, (
        f"SMJ regime must reuse the two shard exchanges (no re-shuffle "
        f"onto the join key), got {n_hash}:\n{plan}")
    # result unchanged vs the broadcast-regime run
    smj = {tuple(r) for r in df.collect()}
    bhj = {tuple(r) for r in mm_pack.mm_interleaved_pack(spark, sf_dir).collect()}
    assert smj == bhj
