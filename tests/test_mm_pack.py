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


def test_write_mm_packed_shards_layout_parity_determinism(spark, sf_dir, tmp_path):
    """write_mm_packed_shards (r10): the manifest reaches disk. One
    directory per shard, files internally (pack_id, doc_id)-ordered,
    re-read rows census back to EXACTLY the audited manifest, payloads
    present iff the doc carries media, and a second write is
    byte-deterministic."""
    import hashlib
    import os

    import pyarrow.parquet as pq

    from etl_pipeline_from_mongo_json_to_postgre_spark.operators import mm_pack
    from etl_pipeline_from_mongo_json_to_postgre_spark.sources.parquet import (
        load_table,
    )

    out = str(tmp_path / "mm_shards")
    mm_pack.write_mm_packed_shards(spark, sf_dir, out)

    shard_dirs = sorted(d for d in os.listdir(out) if d.startswith("shard="))
    assert len(shard_dirs) == mm_pack.SHARDS

    back = spark.read.parquet(out)
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert back.count() == n_docs

    # re-read census == the audited manifest, column for column
    census = (
        back.groupBy(F.col("shard").cast("bigint").alias("shard"), "pack_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum((F.col("media_tokens") > 0).cast("int")).cast("bigint")
            .alias("n_media"),
            F.sum("text_tokens").alias("text_tokens"),
            F.sum("media_tokens").alias("media_tokens"),
        )
    )
    manifest = mm_pack.mm_interleaved_pack(spark, sf_dir)
    assert census.exceptAll(manifest).count() == 0
    assert manifest.exceptAll(census).count() == 0

    # payload rides iff the doc carries media, and is real PPM bytes
    bad = back.where(
        (F.col("payload").isNotNull()) != (F.col("doc_id") % mm_pack.MEDIA_EVERY == 0)
    )
    assert bad.count() == 0
    sample = back.where(F.col("payload").isNotNull()).limit(3).collect()
    assert sample and all(bytes(r.payload).startswith(b"P6\n") for r in sample)

    # every file internally ordered by (pack_id, doc_id)
    def file_hashes(root):
        hashes = {}
        for d in sorted(os.listdir(root)):
            if not d.startswith("shard="):
                continue
            for f in sorted(os.listdir(os.path.join(root, d))):
                if not f.endswith(".parquet"):
                    continue
                p = os.path.join(root, d, f)
                t = pq.read_table(p, columns=["pack_id", "doc_id"])
                keys = list(zip(t.column("pack_id").to_pylist(),
                                t.column("doc_id").to_pylist()))
                assert keys == sorted(keys), f"unordered file {p}"
                content = pq.read_table(p)
                hashes[(d, len(hashes))] = hashlib.sha256(
                    str(content.to_pydict()).encode()).hexdigest()
        return hashes

    h1 = file_hashes(out)

    out2 = str(tmp_path / "mm_shards2")
    mm_pack.write_mm_packed_shards(spark, sf_dir, out2)
    assert file_hashes(out2) == h1, "re-run must reproduce identical shards"
