"""Degenerate-input parity (ADVICE r4): events_anomaly_zscore on a
single-active-day / constant series and ts_ewma on an all-NULL value
window must yield NULL on BOTH engines — not ANSI divide errors, Inf,
or NaN whose cross-engine encoding is untested."""

import datetime

import pyarrow as pa
import pyarrow.parquet as pq

from tests.oracle_compare import compare, duckdb_conn


def _write_events(tmp_path, rows):
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def _check(spark, sf_dir, names):
    import __spark_entry__ as e

    q, o = e.queries(), e.oracle_sql()
    con = duckdb_conn(sf_dir)
    for name in names:
        ok, msg = compare(q[name](spark, sf_dir), con, o[name])
        assert ok, f"{name}: {msg}"


def test_single_day_and_all_null_values(spark, tmp_path):
    t = datetime.datetime(2024, 3, 1, 10, 0)
    rows = [
        # user 1: every value NULL -> ewma den == 0 -> NULL
        (1, t, 1, "click", None),
        (2, t + datetime.timedelta(minutes=5), 1, "click", None),
        (3, t + datetime.timedelta(minutes=9), 1, "click", None),
        # user 2: normal values
        (4, t + datetime.timedelta(minutes=2), 2, "view", 3.0),
        (5, t + datetime.timedelta(minutes=7), 2, "view", 5.0),
    ]  # all rows on ONE day -> n_days == 1 -> zscore NULL
    sf = _write_events(tmp_path, rows)
    _check(spark, sf, ["ts_ewma", "events_anomaly_zscore"])


def test_constant_series_zero_variance(spark, tmp_path):
    t = datetime.datetime(2024, 3, 1, 10, 0)
    rows = [
        (1, t, 1, "click", 1.0),
        (2, t + datetime.timedelta(minutes=5), 1, "click", 2.0),
        (3, t + datetime.timedelta(days=1), 2, "view", 3.0),
        (4, t + datetime.timedelta(days=1, minutes=5), 2, "view", 4.0),
    ]  # two days, two events each -> sample variance 0 -> zscore NULL
    sf = _write_events(tmp_path, rows)
    _check(spark, sf, ["events_anomaly_zscore"])


def test_triplet_mining_lone_label_null_sides(spark, tmp_path):
    """A lone-label anchor has NO positive; the operator contract is a
    NULL pos side (and a NULL margin), not a dropped row — and the
    DuckDB oracle must encode the same NULLs so the driver's value hash
    agrees. Fixture: anchor 0 is the only label-7 vector; every other
    anchor has both sides."""
    import numpy as np

    rng = np.random.RandomState(7)
    n = 6
    vecs = [[float(x) for x in rng.randn(64)] for _ in range(n)]
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array([7, 1, 1, 2, 2, 2], pa.int32()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    _check(spark, str(tmp_path), ["emb_triplet_mining"])

    from etl_pipeline_from_mongo_json_to_postgre_spark.operators.similarity import (
        emb_triplet_mining,
    )

    by_anchor = {
        r.anchor_id: r
        for r in emb_triplet_mining(spark, str(tmp_path)).collect()
    }
    lone = by_anchor[0]
    assert lone.pos_id is None and lone.pos_cos is None and lone.margin is None
    assert lone.neg_id is not None  # negatives exist: other labels present
    assert all(
        r.pos_id is not None and r.margin is not None
        for a, r in by_anchor.items() if a != 0
    )


def test_sharded_triplet_mining_null_contract_per_batch(spark, tmp_path):
    """The sharded miner's NULL contract is per-BATCH: lone-label-in-
    batch -> NULL positive; single-label batch -> NULL negative;
    lone-vector batch -> both NULL (the left-join backfill path). All
    three cross-engine-proven on one fixture (batches are
    vec_id div 64, so ids 0-4 / 64-65 / 128 land in three batches)."""
    import numpy as np

    rng = np.random.RandomState(11)
    ids = [0, 1, 2, 3, 4, 64, 65, 128]
    labels = [7, 1, 1, 2, 2, 3, 3, 5]
    vecs = [[float(x) for x in rng.randn(64)] for _ in ids]
    tbl = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    _check(spark, str(tmp_path), ["emb_triplet_mining_sharded"])

    from etl_pipeline_from_mongo_json_to_postgre_spark.operators.similarity import (
        emb_triplet_mining_sharded,
    )

    by_anchor = {
        r.anchor_id: r
        for r in emb_triplet_mining_sharded(spark, str(tmp_path)).collect()
    }
    assert set(by_anchor) == set(ids)  # no row ever dropped
    lone_label = by_anchor[0]
    assert lone_label.pos_id is None and lone_label.margin is None
    assert lone_label.neg_id is not None
    for a in (64, 65):  # single-label batch: positives only
        assert by_anchor[a].pos_id is not None
        assert by_anchor[a].neg_id is None and by_anchor[a].margin is None
    lone_vec = by_anchor[128]
    assert lone_vec.pos_id is None and lone_vec.neg_id is None
    for a in (1, 2, 3, 4):  # full batch: both sides mined in-batch
        r = by_anchor[a]
        assert r.pos_id is not None and r.neg_id is not None
        assert r.batch_id == 0
        assert r.pos_id // 64 == 0 and r.neg_id // 64 == 0  # never cross-batch


def test_semantic_multiprobe_catches_cell_straddling_pair(spark, tmp_path):
    """The SemDeDup boundary-miss class, planted (VERDICT r10 task 3):
    a near-dup pair whose members land in DIFFERENT primary cells is
    unrepresentable in dedup_semantic_cells' cluster-keyed pair join —
    single-probe must report both as unique, and that is NOT a bug in
    single-probe, it is its documented contract. Multi-probe (top-2
    cells) must catch the same pair, because each member's second-best
    cell is the other's primary. Fixture: u = 1.1*e0 + e1 and
    w = e0 + 1.1*e1 (e_i = CENTROIDS[i] normalized by its squared
    norm) -> primaries split (cell 1 vs cell 2, 1-based), top-2 sets
    overlap, mutual cosine ~0.997; two far vectors sit in unrelated
    cells below the 0.35 threshold against everything. Construction
    verified AFTER float32 storage rounding."""
    import numpy as np

    from etl_pipeline_from_mongo_json_to_postgre_spark.operators.similarity import (
        CENTROIDS,
        dedup_semantic_cells,
        dedup_semantic_cells_mp,
    )

    C = np.array(CENTROIDS)
    e0 = C[0] / np.dot(C[0], C[0])
    e1 = C[1] / np.dot(C[1], C[1])
    vecs = [
        1.1 * e0 + e1,                      # vec 0: primary cell0, 2nd cell1
        e0 + 1.1 * e1,                      # vec 1: primary cell1, 2nd cell0
        2.0 * C[5] / np.linalg.norm(C[5]),  # far, cell 5
        2.0 * C[9] / np.linalg.norm(C[9]),  # far, cell 9
    ]
    tbl = pa.table(
        {
            "vec_id": pa.array(range(4), pa.int64()),
            "embedding": pa.array(
                [[float(x) for x in v] for v in vecs], pa.list_(pa.float32())
            ),
            "label": pa.array([0, 0, 1, 2], pa.int32()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    sf = str(tmp_path)

    single = {r.vec_id: r for r in dedup_semantic_cells(spark, sf).collect()}
    # the straddle: primaries differ, so single-probe provably misses
    assert single[0].cluster_id != single[1].cluster_id
    assert not single[0].is_duplicate and not single[1].is_duplicate
    assert single[0].canonical_id == 0 and single[1].canonical_id == 1

    multi = {r.vec_id: r for r in dedup_semantic_cells_mp(spark, sf).collect()}
    # same primary assignment, but the pair meets under the shared top-2 cell
    assert multi[0].cluster_id == single[0].cluster_id
    assert multi[1].cluster_id == single[1].cluster_id
    assert not multi[0].is_duplicate and multi[0].canonical_id == 0
    assert multi[1].is_duplicate and multi[1].canonical_id == 0
    # far vectors stay unique under both
    for k in (2, 3):
        assert not single[k].is_duplicate and not multi[k].is_duplicate

    # and the oracle replicates the top-2 rule on the planted fixture
    _check(spark, sf, ["dedup_semantic_cells_mp"])


def test_inc_multiprobe_catches_straddling_arrival(spark, tmp_path):
    """The incremental twin of the SemDeDup boundary-miss class: an
    ARRIVING vector whose primary cell differs from its near-dup INDEX
    vector's cell is invisible to inc_semantic_dedup's single-probe
    join by construction; inc_semantic_dedup_mp probes the arrival's
    top-2 cells and must catch it. Fixture ids chosen for the
    scrambled mod-10 slice: vec 0 IS the arriving batch (bucket 0);
    vecs 1-3 are index. vec 0 = 1.1*e0 + e1 (primary cell 1, second
    cell 2, 1-based), index vec 1 = e0 + 1.1*e1 (primary cell 2),
    mutual cosine ~0.997; index vecs 2/3 are far (cells 6/10, below
    threshold against everything)."""
    import numpy as np

    from etl_pipeline_from_mongo_json_to_postgre_spark.functions.sampling import (
        KNUTH_MULT,
        SCRAMBLE_MOD,
    )
    from etl_pipeline_from_mongo_json_to_postgre_spark.operators.similarity import (
        CENTROIDS,
        INC_VEC_BATCH_MOD,
        inc_semantic_dedup,
        inc_semantic_dedup_mp,
    )

    def bucket(i):
        return (i * KNUTH_MULT % SCRAMBLE_MOD) % INC_VEC_BATCH_MOD

    assert bucket(0) == 0 and all(bucket(i) != 0 for i in (1, 2, 3)), (
        "fixture ids must split arrival/index under the scrambled slice")

    C = np.array(CENTROIDS)
    e0 = C[0] / np.dot(C[0], C[0])
    e1 = C[1] / np.dot(C[1], C[1])
    vecs = [
        1.1 * e0 + e1,                      # arriving straddler
        e0 + 1.1 * e1,                      # its index near-dup, other cell
        2.0 * C[5] / np.linalg.norm(C[5]),  # far index
        2.0 * C[9] / np.linalg.norm(C[9]),  # far index
    ]
    tbl = pa.table(
        {
            "vec_id": pa.array(range(4), pa.int64()),
            "embedding": pa.array(
                [[float(x) for x in v] for v in vecs], pa.list_(pa.float32())
            ),
            "label": pa.array([0, 0, 1, 2], pa.int32()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    sf = str(tmp_path)

    single = {r.vec_id: r for r in inc_semantic_dedup(spark, sf).collect()}
    assert set(single) == {0}, "only vec 0 is in the arriving slice"
    assert single[0].is_dup is False and single[0].canonical_id == 0, (
        "single-probe provably misses the cross-cell near-dup")

    multi = {r.vec_id: r for r in inc_semantic_dedup_mp(spark, sf).collect()}
    assert set(multi) == {0}
    assert multi[0].is_dup is True and multi[0].canonical_id == 1, (
        "the arrival's second-best cell is the index near-dup's primary")

    _check(spark, sf, ["inc_semantic_dedup_mp"])
