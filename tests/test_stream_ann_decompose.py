"""stream_ann_cell_assign wall decomposition (VERDICT r12 task 6).

r12 flagged the entry's exponent at alpha 0.51 and adjudicated it as
streaming-harness setup/commit overhead. The r13 decomposition
(tools/stream_ann_decompose.py, per-batch durationMs from
recentProgress) DISPROVED that adjudication: setup/commit was flat
(~300 ms) while addBatch grew 2355 -> 6129 ms warm for 4x data — a
real in-batch slope, traced to loop-invariant literal-array lookups
inside planted_v_column's per-element transform lambda (HOF lambdas
are interpreted per element with no invariant hoisting). After the
zip_with hoisting fix (ann_trained.planted_v_column), warm in-batch
is 1383 ms (sf0.001) -> ~2.1-2.6 s (sf0.1): alpha 0.31, absolute
5.6x faster at sf0.1, results bit-identical (parity hash-green for
all four planted-vector consumers).

These tests pin BOTH components so either regression class resurfaces
loudly: the in-batch budget (the hoisting fix) and the overhead share
(the harness staying thin).
"""

import pytest

pytest.importorskip("pyspark")  # before tools import — it imports pyspark

from tools.stream_ann_decompose import run_decomposed  # noqa: E402


def _best_of(spark, sf_dir, budget_ms=None, max_reps=2):
    """Min over reps; with a budget, stop early once a rep clears it
    and keep trying up to max_reps otherwise — a genuine regression
    (pre-fix: 6.1 s warm) never produces a sub-budget rep, while a
    transient load spike (this suite runs after minutes of heavy
    tests in the same JVM) eventually yields a clean one."""
    best = None
    for _ in range(max_reps):
        r = run_decomposed(spark, sf_dir)
        if best is None or r["in_batch_ms"] < best["in_batch_ms"]:
            best = r
        if budget_ms is not None and best["in_batch_ms"] <= budget_ms:
            break
    return best


def test_in_batch_budget_sf01(spark):
    """Best-rep warm in-batch (addBatch) wall at sf0.1. Post-fix it
    measures ~2.1-2.6 s; the pre-fix form measured 6.1 s warm — the
    4.5 s budget separates the two far beyond the documented ~1.5x
    host band. Up to 4 reps guard against transient suite load
    (observed: 1 failing rep at load-average 2.6, clean 2.1 s reps
    seconds later)."""
    best = _best_of(spark, "/root/testdata/sf0.1", budget_ms=4500,
                    max_reps=4)
    assert best["n_rows"] == 2000
    assert best["in_batch_ms"] <= 4500, best


def test_overhead_stays_thin(spark):
    """Setup/commit (triggerExecution - addBatch) is the harness, not
    the data path: one availableNow micro-batch costs ~300 ms warm.
    2 s of slack keeps host noise out; a harness regression (extra
    batches, WAL churn) lands well above it."""
    reps = [run_decomposed(spark, "/root/testdata/sf0.001")
            for _ in range(2)]
    best = min(reps, key=lambda r: r["overhead_ms"])
    assert len(best["batches"]) == 1
    assert best["overhead_ms"] <= 2000, best
