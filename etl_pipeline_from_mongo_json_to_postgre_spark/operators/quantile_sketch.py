"""Approximate-quantile sketch profiling (extension; companion to the
HLL-sketch family in analytics.approx_distinct_*_sketch).

The 100 TB way to get percentiles is a mergeable rank sketch
(Greenwald-Khanna / KLL), never a sort: ``percentile_approx`` with
accuracy A guarantees rank error <= n/A, the aggregate is map-side
combinable, and the shuffle carries |groups| fixed-size summaries. The
sketch VALUES are engine-specific, so (same derived-oracle pattern as
approx_distinct_users_sketch, VERDICT r6 task 4) the driver-checked
frame carries the exact-checkable group keys + row counts plus
rank-error-bound booleans computed in-plan: each sketched quantile must
lie inside the exact-percentile envelope [p - 1.5/A, p + 1.5/A] (the
published GK bound with 50% margin). The exact envelope is computed
in-plan at test scale; a production run would trust the bound — the
point of the sketch is that the exact check is unaffordable there.

Reference parity note: the reference's profiling is exact KPI counts
(ui/audit_dashboard.py:50-97); quantile profiling is an extension of
its data-quality surface re-expressed sketch-first for scale.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..session import tune_for_oracle
from ..sources.parquet import fan_out, load_table

QUANTILES = [0.25, 0.5, 0.75, 0.95]
ACCURACY = 1000  # rank error <= n / ACCURACY
_EPS = 1.5 / ACCURACY


def approx_quantile_sketch(spark, sf_dir):
    """Per-returnflag price quantiles from the rank sketch, gated by
    the exact envelope. Output: l_returnflag, n_rows (exact, oracle-
    recomputed), within_bounds_q{25,50,75,95} booleans (oracle: TRUE)."""
    tune_for_oracle(spark)
    li = fan_out(spark, load_table(spark, sf_dir, "lineitem"))
    lo = [max(0.0, p - _EPS) for p in QUANTILES]
    hi = [min(1.0, p + _EPS) for p in QUANTILES]
    arr = "array(" + ",".join(repr(p) for p in QUANTILES) + ")"
    lo_a = "array(" + ",".join(repr(p) for p in lo) + ")"
    hi_a = "array(" + ",".join(repr(p) for p in hi) + ")"
    agg = (
        li.groupBy("l_returnflag")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.expr(
                f"approx_percentile(l_extendedprice, {arr}, {ACCURACY})"
            ).alias("qa"),
            F.expr(f"percentile(l_extendedprice, {lo_a})").alias("qlo"),
            F.expr(f"percentile(l_extendedprice, {hi_a})").alias("qhi"),
        )
    )
    cols = [F.col("l_returnflag"), F.col("n_rows")]
    # Small-group guard (r8 review): the sketch returns an ACTUAL data
    # value while the exact percentile INTERPOLATES, so when the rank
    # window n·2ε spans fewer than ~2 rows the interpolated envelope
    # can exclude every real value (2 rows of {1, 100}: envelope
    # ~[50.3, 50.7]). The bound is only meaningful when the window is
    # at least a couple of ranks wide — below that, pass by size, the
    # same scale-insensitivity discipline as kmeans' relative tolerance.
    tiny = F.col("n_rows") * F.lit(2.0 * _EPS) < F.lit(2.0)
    for i, p in enumerate(QUANTILES, start=1):
        ok = (
            (F.element_at("qa", i) >= F.element_at("qlo", i))
            & (F.element_at("qa", i) <= F.element_at("qhi", i))
        ) | tiny
        cols.append(ok.alias(f"within_bounds_q{int(p * 100)}"))
    return agg.select(*cols).orderBy("l_returnflag")


QUERIES = {
    "approx_quantile_sketch": approx_quantile_sketch,
}

ORACLE_SQL = {
    "approx_quantile_sketch": """
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT) AS n_rows,
               TRUE AS within_bounds_q25,
               TRUE AS within_bounds_q50,
               TRUE AS within_bounds_q75,
               TRUE AS within_bounds_q95
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
}
