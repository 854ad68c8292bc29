"""Error bounds for the approximate aggregates (no DuckDB oracle —
sketch implementations differ across engines, so the driver records a
rows-only check; THIS is their correctness gate: approximate answers
must sit within the configured error of the exact ones)."""

from pyspark.sql import functions as F

from etl_pipeline_from_mongo_json_to_postgre_spark.operators.analytics import (
    approx_distinct_users,
    approx_value_quantiles,
)
from etl_pipeline_from_mongo_json_to_postgre_spark.sources.parquet import load_table


def test_approx_distinct_within_error(spark, sf_dir):
    approx = {
        r["event_type"]: r["approx_users"]
        for r in approx_distinct_users(spark, sf_dir).collect()
    }
    exact = {
        r["event_type"]: r["exact"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    assert approx.keys() == exact.keys()
    for k in exact:
        rel_err = abs(approx[k] - exact[k]) / max(exact[k], 1)
        assert rel_err < 0.05, f"{k}: approx {approx[k]} vs exact {exact[k]}"


def test_approx_quantiles_within_rank_error(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    got = {
        r["event_type"]: r["value_quantiles"]
        for r in approx_value_quantiles(spark, sf_dir).collect()
    }
    for etype, (q50, q95, q99) in got.items():
        vals = sorted(
            r[0]
            for r in events.where(F.col("event_type") == etype)
            .select(F.col("value").cast("double"))
            .collect()
            if r[0] is not None
        )
        n = len(vals)
        for q, v in ((0.5, q50), (0.95, q95), (0.99, q99)):
            # rank of the returned value must be within 1% of the target
            import bisect

            lo = bisect.bisect_left(vals, v)
            hi = bisect.bisect_right(vals, v)
            target = q * (n - 1)
            assert lo - 1 <= target + 0.01 * n and hi >= target - 0.01 * n, (
                f"{etype} q{q}: value {v} rank [{lo},{hi}] vs target {target}"
            )
