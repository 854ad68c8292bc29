"""Data-quality profiling operators (pipeline-hygiene extension family).

The reference surfaces per-run audit KPIs (ui/audit_dashboard.py:100-224:
row counts, status breakdowns, missing-column reports); the natural
engine-side generalization is a column profiler — the first query anyone
runs against a new 100 TB drop.

Scale shape: ONE aggregation pass computes every per-column statistic
(non-null count, distinct count, min/max) as independent aggregate
expressions, then the single 1-row result is unpivoted driver-side-free
via ``stack`` — no per-column scans, no collect. The exact
``count_distinct`` here forces Catalyst's expand (one shuffle lane per
distinct-agg); the documented production swap at 100 TB is
``approx_count_distinct`` per column, which collapses the expand into
mergeable sketches (cf. analytics.approx_distinct_users_sketch).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..session import tune_for_oracle
from ..sources.parquet import load_table

# (column, min/max cast) — doubles go through DECIMAL so the stringified
# min/max is formatting-stable across engines; timestamps/bigints cast
# identically in Spark and DuckDB.
_PROFILE_COLS = (
    ("o_orderkey", "string"),
    ("o_custkey", "string"),
    ("o_orderstatus", "string"),
    ("o_totalprice", "decimal(14,2)"),
    ("o_orderdate", "string"),
    ("o_orderpriority", "string"),
)


def dq_column_profile(spark, sf_dir):
    """Per-column profile of the orders table: non-null count, exact
    distinct count, min/max (stringified) — one scan, one aggregate."""
    tune_for_oracle(spark)
    orders = load_table(spark, sf_dir, "orders")
    aggs = [F.count("*").alias("n_rows")]
    for c, mcast in _PROFILE_COLS:
        aggs += [
            F.count(c).alias(f"{c}__nn"),
            F.count_distinct(c).alias(f"{c}__nd"),
            F.min(c).cast(mcast).cast("string").alias(f"{c}__min"),
            F.max(c).cast(mcast).cast("string").alias(f"{c}__max"),
        ]
    one = orders.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__nn, {c}__nd, {c}__min, {c}__max" for c, _ in _PROFILE_COLS
    )
    return one.select(
        "n_rows",
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack_args}) "
            "AS (column_name, n_nonnull, n_distinct, min_val, max_val)"
        ),
    ).select("column_name", "n_rows", "n_nonnull", "n_distinct", "min_val", "max_val")


def dq_null_violations(spark, sf_dir):
    """Expectation-style validation counts over events: rows violating
    each declared constraint (null key, non-positive value, unknown
    event type, out-of-range timestamp). FILTER-style conditional
    aggregation — one pass, one tiny result row per constraint via
    stack, the engine twin of the reference's per-document
    validation-error audit (transformer.py error capture)."""
    tune_for_oracle(spark)
    ev = load_table(spark, sf_dir, "events")
    known = ("click", "view", "purchase", "signup", "error")
    agg = ev.agg(
        F.count("*").alias("n_rows"),
        F.count_if(F.col("user_id").isNull()).alias("null_user"),
        F.count_if(F.col("value") <= 0).alias("nonpos_value"),
        F.count_if(~F.col("event_type").isin(*known)).alias("unknown_type"),
        F.count_if(F.year("ts") < 2000).alias("ts_before_2000"),
    )
    return agg.select(
        F.expr(
            "stack(4, 'null_user', null_user, 'nonpos_value', nonpos_value, "
            "'unknown_type', unknown_type, 'ts_before_2000', ts_before_2000) "
            "AS (constraint_name, violations)"
        ),
        "n_rows",
    ).select("constraint_name", "violations", "n_rows")


ZBUCKET_SHIFT = 26  # 32-bit key >> 26 = 64 census buckets


def zorder_bucket_census(spark, sf_dir):
    """Morton-key clustering census over lineitem (l_partkey,
    l_suppkey): per Z-bucket (top 6 bits of the 32-bit interleaved
    key — 64 census buckets), the row count and both dimensions' min/max spread. This is
    the planning query behind storage.write_zordered — narrow per-
    bucket min/max ranges on BOTH columns are exactly what makes the
    clustered layout skippable (tests/test_zorder.py measures the
    resulting row-group skip rates on real files).

    The whole key is integer shift/mask arithmetic — stays in
    whole-stage codegen, one hash shuffle on the bucket id."""
    from ..storage import morton_key

    tune_for_oracle(spark)
    l = load_table(spark, sf_dir, "lineitem")
    b = l.agg(
        F.min("l_partkey"), F.max("l_partkey"),
        F.min("l_suppkey"), F.max("l_suppkey"),
    ).collect()[0]  # metadata-scale table stats, same values the oracle's
    # scalar subqueries produce
    z = morton_key(
        F.col("l_partkey"), F.col("l_suppkey"),
        (b[0], b[1]), (b[2], b[3]),
    )
    return (
        l.select(
            F.shiftright(z, ZBUCKET_SHIFT).alias("z_bucket"),
            "l_partkey",
            "l_suppkey",
        )
        .groupBy("z_bucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("l_partkey").alias("pk_min"),
            F.max("l_partkey").alias("pk_max"),
            F.min("l_suppkey").alias("sk_min"),
            F.max("l_suppkey").alias("sk_max"),
        )
    )


def _zorder_census_sql() -> str:
    from ..storage import zorder_sql

    zexpr = zorder_sql(
        "l_partkey", "l_suppkey",
        ("(SELECT min(l_partkey) FROM lineitem)",
         "(SELECT max(l_partkey) FROM lineitem)"),
        ("(SELECT min(l_suppkey) FROM lineitem)",
         "(SELECT max(l_suppkey) FROM lineitem)"),
    )
    return f"""
        SELECT ({zexpr} >> {ZBUCKET_SHIFT})
                   AS z_bucket,
               count(*) AS n_rows,
               min(l_partkey) AS pk_min, max(l_partkey) AS pk_max,
               min(l_suppkey) AS sk_min, max(l_suppkey) AS sk_max
        FROM lineitem GROUP BY 1
    """


ORACLE_SQL = {
    "dq_column_profile": """
        WITH src AS (SELECT * FROM orders)
        SELECT 'o_orderkey' AS column_name, count(*) AS n_rows,
               count(o_orderkey) AS n_nonnull,
               count(DISTINCT o_orderkey) AS n_distinct,
               CAST(min(o_orderkey) AS VARCHAR) AS min_val,
               CAST(max(o_orderkey) AS VARCHAR) AS max_val FROM src
        UNION ALL
        SELECT 'o_custkey', count(*), count(o_custkey),
               count(DISTINCT o_custkey),
               CAST(min(o_custkey) AS VARCHAR),
               CAST(max(o_custkey) AS VARCHAR) FROM src
        UNION ALL
        SELECT 'o_orderstatus', count(*), count(o_orderstatus),
               count(DISTINCT o_orderstatus),
               CAST(min(o_orderstatus) AS VARCHAR),
               CAST(max(o_orderstatus) AS VARCHAR) FROM src
        UNION ALL
        SELECT 'o_totalprice', count(*), count(o_totalprice),
               count(DISTINCT o_totalprice),
               CAST(CAST(min(o_totalprice) AS DECIMAL(14,2)) AS VARCHAR),
               CAST(CAST(max(o_totalprice) AS DECIMAL(14,2)) AS VARCHAR) FROM src
        UNION ALL
        SELECT 'o_orderdate', count(*), count(o_orderdate),
               count(DISTINCT o_orderdate),
               CAST(min(o_orderdate) AS VARCHAR),
               CAST(max(o_orderdate) AS VARCHAR) FROM src
        UNION ALL
        SELECT 'o_orderpriority', count(*), count(o_orderpriority),
               count(DISTINCT o_orderpriority),
               CAST(min(o_orderpriority) AS VARCHAR),
               CAST(max(o_orderpriority) AS VARCHAR) FROM src
    """,
    "dq_null_violations": """
        WITH agg AS (
            SELECT count(*) AS n_rows,
                   count(*) FILTER (user_id IS NULL) AS null_user,
                   count(*) FILTER (value <= 0) AS nonpos_value,
                   count(*) FILTER (event_type NOT IN
                       ('click','view','purchase','signup','error'))
                       AS unknown_type,
                   count(*) FILTER (year(ts) < 2000) AS ts_before_2000
            FROM events
        )
        SELECT 'null_user' AS constraint_name, null_user AS violations, n_rows FROM agg
        UNION ALL SELECT 'nonpos_value', nonpos_value, n_rows FROM agg
        UNION ALL SELECT 'unknown_type', unknown_type, n_rows FROM agg
        UNION ALL SELECT 'ts_before_2000', ts_before_2000, n_rows FROM agg
    """,
}

HIST_LO = 0.0
HIST_HI = 500.0
HIST_BUCKETS = 20


def dq_histogram(spark, sf_dir):
    """Equi-width histogram of event value per event_type
    (width_bucket semantics: below-range -> bucket 0, above-range ->
    n+1). The profiling companion to approx_value_quantiles when you
    need the full shape, not point quantiles. One hash shuffle carrying
    (type, bucket) counts — map-side combined, bucket census is
    O(types x buckets) regardless of row count."""
    tune_for_oracle(spark)
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            "event_type",
            F.width_bucket(
                F.col("value"), F.lit(HIST_LO), F.lit(HIST_HI), F.lit(HIST_BUCKETS)
            ).alias("bucket"),
        )
        .groupBy("event_type", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


ORACLE_SQL["zorder_bucket_census"] = _zorder_census_sql()
# DuckDB has no width_bucket; the CASE replicates Spark's exact
# arithmetic (floor((v - lo) / ((hi - lo) / n)) + 1, out-of-range to
# 0 / n+1) so boundary values bucket identically in both engines.
ORACLE_SQL["dq_histogram"] = f"""
    SELECT event_type,
           CASE WHEN value < {HIST_LO} THEN 0
                WHEN value >= {HIST_HI} THEN {HIST_BUCKETS + 1}
                ELSE CAST(floor((value - {HIST_LO})
                          / (({HIST_HI} - {HIST_LO}) / {HIST_BUCKETS}))
                          AS BIGINT) + 1
           END AS bucket,
           count(*) AS cnt
    FROM events GROUP BY 1, 2
"""

QUERIES = {
    "dq_column_profile": dq_column_profile,
    "dq_null_violations": dq_null_violations,
    "zorder_bucket_census": zorder_bucket_census,
    "dq_histogram": dq_histogram,
}
