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

QUERIES = {
    "dq_column_profile": dq_column_profile,
    "dq_null_violations": dq_null_violations,
}
