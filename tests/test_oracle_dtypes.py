"""Oracle/engine result-dtype parity audit.

The driver's correctness gate hashes values after converting both sides
to pandas; a DuckDB integer window/aggregate ``sum()`` silently widens to
HUGEINT (surfacing as float64/object in pandas) while Spark stays
LongType, producing a hash mismatch even when every value is identical
(round-2 ``mm_binary_stats``, round-3 ``inc_scd2_intervals``). This test
kills the whole bug class structurally: for EVERY registry entry with a
SQL oracle it compares DuckDB's *planned* result types (lazy — no data
execution) against the Spark DataFrame schema and fails on any pairing
that would round-trip to different pandas dtypes.
"""

from __future__ import annotations

import os
import re

import pytest

from tests.oracle_compare import duckdb_conn

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TINY", "/root/testdata/sf0.001")

# DuckDB type name -> the pandas-level family the driver's hash sees.
_DUCK_FAMILY = {
    "TINYINT": "int", "SMALLINT": "int", "INTEGER": "int", "BIGINT": "int",
    "UTINYINT": "int", "USMALLINT": "int", "UINTEGER": "int", "UBIGINT": "int",
    "HUGEINT": "hugeint",  # widens to float64/object in pandas — never OK
    "FLOAT": "float", "DOUBLE": "float",
    "VARCHAR": "str", "BOOLEAN": "bool", "BLOB": "bytes",
    "DATE": "date", "TIME": "time",
    "TIMESTAMP": "ts", "TIMESTAMP WITH TIME ZONE": "ts",
    "TIMESTAMP_NS": "ts", "TIMESTAMP_MS": "ts", "TIMESTAMP_S": "ts",
    "INTERVAL": "interval",
}


def _duck_family(type_str: str) -> str:
    s = str(type_str).upper()
    if s.startswith("DECIMAL"):
        return "float"  # both sides canonicalize decimals to float
    if s.endswith("[]") or s.startswith("STRUCT") or s.startswith("MAP"):
        return "nested"
    return _DUCK_FAMILY.get(s, s)


def _spark_family(dt) -> str:
    from pyspark.sql import types as T

    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType, T.DecimalType)):
        return "float"
    if isinstance(dt, T.StringType):
        return "str"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.BinaryType):
        return "bytes"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "ts"
    if isinstance(dt, (T.ArrayType, T.StructType, T.MapType)):
        return "nested"
    return str(dt)


def _entries():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    return [(name, q[name], sql) for name, sql in o.items() if name in q]


@pytest.fixture(scope="module")
def duck():
    con = duckdb_conn(SF_DIR)
    yield con
    con.close()


def test_every_oracle_dtype_matches_engine(spark, duck):
    """No entry may plan a DuckDB result type whose pandas family differs
    from the Spark schema family — the exact driver hash-mismatch class."""
    problems = []
    for name, fn, sql in _entries():
        try:
            sdf = fn(spark, SF_DIR)
            s_types = {c.lower(): _spark_family(f.dataType)
                       for c, f in zip(sdf.columns, sdf.schema.fields)}
        except Exception as exc:  # pragma: no cover - surfaced as failure
            problems.append(f"{name}: spark-side build failed: {exc}")
            continue
        try:
            rel = duck.sql(sql)
            d_types = {c.lower(): _duck_family(t)
                       for c, t in zip(rel.columns, rel.types)}
        except Exception as exc:  # pragma: no cover - surfaced as failure
            problems.append(f"{name}: duckdb plan failed: {exc}")
            continue
        for col, fam in d_types.items():
            if fam == "hugeint":
                problems.append(
                    f"{name}.{col}: DuckDB HUGEINT (un-cast integer sum) "
                    f"vs spark {s_types.get(col)}")
            elif col in s_types and s_types[col] != fam:
                problems.append(
                    f"{name}.{col}: duck={fam} spark={s_types[col]}")
    assert not problems, (
        f"{len(problems)} dtype mismatches would hash-fail at the driver:\n"
        + "\n".join(sorted(problems)))


def test_no_uncast_integer_window_sum_in_oracles():
    """Static guard: an emitted window sum over an integer expression must
    be wrapped in CAST(... AS BIGINT/DOUBLE). Heuristic: flag `sum(x) OVER`
    occurrences whose enclosing ~120 chars contain no CAST — curated
    allowlist for internal-only columns (GROUP BY keys never emitted)."""
    import __spark_entry__ as e

    # window sums that never reach the output schema (session-number keys
    # consumed by a downstream GROUP BY, or pre-aggregation staging):
    allow = {
        "stream_sessionize", "stream_sessionize_native", "j7_interval_join",
        "session_top_paths", "sessions_concurrency_daily",
        "part_abc_classification", "inc_scd2_intervals",
    }
    pat = re.compile(r"sum\s*\([^()]*\)\s+OVER", re.IGNORECASE)
    offenders = []
    for name, sql in e.oracle_sql().items():
        for m in pat.finditer(sql):
            ctx = sql[max(0, m.start() - 60):m.start()]
            if "CAST" in ctx.upper():
                continue
            if name in allow:
                continue
            offenders.append(f"{name}: ...{sql[m.start():m.end()+40]}...")
    assert not offenders, (
        "un-cast window sums (DuckDB widens to HUGEINT):\n"
        + "\n".join(offenders))
