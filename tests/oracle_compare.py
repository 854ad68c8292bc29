"""Local mirror of the driver's DuckDB-oracle comparison.

Row-count + name-sorted columns + order-insensitive value comparison.
Used by tests and by ad-hoc parity runs; exact equality by design (the
engine keeps aggregate math exact via DECIMAL, so no FP tolerance is
needed — a mismatch is a bug, not noise).
"""

from __future__ import annotations

import datetime
import decimal
import math
import os

import duckdb

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        # exact, not through float (r10 review: repr(float(v)) washed
        # out differences beyond ~17 significant digits, a silent false
        # PASS for DECIMAL(38,18)-class aggregates); format(.., 'f')
        # avoids normalize()'s E-notation for integral values
        if v.is_nan():
            return "NaN"
        return format(v.normalize(), "f")
    if isinstance(v, datetime.datetime):
        # a tz-AWARE value (e.g. TIMESTAMPTZ fetched in host-local
        # time) must be converted to UTC before the naive strip, or
        # the comparison would read its local wall clock (r10 review)
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, dict):
        # duckdb STRUCT/MAP values arrive as dict; Spark MAP too —
        # key-sorted so engine-side ordering can't leak in
        return "{" + ",".join(
            f"{_canon(k)}:{_canon(x)}"
            for k, x in sorted(v.items(), key=lambda kv: str(kv[0]))
        ) + "}"
    if isinstance(v, tuple) and hasattr(v, "asDict"):
        # Spark Row (STRUCT): canonicalize like the duckdb dict form
        return _canon(v.asDict())
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def _rows_canon(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i].lower())
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


def compare(spark_df, con, sql: str) -> tuple[bool, str]:
    spark_cols = [c.lower() for c in spark_df.columns]
    spark_rows = spark_df.collect()
    rel = con.sql(sql)
    duck_cols = [c.lower() for c in rel.columns]
    duck_rows = rel.fetchall()
    if sorted(spark_cols) != sorted(duck_cols):
        return False, f"columns differ: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    if len(spark_rows) != len(duck_rows):
        return False, f"row count differs: spark={len(spark_rows)} duck={len(duck_rows)}"
    a = _rows_canon(spark_df.columns, [tuple(r) for r in spark_rows])
    b = _rows_canon(rel.columns, duck_rows)
    if a != b:
        diffs = [i for i, (x, y) in enumerate(zip(a, b)) if x != y][:3]
        detail = "; ".join(f"row{i}: spark={a[i]} duck={b[i]}" for i in diffs)
        return False, f"values differ ({sum(x != y for x, y in zip(a, b))} rows): {detail}"
    return True, "ok"
