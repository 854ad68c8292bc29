"""Error-capturing, multi-format Column-expression builders.

This is the Spark-first re-expression of the reference's per-value
transform engine (etl_pipeline/transformer.py:43-125): every logical
type becomes a *pure Column expression* (JVM-side, vectorized under
whole-stage codegen), never a Python UDF. Failure semantics follow the
reference: a cast failure yields (NULL, error-message) instead of an
exception — we use try_cast/try-parse forms so the plan works under
both ANSI and legacy modes.

Extensible registry: ``register_type(name, builder)`` mirrors the
reference's runtime.type_mappings extensibility (config/app_config.yaml:26-42).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..config.defaults import DEFAULT_DATE_FORMATS
from ..config.loader import normalize_type
from .datetime_fmt import has_time_component, strptime_to_java, strptime_to_regex

TRUTHY = ("true", "t", "yes", "y", "1")
FALSY = ("false", "f", "no", "n", "0")


def _try_cast(col: Column, dtype: str) -> Column:
    """NULL-on-failure cast independent of spark.sql.ansi.enabled."""
    try:
        return col.try_cast(dtype)  # Spark >= 4.0 / 3.5 Column API
    except AttributeError:  # pragma: no cover - older Spark
        return col.cast(dtype)


def try_to_timestamp(col: Column, java_fmt: str) -> Column:
    try:
        return F.try_to_timestamp(col, F.lit(java_fmt))
    except AttributeError:  # pragma: no cover - older Spark
        return F.to_timestamp(col, java_fmt)


def multi_format_timestamp(col: Column, formats: list[str] | None = None) -> Column:
    """First-match-wins multi-format parse (reference transformer.py:82-111).

    Each formatter attempt is guarded by a compiled regex (RLIKE) so a
    row pays ~one Java formatter invocation instead of up to N failed
    attempts; coalesce keeps the reference's ordered-format semantics.
    Date-only formats parse to midnight, matching
    datetime.combine(value, time.min).
    """
    formats = formats or DEFAULT_DATE_FORMATS
    attempts = [
        F.when(col.rlike(strptime_to_regex(f)), try_to_timestamp(col, strptime_to_java(f)))
        for f in formats
    ]
    return F.coalesce(*attempts)


def multi_format_date(col: Column, formats: list[str] | None = None) -> Column:
    """Multi-format date parse; datetime-bearing formats truncate to the
    date part (reference transformer.py:82-95 takes .date())."""
    return multi_format_timestamp(col, formats).cast("date")


def normalize_boolean(col: Column) -> Column:
    """Truthy/falsy string table + numeric fallback
    (reference transformer.py:114-125): {true,t,yes,y,1}/{false,f,no,n,0}
    case/whitespace-insensitive; numbers -> value != 0; else NULL.

    NB: F.trim strips only ASCII spaces; the reference's str.strip()
    strips ALL whitespace (tabs, newlines, ...), so trim via regex —
    found by the hypothesis property test."""
    norm = F.lower(F.regexp_replace(col.cast("string"), r"^\s+|\s+$", ""))
    as_num = _try_cast(norm, "double")
    return (
        F.when(norm.isin(*TRUTHY), F.lit(True))
        .when(norm.isin(*FALSY), F.lit(False))
        .when(as_num.isNotNull(), as_num != 0)
        .otherwise(F.lit(None).cast("boolean"))
    )


def cast_integer(col: Column, dtype: str = "int") -> Column:
    """int()-like cast: numeric strings and floats truncate toward zero,
    non-numeric -> NULL (reference transformer.py:58-61 + int() semantics).
    Going through decimal keeps 19-digit longs exact (double would not).
    """
    # decimal -> integral cast already truncates toward zero in Spark,
    # and try_cast NULLs on overflow; one decimal parse per value.
    as_dec = _try_cast(F.trim(col.cast("string")), "decimal(38,18)")
    return _try_cast(as_dec, dtype)


# type name -> (value_expr_builder, spark_sql_type)
_TypeBuilder = Callable[[Column, dict], Column]
_REGISTRY: dict[str, tuple[_TypeBuilder, str]] = {}


def register_type(names: list[str], spark_type: str, builder: _TypeBuilder) -> None:
    for n in names:
        _REGISTRY[normalize_type(n)] = (builder, spark_type)


register_type(["text", "string", "varchar"], "string", lambda c, _: c.cast("string"))
register_type(["integer", "int"], "int", lambda c, _: cast_integer(c, "int"))
register_type(["bigint"], "bigint", lambda c, _: cast_integer(c, "bigint"))
register_type(["smallint"], "smallint", lambda c, _: cast_integer(c, "smallint"))
register_type(
    ["float", "double", "double precision"],
    "double",
    lambda c, _: _try_cast(F.trim(c.cast("string")), "double"),
)
register_type(
    ["numeric", "decimal"],
    "decimal(38,18)",
    # Decimal(str(value)) — through string to avoid float artifacts
    # (reference transformer.py:62-63)
    lambda c, _: _try_cast(F.trim(c.cast("string")), "decimal(38,18)"),
)
register_type(["boolean", "bool"], "boolean", lambda c, _: normalize_boolean(c))
register_type(
    ["date"], "date", lambda c, opts: multi_format_date(c, opts.get("date_formats"))
)
register_type(
    ["datetime"],
    "timestamp",
    lambda c, opts: multi_format_timestamp(c, opts.get("date_formats")),
)


def spark_type_for(logical_type: str) -> str:
    t = normalize_type(logical_type)
    if t not in _REGISTRY:
        raise KeyError(f"unsupported logical type: {logical_type}")
    return _REGISTRY[t][1]


def build_cast(col: Column, logical_type: str, opts: dict | None = None) -> Column:
    """Value expression for a logical type; NULL on uncastable input."""
    t = normalize_type(logical_type)
    if t not in _REGISTRY:
        raise KeyError(f"unsupported logical type: {logical_type}")
    builder, _ = _REGISTRY[t]
    return builder(col, opts or {})


def cast_error(source: Column, casted: Column, attr: str, logical_type: str) -> Column:
    """Companion error expression (reference transformer.py:36-38,76-77):
    source present and non-null but cast produced NULL -> error message."""
    msg = f"{attr}: invalid {normalize_type(logical_type)} value"
    return F.when(source.isNotNull() & casted.isNull(), F.lit(msg))
