from .casts import (
    FALSY,
    TRUTHY,
    build_cast,
    cast_error,
    cast_integer,
    multi_format_date,
    multi_format_timestamp,
    normalize_boolean,
    register_type,
    spark_type_for,
)
from .datetime_fmt import has_time_component, strptime_to_java, translate_formats

__all__ = [
    "FALSY",
    "TRUTHY",
    "build_cast",
    "cast_error",
    "cast_integer",
    "multi_format_date",
    "multi_format_timestamp",
    "normalize_boolean",
    "register_type",
    "spark_type_for",
    "has_time_component",
    "strptime_to_java",
    "translate_formats",
]
