"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)    -> flagship query over /root/testdata/sf0.001
queries()       -> {name: (spark, sf_dir) -> DataFrame} per SURVEY.md §2
oracle_sql()    -> {name: DuckDB-equivalent ANSI SQL}

Implementations live in etl_pipeline_from_mongo_json_to_postgre_spark/
(operators/analytics.py, operators/transform_queries.py, ...); this
module only assembles the registries.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_pipeline_from_mongo_json_to_postgre_spark.operators import (
    analytics,
    dedup,
    multimodal,
    scalar_funcs,
    similarity,
    skew,
    text_queries,
    transform_queries,
)
from etl_pipeline_from_mongo_json_to_postgre_spark.streaming import events as streaming_events

_MODULES = (analytics, transform_queries, scalar_funcs, text_queries, dedup,
            similarity, skew, multimodal, streaming_events)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: ingest orders+lineitem as JSON document collections
    through the mapping/transform engine, pivot the audit trail
    (object_name x processing_status) — the reference's dashboard A1
    over a real engine-produced audit frame."""
    return transform_queries.audit_status_pivot(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        out.update(mod.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _MODULES:
        out.update(mod.ORACLE_SQL)
    return out
