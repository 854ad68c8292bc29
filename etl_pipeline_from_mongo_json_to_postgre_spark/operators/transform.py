"""Collection transform: raw documents -> (data_df, audit_df).

Spark-first re-expression of the reference's per-document loop
(etl_pipeline/pipeline.py:188-284): one declarative DAG per collection
with two outputs — the destination-table frame and the audit-trail
frame — instead of per-row transform+insert+commit. Row-level failures
become audit columns (validate-before-write), which strengthens the
reference's per-row rollback semantics (SURVEY.md §7 hard-part #2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config.defaults import (
    OBJECT_STATUS_ALREADY_EXISTS,
    OBJECT_STATUS_MISSING,
    OBJECT_STATUS_NEW,
    STATUS_ERROR,
    STATUS_MISSING,
    STATUS_SUCCESS,
)
from ..plans.mapping_plan import MappingPlan


def transform_collection(
    df: DataFrame,
    plan: MappingPlan,
    raw_col: str | None = None,
    object_status: str = OBJECT_STATUS_NEW,
    ingested_at=None,
) -> tuple[DataFrame, DataFrame]:
    """Apply a MappingPlan; return (data_df, audit_df).

    data_df columns: mapped columns + raw_json + ingested_at +
    source_collection + status  (reference sql/schema.sql:1-10 shape).
    audit_df columns: ingested_at, object_id, source_collection,
    object_name, object_status, missing_columns, processing_status
    (reference sql/schema.sql:25-33, etl_pipeline/audit.py:13-31).

    ``ingested_at`` may be pinned to a literal timestamp for
    deterministic tests; defaults to current_timestamp() (reference
    stamps one ingestion_date per run, pipeline.py:91-92).
    """
    ts = F.lit(ingested_at).cast("timestamp") if ingested_at is not None else F.current_timestamp()
    projected = plan.apply(df, raw_col=raw_col)

    status = F.when(F.size("transform_errors") > 0, F.lit(STATUS_ERROR)).otherwise(
        F.lit(STATUS_SUCCESS)
    )
    enriched = (
        projected.withColumn("ingested_at", ts)
        .withColumn("source_collection", F.lit(plan.collection))
        .withColumn("status", status)
    )

    data_cols = [a.column for a in plan.attributes] + [
        plan.raw_json_column,
        "ingested_at",
        "source_collection",
        "status",
    ]
    data_df = enriched.select(*data_cols)

    audit_df = enriched.select(
        F.col("ingested_at"),
        F.col("_object_id").alias("object_id"),
        F.col("source_collection"),
        F.lit(plan.target_table).alias("object_name"),
        F.lit(object_status).alias("object_status"),
        F.array_sort("missing_columns").alias("missing_columns"),
        F.col("status").alias("processing_status"),
    )
    return data_df, audit_df


def missing_table_audit_rows(spark, tables: list[str], collection_lookup: dict[str, str],
                             ingested_at=None) -> DataFrame:
    """One audit row per expected table absent from the input
    (reference pipeline.py:103-126): object_status=MISSING,
    processing_status=missing, no object_id, empty missing_columns."""
    ts = F.lit(ingested_at).cast("timestamp") if ingested_at is not None else F.current_timestamp()
    rows = [(t, collection_lookup.get(t)) for t in sorted(tables)]
    df = spark.createDataFrame(rows, "object_name string, source_collection string")
    return df.select(
        ts.alias("ingested_at"),
        F.lit(None).cast("string").alias("object_id"),
        F.col("source_collection"),
        F.col("object_name"),
        F.lit(OBJECT_STATUS_MISSING).alias("object_status"),
        F.array().cast("array<string>").alias("missing_columns"),
        F.lit(STATUS_MISSING).alias("processing_status"),
    )


def classify_object_status(table: str, schema_tables: set[str], existing_tables: set[str]) -> str:
    """NEW / ALREADY_EXISTS classification (reference pipeline.py:147-152)."""
    if table in existing_tables:
        return OBJECT_STATUS_ALREADY_EXISTS
    if table in schema_tables:
        return OBJECT_STATUS_NEW
    return OBJECT_STATUS_NEW
