"""Multi-collection JSON input scan (reference S1/S2).

Input contract (reference etl_pipeline/ingestion.py:7-30): one JSON
object ``{collection_name: [document, ...]}``. The reference
materializes the whole file in driver RAM (json.load); here the
*shape validation* stays driver-side and cheap (read only the top-level
keys), while document data flows through Spark as a raw-JSON string
column per collection — at scale, per-collection line-delimited JSON
or parquet staging replaces the single file, with the same API.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..errors import InputError


def validate_input_shape(data: object) -> dict[str, list]:
    """Strict dict -> list -> dict nesting (reference ingestion.py:15-28)."""
    if not isinstance(data, dict):
        raise InputError("input root must be a JSON object of collections")
    for name, docs in data.items():
        if not isinstance(docs, list):
            raise InputError(f"collection '{name}' must be a list of documents")
        for d in docs:
            if not isinstance(d, dict):
                raise InputError(f"collection '{name}' contains a non-object document")
    return data


def load_input_json(path: str) -> dict[str, list]:
    """Driver-side load + validation (reference ingestion.py:7-30).

    Suitable for config-scale inputs; for data-scale inputs use
    read_collections_distributed.
    """
    try:
        with open(path, "r", encoding="utf-8") as fh:
            data = json.load(fh)
    except json.JSONDecodeError as exc:
        raise InputError(f"invalid JSON input: {exc}") from exc
    return validate_input_shape(data)


def collections_to_raw_df(
    spark: SparkSession, data: dict[str, list]
) -> dict[str, DataFrame]:
    """Each collection -> DataFrame with a single ``raw_json`` string
    column (one JSON document per row). Document structure stays opaque
    until a MappingPlan projects it — mirrors the reference keeping the
    full document for the raw-JSON column (pipeline.py:231-233)."""
    out: dict[str, DataFrame] = {}
    for name, docs in data.items():
        rows = [(json.dumps(d, default=str),) for d in docs]
        if rows:
            df = spark.createDataFrame(rows, "raw_json string")
        else:
            df = spark.createDataFrame([], "raw_json string")
        out[name] = df
    return out


def read_collection_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Data-scale input path: one collection as line-delimited JSON
    (the staging format the module docstring promises). Reads as raw
    TEXT, not spark.read.json — schema stays opaque until a MappingPlan
    projects it (identical to collections_to_raw_df), and malformed
    lines are PRESERVED as rows instead of being dropped or shunted to
    a _corrupt_record column: the transform engine flags them as
    per-document errors in the audit trail (plans/mapping_plan.py),
    which is the reference's failed-document semantics, not a silent
    data loss. Blank lines are skipped (they are formatting, not
    documents). Splittable + partition-parallel at any size."""
    return (
        spark.read.text(path)
        .where(F.length(F.trim(F.col("value"))) > 0)
        .select(F.col("value").alias("raw_json"))
    )


def read_collections_distributed(
    spark: SparkSession, path: str, collections: list[str],
    as_variant: bool = False,
) -> dict[str, DataFrame]:
    """Distributed variant: spark.read reads the multi-collection file,
    one explode per collection (reference S1's Spark mapping, SURVEY
    §2.1). Best for large single-file inputs; each collection becomes
    raw-JSON rows via to_json so the MappingPlan path is identical.

    ``as_variant=True`` (VERDICT r6 task 7) lands each document as a
    Spark 4 VARIANT column ``doc`` instead of a raw_json string: the
    document is parsed ONCE at ingest and every downstream mapped
    extraction is a try_variant_get against the binary-encoded value —
    no re-parse per attribute (operators/variant_ingest.py is the
    mapped-projection consumer; plan-pinned single parse)."""
    base = spark.read.option("multiLine", True).json(path)
    out: dict[str, DataFrame] = {}
    for name in collections:
        if name not in base.columns:
            continue
        raw = base.select(
            F.explode(F.col(name)).alias("_doc")
        ).select(F.to_json("_doc").alias("raw_json"))
        out[name] = (
            raw.select(F.parse_json("raw_json").alias("doc"))
            if as_variant else raw
        )
    return out
