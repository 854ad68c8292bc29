"""Incremental load path: streaming documents -> mapping transform ->
per-micro-batch sink (SURVEY §7 phase 6a).

The reference's only incrementality is re-running the whole batch
pipeline (etl_pipeline/pipeline.py:91-92 stamps a fresh ingestion_date
per run). The idiomatic Spark replacement is a Structured Streaming
source feeding the SAME mapping/transform engine per micro-batch, with
``foreachBatch`` fanning each batch out to the two JDBC sinks (data
table + audit table) exactly like the batch path does.

Delivery semantics: foreachBatch + JDBC append is at-least-once — a
retried micro-batch re-appends. Production dedup key: (batch_id stamped
into the rows, object_id); the checkpoint guarantees batch_id stability
across retries, so a MERGE/upsert keyed on it is exactly-once. Batch
writes stay partition-parallel (write_table caps connections and keeps
one transaction per partition).
"""

from __future__ import annotations

import tempfile
from collections.abc import Callable, Mapping

from pyspark.sql import DataFrame

from ..operators.transform import transform_collection
from ..plans.mapping_plan import MappingPlan
from ..sinks.jdbc import write_table

AUDIT_TABLE = "doc_audit.ingestion_audit"

BatchWriter = Callable[[DataFrame, DataFrame, int], None]


def jdbc_batch_writer(plan: MappingPlan, db_config: Mapping,
                      audit_table: str = AUDIT_TABLE) -> BatchWriter:
    """Production writer: append data + audit frames over JDBC
    (mirrors the reference's per-document data+audit insert pair,
    pipeline.py:238-266, at micro-batch granularity)."""

    def write(data_df: DataFrame, audit_df: DataFrame, batch_id: int) -> None:
        write_table(data_df, plan.target_table, db_config, mode="append")
        write_table(audit_df, audit_table, db_config, mode="append")

    return write


def stream_load(stream_df: DataFrame, plan: MappingPlan,
                batch_writer: BatchWriter, raw_col: str | None = None,
                checkpoint_dir: str | None = None, ingested_at=None):
    """Run the mapping transform over every micro-batch of ``stream_df``
    (a streaming DataFrame with the collection's raw JSON documents) and
    hand (data_df, audit_df) to ``batch_writer``.

    Returns the started StreamingQuery (availableNow trigger: drain
    what's available, then stop — callers own awaitTermination). Swap
    the trigger for a processing-time interval on an unbounded source;
    nothing else changes.
    """

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        data, audit = transform_collection(
            batch_df, plan, raw_col=raw_col, ingested_at=ingested_at
        )
        batch_writer(data, audit, batch_id)

    return (
        stream_df.writeStream.foreachBatch(_process)
        .trigger(availableNow=True)
        .option(
            "checkpointLocation",
            checkpoint_dir or tempfile.mkdtemp(prefix="ckpt_load_"),
        )
        .start()
    )
