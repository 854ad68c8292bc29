"""Run orchestration (reference etl_pipeline/pipeline.py:21-291).

The reference's run() is one thread interleaving transform + insert +
audit + commit per document. Here a run builds ONE declarative DAG per
collection — raw-JSON read -> MappingPlan projection -> (data_df,
audit_df) — plus a run-level audit union; execution happens when sinks
consume the frames (JDBC write, parquet write, or temp-view
registration), so Catalyst sees whole-collection plans and the
per-document loop disappears entirely.

Static-analysis phase parity (pipeline.py:43-92): expected-vs-input
collection diff, schema.sql table scan, table lookups, ingestion-date
stamp. Per-collection phase parity (:128-186): unmapped-collection
skip, NEW/MISSING/ALREADY_EXISTS object status, DDL-on-demand (JDBC
mode). Summary parity (reporting.py:36-95): the PipelineReport counters
are re-derived with aggregations over the audit frame — no mutable
driver-side accumulation.

Failure-isolation semantics (SURVEY §7 hard-part #2): the reference
rolls back individual failed INSERTs and continues (pipeline.py:238-249).
Here rows never fail mid-write: cast errors are captured as columns
during the transform (status='error' + transform audit), and the data
write excludes nothing — matching the reference, which still inserts
rows whose *values* failed conversion (as NULLs) and only loses rows on
DB-level insert errors.
"""

from __future__ import annotations

import datetime as _dt
import os
import re
from dataclasses import dataclass, field
from typing import Any, Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .config.defaults import (
    OBJECT_STATUS_ALREADY_EXISTS,
    OBJECT_STATUS_MISSING,
    OBJECT_STATUS_NEW,
    STATUS_ERROR,
    STATUS_SUCCESS,
)
from .config.loader import (
    load_config,
    normalize_table_name,
    validate_app_config,
    validate_mapping_config,
)
from .errors import ConfigError
from .operators.transform import missing_table_audit_rows, transform_collection
from .plans.mapping_plan import MappingPlan
from .sources.json_source import collections_to_raw_df, load_input_json


def load_schema_tables(schema_path: str) -> set[str]:
    """Regex scan of CREATE TABLE IF NOT EXISTS names in a schema.sql
    (reference etl_pipeline/schema_utils.py:8-21)."""
    if not schema_path or not os.path.exists(schema_path):
        return set()
    with open(schema_path, "r", encoding="utf-8") as fh:
        content = fh.read()
    matches = re.findall(r"CREATE TABLE IF NOT EXISTS\s+(\S+)", content, re.IGNORECASE)
    return {normalize_table_name(m.strip().rstrip("(")) for m in matches}


@dataclass
class RunResult:
    """Everything the reference's PipelineReport + side effects carried,
    as DataFrames and metadata. Frames are lazy until a sink runs them."""

    ingestion_date: str
    data_frames: dict[str, DataFrame]              # collection -> destination frame
    target_tables: dict[str, str]                  # collection -> target table
    audit_df: DataFrame                            # full run audit trail
    object_statuses: dict[str, str]                # object_name -> status
    missing_collections: set[str] = field(default_factory=set)
    unmapped_collections: set[str] = field(default_factory=set)
    missing_tables_input: set[str] = field(default_factory=set)
    missing_tables_db: set[str] = field(default_factory=set)
    # collection -> {original_column: renamed_column}, only when the
    # caller opted into on_duplicate="rename" and a collision actually
    # fired — the UI editor shows these renames to the user
    # (reference ui/mapping_editor.py:527-554); the backend run report
    # carries them so non-interactive callers see where data landed.
    rename_maps: dict[str, dict[str, str]] = field(default_factory=dict)

    def missing_collections_report(self, spark: SparkSession) -> DataFrame:
        """(ingestion_date, object_name, object_status) — reference
        ui/run_pipeline.py:413-421."""
        rows = [(self.ingestion_date, n, s) for n, s in sorted(self.object_statuses.items())]
        df = spark.createDataFrame(
            rows or [], "ingestion_date string, object_name string, object_status string"
        )
        return df.withColumn("ingestion_date", F.col("ingestion_date").cast("date"))

    def missing_attributes_report(self) -> DataFrame:
        """(ingestion_date, object_name, missing_columns) — the per-object
        union of missing-column sets (reference reporting.py:31-34 +
        ui/run_pipeline.py:424-433), derived from the audit frame with
        one partial-aggregated groupBy instead of driver mutation."""
        return (
            self.audit_df
            .groupBy("object_name")
            .agg(
                F.array_sort(
                    F.array_distinct(F.flatten(F.collect_list("missing_columns")))
                ).alias("missing_columns")
            )
            .where(F.size("missing_columns") > 0)
            .select(
                F.lit(self.ingestion_date).cast("date").alias("ingestion_date"),
                "object_name",
                "missing_columns",
            )
        )

    def summary(self) -> dict[str, Any]:
        """KPI + per-collection metrics (reference reporting.py:36-95),
        one aggregation pass over the audit frame."""
        # missing-TABLE audit rows carry processing_status='missing' and no
        # document; everything else is one row per processed document
        doc_rows = self.audit_df.where(F.col("processing_status").isin(
            STATUS_SUCCESS, STATUS_ERROR))
        agg = doc_rows.agg(
            F.count("*").alias("total_docs"),
            F.count(F.when(F.col("processing_status") == STATUS_ERROR, 1)).alias("error_docs"),
            F.count(F.when(F.size("missing_columns") > 0, 1)).alias("missing_col_docs"),
        ).collect()[0]
        per_collection = {
            r["source_collection"]: {"processed": r["processed"], "errors": r["errors"]}
            for r in doc_rows.groupBy("source_collection").agg(
                F.count("*").alias("processed"),
                F.count(F.when(F.col("processing_status") == STATUS_ERROR, 1)).alias("errors"),
            ).collect()
            if r["source_collection"] is not None
        }
        return {
            "ingestion_date": self.ingestion_date,
            "total_documents": agg["total_docs"],
            "successful_documents": agg["total_docs"] - agg["error_docs"],
            "documents_with_errors": agg["error_docs"],
            "documents_with_missing_columns": agg["missing_col_docs"],
            "insert_failures": 0,  # validate-before-write: see module docstring
            "missing_collections": sorted(self.missing_collections),
            "unmapped_collections": sorted(self.unmapped_collections),
            "missing_tables_input": sorted(self.missing_tables_input),
            "missing_tables_db": sorted(self.missing_tables_db),
            "object_statuses": dict(sorted(self.object_statuses.items())),
            "per_collection": per_collection,
            "rename_maps": {c: dict(m) for c, m in sorted(self.rename_maps.items())},
        }


def _resolve_config(config: str | Mapping | None, validator, default=None):
    if config is None:
        data = default if default is not None else {}
    elif isinstance(config, str):
        data = load_config(config)
    else:
        data = dict(config)
    return validator(data)


def run(
    spark: SparkSession,
    input_data: str | Mapping[str, list],
    mapping_config: str | Mapping,
    app_config: str | Mapping | None = None,
    existing_tables: set[str] | None = None,
    ingestion_date: str | None = None,
    on_duplicate: str = "error",
) -> RunResult:
    """Plan a full pipeline run; returns lazy frames + metadata.

    ``input_data`` is a multi-collection JSON path or an in-memory
    ``{collection: [doc, ...]}`` dict. ``existing_tables`` stands in for
    the loader.table_exists probes (reference pipeline.py:145) — in JDBC
    mode pass the actual catalog state, tests pass sets directly.
    """
    from .config.defaults import default_app_config

    app = _resolve_config(app_config, validate_app_config, default_app_config())
    mapping = _resolve_config(
        mapping_config,
        lambda cfg: validate_mapping_config(cfg, on_duplicate=on_duplicate),
    )
    runtime = app["runtime"]
    audit_cfg = app["audit"]

    if isinstance(input_data, str):
        data = load_input_json(input_data)
    else:
        from .sources.json_source import validate_input_shape

        data = validate_input_shape(dict(input_data))

    # --- static analysis phase (reference pipeline.py:43-92) ---
    schema_tables = load_schema_tables(runtime.get("schema_path", ""))
    audit_schema = (audit_cfg.get("audit_schema") or "").lower()
    audit_table = normalize_table_name(audit_cfg.get("audit_table", "doc_audit.ingestion_audit"))
    schema_tables_no_audit = {
        t for t in schema_tables
        if t != audit_table and not (audit_schema and t.startswith(audit_schema + "."))
    }

    collections_cfg = mapping  # validate_mapping_config returns the flat shape
    expected = set(collections_cfg)
    input_collections = set(data)
    missing_collections = expected - input_collections

    table_lookup: dict[str, str] = {}
    table_to_collection: dict[str, str] = {}
    for coll, spec in collections_cfg.items():
        norm = normalize_table_name(spec["target_table"])
        table_lookup[norm] = spec["target_table"]
        table_to_collection[norm] = coll

    input_tables = {
        normalize_table_name(collections_cfg[c]["target_table"])
        for c in input_collections if c in collections_cfg
    }
    missing_input_tables = schema_tables_no_audit - input_tables

    ing_date = ingestion_date or _dt.datetime.now(_dt.timezone.utc).date().isoformat()
    existing = {normalize_table_name(t) for t in (existing_tables or set())}

    # --- per-collection DAGs (reference pipeline.py:128-186) ---
    object_statuses: dict[str, str] = {}
    missing_tables_db: set[str] = set()
    unmapped: set[str] = set()
    data_frames: dict[str, DataFrame] = {}
    target_tables: dict[str, str] = {}
    audit_parts: list[DataFrame] = []

    for table in sorted(missing_input_tables):
        object_statuses[table_lookup.get(table, table)] = OBJECT_STATUS_MISSING
    if missing_input_tables:
        audit_parts.append(missing_table_audit_rows(
            spark,
            [table_lookup.get(t, t) for t in sorted(missing_input_tables)],
            {table_lookup.get(t, t): table_to_collection.get(t) for t in missing_input_tables},
            ingested_at=ing_date,
        ))

    raw_frames = collections_to_raw_df(spark, data)
    for coll in sorted(input_collections):
        spec = collections_cfg.get(coll)
        if spec is None:
            unmapped.add(coll)
            continue
        target = spec["target_table"]
        norm = normalize_table_name(target)
        in_schema = norm in schema_tables_no_audit
        exists = norm in existing
        if exists:
            status = OBJECT_STATUS_ALREADY_EXISTS
        elif not in_schema:
            status = OBJECT_STATUS_NEW  # will be auto-created
        else:
            status = OBJECT_STATUS_MISSING
            missing_tables_db.add(target)
        object_statuses[target] = status

        plan = MappingPlan.from_config(coll, spec, date_formats=runtime.get("date_formats"))
        data_df, audit_df = transform_collection(
            raw_frames[coll], plan, object_status=status, ingested_at=ing_date
        )
        data_frames[coll] = data_df
        target_tables[coll] = target
        audit_parts.append(audit_df)

    if audit_parts:
        audit_df = audit_parts[0]
        for part in audit_parts[1:]:
            audit_df = audit_df.unionByName(part)
    else:
        audit_df = spark.createDataFrame([], (
            "ingested_at timestamp, object_id string, source_collection string, "
            "object_name string, object_status string, "
            "missing_columns array<string>, processing_status string"
        ))

    return RunResult(
        ingestion_date=ing_date,
        data_frames=data_frames,
        target_tables=target_tables,
        audit_df=audit_df,
        object_statuses=object_statuses,
        missing_collections=missing_collections,
        unmapped_collections=unmapped,
        missing_tables_input={table_lookup.get(t, t) for t in missing_input_tables},
        missing_tables_db=missing_tables_db,
        rename_maps={
            c: spec["rename_map"] for c, spec in collections_cfg.items()
            if spec.get("rename_map")
        },
    )


def write_run_jdbc(spark: SparkSession, result: RunResult, app_config: Mapping,
                   mapping: Mapping) -> None:
    """Sink a run into Postgres: DDL bootstrap + batched appends
    (reference pipeline.py:94-101 connect/DDL + per-doc inserts,
    re-expressed as 1 bootstrap + N partition-parallel writes)."""
    from .sinks import jdbc

    db = app_config["database"]
    collections = mapping.get("collections", mapping)
    plans = [
        MappingPlan.from_config(c, s) for c, s in collections.items()
        if c in result.data_frames
    ]
    jdbc.bootstrap_destination(spark, db, plans)
    for coll, df in result.data_frames.items():
        jdbc.write_table(df, result.target_tables[coll], db)
    jdbc.write_table(
        result.audit_df.withColumn("missing_columns", F.to_json("missing_columns")),
        app_config["audit"]["audit_table"], db,
    )
    jdbc.write_table(result.missing_collections_report(spark),
                     "doc_audit.missing_collections_report", db)
    jdbc.write_table(
        result.missing_attributes_report().withColumn(
            "missing_columns", F.to_json("missing_columns")),
        "doc_audit.missing_attributes_report", db,
    )


def write_run_parquet(result: RunResult, out_dir: str) -> None:
    """DB-less sink: destination + audit + report frames as parquet
    (the engine's native staging format; JDBC is a swap-in)."""
    for coll, df in result.data_frames.items():
        df.write.mode("overwrite").parquet(os.path.join(out_dir, f"data_{coll}.parquet"))
    result.audit_df.write.mode("overwrite").parquet(os.path.join(out_dir, "ingestion_audit.parquet"))
    result.missing_attributes_report().write.mode("overwrite").parquet(
        os.path.join(out_dir, "missing_attributes_report.parquet"))


def format_summary(summary: Mapping[str, Any]) -> str:
    """Human-readable run summary (reference reporting.py:36-95 shape)."""
    lines = [
        "ETL Summary",
        f"Ingestion date: {summary['ingestion_date']}",
        "",
        "KPI Summary:",
        f"  Total documents: {summary['total_documents']}",
        f"  Successful documents: {summary['successful_documents']}",
        f"  Documents with errors: {summary['documents_with_errors']}",
        f"  Documents with missing columns: {summary['documents_with_missing_columns']}",
        f"  Insert failures: {summary['insert_failures']}",
        "",
        "Input coverage:",
        f"  Missing collections: {', '.join(summary['missing_collections']) or 'None'}",
        f"  Unmapped collections: {', '.join(summary['unmapped_collections']) or 'None'}",
        f"  Missing tables in schema.sql: {', '.join(summary['missing_tables_input']) or 'None'}",
        f"  Missing tables in database: {', '.join(summary['missing_tables_db']) or 'None'}",
    ]
    if summary["per_collection"]:
        lines += ["", "Per-collection metrics:"]
        for coll in sorted(summary["per_collection"]):
            m = summary["per_collection"][coll]
            lines.append(f"  {coll:<20} processed={m['processed']} errors={m['errors']}")
    if summary["object_statuses"]:
        lines += ["", "Object statuses:"]
        lines += [f"  - {k}: {v}" for k, v in summary["object_statuses"].items()]
    return "\n".join(lines)


def write_with_metrics(df: DataFrame, path: str,
                       metrics: Mapping[str, Any] | None = None) -> dict:
    """Write ``df`` to parquet while collecting audit metrics IN the
    same pass via Spark's Observation API — the engine-side answer to
    the reference's per-document counters (pipeline.py:188-284
    increments success/error tallies as it loops): here the counters
    ride the write job's tasks, so the table lands AND its run-report
    numbers exist after ONE scan, no second aggregation job over the
    data.

    ``metrics`` maps metric name -> aggregate Column (e.g.
    ``{"n_errors": F.count(F.when(F.col("status") == "error", 1))}``);
    a ``rows_written`` count is always included. Returns the collected
    metric dict after the write completes.
    """
    from pyspark.sql import Observation

    obs = Observation("write_metrics")
    agg_cols = [F.count(F.lit(1)).alias("rows_written")]
    for name, col in (metrics or {}).items():
        agg_cols.append(col.alias(name))
    observed = df.observe(obs, *agg_cols)
    observed.write.mode("overwrite").parquet(path)
    return dict(obs.get)
