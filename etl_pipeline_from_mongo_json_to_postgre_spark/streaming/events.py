"""Structured Streaming over the events table (SURVEY §2.8 extension).

The reference's only incrementality is "re-run the batch"
(pipeline.py:91-92 stamps ingestion_date per run); the idiomatic Spark
replacement is readStream -> windowed aggregation with watermark ->
sink. The batch twin (operators/analytics.tumbling_window_agg) shares
the same plan shape, so correctness is oracle-checked there; these
functions run the *streaming* execution path (availableNow trigger for
bounded runs, memory/foreachBatch sinks).

At scale: the parquet source becomes Kafka/files-on-arrival, the
memory sink becomes foreachBatch JDBC (mirroring the reference's
Postgres load), and the watermark bounds state for late data.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_table


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet (schema taken from a batch
    read through the nanos-safe loader)."""
    load_table(spark, sf_dir, "events")  # side effect: sets nanosAsLong conf
    src = os.path.join(sf_dir, "events.parquet")
    raw_schema = spark.read.parquet(src).schema
    # The file-stream source needs a *directory* to watch (its basePath
    # must be a directory); the testdata table is a single file, so
    # expose it through a symlink dir. In production this is the
    # landing directory files arrive into.
    watch_dir = tempfile.mkdtemp(prefix="events_stream_")
    os.symlink(src, os.path.join(watch_dir, "events.parquet"))
    stream = (
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(watch_dir)
    )
    # same nanos->timestamp conversion as the batch loader
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    return stream


def windowed_counts(stream: DataFrame, window: str = "1 hour",
                    watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window counts + exact decimal sum with late-data
    watermark — the streaming twin of tumbling_window_agg."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("value_sum"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "cnt", "value_sum")
    )


def run_stream_to_memory(spark: SparkSession, sf_dir: str,
                         table_name: str = "stream_windowed") -> DataFrame:
    """Execute the windowed aggregation through the streaming engine
    (availableNow: process everything available, then stop) into a
    memory sink; returns the final result DataFrame."""
    q = (
        windowed_counts(events_stream(spark, sf_dir))
        .writeStream.format("memory")
        .queryName(table_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
        .start()
    )
    q.awaitTermination()
    return spark.table(table_name)


def stream_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """queries() entry: full streaming execution, oracle-checked
    against the equivalent batch SQL."""
    from ..session import tune_for_oracle

    tune_for_oracle(spark)
    return run_stream_to_memory(spark, sf_dir)


ORACLE_SQL = {
    "stream_windowed_counts": """
        SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
               event_type,
               count(*) AS cnt,
               CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS value_sum
        FROM events GROUP BY 1, 2
    """,
}

QUERIES = {
    "stream_windowed_counts": stream_windowed_counts,
}
