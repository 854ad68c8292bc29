"""Structured Streaming execution path (availableNow -> memory sink)."""

from etl_pipeline_from_mongo_json_to_postgre_spark.streaming import (
    run_stream_to_memory,
)


def test_stream_matches_batch_plan(spark, sf_dir):
    from etl_pipeline_from_mongo_json_to_postgre_spark.sources.parquet import load_table
    from pyspark.sql import functions as F

    result = run_stream_to_memory(spark, sf_dir, table_name="t_stream_test")
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("value_sum"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "cnt", "value_sum")
    )
    got = {tuple(r) for r in result.collect()}
    want = {tuple(r) for r in batch.collect()}
    assert got == want
    assert len(got) > 0
