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


def test_sessionize_stream_matches_batch(spark, sf_dir):
    """Every session the stateful streaming operator closes must appear
    identically (start/end/count) in the batch window-function answer;
    batch-only extras are exactly the sessions still open at drain."""
    import tempfile
    from etl_pipeline_from_mongo_json_to_postgre_spark.streaming import events as se

    stream = se.events_stream(spark, sf_dir)
    q = (se.sessionize(stream)
         .writeStream.format("memory").queryName("sess_check")
         .outputMode("update").trigger(availableNow=True)
         .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_sc_")).start())
    assert q.awaitTermination(300)
    streamed = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.table("sess_check").collect()
    }
    batch = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in se.stream_sessionize(spark, sf_dir).collect()
    }
    assert streamed, "stream closed no sessions"
    assert streamed <= batch
    # unmatched batch rows = one open (final) session per active user
    open_sessions = batch - streamed
    users_open = {u for (u, *_ ) in open_sessions}
    assert len(open_sessions) == len(users_open)
