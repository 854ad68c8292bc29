"""Schema-evolution reads: a dataset written under several schema
versions must load as one unified frame with NULLs where old files
lack the new columns (sources/parquet.load_evolving)."""

from pyspark.sql import functions as F

from etl_pipeline_from_mongo_json_to_postgre_spark.sources.parquet import (
    load_evolving,
)


def test_added_column_unifies_with_nulls(spark, tmp_path):
    base = str(tmp_path / "evolving")
    v1 = spark.createDataFrame(
        [(1, "a"), (2, "b")], "id bigint, name string"
    )
    v1.write.parquet(base + "/batch=1")
    v2 = spark.createDataFrame(
        [(3, "c", 9.5), (4, "d", 7.25)], "id bigint, name string, score double"
    )
    v2.write.parquet(base + "/batch=2")

    df = load_evolving(spark, base)
    assert set(df.columns) == {"id", "name", "score", "batch"}
    rows = {r.id: (r.name, r.score) for r in df.collect()}
    assert rows[1] == ("a", None)
    assert rows[3] == ("c", 9.5)
    # old-file rows surface the new column as NULL, not a read error
    assert df.where(F.col("score").isNull()).count() == 2


def test_evolved_timestamps_normalized(spark, tmp_path):
    """A writer that switches timestamp encoding mid-dataset must still
    yield plain TimestampType everywhere (the load_table guarantee,
    extended to merged reads)."""
    import datetime

    base = str(tmp_path / "ts_evolving")
    t = datetime.datetime(2024, 6, 1, 12, 0, 0)
    spark.createDataFrame([(1, t)], "id bigint, ts timestamp").write.parquet(
        base + "/batch=1"
    )
    spark.createDataFrame(
        [(2, t, "x")], "id bigint, ts timestamp, note string"
    ).write.parquet(base + "/batch=2")
    df = load_evolving(spark, base)
    assert dict(df.dtypes)["ts"] == "timestamp"
    assert df.count() == 2
