"""Hive-partitioned layout: a partition-key filter must prune
directories at planning time (PartitionFilters on the scan), and the
pruned read must return exactly the matching rows."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from etl_pipeline_from_mongo_json_to_postgre_spark.sources.parquet import load_table
from etl_pipeline_from_mongo_json_to_postgre_spark.storage import (
    scan_is_partition_pruned,
    write_partitioned,
)


@pytest.fixture(scope="module")
def partitioned_events(spark, sf_dir):
    path = tempfile.mkdtemp(prefix="part_events_")
    events = load_table(spark, sf_dir, "events").withColumn(
        "event_day", F.to_date("ts")
    )
    write_partitioned(events, path, ["event_type"])
    yield path
    shutil.rmtree(path, ignore_errors=True)


def test_partition_filter_reaches_scan(spark, partitioned_events):
    assert scan_is_partition_pruned(
        spark, partitioned_events, "event_type", "click"
    )


def test_pruned_read_matches_full_filter(spark, sf_dir, partitioned_events):
    pruned = (
        spark.read.parquet(partitioned_events)
        .where(F.col("event_type") == "click")
        .count()
    )
    full = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "click")
        .count()
    )
    assert pruned == full > 0


def test_training_shard_writer(spark, sf_dir, tmp_path):
    """write_training_shards: deterministic membership, one directory
    per shard, per-file internal ordering, and row parity."""
    import os

    from pyspark.sql import functions as F

    from etl_pipeline_from_mongo_json_to_postgre_spark.functions.sampling import (
        scrambled_key,
    )
    from etl_pipeline_from_mongo_json_to_postgre_spark.sources.parquet import (
        load_table,
    )
    from etl_pipeline_from_mongo_json_to_postgre_spark.storage import (
        write_training_shards,
    )

    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    out = str(tmp_path / "shards")
    write_training_shards(docs, out, key="doc_id", n_shards=4,
                          max_records_per_file=50)

    shard_dirs = sorted(d for d in os.listdir(out) if d.startswith("shard="))
    assert len(shard_dirs) == 4

    back = spark.read.parquet(out)
    assert back.count() == n_docs
    # membership is the deterministic scrambled-key function
    expected = docs.select(
        "doc_id", scrambled_key(F.col("doc_id"), 4).alias("shard")
    )
    mismatch = (
        back.select("doc_id", F.col("shard").cast("bigint").alias("shard"))
        .exceptAll(expected)
    )
    assert mismatch.count() == 0
    # every parquet file is internally ordered by doc_id
    import pyarrow.parquet as pq

    for d in shard_dirs:
        for f in os.listdir(os.path.join(out, d)):
            if not f.endswith(".parquet"):
                continue
            ids = pq.read_table(os.path.join(out, d, f), columns=["doc_id"])
            vals = ids.column("doc_id").to_pylist()
            assert vals == sorted(vals)
