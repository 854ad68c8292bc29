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
