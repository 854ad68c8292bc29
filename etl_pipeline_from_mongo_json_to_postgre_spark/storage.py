"""Bucketed-table storage layout (100 TB co-location path).

At scale, the fact tables this engine repeatedly joins on the same keys
(orders ⋈ lineitem on orderkey; audit frames on (collection, day))
should be written bucketed so the join is a zero-shuffle zip of
co-located buckets instead of an Exchange of the full fact table every
query. This module is the thin, testable wrapper: write a DataFrame
bucketed+sorted by its join key into the warehouse, and verify (via the
physical plan) that a bucket-aligned join plans with NO Exchange on the
bucketed sides — `tests/test_bucketing.py` pins that property so a
Spark upgrade or conf drift that silently reintroduces the shuffle
fails CI.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_keys: list[str],
    n_buckets: int = 32,
    sort_keys: list[str] | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) parquet
    table in the session warehouse. ``n_buckets`` should match across
    tables that join with each other — equal bucket counts on the join
    key is what lets Catalyst drop both Exchanges (and, with sort
    keys, both Sorts)."""
    writer = (
        df.write.format("parquet")
        .mode("overwrite")
        .bucketBy(n_buckets, *bucket_keys)
    )
    if sort_keys:
        writer = writer.sortBy(*sort_keys)
    writer.saveAsTable(table)


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def join_is_shuffle_free(spark: SparkSession, left_table: str,
                         right_table: str, key: str) -> bool:
    """True iff joining the two (bucketed) tables on ``key`` plans
    without any Exchange — the co-location property."""
    joined = spark.table(left_table).join(spark.table(right_table), key)
    return "Exchange" not in physical_plan(joined)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_keys: list[str],
) -> None:
    """Persist ``df`` as parquet hive-partitioned by ``partition_keys``
    (e.g. ingestion day / collection for audit tables). A filter on a
    partition key then prunes whole directories at planning time —
    at 100 TB this is the difference between scanning one day and
    scanning the archive. Partition keys must be low-cardinality
    (days, collections, clusters), never row-unique."""
    df.write.format("parquet").mode("overwrite").partitionBy(
        *partition_keys
    ).save(path)


def scan_is_partition_pruned(spark: SparkSession, path: str, key: str,
                             value) -> bool:
    """True iff filtering the partitioned dataset on ``key`` == value
    plans with a partition filter (directory pruning), i.e. the filter
    appears as PartitionFilters on the scan node."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(path).where(F.col(key) == value)
    plan = physical_plan(df)
    part_section = plan.split("PartitionFilters:", 1)
    return len(part_section) > 1 and key in part_section[1].split("]")[0]
