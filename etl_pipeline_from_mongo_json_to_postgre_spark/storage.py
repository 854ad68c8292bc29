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
    """Planned physical tree as text, with maxToStringFields raised so
    wide projections can't truncate to '... N more fields' and hide
    operators from substring-counting plan pins (r9 advice — the fix
    lives HERE so every plan-shape test shares it)."""
    spark = df.sparkSession
    key = "spark.sql.debug.maxToStringFields"
    prev = spark.conf.get(key)
    spark.conf.set(key, "10000")
    try:
        return df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set(key, prev)


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


# ---------------------------------------------------------------------------
# Z-order (Morton) clustering: multi-dimensional data skipping.
# ---------------------------------------------------------------------------

ZORDER_BITS = 16
_SPREAD_MASKS = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def _spread_bits(c):
    """Spread a 16-bit value's bits into the even positions of a 32-bit
    lane (classic magic-mask doubling) — pure bigint shifts/ands, stays
    in whole-stage codegen."""
    from pyspark.sql import functions as F

    c = c.bitwiseAND(F.lit((1 << ZORDER_BITS) - 1))
    for sh, mask in _SPREAD_MASKS:
        c = (c.bitwiseOR(F.shiftleft(c, sh))).bitwiseAND(F.lit(mask))
    return c


def _quantize(c, lo: int, hi: int):
    """Scale a column with known [lo, hi] bounds onto the 16-bit code
    domain. Exact-double floor math ((x-lo)*65536 stays far below
    2^53) — bit-identical across engines, monotone, and it gives both
    dimensions EQUAL bit weight in the interleave regardless of their
    native ranges (a 0..9 key and a 0..2^31 key cluster equally well);
    raw interleaving would let the wider dimension's high bits drown
    the narrow one."""
    from pyspark.sql import functions as F

    span = hi - lo + 1
    return F.floor(
        (c.cast("bigint") - F.lit(lo)) * F.lit(float(1 << ZORDER_BITS)) / F.lit(float(span))
    )


def morton_key(x, y, x_range: tuple[int, int], y_range: tuple[int, int]):
    """Interleave two integer columns — each first quantized onto the
    16-bit code domain via its [lo, hi] range — into a single Z-order
    key: rows close in BOTH dimensions land close on the key, so
    sorting by it clusters the file layout for min/max skipping on
    EITHER dimension — the lakehouse multi-dimensional clustering
    technique (a linear sort only skips on its leading column). The
    ranges come from table stats (one metadata-scale agg)."""
    from pyspark.sql import functions as F

    xq = _quantize(x, *x_range)
    yq = _quantize(y, *y_range)
    return _spread_bits(xq).bitwiseOR(F.shiftleft(_spread_bits(yq), 1))


def zorder_sql(x_expr: str, y_expr: str,
               x_range: tuple[str, str], y_range: tuple[str, str]) -> str:
    """The identical Morton computation as ANSI SQL (DuckDB oracle
    twin of morton_key — same quantization double math, same shifts,
    same masks, exact bigint interleave). Range bounds are SQL
    expressions (literals or scalar-subquery references)."""
    def quant(e: str, lo: str, hi: str) -> str:
        return (
            f"CAST(floor((CAST({e} AS BIGINT) - ({lo})) * "
            f"{float(1 << ZORDER_BITS)} / (({hi}) - ({lo}) + 1.0)) AS BIGINT)"
        )

    def spread(e: str) -> str:
        e = f"({e} & {(1 << ZORDER_BITS) - 1})"
        for sh, mask in _SPREAD_MASKS:
            e = f"(({e} | ({e} << {sh})) & {mask})"
        return e

    return (
        f"({spread(quant(x_expr, *x_range))}"
        f" | ({spread(quant(y_expr, *y_range))} << 1))"
    )


def write_zordered(df, path: str, x: str, y: str, n_files: int = 16) -> None:
    """Persist ``df`` clustered by the Morton key of (x, y):
    range-partition on the key (each output file owns a contiguous
    Z-range) and sort within partitions (each parquet row group owns a
    narrow sub-range). Row-group min/max stats on BOTH x and y then
    become selective, so point/range scans on either column skip most
    of the file bytes — tests/test_zorder.py measures the skip rate
    against an unclustered copy of the same rows."""
    from pyspark.sql import functions as F

    b = df.agg(
        F.min(x).alias("xlo"), F.max(x).alias("xhi"),
        F.min(y).alias("ylo"), F.max(y).alias("yhi"),
    ).collect()[0]  # metadata-scale: 1 row of table stats
    (
        df.withColumn(
            "_zkey",
            morton_key(
                F.col(x), F.col(y),
                (b["xlo"], b["xhi"]), (b["ylo"], b["yhi"]),
            ),
        )
        .repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.format("parquet")
        .mode("overwrite")
        .save(path)
    )


# ---------------------------------------------------------------------------
# Small-file compaction: the operational half of layout management.
# ---------------------------------------------------------------------------


def compaction_plan(spark: SparkSession, path: str,
                    target_bytes: int) -> "DataFrame":
    """Greedy bin-packing of a table's part files into compaction
    groups of ~target_bytes: files are walked in deterministic name
    order per directory and a file joins the current bin if the bin
    started under target (same greedy-frontier rule as
    corpus.pack_sequences, applied to file metadata).

    Scale shape: the input is the FILE LISTING — metadata-scale even
    for a 100 TB table — and the cumulative sum is a window per parent
    directory (= hive partition), so planning parallelizes over
    partitions and never serializes on one global ordering. Returns
    (dir, file, size_bytes, bin_id); the executor of the plan reads
    each bin's files and rewrites them as one file.
    """
    import os

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    listing = []
    for root, _dirs, files in os.walk(path):
        for f in sorted(files):
            if f.endswith(".parquet"):
                full = os.path.join(root, f)
                listing.append(
                    (os.path.relpath(root, path), f, os.path.getsize(full))
                )
    df = spark.createDataFrame(listing, "dir string, file string, size_bytes long")
    w = (
        Window.partitionBy("dir")
        .orderBy("file")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("size_bytes").over(w)
    # raw bucket floor(cum_before/target) is monotone along file order
    # but SKIPS ids when one file exceeds ~2x target; dense_rank over it
    # renumbers to contiguous 0..k per dir
    raw = F.floor((cum - F.col("size_bytes")) / F.lit(target_bytes))
    staged = df.select("dir", "file", "size_bytes", raw.alias("_raw"))
    w_dense = Window.partitionBy("dir").orderBy("_raw")
    return staged.select(
        "dir", "file", "size_bytes",
        (F.dense_rank().over(w_dense) - 1).alias("bin_id"),
    )


def compact(spark: SparkSession, src_path: str, dst_path: str,
            target_bytes: int) -> int:
    """Execute a compaction plan FAITHFULLY: per source directory
    (= hive partition), tag each row with its file's planned bin via
    input_file_name + a broadcast file→bin map, range-partition on the
    bin id so each output file IS one planned bin, and write under the
    same relative directory. One job per partition directory — exactly
    how production compactors bound blast radius — with per-dir
    parallelism inside the job. Returns the total number of bins.
    Plan fidelity, row parity and file-count reduction are asserted in
    tests/test_compaction.py."""
    import os

    from pyspark.sql import functions as F

    plan = compaction_plan(spark, src_path, target_bytes).collect()
    by_dir: dict[str, dict[str, int]] = {}
    for r in plan:
        by_dir.setdefault(r["dir"], {})[r["file"]] = r["bin_id"]
    total_bins = 0
    for d, file_bins in by_dir.items():
        src_dir = src_path if d == "." else os.path.join(src_path, d)
        dst_dir = dst_path if d == "." else os.path.join(dst_path, d)
        n_bins = max(file_bins.values()) + 1
        total_bins += n_bins
        mapping = F.create_map(
            *[x for f, b in sorted(file_bins.items())
              for x in (F.lit(f), F.lit(b))]
        )
        df = spark.read.parquet(src_dir).withColumn(
            "_bin",
            mapping[F.element_at(F.split(F.input_file_name(), "/"), -1)],
        )
        (
            df.repartitionByRange(n_bins, "_bin")
            .sortWithinPartitions("_bin")
            .drop("_bin")
            .write.mode("overwrite")
            .parquet(dst_dir)
        )
    return total_bins


def write_training_shards(
    df: DataFrame,
    path: str,
    key: str,
    n_shards: int = 16,
    sort_keys: list[str] | None = None,
    max_records_per_file: int = 0,
) -> None:
    """Write a corpus as deterministic training shards:
    ``path/shard=K/*.parquet`` with rows inside each file ordered by
    ``sort_keys``.

    Layout contract (what a dataloader relies on):
    - shard membership is a pure function of ``key`` (scrambled-key mod,
      the same function the manifest operators use) — task retries,
      re-runs, and incremental appends place a row in the same shard;
    - single-writer-per-shard: all rows of a shard land in one task, so
      each shard directory is written by exactly one writer — no
      tiny-file spray. Range-partitioning the K distinct shard ids into
      K partitions also gives ~one shard per task (hash-partitioning
      here would collide shard ids into shared tasks, leaving some
      tasks with multiple shards and others idle — the balance is
      best-effort via range sampling, the single-writer property is
      what is guaranteed);
    - ``maxRecordsPerFile`` caps file size for loader parallelism while
      sortWithinPartitions keeps every file internally ordered.

    At 100 TB: bump ``n_shards`` to O(cluster cores); everything else
    is unchanged — the shuffle moves each row once, the sort is
    per-shard local, and the write streams.
    """
    from .functions.sampling import scrambled_key

    from pyspark.sql import functions as F

    staged = (
        df.withColumn("shard", scrambled_key(F.col(key), n_shards))
        .repartitionByRange(n_shards, "shard")
        .sortWithinPartitions("shard", *(sort_keys or [key]))
    )
    writer = staged.write.mode("overwrite")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.partitionBy("shard").parquet(path)


def analyze_tables(spark: SparkSession, tables: list[str]) -> None:
    """Compute catalog statistics (table + all-column) for CBO.

    AQE re-plans join STRATEGIES at runtime from observed shuffle sizes,
    but it cannot reorder the join graph — only the stats-driven
    cost-based optimizer does that, at logical planning time, and only
    when the catalog carries statistics. Measured (r9, sf0.1 TPC-H
    q5 shape written fact-first): with column stats +
    spark.sql.cbo.{enabled,joinReorder.enabled}=true, Catalyst rewrites
    lineitem→orders→customer→supplier→nation→region into the
    selective-dims-first order with the fact joined LAST — at cluster
    scale the difference between shuffling the unfiltered fact into
    every join and joining it once against pre-filtered dims. The
    registry entries read bare parquet paths (no catalog), so CBO stays
    off by default; pipelines that persist tables should ANALYZE after
    load and flip the two confs."""
    for t in tables:
        spark.sql(f"ANALYZE TABLE {t} COMPUTE STATISTICS FOR ALL COLUMNS")
