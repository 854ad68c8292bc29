"""Small-file compaction planner: bin ids are contiguous even with
oversized files, bin totals respect the greedy target, and executing
the plan preserves rows while collapsing the file count to the
planned bins."""

import glob
import os

from etl_pipeline_from_mongo_json_to_postgre_spark import storage
from etl_pipeline_from_mongo_json_to_postgre_spark.sources.parquet import load_table


def _write_small_files(spark, sf_dir, path, n=16):
    load_table(spark, sf_dir, "lineitem").repartition(n).write.parquet(path)


def test_plan_bins_respect_greedy_target(spark, sf_dir, tmp_path):
    src = str(tmp_path / "small")
    _write_small_files(spark, sf_dir, src)
    sizes = [
        os.path.getsize(f) for f in glob.glob(src + "/*.parquet")
    ]
    target = int(sum(sizes) / 4)
    plan = storage.compaction_plan(spark, src, target).collect()
    assert len(plan) == len(sizes)
    by_bin = {}
    for r in plan:
        by_bin.setdefault((r["dir"], r["bin_id"]), []).append(r["size_bytes"])
    for (_, _), szs in by_bin.items():
        # greedy rule: every file but the last entered an under-target bin
        assert sum(szs) - szs[-1] < target or len(szs) == 1
    # bins are contiguous 0..k per dir
    bins = sorted(b for (_, b) in by_bin)
    assert bins == list(range(len(bins)))


def test_plan_bins_contiguous_with_oversized_file(spark, sf_dir, tmp_path):
    """A file larger than 2x target must not leave holes in the bin
    numbering (floor(cum/target) alone would skip ids)."""
    src = str(tmp_path / "skewed")
    li = load_table(spark, sf_dir, "lineitem")
    # one huge file + several small ones, deterministic file order
    li.coalesce(1).write.parquet(src)
    small = str(tmp_path / "skewed_small")
    li.limit(200).repartition(4).write.parquet(small)
    for i, f in enumerate(sorted(glob.glob(small + "/*.parquet"))):
        os.rename(f, os.path.join(src, f"part-z{i}.parquet"))
    sizes = sorted(
        os.path.getsize(f) for f in glob.glob(src + "/*.parquet")
    )
    target = max(sizes[0], sizes[-1] // 8)  # big file >> target
    plan = storage.compaction_plan(spark, src, target).collect()
    bins = sorted({r["bin_id"] for r in plan})
    assert bins == list(range(len(bins))), bins


def test_compact_preserves_rows_and_reduces_files(spark, sf_dir, tmp_path):
    src = str(tmp_path / "small2")
    dst = str(tmp_path / "compacted")
    _write_small_files(spark, sf_dir, src)
    total = sum(os.path.getsize(f) for f in glob.glob(src + "/*.parquet"))
    target = int(total / 3)
    n_bins = storage.compact(spark, src, dst, target_bytes=target)
    assert 1 <= n_bins < 16
    assert len(glob.glob(dst + "/*.parquet")) == n_bins
    a = spark.read.parquet(src)
    b = spark.read.parquet(dst)
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # plan fidelity: no output file materially exceeds the greedy bound
    # (bin stops growing once it crosses target => size < target + max
    # input file, modulo parquet re-encoding)
    max_in = max(os.path.getsize(f) for f in glob.glob(src + "/*.parquet"))
    for f in glob.glob(dst + "/*.parquet"):
        assert os.path.getsize(f) <= (target + max_in) * 1.5
