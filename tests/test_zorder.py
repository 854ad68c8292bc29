"""Z-order clustering: measured data-skipping evidence.

write_zordered claims that clustering by the Morton key of (x, y)
makes parquet row-group min/max stats selective on BOTH dimensions.
This test writes the same rows three ways — unclustered, linear-sorted
by x, Z-ordered by (x, y) — and measures, from the real parquet
footers, what fraction of row groups a range predicate on each
dimension could skip.

Expected: linear sort skips on x but not on y; Z-order skips
substantially on BOTH.
"""

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from etl_pipeline_from_mongo_json_to_postgre_spark import storage
from etl_pipeline_from_mongo_json_to_postgre_spark.sources.parquet import load_table


def _rowgroup_ranges(path, col):
    """(min, max) per row group across all part files, from footers."""
    out = []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.to_arrow_schema().get_field_index(col)
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            out.append((st.min, st.max))
    return out


def _skip_fraction(ranges, lo, hi):
    """Fraction of row groups a scan for [lo, hi] may skip."""
    miss = sum(1 for mn, mx in ranges if mx < lo or mn > hi)
    return miss / len(ranges)


@pytest.fixture(scope="module")
def layouts(spark, sf_dir, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("zorder"))
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    paths = {
        "plain": os.path.join(base, "plain"),
        "linear": os.path.join(base, "linear"),
        "zorder": os.path.join(base, "zorder"),
    }
    n_files = 8
    li.repartition(n_files).write.parquet(paths["plain"])
    (
        li.repartitionByRange(n_files, "l_partkey")
        .sortWithinPartitions("l_partkey")
        .write.parquet(paths["linear"])
    )
    storage.write_zordered(li, paths["zorder"], "l_partkey", "l_suppkey",
                           n_files=n_files)
    bounds = li.agg(
        F.min("l_partkey"), F.max("l_partkey"),
        F.min("l_suppkey"), F.max("l_suppkey"),
    ).collect()[0]
    return paths, tuple(bounds)


def _probe_band(lo, hi, frac=0.1):
    """A narrow range at the quarter point. (The exact midpooint is the
    Z-curve's top-level split, where a straddling band touches every
    quadrant — a worst case for ANY space-filling curve; real
    predicates land at arbitrary offsets, which quarter-point models.)"""
    span = hi - lo
    start = lo + span // 4
    return start, start + max(1, int(span * frac))


def test_zorder_row_parity(spark, layouts):
    paths, _ = layouts
    a = spark.read.parquet(paths["plain"])
    b = spark.read.parquet(paths["zorder"])
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_zorder_skips_on_both_dimensions(spark, layouts):
    paths, (pk_lo, pk_hi, sk_lo, sk_hi) = layouts
    pk_band = _probe_band(pk_lo, pk_hi)
    sk_band = _probe_band(sk_lo, sk_hi)

    skips = {
        name: {
            "pk": _skip_fraction(_rowgroup_ranges(p, "l_partkey"), *pk_band),
            "sk": _skip_fraction(_rowgroup_ranges(p, "l_suppkey"), *sk_band),
        }
        for name, p in paths.items()
    }
    # unclustered: nothing is skippable on either dimension
    assert skips["plain"]["pk"] == 0.0 and skips["plain"]["sk"] == 0.0
    # linear sort: selective on the sort column, blind on the other
    assert skips["linear"]["pk"] >= 0.5
    assert skips["linear"]["sk"] == 0.0
    # Z-order: substantially selective on BOTH dimensions
    assert skips["zorder"]["pk"] >= 0.25, skips
    assert skips["zorder"]["sk"] >= 0.25, skips
