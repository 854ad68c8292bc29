"""Behavioral invariants for the association/co-occurrence operators."""

from pyspark.sql import functions as F

from etl_pipeline_from_mongo_json_to_postgre_spark.operators.association import (
    copurchase_pairs,
)


def test_mega_basket_capped(spark):
    """A pathological basket with more items than BASKET_CAP must emit
    exactly C(cap, 2) pairs from its cap smallest items — the quadratic
    bound the 100 TB design depends on."""
    rows = [(1, p) for p in range(100)]
    df = spark.createDataFrame(rows, "l_orderkey int, l_partkey int")
    out = copurchase_pairs(df, min_count=1, cap=10)
    pairs = out.collect()
    assert len(pairs) == 45  # C(10,2)
    # only the 10 smallest items participate (deterministic truncation)
    items = {r.part_a for r in pairs} | {r.part_b for r in pairs}
    assert items == set(range(10))


def test_pair_ordering_and_counts(spark):
    """Pairs are unordered (a < b) and counts accumulate across
    baskets; duplicate items within one basket count once."""
    rows = [
        (1, 5), (1, 3), (1, 3),   # dup item in basket
        (2, 3), (2, 5),
        (3, 3), (3, 5), (3, 9),
    ]
    df = spark.createDataFrame(rows, "l_orderkey int, l_partkey int")
    out = {(r.part_a, r.part_b): r.n_orders
           for r in copurchase_pairs(df, min_count=1).collect()}
    assert out[(3, 5)] == 3
    assert out[(3, 9)] == 1
    assert out[(5, 9)] == 1
    assert all(a < b for (a, b) in out)
