"""PageRank invariants (the operator has no SQL oracle — the fixed
point is pinned by conservation and known-graph properties instead)."""

import pytest
from pyspark.sql import functions as F

from etl_pipeline_from_mongo_json_to_postgre_spark.operators.graph import pagerank


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src bigint, dst bigint")


def test_mass_conservation(spark):
    """sum(rank) == n_nodes on a connected graph (no dangling mass)."""
    pairs = [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3)]
    out = pagerank(_edges(spark, pairs), iters=10).collect()
    total = sum(r.rank for r in out)
    assert total == pytest.approx(4.0, abs=1e-9)


def test_cycle_is_uniform(spark):
    """A symmetric cycle is degree-regular: every node keeps rank 1."""
    n = 6
    pairs = [(i, (i + 1) % n) for i in range(n)]
    out = pagerank(_edges(spark, pairs), iters=8).collect()
    for r in out:
        assert r.rank == pytest.approx(1.0, abs=1e-9)


def test_star_center_dominates(spark):
    """In a star K1,n the hub accumulates the leaves' mass."""
    pairs = [(0, i) for i in range(1, 9)]
    out = {r.node: r.rank for r in pagerank(_edges(spark, pairs), iters=12).collect()}
    center = out[0]
    leaves = [v for k, v in out.items() if k != 0]
    assert center > max(leaves) * 2
    # leaves are symmetric
    assert max(leaves) == pytest.approx(min(leaves), rel=1e-9)


def test_chain_ends_rank_lowest(spark):
    """On a path graph the endpoints (degree 1) rank below the middle."""
    pairs = [(i, i + 1) for i in range(4)]  # path 0-1-2-3-4
    out = {r.node: r.rank for r in pagerank(_edges(spark, pairs), iters=15).collect()}
    assert out[0] == pytest.approx(out[4], rel=1e-9)
    assert out[2] > out[0]


def test_kcore_peels_pendant_chain_keeps_triangle(spark):
    """Triangle {1,2,3} with pendant chain 3-4-5 and an isolated edge
    6-7: the 2-core is exactly the triangle (degree 2 each); the chain
    and the edge peel away — and peeling must CASCADE (node 4 only
    drops after 5 does)."""
    from etl_pipeline_from_mongo_json_to_postgre_spark.operators.graph import (
        kcore_peel,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (6, 7)],
        "src long, dst long",
    )
    got = {r.node: r.core_degree for r in kcore_peel(edges, k=2).collect()}
    assert got == {1: 2, 2: 2, 3: 2}


def test_kcore_cycle_survives_whole(spark):
    """A 4-cycle has no node below degree 2: nothing peels."""
    from etl_pipeline_from_mongo_json_to_postgre_spark.operators.graph import (
        kcore_peel,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1)], "src long, dst long")
    got = {r.node: r.core_degree for r in kcore_peel(edges, k=2).collect()}
    assert got == {1: 2, 2: 2, 3: 2, 4: 2}
