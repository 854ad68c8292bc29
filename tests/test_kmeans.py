"""Lloyd-iteration invariants for the distributed k-means trainer
(kmeans_train is a rows-only driver entry — iterative FP algorithm —
so its semantics are pinned here instead of in a SQL oracle)."""

import math

import numpy as np
import pytest

from etl_pipeline_from_mongo_json_to_postgre_spark.operators import kmeans
from etl_pipeline_from_mongo_json_to_postgre_spark.operators.similarity import (
    CENTROIDS,
    _vectors,
)


@pytest.fixture(scope="module")
def vecs(spark, sf_dir):
    return _vectors(spark, sf_dir).select("vec_id", "v").localCheckpoint(eager=True)


def test_sse_monotone_non_increasing(spark, vecs):
    _, hist = kmeans.train(vecs, iters=3)
    assert len(hist) == 3
    for a, b in zip(hist, hist[1:]):
        assert b <= a + 1e-6, hist


def test_training_is_deterministic(spark, vecs):
    c1, h1 = kmeans.train(vecs, iters=2)
    c2, h2 = kmeans.train(vecs, iters=2)
    assert c1 == c2  # decimal accumulation: bit-equal, not just close
    assert h1 == h2


def test_assignment_is_true_argmin(spark, vecs):
    """Spark's map-side argmax(score) must equal numpy's argmin of
    squared L2 distance for every vector (ties: lowest cluster id)."""
    centroids, _ = kmeans.train(vecs, iters=1, compute_history=False)
    got = {
        r["vec_id"]: r["cluster_id"]
        for r in kmeans._assign(vecs, centroids).collect()
    }
    C = np.array(centroids)
    for r in vecs.collect():
        v = np.array(r["v"])
        d2 = ((C - v) ** 2).sum(axis=1)
        assert got[r["vec_id"]] == int(d2.argmin()) + 1, r["vec_id"]


def test_trained_centroids_beat_random_init(spark, vecs):
    """The whole point of training: final SSE must be strictly below
    the SSE of the fixed random CENTROIDS the IVF index ships with."""
    trained, hist = kmeans.train(vecs, iters=3)
    random_sse = kmeans._sse(kmeans._assign(vecs, CENTROIDS), CENTROIDS)
    assert hist[-1] < random_sse


def test_census_shape_and_totals(spark, sf_dir):
    out = kmeans.kmeans_census(spark, sf_dir).collect()
    n_total = _vectors(spark, sf_dir).count()
    assert sum(r["n_vecs"] for r in out) == n_total
    assert all(r["n_vecs"] > 0 for r in out)  # no empty clusters on this data
    assert all(r["sse"] >= 0 and math.isfinite(r["sse"]) for r in out)


def test_train_invariant_row_is_all_green(spark, sf_dir):
    """The registry entry's derived-oracle booleans must actually hold
    (they are literal/aggregate expressions — this pins them TRUE on
    real data, not just against the oracle's TRUE constants)."""
    row = kmeans.kmeans_train(spark, sf_dir).collect()[0]
    assert row["n_assigned"] == _vectors(spark, sf_dir).count()
    assert row["k_within_bound"] and row["sse_monotone"]
    assert row["sse_final_le_first"]
