"""Spectral invariants for the distributed PCA (emb_pca_project is a
rows-only driver entry — eigendecomposition has no SQL oracle — so the
math contract is pinned here)."""

import numpy as np
import pytest

from etl_pipeline_from_mongo_json_to_postgre_spark.operators import pca
from etl_pipeline_from_mongo_json_to_postgre_spark.operators.similarity import _vectors


@pytest.fixture(scope="module")
def fitted(spark, sf_dir):
    vecs = _vectors(spark, sf_dir).select("vec_id", "v").localCheckpoint(eager=True)
    mean, comps, expl = pca.fit(vecs)
    return vecs, np.array(mean), np.array(comps), np.array(expl)


def test_components_orthonormal(fitted):
    _, _, C, _ = fitted
    gram = C @ C.T
    assert np.allclose(gram, np.eye(C.shape[0]), atol=1e-8)


def test_explained_variance_descending_nonnegative(fitted):
    _, _, _, ev = fitted
    assert (ev >= -1e-10).all()
    assert (np.diff(ev) <= 1e-10).all()


def test_projection_variance_matches_eigenvalues(spark, fitted):
    """The projected coordinates' population variance along each
    component must equal its eigenvalue, and the distributed projection
    must agree with numpy's."""
    vecs, mean, C, ev = fitted
    rows = pca.project(vecs, list(mean), [list(c) for c in C]).collect()
    ids = [r["vec_id"] for r in rows]
    P = np.array([[r[f"pc{i+1}"] for i in range(C.shape[0])] for r in rows])
    raw = {r["vec_id"]: np.array(r["v"]) for r in vecs.collect()}
    X = np.array([raw[i] for i in ids]) - mean
    assert np.allclose(P, X @ C.T, atol=1e-5)  # distributed == numpy
    var = (P**2).mean(axis=0) - P.mean(axis=0) ** 2
    assert np.allclose(var, ev, rtol=1e-4, atol=1e-8)


def test_retained_plus_residual_equals_total_variance(spark, fitted):
    """Energy conservation: total variance (trace of covariance) =
    retained (sum of kept eigenvalues) + residual energy of the
    orthogonal complement."""
    vecs, mean, C, ev = fitted
    X = np.array([r["v"] for r in vecs.collect()]) - mean
    total_var = (X**2).mean(axis=0).sum() - (X.mean(axis=0) ** 2).sum()
    resid = X - (X @ C.T) @ C
    resid_var = (resid**2).mean(axis=0).sum() - (resid.mean(axis=0) ** 2).sum()
    assert abs(total_var - (ev.sum() + resid_var)) < 1e-6 * max(1.0, total_var)
