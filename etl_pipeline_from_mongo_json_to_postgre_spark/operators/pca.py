"""Distributed PCA over the embeddings table — whitening/compression
for the ANN family (kmeans.py trains the IVF quantizer; this learns
the linear projection that shrinks vectors before indexing, the other
standard embedding-pipeline transform).

Pattern (same as kmeans.py): heavy statistics distributed, tiny linear
algebra on the driver, projection distributed again.

* Covariance: posexplode the vector twice into (i, j, x_i*x_j) terms
  with j >= i — map-side partial aggregation collapses every task to
  <= DIM*(DIM+1)/2 running sums BEFORE the shuffle, so the exchange
  carries partitions x 2080 rows, never corpus-sized data. Sums run
  in DECIMAL: order-free, so the covariance matrix is bit-identical
  across retries/schedulings.
* Eigendecomposition: numpy ``eigh`` on the 64x64 driver-side matrix
  (metadata-scale, like schema inference) — deterministic because its
  input is.
* Projection: centered dot products against the literal component
  matrix — one consolidated HOF expression per row
  (similarity._matrix_dots), no shuffle, no Python.

Registry entry is rows-only (eigendecomposition is not expressible in
the SQL oracle); the spectral invariants live in tests/test_pca.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .similarity import DIM, _matrix_dots, _vectors

N_COMPONENTS = 8
_ACC = "decimal(32,14)"


def fit(vecs: DataFrame, k: int = N_COMPONENTS):
    """Returns (mean: list[float], components: list[list[float]],
    explained_var: list[float]) — components are the top-k eigenvectors
    of the covariance matrix, eigenvalue-descending."""
    import numpy as np

    n = vecs.count()
    mean_rows = (
        vecs.select(F.posexplode("v").alias("i", "x"))
        .groupBy("i")
        .agg(F.sum(F.col("x").cast(_ACC)).alias("s"))
        .collect()
    )
    mean = np.zeros(DIM)
    for r in mean_rows:
        mean[r["i"]] = float(r["s"]) / n

    pair_rows = (
        vecs.select(F.posexplode("v").alias("i", "xi"), "v")
        .select("i", "xi", F.posexplode("v").alias("j", "xj"))
        .where(F.col("j") >= F.col("i"))
        .groupBy("i", "j")
        .agg(F.sum((F.col("xi") * F.col("xj")).cast(_ACC)).alias("s"))
        .collect()
    )
    cov = np.zeros((DIM, DIM))
    for r in pair_rows:
        c = float(r["s"]) / n - mean[r["i"]] * mean[r["j"]]
        cov[r["i"], r["j"]] = c
        cov[r["j"], r["i"]] = c

    vals, vecs_m = np.linalg.eigh(cov)          # ascending
    order = np.argsort(vals)[::-1][:k]
    components = [[float(x) for x in vecs_m[:, c]] for c in order]
    explained = [float(vals[c]) for c in order]
    return [float(x) for x in mean], components, explained


def project(vecs: DataFrame, mean, components) -> DataFrame:
    """Center and project: one HOF expression per row, zero shuffle."""
    centered = F.zip_with(
        F.col("v"),
        F.array(*[F.lit(m) for m in mean]),
        lambda x, m: x - m,
    )
    dots = _matrix_dots(centered, components)
    return vecs.select(
        "vec_id",
        *[
            F.round(F.element_at(dots, i + 1), 6).alias(f"pc{i + 1}")
            for i in range(len(components))
        ],
    )


def emb_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: fit PCA on the embeddings corpus and emit every
    vector's top-8 principal coordinates. Rows-only driver check; the
    math contract (orthonormal components, descending explained
    variance matching the projected coordinates' variance, residual
    energy = trace - retained) is pinned in tests/test_pca.py."""
    vecs = _vectors(spark, sf_dir).select("vec_id", "v").localCheckpoint(
        eager=True  # fit runs two aggregations + project reads it again
    )
    mean, components, _ = fit(vecs)
    return project(vecs, mean, components)


ORACLE_SQL: dict[str, str] = {}

QUERIES = {
    "emb_pca_project": emb_pca_project,
}
