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

from .similarity import DIM, _matrix_dots, _plane_lit, _vectors

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
        _plane_lit(mean),
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


def pca_coords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fit PCA on the embeddings corpus and emit every vector's top-8
    principal coordinates — the per-row projection consumers use.
    Coordinates are eigenbasis-specific (sign/order conventions), so
    this form is test-pinned, not oracle-checked; the registry entry is
    emb_pca_project below."""
    vecs = _vectors(spark, sf_dir).select("vec_id", "v").localCheckpoint(
        eager=True  # fit runs two aggregations + project reads it again
    )
    mean, components, _ = fit(vecs)
    return project(vecs, mean, components)


def emb_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query with a DERIVED DuckDB oracle (VERDICT r3 task 5):
    eigendecomposition is not SQL-expressible, but the spectral
    contract is — one hash-checkable row:

    - n_projected: every corpus vector gets a coordinate row
      (distributed count through the real projection pipeline; the
      oracle recomputes count(*) FROM embeddings),
    - components_orthonormal: |C C^T - I|_max < 1e-8 (driver-side d x d
      check on the fitted basis — metadata-scale),
    - variance_descending: explained eigenvalues arrive sorted,
    - projected_var_matches: the DISTRIBUTED population variance of
      each projected coordinate equals its eigenvalue within 1% — the
      one invariant that ties the executor-side projection expression
      to the driver-side fit.

    The per-vector coordinate frame stays available as pca_coords and
    is value-pinned in tests/test_pca.py."""
    import numpy as np

    vecs = _vectors(spark, sf_dir).select("vec_id", "v").localCheckpoint(
        eager=True
    )
    mean, components, explained = fit(vecs)
    C = np.array(components)
    ortho = bool(np.abs(C @ C.T - np.eye(len(components))).max() < 1e-8)
    desc = all(a >= b - 1e-12 for a, b in zip(explained, explained[1:]))
    proj = project(vecs, mean, components)
    var_ok = None
    for i, lam in enumerate(explained):
        ok_i = (
            F.abs(F.var_pop(f"pc{i + 1}") - F.lit(lam))
            <= F.lit(0.01 * abs(lam) + 1e-9)
        )
        var_ok = ok_i if var_ok is None else (var_ok & ok_i)
    return proj.agg(
        F.count("*").cast("bigint").alias("n_projected"),
        F.lit(ortho).alias("components_orthonormal"),
        F.lit(desc).alias("variance_descending"),
        var_ok.alias("projected_var_matches"),
    )


ORACLE_SQL: dict[str, str] = {
    "emb_pca_project": """
        SELECT CAST(count(*) AS BIGINT) AS n_projected,
               TRUE AS components_orthonormal,
               TRUE AS variance_descending,
               TRUE AS projected_var_matches
        FROM embeddings
    """,
}

QUERIES = {
    "emb_pca_project": emb_pca_project,
}
