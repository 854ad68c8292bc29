"""Iterative graph analytics: PageRank centrality over an edge list.

Extension family alongside the connected-components operators in
similarity.py (min-label propagation, large-star/small-star): PageRank
adds the weighted-iteration shape — per-node state updated from
neighbor contributions each round — which is the template for any
fixed-point graph computation (label propagation, belief propagation,
embedding smoothing) this engine would run at 100 TB.

Scale shape per iteration: ONE equi-join of the rank frame (node-sized)
with the edge list on src, then ONE aggregate on dst — both hash-keyed
on node ids, so an N-iteration run is 2N node-keyed shuffles of
id/double pairs, never the adjacency payload. Lineage is cut with an
eager localCheckpoint every CHECKPOINT_EVERY rounds (the iterative-plan
blowup otherwise re-plans a 2N-deep DAG each action; same discipline as
dedup_components). Convergence is fixed-iteration (deterministic work,
no data-dependent driver loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..session import tune_for_oracle
from ..sources.parquet import load_table

DAMPING = 0.85
PR_ITERS = 5
CHECKPOINT_EVERY = 3


def pagerank(edges: DataFrame, damping: float = DAMPING,
             iters: int = PR_ITERS) -> DataFrame:
    """PageRank over an undirected edge list (columns ``src``, ``dst``;
    each undirected edge listed once — it is symmetrized here).

    Returns (node, rank) with sum(rank) == n_nodes (the classic
    normalization: rank = (1-d) + d * sum(neighbor rank / degree);
    symmetrized graphs have no dangling nodes, so mass is conserved).
    """
    sym = edges.select("src", "dst").union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    adj = sym.distinct()
    degree = adj.groupBy("src").agg(F.count("*").alias("deg"))
    # adjacency annotated with source degree once, reused every round
    links = adj.join(degree, "src").localCheckpoint(eager=True)
    ranks = degree.select("src", F.lit(1.0).alias("rank"))
    for i in range(iters):
        contribs = (
            links.join(ranks, "src")
            .select(F.col("dst").alias("src"),
                    (F.col("rank") / F.col("deg")).alias("c"))
        )
        ranks = contribs.groupBy("src").agg(
            (F.lit(1.0 - damping)
             + F.lit(damping) * F.sum("c")).alias("rank")
        )
        if (i + 1) % CHECKPOINT_EVERY == 0 and i + 1 < iters:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select(F.col("src").alias("node"), "rank")


def graph_pagerank_parts(spark, sf_dir):
    """queries() entry: part-centrality over the co-purchase graph —
    which parts sit at the center of the "bought together" network.
    Edges are the capped basket pairs (see association.copurchase_pairs);
    ranks are rounded for stable display. Rows-only driver check: the
    fixed-point is not SQL-expressible (a recursive CTE cannot carry
    the per-iteration aggregate), so correctness is pinned by the
    spectral/conservation invariants in tests/test_graph.py instead.
    """
    from .association import copurchase_pairs

    tune_for_oracle(spark)
    li = load_table(spark, sf_dir, "lineitem")
    edges = copurchase_pairs(li, min_count=1).select(
        F.col("part_a").alias("src"), F.col("part_b").alias("dst")
    )
    return pagerank(edges).select(
        "node", F.round("rank", 6).alias("rank")
    )


ORACLE_SQL: dict[str, str] = {}

QUERIES = {
    "graph_pagerank_parts": graph_pagerank_parts,
}
