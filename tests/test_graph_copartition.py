"""Plan-shape pins for the iterative-graph co-partitioning (VERDICT r7
task 5): checkpoint_partitioned must produce a frame whose preserved
hash layout the per-round joins actually REUSE — i.e. in the
sort-merge-join regime (the 100 TB shape, where the per-node state no
longer broadcasts) no round adds an Exchange above the checkpointed
links scan. Red if the LogicalRDD stops advertising its partitioning
(e.g. an AQE materialization sneaks back in) or if a refactor breaks
the key alignment between the links layout and the per-round agg."""

import pytest
from pyspark.sql import functions as F

from etl_pipeline_from_mongo_json_to_postgre_spark.operators.graph import (
    checkpoint_partitioned,
)


def _parents_of_scans(plan: str, scan_marker: str) -> list[list[str]]:
    """For each plan line containing ``scan_marker``, the chain of
    ancestor node lines (nearest-first), derived from indentation."""
    lines = plan.splitlines()

    def indent(s: str) -> int:
        return len(s) - len(s.lstrip(" :+-"))

    chains = []
    for i, line in enumerate(lines):
        if scan_marker not in line:
            continue
        chain, cur = [], indent(line)
        for j in range(i - 1, -1, -1):
            ij = indent(lines[j])
            if ij < cur:
                chain.append(lines[j].strip(" :+-"))
                cur = ij
        chains.append(chain)
    return chains


@pytest.fixture()
def smj_spark(spark):
    """Session with broadcast joins disabled — the regime where a
    non-broadcastable state side forces shuffles, i.e. where the
    preserved layout matters."""
    keys = ("spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold")
    prev = {k: spark.conf.get(k, None) for k in keys}
    for k in keys:
        spark.conf.set(k, "-1")
    yield spark
    for k, v in prev.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_checkpoint_partitioned_advertises_hash_layout(spark):
    df = spark.range(500).select(
        (F.col("id") % 37).alias("src"), F.col("id").alias("v"))
    ck = checkpoint_partitioned(df, "src")
    part = ck._jdf.queryExecution().optimizedPlan().outputPartitioning()
    assert "hashpartitioning" in part.toString(), (
        "localCheckpoint lost the layout — AQE must be off for the "
        "final materialization pass")
    n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert ck.rdd.getNumPartitions() == n


def test_pagerank_rounds_reuse_links_layout_in_smj_regime(smj_spark):
    """Two inline pagerank rounds against a checkpoint_partitioned links
    frame: the links-side ExistingRDD scans must reach their SortMergeJoin
    with NO Exchange between — the edge list is shuffled once, not once
    per round."""
    spark = smj_spark
    edges = spark.range(2000).select(
        (F.col("id") % 97).alias("src"), ((F.col("id") * 7) % 97).alias("dst")
    ).where(F.col("src") != F.col("dst"))
    sym = edges.union(edges.select(F.col("dst").alias("src"),
                                   F.col("src").alias("dst")))
    adj = sym.distinct()
    degree = adj.groupBy("src").agg(F.count("*").alias("deg"))
    links = checkpoint_partitioned(adj.join(degree, "src"), "src")
    ranks = degree.select("src", F.lit(1.0).alias("rank"))
    for _ in range(2):
        contribs = links.join(ranks, "src").select(
            F.col("dst").alias("src"),
            (F.col("rank") / F.col("deg")).alias("c"))
        ranks = contribs.groupBy("src").agg(F.sum("c").alias("rank"))
    # inspect the planned tree without executing (r8 review: the noop
    # write runs its own QueryExecution, so execution bought nothing and
    # the matcher below relies on the un-executed plan's formatting)
    plan = ranks._jdf.queryExecution().executedPlan().toString()
    # links scans carry 3 columns (src, dst, deg); the initial-ranks
    # ExistingRDD (if any) carries 2 — match on deg to pick links only
    chains = _parents_of_scans(plan, "Scan ExistingRDD")
    link_chains = [
        c for i, c in enumerate(chains)
        if "deg" in plan.splitlines()[
            [j for j, l in enumerate(plan.splitlines())
             if "Scan ExistingRDD" in l][i]]
    ]
    assert link_chains, "no links ExistingRDD scan in the physical plan"
    for chain in link_chains:
        for node in chain:
            if node.startswith("SortMergeJoin") or node.startswith(
                    "ShuffledHashJoin"):
                break
            assert not node.startswith("Exchange"), (
                "a round re-shuffled the pre-partitioned links frame:\n"
                + plan)


def test_pagerank_dst_layout_makes_rounds_aggregate_without_exchange(spark):
    """r13 optimization-round pin: pagerank lays links out on DST (the
    aggregation key). In the broadcast regime (node-sized rank frame),
    each round's contribution HashAggregate must consume the links scan
    with NO Exchange anywhere between — zero edge-sized shuffles per
    round. Red if the layout key regresses to src (the aggregate then
    re-shuffles the contributions every round) or if the checkpoint
    stops advertising its partitioning."""
    edges = spark.range(2000).select(
        (F.col("id") % 97).alias("src"), ((F.col("id") * 7) % 97).alias("dst")
    ).where(F.col("src") != F.col("dst"))
    sym = edges.union(edges.select(F.col("dst").alias("src"),
                                   F.col("src").alias("dst")))
    adj = sym.distinct()
    degree = adj.groupBy("src").agg(F.count("*").alias("deg"))
    links = checkpoint_partitioned(adj.join(degree, "src"), "dst")
    ranks = degree.select("src", F.lit(1.0).alias("rank"))
    for _ in range(2):
        contribs = links.join(ranks, "src").select(
            F.col("dst").alias("src"),
            (F.col("rank") / F.col("deg")).alias("c"))
        ranks = contribs.groupBy("src").agg(F.sum("c").alias("rank"))
    plan = ranks._jdf.queryExecution().executedPlan().toString()
    chains = _parents_of_scans(plan, "Scan ExistingRDD")
    plan_lines = plan.splitlines()
    scan_idx = [j for j, l in enumerate(plan_lines) if "Scan ExistingRDD" in l]
    link_chains = [
        c for i, c in enumerate(chains) if "deg" in plan_lines[scan_idx[i]]
    ]
    assert link_chains, "no links ExistingRDD scan in the physical plan"
    for chain in link_chains:
        for node in chain:
            assert not node.startswith("Exchange"), (
                "a pagerank round shuffled the dst-partitioned links "
                "frame (layout regression):\n" + plan)
