"""A/B the iterative-graph job-count levers (VERDICT r13 task 6):
checkpoint cadence and eager-vs-lazy mid-loop cuts on kcore_peel, and
the r14 adj-barrier form of pagerank vs the r13 shape.

Each variant is timed with the bench methodology (fresh construction +
noop sink per rep, best-of-N) plus jobs/rep; variants assert
row-identical output against the committed form before timing counts.

Probe-only; nothing here is used by bench.py or the driver.

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/graph_jobs_ab.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import functions as F

    from tools.perf_probe import build_session

    spark = build_session(cpus)
    spark.sparkContext.setLogLevel("WARN")
    sc = spark.sparkContext

    from etl_pipeline_from_mongo_json_to_postgre_spark.operators import graph as G
    from etl_pipeline_from_mongo_json_to_postgre_spark.operators.association import (
        copurchase_pairs,
    )
    from etl_pipeline_from_mongo_json_to_postgre_spark.session import tune_for_oracle
    from etl_pipeline_from_mongo_json_to_postgre_spark.sources.parquet import load_table

    tune_for_oracle(spark)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def timed(label, fn, reps=3):
        best, best_jobs = None, 0
        for rep in range(reps):
            jb = set(sc.statusTracker().getJobIdsForGroup(None))
            t0 = time.time()
            noop(fn())
            el = time.time() - t0
            ja = set(sc.statusTracker().getJobIdsForGroup(None))
            if best is None or el < best:
                best, best_jobs = el, len(ja - jb)
        print(json.dumps({label: {"best": round(best, 3),
                                  "jobs": best_jobs}}), flush=True)

    def kcore_edges():
        li = load_table(spark, sf_dir, "lineitem")
        return copurchase_pairs(li, min_count=G.KCORE_MIN_PAIR).select(
            F.col("part_a").alias("src"), F.col("part_b").alias("dst"))

    def kcore_variant(cut_every: int, eager: bool):
        """kcore_peel with a parameterized mid-loop cut policy."""
        edges = kcore_edges()
        sym = edges.select("src", "dst").union(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        alive = sym.localCheckpoint(eager=True)
        for i in range(G.KCORE_ROUNDS):
            keep = (alive.groupBy("src").agg(F.count("*").alias("deg"))
                    .where(F.col("deg") >= G.KCORE_K).select("src"))
            alive = (alive.join(keep, "src", "semi")
                     .join(keep.withColumnRenamed("src", "dst"), "dst", "semi"))
            if cut_every and (i + 1) % cut_every == 0 and i + 1 < G.KCORE_ROUNDS:
                alive = alive.localCheckpoint(eager=eager)
        return (alive.groupBy("src").agg(F.count("*").alias("core_degree"))
                .select(F.col("src").alias("node"), "core_degree"))

    # row-identity gates first (sorted collect compare vs committed).
    # NOTE: a lazy (eager=False) mid-loop cut variant HANGS under this
    # session (first action never completes, ~0% CPU after 15 min) —
    # non-eager localCheckpoint inside an AQE-planned iterative loop is
    # not a usable lever; recorded as rejected in OPTIMIZATION_r14.md.
    committed = sorted(map(tuple, G.graph_kcore_parts(spark, sf_dir).collect()))
    for label, fn in [
        ("kcore_no_cut", lambda: kcore_variant(0, eager=True)),
        ("kcore_cut4_eager", lambda: kcore_variant(4, eager=True)),
    ]:
        got = sorted(map(tuple, fn().collect()))
        print(json.dumps({f"{label}_rows_match": got == committed}), flush=True)

    # warm then time
    timed("kcore_committed_cut3_eager",
          lambda: G.graph_kcore_parts(spark, sf_dir))
    timed("kcore_no_cut", lambda: kcore_variant(0, eager=True))
    timed("kcore_cut4_eager", lambda: kcore_variant(4, eager=True))

    # pagerank committed (r14 adj-barrier + auto layout)
    timed("pagerank_committed", lambda: G.graph_pagerank_parts(spark, sf_dir))

    # label propagation committed (reference point)
    timed("labelprop_committed",
          lambda: G.graph_label_propagation(spark, sf_dir))

    spark.stop()


if __name__ == "__main__":
    main()
