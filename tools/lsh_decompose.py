"""Decompose the LSH verify family (VERDICT r13 task 3): where do
sim_cosine_pairs_lsh / dedup_embedding_cosine actually spend time, and
how many candidate pairs does each band contribute?

Stages timed separately (noop sink, warm session, best-of-N):
  A. vecs checkpoint        — corpus projection + norm materialization
  B. banding                — 32 hyperplane dots + band keys (no join)
  C. bucket census          — per-band bucket sizes and implied C(sz,2)
                              candidate volume (what the self-join must
                              generate before the a<b filter and dedup)
  D. candidates             — self-join + a<b + dropDuplicates count
  E. full verify            — the complete entry (cosine + threshold)

Probe-only; nothing here is used by bench.py or the driver.

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/lsh_decompose.py
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

    from etl_pipeline_from_mongo_json_to_postgre_spark.operators import similarity as S

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def timed(label, fn, reps=3):
        best = None
        for _ in range(reps):
            t0 = time.time()
            out = fn()
            el = time.time() - t0
            best = el if best is None else min(best, el)
        print(json.dumps({label: round(best, 3)}), flush=True)
        return out

    # warm
    S._vectors(spark, sf_dir).count()

    n = S._vectors(spark, sf_dir).count()
    print(json.dumps({"n_vectors": n}), flush=True)

    # A: checkpoint (construction executes the eager localCheckpoint)
    timed("A_vecs_checkpoint", lambda: S._vectors(spark, sf_dir)
          .localCheckpoint(eager=True))

    vecs = S._vectors(spark, sf_dir).localCheckpoint(eager=True)

    # B: banding only (dots + band keys, exploded) over the checkpoint
    def banded_df():
        with_dots = vecs.select(
            "vec_id", S._matrix_dots(F.col("v"), S.HYPERPLANES).alias("d"))
        band_keys = F.array(*[
            sum(F.when(F.element_at("d", b * S.BITS_PER_BAND + r + 1) > 0,
                       1 << r).otherwise(0)
                for r in range(S.BITS_PER_BAND)).cast("int")
            for b in range(S.N_BANDS)
        ])
        return with_dots.select(
            "vec_id", F.posexplode(band_keys).alias("band", "key"))

    timed("B_banding_noop", lambda: noop(banded_df()))

    # C: bucket census per band
    buckets = (banded_df().groupBy("band", "key")
               .agg(F.count("*").alias("sz")))
    census = (buckets.groupBy("band")
              .agg(F.count("*").alias("n_buckets"),
                   F.max("sz").alias("max_bucket"),
                   F.sum(F.col("sz") * (F.col("sz") - 1) / 2)
                    .cast("long").alias("cand_pairs"))
              .orderBy("band").collect())
    for r in census:
        print(json.dumps({"band": r["band"], "n_buckets": r["n_buckets"],
                          "max_bucket": r["max_bucket"],
                          "cand_pairs": r["cand_pairs"]}), flush=True)

    # D: candidate generation (self-join + dedup), count + wall
    def cand_df():
        b = banded_df()
        a, bb = b.alias("a"), b.alias("b")
        return (a.join(bb, ["band", "key"])
                .where(F.col("a.vec_id") < F.col("b.vec_id"))
                .select(F.col("a.vec_id").alias("vec_a"),
                        F.col("b.vec_id").alias("vec_b"))
                .dropDuplicates(["vec_a", "vec_b"]))

    print(json.dumps({"cand_deduped": cand_df().count()}), flush=True)
    timed("D_candidates_noop", lambda: noop(cand_df()))

    # E: the full entries, end to end (fresh construction each rep,
    # the bench methodology)
    for name in ("sim_cosine_pairs_lsh", "dedup_embedding_cosine"):
        fn = getattr(S, name)
        timed(f"E_{name}", lambda fn=fn: noop(fn(spark, sf_dir)))
        out = fn(spark, sf_dir)
        print(json.dumps({f"{name}_rows": out.count()}), flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
