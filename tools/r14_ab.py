"""Interleaved same-session A/Bs for the r14 operator changes (guide
§1: measure first; same-session adjacency cancels host drift — the r13
methodology). Each pair runs A,B,A,B... with fresh construction + noop
sink per rep; old variants are faithful copies of the r13 code.

Probe-only; nothing here is used by bench.py or the driver.

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/r14_ab.py \
        [kmeans] [annivf] [trained] [pagerank] [minhash]
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
    which = set(sys.argv[1:]) or {"kmeans", "annivf", "trained",
                                  "pagerank", "minhash"}

    from pyspark.sql import functions as F

    from tools.perf_probe import build_session

    spark = build_session(cpus)
    spark.sparkContext.setLogLevel("WARN")
    sc = spark.sparkContext

    from etl_pipeline_from_mongo_json_to_postgre_spark.operators import (
        ann_trained as AT,
        dedup as D,
        graph as G,
        kmeans as KM,
        similarity as S,
    )
    from etl_pipeline_from_mongo_json_to_postgre_spark.session import tune_for_oracle

    tune_for_oracle(spark)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def interleave(label_a, fn_a, label_b, fn_b, reps=3):
        best = {label_a: None, label_b: None}
        jobs = {label_a: 0, label_b: 0}
        for _ in range(reps):
            for label, fn in ((label_a, fn_a), (label_b, fn_b)):
                jb = set(sc.statusTracker().getJobIdsForGroup(None))
                t0 = time.time()
                noop(fn())
                el = time.time() - t0
                ja = set(sc.statusTracker().getJobIdsForGroup(None))
                if best[label] is None or el < best[label]:
                    best[label] = el
                    jobs[label] = len(ja - jb)
        for label in (label_a, label_b):
            print(json.dumps({label: {"best": round(best[label], 3),
                                      "jobs": jobs[label]}}), flush=True)

    # ------------------------------------------------------------------
    # kmeans: r13 posexplode update vs r14 wide decimal aggregate
    # ------------------------------------------------------------------
    def update_r13(assigned, k, dim=KM.DIM, with_vsq=False):
        vsq = F.aggregate(F.transform(F.col("v"), lambda x: x * x),
                          F.lit(0.0), lambda a, x: a + x)
        pre = assigned.select(
            "cluster_id",
            *([vsq.alias("vsq")] if with_vsq else []),
            F.posexplode("v").alias("pos", "x"),
        )
        sums = (
            pre.groupBy("cluster_id", "pos")
            .agg(
                F.sum(F.col("x").cast(KM._ACC)).alias("s"),
                F.count("*").alias("n"),
                *([F.sum(F.when(F.col("pos") == 0, F.col("vsq")).cast(KM._ACC))
                   .alias("vsq_part")] if with_vsq else []),
            )
            .collect()
        )
        from decimal import Decimal
        acc, cnt = {}, {}
        total_vsq = Decimal(0)
        for r in sums:
            c = r["cluster_id"] - 1
            acc.setdefault(c, [0.0] * dim)[r["pos"]] = float(r["s"])
            cnt[c] = r["n"]
            if with_vsq and r["vsq_part"] is not None:
                total_vsq += r["vsq_part"]
        return [
            [x / cnt[c] for x in acc[c]] if c in cnt else None
            for c in range(k)
        ], [cnt.get(c, 0) for c in range(k)], (
            float(total_vsq) if with_vsq else None)

    def train_with(update_fn):
        vecs = S._vectors(spark, sf_dir).select("vec_id", "v")
        vecs = vecs.localCheckpoint(eager=True)
        centroids = KM._init_centroids(vecs, KM.K)
        history, total_vsq = [], 0.0
        for it in range(KM.ITERS):
            assigned = KM._assign(vecs, centroids)
            want = it == 0
            updated, counts, vsq_total = update_fn(assigned, KM.K, KM.DIM,
                                                   with_vsq=want)
            if want:
                total_vsq = vsq_total
            centroids = [u if u is not None else centroids[i]
                         for i, u in enumerate(updated)]
            history.append(total_vsq - sum(
                counts[c] * sum(x * x for x in centroids[c])
                for c in range(KM.K) if counts[c]))
        return centroids, history

    if "kmeans" in which:
        c_old, h_old = train_with(update_r13)
        c_new, h_new = train_with(KM._update)
        print(json.dumps({"kmeans_bit_identical":
                          c_old == c_new and h_old == h_new}), flush=True)

        def km_old():
            train_with(update_r13)
            return spark.range(1)

        def km_new():
            train_with(KM._update)
            return spark.range(1)

        interleave("kmeans_update_r13_posexplode", km_old,
                   "kmeans_update_r14_wideagg", km_new)

    # ------------------------------------------------------------------
    # ann_ivf_topk: r13 dots-in-checkpoint vs r14 narrowed checkpoint
    # ------------------------------------------------------------------
    def ann_ivf_r13():
        from pyspark.sql.window import Window
        vecs = S._vectors(spark, sf_dir)
        assigned = vecs.select(
            "vec_id", "v", "nrm",
            S._matrix_dots(F.col("v"), S.CENTROIDS).alias("dots"),
        ).select(
            "vec_id", "v", "nrm", "dots",
            F.array_position("dots", F.array_max("dots")).alias("cluster_id"),
        ).localCheckpoint(eager=True)
        qprobe_w = Window.partitionBy("query_id").orderBy(
            F.desc("dot"), F.asc("cid"))
        probes = (
            assigned.where(F.col("vec_id") < S.N_QUERIES)
            .select(
                F.col("vec_id").alias("query_id"),
                F.col("v").alias("qv"),
                F.col("nrm").alias("qn"),
                F.posexplode("dots").alias("pos", "dot"),
            )
            .withColumn("cid", (F.col("pos") + 1).cast("long"))
            .withColumn("probe_rank", F.row_number().over(qprobe_w))
            .where(F.col("probe_rank") <= S.N_PROBE)
            .select("query_id", "qv", "qn", F.col("cid").alias("cluster_id"))
        )
        cand = F.broadcast(probes).join(assigned, "cluster_id").where(
            F.col("vec_id") != F.col("query_id"))
        cos = S._dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))
        w = Window.partitionBy("query_id").orderBy(
            F.desc("cos"), F.asc("neighbor_id"))
        return (
            cand.select("query_id", F.col("vec_id").alias("neighbor_id"),
                        cos.alias("cos"))
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= S.TOPK)
            .select("query_id", "neighbor_id", "rank",
                    F.round("cos", 6).alias("cosine"))
        )

    if "annivf" in which:
        rows_old = sorted(map(tuple, ann_ivf_r13().collect()))
        rows_new = sorted(map(tuple, S.ann_ivf_topk(spark, sf_dir).collect()))
        print(json.dumps({"annivf_rows_identical": rows_old == rows_new}),
              flush=True)
        interleave("ann_ivf_r13_dots_ckpt", ann_ivf_r13,
                   "ann_ivf_r14_narrow_ckpt",
                   lambda: S.ann_ivf_topk(spark, sf_dir))

    # ------------------------------------------------------------------
    # trained base: r13 scores-in-checkpoint vs r14 narrowed
    # ------------------------------------------------------------------
    def trained_base_r13():
        AT._require_trained()
        return (
            AT.planted_vectors(spark, sf_dir)
            .select("vec_id", "v",
                    AT._coarse_scores(F.col("v")).alias("scores"))
            .select(
                "vec_id", "v", "scores",
                F.array_position("scores",
                                 F.array_max("scores")).alias("cell"),
            )
            .withColumn(
                "res",
                F.zip_with(
                    F.col("v"),
                    F.element_at(
                        F.array(*[AT._plane_lit(c)
                                  for c in AT.TRAINED_CENTROIDS]),
                        F.col("cell").cast("int"),
                    ),
                    lambda x, y: x - y,
                ),
            )
            .select(
                "vec_id", "v", "scores", "cell",
                *[AT._sub_sq_dists(F.col("res"), s).alias(f"_d{s}")
                  for s in range(AT.TSUB)],
            )
            .select(
                "vec_id", "v", "scores", "cell",
                F.array(*[
                    F.array_position(
                        F.col(f"_d{s}"), F.array_min(F.col(f"_d{s}"))
                    ).cast("int")
                    for s in range(AT.TSUB)
                ]).alias("codes"),
            )
            .localCheckpoint(eager=True)
        )

    def topk_from_base_r13(base):
        from pyspark.sql.window import Window
        cand = base.select("vec_id", "cell", "codes")
        cent_lit = F.array(*[AT._plane_lit(c) for c in AT.TRAINED_CENTROIDS])
        qprobe_w = Window.partitionBy("query_id").orderBy(
            F.desc("score"), F.asc("cid"))
        probes = (
            base.where(F.col("vec_id") < AT.T_NQ)
            .select(
                F.col("vec_id").alias("query_id"),
                F.col("v").alias("qv"),
                F.posexplode("scores").alias("pos", "score"),
            )
            .withColumn("cid", (F.col("pos") + 1).cast("long"))
            .withColumn("probe_rank", F.row_number().over(qprobe_w))
            .where(F.col("probe_rank") <= AT.T_NPROBE)
            .withColumn(
                "qres",
                F.zip_with(
                    F.col("qv"),
                    F.element_at(cent_lit, F.col("cid").cast("int")),
                    lambda x, y: x - y,
                ),
            )
            .select(
                "query_id",
                F.col("cid").alias("cell"),
                F.array(*[AT._sub_sq_dists(F.col("qres"), s)
                          for s in range(AT.TSUB)]).alias("lut"),
            )
        )
        adc = None
        for s in range(1, AT.TSUB + 1):
            term = F.element_at(F.element_at("lut", s),
                                F.element_at("codes", s))
            adc = term if adc is None else adc + term
        rank_w = Window.partitionBy("query_id").orderBy(
            F.asc("adc"), F.asc("neighbor_id"))
        return (
            F.broadcast(probes).join(cand, "cell")
            .where(F.col("vec_id") != F.col("query_id"))
            .select("query_id", F.col("vec_id").alias("neighbor_id"),
                    adc.alias("adc"))
            .withColumn("rank", F.row_number().over(rank_w))
            .where(F.col("rank") <= AT.T_TOPK)
            .select("query_id", "neighbor_id", "rank",
                    F.round("adc", 6).alias("adc_dist"))
        )

    if "trained" in which:
        rows_old = sorted(map(tuple,
                              topk_from_base_r13(trained_base_r13()).collect()))
        rows_new = sorted(map(tuple,
                              AT.ann_ivf_pq_trained_topk(spark,
                                                         sf_dir).collect()))
        print(json.dumps({"trained_rows_identical": rows_old == rows_new}),
              flush=True)
        interleave("trained_topk_r13_scores_ckpt",
                   lambda: topk_from_base_r13(trained_base_r13()),
                   "trained_topk_r14_narrow_ckpt",
                   lambda: AT.ann_ivf_pq_trained_topk(spark, sf_dir))

    # ------------------------------------------------------------------
    # pagerank: r13 shape (no adj barrier, hardcoded dst, no sizing job)
    # vs r14 committed
    # ------------------------------------------------------------------
    def pagerank_parts_r13():
        from etl_pipeline_from_mongo_json_to_postgre_spark.operators.association import (
            copurchase_pairs,
        )
        from etl_pipeline_from_mongo_json_to_postgre_spark.sources.parquet import (
            load_table,
        )
        li = load_table(spark, sf_dir, "lineitem")
        edges = copurchase_pairs(li, min_count=1).select(
            F.col("part_a").alias("src"), F.col("part_b").alias("dst"))
        adj = edges.select("src", "dst").union(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        degree = adj.groupBy("src").agg(F.count("*").alias("deg"))
        links = G.checkpoint_partitioned(adj.join(degree, "src"), "dst")
        ranks = degree.select("src", F.lit(1.0).alias("rank"))
        for i in range(G.PR_ITERS):
            contribs = (
                links.join(ranks, "src")
                .select(F.col("dst").alias("src"),
                        (F.col("rank") / F.col("deg")).alias("c")))
            ranks = contribs.groupBy("src").agg(
                (F.lit(1.0 - G.DAMPING)
                 + F.lit(G.DAMPING) * F.sum("c")).alias("rank"))
        ranks = ranks.select(F.col("src").alias("node"), "rank").select(
            "node", F.round("rank", 6).alias("rank"))
        return ranks.agg(
            F.count("*").cast("bigint").alias("n_nodes"),
            (F.abs(F.sum("rank") - F.count("*"))
             <= 1e-6 * F.count("*")).alias("mass_conserved"),
            (F.min("rank") >= F.lit(1.0 - G.DAMPING - 1e-9)).alias(
                "all_ranks_positive"),
        )

    if "pagerank" in which:
        rows_old = sorted(map(tuple, pagerank_parts_r13().collect()))
        rows_new = sorted(map(tuple,
                              G.graph_pagerank_parts(spark, sf_dir).collect()))
        print(json.dumps({"pagerank_rows_identical": rows_old == rows_new}),
              flush=True)
        interleave("pagerank_r13_shape", pagerank_parts_r13,
                   "pagerank_r14_adjbarrier",
                   lambda: G.graph_pagerank_parts(spark, sf_dir))

    # ------------------------------------------------------------------
    # minhash pairs: r13 wide self-join vs r14 keys-only + re-attach
    # ------------------------------------------------------------------
    def minhash_pairs_r13():
        sigs = D.dedup_minhash_signature(spark, sf_dir)
        bands = sigs.select(
            "doc_id",
            *[F.col(f"mh{j}") for j in range(16)],
            F.posexplode(
                F.array(*[
                    F.xxhash64(*[F.col(f"mh{b * 4 + r}") for r in range(4)])
                    for b in range(4)
                ])
            ).alias("band", "band_key"),
        ).localCheckpoint(eager=True)
        a, b = bands.alias("a"), bands.alias("b")
        cand = (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.band_key") == F.col("b.band_key"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
                *[F.col(f"a.mh{j}").alias(f"amh{j}") for j in range(16)],
                *[F.col(f"b.mh{j}").alias(f"bmh{j}") for j in range(16)],
            )
            .dropDuplicates(["doc_a", "doc_b"])
        )
        est = sum(
            F.when(F.col(f"amh{j}") == F.col(f"bmh{j}"), 1).otherwise(0)
            for j in range(16)) / F.lit(16.0)
        return cand.select("doc_a", "doc_b", est.alias("est_jaccard")).where(
            F.col("est_jaccard") >= D.JACCARD_THRESHOLD)

    if "minhash" in which:
        rows_old = sorted(map(tuple, minhash_pairs_r13().collect()))
        rows_new = sorted(map(tuple,
                              D.dedup_minhash_pairs(spark, sf_dir).collect()))
        print(json.dumps({"minhash_rows_identical": rows_old == rows_new}),
              flush=True)
        interleave("minhash_pairs_r13_wide", minhash_pairs_r13,
                   "minhash_pairs_r14_keysonly",
                   lambda: D.dedup_minhash_pairs(spark, sf_dir))

    spark.stop()


if __name__ == "__main__":
    main()
