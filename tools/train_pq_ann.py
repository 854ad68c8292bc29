"""Train the IVFADC quantizer on the planted-structure corpus
(VERDICT r6 task 3) and write the trained literals the ann_trained
entries + oracles embed.

  coarse: kmeans.train(k=16, farthest-first init, 5 Lloyd rounds) on
          the full planted corpus — one centroid per planted blob
          (Gonzalez guarantees one seed per separated component).
  PQ:     per subspace s, kmeans.train(k=8, dim=16, farthest-first,
          5 rounds) on the 16-dim RESIDUAL subvectors (v minus the
          assigned trained coarse centroid) — the IVFADC residual
          codebook of Jegou/Douze/Schmid.

Everything downstream treats the output as broadcast literals, exactly
like similarity.CENTROIDS — at 100 TB this script is the (sampled)
index-build job and the JSON is the model artifact the search query
ships to executors.

    python tools/train_pq_ann.py [sf_dir]   # default /root/testdata/sf0.1
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from etl_pipeline_from_mongo_json_to_postgre_spark.operators import ann_trained, kmeans
    from etl_pipeline_from_mongo_json_to_postgre_spark.session import get_spark

    spark = get_spark(app_name="train_pq_ann", cpus=16)
    vecs = ann_trained.planted_vectors(spark, sf_dir)

    cents, hist = kmeans.train(
        vecs, k=ann_trained.NB, iters=5, dim=ann_trained.DIM, init="farthest")
    print("coarse SSE history:", [round(h, 3) for h in hist])

    assigned = kmeans._assign(vecs, cents)
    cent_lit = F.array(*[F.array(*[F.lit(x) for x in c]) for c in cents])
    residuals = assigned.select(
        "vec_id",
        F.zip_with(
            "v", F.element_at(cent_lit, F.col("cluster_id")),
            lambda x, y: x - y,
        ).alias("res"),
    ).localCheckpoint(eager=True)

    codebooks = []
    for s in range(ann_trained.TSUB):
        sub = residuals.select(
            "vec_id",
            F.slice("res", s * ann_trained.TSUBDIM + 1,
                    ann_trained.TSUBDIM).alias("v"),
        )
        cb, cb_hist = kmeans.train(
            sub, k=ann_trained.TCODES, iters=5,
            dim=ann_trained.TSUBDIM, init="farthest")
        print(f"subspace {s} SSE history:", [round(h, 5) for h in cb_hist])
        codebooks.append(cb)

    out = {
        "sf_dir": sf_dir,
        "centroids": cents,
        "codebooks": codebooks,
    }
    with open(ann_trained._TRAINED_PATH, "w") as fh:
        json.dump(out, fh)
    print("wrote", ann_trained._TRAINED_PATH)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
