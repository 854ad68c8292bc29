"""Train the semantic-dedup coarse quantizer on the REAL embeddings
table (VERDICT r12 task 3) and write the trained centroid literals
the sem_trained entries + oracles embed.

sem_probe_eval's r11 census measured boundary_share = 0.628 under the
fixed seeded (untrained) similarity.CENTROIDS: most verified near-dup
pairs straddle cells, which top-2 multi-probe masks but a trained
quantizer shrinks at the source. This is that trainer — the spherical
analogue of tools/train_pq_ann.py:

  kmeans.train(k=16, scrambled-sample init, 10 Lloyd rounds) on the
  L2-NORMALIZED embeddings — near-dup verification is cosine, so the
  quantizer must carve the unit sphere, not the raw magnitude space;
  on normalized vectors the trained L2 assignment
  argmax(v̂·c − |c|²/2) IS spherical k-means assignment.

Offline numpy A/B on this corpus (r12, sf0.01/sf0.1): seeded
boundary_share 0.595/0.649 -> trained 0.541/0.566, with the trained
top-2 probe window also reaching ~40% MORE verified pairs (126 -> 181
at sf0.01). Everything downstream treats the output as broadcast
literals, exactly like similarity.CENTROIDS — at 100 TB this script
is the sampled index-build job and the JSON is the model artifact.

    python tools/train_sem_centroids.py [sf_dir]  # default /root/testdata/sf0.1
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SEM_TRAIN_K = 16
SEM_TRAIN_ITERS = 10


def main() -> int:
    # argparse, not hand-rolled flag filtering: the r13 review found
    # the space form `--nlist 32` leaking its VALUE into the
    # positional list (sf_dir became "32"), so exactly the documented
    # A/B invocation crashed while `--nlist=32` worked
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.1")
    ap.add_argument("--nlist", type=int, default=SEM_TRAIN_K)
    cli = ap.parse_args()
    sf_dir, nlist = cli.sf_dir, cli.nlist

    # genuine first-training bootstrap: the module import below must
    # tolerate a missing artifact without tripping the dropped-artifact
    # guard (sem_trained._load_trained)
    os.environ["SPARK_GRAFT_SEM_BOOTSTRAP"] = "1"
    from etl_pipeline_from_mongo_json_to_postgre_spark.operators import (
        kmeans,
        sem_trained,
        similarity,
    )
    from etl_pipeline_from_mongo_json_to_postgre_spark.session import get_spark

    spark = get_spark(app_name="train_sem_centroids", cpus=16)
    vecs = similarity._vectors(spark, sf_dir).select(
        "vec_id",
        F.transform(F.col("v"), lambda x: x / F.col("nrm")).alias("v"),
    )
    cents, hist = kmeans.train(
        vecs, k=nlist, iters=SEM_TRAIN_ITERS, init="scrambled")
    print("SSE history:", [round(h, 4) for h in hist])

    out = {
        "sf_dir": sf_dir,
        "k": nlist,
        "iters": SEM_TRAIN_ITERS,
        "normalized": True,
        "centroids": cents,
    }
    # a non-default nlist is an A/B experiment artifact (VERDICT r12
    # task 3) — never clobber the committed production quantizer
    path = (sem_trained._TRAINED_PATH if nlist == SEM_TRAIN_K else
            sem_trained._TRAINED_PATH.replace(".json", f"_k{nlist}.json"))
    with open(path, "w") as fh:
        json.dump(out, fh)
    print("wrote", path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
