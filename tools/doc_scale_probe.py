"""Document-family scaling probe (VERDICT r4 task 5).

The round-4 scaling probe covered 100x relational growth but only 10x
documents growth. This one generates Zipfian document corpora at
several sizes (deterministic; >=5k-term vocabulary; 0.5% planted
near-duplicates so the dedup families have real work) and measures the
per-entry scaling exponent of the dedup / minhash / jaccard /
sparse-cosine / BM25 family: exponent = slope of ln(time) on ln(docs).

Usage:
    python tools/doc_scale_probe.py [--sizes 5000,15000,50000] [--out FILE]

An exponent near 1 is linear scaling; anything >1.5 on this family
means a candidate-generation path went super-linear (the all-pairs
trap) and deserves a .explain().
"""

from __future__ import annotations

import argparse
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STAGE = "/tmp/spark_graft_doc_scale"

# registry entries that read ONLY the documents table
DOC_FAMILY = [
    "dedup_exact",
    "dedup_minhash_signature",
    "dedup_minhash_pairs",
    "dedup_minhash_canonical",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "dedup_ngram_jaccard",
    "dedup_jaccard_prefix",
    "dedup_containment_pairs",
    "dedup_substring_spans",
    "text_bpe_merge_step",
    "text_bigram_perplexity",
    "text_sparse_cosine_pairs",
    "text_bm25_topk",
    "text_winnowing_fingerprint",
    "corpus_ngram_novelty",
    "text_zipf_fit",
    "text_vocab_growth",
]


def gen_corpus(n_docs: int, out_dir: str, vocab: int = 6000,
               doc_len: int = 50, seed: int = 7) -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    ranks = np.arange(1, vocab + 1, dtype=np.float64)
    p = (1.0 / ranks) / (1.0 / ranks).sum()
    toks = rng.choice(vocab, size=(n_docs, doc_len), p=p)
    texts = [" ".join(f"w{t}" for t in row) for row in toks]
    # 0.5% planted near-duplicates: copy an earlier doc, append one token
    n_dups = max(1, n_docs // 200)
    for j in range(n_dups):
        texts[n_docs - n_dups + j] = texts[j] + f" w{vocab - 1 - (j % 50)}"
    langs = [("en", "de", "fr", "es", "pt")[i % 5] for i in range(n_docs)]
    tbl = pa.table({
        "doc_id": pa.array(range(n_docs), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array([f"s{i % 20}" for i in range(n_docs)], pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(tbl, os.path.join(out_dir, "documents.parquet"))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="5000,15000,50000")
    ap.add_argument("--out", default=None)
    ap.add_argument("--entries", default=None,
                    help="comma-separated subset of DOC_FAMILY to probe")
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]
    family = (args.entries.split(",") if args.entries else DOC_FAMILY)

    from etl_pipeline_from_mongo_json_to_postgre_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark(app_name="doc-scale-probe",
                      cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "16")))
    queries = entrymod.queries()

    shutil.rmtree(STAGE, ignore_errors=True)
    dirs = {}
    for n in sizes:
        d = os.path.join(STAGE, f"docs{n}")
        gen_corpus(n, d)
        dirs[n] = d

    results: dict[str, dict[int, float]] = {}
    for name in family:
        if name not in queries:
            print(f"  {name}: not in registry, skipped")
            continue
        results[name] = {}
        for n in sizes:
            t0 = time.time()
            try:
                queries[name](spark, dirs[n]).count()
                results[name][n] = round(time.time() - t0, 2)
            except Exception as exc:  # noqa: BLE001
                print(f"  {name}@{n}: ERR {str(exc)[:120]}")
                results[name].pop(n, None)
                break

    lines = [f"| entry | " + " | ".join(f"{n/1000:g}k" for n in sizes)
             + " | exponent |",
             "|---|" + "---|" * (len(sizes) + 1)]
    for name, ts in sorted(results.items()):
        if len(ts) < 2:
            continue
        xs = [math.log(n) for n in ts]
        ys = [math.log(max(t, 0.05)) for t in ts.values()]
        mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
        num = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
        den = sum((x - mx) ** 2 for x in xs)
        expo = round(num / den, 2)
        cells = " | ".join(f"{ts.get(n, float('nan'))}" for n in sizes)
        lines.append(f"| {name} | {cells} | {expo} |")
    report = "\n".join(lines)
    print(report)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(report + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
