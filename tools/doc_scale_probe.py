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

Round-6 extension (VERDICT r5 task 8): events and graph families —
deterministic generators for events (user sessions with Markov-ish
event-type transitions) and lineitem/part (Zipfian co-purchase edges),
probing the perplexity / lateness / attribution entries on events-rows
and the iterative PageRank / label-propagation / triangle entries on
EDGES:
    python tools/doc_scale_probe.py --family events
    python tools/doc_scale_probe.py --family graph
(default --family documents keeps the original behavior and sizes).
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
    "sample_perplexity_buckets",
    "text_sparse_cosine_pairs",
    "text_bm25_topk",
    "text_winnowing_fingerprint",
    "corpus_ngram_novelty",
    "text_zipf_fit",
    "text_vocab_growth",
    # round-6 additions that scale on documents/bytes
    "sample_importance_weights",
    "text_classifier_score",
    "sample_temperature_mix",
    "mixture_plan_summary",
    "mm_byte_entropy",
    "mm_magic_byte_census",
    # round-7 additions that scale on documents
    "mixture_shard_manifest",
    "dedup_minhash_pairs_fast",
    "text_chunk_windows",
    "chunk_dup_census",
    "text_gopher_repetition",
    "inc_chunk_dedup",
    # round-8 additions that scale on documents
    "text_bpe_train",
    # round-9 additions that scale on documents
    "mm_interleaved_pack",
    # round-12 additions that scale on documents
    "corpus_curation_pipeline_full",
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


EVENTS_FAMILY = [
    "ts_markov_perplexity",
    "events_lateness_census",
    "events_attribution_last_touch",
]

GRAPH_FAMILY = [
    "graph_label_propagation",
    "graph_pagerank_parts",
    "graph_triangle_count",
]


def gen_events(n_events: int, out_dir: str, seed: int = 7) -> None:
    """Events with ~60 rows/user, Markov-ish event-type transitions
    (each type prefers one successor 50% of the time — gives the
    markov-perplexity entries non-uniform structure) and a lateness
    skew: 5% of rows are written out of ts order (for the lateness
    census). 'purchase' rows carry a revenue value (attribution)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    types = ["view", "click", "cart", "purchase", "search", "scroll"]
    k = len(types)
    users = rng.integers(0, max(n_events // 60, 1), size=n_events)
    tcode = np.empty(n_events, dtype=np.int64)
    tcode[0] = 0
    sticky = rng.random(n_events) < 0.5
    draw = rng.integers(0, k, size=n_events)
    for i in range(1, n_events):
        tcode[i] = (tcode[i - 1] + 1) % k if sticky[i] else draw[i]
    base = np.datetime64("2024-03-01T00:00:00", "us")
    ts = base + np.cumsum(rng.integers(1, 2000, size=n_events)).astype(
        "timedelta64[us]") * 1000
    # 5% arrive late: swap their ts back by up to an hour
    late = rng.random(n_events) < 0.05
    ts[late] -= np.timedelta64(1, "h")
    value = np.where(np.array(types)[tcode] == "purchase",
                     rng.uniform(1, 500, n_events).round(2), 0.0)
    tbl = pa.table({
        "event_id": pa.array(range(n_events), pa.int64()),
        "ts": pa.array(ts),
        "user_id": pa.array(users, pa.int64()),
        "event_type": pa.array([types[c] for c in tcode], pa.string()),
        "value": pa.array(value, pa.float64()),
        "props": pa.array(["{}"] * n_events, pa.string()),
    })
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(tbl, os.path.join(out_dir, "events.parquet"))


def gen_graph(n_lineitems: int, out_dir: str, seed: int = 7) -> None:
    """lineitem/part with Zipfian part popularity (real skew for the
    co-purchase edge builders) at ~4 items per order."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    n_parts = max(n_lineitems // 10, 100)
    ranks = np.arange(1, n_parts + 1, dtype=np.float64)
    p = (1.0 / ranks) / (1.0 / ranks).sum()
    partkey = rng.choice(n_parts, size=n_lineitems, p=p)
    orderkey = np.arange(n_lineitems) // 4
    ship = (np.datetime64("2024-01-01", "us")
            + rng.integers(0, 365, n_lineitems).astype("timedelta64[D]").astype(
                "timedelta64[us]"))
    li = pa.table({
        "l_orderkey": pa.array(orderkey, pa.int64()),
        "l_partkey": pa.array(partkey, pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, 100, n_lineitems), pa.int64()),
        "l_linenumber": pa.array((np.arange(n_lineitems) % 4 + 1).astype(np.int32)),
        "l_quantity": pa.array(rng.integers(1, 50, n_lineitems).astype(np.float64)),
        "l_extendedprice": pa.array(rng.uniform(100, 10000, n_lineitems).round(2)),
        "l_discount": pa.array(rng.integers(0, 10, n_lineitems) / 100.0),
        "l_tax": pa.array(rng.integers(0, 8, n_lineitems) / 100.0),
        "l_returnflag": pa.array(["N"] * n_lineitems, pa.string()),
        "l_linestatus": pa.array(["O"] * n_lineitems, pa.string()),
        "l_shipdate": pa.array(ship),
    })
    part = pa.table({
        "p_partkey": pa.array(range(n_parts), pa.int64()),
        "p_name": pa.array([f"part {i}" for i in range(n_parts)], pa.string()),
        "p_brand": pa.array([f"Brand#{i % 25 + 11}" for i in range(n_parts)],
                            pa.string()),
        "p_type": pa.array([f"TYPE {i % 30}" for i in range(n_parts)], pa.string()),
        "p_size": pa.array((np.arange(n_parts) % 50 + 1).astype(np.int32)),
        "p_retailprice": pa.array(((np.arange(n_parts) % 900) + 100.0)),
    })
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(li, os.path.join(out_dir, "lineitem.parquet"))
    pq.write_table(part, os.path.join(out_dir, "part.parquet"))


FAMILIES = {
    "documents": (DOC_FAMILY, gen_corpus, "5000,15000,50000"),
    "events": (EVENTS_FAMILY, gen_events, "20000,60000,200000"),
    "graph": (GRAPH_FAMILY, gen_graph, "20000,60000,200000"),
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", default="documents", choices=sorted(FAMILIES))
    ap.add_argument("--sizes", default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--entries", default=None,
                    help="comma-separated subset of the family to probe")
    args = ap.parse_args()
    fam_entries, gen, default_sizes = FAMILIES[args.family]
    sizes = [int(s) for s in (args.sizes or default_sizes).split(",")]
    family = (args.entries.split(",") if args.entries else fam_entries)

    from etl_pipeline_from_mongo_json_to_postgre_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark(app_name="doc-scale-probe",
                      cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "16")))
    queries = entrymod.queries()

    shutil.rmtree(STAGE, ignore_errors=True)
    dirs = {}
    for n in sizes:
        d = os.path.join(STAGE, f"{args.family}{n}")
        gen(n, d)
        dirs[n] = d

    # Warm codegen/reader/shuffle so the smallest size's first entry
    # isn't billed ~5s of JVM startup (it flattens every exponent).
    from etl_pipeline_from_mongo_json_to_postgre_spark.sources.parquet import (
        load_table,
    )

    warm_table = {"documents": "documents", "events": "events",
                  "graph": "lineitem"}[args.family]
    warm_key = {"documents": "lang", "events": "event_type",
                "graph": "l_partkey"}[args.family]
    load_table(spark, dirs[sizes[0]], warm_table).groupBy(
        warm_key).count().collect()

    results: dict[str, dict[int, float]] = {}
    for name in family:
        if name not in queries:
            print(f"  {name}: not in registry, skipped")
            continue
        results[name] = {}
        try:
            # per-entry warm run (smallest size, untimed): checkpoint-dir,
            # Arrow, and plan-cache setup otherwise lands on the first
            # timed point and fakes a negative exponent
            queries[name](spark, dirs[sizes[0]]).count()
        except Exception:  # noqa: BLE001 - the timed run reports it
            pass
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
