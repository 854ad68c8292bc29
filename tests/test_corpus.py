"""Semantic invariants of the corpus-curation operators (oracle parity
is covered registry-wide by test_oracle_parity.py)."""

from pyspark.sql import functions as F

from etl_pipeline_from_mongo_json_to_postgre_spark.operators import corpus


def test_contamination_excludes_benchmark_docs(spark, sf_dir):
    out = corpus.contamination_ngram_overlap(spark, sf_dir).cache()
    assert out.where(F.col("doc_id") % corpus.BENCH_MOD == 0).count() == 0
    assert out.where(F.col("n_overlap") <= 0).count() == 0
    # overlap is bounded by the doc's own distinct-gram budget
    docs = corpus._docs(spark, sf_dir)
    w = corpus._words(F.col("text"))
    budgets = docs.select(
        "doc_id", (F.size(w) - (corpus.N_GRAM - 1)).alias("max_grams")
    )
    joined = out.join(budgets, "doc_id")
    assert joined.where(F.col("n_overlap") > F.col("max_grams")).count() == 0
    out.unpersist()


def test_repetition_stats_ranges(spark, sf_dir):
    out = corpus.text_repetition_stats(spark, sf_dir).cache()
    assert out.where((F.col("dup_word_frac") < 0) | (F.col("dup_word_frac") >= 1)).count() == 0
    assert out.where(
        (F.col("top_bigram_frac") <= 0) | (F.col("top_bigram_frac") > 1)
    ).count() == 0
    # every doc with >= 2 tokens appears exactly once
    docs = corpus._docs(spark, sf_dir)
    w = corpus._words(F.col("text"))
    expected = docs.where(F.size(w) >= 2).count()
    assert out.count() == expected
    assert out.select("doc_id").distinct().count() == expected
    out.unpersist()


def test_c4_keep_is_conjunction_of_flags(spark, sf_dir):
    out = corpus.text_c4_filters(spark, sf_dir)
    bad = out.where(
        F.col("keep")
        != (F.col("len_ok") * F.col("diversity_ok") * F.col("stopword_ok"))
    )
    assert bad.count() == 0
    # the corpus has docs below MIN_TOKENS, so the filter must actually fire
    assert out.where(F.col("len_ok") == 0).count() > 0


def test_pack_sequences_conserves_tokens(spark, sf_dir):
    out = corpus.pack_sequences(spark, sf_dir).cache()
    docs = corpus._docs(spark, sf_dir)
    w = corpus._words(F.col("text"))
    total_tokens = docs.select(F.sum(F.size(w))).collect()[0][0]
    total_docs = docs.count()
    got = out.agg(
        F.sum("bin_tokens").alias("t"), F.sum("n_docs").alias("d")
    ).collect()[0]
    assert got["t"] == total_tokens
    assert got["d"] == total_docs
    # bins are consecutive 0..max within each shard (a doc starts in
    # every bin boundary its predecessor stream crossed)
    agg = out.groupBy("shard").agg(
        F.min("bin_id").alias("lo"),
        F.max("bin_id").alias("hi"),
        F.count("*").alias("n"),
    )
    assert agg.where((F.col("lo") != 0) | (F.col("hi") != F.col("n") - 1)).count() == 0
    out.unpersist()


def test_domain_mix_quota_is_exact(spark, sf_dir):
    """Each source emits exactly min(n_s, floor(MIX_MULT*sqrt(n_s)))
    docs, and small sources are downsampled less aggressively."""
    import math

    docs = corpus._docs(spark, sf_dir)
    n_by_src = dict(docs.groupBy("source").count().collect())
    out = corpus.sample_domain_mix(spark, sf_dir)
    got = dict(out.groupBy("source").count().collect())
    for src, n_s in n_by_src.items():
        expect = min(n_s, math.floor(corpus.MIX_MULT * math.sqrt(n_s)))
        assert got.get(src, 0) == expect, (src, got.get(src), expect)


def test_domain_mix_deterministic(spark, sf_dir):
    a = sorted(tuple(r) for r in corpus.sample_domain_mix(spark, sf_dir).collect())
    b = sorted(tuple(r) for r in corpus.sample_domain_mix(spark, sf_dir).collect())
    assert a == b


def test_token_budget_greedy_frontier(spark, sf_dir):
    """Every admitted doc started under budget; per source either the
    budget is crossed by the last admitted doc or the source ran out."""
    docs = corpus._docs(spark, sf_dir)
    n_by_src = dict(docs.groupBy("source").count().collect())
    out = corpus.sample_token_budget(spark, sf_dir).cache()
    assert out.where(
        F.col("cum_tokens") - F.col("n_tokens") >= corpus.TOKEN_BUDGET
    ).count() == 0
    last = out.groupBy("source").agg(
        F.max("cum_tokens").alias("final_cum"), F.count("*").alias("n_docs")
    )
    for r in last.collect():
        exhausted = r["final_cum"] >= corpus.TOKEN_BUDGET
        ran_out = r["n_docs"] == n_by_src[r["source"]]
        assert exhausted or ran_out, dict(r.asDict())
    out.unpersist()


def _zipf_corpus_rows(n_docs=1200, vocab=6000, doc_len=50, n_dups=25, seed=42):
    """Deterministic Zipfian corpus: >= 5k-term vocabulary, a guaranteed
    stop term in every doc (df == n_docs > SPARSE_DF_FLOOR), and a block
    of near-duplicate pairs that must survive the 0.98 cosine gate."""
    import numpy as np

    rng = np.random.default_rng(seed)
    ranks = np.arange(1, vocab + 1, dtype=np.float64)
    p = (1.0 / ranks) / (1.0 / ranks).sum()
    rows = []
    for i in range(n_docs):
        toks = rng.choice(vocab, size=doc_len - 1, p=p)
        text = "the " + " ".join(f"w{t}" for t in toks)
        rows.append((i, text, "en", f"s{i % 7}", len(text)))
    # near-duplicates: copy of doc i with ONE extra rare token appended
    # (cos = 50/sqrt(50*51) ~ 0.990 > 0.98)
    for j in range(n_dups):
        base = rows[j]
        rows.append((n_docs + j, base[1] + f" w{vocab - 1 - j}", "en",
                     base[3], len(base[1]) + 8))
    return rows


def _write_docs_parquet(tmp_path, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array([r[2] for r in rows], pa.string()),
        "source": pa.array([r[3] for r in rows], pa.string()),
        "n_chars": pa.array([r[4] for r in rows], pa.int64()),
    })
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_sparse_cosine_zipfian_parity_and_cap(spark, tmp_path):
    """VERDICT r4 task 3: on a realistic (>=5k-term Zipfian) corpus the
    relative df cap must (a) actually drop the stop term, (b) keep the
    near-duplicate pairs, (c) hash-match the mirrored DuckDB oracle."""
    import __spark_entry__ as e
    from tests.oracle_compare import compare, duckdb_conn

    rows = _zipf_corpus_rows()
    sf = _write_docs_parquet(tmp_path, rows)
    out = corpus.text_sparse_cosine_pairs(spark, sf)
    pairs = out.collect()
    got_pairs = {(r.doc_a, r.doc_b) for r in pairs}
    # every planted near-dup pair survives the cap + threshold
    for j in range(25):
        assert (j, 1200 + j) in got_pairs, f"planted near-dup {j} missing"
    # the stop term is in every doc (df 1225 > floor 1000): without the
    # cap the candidate set would contain ALL ~750k pairs; with it the
    # result stays near the planted-duplicate set
    assert len(pairs) < 5000, f"cap did not prune stop-term pairs: {len(pairs)}"
    ok, msg = compare(out, duckdb_conn(sf),
                      e.oracle_sql()["text_sparse_cosine_pairs"])
    assert ok, msg


def test_sparse_cosine_relative_branch(spark, tmp_path):
    """The RELATIVE side of the cap (frac * n_docs > floor) — exercised
    with a tiny floor so the branch is testable at unit scale: 10 docs,
    frac 0.5 -> cap 5; a term in 6 docs is dropped, a term in 4 is kept."""
    rows = []
    for i in range(10):
        toks = ["common"] if i < 6 else []   # df(common) = 6 > cap 5
        if i < 4:
            toks.append("mid")               # df(mid) = 4 <= cap 5
        toks += [f"uniq{i}a", f"uniq{i}b"]
        text = " ".join(toks)
        rows.append((i, text, "en", "s", len(text)))
    # two exact duplicates sharing only capped-in terms
    rows.append((100, "mid uniq100a uniq100b", "en", "s", 21))
    rows.append((101, "mid uniq100a uniq100b", "en", "s", 21))
    sf = _write_docs_parquet(tmp_path, rows)
    d = corpus._docs(spark, sf)
    out = corpus._sparse_cosine_pairs(d, df_floor=1, df_frac=0.5).collect()
    got = {(r.doc_a, r.doc_b): r.cosine for r in out}
    assert (100, 101) in got and got[(100, 101)] == 1.0
    # docs 0..5 share ONLY 'common', which the cap drops -> no pair of
    # them may appear unless they also share an uncapped term (none do)
    assert not any(a < 6 and b < 6 and a != 100 for (a, b) in got)


def test_kl_drift_matches_bruteforce(spark, sf_dir):
    """corpus_split_kl_drift must equal the plain-Python add-one KL over
    the same deterministic split (quantization error < 1e-6 * vocab)."""
    import math

    from pyspark.sql import functions as F

    from etl_pipeline_from_mongo_json_to_postgre_spark.functions.sampling import (
        scrambled_key,
    )
    from etl_pipeline_from_mongo_json_to_postgre_spark.operators.curation_ext import (
        SPLIT_BUCKETS,
        TRAIN_BELOW,
        VAL_BELOW,
        corpus_split_kl_drift,
    )

    row = corpus_split_kl_drift(spark, sf_dir).collect()[0]

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bucket = scrambled_key(F.col("doc_id"), SPLIT_BUCKETS)
    split = (F.when(bucket < TRAIN_BELOW, "train")
             .when(bucket < VAL_BELOW, "val").otherwise("test"))
    toks = [
        (r.split, t)
        for r in docs.select(split.alias("split"), "text").collect()
        for t in r.text.split(" ") if t
    ]
    from collections import Counter

    c_tr = Counter(t for s, t in toks if s == "train")
    c_va = Counter(t for s, t in toks if s == "val")
    vocab = set(c_tr) | set(c_va)
    v, n_tr, n_va = len(vocab), sum(c_tr.values()), sum(c_va.values())
    kl = sum(
        ((c_tr[t] + 1.0) / (n_tr + v))
        * math.log(((c_tr[t] + 1.0) / (n_tr + v)) / ((c_va[t] + 1.0) / (n_va + v)))
        for t in vocab
    )
    assert row.vocab_size == v
    assert row.train_tokens == n_tr and row.val_tokens == n_va
    assert abs(row.kl_train_val - kl) < 1e-6 + 1e-12 * v
    assert row.kl_train_val >= 0  # Gibbs' inequality (same support, smoothed)


def test_curation_full_stage_interactions(spark, monkeypatch):
    """Planted fixture for corpus_curation_pipeline_full — every stage
    interaction hand-computed:
    - the bench doc (src0) is UNGATED (5 words) yet still poisons the
      corpus doc sharing its 3-gram;
    - gate: a 10-word src1 doc drops;
    - dedup: the exact duplicate of doc 1 (higher id) drops, keep-first;
    - decontaminate: the src1 doc embedding the bench 3-gram drops;
    - mixture: src2 has 17 clean docs, quota floor(4*sqrt(17)) = 16 —
      exactly the doc with the LARGEST scrambled key drops;
    - split: each kept doc lands in the bucket (id*KNUTH) % 100 says."""
    from etl_pipeline_from_mongo_json_to_postgre_spark.functions.sampling import (
        KNUTH_MULT,
        SCRAMBLE_MOD,
    )
    from etl_pipeline_from_mongo_json_to_postgre_spark.operators import curation_ext

    good = "w" + " w".join(str(i) for i in range(1, 15))  # 15 distinct words
    rows = [
        (100, "en", "src0", "secret bench trigram here now"),  # bench, 5 words
        (1, "en", "src1", good + " alpha"),
        (2, "en", "src1", good + " alpha"),                    # exact dup of 1
        (3, "en", "src1", good + " secret bench trigram"),     # contaminated
        (4, "en", "src1", "only ten words " + " ".join(f"t{i}" for i in range(7))),
    ]
    src2_ids = list(range(10, 27))  # 17 clean src2 docs
    rows += [(i, "de", "src2", good + f" unique{i}") for i in src2_ids]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string, source string, text string")
    monkeypatch.setattr(curation_ext, "_docs", lambda s, d: df)

    out = {
        (r["split"], r["source"], r["lang"]): r["docs"]
        for r in curation_ext.corpus_curation_pipeline_full(spark, "unused").collect()
    }
    # src2: quota drops the largest-scrambled-key doc; src1: only doc 1
    dropped = max(src2_ids, key=lambda i: ((i * KNUTH_MULT) % SCRAMBLE_MOD, i))
    kept = {1} | (set(src2_ids) - {dropped})

    def split_of(i):
        b = (i * KNUTH_MULT) % 100
        return "train" if b < 80 else ("val" if b < 90 else "test")

    want = {}
    for i in sorted(kept):
        key = (split_of(i), "src1" if i == 1 else "src2", "en" if i == 1 else "de")
        want[key] = want.get(key, 0) + 1
    assert out == want


def test_curation_full_without_benchmark_slice(spark, monkeypatch):
    """A corpus with NO benchmark source: the bench shingle set is
    empty, so decontamination must pass every deduped survivor through
    (empty broadcast join side + left-anti against an empty id list),
    not drop rows or error. 17 clean src2 docs -> quota 16 survives
    unchanged from the with-bench fixture."""
    from etl_pipeline_from_mongo_json_to_postgre_spark.functions.sampling import (
        KNUTH_MULT,
        SCRAMBLE_MOD,
    )
    from etl_pipeline_from_mongo_json_to_postgre_spark.operators import curation_ext

    good = "w" + " w".join(str(i) for i in range(1, 15))
    src2_ids = list(range(10, 27))
    rows = [(i, "de", "src2", good + f" unique{i}") for i in src2_ids]
    df = spark.createDataFrame(
        rows, "doc_id bigint, lang string, source string, text string")
    monkeypatch.setattr(curation_ext, "_docs", lambda s, d: df)

    rows_out = curation_ext.corpus_curation_pipeline_full(spark, "unused").collect()
    total = sum(r["docs"] for r in rows_out)
    assert total == len(src2_ids) - 1  # quota floor(4*sqrt(17)) = 16
    # split census matches the hand-computed buckets of the 16 survivors
    dropped = max(src2_ids, key=lambda i: ((i * KNUTH_MULT) % SCRAMBLE_MOD, i))
    want = {}
    for i in set(src2_ids) - {dropped}:
        b = (i * KNUTH_MULT) % 100
        s = "train" if b < 80 else ("val" if b < 90 else "test")
        want[(s, "src2", "de")] = want.get((s, "src2", "de"), 0) + 1
    assert {(r["split"], r["source"], r["lang"]): r["docs"]
            for r in rows_out} == want


def test_decon_df_cap_inert_at_gated_sfs_and_bites_at_sf01():
    """r13 relative decontamination cap (the r5 SPARSE_MAX_DF pattern):
    max(DECON_DF_FLOOR, ceil(DECON_DF_FRAC * screened docs)) df-caps
    the bench shingle set. Pins the three measured facts behind the
    constants: (a) the cap is INERT at the gated SFs — total kept at
    sf0.001 equals the pre-cap r12 value (62); (b) at sf0.1 the r12
    degeneracy (2 survivors of 4750) is closed — kept = 195; (c) the
    floor arm dominates below 8000 screened docs by construction."""
    import math

    import duckdb  # noqa: F401  (oracle_compare brings the dep)

    from etl_pipeline_from_mongo_json_to_postgre_spark.operators import curation_ext as ce
    from tests.oracle_compare import duckdb_conn

    sql = ce.ORACLE_SQL["corpus_decontaminate"]
    kept001 = duckdb_conn("/root/testdata/sf0.001").execute(
        f"SELECT sum(kept_docs) FROM ({sql})").fetchone()[0]
    assert kept001 == 62  # byte-identical to the pre-cap rule (r13 A/B)
    import os
    if os.path.isdir("/root/testdata/sf0.1"):
        kept01 = duckdb_conn("/root/testdata/sf0.1").execute(
            f"SELECT sum(kept_docs) FROM ({sql})").fetchone()[0]
        assert kept01 == 195  # was 2 under the absolute rule
    assert max(ce.DECON_DF_FLOOR,
               math.ceil(ce.DECON_DF_FRAC * 8000)) == ce.DECON_DF_FLOOR
