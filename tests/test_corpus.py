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
