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
