"""Behavioral dedup tests on synthetic near-duplicates (the testdata
corpus has no exact dups, so detection quality is pinned here)."""

import pytest
from pyspark.sql import functions as F

from etl_pipeline_from_mongo_json_to_postgre_spark.functions.text import (
    shingle_hashes,
    word_hashes,
)


@pytest.fixture(scope="module")
def near_dup_df(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = "the quick brown fox jumps over the lazy dog again and again tomorrow"
    other = "completely different words about spark engines and parquet files here"
    return spark.createDataFrame(
        [(0, base), (1, near), (2, other), (3, base)],
        "doc_id bigint, text string",
    )


def _shingle_sets(df):
    w = F.filter(F.split("text", " "), lambda x: x != "")
    return (
        df.select("doc_id", word_hashes(w).alias("wh"))
        .select("doc_id", F.array_distinct(shingle_hashes(F.col("wh"), 3)).alias("sh"))
    )


def test_identical_docs_have_identical_shingles(near_dup_df):
    rows = {r["doc_id"]: r["sh"] for r in _shingle_sets(near_dup_df).collect()}
    assert rows[0] == rows[3]  # exact dup
    assert rows[0] != rows[2]


def test_near_dup_jaccard_high(near_dup_df):
    rows = {r["doc_id"]: set(r["sh"]) for r in _shingle_sets(near_dup_df).collect()}
    a, b, c = rows[0], rows[1], rows[2]
    j_near = len(a & b) / len(a | b)
    j_far = len(a & c) / len(a | c)
    assert j_near > 0.6  # one word changed at the end
    assert j_far == 0.0


def test_minhash_signature_identical_for_dups(spark, near_dup_df, monkeypatch):
    from etl_pipeline_from_mongo_json_to_postgre_spark.operators import dedup

    # route the query through our synthetic frame
    monkeypatch.setattr(dedup, "_docs", lambda s, d: near_dup_df)
    sig = dedup.dedup_minhash_signature(spark, "unused")
    rows = {r["doc_id"]: tuple(v for k, v in r.asDict().items() if k != "doc_id")
            for r in sig.collect()}
    assert rows[0] == rows[3]
    # near-dup agrees on most components; unrelated doc on none
    agree_near = sum(x == y for x, y in zip(rows[0], rows[1]))
    agree_far = sum(x == y for x, y in zip(rows[0], rows[2]))
    assert agree_near >= 8
    assert agree_far <= 2


@pytest.mark.parametrize("variant", ["dedup_minhash_pairs", "dedup_minhash_pairs_fast_raw"])
def test_minhash_pairs_find_exact_and_near_dups(spark, near_dup_df, monkeypatch, variant):
    """Both LSH pair variants (portable-hash oracle path and the
    xxhash64 fast path) must surface the exact-dup pair at est=1.0 and
    never pair unrelated docs; the near-dup pair is allowed (different
    hash families may band it differently)."""
    from etl_pipeline_from_mongo_json_to_postgre_spark.operators import dedup

    monkeypatch.setattr(dedup, "_docs", lambda s, d: near_dup_df)
    pairs = {
        (r["doc_a"], r["doc_b"]): r["est_jaccard"]
        for r in getattr(dedup, variant)(spark, "unused").collect()
    }
    assert pairs.get((0, 3)) == 1.0
    assert not any(2 in p for p in pairs)


def test_simhash_close_for_near_dups(spark, near_dup_df, monkeypatch):
    from etl_pipeline_from_mongo_json_to_postgre_spark.operators import dedup

    monkeypatch.setattr(dedup, "_docs", lambda s, d: near_dup_df)
    rows = {r["doc_id"]: r["simhash"] for r in dedup.dedup_simhash(spark, "x").collect()}
    ham_near = bin(rows[0] ^ rows[1]).count("1")
    ham_far = bin(rows[0] ^ rows[2]).count("1")
    assert rows[0] == rows[3]
    assert ham_near < ham_far
