"""Gopher repetition gate: crafted repetitive/clean docs must land on
the right side of each rule (registry parity covers the real tables)."""

import pytest

from etl_pipeline_from_mongo_json_to_postgre_spark.operators import repetition


@pytest.fixture()
def docs(spark, monkeypatch):
    def _install(rows):
        df = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string")
        monkeypatch.setattr(repetition, "load_table", lambda sp, sf, t: df)
        return df
    return _install


def test_repetition_rules_fire_correctly(spark, docs):
    """doc 1: one 2-gram stuffed ('buy now' x20) -> top2 rule fires.
    doc 2: a 5-gram repeated amid unique filler -> dup5 rule fires.
    doc 3: all-unique words -> every share ~0, kept."""
    stuffed = " ".join(["buy now"] * 20)
    block = "a b c d e"
    # block repeated 6x with unique 2-word separators: 40 words -> 36
    # 5-grams, the block gram occurs 6x -> dup5 = 6/36 = 0.167 > 0.15,
    # while top2 = 6/39 = 0.154 <= 0.20 stays under its own rule
    doc2 = " ".join(
        f"{block} s{i} t{i}" for i in range(5)
    ) + f" {block}"
    clean = " ".join(f"w{i}" for i in range(60))
    docs([(1, stuffed, "en", "s"), (2, doc2, "en", "s"), (3, clean, "en", "s")])
    got = {r.doc_id: r for r in
           repetition.text_gopher_repetition(spark, "unused").collect()}
    assert not got[1].keep_repetition
    assert got[1].top2_share > repetition.TOP2_MAX
    assert not got[2].keep_repetition
    assert got[2].dup5_frac > repetition.DUP5_MAX
    assert got[3].keep_repetition
    assert got[3].top2_share <= repetition.TOP2_MAX
    assert got[3].dup5_frac == 0.0


def test_short_docs_default_to_kept(spark, docs):
    """Docs too short for a gram size contribute zero occurrences there
    (share 0): a 1-word doc is kept, never NULL-flagged."""
    docs([(1, "hello", "en", "s"), (2, "a b", "en", "s")])
    got = {r.doc_id: r for r in
           repetition.text_gopher_repetition(spark, "unused").collect()}
    assert got[1].keep_repetition and got[1].top2_share == 0.0
    assert got[2].keep_repetition and got[2].dup5_frac == 0.0


def test_repetition_matches_oracle(spark, sf_dir, duck):
    from tests.oracle_compare import compare

    ok, msg = compare(
        repetition.text_gopher_repetition(spark, sf_dir), duck,
        repetition.ORACLE_SQL["text_gopher_repetition"])
    assert ok, msg
