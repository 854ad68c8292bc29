"""Behavioral tests for text operators on crafted inputs the synthetic
corpus can't exercise (emails for PII masking; the oracle-parity suite
covers the corpus-shaped behavior)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_from_mongo_json_to_postgre_spark.operators.text_queries import (
    pii_mask_cols,
)


def test_pii_mask_emails_and_digit_runs(spark):
    rows = [
        ("reach me at jane.doe+spam@example.co.uk today", 1, 0,
         "reach me at <EMAIL> today"),
        ("call 5551234 or 555 12", 0, 2, "call <NUM> or <NUM> 12"),
        ("a@b.io and c_d@e-f.org", 2, 0, "<EMAIL> and <EMAIL>"),
        ("id 123456789 mail x@y.zz num 001", 1, 2,
         "id <NUM> mail <EMAIL> num <NUM>"),
        ("clean text no pii", 0, 0, "clean text no pii"),
    ]
    df = spark.createDataFrame(
        [(t,) for t, *_ in rows], "text string"
    ).select("text", *pii_mask_cols(F.col("text")))
    got = {r.text: (r.n_emails, r.n_numbers, r.masked_text) for r in df.collect()}
    for text, n_em, n_num, masked in rows:
        assert got[text] == (n_em, n_num, masked), text


def test_pii_mask_email_digits_not_double_masked(spark):
    # digits inside an email are consumed by the email mask, not <NUM>
    df = spark.createDataFrame(
        [("contact 12345bob@mail99.com now",)], "text string"
    ).select(*pii_mask_cols(F.col("text")))
    r = df.head()
    assert r.masked_text == "contact <EMAIL> now"
    assert (r.n_emails, r.n_numbers) == (1, 0)


def test_pii_mask_properties(spark):
    """Property-style invariants over generated strings: masking is
    idempotent, and masked output never contains a 3+ digit run or an
    email-shaped token."""
    import itertools
    import re

    frags = ["ok", "a@b.cc", "12", "1234", "x9y", "go 555123 go", ".", "@"]
    texts = [" ".join(p) for p in itertools.permutations(frags, 3)]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    once = df.select("text", *pii_mask_cols(F.col("text")))
    twice = once.select(
        F.col("masked_text").alias("text2"),
        *pii_mask_cols(F.col("masked_text")),
    )
    email_re = re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
    for r in once.collect():
        assert not re.search(r"[0-9]{3,}", r.masked_text), r.masked_text
        assert not email_re.search(r.masked_text), r.masked_text
    for r in twice.collect():
        # idempotent: nothing left to mask on the second pass
        assert r.masked_text == r.text2
        assert (r.n_emails, r.n_numbers) == (0, 0)
