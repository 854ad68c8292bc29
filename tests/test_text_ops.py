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
