"""CSV source: schema enforcement + malformed-row auditing (the same
contract as the JSONL scan — bad lines preserved and counted, never
silently dropped)."""

from pyspark.sql import functions as F

from etl_pipeline_from_mongo_json_to_postgre_spark.sources.csv_source import (
    CORRUPT_COL,
    read_documents_csv,
    s10_csv_roundtrip,
)


def test_malformed_rows_audited_not_dropped(spark, tmp_path):
    path = tmp_path / "drop.csv"
    path.write_text(
        "doc_id,text,lang,source,n_chars\n"
        '1,"hello world",en,src1,11\n'
        'not_a_number,"bad id row",en,src1,10\n'
        '3,"ok again",de,src2,8\n'
    )
    df = read_documents_csv(spark, str(path))
    rows = df.collect()
    assert len(rows) == 3  # nothing dropped
    corrupt = [r for r in rows if r[CORRUPT_COL] is not None]
    assert len(corrupt) == 1
    assert "not_a_number" in corrupt[0][CORRUPT_COL]
    good = {r.doc_id: r for r in rows if r[CORRUPT_COL] is None}
    assert good[1].text == "hello world" and good[3].lang == "de"


def test_embedded_newlines_and_quotes_roundtrip(spark, tmp_path):
    """ADVICE r4: document text containing newlines/quotes must survive
    the stage-write → multiLine-read round trip as intact rows, not be
    split into corrupt fragments."""
    rows = [
        (1, "line one\nline two\nline three", "en", "s1", 29),
        (2, 'she said "hi, there"', "en", "s1", 20),
        (3, "plain", "de", "s2", 5),
        (4, 'mix: "q"\nand, commas', "fr", "s3", 20),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = str(tmp_path / "csv_stage")
    (df.write.mode("overwrite").option("header", True)
       .option("quoteAll", True).option("escape", '"').csv(out))
    back = read_documents_csv(spark, out)
    got = {r.doc_id: r for r in back.collect()}
    assert len(got) == 4
    assert all(r[CORRUPT_COL] is None for r in got.values())
    for doc_id, text, *_ in rows:
        assert got[doc_id].text == text


def test_stage_cache_invalidates_on_source_change(spark, tmp_path):
    """The stage cache key includes a source-data fingerprint, so a
    regenerated sf_dir produces a fresh staging dir (ADVICE r4: path-only
    keys served stale data)."""
    import shutil
    import time

    from etl_pipeline_from_mongo_json_to_postgre_spark.sources.csv_source import (
        stage_documents_csv,
    )

    sf = tmp_path / "sfX"
    sf.mkdir()
    df = spark.createDataFrame(
        [(1, "a", "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.write.parquet(str(sf / "documents.parquet"))
    p1 = stage_documents_csv(spark, str(sf))
    assert p1 == stage_documents_csv(spark, str(sf))  # idempotent
    time.sleep(0.01)
    shutil.rmtree(sf / "documents.parquet")
    df2 = df.union(df.select(F.lit(2).cast("long"), "text", "lang", "source", "n_chars"))
    df2.write.parquet(str(sf / "documents.parquet"))
    p2 = stage_documents_csv(spark, str(sf))
    assert p2 != p1, "regenerated source must not serve the stale stage"
    assert spark.read.option("header", True).csv(p2).count() == 2


def test_roundtrip_census_matches_parquet(spark, sf_dir):
    out = {r.lang: r for r in s10_csv_roundtrip(spark, sf_dir).collect()}
    direct = {
        r.lang: r
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .groupBy("lang")
        .agg(F.count("*").alias("docs"), F.sum("n_chars").alias("chars_total"))
        .collect()
    }
    assert set(out) == set(direct)
    for lang, r in out.items():
        assert r.docs == direct[lang].docs
        assert r.chars_total == direct[lang].chars_total
        assert r.malformed == 0
