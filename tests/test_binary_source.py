"""binaryFile source: per-file media ingest — path-parsed metadata,
byte-exact content, foreign files pruned, census reconciles with the
parquet-direct table."""

from pyspark.sql import functions as F

from etl_pipeline_from_mongo_json_to_postgre_spark.sources.binary_source import (
    read_media_files,
    s13_binaryfile_media_scan,
    stage_document_files,
)


def test_content_roundtrips_byte_exact_and_foreign_files_pruned(spark, tmp_path):
    sf = tmp_path / "sfX"
    sf.mkdir()
    rows = [
        (1, "hello media", "en", "s", 11),
        (2, "zwei bytes !~", "de", "s", 13),
        (3, "third", "fr", "s", 5),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.parquet(str(sf / "documents.parquet"))
    out = stage_document_files(spark, str(sf))
    # foreign files at the prefix must not enter the scan: one wrong
    # extension (glob-pruned) and one wrong name shape (regex-pruned)
    import shutil

    shutil.copy(out + "/doc_1_en.bin", out + "/README.txt")
    shutil.copy(out + "/doc_1_en.bin", out + "/thumbnail.bin")
    got = {r.doc_id: r for r in read_media_files(spark, out).collect()}
    assert set(got) == {1, 2, 3}
    for doc_id, text, lang, *_ in rows:
        r = got[doc_id]
        assert r.lang == lang
        assert bytes(r.content) == text.encode("utf-8")
        assert r.length == len(text.encode("utf-8"))


def test_stage_cache_invalidates_on_source_change(spark, tmp_path):
    import shutil
    import time

    sf = tmp_path / "sfY"
    sf.mkdir()
    df = spark.createDataFrame(
        [(1, "a", "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.write.parquet(str(sf / "documents.parquet"))
    p1 = stage_document_files(spark, str(sf))
    assert p1 == stage_document_files(spark, str(sf))  # idempotent
    time.sleep(0.01)
    shutil.rmtree(sf / "documents.parquet")
    df2 = df.union(
        df.select(F.lit(2).cast("long"), "text", "lang", "source", "n_chars")
    )
    df2.write.parquet(str(sf / "documents.parquet"))
    p2 = stage_document_files(spark, str(sf))
    assert p2 != p1, "regenerated source must not serve the stale stage"
    assert read_media_files(spark, p2).count() == 2


def test_unrepresentable_lang_fails_loudly_at_stage_time(spark, tmp_path):
    import pytest

    sf = tmp_path / "sfL"
    sf.mkdir()
    df = spark.createDataFrame(
        [(1, "ok", "en", "s", 2), (2, "bad", "pt_BR", "s", 3)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.write.parquet(str(sf / "documents.parquet"))
    with pytest.raises(Exception, match=r"pt_BR.*file-name metadata"):
        stage_document_files(spark, str(sf))


def test_null_and_empty_text_skipped_consistently_with_oracle(spark, tmp_path):
    """binaryFile silently drops 0-byte files (verified on 4.1.2), so
    NULL/empty text must be skipped at stage time AND filtered in the
    oracle — neither engine counts the row (ADVICE r9 asymmetry)."""
    import duckdb

    from etl_pipeline_from_mongo_json_to_postgre_spark.sources.binary_source import (
        ORACLE_SQL,
    )

    sf = tmp_path / "sfN"
    sf.mkdir()
    df = spark.createDataFrame(
        [(1, None, "xx", "s", 0), (2, "", "yy", "s", 0), (3, "ab", "en", "s", 2)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.write.parquet(str(sf / "documents.parquet"))
    got = {r.lang: r for r in s13_binaryfile_media_scan(spark, str(sf)).collect()}
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    ora = {
        r[0]: r
        for r in con.execute(ORACLE_SQL["s13_binaryfile_media_scan"]).fetchall()
    }
    assert set(got) == set(ora) == {"en"}
    g = got["en"]
    assert (
        g.n_files,
        g.listed_bytes,
        g.content_bytes,
        g.max_bytes,
        g.chars_measured,
    ) == tuple(ora["en"][1:])


def test_census_reconciles_with_parquet(spark, sf_dir):
    out = {r.lang: r for r in s13_binaryfile_media_scan(spark, sf_dir).collect()}
    direct = {
        r.lang: r
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .groupBy("lang")
        .agg(
            F.count("*").alias("docs"),
            F.sum(F.octet_length("text")).alias("bytes_total"),
            F.sum(F.length("text")).alias("chars_total"),
        )
        .collect()
    }
    assert set(out) == set(direct)
    for lang, r in out.items():
        assert r.n_files == direct[lang].docs
        assert r.listed_bytes == direct[lang].bytes_total
        assert r.content_bytes == direct[lang].bytes_total
        assert r.chars_measured == direct[lang].chars_total
