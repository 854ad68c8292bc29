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
