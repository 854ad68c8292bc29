"""XML source: schema enforcement + malformed-record auditing + text
fidelity (the same contract as the CSV/JSONL scans — bad records
preserved and counted, never silently dropped; entity escaping must
round-trip arbitrary document text byte-exactly)."""

from pyspark.sql import functions as F

from etl_pipeline_from_mongo_json_to_postgre_spark.sources.xml_source import (
    CORRUPT_COL,
    read_documents_xml,
    s12_xml_roundtrip,
)


def test_malformed_records_audited_not_dropped(spark, tmp_path):
    path = tmp_path / "drop.xml"
    path.write_text(
        "<docs>"
        "<doc><doc_id>1</doc_id><text>hello world</text><lang>en</lang>"
        "<source>src1</source><n_chars>11</n_chars></doc>"
        "<doc><doc_id>not_a_number</doc_id><text>bad id row</text>"
        "<lang>en</lang><source>src1</source><n_chars>10</n_chars></doc>"
        "<doc><doc_id>3</doc_id><text>ok again</text><lang>de</lang>"
        "<source>src2</source><n_chars>8</n_chars></doc>"
        "</docs>"
    )
    df = read_documents_xml(spark, str(path))
    rows = df.collect()
    assert len(rows) == 3  # nothing dropped
    corrupt = [r for r in rows if r[CORRUPT_COL] is not None]
    assert len(corrupt) == 1
    assert "not_a_number" in corrupt[0][CORRUPT_COL]
    good = {r.doc_id: r for r in rows if r[CORRUPT_COL] is None}
    assert good[1].text == "hello world" and good[3].lang == "de"


def test_markup_and_whitespace_text_roundtrip(spark, tmp_path):
    """Document text containing XML markup, entities, quotes and
    newlines must survive the stage-write -> schema-read round trip
    byte-exactly (the writer entity-escapes; the reader must not trim
    or re-interpret)."""
    rows = [
        (1, "line one\nline two\nline three", "en", "s1", 28),
        (2, 'she said "hi, <there> & more"', "en", "s1", 29),
        (3, "plain", "de", "s2", 5),
        (4, "an <doc> inside & an &amp; literal", "fr", "s3", 34),
        # surrounding whitespace: the reader must NOT trim it (Spark's
        # ignoreSurroundingSpaces default would; r9 review finding)
        (5, "  padded on both ends  ", "en", "s1", 23),
        (6, "trailing newline\n", "de", "s2", 17),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = str(tmp_path / "xml_stage")
    (df.write.mode("overwrite").format("xml").option("rowTag", "doc").save(out))
    back = read_documents_xml(spark, out)
    got = {r.doc_id: r for r in back.collect()}
    assert len(got) == 6
    assert all(r[CORRUPT_COL] is None for r in got.values())
    for doc_id, text, *_ in rows:
        assert got[doc_id].text == text


def test_stage_cache_invalidates_on_source_change(spark, tmp_path):
    """Stage cache key includes the source-data fingerprint (same
    discipline as csv_source, ADVICE r4)."""
    import shutil
    import time

    from etl_pipeline_from_mongo_json_to_postgre_spark.sources.xml_source import (
        stage_documents_xml,
    )

    sf = tmp_path / "sfX"
    sf.mkdir()
    df = spark.createDataFrame(
        [(1, "a", "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.write.parquet(str(sf / "documents.parquet"))
    p1 = stage_documents_xml(spark, str(sf))
    assert p1 == stage_documents_xml(spark, str(sf))  # idempotent
    time.sleep(0.01)
    shutil.rmtree(sf / "documents.parquet")
    df2 = df.union(df.select(F.lit(2).cast("long"), "text", "lang", "source", "n_chars"))
    df2.write.parquet(str(sf / "documents.parquet"))
    p2 = stage_documents_xml(spark, str(sf))
    assert p2 != p1, "regenerated source must not serve the stale stage"
    assert (
        spark.read.format("xml").option("rowTag", "doc").load(p2).count() == 2
    )


def test_roundtrip_census_matches_parquet(spark, sf_dir):
    out = {r.lang: r for r in s12_xml_roundtrip(spark, sf_dir).collect()}
    direct = {
        r.lang: r
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .groupBy("lang")
        .agg(
            F.count("*").alias("docs"),
            F.sum("n_chars").alias("chars_total"),
            F.sum(F.length("text")).alias("chars_measured"),
        )
        .collect()
    }
    assert set(out) == set(direct)
    for lang, r in out.items():
        assert r.docs == direct[lang].docs
        assert r.chars_total == direct[lang].chars_total
        assert r.chars_measured == direct[lang].chars_measured
        assert r.malformed == 0


def test_xml_illegal_control_chars_fail_loudly_at_stage_time(spark, tmp_path):
    """Text with XML-1.0-illegal control chars (e.g. \\x08) cannot
    round-trip; staging must raise descriptively instead of letting the
    census surface a bare hash mismatch (ADVICE r9)."""
    import pytest

    from etl_pipeline_from_mongo_json_to_postgre_spark.sources.xml_source import (
        stage_documents_xml,
    )

    sf = tmp_path / "sfC"
    sf.mkdir()
    df = spark.createDataFrame(
        [(1, "fine", "en", "s", 4), (2, "bad\x08char", "en", "s", 8)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.write.parquet(str(sf / "documents.parquet"))
    with pytest.raises(Exception, match=r"XML-1\.0-illegal.*doc_ids.*2"):
        stage_documents_xml(spark, str(sf))


def test_source_fingerprint_markers_and_nested_partitions(tmp_path):
    """_SUCCESS/.crc marker churn (REGULAR files, as Spark writes them)
    must not change the fingerprint, but data files inside nested
    partition directories MUST (ADVICE r9 + r10 review: the flat
    listing fingerprinted nested layouts as nothing)."""
    import os

    from etl_pipeline_from_mongo_json_to_postgre_spark.sources._stage import (
        source_fingerprint,
    )

    root = tmp_path / "documents.parquet"
    root.mkdir()
    (root / "part-0.parquet").write_bytes(b"data")
    base = source_fingerprint(str(tmp_path))
    (root / "_SUCCESS").write_bytes(b"")         # real Spark marker
    (root / ".part-0.parquet.crc").write_bytes(b"x")
    assert source_fingerprint(str(tmp_path)) == base
    # marker mtime churn is also invisible
    os.utime(root / "_SUCCESS", (1, 1))
    assert source_fingerprint(str(tmp_path)) == base
    # nested partition data changes the fingerprint
    (root / "lang=en").mkdir()
    (root / "lang=en" / "part-1.parquet").write_bytes(b"nested")
    with_nested = source_fingerprint(str(tmp_path))
    assert with_nested != base
    (root / "lang=en" / "part-1.parquet").write_bytes(b"nested-regen2")
    assert source_fingerprint(str(tmp_path)) != with_nested
