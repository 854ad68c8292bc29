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
