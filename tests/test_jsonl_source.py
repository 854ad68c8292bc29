"""JSONL source + per-document failure isolation: malformed lines must
flow through the transform as audited ERROR documents, never vanish."""

from etl_pipeline_from_mongo_json_to_postgre_spark.operators.transform import (
    transform_collection,
)
from etl_pipeline_from_mongo_json_to_postgre_spark.plans.mapping_plan import (
    MappingPlan,
)
from etl_pipeline_from_mongo_json_to_postgre_spark.sources.json_source import (
    read_collection_jsonl,
)

PLAN = MappingPlan.from_config(
    "orders",
    {
        "target_table": "public.orders",
        "mappings": {
            "id": {"column": "order_id", "type": "bigint"},
            "amount": {"column": "amount", "type": "double"},
        },
    },
)


def test_corrupt_lines_become_error_documents(spark, tmp_path):
    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"id": 1, "amount": 10.5}\n'
        "THIS IS NOT JSON\n"
        "\n"
        '{"id": 2, "amount": "bogus"}\n'
        '[1, 2, 3]\n'
        '{"id": 3}\n'
    )
    raw = read_collection_jsonl(spark, str(p))
    assert raw.count() == 5  # blank line skipped, bad lines kept

    data, audit = transform_collection(raw, PLAN, ingested_at="2024-06-01")
    rows = {r.raw_json: r for r in data.collect()}
    # clean document loads
    assert rows['{"id": 1, "amount": 10.5}'].status == "success"
    # malformed line and non-object document -> per-document error
    assert rows["THIS IS NOT JSON"].status == "error"
    assert rows["[1, 2, 3]"].status == "error"
    # present-but-uncastable value -> error; missing attribute -> success
    assert rows['{"id": 2, "amount": "bogus"}'].status == "error"
    assert rows['{"id": 3}'].status == "success"

    by_status = {
        r.processing_status: r["count"]
        for r in audit.groupBy("processing_status").count().collect()
    }
    assert by_status == {"success": 2, "error": 3}


def test_no_silent_success_for_unparsed_docs(spark):
    """Regression: an unparseable document must never produce an
    all-NULL success row (it previously did — the parse failure left
    every per-attribute flag NULL and the filters dropped them)."""
    df = spark.createDataFrame([("{{{",), (None,)], "raw_json string")
    data, _ = transform_collection(df, PLAN, ingested_at="2024-06-01")
    assert data.where(data.status == "success").count() == 0
