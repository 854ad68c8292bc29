"""Golden ETL tests: ingest -> transform -> audit (FIXTURES.md family A)."""

import json

from pyspark.sql import functions as F

from etl_pipeline_from_mongo_json_to_postgre_spark.operators import (
    missing_table_audit_rows,
    transform_collection,
)
from etl_pipeline_from_mongo_json_to_postgre_spark.plans import MappingPlan
from etl_pipeline_from_mongo_json_to_postgre_spark.sources import (
    collections_to_raw_df,
    validate_input_shape,
)
from etl_pipeline_from_mongo_json_to_postgre_spark.errors import InputError

import pytest

SPEC = {
    "target_table": "public.customers",
    "object_id_attribute": "customer_id",
    "mappings": {
        "customer_id": {"column": "customer_id", "type": "integer"},
        "name": {"column": "name", "type": "text"},
        "signup_date": {"column": "signup_date", "type": "date"},
        "email": {"column": "email", "type": "text"},
    },
}

DOCS = [
    {"customer_id": 1, "name": "Alice", "signup_date": "2024-01-15", "email": "a@x.com"},
    {"customer_id": 2, "name": 42, "signup_date": "01/16/2024"},
    {"customer_id": 3, "name": "Chen", "signup_date": "16-01-2024", "email": None},
    {"customer_id": 4, "name": "D", "signup_date": "not-a-date", "email": "d@x.com"},
]


def _run(spark):
    plan = MappingPlan.from_config("customers", SPEC)
    raw = collections_to_raw_df(spark, {"customers": DOCS})["customers"]
    return transform_collection(raw, plan, ingested_at="2024-06-01 00:00:00")


def test_data_frame_shape_and_values(spark):
    data, _ = _run(spark)
    rows = {r["customer_id"]: r for r in data.collect()}
    assert set(data.columns) == {
        "customer_id", "name", "signup_date", "email",
        "raw_json", "ingested_at", "source_collection", "status",
    }
    assert rows[1]["signup_date"].isoformat() == "2024-01-15"
    assert rows[2]["signup_date"].isoformat() == "2024-01-16"  # m/d/Y format
    assert rows[2]["name"] == "42"  # str() cast
    assert rows[2]["email"] is None  # absent -> NULL
    assert rows[3]["signup_date"].isoformat() == "2024-01-16"  # d-m-Y format
    assert rows[4]["signup_date"] is None  # uncastable
    assert rows[4]["status"] == "error"
    assert rows[1]["status"] == "success"
    assert json.loads(rows[1]["raw_json"])["email"] == "a@x.com"


def test_audit_frame_missing_vs_null_vs_error(spark):
    _, audit = _run(spark)
    rows = {r["object_id"]: r for r in audit.collect()}
    assert rows["2"]["missing_columns"] == ["email"]  # absent attr tracked
    assert rows["3"]["missing_columns"] == []  # present-but-null NOT missing
    assert rows["4"]["missing_columns"] == []
    assert rows["4"]["processing_status"] == "error"  # uncastable -> error
    assert rows["1"]["processing_status"] == "success"
    assert all(r["object_name"] == "public.customers" for r in rows.values())
    assert all(r["object_status"] == "NEW" for r in rows.values())


def test_missing_table_audit_rows(spark):
    df = missing_table_audit_rows(
        spark,
        ["public.orders", "public.products"],
        {"public.orders": "orders"},
        ingested_at="2024-06-01 00:00:00",
    )
    rows = {r["object_name"]: r for r in df.collect()}
    assert rows["public.orders"]["source_collection"] == "orders"
    assert rows["public.products"]["source_collection"] is None
    assert all(r["object_status"] == "MISSING" for r in rows.values())
    assert all(r["processing_status"] == "missing" for r in rows.values())


def test_input_shape_validation():
    validate_input_shape({"c": [{"a": 1}]})
    with pytest.raises(InputError):
        validate_input_shape([1, 2])
    with pytest.raises(InputError):
        validate_input_shape({"c": {"a": 1}})
    with pytest.raises(InputError):
        validate_input_shape({"c": [1]})


def test_nested_values_survive_only_in_raw_json(spark):
    docs = [{"customer_id": 9, "name": {"first": "X"}, "signup_date": "2024-01-15"}]
    plan = MappingPlan.from_config("customers", SPEC)
    raw = collections_to_raw_df(spark, {"customers": docs})["customers"]
    data, _ = transform_collection(raw, plan, ingested_at="2024-06-01 00:00:00")
    row = data.collect()[0]
    assert json.loads(row["raw_json"])["name"] == {"first": "X"}
    assert json.loads(row["name"]) == {"first": "X"}  # mapped col: JSON text
