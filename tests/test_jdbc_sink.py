"""DDL/option generation tests for the JDBC sink (reference K1-K6).

No Postgres server or pgjdbc jar in the container, so these cover the
pure generation layer; network-facing calls are LoadError-gated.
"""

import pytest

from etl_pipeline_from_mongo_json_to_postgre_spark.errors import ConfigError, LoadError
from etl_pipeline_from_mongo_json_to_postgre_spark.plans.mapping_plan import MappingPlan
from etl_pipeline_from_mongo_json_to_postgre_spark.sinks import jdbc


PLAN = MappingPlan.from_config("customers", {
    "target_table": "public.customers",
    "raw_json_column": "raw_json",
    "object_id_attribute": "_id",
    "mappings": {
        "_id": {"column": "customer_id", "type": "text"},
        "name": {"column": "full_name", "type": "string"},
        "age": {"column": "age", "type": "integer"},
        "signup": {"column": "signup_date", "type": "date"},
    },
})


def test_quote_ident_escapes_quotes():
    assert jdbc.quote_ident('we"ird') == '"we""ird"'
    assert jdbc.quote_ident("users") == '"users"'
    with pytest.raises(LoadError):
        jdbc.quote_ident("")
    with pytest.raises(LoadError):
        jdbc.quote_ident("bad\x00name")


def test_split_table_name_normalizes():
    # reference schema_utils.py:24-26: lowercase, default schema public
    assert jdbc.split_table_name("Public.Customers") == ("public", "customers")
    assert jdbc.split_table_name("orders") == ("public", "orders")
    with pytest.raises(LoadError):
        jdbc.split_table_name(".")


def test_create_table_ddl_shape():
    ddl = jdbc.create_table_ddl("public.t", [
        {"name": "a", "type": "TEXT"},
        {"name": "b", "type": "INTEGER", "not_null": True},
    ])
    assert ddl == (
        'CREATE TABLE IF NOT EXISTS "public"."t" ("a" TEXT, "b" INTEGER NOT NULL)'
    )
    with pytest.raises(LoadError):
        jdbc.create_table_ddl("public.t", [])


def test_injection_resistant_ddl():
    ddl = jdbc.create_table_ddl('x."; DROP TABLE users; --', [
        {"name": 'c"; DROP', "type": "TEXT"},
    ])
    # every untrusted fragment stays inside a quoted identifier
    assert '"; drop table users; --"' in ddl.lower()
    assert 'DROP TABLE users' not in ddl.replace('"', "")  # no bare injection
    with pytest.raises(ConfigError):
        jdbc.create_table_ddl("t", [{"name": "c", "type": "TEXT; DROP TABLE x"}])


def test_table_columns_from_plan_order_and_nullability():
    # reference schema_manager.py:5-36: mapped nullable, raw_json JSONB
    # NOT NULL, business columns NOT NULL, in that order
    cols = jdbc.table_columns_from_plan(PLAN)
    names = [c["name"] for c in cols]
    assert names == ["customer_id", "full_name", "age", "signup_date",
                     "raw_json", "ingested_at", "source_collection", "status"]
    by_name = {c["name"]: c for c in cols}
    assert not by_name["customer_id"].get("not_null")
    assert by_name["raw_json"] == {"name": "raw_json", "type": "JSONB", "not_null": True}
    assert by_name["ingested_at"]["type"] == "TIMESTAMPTZ"
    assert by_name["status"]["not_null"]


def test_duplicate_column_rejected():
    # reference schema_manager.py:39-43
    plan = MappingPlan.from_config("c", {
        "target_table": "t",
        "mappings": {
            "a": {"column": "same", "type": "text"},
            "b": {"column": "same", "type": "text"},
        },
    })
    with pytest.raises(ConfigError, match="Duplicate column"):
        jdbc.table_columns_from_plan(plan)


def test_reserved_collision_rejected():
    plan = MappingPlan.from_config("c", {
        "target_table": "t",
        "mappings": {"a": {"column": "raw_json", "type": "text"}},
    })
    with pytest.raises(ConfigError, match="Duplicate column"):
        jdbc.table_columns_from_plan(plan)


def test_audit_bootstrap_ddl_matches_reference_schema():
    stmts = jdbc.audit_bootstrap_ddl()
    assert stmts[0] == 'CREATE SCHEMA IF NOT EXISTS "doc_audit"'
    assert len(stmts) == 4
    audit = stmts[1]
    # reference sql/schema.sql:25-33
    for col in ("ingested_at", "object_id", "source_collection", "object_name",
                "object_status", "missing_columns", "processing_status"):
        assert f'"{col}"' in audit
    assert '"missing_columns" JSONB' in audit
    assert '"ingestion_date" DATE NOT NULL' in stmts[2]
    assert "missing_collections_report" in stmts[3]


def test_jdbc_url_and_options():
    cfg = {"host": "db.internal", "port": 5433, "name": "etl_db",
           "user": "etl_user", "password": "s3cret", "sslmode": "require"}
    url = jdbc.jdbc_url(cfg)
    assert url == ("jdbc:postgresql://db.internal:5433/etl_db"
                   "?stringtype=unspecified&sslmode=require")
    opts = jdbc.jdbc_options(cfg, "Public.Orders")
    assert opts["dbtable"] == '"public"."orders"'
    assert opts["driver"] == "org.postgresql.Driver"
    assert opts["batchsize"] == "10000"
    assert opts["rewriteBatchedInserts"] == "true"
    assert opts["password"] == "s3cret"
    with pytest.raises(ConfigError):
        jdbc.jdbc_url({"host": "h"})


def test_create_table_column_types():
    s = jdbc.create_table_column_types(jdbc.table_columns_from_plan(PLAN))
    assert s.startswith('"customer_id" TEXT, "full_name" TEXT, "age" INTEGER')
    assert '"raw_json" JSONB' in s


def test_write_table_without_server_raises_loaderror(spark):
    df = spark.range(3).selectExpr("id", "cast(id as string) AS s")
    with pytest.raises(LoadError, match="JDBC write"):
        jdbc.write_table(df, "public.t",
                         {"host": "127.0.0.1", "port": 1, "name": "nope"},
                         num_partitions=1)
