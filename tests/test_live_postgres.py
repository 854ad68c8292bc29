"""Live-Postgres integration (VERDICT r4 task 8, stretch).

This container ships a full Postgres 15 server (but NO pgjdbc jar, so
`df.write.jdbc` itself stays jar-gated — documented absence). What a
real server CAN validate, and unit tests never could: the generated
DDL parses and executes on real Postgres grammar, IF NOT EXISTS
reruns are idempotent, NOT NULL constraints materialize, the JSONB
raw-document column accepts the engine's raw_json payloads, and the
engine's audit census matches a SQL census run INSIDE Postgres after
an end-to-end ingest -> transform -> load -> audit round trip (load
via COPY — the same multi-row batched shape rewriteBatchedInserts
produces server-side).

Skips cleanly when server binaries or the postgres user are absent.
"""

import csv
import io
import json
import os
import shutil
import subprocess

import pytest

BASE = "/tmp/spark_graft_pg"
PORT = "5599"
DB = "etl_live"


def _have_pg() -> bool:
    if not (shutil.which("initdb") and shutil.which("pg_ctl") and shutil.which("psql")):
        return False
    try:
        import pwd

        pwd.getpwnam("postgres")
    except KeyError:
        return False
    return True


def _as_pg(cmd: str) -> subprocess.CompletedProcess:
    # postgres refuses to run as root; the deb install ships a postgres user
    return subprocess.run(
        ["su", "-s", "/bin/sh", "postgres", "-c", cmd],
        capture_output=True, text=True, timeout=120,
    )


def _psql(sql: str, stdin: str | None = None, db: str = DB) -> subprocess.CompletedProcess:
    return subprocess.run(
        ["su", "-s", "/bin/sh", "postgres", "-c",
         f"psql -h {BASE} -p {PORT} -d {db} -X -v ON_ERROR_STOP=1 -A -t -c \"{sql}\""],
        capture_output=True, text=True, input=stdin, timeout=120,
    )


@pytest.fixture(scope="module")
def pg():
    if not _have_pg():
        pytest.skip("no usable Postgres server in this environment")
    shutil.rmtree(BASE, ignore_errors=True)
    os.makedirs(BASE)
    shutil.chown(BASE, "postgres")
    r = _as_pg(f"initdb -D {BASE}/data -E UTF8 --no-sync")
    assert r.returncode == 0, r.stderr
    r = _as_pg(
        f"pg_ctl -D {BASE}/data -l {BASE}/log -w "
        f"-o \"-p {PORT} -k {BASE} -c listen_addresses=''\" start"
    )
    if r.returncode != 0:
        log = open(f"{BASE}/log").read() if os.path.exists(f"{BASE}/log") else ""
        pytest.skip(f"postgres failed to start: {r.stderr} {log[-500:]}")
    r = _as_pg(f"createdb -h {BASE} -p {PORT} {DB}")
    assert r.returncode == 0, r.stderr
    yield
    _as_pg(f"pg_ctl -D {BASE}/data stop -m immediate")
    shutil.rmtree(BASE, ignore_errors=True)


MAPPING = {
    "collections": {
        "customers": {
            "target_table": "public.customers",
            "object_id_attribute": "customer_id",
            "mappings": {
                "customer_id": {"column": "customer_id", "type": "integer"},
                "name": {"column": "name", "type": "text"},
                "signup_date": {"column": "signup_date", "type": "date"},
            },
        },
    }
}

INPUT = {
    "customers": [
        {"customer_id": 1, "name": 'Ann "The Hammer"', "signup_date": "2024-01-15"},
        {"customer_id": 2, "name": "Bob", "signup_date": "bad-date"},
        {"customer_id": 3, "name": "Cy"},
    ],
}


def _plan():
    from etl_pipeline_from_mongo_json_to_postgre_spark.plans.mapping_plan import (
        MappingPlan,
    )

    return MappingPlan.from_config("customers", MAPPING["collections"]["customers"])


def _bootstrap_statements():
    from etl_pipeline_from_mongo_json_to_postgre_spark.sinks import jdbc

    return jdbc.audit_bootstrap_ddl() + [
        jdbc.create_table_ddl("public.customers",
                              jdbc.table_columns_from_plan(_plan()))
    ]


def test_generated_ddl_executes_and_is_idempotent(pg):
    stmts = _bootstrap_statements()
    script = ";\n".join(stmts) + ";"
    path = f"{BASE}/bootstrap.sql"
    with open(path, "w") as fh:
        fh.write(script)
    for attempt in ("first", "rerun (IF NOT EXISTS idempotency)"):
        r = _as_pg(f"psql -h {BASE} -p {PORT} -d {DB} -X -v ON_ERROR_STOP=1 -f {path}")
        assert r.returncode == 0, f"{attempt}: {r.stderr}"

    # the real catalog must match table_columns_from_plan exactly
    from etl_pipeline_from_mongo_json_to_postgre_spark.sinks import jdbc

    want = [(c["name"], bool(c.get("not_null"))) for c in
            jdbc.table_columns_from_plan(_plan())]
    r = _psql(
        "SELECT column_name, is_nullable FROM information_schema.columns "
        "WHERE table_schema='public' AND table_name='customers' "
        "ORDER BY ordinal_position"
    )
    assert r.returncode == 0, r.stderr
    got = [(ln.split("|")[0], ln.split("|")[1] == "NO")
           for ln in r.stdout.strip().splitlines()]
    assert got == want
    # audit tables exist
    r = _psql("SELECT count(*) FROM doc_audit.ingestion_audit")
    assert r.returncode == 0 and r.stdout.strip() == "0"


def test_end_to_end_ingest_load_audit_census(pg, spark):
    from etl_pipeline_from_mongo_json_to_postgre_spark import pipeline as pl
    from etl_pipeline_from_mongo_json_to_postgre_spark.sinks import jdbc

    # idempotent bootstrap (test above may or may not have run first)
    path = f"{BASE}/bootstrap2.sql"
    with open(path, "w") as fh:
        fh.write(";\n".join(_bootstrap_statements()) + ";")
    r = _as_pg(f"psql -h {BASE} -p {PORT} -d {DB} -X -v ON_ERROR_STOP=1 -f {path}")
    assert r.returncode == 0, r.stderr
    _psql("TRUNCATE public.customers")
    _psql("TRUNCATE doc_audit.ingestion_audit")

    result = pl.run(spark, INPUT, MAPPING, ingestion_date="2024-02-01")
    cols = [c["name"] for c in jdbc.table_columns_from_plan(_plan())]
    rows = result.data_frames["customers"].select(*cols).collect()

    buf = io.StringIO()
    wr = csv.writer(buf)
    for row in rows:
        wr.writerow(["" if v is None else v for v in row])
    r = _psql(
        f"\\copy public.customers ({', '.join(cols)}) FROM STDIN "
        "WITH (FORMAT csv, NULL '')",
        stdin=buf.getvalue(),
    )
    assert r.returncode == 0, r.stderr

    # audit frame -> real audit table
    audit_cols = ["ingested_at", "object_id", "source_collection",
                  "object_name", "object_status", "missing_columns",
                  "processing_status"]
    abuf = io.StringIO()
    wr = csv.writer(abuf)
    for row in result.audit_df.select(*audit_cols).collect():
        vals = []
        for c, v in zip(audit_cols, row):
            if c == "missing_columns":
                vals.append(json.dumps(list(v or [])))
            else:
                vals.append("" if v is None else v)
        wr.writerow(vals)
    r = _psql(
        f"\\copy doc_audit.ingestion_audit ({', '.join(audit_cols)}) "
        "FROM STDIN WITH (FORMAT csv, NULL '')",
        stdin=abuf.getvalue(),
    )
    assert r.returncode == 0, r.stderr

    # JSONB column is real JSONB: extract a field server-side, including
    # the embedded-quotes document
    r = _psql("SELECT raw_json->>'name' FROM public.customers "
              "WHERE customer_id = 1")
    assert r.returncode == 0, r.stderr
    assert r.stdout.strip() == 'Ann "The Hammer"'

    # server-side census matches the engine's audit pivot
    r = _psql("SELECT processing_status, count(*) "
              "FROM doc_audit.ingestion_audit GROUP BY 1 ORDER BY 1")
    assert r.returncode == 0, r.stderr
    got = dict(ln.split("|") for ln in r.stdout.strip().splitlines())
    want = {s: str(n) for s, n in (
        result.audit_df.groupBy("processing_status").count().collect()
    )}
    assert got == want

    # row census: every input document landed exactly once
    r = _psql("SELECT count(*), count(signup_date) FROM public.customers")
    n_rows, n_dates = r.stdout.strip().split("|")
    assert n_rows == "3"
    assert n_dates == "1"  # 'bad-date' and missing stay NULL


def test_not_null_constraint_is_real(pg):
    r = _psql("INSERT INTO public.customers (customer_id, raw_json, "
              "ingested_at, source_collection, status) "
              "VALUES (99, '{}', now(), 'customers', NULL)")
    assert r.returncode != 0
    assert "not-null" in r.stderr or "null value" in r.stderr
