import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def pytest_sessionstart(session):
    """Auto-stamp fingerprints when fresh driver evidence postdates the
    committed stamps (VERDICT r6 task 8): 'run stamp_fingerprints.py
    first thing each round' kept being a manual step the suite could
    catch the builder skipping — twice. Now a fresh clone + a new
    CORRECTNESS_r*.json + pytest is green with no manual tool run, and
    stamping still happens against the round-start code because this
    fires before any test (or in-round edit the tests exercise) runs.
    No-op when every green-evidenced entry already holds a stamp at or
    after its latest green round."""
    try:
        import __spark_entry__ as e

        ev = e._evidence_latest_green()
        stamps = e._stamps()
        q_raw, _ = e._raw_registries()
        # filter to entries still in the registry: evidence for a
        # removed/renamed entry can never be stamped, and without the
        # filter it would re-trigger the tool on every session forever
        if any(stamps.get(n, {}).get("round", -1) < r
               for n, r in ev.items() if n in q_raw):
            from tools import stamp_fingerprints as tool

            argv, sys.argv = sys.argv, ["stamp_fingerprints.py"]
            try:
                tool.main()
            finally:
                sys.argv = argv
    except Exception as exc:  # pragma: no cover - never block the suite
        print(f"[conftest] fingerprint auto-stamp skipped: {exc}", file=sys.stderr)


@pytest.fixture(scope="session")
def spark():
    from etl_pipeline_from_mongo_json_to_postgre_spark.session import get_spark

    s = get_spark(app_name="tests", cpus=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def duck(sf_dir):
    from tests.oracle_compare import duckdb_conn

    return duckdb_conn(sf_dir)
