import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def pytest_sessionstart(session):
    """Auto-stamp fingerprints when fresh driver evidence postdates the
    committed stamps (VERDICT r6 task 8) — but ONLY when the caller opts
    in with SPARK_GRAFT_AUTOSTAMP=1 (VERDICT r7 task 3 / ADVICE r7): a
    plain `pytest` run must never rewrite the committed
    tools/entry_fingerprints.json as a side effect (a reviewer/CI run
    should leave `git status` clean). The builder's round-start routine
    sets the env var (or runs tools/stamp_fingerprints.py directly);
    the pending-stamp logic in __spark_entry__._drifted keeps the
    unstamped state benign for every test either way. When stamps ARE
    stale and the var is unset, emit a visible one-line warning instead
    of silently diverging."""
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
            if os.environ.get("SPARK_GRAFT_AUTOSTAMP") != "1":
                print("[conftest] fingerprint stamps lag driver evidence; "
                      "run `python tools/stamp_fingerprints.py` or set "
                      "SPARK_GRAFT_AUTOSTAMP=1 (not auto-stamping: plain "
                      "pytest stays side-effect-free)", file=sys.stderr)
                return
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
