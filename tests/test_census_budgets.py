"""Census budget gate (VERDICT r4 task 6).

The full timing census is minutes of Spark work, so the enforcement run
is opt-in: SPARK_GRAFT_CENSUS=1 python -m pytest tests/test_census_budgets.py
(equivalently: python tools/engine_census.py --budgets
tools/census_budgets_sf001.json with SPARK_GRAFT_SF_DIR=sf0.01 — ONE
command, budgets checked in). What always runs here is the cheap
integrity half: every registry entry must carry a budget, so a new
operator cannot dodge the gate, and the breach logic itself is pinned.
"""

import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BUDGET_FILE = os.path.join(REPO, "tools", "census_budgets_sf001.json")


def _budgets():
    with open(BUDGET_FILE) as fh:
        return json.load(fh)


def test_every_registry_entry_has_a_budget():
    import __spark_entry__ as e

    budgets = _budgets()
    missing = [n for n in e.queries() if n not in budgets]
    assert not missing, f"registry entries without a census budget: {missing}"


def test_budget_floor_and_sanity():
    budgets = _budgets()
    assert all(v >= 3.0 for v in budgets.values()), "floor is 3 s"
    assert all(v < 600 for v in budgets.values()), "a >10 min sf0.01 budget is a bug"


def test_breach_logic():
    from tools.engine_census import check_budgets

    budgets = {"a": 3.0, "b": 10.0}
    times = {"a": 2.9, "b": 11.0, "c": 1.0, "d": "ERR boom"}
    breaches = check_budgets(times, budgets)
    assert len(breaches) == 3
    assert any(b.startswith("b:") for b in breaches)
    assert any("NO BUDGET" in b for b in breaches)
    assert any(b.startswith("d:") for b in breaches)


@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_CENSUS") != "1",
    reason="full census is opt-in: SPARK_GRAFT_CENSUS=1 (minutes of Spark work)",
)
def test_census_within_budgets():
    from tools.engine_census import check_budgets, run_census

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    times = run_census(sf_dir, int(os.environ.get("SPARK_GRAFT_CPUS", "16")))
    breaches = check_budgets(times, _budgets())
    assert not breaches, "census budget breaches:\n" + "\n".join(breaches)
