"""Driver-window integrity: the driver hash-checks the first 50 registry
entries per round, so the ordering computed in __spark_entry__ from the
committed CORRECTNESS_r*.json evidence decides which entries earn driver
evidence this round. These tests pin the ordering invariants (VERDICT r4
tasks 1+7: ordering derived from data, never-checked first, stalest next,
rows-only never inside the window)."""

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _evidence():
    import __spark_entry__ as e

    return e._evidence_latest_green()


def test_no_duplicate_entry_names_across_modules():
    """Registry assembly is dict.update over _MODULES: a module
    registering a name another module already owns SILENTLY shadows it
    (caught live in r7: a new Gopher-repetition operator reused
    corpus.text_repetition_stats' name and displaced an r3-green
    entry). Every (module, name) must be globally unique."""
    import __spark_entry__ as e

    owners: dict[str, list[str]] = {}
    for mod in e._MODULES:
        for name in mod.QUERIES:
            owners.setdefault(name, []).append(mod.__name__)
        # oracles must belong to the SAME module's queries — a module
        # publishing SQL under another module's entry name would
        # silently displace the real oracle (same dict.update shadowing,
        # on the oracle half of the registry)
        foreign = [n for n in mod.ORACLE_SQL if n not in mod.QUERIES]
        assert not foreign, f"{mod.__name__} defines foreign oracles: {foreign}"
    dupes = {n: ms for n, ms in owners.items() if len(ms) > 1}
    assert not dupes, f"entry names registered by multiple modules: {dupes}"


def test_ordering_covers_registry_exactly():
    import __spark_entry__ as e

    q, o, order = e._registries()
    assert sorted(order) == sorted(q), "priority order must be a permutation of the registry"
    assert set(o) <= set(q), "every oracle key must have a query"


def test_window_is_hash_checkable():
    """A rows-only entry inside the 50-slot window wastes a hash-check slot."""
    import __spark_entry__ as e

    o = e.oracle_sql()
    rows_only = [n for n in e.priority_window(50) if n not in o]
    assert not rows_only, f"rows-only entries inside the window: {rows_only}"


def test_never_checked_lead_the_window():
    """Every hash-oracle entry without green driver evidence must sort ahead
    of every evidenced entry — the rotation exists to finish ever-checked
    coverage."""
    import __spark_entry__ as e

    q, o, order = e._registries()
    ev = _evidence()
    hash_backed = [n for n in order if n in o]
    seen_evidenced = False
    for n in hash_backed:
        if n in ev:
            seen_evidenced = True
        else:
            assert not seen_evidenced, f"never-checked {n} sorts after an evidenced entry"


def test_evidenced_entries_sort_stalest_first():
    """Strong-drift entries (own code/oracle changed) outrank everything
    evidenced; weak-drift and clean entries form ONE merged block sorted
    stalest-green-first (weak ahead of clean at the same round) — module-
    only drift must not crowd older clean evidence out of the window
    (VERDICT r7 task 1)."""
    import __spark_entry__ as e

    q_raw, o = e._raw_registries()
    _, _, order = e._registries()
    ev = _evidence()
    strong, weak = e._drifted(q_raw, o)
    strong_rounds, merged_keys = [], []
    seq = []
    for n in order:
        if n in o and n in ev:
            if n in strong:
                strong_rounds.append(ev[n])
                seq.append(0)
            else:
                merged_keys.append((ev[n], 0 if n in weak else 1, n))
                seq.append(1)
    assert strong_rounds == sorted(strong_rounds), "strong block stalest-first"
    assert merged_keys == sorted(merged_keys), (
        "weak+clean must be one stalest-first block, weak first at ties")
    assert seq == sorted(seq), "strong-drift entries must lead"


def test_rows_only_sort_last():
    """Since the r7 derived-oracle conversions the registry has ZERO
    rows-only entries (every entry carries a DuckDB oracle) — if one
    ever reappears it must sort after every hash-backed entry."""
    import __spark_entry__ as e

    q, o, order = e._registries()
    tail = order[len([n for n in order if n in o]):]
    assert all(n not in o for n in tail)
    rows_only_idx = [order.index(n) for n in q if n not in o]
    if rows_only_idx:
        assert all(n not in o for n in order[min(rows_only_idx):]), (
            "a hash-oracle entry sorts after a rows-only entry")


def test_round5_window_composition():
    """Regression pin for the round-5 rotation (VERDICT r4 task 1): with
    evidence through r4 committed, every never-driver-checked entry that
    existed at the r4 close must occupy the window; in-round-5 additions
    fill the remaining slots in name order and any overflow defers to
    round 6 (they are already gated by the local two-SF parity sweep).
    If the driver has already committed CORRECTNESS_r05.json the
    composition legitimately moves on — skip then."""
    import glob

    import __spark_entry__ as e

    latest = max(
        int(os.path.basename(p).split("_r")[1].split(".")[0])
        for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
    )
    if latest != 4:
        import pytest

        pytest.skip(f"evidence has moved on (latest round {latest})")
    ev = _evidence()
    q, o, order = e._registries()
    window = e.priority_window(50)
    births = e._births()
    all_never = [n for n in q if n in o and n not in ev]
    pre_r5 = sorted(n for n in all_never if births.get(n, 99) <= 4)
    born_r5 = sorted(n for n in all_never if births.get(n, 99) >= 5)
    assert len(pre_r5) <= 50, "the r4-close rotation plan must fit the window"
    expected = pre_r5 + born_r5[: 50 - len(pre_r5)]
    assert set(window) == set(expected)
    assert {"supplier_region_mix", "kmeans_train", "emb_pca_project",
            "graph_pagerank_parts", "approx_heavy_users",
            "tpch_q6_forecast_revenue", "w4_windowed_distinct_count"} <= set(window)


def test_every_entry_has_a_birth_record():
    """tools/registry_births.json is what lets in-round additions defer
    to the planned rotation — a new operator must record its birth."""
    import __spark_entry__ as e

    births = e._births()
    q = e.queries()
    missing = [n for n in q if n not in births]
    assert not missing, f"registry entries without a birth record: {missing}"
    stale = [n for n in births if n not in q]
    assert not stale, f"birth records for vanished entries: {stale}"
    assert all(isinstance(v, int) and 1 <= v <= 50 for v in births.values())


def test_never_checked_sort_by_birth_then_name():
    import __spark_entry__ as e

    q, o, order = e._registries()
    ev = _evidence()
    births = e._births()
    never = [n for n in order if n in o and n not in ev]
    keys = [(births.get(n, 99), n) for n in never]
    assert keys == sorted(keys), "never-checked block must sort (birth, name)"


def test_evidence_parser_matches_driver_files(tmp_path, monkeypatch):
    """The parser must count only fully-green rows — pinned against a
    FROZEN copy of CORRECTNESS_r01–r04 staged into a tmp dir. The r10
    judge caught the previous form of this test asserting
    `inc_scd2_intervals == 4` against the LIVE evidence files: the
    rotation re-greened the entry in r10 and the pin expired (exactly
    the self-expiring-assertion class the r7 post-mortem warns about).
    r01–r04 are immutable history (the driver only ever ADDS new-round
    files), so this pin can never expire again regardless of how many
    CORRECTNESS_rN.json files future rounds land."""
    import importlib
    import shutil

    import __spark_entry__ as e

    stage = tmp_path / "frozen_r01_r04"
    stage.mkdir()
    for rnd in (1, 2, 3, 4):
        shutil.copy(
            os.path.join(REPO, f"CORRECTNESS_r{rnd:02d}.json"),
            stage / f"CORRECTNESS_r{rnd:02d}.json",
        )
    monkeypatch.setattr(e, "_REPO", str(stage))
    try:
        ev = e._evidence_latest_green()
        # inc_scd2_intervals was red in r3 and green in r4 — within the
        # frozen window its latest green is exactly 4.
        assert ev.get("inc_scd2_intervals") == 4
        r1 = json.load(open(os.path.join(REPO, "CORRECTNESS_r01.json")))
        for name, res in r1.items():
            if res.get("rows_match") and res.get("schema_match") and res.get("hash_match", True):
                assert ev.get(name, 0) >= 1
    finally:
        monkeypatch.undo()
        importlib.reload(e)


def test_red_driver_rows_reenter_the_window(tmp_path, monkeypatch):
    """A hash-mismatched driver row is NOT evidence: the entry must sort
    back into the window next round, at its HEAD, while a green row
    rotates its entry out. The fixture synthesizes ALL evidence rounds
    (never copies the repo's driver files), so the test holds for any
    set of CORRECTNESS files on disk — both the never-green and the
    red-AFTER-green regression case are covered."""
    import importlib
    import json

    import __spark_entry__ as e

    green = {"rows_match": True, "schema_match": True, "hash_match": True}
    red = {"rows_match": True, "schema_match": True, "hash_match": False}
    stage = tmp_path / "repo_view"
    stage.mkdir()
    # r1: every hash-oracle entry green — so nothing is never-checked and
    # the red entries must beat EVIDENCED entries purely on regression.
    q, o, order = e._registries()
    json.dump({n: green for n in o}, open(stage / "CORRECTNESS_r01.json", "w"))
    # r2: one entry regresses AFTER its green; one was also red in r1
    # (never-green case folds in via a separate file pair).
    json.dump(
        {"basket_association_rules": red,  # red-after-green
         "search_hybrid_rerank": green},   # fresh green -> rotates out
        open(stage / "CORRECTNESS_r02.json", "w"),
    )
    monkeypatch.setattr(e, "_REPO", str(stage))
    try:
        ev = e._evidence_latest_green()
        assert ev.get("search_hybrid_rerank") == 2
        assert "basket_association_rules" not in ev, (
            "a red-after-green entry must lose its stale green evidence")
        assert "basket_association_rules" in e._regressed()
        w = e.priority_window(50)
        assert w[0] == "basket_association_rules", (
            "the regressed entry must lead the window")
        assert "search_hybrid_rerank" not in w
    finally:
        monkeypatch.undo()
        importlib.reload(e)


def test_red_without_prior_green_reenters(tmp_path, monkeypatch):
    """The original (pre-r5) pinned case: an entry whose only driver row
    is red sorts back into the window. Self-contained fixture."""
    import importlib
    import json

    import __spark_entry__ as e

    green = {"rows_match": True, "schema_match": True, "hash_match": True}
    red = {"rows_match": True, "schema_match": True, "hash_match": False}
    stage = tmp_path / "repo_view"
    stage.mkdir()
    q, o, order = e._registries()
    body = {n: green for n in o}
    body["basket_association_rules"] = red
    json.dump(body, open(stage / "CORRECTNESS_r01.json", "w"))
    monkeypatch.setattr(e, "_REPO", str(stage))
    try:
        assert "basket_association_rules" not in e._evidence_latest_green()
        assert e.priority_window(50)[0] == "basket_association_rules"
    finally:
        monkeypatch.undo()
        importlib.reload(e)


def test_ntz_output_shim(spark):
    """Registry outputs must carry no TIMESTAMP_LTZ column: collect() of
    LTZ goes through the PYTHON PROCESS timezone, so a non-UTC driver
    host would shift values vs the UTC-naive DuckDB oracle. The shim
    casts at the boundary (session is pinned UTC, so values are
    preserved); full-sweep evidence: FAILS=[] under TZ=America/New_York
    (2026-08-14)."""
    import datetime

    from pyspark.sql import functions as F

    import __spark_entry__ as e

    def fake_query(spark_, sf_dir):
        return spark_.createDataFrame(
            [(1, datetime.datetime(2024, 3, 1, 12, 0))], "id long, ts timestamp"
        ).select("id", "ts", F.date_trunc("hour", "ts").alias("h"))

    wrapped = e._ntz_outputs(fake_query)
    df = wrapped(spark, "unused")
    assert [f.dataType.typeName() for f in df.schema.fields] == [
        "long", "timestamp_ntz", "timestamp_ntz"]
    row = df.collect()[0]
    assert row.ts == datetime.datetime(2024, 3, 1, 12, 0)


def test_drifted_code_reenters_the_window(tmp_path, monkeypatch):
    """An entry whose own source/oracle no longer matches the fingerprint
    stamped at green time must re-enter the window ahead of every
    clean-evidence entry (its green no longer vouches for the code);
    module-file-only drift (a helper changed) merges into the clean
    block by evidence age — it re-enters ahead of SAME-round clean
    entries but behind older clean evidence (VERDICT r7 task 1).
    Self-contained fixture: synthesized evidence + stamps."""
    import importlib
    import json

    import __spark_entry__ as e

    green = {"rows_match": True, "schema_match": True, "hash_match": True}
    stage = tmp_path / "repo_view"
    stage.mkdir()
    q_raw, o = e._raw_registries()
    # r1: a1 green; r2: everything else green -> a1 is the STALEST clean
    # entry and would lead absent drift.
    json.dump({"a1_pivot_status_count": green},
              open(stage / "CORRECTNESS_r01.json", "w"))
    json.dump({n: green for n in o if n != "a1_pivot_status_count"},
              open(stage / "CORRECTNESS_r02.json", "w"))
    cur = e._current_fingerprints(q_raw, o)
    stamps = {n: {**cur[n], "round": 2} for n in o}
    stamps["a1_pivot_status_count"]["round"] = 1
    stamps["j1_outer_join"] = {"fn": "stale-fp", "mod": "stale-mod", "round": 2}
    stamps["u1_explode_words"] = {**cur["u1_explode_words"],
                                  "mod": "stale-mod", "round": 2}
    monkeypatch.setattr(e, "_REPO", str(stage))
    monkeypatch.setattr(e, "_stamps", lambda: stamps)
    try:
        strong, weak = e._drifted(q_raw, o)
        assert strong == {"j1_outer_join"}
        assert weak == {"u1_explode_words"}
        w = e.priority_window(50)
        assert w[0] == "j1_outer_join", "own-code drift leads"
        assert w[1] == "a1_pivot_status_count", (
            "older clean evidence outranks same-age module-only drift")
        assert w[2] == "u1_explode_words", (
            "module drift leads its own evidence round's clean entries")
    finally:
        monkeypatch.undo()
        importlib.reload(e)


def test_fresh_green_without_stamp_is_pending_not_drifted(tmp_path, monkeypatch):
    """The r6 failure class (VERDICT r6 task 1): when the driver lands a
    new CORRECTNESS file, entries whose FIRST (or newest) green postdates
    their stamp — or that have no stamp at all — are PENDING-STAMP, not
    drifted. They must not enter the strong/weak drift blocks (which
    would burn the whole next-round window on just-greened entries and
    turn the tripwire test red on driver-file arrival); they rank in the
    clean-stale block at its tail, behind genuinely stale greens.
    Self-contained fixture: synthesized evidence + stamps."""
    import importlib
    import json

    import __spark_entry__ as e

    green = {"rows_match": True, "schema_match": True, "hash_match": True}
    stage = tmp_path / "repo_view"
    stage.mkdir()
    q_raw, o = e._raw_registries()
    # r1: everything green and stamped at r1. r2 (the 'driver just
    # landed' file): j1 re-greened, u1 greened for the first time ever
    # (no stamp), a2 explicitly marked drifted at r1 then re-greened.
    json.dump({n: green for n in o if n != "u1_explode_words"},
              open(stage / "CORRECTNESS_r01.json", "w"))
    json.dump({"j1_outer_join": green, "u1_explode_words": green,
               "a2_group_count": green},
              open(stage / "CORRECTNESS_r02.json", "w"))
    cur = e._current_fingerprints(q_raw, o)
    stamps = {n: {**cur[n], "round": 1} for n in o if n != "u1_explode_words"}
    # j1's stamp is STALE garbage — but its green (r2) postdates it, so
    # the new evidence vouches for the current code: pending, not drift.
    stamps["j1_outer_join"] = {"fn": "old", "mod": "old", "round": 1}
    stamps["a2_group_count"] = {"fn": "drifted", "mod": "drifted", "round": 1}
    monkeypatch.setattr(e, "_REPO", str(stage))
    monkeypatch.setattr(e, "_stamps", lambda: stamps)
    try:
        strong, weak = e._drifted(q_raw, o)
        assert strong == set() and weak == set(), (
            "fresh-green (pending-stamp) entries classified as drift")
        order = [n for n in e._registries()[2] if n in o]
        # the three r2-green entries sort AFTER every r1-stale entry
        r1_tail = max(order.index(n) for n in o
                      if n not in ("j1_outer_join", "u1_explode_words",
                                   "a2_group_count"))
        for n in ("j1_outer_join", "u1_explode_words", "a2_group_count"):
            assert order.index(n) > r1_tail, f"{n} must rank after stale greens"
    finally:
        monkeypatch.undo()
        importlib.reload(e)


def test_stamp_file_matches_current_code_for_undrifted_entries():
    """The committed fingerprint stamps must agree with the code on disk
    for every entry not explicitly marked drifted — catches 'edited an
    operator but never re-stamped/marked it' (the drift detector's own
    staleness). Run tools/stamp_fingerprints.py --mark-drifted NAME
    after editing a green-evidenced entry in-round."""
    import __spark_entry__ as e

    q_raw, o = e._raw_registries()
    stamps = e._stamps()
    assert stamps, "tools/entry_fingerprints.json must exist"
    strong, weak = e._drifted(q_raw, o)
    unexplained = {
        n for n in strong
        if stamps.get(n, {}).get("fn") != "drifted"
    }
    assert not unexplained, (
        f"entries drifted without a --mark-drifted record: {unexplained}; "
        "either re-stamp (round start) or mark them drifted")


def test_stamp_tool_refuses_to_bless_code_the_driver_never_saw(tmp_path, monkeypatch):
    """Anti-laundering guard (r7 review finding): a stamp refresh must
    bless CURRENT code only when the entry's module file matches the
    tree the driver actually tested (parent of the evidence commit).
    Real-history fixture: profiling.py changed after the r6 close
    (clamp guard), so re-stamping approx_heavy_users' r6 green from
    scratch must stamp it DRIFTED (re-window), while
    p1_mapped_projection (transform_queries.py untouched since the r6
    close) is blessed with current fingerprints."""
    import json

    import __spark_entry__ as e
    from tools import stamp_fingerprints as tool

    real = e._stamps()
    if ("approx_heavy_users" not in real or "p1_mapped_projection" not in real
            or e._evidence_latest_green().get("approx_heavy_users") != 6):
        import pytest

        pytest.skip("repo history moved past the r6/r7 shape this pins")
    stamps = {k: v for k, v in real.items()
              if k not in ("approx_heavy_users", "p1_mapped_projection")}
    stamp_path = tmp_path / "stamps.json"
    json.dump(stamps, open(stamp_path, "w"))
    monkeypatch.setattr(e, "_stamps", lambda: json.load(open(stamp_path)))
    monkeypatch.setattr(tool, "STAMP_PATH", str(stamp_path))
    monkeypatch.setattr("sys.argv", ["stamp_fingerprints.py"])
    assert tool.main() == 0
    out = json.load(open(stamp_path))
    assert out["approx_heavy_users"]["fn"] == "drifted", (
        "edited-after-test module must not be blessed")
    q_raw, o = e._raw_registries()
    cur = e._current_fingerprints(q_raw, o)
    assert out["p1_mapped_projection"]["fn"] == cur["p1_mapped_projection"]["fn"]


def test_stamp_tool_updates_on_fresh_green_and_preserves_marks(tmp_path, monkeypatch):
    """tools/stamp_fingerprints.py contract: an entry whose latest green
    round is newer than its stamp gets re-stamped with CURRENT
    fingerprints; entries with up-to-date stamps are untouched;
    --mark-drifted survives until fresh evidence arrives. Self-contained
    fixture (synthesized evidence, temp stamp file)."""
    import importlib
    import json

    import __spark_entry__ as e
    from tools import stamp_fingerprints as tool

    green = {"rows_match": True, "schema_match": True, "hash_match": True}
    stage = tmp_path / "repo_view"
    stage.mkdir()
    q_raw, o = e._raw_registries()
    json.dump({n: green for n in o}, open(stage / "CORRECTNESS_r01.json", "w"))
    json.dump({"j1_outer_join": green}, open(stage / "CORRECTNESS_r02.json", "w"))
    cur = e._current_fingerprints(q_raw, o)
    # pre-existing stamps: j1 stale (round 1, bogus fp), a1 current
    stamps = {
        "j1_outer_join": {"fn": "old", "mod": "old", "round": 1},
        "a1_pivot_status_count": {**cur["a1_pivot_status_count"], "round": 1},
    }
    stamp_path = tmp_path / "stamps.json"
    json.dump(stamps, open(stamp_path, "w"))
    monkeypatch.setattr(e, "_REPO", str(stage))
    monkeypatch.setattr(e, "_stamps", lambda: json.load(open(stamp_path)))
    monkeypatch.setattr(tool, "STAMP_PATH", str(stamp_path))
    monkeypatch.setattr("sys.argv", ["stamp_fingerprints.py"])
    try:
        assert tool.main() == 0
        out = json.load(open(stamp_path))
        # j1's green moved to r2 -> re-stamped with current fp
        assert out["j1_outer_join"]["round"] == 2
        assert out["j1_outer_join"]["fn"] == cur["j1_outer_join"]["fn"]
        # a1's evidence (r1) is not newer than its stamp -> untouched
        assert out["a1_pivot_status_count"]["round"] == 1
        # every green entry now has a stamp
        assert set(out) == set(o)
        # --mark-drifted persists across a no-new-evidence rerun
        monkeypatch.setattr(
            "sys.argv", ["stamp_fingerprints.py", "--mark-drifted", "a2_group_count"])
        assert tool.main() == 0
        monkeypatch.setattr("sys.argv", ["stamp_fingerprints.py"])
        assert tool.main() == 0
        out = json.load(open(stamp_path))
        assert out["a2_group_count"]["fn"] == "drifted"
    finally:
        monkeypatch.undo()
        importlib.reload(e)


def test_tested_module_hash_resolves_readds_and_renames(tmp_path):
    """_tested_module_hash commit resolution (r8 review hardening, r9
    review fix): a deleted + re-added evidence file resolves to the
    commit that introduced the CURRENT content (newest A), and a
    RENAMED evidence file traces THROUGH the rename (--follow) to the
    commit that introduced the content — NOT to the rename commit,
    whose parent tree would bless module edits made after the driver
    ran (the r9 plain-A-first bug this test used to pin). The guard
    must never silently self-disable into bless-everything.
    Self-contained temp git repo."""
    import hashlib
    import subprocess

    from tools import stamp_fingerprints as tool

    repo = tmp_path / "g"
    repo.mkdir()

    def git(*a):
        subprocess.run(["git", "-C", str(repo), *a], check=True,
                       capture_output=True,
                       env={"GIT_AUTHOR_NAME": "t", "GIT_AUTHOR_EMAIL": "t@t",
                            "GIT_COMMITTER_NAME": "t", "GIT_COMMITTER_EMAIL": "t@t",
                            "HOME": str(tmp_path), "PATH": "/usr/bin:/bin"})

    git("init", "-q")
    mod = repo / "mod.py"
    ev = repo / "CORRECTNESS_r01.json"
    mod.write_text("v1")
    ev.write_text("{}")
    git("add", "-A"); git("commit", "-qm", "add evidence v1")
    # delete + re-add the evidence with NEW module content in between
    git("rm", "-q", "CORRECTNESS_r01.json"); git("commit", "-qm", "drop")
    mod.write_text("v2")
    ev.write_text("{}")
    git("add", "-A"); git("commit", "-qm", "re-add evidence")
    # a later commit edits the module again (must NOT shift the ref tree)
    mod.write_text("v3")
    git("add", "-A"); git("commit", "-qm", "later module edit")

    old_repo, tool.REPO = tool.REPO, str(repo)
    try:
        # newest ADD's parent tree holds mod.py == v2's parent... the
        # re-add commit's PARENT carries mod.py == "v2"? No: the parent
        # of the re-add commit is the "drop" commit, whose tree still
        # has mod.py == "v1". The guard hashes the parent tree.
        got = tool._tested_module_hash(1, "mod.py", str(repo), _cache={})
        want = hashlib.sha256(b"v1").hexdigest()[:16]
        assert got == want, "newest-A resolution must pick the re-add commit"

        # rename the evidence file: --follow must trace through the
        # rename to the re-add commit (the content's introduction),
        # NOT resolve to the rename commit whose parent tree holds the
        # post-driver v3 edit
        git("mv", "CORRECTNESS_r01.json", "CORRECTNESS_r02.json")
        git("commit", "-qm", "rename to r02")
        mod.write_text("v4")
        git("add", "-A"); git("commit", "-qm", "even later module edit")
        got2 = tool._tested_module_hash(2, "mod.py", str(repo), _cache={})
        assert got2 is not None, (
            "renamed evidence must resolve, never disable the guard")
        assert got2 == want, (
            "renamed evidence must trace to the content-introducing "
            "commit (parent tree v1), not the rename commit (v3)")
    finally:
        tool.REPO = old_repo


def test_tested_module_hash_does_not_follow_copies(tmp_path):
    """--follow's similarity detection chains through COPIES of other
    still-present files (r10 live failure: CORRECTNESS_r09.json scored
    C080 vs CORRECTNESS_r03.json, resolving the tested tree to round 3
    and falsely drift-marking 40 entries). A copy introduces NEW
    content at the copying commit — resolution must stop there, not
    trace into the copied-from file's history."""
    import hashlib
    import subprocess

    from tools import stamp_fingerprints as tool

    repo = tmp_path / "g"
    repo.mkdir()

    def git(*a):
        subprocess.run(["git", "-C", str(repo), *a], check=True,
                       capture_output=True,
                       env={"GIT_AUTHOR_NAME": "t", "GIT_AUTHOR_EMAIL": "t@t",
                            "GIT_COMMITTER_NAME": "t", "GIT_COMMITTER_EMAIL": "t@t",
                            "HOME": str(tmp_path), "PATH": "/usr/bin:/bin"})

    git("init", "-q")
    mod = repo / "mod.py"
    # round-1 evidence: large, so the near-identical round-2 file
    # trips git's copy detection the way real round evidence does
    body = '{"entries": {' + ",".join(
        f'"e{i}": {{"rows": true, "schema": true, "hash": true}}'
        for i in range(200)
    ) + "}"
    mod.write_text("v1")
    (repo / "CORRECTNESS_r01.json").write_text(body + ', "round": 1}')
    git("add", "-A"); git("commit", "-qm", "round 1 evidence")
    mod.write_text("v2")
    git("add", "-A"); git("commit", "-qm", "round-2 module work")
    # round-2 evidence lands as a new file ~99% similar to round 1's,
    # with r01 still present (copy, not rename)
    (repo / "CORRECTNESS_r02.json").write_text(body + ', "round": 2}')
    git("add", "-A"); git("commit", "-qm", "round 2 evidence")

    old_repo, tool.REPO = tool.REPO, str(repo)
    try:
        got = tool._tested_module_hash(2, "mod.py", str(repo), _cache={})
        want = hashlib.sha256(b"v2").hexdigest()[:16]
        assert got == want, (
            "copy-detected evidence must resolve to the copying commit "
            "(tested tree v2), not the copied-from file's add (v1)")
    finally:
        tool.REPO = old_repo
