"""Driver-window integrity: the evidence strategy in __spark_entry__
depends on _PRIORITY naming real registry entries — a typo silently
burns one of the driver's 50 correctness slots on a missing entry."""


def test_priority_names_all_resolve():
    import __spark_entry__ as e

    q = e.queries()
    missing = [n for n in e._PRIORITY if n not in q]
    assert not missing, f"_PRIORITY names not in the registry: {missing}"


def test_priority_window_is_hash_checkable():
    """The first 50 (the driver's per-round window) must all carry SQL
    oracles — a rows-only entry in the window wastes a hash-check slot."""
    import __spark_entry__ as e

    o = e.oracle_sql()
    window = e._PRIORITY[:50]
    rows_only = [n for n in window if n not in o]
    assert not rows_only, f"rows-only entries inside the window: {rows_only}"


def test_no_duplicate_priority_entries():
    import __spark_entry__ as e

    seen = set()
    dups = [n for n in e._PRIORITY if n in seen or seen.add(n)]
    assert not dups, f"duplicate _PRIORITY names: {dups}"


def test_registry_and_oracles_align():
    """Every oracle key must have a query; the rows-only remainder must
    stay exactly the three documented entries (COVERAGE.md)."""
    import __spark_entry__ as e

    q, o = e.queries(), e.oracle_sql()
    orphans = [n for n in o if n not in q]
    assert not orphans, f"oracles without queries: {orphans}"
    rows_only = sorted(n for n in q if n not in o)
    assert rows_only == [
        "approx_distinct_rollup_sketch",
        "approx_distinct_users_sketch",
        "dedup_minhash_pairs_fast",
    ], rows_only
