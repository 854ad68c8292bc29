"""bench.py protocol guards: every headline query must exist in the
registry (a rename that silently drops a bench query would undercount
the suite vs BASELINE.md's fixed 27-query reference point)."""


def test_headline_queries_all_registered():
    import bench
    import __spark_entry__ as e

    registry = e.queries()
    missing = [n for n in bench.HEADLINE if n not in registry]
    assert missing == []
    assert len(bench.HEADLINE) == 27  # the BASELINE.md comparison set


def test_headline_queries_oracle_checked():
    import bench
    import __spark_entry__ as e

    oracles = e.oracle_sql()
    # every bench query is also correctness-gated (bench numbers mean
    # nothing if the query could silently return wrong results)
    assert [n for n in bench.HEADLINE if n not in oracles] == []
