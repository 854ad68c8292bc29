"""bench.py protocol guards: every headline query must exist in the
registry (a rename that silently drops a bench query would undercount
the suite vs BASELINE.md's fixed 27-query reference point)."""


def test_headline_queries_all_registered():
    import bench
    import __spark_entry__ as e

    registry = e.queries()
    missing = [n for n in bench.HEADLINE if n not in registry]
    assert missing == []
    # 27 = BASELINE.md's fixed comparison set; +5 census-tail entries
    # added r7 (VERDICT r6 task 6: graph/cluster iteratives + trained
    # IVFADC gate, so BENCH_r*.json sees their round-over-round drift)
    assert len(bench.HEADLINE) == 32


def test_headline_queries_oracle_checked():
    import bench
    import __spark_entry__ as e

    oracles = e.oracle_sql()
    # every bench query is also correctness-gated (bench numbers mean
    # nothing if the query could silently return wrong results)
    assert [n for n in bench.HEADLINE if n not in oracles] == []
