"""bench.py protocol guards: every benched query must exist in the
registry (a rename that silently drops a bench query would undercount
the suite vs BASELINE.md's fixed 27-query reference point)."""


def test_bench_queries_all_registered():
    import bench
    import __spark_entry__ as e

    registry = e.queries()
    missing = [n for n in bench.HEADLINE + bench.CENSUS_TAIL
               if n not in registry]
    assert missing == []
    # 27 = BASELINE.md's fixed comparison set (the `value` metric);
    # the census tail (graph/cluster iteratives + trained IVFADC gate,
    # VERDICT r6 task 6) is benched under its own census_tail_wall
    # metric since r8 (VERDICT r7 task 2) so totals stay comparable
    assert len(bench.HEADLINE) == 27
    assert len(bench.CENSUS_TAIL) == 5


def test_bench_queries_oracle_checked():
    import bench
    import __spark_entry__ as e

    oracles = e.oracle_sql()
    # every bench query is also correctness-gated (bench numbers mean
    # nothing if the query could silently return wrong results)
    assert [n for n in bench.HEADLINE + bench.CENSUS_TAIL
            if n not in oracles] == []
