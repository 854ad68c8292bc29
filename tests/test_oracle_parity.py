"""DuckDB-oracle parity for every registered query (SURVEY §5.2 strategy 1).

Local mirror of the driver's CORRECTNESS gate, run at sf0.001 for speed
(the driver runs sf0.01).
"""

import pytest

from tests.oracle_compare import compare


def _registry():
    import __spark_entry__ as entrymod

    q = entrymod.queries()
    o = entrymod.oracle_sql()
    return q, o


QUERIES, ORACLES = _registry()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    if name not in ORACLES:
        df = QUERIES[name](spark, sf_dir)
        assert df.count() >= 0  # rows-only check (non-SQL-expressible op)
        return
    ok, msg = compare(QUERIES[name](spark, sf_dir), duck, ORACLES[name])
    assert ok, f"{name}: {msg}"


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0
