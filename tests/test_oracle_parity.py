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
    df = QUERIES[name](spark, sf_dir)
    if name not in ORACLES:
        assert df.count() >= 0  # rows-only check (non-SQL-expressible op)
        return
    # Driver-canon constraint: the driver's pandas canonicalizer sorts
    # cell values, so oracle-checked outputs must be scalar-only —
    # array/map/struct cells crash it (unhashable type). See README.
    from pyspark.sql.types import ArrayType, MapType, StructType

    complex_cols = [
        f.name for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not complex_cols, (
        f"{name}: complex-typed output columns {complex_cols} would crash "
        "the driver canonicalizer — emit scalars (array_join/explode)"
    )
    ok, msg = compare(df, duck, ORACLES[name])
    assert ok, f"{name}: {msg}"


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0
