"""Property-based tests for the round-5 surfaces: randomized inputs
exercise the boundaries the fixed fixtures can't enumerate — baskets
straddling the cap, simhash signatures at the Hamming boundary, KL on
skewed splits."""

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_pipeline_from_mongo_json_to_postgre_spark.operators.association import (
    capped_basket_sql,
    copurchase_pairs,
)

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    rows=st.lists(
        st.tuples(st.integers(1, 4), st.integers(0, 30)),
        min_size=1, max_size=120,
    ),
    cap=st.integers(1, 12),
)
@settings(**_SETTINGS)
def test_capped_pairs_match_duckdb_snippet(spark, rows, cap):
    """For ANY basket multiset and ANY cap, the engine's capped pair
    counts must equal the capped_basket_sql-derived DuckDB counts —
    including baskets exactly at, above, and below the cap."""
    df = spark.createDataFrame(rows, "l_orderkey int, l_partkey int")
    got = sorted(
        (r.part_a, r.part_b, r.n_orders)
        for r in copurchase_pairs(df, min_count=1, cap=cap).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE lineitem(l_orderkey int, l_partkey int)")
    con.executemany("INSERT INTO lineitem VALUES (?, ?)", rows)
    want = sorted(
        tuple(r) for r in con.execute(f"""
            WITH parts AS (
                {capped_basket_sql('lineitem', 'l_orderkey', 'l_partkey', cap)}
            )
            SELECT a.l_partkey, b.l_partkey, CAST(count(*) AS BIGINT)
            FROM parts a JOIN parts b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2
        """).fetchall()
    )
    con.close()
    assert got == want


@given(
    texts=st.lists(
        st.lists(
            st.sampled_from([f"w{i}" for i in range(12)]),
            min_size=1, max_size=20,
        ).map(" ".join),
        min_size=2, max_size=25,
    )
)
@settings(**_SETTINGS)
def test_simhash60_band_completeness(spark, tmp_path_factory, texts):
    """Pigeonhole completeness survives randomized corpora: the banded
    candidate generation finds EVERY pair within Hamming <= 2 of the
    60-bit signature set (brute-force recomputed)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from etl_pipeline_from_mongo_json_to_postgre_spark.operators import dedup

    tmp = tmp_path_factory.mktemp("sim60")
    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array(["s"] * len(texts), pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(tbl, str(tmp / "documents.parquet"))
    sims = {r.doc_id: r.simhash
            for r in dedup.simhash60_signatures(spark, str(tmp)).collect()}
    ids = sorted(sims)
    expect = {
        (a, b, bin(sims[a] ^ sims[b]).count("1"))
        for i, a in enumerate(ids) for b in ids[i + 1:]
        if bin(sims[a] ^ sims[b]).count("1") <= dedup.SIMHASH_HAMMING_MAX
    }
    got = {(r.doc_a, r.doc_b, r.hamming)
           for r in dedup.dedup_simhash_pairs(spark, str(tmp)).collect()}
    assert got == expect
