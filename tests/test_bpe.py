"""BPE trainer (operators/bpe.py, VERDICT r7 task 4): oracle parity is
covered by the registry-wide sweep (test_oracle_parity); here the
training-loop invariants and the fold/replace merge semantics."""

import pytest
from pyspark.sql import functions as F

from etl_pipeline_from_mongo_json_to_postgre_spark.operators import bpe


def test_token_count_strictly_decreases_per_merge(spark, sf_dir):
    """Each selected pair has pair_count > 0, so at least one disjoint
    merge applies — the corpus token count must STRICTLY decrease at
    every round (VERDICT r7 task 4's property gate)."""
    merges, history, _ = bpe.bpe_train(bpe._word_types(spark, sf_dir),
                                       compute_history=True)
    assert len(merges) == bpe.N_MERGES
    assert len(history) == len(merges) + 1
    for before, after in zip(history, history[1:]):
        assert after < before, f"merge did not reduce tokens: {history}"


def test_merge_counts_are_positive_and_ranks_sequential(spark, sf_dir):
    rows = bpe.text_bpe_train(spark, sf_dir).collect()
    assert [r["merge_rank"] for r in rows] == list(
        range(1, bpe.N_MERGES + 1))
    assert all(r["pair_count"] > 0 for r in rows)


def test_fold_merge_matches_greedy_reference(spark):
    """The array fold must implement greedy left-to-right
    non-overlapping merging — pinned against a plain-Python reference
    on the classic edge cases (overlap runs, merged-symbol-equals-left,
    no-op words)."""
    def ref_merge(syms, a, b):
        out = []
        for x in syms:
            if out and out[-1] == a and x == b:
                out[-1] = a + b
            else:
                out.append(x)
        return out

    cases = [
        (["a", "a", "a"], "a", "a"),          # overlap run -> [aa, a]
        (["a", "a", "a", "a"], "a", "a"),     # -> [aa, aa]
        (["a", "b", "a", "b"], "a", "b"),     # -> [ab, ab]
        (["c", "a", "b", "a", "b", "c"], "a", "b"),
        (["ab", "b", "b"], "ab", "b"),        # merged != left re-merge
        (["x", "y"], "q", "z"),               # no-op
        ([], "a", "b"),                       # empty (ANSI-safe fold)
    ]
    df = spark.createDataFrame(
        [(i, syms) for i, (syms, _, _) in enumerate(cases)],
        schema="i int, syms array<string>",
    )
    for i, (syms, a, b) in enumerate(cases):
        got = (
            df.where(F.col("i") == i)
            .select(F.aggregate(
                "syms", F.array().cast("array<string>"),
                bpe._merge_fold(a, b)).alias("m"))
            .collect()[0]["m"]
        )
        assert got == ref_merge(syms, a, b), (i, syms, a, b, got)


def test_oracle_replace_matches_fold_on_edge_cases():
    """The DuckDB wrapped-symbol replace must agree with the greedy fold
    on the same edge cases (the single-space-join delimiter-consumption
    bug would fail the a-b-a-b case)."""
    import duckdb

    def ref_merge(syms, a, b):
        out = []
        for x in syms:
            if out and out[-1] == a and x == b:
                out[-1] = a + b
            else:
                out.append(x)
        return out

    w, e = bpe._W, bpe._E
    con = duckdb.connect()
    cases = [
        (["a", "a", "a"], "a", "a"),
        (["a", "b", "a", "b", "a", "b"], "a", "b"),
        (["c", "a", "b", "a", "b", "c"], "a", "b"),
        (["ab", "ab", "c"], "ab", "c"),
    ]
    for syms, a, b in cases:
        s = "".join(f"{w}{x}{e}" for x in syms)
        got = con.execute(
            "SELECT regexp_extract_all(replace(?, ?, ?), "
            f"'{w}([^{e}]+){e}', 1)",
            [s, f"{w}{a}{e}{w}{b}{e}", f"{w}{a}{b}{e}"],
        ).fetchone()[0]
        assert got == ref_merge(syms, a, b), (syms, a, b, got)


def test_fold_and_oracle_replace_agree_on_random_sequences(spark):
    """Property fuzz (hypothesis): for random symbol sequences and random
    merge pairs, the Spark array fold, the DuckDB wrapped-symbol replace,
    and the plain-Python greedy reference all agree — the equivalence the
    text_bpe_* oracles rest on."""
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    def ref_merge(syms, a, b):
        out = []
        for x in syms:
            if out and out[-1] == a and x == b:
                out[-1] = a + b
            else:
                out.append(x)
        return out

    w, e = bpe._W, bpe._E
    con = duckdb.connect()
    sym = st.text(alphabet="ab", min_size=1, max_size=2)
    collected: list[tuple[list[str], str, str]] = []

    @settings(max_examples=60, deadline=None)
    @given(st.lists(sym, min_size=0, max_size=8), sym, sym)
    def check_duck_and_collect(syms, a, b):
        s = "".join(f"{w}{x}{e}" for x in syms)
        got = con.execute(
            "SELECT regexp_extract_all(replace(?, ?, ?), "
            f"'{w}([^{e}]+){e}', 1)",
            [s, f"{w}{a}{e}{w}{b}{e}", f"{w}{a}{b}{e}"],
        ).fetchone()[0]
        assert got == ref_merge(syms, a, b), (syms, a, b, got)
        collected.append((syms, a, b))

    check_duck_and_collect()

    # Spark side: one job over every hypothesis-generated case (a
    # per-example Spark action would be minutes; the fold is
    # deterministic so batching loses nothing).
    cases = collected[:60]
    df = spark.createDataFrame(
        [(i, syms) for i, (syms, _, _) in enumerate(cases)],
        schema="i int, syms array<string>",
    )
    exprs = [
        F.when(F.col("i") == i,
               F.aggregate("syms", F.array().cast("array<string>"),
                           bpe._merge_fold(a, b)))
        for i, (_, a, b) in enumerate(cases)
    ]
    merged = F.coalesce(*exprs) if len(exprs) > 1 else exprs[0]
    rows = df.select("i", merged.alias("m")).collect()
    by_i = {r["i"]: r["m"] for r in rows}
    for i, (syms, a, b) in enumerate(cases):
        assert by_i[i] == ref_merge(syms, a, b), (i, syms, a, b, by_i[i])


def test_oracle_survives_merge_exhaustion(spark):
    """When the corpus runs out of pairs before N_MERGES, the engine's
    loop breaks and censuses the LAST state; the oracle's per-round
    LEFT JOIN must keep the type table alive through the empty rounds
    (a CROSS JOIN annihilated it — r8 review finding). Degenerate
    corpus: one word type 'ab' -> exactly one merge possible."""
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT 'ab ab ab' AS text")
    train = con.execute(bpe._bpe_train_sql()).fetchall()
    assert train == [(1, "a", "b", 3)]
    encode = con.execute(bpe._bpe_encode_sql()).fetchall()
    assert encode == [("ab", 3)]

    # engine side on the same degenerate corpus
    types = spark.createDataFrame([(["a", "b"], 3)],
                                  schema="syms array<string>, cnt bigint")
    merges, _, final = bpe.bpe_train(types)
    assert [(r, a, b, c) for r, a, b, c in merges] == [(1, "a", "b", 3)]
    rows = (final.select("cnt", F.explode("syms").alias("token"))
            .groupBy("token").agg(F.sum("cnt").alias("n")).collect())
    assert [(r["token"], r["n"]) for r in rows] == [("ab", 3)]
