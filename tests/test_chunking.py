"""RAG chunking operators: window geometry, overlap identity, and the
chunk-level dedup signal (crafted frames; registry parity covers the
real tables)."""

import pytest
from pyspark.sql import functions as F

from etl_pipeline_from_mongo_json_to_postgre_spark.operators import chunking


@pytest.fixture()
def docs(spark, monkeypatch):
    def _install(rows):
        df = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string")
        monkeypatch.setattr(chunking, "load_table", lambda sp, sf, t: df)
        return df
    return _install


def test_window_geometry(spark, docs):
    """A 100-token doc with STRIDE=48/CHUNK=64 yields starts 0/48/96
    with lengths 64/52/4; a 10-token doc yields one short chunk; an
    empty doc yields none."""
    docs([(1, " ".join(f"t{i}" for i in range(100)), "en", "s"),
          (2, " ".join(f"t{i}" for i in range(10)), "en", "s"),
          (3, "", "en", "s")])
    rows = chunking.text_chunk_windows(spark, "unused").collect()
    got = {(r.doc_id, r.chunk_id): (r.start_tok, r.n_tokens) for r in rows}
    assert got == {
        (1, 0): (0, 64), (1, 1): (48, 52), (1, 2): (96, 4),
        (2, 0): (0, 10),
    }


def test_identical_windows_hash_identically_across_docs(spark, docs):
    """The dedup property: the same 64-token span in two different
    documents produces the same chunk_hash regardless of position
    context, and different spans differ."""
    span = " ".join(f"w{i}" for i in range(64))
    other = " ".join(f"x{i}" for i in range(64))
    docs([(1, span, "en", "s"), (2, span, "de", "s2"), (3, other, "en", "s")])
    rows = chunking.text_chunk_windows(spark, "unused").collect()
    h = {r.doc_id: r.chunk_hash for r in rows if r.chunk_id == 0}
    assert h[1] == h[2]
    assert h[1] != h[3]
    census = {r.occurrences: (r.n_chunks, r.n_docs_max)
              for r in chunking.chunk_dup_census(spark, "unused").collect()}
    assert census[2] == (1, 2)   # the shared span: 1 hash seen twice, 2 docs
    assert census[1] == (1, 1)   # the unique span


def test_window_geometry_property(spark, docs):
    """Property over arbitrary doc lengths (one Spark pass, 60 docs of
    every length 1..60): chunk count == ceil(len/STRIDE), starts are
    exactly 0, STRIDE, 2*STRIDE...; every token is covered; consecutive
    full windows overlap by CHUNK-STRIDE tokens."""
    import math

    from etl_pipeline_from_mongo_json_to_postgre_spark.operators.chunking import (
        CHUNK_STRIDE,
        CHUNK_TOKENS,
    )

    rows = [(n, " ".join(f"t{n}_{i}" for i in range(n)), "en", "s")
            for n in range(1, 61)]
    docs(rows)
    got = {}
    for r in chunking.text_chunk_windows(spark, "unused").collect():
        got.setdefault(r.doc_id, []).append(r)
    for n in range(1, 61):
        chunks = sorted(got[n], key=lambda r: r.chunk_id)
        assert len(chunks) == math.ceil(n / CHUNK_STRIDE), n
        for j, c in enumerate(chunks):
            assert c.chunk_id == j
            assert c.start_tok == j * CHUNK_STRIDE
            assert c.n_tokens == min(n - j * CHUNK_STRIDE, CHUNK_TOKENS)
        # coverage: the last chunk reaches the final token
        last = chunks[-1]
        assert last.start_tok + last.n_tokens == n
        # overlap between consecutive windows (when both are full)
        for a, b in zip(chunks, chunks[1:]):
            if a.n_tokens == CHUNK_TOKENS:
                assert (a.start_tok + a.n_tokens) - b.start_tok \
                    == CHUNK_TOKENS - CHUNK_STRIDE


def test_chunk_plan_is_shuffle_free(spark, sf_dir):
    """text_chunk_windows must be a pure map-side pass: no Exchange
    other than the scan fan-out repartition, no join."""
    df = chunking.text_chunk_windows(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    # fan_out adds exactly one round-robin Exchange after the scan
    assert plan.count("Exchange") <= 1


def test_chunking_matches_oracle(spark, sf_dir, duck):
    from tests.oracle_compare import compare

    for name, fn in chunking.QUERIES.items():
        ok, msg = compare(fn(spark, sf_dir), duck, chunking.ORACLE_SQL[name])
        assert ok, f"{name}: {msg}"


def test_inc_chunk_dedup_classifies_novelty(spark, docs):
    """An arriving doc that copies an indexed doc's text contributes
    ZERO novel chunks; a fresh span repeated across TWO arriving docs
    is novel exactly once, attributed to the lowest doc_id (the
    deterministically-first occurrence that actually gets embedded)."""
    span_a = " ".join(f"a{i}" for i in range(64))
    span_b = " ".join(f"b{i}" for i in range(64))
    docs([
        (0, span_a, "en", "s"),            # indexed
        (1, span_a, "en", "s"),            # arriving copy -> 0 novel
        (3, span_b, "en", "s"),            # arriving fresh -> novel here
        (5, span_b, "en", "s"),            # within-batch repeat -> 0 novel
    ])
    got = {r.doc_id: r for r in
           chunking.inc_chunk_dedup(spark, "unused").collect()}
    assert set(got) == {1, 3, 5}
    assert got[1].n_novel == 0 and got[1].novel_share == 0.0
    assert got[3].n_novel == got[3].n_chunks == 1
    assert got[3].novel_share == 1.0
    assert got[5].n_novel == 0 and got[5].novel_share == 0.0


def test_streaming_chunk_census_matches_batch_oracle(spark, sf_dir, duck):
    """The streaming execution path (file source, availableNow,
    complete-mode agg) must produce the identical chunk-length census
    as the batch SQL — documents chunked on arrival, stateless map,
    state bounded by the census width."""
    from etl_pipeline_from_mongo_json_to_postgre_spark.streaming import doc_chunks
    from tests.oracle_compare import compare

    df = doc_chunks.stream_chunk_length_census(spark, sf_dir)
    ok, msg = compare(df, duck,
                      doc_chunks.ORACLE_SQL["stream_chunk_length_census"])
    assert ok, msg
