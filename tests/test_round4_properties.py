"""Property-based tests for the round-4 operators (SURVEY §5.2
strategy 3): the two-phase skyline equals the brute-force dominance
spec on arbitrary inputs, the winnowing detection-floor guarantee holds
for any planted shared run, and the bounded-tap EWMA stays inside its
window's value envelope.

Each hypothesis example carries a LIST of rows through ONE Spark job;
deadline disabled (Spark latency is unrelated to input size).
"""

from __future__ import annotations

import datetime

import pandas as pd
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from etl_pipeline_from_mongo_json_to_postgre_spark.operators import curation_ext

_SETTINGS = dict(max_examples=8, deadline=None)


# ---------------------------------------------------------------------------
# skyline == brute-force dominance
# ---------------------------------------------------------------------------

_points = st.lists(
    st.tuples(
        st.floats(min_value=1.0, max_value=99999.0, allow_nan=False,
                  allow_infinity=False),
        st.integers(min_value=0, max_value=2000),  # days since 1995-01-01
    ),
    min_size=1,
    max_size=60,
)


@settings(**_SETTINGS)
@given(_points)
def test_two_phase_skyline_equals_bruteforce(spark, tmp_path_factory, pts):
    base = datetime.datetime(1995, 1, 1)
    pdf = pd.DataFrame(
        {
            "o_orderkey": range(len(pts)),
            "o_custkey": [0] * len(pts),
            "o_orderstatus": ["F"] * len(pts),
            "o_totalprice": [p for p, _ in pts],
            "o_orderdate": [base + datetime.timedelta(days=d) for _, d in pts],
            "o_orderpriority": ["1-URGENT"] * len(pts),
        }
    )
    d = tmp_path_factory.mktemp("sky")
    pdf.to_parquet(str(d / "orders.parquet"))
    got = {
        (r.o_totalprice, r.order_day)
        for r in curation_ext.orders_pareto_frontier(spark, str(d)).collect()
    }
    pts_d = [(p, (base + datetime.timedelta(days=dd)).date()) for p, dd in pts]
    expect = {
        (p, dd)
        for p, dd in pts_d
        if not any(
            (p2 >= p and d2 >= dd and (p2 > p or d2 > dd))
            for p2, d2 in pts_d
        )
    }
    assert got == expect


# ---------------------------------------------------------------------------
# winnowing detection floor
# ---------------------------------------------------------------------------

_word = st.text(alphabet="abcdefgh", min_size=1, max_size=5)
_run_len = curation_ext.WINNOW_W + curation_ext.WINNOW_K - 1


@settings(**_SETTINGS)
@given(
    st.lists(_word, min_size=_run_len, max_size=_run_len),
    st.lists(_word, min_size=0, max_size=6),
    st.lists(_word, min_size=0, max_size=6),
)
def test_winnowing_detects_any_shared_run(spark, tmp_path_factory,
                                          shared, pre, post):
    """ANY run of WINNOW_W + WINNOW_K - 1 words shared between two
    documents must produce at least one common fingerprint hash — the
    winnowing guarantee, independent of surrounding content."""
    doc1 = " ".join(pre + shared)
    doc2 = " ".join(shared + post)
    d = tmp_path_factory.mktemp("win")
    pd.DataFrame({"doc_id": [1, 2], "text": [doc1, doc2]}).to_parquet(
        str(d / "documents.parquet")
    )
    out = curation_ext.text_winnowing_fingerprint(spark, str(d))
    # recompute full fingerprint sets for the overlap check
    w = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    from etl_pipeline_from_mongo_json_to_postgre_spark.functions.text import (
        shingle_hashes,
        word_hashes,
    )

    kh = shingle_hashes(word_hashes(w), k=curation_ext.WINNOW_K)
    n_win = F.greatest(F.size(kh) - (curation_ext.WINNOW_W - 1), F.lit(1))
    fp = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), n_win),
            lambda i: F.array_min(F.slice(kh, i, curation_ext.WINNOW_W)),
        )
    )
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": [doc1, doc2]})
    )
    sets = {r.doc_id: set(r.fp) for r in docs.select("doc_id", fp.alias("fp")).collect()}
    assert sets[1] & sets[2], (doc1, doc2)
    # registered summary consistent with the recompute
    rows = {r.doc_id: r for r in out.collect()}
    for did in (1, 2):
        assert rows[did].n_fp == len(sets[did])


# ---------------------------------------------------------------------------
# EWMA value envelope
# ---------------------------------------------------------------------------

@settings(**_SETTINGS)
@given(
    st.lists(
        st.floats(min_value=-1000, max_value=1000, allow_nan=False,
                  allow_infinity=False),
        min_size=1,
        max_size=30,
    )
)
def test_ewma_stays_inside_window_envelope(spark, tmp_path_factory, vals):
    base = datetime.datetime(2024, 1, 1)
    pdf = pd.DataFrame(
        {
            "event_id": range(len(vals)),
            "ts": [base + datetime.timedelta(minutes=i) for i in range(len(vals))],
            "user_id": [7] * len(vals),
            "event_type": ["view"] * len(vals),
            "value": vals,
            "props": [None] * len(vals),
        }
    )
    d = tmp_path_factory.mktemp("ewma")
    pdf.to_parquet(str(d / "events.parquet"))
    rows = sorted(
        curation_ext.ts_ewma(spark, str(d)).collect(), key=lambda r: r.event_id
    )
    for i, r in enumerate(rows):
        window = vals[max(0, i - curation_ext.EWMA_TAPS + 1): i + 1]
        assert min(window) - 1e-6 <= r.ewma <= max(window) + 1e-6
        if i == 0:
            assert r.ewma == round(vals[0], 6) or abs(r.ewma - vals[0]) < 1e-6
