"""Property-based tests for the round-5 second-wave operators:
randomized inputs compared against straight-line Python references —
the boundaries (adjacent spans, block-crossing lateness, degenerate
docs) that fixed fixtures can't enumerate."""

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_WORDS = [f"w{i}" for i in range(8)]


def _ref_substring_spans(docs, k=5):
    from collections import defaultdict

    owners = defaultdict(set)
    for d, ws in docs.items():
        for i in range(len(ws) - k + 1):
            owners[tuple(ws[i:i + k])].add(d)
    spans = set()
    for d, ws in docs.items():
        dup = [i + 1 for i in range(len(ws) - k + 1)
               if len(owners[tuple(ws[i:i + k])]) >= 2]
        if not dup:
            continue
        start = prev = dup[0]
        for p in dup[1:]:
            if p == prev + 1:
                prev = p
                continue
            spans.add((d, start, prev + k - 1, prev + k - start))
            start = prev = p
        spans.add((d, start, prev + k - 1, prev + k - start))
    return spans


@given(
    word_lists=st.lists(
        st.lists(st.sampled_from(_WORDS), max_size=14),
        min_size=1, max_size=5,
    ),
)
@settings(**_SETTINGS)
def test_substring_spans_match_python_reference(spark, monkeypatch, word_lists):
    from etl_pipeline_from_mongo_json_to_postgre_spark.operators import dedup

    docs = {i: ws for i, ws in enumerate(word_lists)}
    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in docs.items()],
        "doc_id bigint, text string",
    )
    monkeypatch.setattr(dedup, "_docs", lambda s, d: df)
    got = {
        (r.doc_id, r.span_start, r.span_end, r.dup_words)
        for r in dedup.dedup_substring_spans(spark, "unused").collect()
    }
    assert got == _ref_substring_spans(docs, k=dedup.SPAN_GRAM)


def _ref_lateness_buckets(rows, bounds_s=(0, 60, 600, 3600)):
    from collections import defaultdict

    running = -math.inf
    per_bucket = defaultdict(list)
    for _eid, t in sorted(rows):
        running = max(running, t)
        late = running - t
        b = next((i for i, ub in enumerate(bounds_s) if late <= ub),
                 len(bounds_s))
        per_bucket[b].append(late)
    return {b: (len(v), float(max(v))) for b, v in per_bucket.items()}


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 20_000), st.integers(-100_000, 100_000)),
        min_size=1, max_size=60,
        unique_by=lambda r: r[0],
    ),
)
@settings(**_SETTINGS)
def test_lateness_census_matches_python_reference(spark, monkeypatch, rows):
    """Arrival ids up to 20000 span multiple LATENESS_BLOCK(4096)
    partitions, so the block-carry path is exercised at random."""
    import datetime

    from etl_pipeline_from_mongo_json_to_postgre_spark.operators import (
        timeseries,
    )

    base = datetime.datetime(2024, 6, 1)
    df = spark.createDataFrame(
        [(eid, base + datetime.timedelta(seconds=s)) for eid, s in rows],
        "event_id bigint, ts timestamp",
    )
    monkeypatch.setattr(timeseries, "_events", lambda s, d: df)
    got = {
        r.bucket_id: (r.n_events, r.max_lateness_s)
        for r in timeseries.events_lateness_census(spark, "unused").collect()
    }
    assert got == _ref_lateness_buckets(rows)


def _ref_bpe_pairs(word_lists, top=20):
    from collections import Counter

    types = Counter(w for ws in word_lists for w in ws if len(w) >= 2)
    pairs = Counter()
    for w, c in types.items():
        for i in range(len(w) - 1):
            pairs[w[i:i + 2]] += c
    ranked = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
    return ranked[:top]


@given(
    word_lists=st.lists(
        st.lists(st.text(alphabet="abc", max_size=4), max_size=8),
        min_size=1, max_size=4,
    ),
)
@settings(**_SETTINGS)
def test_bpe_pairs_match_python_reference(spark, monkeypatch, word_lists):
    from etl_pipeline_from_mongo_json_to_postgre_spark.operators import corpus

    clean = [[w for w in ws if w] for ws in word_lists]
    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(clean)],
        "doc_id bigint, text string",
    )
    monkeypatch.setattr(corpus, "_docs", lambda s, d: df)
    got = [(r.pair, r.pair_count)
           for r in corpus.text_bpe_merge_step(spark, "unused").collect()]
    assert got == _ref_bpe_pairs(clean)


def _ref_markov_nll(seq_by_user):
    from collections import Counter, defaultdict

    pairs = []
    for uid, seq in seq_by_user.items():
        pairs += [(uid, a, b) for a, b in zip(seq, seq[1:])]
    cells = Counter((a, b) for _u, a, b in pairs)
    totals = defaultdict(int)
    for (a, _b), c in cells.items():
        totals[a] += c
    out = {}
    for uid, seq in seq_by_user.items():
        trans = list(zip(seq, seq[1:]))
        if not trans:
            continue
        nll = sum(-math.log(cells[t] / totals[t[0]]) for t in trans)
        out[uid] = (len(trans), nll / len(trans))
    return out


@given(
    seqs=st.lists(
        st.lists(st.sampled_from("abc"), min_size=1, max_size=10),
        min_size=1, max_size=4,
    ),
)
@settings(**_SETTINGS)
def test_markov_perplexity_matches_python_reference(spark, monkeypatch, seqs):
    import datetime

    from etl_pipeline_from_mongo_json_to_postgre_spark.operators import (
        timeseries,
    )

    seq_by_user = {u: seq for u, seq in enumerate(seqs)}
    base = datetime.datetime(2024, 1, 1)
    rows, i = [], 0
    for u, seq in seq_by_user.items():
        for et in seq:
            rows.append((u, i, et, base + datetime.timedelta(minutes=i)))
            i += 1
    df = spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, event_type string, ts timestamp"
    )
    monkeypatch.setattr(timeseries, "_events", lambda s, d: df)
    got = {r.user_id: (r.n_trans, r.avg_nll)
           for r in timeseries.ts_markov_perplexity(spark, "unused").collect()}
    want = _ref_markov_nll(seq_by_user)
    assert set(got) == set(want)
    for uid, (n, nll) in want.items():
        assert got[uid][0] == n
        assert abs(got[uid][1] - nll) < 1e-6
