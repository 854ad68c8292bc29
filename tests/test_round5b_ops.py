"""Behavior pins for the round-5 second-wave operators: duplicated-
substring spans (ExactSubstr), the BPE merge step, Markov path
surprisal, and the chi-squared independence test — each on crafted
fixtures where the expected output is hand-computable."""

import datetime
import math

from pyspark.sql import functions as F  # noqa: F401 (fixture builders)


def _docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


class TestSubstringSpans:
    def _run(self, spark, monkeypatch, rows):
        from etl_pipeline_from_mongo_json_to_postgre_spark.operators import dedup

        df = _docs_df(spark, rows)
        monkeypatch.setattr(dedup, "_docs", lambda s, d: df)
        out = dedup.dedup_substring_spans(spark, "unused")
        return {
            (r.doc_id, r.span_start, r.span_end, r.dup_words)
            for r in out.collect()
        }

    def test_shared_run_merges_into_one_span(self, spark, monkeypatch):
        shared = "w1 w2 w3 w4 w5 w6 w7 w8"
        spans = self._run(spark, monkeypatch, [
            (0, shared + " tail0a tail0b tail0c"),
            (1, "head1a head1b " + shared),
            (2, "only unique words live here nothing shared at all"),
        ])
        # doc0: dup 5-gram starts 1..4 -> one island covering words 1..8;
        # doc1: same run shifted by its 2-word head -> words 3..10.
        assert spans == {(0, 1, 8, 8), (1, 3, 10, 8)}

    def test_within_doc_repeat_is_not_cross_doc(self, spark, monkeypatch):
        spans = self._run(spark, monkeypatch, [
            (0, "r1 r2 r3 r4 r5 x r1 r2 r3 r4 r5"),
            (1, "different vocabulary entirely for this document body"),
        ])
        assert spans == set()  # >=2 DISTINCT docs required

    def test_disjoint_shared_runs_stay_separate_spans(self, spark, monkeypatch):
        a, b = "s1 s2 s3 s4 s5", "t1 t2 t3 t4 t5"
        spans = self._run(spark, monkeypatch, [
            (4, a + " u1 u2 u3 " + b),
            (5, a + " v1 v2 v3 " + b),
        ])
        assert spans == {
            (4, 1, 5, 5), (4, 9, 13, 5),
            (5, 1, 5, 5), (5, 9, 13, 5),
        }


class TestBpeMergeStep:
    def _run(self, spark, monkeypatch, rows):
        from etl_pipeline_from_mongo_json_to_postgre_spark.operators import corpus

        df = _docs_df(spark, rows)
        monkeypatch.setattr(corpus, "_docs", lambda s, d: df)
        out = corpus.text_bpe_merge_step(spark, "unused")
        return [(r.pair, r.pair_count) for r in out.collect()]

    def test_pair_counts_weighted_by_word_frequency(self, spark, monkeypatch):
        got = self._run(spark, monkeypatch, [(0, "ab ab cd"), (1, "ab xy")])
        assert got == [("ab", 3), ("cd", 1), ("xy", 1)]

    def test_pairs_within_longer_words_and_tie_order(self, spark, monkeypatch):
        got = self._run(spark, monkeypatch, [(0, "aab aab")])
        assert got == [("aa", 2), ("ab", 2)]


class TestMarkovPerplexity:
    def _run(self, spark, monkeypatch, seq):
        from etl_pipeline_from_mongo_json_to_postgre_spark.operators import (
            timeseries,
        )

        base = datetime.datetime(2024, 1, 1)
        rows = [
            (uid, i, et, base + datetime.timedelta(minutes=i))
            for i, (uid, et) in enumerate(seq)
        ]
        df = spark.createDataFrame(
            rows, "user_id bigint, event_id bigint, event_type string, ts timestamp"
        )
        monkeypatch.setattr(timeseries, "_events", lambda s, d: df)
        out = timeseries.ts_markov_perplexity(spark, "unused")
        return {r.user_id: (r.n_trans, r.avg_nll) for r in out.collect()}

    def test_deterministic_chain_scores_zero(self, spark, monkeypatch):
        got = self._run(spark, monkeypatch, [(1, t) for t in "ababa"])
        assert got == {1: (4, 0.0)}

    def test_branching_chain_scores_ln2(self, spark, monkeypatch):
        # a->b, b->a, a->c: p(a->b)=p(a->c)=1/2, p(b->a)=1
        got = self._run(spark, monkeypatch, [(1, t) for t in "abac"])
        n, nll = got[1]
        assert n == 3
        assert abs(nll - 2 * math.log(2) / 3) < 1e-5


class TestLatenessCensus:
    def _run(self, spark, monkeypatch, rows):
        from etl_pipeline_from_mongo_json_to_postgre_spark.operators import (
            timeseries,
        )

        base = datetime.datetime(2024, 1, 1)
        df = spark.createDataFrame(
            [(eid, base + datetime.timedelta(seconds=s)) for eid, s in rows],
            "event_id bigint, ts timestamp",
        )
        monkeypatch.setattr(timeseries, "_events", lambda s, d: df)
        out = timeseries.events_lateness_census(spark, "unused")
        return {r.bucket_id: (r.label, r.n_events, r.max_lateness_s)
                for r in out.collect()}

    def test_buckets_and_shares(self, spark, monkeypatch):
        got = self._run(spark, monkeypatch, [
            (0, 1000),   # in order
            (1, 970),    # 30 s late
            (2, 2000),   # in order
            (3, 1500),   # 500 s late
            (4, 2100),   # in order
            (5, -2900),  # 5000 s late (> 1 h)
        ])
        assert got == {
            0: ("in_order", 3, 0.0),
            1: ("<=60s", 1, 30.0),
            2: ("<=10m", 1, 500.0),
            4: (">1h", 1, 5000.0),
        }

    def test_carry_crosses_arrival_blocks(self, spark, monkeypatch):
        # ids 0 and 5000 land in different LATENESS_BLOCK partitions;
        # the 100 s lateness is only visible through the block carry.
        got = self._run(spark, monkeypatch, [(0, 1000), (5000, 900)])
        assert got == {0: ("in_order", 1, 0.0), 2: ("<=10m", 1, 100.0)}


class TestBigramPerplexity:
    def test_hand_computed_interpolated_nll(self, spark, monkeypatch):
        from etl_pipeline_from_mongo_json_to_postgre_spark.operators import corpus

        df = _docs_df(spark, [(0, "a b a b"), (1, "x")])
        monkeypatch.setattr(corpus, "_docs", lambda s, d: df)
        rows = {r.doc_id: r for r in
                corpus.text_bigram_perplexity(spark, "unused").collect()}
        assert list(rows) == [0]  # the 1-word doc has no bigrams
        r = rows[0]
        # c(ab)=2 of ctx(a)=2, c(ba)=1 of ctx(b)=1; p_uni(a)=p_uni(b)=2/5
        # -> every bigram scores 0.75*1 + 0.25*0.4 = 0.85
        assert r.n_bigrams == 3
        assert abs(r.avg_nll - (-math.log(0.85))) < 1e-6


class TestMatryoshkaEval:
    def test_truncation_flips_engineered_top1(self, spark, monkeypatch):
        from etl_pipeline_from_mongo_json_to_postgre_spark.operators import (
            similarity,
        )

        # full-dim top-1 of q0 is n2 (exact match); the informative
        # tail dims vanish under a 2-dim prefix, where n1 and n2 tie
        # at cosine 1.0 and the id tie-break picks n1.
        df = spark.createDataFrame(
            [
                (0, [1.0, 0.0, 0.0, 0.0]),
                (1, [1.0, 0.0, 1.0, 0.0]),   # n1
                (2, [1.0, 0.0, 0.0, 0.0]),   # n2 == q0
            ],
            "vec_id bigint, v array<double>",
        )
        from pyspark.sql import functions as F

        vecs = df.select("vec_id", "v", similarity._norm(F.col("v")).alias("nrm"))
        monkeypatch.setattr(similarity, "_vectors", lambda s, d: vecs)
        monkeypatch.setattr(similarity, "MRL_DIMS", 2)
        monkeypatch.setattr(similarity, "N_QUERIES", 1)
        rows = similarity.emb_matryoshka_eval(spark, "unused").collect()
        assert len(rows) == 1
        r = rows[0]
        assert r.query_id == 0
        assert r.top1_match is False
        assert r.hits == 2           # both 2-vector top-5 sets coincide
        assert r.agreement == 0.4    # 2 / TOPK(5)


class TestPerplexityBuckets:
    def test_buckets_partition_and_order_by_surprisal(self, spark, monkeypatch):
        from etl_pipeline_from_mongo_json_to_postgre_spark.operators import corpus

        df = _docs_df(spark, [
            (0, "x x x x x x x x"),
            (1, "x y x y x y"),
            (2, "y z q w v u"),
            (3, "solo"),  # one word -> no bigrams -> excluded
        ])
        monkeypatch.setattr(corpus, "_docs", lambda s, d: df)
        rows = sorted(
            corpus.sample_perplexity_buckets(spark, "unused").collect(),
            key=lambda r: r.bucket,
        )
        assert [r.label for r in rows] == ["head", "middle", "tail"][: len(rows)]
        assert sum(r.n_docs for r in rows) == 3
        nlls = [r.mean_nll for r in rows]
        assert nlls == sorted(nlls)  # surprisal increases with the bucket

    def test_uniform_corpus_collapses_to_head(self, spark, monkeypatch):
        from etl_pipeline_from_mongo_json_to_postgre_spark.operators import corpus

        df = _docs_df(spark, [(i, "a b a b") for i in range(4)])
        monkeypatch.setattr(corpus, "_docs", lambda s, d: df)
        rows = corpus.sample_perplexity_buckets(spark, "unused").collect()
        assert len(rows) == 1
        assert (rows[0].bucket, rows[0].label, rows[0].n_docs) == (0, "head", 4)


class TestLastTouchAttribution:
    def test_channel_assignment_and_lookback(self, spark, monkeypatch):
        from etl_pipeline_from_mongo_json_to_postgre_spark.operators import (
            timeseries,
        )

        base = datetime.datetime(2024, 1, 10)
        day = datetime.timedelta(days=1)
        rows = [
            # u1: view -> click -> purchase(10): credited to click
            (1, 0, "view", 0.0, base),
            (1, 1, "click", 0.0, base + day),
            (1, 2, "purchase", 10.0, base + 2 * day),
            # u1 again: purchase(5) right after -> last touch still click
            (1, 3, "purchase", 5.0, base + 3 * day),
            # u2: touch 8 days before the purchase -> outside lookback
            (2, 4, "view", 0.0, base),
            (2, 5, "purchase", 7.0, base + 8 * day),
            # u3: purchase with no prior event at all
            (3, 6, "purchase", 3.0, base),
        ]
        df = spark.createDataFrame(
            rows,
            "user_id bigint, event_id bigint, event_type string, "
            "value double, ts timestamp",
        )
        monkeypatch.setattr(timeseries, "_events", lambda s, d: df)
        got = {
            r.channel: (r.n_purchases, r.revenue)
            for r in timeseries.events_attribution_last_touch(
                spark, "unused").collect()
        }
        assert got == {"click": (2, 15.0), "direct": (2, 10.0)}


class TestLabelPropagation:
    def test_chain_graph_nearest_seed_with_tie_break(self, spark, monkeypatch):
        from etl_pipeline_from_mongo_json_to_postgre_spark.operators import graph

        # co-purchase chain 10 - 1 - 2 - 3 - 20; seeds (partkey%10==0)
        # are 10 (brand A) and 20 (brand B). Node 2 is 2 hops from both
        # seeds -> label tie broken to the smaller brand string.
        li = spark.createDataFrame(
            [(1, 10), (1, 1), (2, 1), (2, 2), (3, 2), (3, 3), (4, 3), (4, 20)],
            "l_orderkey bigint, l_partkey bigint",
        )
        part = spark.createDataFrame(
            [(10, "Brand#A"), (20, "Brand#B"), (1, "x"), (2, "x"), (3, "x")],
            "p_partkey bigint, p_brand string",
        )
        frames = {"lineitem": li, "part": part}
        monkeypatch.setattr(graph, "load_table", lambda s, d, t: frames[t])
        got = {
            r.node: (r.dist, r.label)
            for r in graph.graph_label_propagation(spark, "unused").collect()
        }
        assert got == {
            10: (0, "Brand#A"), 20: (0, "Brand#B"),
            1: (1, "Brand#A"), 3: (1, "Brand#B"),
            2: (2, "Brand#A"),
        }

    def test_unreachable_nodes_stay_unlabeled(self, spark, monkeypatch):
        from etl_pipeline_from_mongo_json_to_postgre_spark.operators import graph

        # chain 10 - 1 - 2 - 3 - 4 - 5: node 4 is 4 hops from the only
        # seed (> LP_ROUNDS=3) and node 5 is 5 hops -> both absent.
        li = spark.createDataFrame(
            [(1, 10), (1, 1), (2, 1), (2, 2), (3, 2), (3, 3),
             (4, 3), (4, 4), (5, 4), (5, 5)],
            "l_orderkey bigint, l_partkey bigint",
        )
        part = spark.createDataFrame(
            [(10, "Brand#A")] + [(i, "x") for i in (1, 2, 3, 4, 5)],
            "p_partkey bigint, p_brand string",
        )
        frames = {"lineitem": li, "part": part}
        monkeypatch.setattr(graph, "load_table", lambda s, d, t: frames[t])
        got = {
            r.node: (r.dist, r.label)
            for r in graph.graph_label_propagation(spark, "unused").collect()
        }
        assert got == {
            10: (0, "Brand#A"), 1: (1, "Brand#A"),
            2: (2, "Brand#A"), 3: (3, "Brand#A"),
        }


class TestChisqIndependence:
    def _run(self, spark, monkeypatch, cells):
        from etl_pipeline_from_mongo_json_to_postgre_spark.operators import (
            profiling,
        )

        rows = [
            (i, lang, src)
            for i, (lang, src) in enumerate(
                (lg, sc) for (lg, sc, n) in cells for _ in range(n)
            )
        ]
        df = spark.createDataFrame(rows, "doc_id bigint, lang string, source string")
        monkeypatch.setattr(profiling, "load_table", lambda s, d, t: df)
        out = profiling.dq_chisq_independence(spark, "unused")
        return out.collect()[0]

    def test_independent_table_scores_zero(self, spark, monkeypatch):
        r = self._run(spark, monkeypatch, [
            ("en", "a", 10), ("en", "b", 20), ("fr", "a", 30), ("fr", "b", 60),
        ])
        assert (r.n_rows, r.n_langs, r.n_sources, r.dof) == (120, 2, 2, 1)
        assert r.chi2 == 0.0 and r.cramers_v == 0.0

    def test_diagonal_table_scores_n_and_v_one(self, spark, monkeypatch):
        r = self._run(spark, monkeypatch, [("en", "a", 50), ("fr", "b", 50)])
        assert r.chi2 == 100.0  # chi2 == N for a perfect association
        assert r.cramers_v == 1.0
        assert r.dof == 1


class TestConcurrencyDenseDays:
    """sessions_concurrency_daily (r10 fix): interior days of a
    multi-day session and decline-only days must report the carried
    concurrency, and the output is the dense day spine."""

    def _run(self, spark, monkeypatch, rows):
        from etl_pipeline_from_mongo_json_to_postgre_spark.operators import (
            timeseries,
        )

        df = spark.createDataFrame(
            rows, "event_id bigint, ts timestamp, user_id bigint"
        )
        monkeypatch.setattr(timeseries, "_events", lambda s, d: df)
        out = timeseries.sessions_concurrency_daily(spark, "unused")
        return {str(r.day): r.peak_concurrent for r in out.collect()}

    def test_multiday_session_covers_interior_days(self, spark, monkeypatch):
        t = datetime.datetime
        rows = []
        # user 1: one session spanning Jan 1 23:00 -> Jan 3 01:00
        # (events every 25 min, inside the 30-min gap)
        cur = t(2024, 1, 1, 23, 0)
        eid = 0
        while cur <= t(2024, 1, 3, 1, 0):
            rows.append((eid, cur, 1))
            eid += 1
            cur += datetime.timedelta(minutes=25)
        # user 2: a second session only on Jan 1 22:30-23:30 -> Jan 1
        # peaks at 2; Jan 2 has NO boundary rows but concurrency 1 all
        # day; Jan 3 starts at 1 (decline-only day)
        rows.append((1000, t(2024, 1, 1, 22, 30), 2))
        rows.append((1001, t(2024, 1, 1, 23, 30), 2))
        got = self._run(spark, monkeypatch, rows)
        assert got == {
            "2024-01-01": 2,
            "2024-01-02": 1,  # interior day: was silently MISSING pre-fix
            "2024-01-03": 1,  # decline-only day: peak is the carry
        }

    def test_idle_gap_days_report_zero(self, spark, monkeypatch):
        t = datetime.datetime
        rows = [
            (1, t(2024, 2, 1, 10, 0), 1),
            (2, t(2024, 2, 4, 10, 0), 1),  # 3 days later: new session
        ]
        got = self._run(spark, monkeypatch, rows)
        assert got == {
            "2024-02-01": 1,
            "2024-02-02": 0,
            "2024-02-03": 0,
            "2024-02-04": 1,
        }


class TestMarkovModelConsistency:
    """ts_markov_perplexity scores users under a transition matrix its
    own code estimates; this guard pins that matrix to the one
    ts_markov_transitions PUBLISHES (r10 review: the pair stream is
    duplicated code, and each entry's oracle mirrors its own copy, so
    parity alone cannot catch the two drifting apart)."""

    def test_scoring_matrix_equals_published_matrix(self, spark, sf_dir):
        from etl_pipeline_from_mongo_json_to_postgre_spark.operators import (
            timeseries,
        )

        published = {
            (r.from_type, r.to_type): r.p
            for r in timeseries.ts_markov_transitions(spark, sf_dir).collect()
        }
        perp = timeseries.ts_markov_perplexity(spark, sf_dir)
        # reconstruct each scored transition's implied probability from
        # the summed NLL of single-transition users is impractical;
        # instead re-derive the scoring model the same way the entry
        # does and compare cell-for-cell
        ev = timeseries._events(spark, sf_dir)
        assert perp.count() > 0
        from pyspark.sql.window import Window

        w = Window.partitionBy("user_id").orderBy(
            F.unix_micros("ts"), "event_id")
        pairs = (
            ev.select("user_id", "event_id", "ts", "event_type")
            .withColumn("nxt", F.lead("event_type").over(w))
            .where(F.col("nxt").isNotNull())
            .groupBy(F.col("event_type").alias("from_type"),
                     F.col("nxt").alias("to_type"))
            .agg(F.count("*").alias("cnt"))
        )
        tot = pairs.groupBy("from_type").agg(F.sum("cnt").alias("tot"))
        rebuilt = {
            (r.from_type, r.to_type): round(r.cnt / r.tot, 6)
            for r in pairs.join(tot, "from_type").collect()
        }
        assert set(rebuilt) == set(published)
        for k, v in rebuilt.items():
            assert abs(published[k] - v) < 1e-9, k
