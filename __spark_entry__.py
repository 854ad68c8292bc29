"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)    -> flagship query over /root/testdata/sf0.001
queries()       -> {name: (spark, sf_dir) -> DataFrame} per SURVEY.md §2
oracle_sql()    -> {name: DuckDB-equivalent ANSI SQL}

Implementations live in etl_pipeline_from_mongo_json_to_postgre_spark/
(operators/analytics.py, operators/transform_queries.py, ...); this
module only assembles the registries.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_pipeline_from_mongo_json_to_postgre_spark.operators import (
    analytics,
    association,
    corpus,
    dedup,
    graph,
    incremental,
    kmeans,
    pca,
    timeseries,
    multimodal,
    profiling,
    scalar_funcs,
    similarity,
    skew,
    text_queries,
    transform_queries,
)
from etl_pipeline_from_mongo_json_to_postgre_spark.sources import mongo_datasource
from etl_pipeline_from_mongo_json_to_postgre_spark.streaming import events as streaming_events

_MODULES = (analytics, transform_queries, scalar_funcs, text_queries, dedup,
            similarity, skew, multimodal, streaming_events, mongo_datasource,
            profiling, corpus, incremental, kmeans, timeseries, pca,
            association, graph)

# The driver evaluates registry entries in dict order and caps at the first
# 50 per round. Round-3 ordering rule: entries needing fresh driver evidence
# come first, previously-green-and-unchanged code last:
#   1. the 7 rows red in round 2 (6 TIMESTAMP_NTZ casualties, fixed at the
#      loader choke point, + the mm_binary_stats oracle-typing fix),
#   2. queries whose implementation changed this round (dedup_exact shuffle
#      key, ann_cosine_topk guard, dedup_minhash_pairs cache lifecycle) and
#      queries newly added this round — these have no driver evidence yet,
#   3. the 5 round-1 reds fixed in round 2 — one more green round to
#      confirm stability,
#   4. rows whose only driver evidence is round 1 (code unchanged, but
#      evidence should not go stale two rounds running),
#   5. remainder in module order (green in round 2, code unchanged).
_PRIORITY = [
    # -- 1: red in round 2, fixed this round -------------------------------
    "stream_windowed_counts", "stream_sessionize", "stream_dedup_keys",
    "stream_stream_click_purchase", "j5_asof_join", "j6_range_join",
    "mm_binary_stats",
    # -- 2: implementation changed / added this round (no driver evidence
    #       yet). ORACLE-CHECKED entries only: a driver slot spent on a
    #       rows-only entry buys just a count>=0 check (our local suite
    #       already runs that), so rows-only newcomers are deferred to
    #       group 4b below and their slots given to hash-checked ops. ----
    "dedup_exact", "ann_cosine_topk", "dedup_minhash_pairs",
    "s3_mongo_datasource_scan",
    "text_ngram_counts", "text_pii_mask", "doc_stats_by_lang",
    "dedup_components_bigstar", "dedup_minhash_canonical",
    "dq_column_profile", "dq_null_violations", "sample_stratified",
    "contamination_ngram_overlap", "text_repetition_stats", "text_c4_filters",
    "pack_sequences", "inc_upsert_latest", "inc_snapshot_diff",
    "inc_scd2_intervals", "inc_oplog_apply",
    "sample_domain_mix", "sample_token_budget",
    "tpch_q4_order_priority", "tpch_q16_supplier_cnt",
    "tpch_q21_waiting_supplier", "zorder_bucket_census", "dq_histogram",
    "ts_rolling_stats", "ts_user_cadence", "fuzzy_name_pairs",
    "approx_distinct_rollup",
    "semantic_search_topk", "stream_oplog_apply",
    "text_unigram_logprob", "text_tfidf_topk", "corpus_best_per_source",
    "corpus_length_trim", "corpus_shard_manifest", "ts_funnel_stages",
    "ts_cohort_retention", "ts_adjacent_pattern",
    "basket_copurchase_pairs", "events_heavy_hitters",
    "dq_histogram_equidepth", "dq_key_skew",
    "text_sparse_cosine_pairs", "stream_sliding_counts",
    "w3_distribution_funcs", "u5_except_all", "j7_interval_join",
    "a12_stats_agg", "tpch_q2_argmin_supplier", "j5b_asof_join_forward",
    "doc_chunk_spans", "ts_active_users", "customer_rfm_scores",
    "dq_referential_violations", "a13_percent_of_total",
    "text_langid_confusion", "orders_backlog_timeline",
    "dedup_cluster_census", "dedup_jaccard_prefix", "sample_weighted_topk",
    "revenue_date_spine", "session_top_paths", "dq_mad_outliers",
    "ts_trend_slope", "inc_agg_refresh", "user_acquisition_census",
    "a14_time_rollup", "json_key_census", "events_dow_hour_heatmap",
    "sim_knn_graph", "sessions_concurrency_daily", "text_zipf_fit",
    "text_vocab_growth", "ship_latency_profile", "doc_source_entropy",
    "a15_mode_agg", "events_daily_ohlc", "lineitem_2d_histogram",
    "part_brand_type_pmi", "events_user_gini", "ts_markov_transitions",
    "part_abc_classification", "orders_monthly_growth", "p13_unpivot_melt",
    "segment_reorder_cadence", "text_boilerplate_prefixes", "dq_value_ecdf",
    "dq_five_number_summary", "text_token_length_dist",
    "supplier_region_mix",
    # -- 3: round-1 reds fixed in round 2 — stability confirmation ---------
    "f3_numeric_funcs", "f4_array_funcs", "f5_json_extract",
    "approx_distinct_users", "approx_value_quantiles",
    # -- 4: only round-1 driver evidence (code unchanged; local parity
    #       suite also covers these every run). Group 2 has grown past the
    #       point where all of group 4 fits inside the 50-cap window; the
    #       ordering within group 4 is therefore smallest-plan-first so the
    #       rows that fall outside are the multi-operator ones with the
    #       strongest local test coverage (joins/sets/windows, all pinned
    #       in test_plans.py + test_oracle_parity.py). --------------------
    "a1_pivot_status_count", "a5_max_date", "a6_kpis",
    "a9_rollup_counts", "a10_cube_counts", "a11_grouping_sets",
    "j1_outer_join", "j2_lookup_join", "j3_anti_join", "j4_semi_join",
    "u1_explode_words", "u2_dedup_first", "u3_set_except", "u4_set_intersect",
    "o1_sort_topn", "o2_sort_multikey",
    "w1_running_total", "w2_offset_rank_funcs",
    # Entries 51+ (outside the window) are chosen for LOWEST marginal
    # evidence value: zero-evidence new code above always outranks
    # stale-but-green rows. p9/p10/p11 and a2/a3/a4/a8 are single-operator
    # filter/count queries, r1-driver-green, code unchanged since, and
    # re-verified by the local oracle-parity suite every run;
    # tumbling/sliding_window_agg share their plan with the
    # driver-checked stream_windowed_counts (same aggregation, batch
    # scan vs readStream); tpch_q5/q14 execute end-to-end in every bench
    # run; scalar_subquery_above_avg is a two-operator query;
    # dedup_minhash_pairs_fast is the one rows-only entry (no SQL oracle)
    # and is pinned against the portable variant in
    # tests/test_dedup_behavior.py.
    "p9_filter_eq", "p10_size_filter", "p11_positive_filter",
    "a2_group_count", "a3_conditional_count", "a4_scalar_count", "a8_distinct",
    "tumbling_window_agg",
    "sliding_window_agg",
    "tpch_q5_local_supplier_volume", "tpch_q14_promo_revenue",
    "scalar_subquery_above_avg",
    # -- 4b: rows-only entries (no SQL oracle — the driver can only do a
    #        count>=0 check, which the local suite already performs; their
    #        real correctness evidence is the invariant tests named in
    #        COVERAGE.md, so they never outrank a hash-checked entry). ----
    "approx_distinct_users_sketch", "approx_distinct_rollup_sketch",
    "kmeans_train", "emb_pca_project", "graph_pagerank_parts",
    "dedup_minhash_pairs_fast", "approx_heavy_users",
    # -- 5: remainder keeps module order -----------------------------------
]


def _ordered(entries: dict) -> dict:
    out = {k: entries[k] for k in _PRIORITY if k in entries}
    out.update((k, v) for k, v in entries.items() if k not in out)
    return out


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: ingest orders+lineitem as JSON document collections
    through the mapping/transform engine, pivot the audit trail
    (object_name x processing_status) — the reference's dashboard A1
    over a real engine-produced audit frame."""
    return transform_queries.audit_status_pivot(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        out.update(mod.QUERIES)
    return _ordered(out)


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _MODULES:
        out.update(mod.ORACLE_SQL)
    return _ordered(out)
