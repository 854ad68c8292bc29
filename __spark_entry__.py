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
    curation_ext,
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
    tpch_suite,
    transform_queries,
)
from etl_pipeline_from_mongo_json_to_postgre_spark.sources import (
    csv_source,
    mongo_datasource,
)
from etl_pipeline_from_mongo_json_to_postgre_spark.streaming import events as streaming_events

_MODULES = (analytics, transform_queries, scalar_funcs, text_queries, dedup,
            similarity, skew, multimodal, streaming_events, mongo_datasource,
            profiling, corpus, incremental, kmeans, timeseries, pca,
            association, graph, tpch_suite, curation_ext, csv_source)

# The driver evaluates registry entries in dict order and caps at the first
# 50 per round. Round-4 ordering rule (VERDICT r3 task 2): the window is
# spent on (a) the one round-3 red, now fixed (inc_scd2_intervals —
# oracle window-sum CAST), then (b) 49 of the 50 entries that have never
# had driver evidence (all round-3 additions). That fills the cap
# exactly; the one never-checked entry deferred to round 5 is
# supplier_region_mix (single-join group-count, code unchanged since r3,
# pinned by the local parity sweep) — deferring the simplest plan costs
# the least marginal evidence. Four in-window oracles changed this round
# (orders_backlog_timeline, text_vocab_growth, text_sparse_cosine_pairs:
# HUGEINT window/aggregate-sum casts; j7_interval_join: event_id
# tie-break per ADVICE) — all four are in the window. Entries added in
# round 4 follow at positions 51+, ahead of stale-but-green rows, so the
# round-5 window picks them up plus supplier_region_mix.
_PRIORITY = [
    # -- 1: the round-3 red, fixed this round ------------------------------
    "inc_scd2_intervals",
    # -- 2: zero driver evidence (round-3 additions), 49 of 50 ------------
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
    # -- 3: position 51+: the one deferred never-checked entry, then the
    #       40 round-4 additions, then previously-green rows grouped by
    #       evidence staleness. Round-5 window plan: positions 51-91
    #       (supplier_region_mix + the 40 round-4 additions) plus the 7
    #       derived/rows-only conversions in group 4b + 2 of the r1-only
    #       rows fill the next 50-slot cap exactly. --------------------
    "supplier_region_mix",
    # round-4 additions:
    "tpch_q6_forecast_revenue", "tpch_q7_volume_shipping",
    "tpch_q8_market_share", "tpch_q9_product_profit",
    "tpch_q10_returned_items", "tpch_q11_important_parts",
    "tpch_q12_late_priority", "tpch_q13_customer_distribution",
    "tpch_q15_top_supplier", "tpch_q17_small_quantity_revenue",
    "tpch_q19_disjunctive_revenue", "tpch_q20_promotion_suppliers",
    "tpch_q22_dormant_customers",
    "train_split_assign", "corpus_decontaminate", "events_anomaly_zscore",
    "orders_pareto_frontier", "text_winnowing_fingerprint",
    "dedup_containment_pairs", "ann_recall_eval", "emb_dim_stats",
    "graph_triangle_count",
    "text_bm25_topk", "dq_benford_firstdigit", "ts_ewma", "emb_pq_census",
    "inc_dedup_merge", "mm_payload_dedup", "s10_csv_roundtrip",
    "dedup_lsh_eval", "corpus_curation_pipeline", "inc_scd2_as_of",
    "dq_order_reconciliation", "events_audience_overlap",
    "dedup_simhash_pairs", "ts_changepoint_split", "corpus_ngram_novelty",
    "ts_active_time_coverage", "w4_windowed_distinct_count",
    "stream_windowed_distinct_users",
    # -- 4: r1-only evidence (code unchanged; local parity covers) --------
    "a1_pivot_status_count", "a5_max_date", "a6_kpis",
    "a9_rollup_counts", "a10_cube_counts", "a11_grouping_sets",
    "j1_outer_join", "j2_lookup_join", "j3_anti_join", "j4_semi_join",
    "u1_explode_words", "u2_dedup_first", "u3_set_except", "u4_set_intersect",
    "o1_sort_topn", "o2_sort_multikey",
    "w1_running_total", "w2_offset_rank_funcs",
    "p9_filter_eq", "p10_size_filter", "p11_positive_filter",
    "a2_group_count", "a3_conditional_count", "a4_scalar_count", "a8_distinct",
    "tumbling_window_agg", "sliding_window_agg",
    "tpch_q5_local_supplier_volume", "tpch_q14_promo_revenue",
    "scalar_subquery_above_avg",
    # -- 4b: converted to DERIVED oracles in round 4 (kmeans_train,
    #        emb_pca_project, graph_pagerank_parts, approx_heavy_users —
    #        invariant rows / verified candidate sets the driver can
    #        hash-check) and the 3 justified rows-only remainders (see
    #        COVERAGE.md). All zero-evidence → round-5 window with
    #        supplier_region_mix above. ---------------------------------
    "kmeans_train", "emb_pca_project", "graph_pagerank_parts",
    "approx_heavy_users",
    "approx_distinct_users_sketch", "approx_distinct_rollup_sketch",
    "dedup_minhash_pairs_fast",
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
