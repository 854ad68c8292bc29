"""Physical-plan properties the 100 TB design depends on.

These pin the *shape* of the executed plans, not the results: filters
and projections must reach the parquet scan (pushdown + pruning),
bounded dims must broadcast, aggregations must partial-combine map-side
(one Exchange carrying |groups| rows, not |rows|), and the hot
relational paths must stay JVM-side (no Python evaluation nodes).
A Spark upgrade / conf drift that silently regresses any of these
fails here long before it shows up as a 100x slowdown on a cluster.
"""

import re

import pytest
from pyspark.sql import functions as F

from etl_pipeline_from_mongo_json_to_postgre_spark.operators.analytics import (
    tpch_q1_pricing_summary,
    tpch_q3_shipping_priority,
    tpch_q5_local_supplier_volume,
)
from etl_pipeline_from_mongo_json_to_postgre_spark.operators.transform_queries import (
    p1_mapped_projection,
)
from etl_pipeline_from_mongo_json_to_postgre_spark.sources.parquet import load_table
from etl_pipeline_from_mongo_json_to_postgre_spark.storage import physical_plan


def test_filter_and_projection_reach_parquet_scan(spark, sf_dir):
    """Predicate pushdown + column pruning: the scan node must carry the
    filter and read ONLY the selected columns."""
    df = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_totalprice")
    )
    plan = physical_plan(df)
    assert "PushedFilters" in plan
    assert "o_orderstatus" in plan.split("PushedFilters")[1].split("]")[0]
    read_schema = plan.split("ReadSchema")[1].splitlines()[0]
    assert "o_orderkey" in read_schema and "o_totalprice" in read_schema
    # pruned: untouched wide columns must NOT be read
    assert "o_comment" not in read_schema and "o_clerk" not in read_schema


def test_q3_pushes_dim_filter_and_broadcasts(spark, sf_dir):
    plan = physical_plan(tpch_q3_shipping_priority(spark, sf_dir))
    # the BUILDING filter reaches the customer scan
    assert "c_mktsegment" in plan
    assert "PushedFilters" in plan
    # at test scale the dim sides broadcast (no shuffle of customer)
    assert "BroadcastHashJoin" in plan


def test_q5_broadcasts_bounded_dims(spark, sf_dir):
    plan = physical_plan(tpch_q5_local_supplier_volume(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    # region filter pushed to its scan
    assert "r_name" in plan


def test_q1_partial_aggregation_single_exchange(spark, sf_dir):
    """Map-side combine: partial HashAggregate before the shuffle, final
    after — exactly one HASH exchange, carrying |groups| rows. A single
    ROUND-ROBIN exchange below the aggregation is allowed: that is
    fan_out widening the single-row-group testdata scan (r13
    optimization round), which no-ops on pre-split cluster tables —
    the scale property pinned here is that no hash exchange ever
    carries raw fact rows."""
    df = tpch_q1_pricing_summary(spark, sf_dir)
    df.collect()  # finalize the adaptive plan so codegen spans are visible
    plan = physical_plan(df).split("== Initial Plan ==")[0]
    assert plan.count("HashAggregate") >= 2
    assert plan.count("Exchange hashpartitioning") == 1
    # ADVICE r13: any second exchange must be EXACTLY fan_out's
    # round-robin — a future hash exchange on another frame would have
    # slipped through a bare `count("Exchange") <= 2` bound
    n_rr = plan.count("Exchange RoundRobinPartitioning")
    assert n_rr <= 1
    assert plan.count("Exchange") == 1 + n_rr
    # whole-stage-codegen spans ("*(n) Op") cover the agg + scan
    assert "*(" in plan


@pytest.mark.parametrize(
    "build",
    [tpch_q1_pricing_summary, tpch_q3_shipping_priority,
     tpch_q5_local_supplier_volume, p1_mapped_projection],
    ids=["q1", "q3", "q5", "p1"],
)
def test_hot_paths_have_no_python_eval(spark, sf_dir, build):
    """The relational/transform hot paths are pure Column expressions —
    any Python evaluation node in the plan is a regression."""
    plan = physical_plan(build(spark, sf_dir))
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "PythonUDF" not in plan


def test_dedup_exact_shuffles_hash_not_text(spark, sf_dir):
    """The exact-dedup shuffle must carry the 16-byte (xxhash64, length)
    key, never the document body: at 100 TB a groupBy("text") pushes
    the whole corpus through the exchange."""
    from etl_pipeline_from_mongo_json_to_postgre_spark.operators.dedup import dedup_exact

    plan = physical_plan(dedup_exact(spark, sf_dir))
    assert "xxhash64" in plan
    # the exchange partitions on the hash key, not the raw text column
    exchange = plan.split("Exchange hashpartitioning")[1].splitlines()[0]
    assert "_h" in exchange
    assert "text" not in exchange


def test_scd2_reuses_one_customer_shuffle(spark, sf_dir):
    """All four window/group steps of the SCD2 build (change-flag lag,
    island cumsum, per-island group-by, valid_to lead) must share ONE
    hashpartitioning(o_custkey) exchange — a second exchange means
    Catalyst lost the co-partitioning and the operator pays 2x shuffle
    at scale."""
    from etl_pipeline_from_mongo_json_to_postgre_spark.operators.incremental import (
        inc_scd2_intervals,
    )

    plan = physical_plan(inc_scd2_intervals(spark, sf_dir))
    assert plan.count("Exchange") == 1
    assert "hashpartitioning(o_custkey" in plan


def test_upsert_single_key_shuffle(spark, sf_dir):
    """Latest-wins upsert is union + one row_number shuffle on the key;
    the union itself must stay narrow (no exchange of its own)."""
    from etl_pipeline_from_mongo_json_to_postgre_spark.operators.incremental import (
        inc_upsert_latest,
    )

    plan = physical_plan(inc_upsert_latest(spark, sf_dir))
    assert plan.count("Exchange") == 1
    assert "hashpartitioning(o_orderkey" in plan


def test_contamination_shuffles_gram_hashes_not_text(spark, sf_dir):
    """The contamination join must move 8-byte gram hashes, never gram
    strings or document text, through its exchanges."""
    from etl_pipeline_from_mongo_json_to_postgre_spark.operators.corpus import (
        contamination_ngram_overlap,
    )

    plan = physical_plan(contamination_ngram_overlap(spark, sf_dir))
    assert "xxhash64" in plan
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "text" not in line


def test_ngram_counts_partial_agg_and_topk(spark, sf_dir):
    """Corpus census scale shape: bigram counts must partial-aggregate
    map-side (one Exchange carrying (bigram, partial_count)) and take
    the top-50 via TakeOrderedAndProject, never a global sort."""
    from etl_pipeline_from_mongo_json_to_postgre_spark.operators.text_queries import (
        text_ngram_counts,
    )

    plan = physical_plan(text_ngram_counts(spark, sf_dir))
    assert plan.count("HashAggregate") == 2  # partial + final
    # exactly ONE key shuffle (the aggregation); the only other allowed
    # exchange is the round-robin scan fan-out (sources.parquet.fan_out)
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Exchange") - plan.count("Exchange RoundRobinPartitioning") == 1
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan  # no global sort stage


def test_ts_rolling_single_exchange(spark, sf_dir):
    """ts_rolling_stats evaluates a range-frame rolling aggregate AND a
    lag over the same (user_id) partitioning — the physical plan must
    hash-shuffle exactly once, and nothing may leave whole-stage
    codegen into Python."""
    from etl_pipeline_from_mongo_json_to_postgre_spark.operators.timeseries import (
        ts_rolling_stats,
    )

    plan = physical_plan(ts_rolling_stats(spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Python" not in plan


def test_adjacent_pattern_single_exchange(spark, sf_dir):
    """The two-event sequence pattern is ONE window pass: a single
    (user_id) hash shuffle feeds the lead() evaluation, the pattern
    predicate stays a row filter, and the per-user count reuses the
    same partitioning."""
    from etl_pipeline_from_mongo_json_to_postgre_spark.operators.timeseries import (
        ts_adjacent_pattern,
    )

    plan = physical_plan(ts_adjacent_pattern(spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Python" not in plan


def test_copurchase_pairs_no_self_join(spark, sf_dir):
    """Pair generation must be array expressions inside the basket
    stage — no join operator (a row-level self-join would shuffle
    lineitem twice), and the pair-count aggregate partial-combines."""
    from etl_pipeline_from_mongo_json_to_postgre_spark.operators.association import (
        basket_copurchase_pairs,
    )

    plan = physical_plan(basket_copurchase_pairs(spark, sf_dir))
    assert "Join" not in plan
    assert "partial_count" in plan or "HashAggregate" in plan
    assert "Python" not in plan


def test_report_assembly_transform_runs_once(spark, sf_dir):
    """The audit report's expensive document-transform subtree is
    materialized ONCE behind the pre-aggregate checkpoint: the returned
    plan must read the checkpointed RDD, not re-derive the JSON
    transform per report branch (the regression was 4 from_json
    pipelines in one optimized plan)."""
    from etl_pipeline_from_mongo_json_to_postgre_spark.operators.transform_queries import (
        audit_report_assembly,
    )

    df = audit_report_assembly(spark, sf_dir)
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    assert "from_json" not in optimized
    assert "ExistingRDD" in optimized or "LogicalRDD" in optimized


def test_equidepth_broadcasts_bounds(spark, sf_dir):
    """Per-type decile bounds are type-count-sized and must broadcast
    back onto the scan — never a shuffled join of the fact table
    against its own aggregate."""
    from etl_pipeline_from_mongo_json_to_postgre_spark.operators.profiling import (
        dq_histogram_equidepth,
    )

    plan = physical_plan(dq_histogram_equidepth(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "Python" not in plan


def test_key_skew_takeordered_not_global_window(spark, sf_dir):
    """Top-K heavy keys must plan as TakeOrderedAndProject (local
    per-partition top-K + K-sized merge), not a single-partition
    row_number window over every key."""
    from etl_pipeline_from_mongo_json_to_postgre_spark.operators.profiling import (
        dq_key_skew,
    )

    plan = physical_plan(dq_key_skew(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "SinglePartition" not in plan.split("TakeOrderedAndProject")[0]


def test_sparse_cosine_shuffles_ids_not_text(spark, sf_dir):
    """After the first projection, no shuffle may carry the document
    text: the inverted-index join moves (doc, term, tf) triples and the
    dot-product aggregate moves pair partials."""
    from etl_pipeline_from_mongo_json_to_postgre_spark.operators.corpus import (
        text_sparse_cosine_pairs,
    )

    plan = physical_plan(text_sparse_cosine_pairs(spark, sf_dir))
    for exchange_chunk in plan.split("Exchange hashpartitioning")[1:]:
        keys = exchange_chunk.split("]")[0]
        assert "text" not in keys
    assert "Python" not in plan


def test_rfm_no_global_window(spark, sf_dir):
    """RFM scores must come from broadcast percentile thresholds —
    a Window operator here would mean the global-ntile shape that
    funnels every customer through one sort partition."""
    from etl_pipeline_from_mongo_json_to_postgre_spark.operators.analytics import (
        customer_rfm_scores,
    )

    plan = physical_plan(customer_rfm_scores(spark, sf_dir))
    assert "Window" not in plan
    assert "Broadcast" in plan
    assert "Python" not in plan


def test_active_users_no_window_no_python(spark, sf_dir):
    """DAU/WAU: the rolling distinct is pair-set joins + aggregates;
    no Window operator, no Python, and the first aggregate partial-
    combines before its shuffle."""
    from etl_pipeline_from_mongo_json_to_postgre_spark.operators.timeseries import (
        ts_active_users,
    )

    plan = physical_plan(ts_active_users(spark, sf_dir))
    assert "Window" not in plan
    assert "Python" not in plan


def test_referential_audit_anti_joins(spark, sf_dir):
    """Every FK edge must plan as an anti join (orphans = absence),
    with the key sides reduced/broadcast — never a full outer merge."""
    from etl_pipeline_from_mongo_json_to_postgre_spark.operators.profiling import (
        dq_referential_violations,
    )

    plan = physical_plan(dq_referential_violations(spark, sf_dir))
    assert plan.count("LeftAnti") == 4
    assert "Python" not in plan


def test_date_spine_generated_not_scanned(spark, sf_dir):
    """The calendar spine must be GENERATED (explode over the 2-value
    min/max aggregate) — a Generate node fed by an aggregate, not a
    second scan of the orders table."""
    from etl_pipeline_from_mongo_json_to_postgre_spark.operators.analytics import (
        revenue_date_spine,
    )

    plan = physical_plan(revenue_date_spine(spark, sf_dir))
    assert "Generate explode" in plan
    # the daily aggregate is checkpointed: both the spine bounds and
    # the join side read the materialized day-cardinality RDD — the
    # orders table was scanned exactly once (at checkpoint), so the
    # returned plan contains NO file scans at all
    assert "FileScan" not in plan
    assert "ExistingRDD" in plan
    assert "Python" not in plan


def test_session_paths_single_user_shuffle(spark, sf_dir):
    """Path mining: islands window + per-session path aggregate share
    the user_id partitioning; the only other exchange carries
    (path, partial-count) rows; top-K is TakeOrdered."""
    from etl_pipeline_from_mongo_json_to_postgre_spark.operators.analytics import (
        session_top_paths,
    )

    plan = physical_plan(session_top_paths(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "Python" not in plan


def test_abc_single_fact_scan(spark, sf_dir):
    """ABC classification: the per-part revenue aggregate is
    checkpointed so the grand-total branch and the rank/cumsum branch
    share one lineitem scan — the returned plan reads only the
    materialized part-cardinality RDD."""
    from etl_pipeline_from_mongo_json_to_postgre_spark.operators.analytics import (
        part_abc_classification,
    )

    plan = physical_plan(part_abc_classification(spark, sf_dir))
    assert "FileScan" not in plan
    assert "ExistingRDD" in plan
    assert "Python" not in plan


def test_tfidf_single_text_scan(spark, sf_dir):
    """TF-IDF: the (doc, term, tf) frame is checkpointed so its three
    consumers (rank join, df marginal, corpus size) never re-tokenize
    the text column — the returned plan reads only the materialized
    RDD."""
    from etl_pipeline_from_mongo_json_to_postgre_spark.operators.corpus import (
        text_tfidf_topk,
    )

    plan = physical_plan(text_tfidf_topk(spark, sf_dir))
    assert "FileScan" not in plan
    assert "ExistingRDD" in plan


def test_curation_full_single_corpus_scan(spark, sf_dir):
    """Full curation DAG (gate -> dedup -> decontaminate -> mixture ->
    split): every stage reads the ONE checkpointed corpus projection,
    so the returned plan has zero corpus FileScans (r12 task 1's
    <=2-scan pin, met at 0) and stays JVM-side."""
    from etl_pipeline_from_mongo_json_to_postgre_spark.operators.curation_ext import (
        corpus_curation_pipeline_full,
    )

    plan = physical_plan(corpus_curation_pipeline_full(spark, sf_dir))
    assert "FileScan" not in plan
    assert "ExistingRDD" in plan
    assert "Python" not in plan
    # bench shingles + quota frame broadcast; the rank is the only
    # corpus-sized exchange keyed on source
    assert "BroadcastHashJoin" in plan


def test_sparse_cosine_single_text_scan(spark, sf_dir):
    """Sparse cosine: tokenization runs once (tf checkpoint) and the
    df-capped frame materializes once (kept checkpoint) — the returned
    plan contains no file scans at all."""
    from etl_pipeline_from_mongo_json_to_postgre_spark.operators.corpus import (
        text_sparse_cosine_pairs,
    )

    plan = physical_plan(text_sparse_cosine_pairs(spark, sf_dir))
    assert "FileScan" not in plan
    assert "ExistingRDD" in plan


# ---------------------------------------------------------------------------
# Generalized multi-consumer barrier audit (VERDICT r3 task 6)
# ---------------------------------------------------------------------------

# Registry entries whose implementation materializes a multi-consumer
# frame behind an eager localCheckpoint barrier. The scale property the
# barrier buys: every base parquet table is scanned AT MOST ONCE in the
# returned physical plan — a second FileScan of the same table means a
# consumer silently re-derived the subtree (the round-3
# audit_report_assembly regression class: 4 from_json pipelines in one
# optimized plan). Deliberate self-joins (j6_range_join etc.) are NOT
# listed — two scans there are the intended plan. Also intentionally
# absent: contamination_ngram_overlap, whose benchmark and candidate
# slices re-scan documents with disjoint pushed-down doc_id filters —
# at corpus scale two pruned scans beat materializing every gram hash.
MULTI_CONSUMER_ENTRIES = [
    "audit_report_assembly",
    "part_abc_classification",
    "a13_percent_of_total",
    "orders_monthly_growth",
    "text_tfidf_topk",
    "text_sparse_cosine_pairs",
    "dedup_minhash_pairs",
    "dedup_minhash_canonical",
    "dedup_jaccard_prefix",
    "dq_five_number_summary",
    "ts_active_users",
    "sessions_concurrency_daily",
    "sim_cosine_pairs_lsh",
    "dedup_embedding_cosine",
    "ann_ivf_topk",
    "kmeans_train",
    "emb_pca_project",
    "dedup_substring_spans",
    "ts_markov_perplexity",
    "dq_chisq_independence",
    "text_bigram_perplexity",
    "events_lateness_census",
    "emb_matryoshka_eval",
    "sample_perplexity_buckets",
    "graph_kcore_parts",
    "text_zipf_fit",          # r10 review: census + ranked join consumers
    "text_repetition_stats",  # r10 review: bigram explode + final join
]

_SCAN_TABLE_RE = re.compile(r"FileScan[^\n]*?/(\w+)\.parquet")


@pytest.mark.parametrize("name", MULTI_CONSUMER_ENTRIES)
def test_multi_consumer_entries_scan_each_fact_once(name, spark, sf_dir):
    import collections

    import __spark_entry__ as entrymod

    df = entrymod.queries()[name](spark, sf_dir)
    plan = physical_plan(df)
    scans = collections.Counter(_SCAN_TABLE_RE.findall(plan))
    dup = {t: c for t, c in scans.items() if c > 1}
    assert not dup, (
        f"{name}: table(s) scanned more than once in the final plan "
        f"(checkpoint barrier not holding): {dup}\n{plan[:2000]}")


# ---------------------------------------------------------------------------
# round-4 operator plan shapes
# ---------------------------------------------------------------------------

def test_q6_scan_only_pushdown_no_join(spark, sf_dir):
    """Q6 is a pure scan-filter-aggregate: the shipdate/quantity
    predicates must reach the parquet scan and NO join may appear."""
    from etl_pipeline_from_mongo_json_to_postgre_spark.operators.tpch_suite import (
        tpch_q6_forecast_revenue,
    )

    plan = physical_plan(tpch_q6_forecast_revenue(spark, sf_dir))
    assert "PushedFilters" in plan
    pushed = plan.split("PushedFilters")[1].split("]")[0]
    assert "l_shipdate" in pushed and "l_quantity" in pushed
    assert "Join" not in plan
    read_schema = plan.split("ReadSchema")[1].splitlines()[0]
    assert "l_returnflag" not in read_schema  # pruned


def test_q19_single_join_disjunction_as_residual(spark, sf_dir):
    """Q19's three OR'd bands share the partkey equi-join: the plan must
    contain exactly ONE join (never a union of three scans), with the
    disjunction as a residual filter."""
    from etl_pipeline_from_mongo_json_to_postgre_spark.operators.tpch_suite import (
        tpch_q19_disjunctive_revenue,
    )

    plan = physical_plan(tpch_q19_disjunctive_revenue(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") + plan.count("SortMergeJoin") == 1
    assert plan.count("Scan parquet") == 2  # lineitem + part, once each


def test_q11_and_q15_single_fact_scan(spark, sf_dir):
    """The HAVING-vs-global-scalar queries materialize the grouped frame
    once: the big fact table must be scanned at most once in the final
    plan (the checkpoint barrier replaces the second consumer)."""
    from etl_pipeline_from_mongo_json_to_postgre_spark.operators.tpch_suite import (
        tpch_q11_important_parts,
        tpch_q15_top_supplier,
    )

    for build in (tpch_q11_important_parts, tpch_q15_top_supplier):
        plan = physical_plan(build(spark, sf_dir))
        assert plan.count("Scan parquet") <= 1, build.__name__


def test_pareto_frontier_no_quadratic_fact_join(spark, sf_dir):
    """The skyline must NOT self-join the orders fact: the exact
    dominance pass runs on the pruned candidate set (checkpointed RDD),
    via broadcast — no SortMergeJoin and no CartesianProduct over the
    fact, and the fact parquet is scanned at most twice (bucket stats +
    candidate filter)."""
    from etl_pipeline_from_mongo_json_to_postgre_spark.operators.curation_ext import (
        orders_pareto_frontier,
    )

    plan = physical_plan(orders_pareto_frontier(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1  # the candidate verify only


def test_bm25_term_filter_before_aggregation(spark, sf_dir):
    """BM25 prunes to the query vocabulary map-side: the IN-filter must
    sit under the first aggregation Exchange, and the hot path stays
    JVM-side."""
    from etl_pipeline_from_mongo_json_to_postgre_spark.operators.curation_ext import (
        text_bm25_topk,
    )

    plan = physical_plan(text_bm25_topk(spark, sf_dir))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # term IN (...) appears as a Filter, not as a post-shuffle predicate:
    # every Exchange hashpartitioning on (doc_id, term) happens above a
    # filtered Generate (explode) — check the filter exists at all
    assert "term" in plan and "Filter" in plan


def test_emb_census_single_exchange_partial_agg(spark, sf_dir):
    """Per-dimension stats and the PQ census both partial-aggregate:
    ONE Exchange carrying |dims|/|cells| rows."""
    from etl_pipeline_from_mongo_json_to_postgre_spark.operators.similarity import (
        emb_dim_stats,
        emb_pq_census,
    )

    for build in (emb_dim_stats, emb_pq_census):
        df = build(spark, sf_dir)
        df.collect()
        plan = physical_plan(df).split("== Initial Plan ==")[0]
        # exactly one hash-partitioned exchange (the agg); the RoundRobin
        # exchange is fan_out's deliberate single-row-group scan split
        assert plan.count("Exchange hashpartitioning") == 1, build.__name__
        assert plan.count("HashAggregate") >= 2, build.__name__


def test_triangle_count_no_cartesian(spark, sf_dir):
    """Triangle closure is equi-join + semi-join on ids — any
    CartesianProduct means the orientation trick regressed."""
    from etl_pipeline_from_mongo_json_to_postgre_spark.operators.graph import (
        graph_triangle_count,
    )

    plan = physical_plan(graph_triangle_count(spark, sf_dir))
    assert "CartesianProduct" not in plan


def test_decontaminate_shuffles_hashes_not_text(spark, sf_dir):
    """Decontamination joins on shingle-hash longs: no exchange may
    carry the raw text column."""
    from etl_pipeline_from_mongo_json_to_postgre_spark.operators.curation_ext import (
        corpus_decontaminate,
    )

    plan = physical_plan(corpus_decontaminate(spark, sf_dir))
    for chunk in plan.split("Exchange hashpartitioning")[1:]:
        head = chunk.splitlines()[0]
        assert "text" not in head


def test_shingle_pipelines_checkpoint_before_consumption(spark, sf_dir):
    """CollapseProject regression guard: the jaccard-family plans must
    consume MATERIALIZED shingle arrays (checkpoint RDD scans), never
    the inline word-hash expression — if `split(text` appears anywhere
    in the final physical plan, the barrier was lost and the word-hash
    pipeline is being re-evaluated per element_at (measured ~100x at
    sf0.1)."""
    from etl_pipeline_from_mongo_json_to_postgre_spark.operators.dedup import (
        dedup_containment_pairs,
        dedup_jaccard_prefix,
        dedup_ngram_jaccard,
    )

    for build in (dedup_ngram_jaccard, dedup_jaccard_prefix,
                  dedup_containment_pairs):
        plan = physical_plan(build(spark, sf_dir))
        assert "split(text" not in plan, build.__name__
        assert "Scan ExistingRDD" in plan, build.__name__


def test_substring_spans_barrier_and_partitioned_islands(spark, sf_dir):
    """dedup_substring_spans: the positional-gram pipeline must consume
    the MATERIALIZED word-hash arrays (checkpoint barrier — same
    CollapseProject class as the jaccard family), and the island-merge
    window must be partitioned by doc_id, never a global sort."""
    from etl_pipeline_from_mongo_json_to_postgre_spark.operators.dedup import (
        dedup_substring_spans,
    )

    plan = physical_plan(dedup_substring_spans(spark, sf_dir))
    assert "split(text" not in plan
    assert "Scan ExistingRDD" in plan
    assert "Python" not in plan
    after = plan.split("row_number() windowspecdefinition", 1)[1]
    first_exchange = after.split("Exchange ", 1)[1].split(",", 1)[0]
    assert first_exchange.startswith("hashpartitioning"), first_exchange


def test_lateness_census_local_window_is_partitioned(spark, sf_dir):
    """events_lateness_census: the corpus-sized running max must run
    inside arrival blocks (hashpartitioning on blk), with only the
    block-cardinality carry allowed through a single partition."""
    from etl_pipeline_from_mongo_json_to_postgre_spark.operators.timeseries import (
        events_lateness_census,
    )

    plan = physical_plan(events_lateness_census(spark, sf_dir))
    assert "Python" not in plan
    assert "hashpartitioning(blk" in plan
    assert "BroadcastHashJoin" in plan  # carry + total join back broadcast


def test_orc_stage_partition_prunes_on_lang(spark, sf_dir):
    """The lang-partitioned ORC layout must turn a lang filter into a
    directory-level PartitionFilter (whole partitions skipped), not a
    row filter over a full scan."""
    from etl_pipeline_from_mongo_json_to_postgre_spark.sources.orc_source import (
        read_documents_orc,
        stage_documents_orc,
    )

    path = stage_documents_orc(spark, sf_dir)
    df = read_documents_orc(spark, path).filter(F.col("lang") == "en")
    plan = physical_plan(df)
    part_filters = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "lang" in part_filters


def test_zipf_rank_is_partitioned_not_global(spark, sf_dir):
    """VERDICT r4 task 4: the vocabulary rank must decompose into a
    bounded (freq, bucket) census window plus a row_number PARTITIONED
    by (freq, bucket) — never a single-partition window over the whole
    vocabulary. The row_number Window node must be fed by a
    hashpartitioning Exchange, and the census offsets must broadcast
    back onto the vocab frame."""
    from etl_pipeline_from_mongo_json_to_postgre_spark.operators.corpus import (
        text_zipf_fit,
    )

    plan = physical_plan(text_zipf_fit(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "Python" not in plan
    # the first Exchange BELOW the row_number Window (its input) must be
    # a hash partitioning, not SinglePartition
    after = plan.split("row_number() windowspecdefinition", 1)[1]
    first_exchange = after.split("Exchange ", 1)[1].split(",", 1)[0]
    assert first_exchange.startswith("hashpartitioning"), first_exchange


def test_mixing_family_broadcasts_models_and_stays_jvm_side(spark, sf_dir):
    """The mixture operators join corpus-sized token streams against
    MODEL-sized tables (1024 log-ratios / weights, ~20 domains): every
    join must broadcast (a SortMergeJoin means the model side shuffled
    the corpus), no Python evaluation, and no exchange may carry the
    text column."""
    from etl_pipeline_from_mongo_json_to_postgre_spark.operators.mixing import (
        sample_importance_weights,
        sample_temperature_mix,
        text_classifier_score,
    )

    for build in (sample_importance_weights, text_classifier_score,
                  sample_temperature_mix):
        plan = physical_plan(build(spark, sf_dir))
        assert "SortMergeJoin" not in plan, build.__name__
        assert "BatchEvalPython" not in plan, build.__name__
        assert "ArrowEvalPython" not in plan, build.__name__
        for chunk in plan.split("Exchange hashpartitioning")[1:]:
            assert "text" not in chunk.splitlines()[0], build.__name__


def test_mm_sniff_and_entropy_jvm_side(spark, sf_dir):
    """Magic-byte sniffing and byte entropy are pure column expressions:
    no Python nodes, no joins at all, and the census exchanges carry
    group keys + partial aggregates, never the payload bytes."""
    from etl_pipeline_from_mongo_json_to_postgre_spark.operators.multimodal import (
        mm_byte_entropy,
        mm_magic_byte_census,
    )

    for build in (mm_magic_byte_census, mm_byte_entropy):
        plan = physical_plan(build(spark, sf_dir))
        assert "BatchEvalPython" not in plan, build.__name__
        assert "ArrowEvalPython" not in plan, build.__name__
        assert "Join" not in plan, build.__name__
        for chunk in plan.split("Exchange hashpartitioning")[1:]:
            assert "payload" not in chunk.splitlines()[0], build.__name__


def test_missing_report_parses_json_once_post_exchange(spark, sf_dir):
    """explode()'s implicit size>0 pre-filter used to push below the
    fan-out Exchange into the single-task scan stage, re-evaluating the
    whole JSON serialize->parse pipeline once per array_contains branch
    single-threaded (7 s vs 0.9 s at sf0.1). Pinned: from_json appears
    exactly once in the plan, and never inside a Filter."""
    from etl_pipeline_from_mongo_json_to_postgre_spark.operators.transform_queries import (
        audit_missing_columns_report,
    )

    plan = physical_plan(audit_missing_columns_report(spark, sf_dir))
    assert plan.count("from_json") == 1, plan.count("from_json")
    for line in plan.splitlines():
        if "Filter" in line and "from_json" in line:
            raise AssertionError("JSON parse pushed into a Filter: " + line[:120])


def test_runtime_bloom_filter_semijoin_reduction(spark, sf_dir):
    """Semi-join reduction at cluster scale: when a selective dim filter
    feeds a SHUFFLE join, Spark's InjectRuntimeFilter builds a bloom
    filter from the filtered dim keys and pushes might_contain(fact_key)
    into the fact side — the fact shuffle then carries only rows that
    can possibly match, instead of the whole table. The gate is sized
    for the 100 TB regime (applicationSideScanSizeThreshold = 10 GiB;
    a local parquet scan never qualifies, and in the broadcast regime
    the reduction is moot), so the pin lowers the threshold and forces
    the SMJ regime to prove the rewrite fires and stays value-correct.
    A/B numbers at sf0.1 are in BASELINE.md (r9)."""
    from etl_pipeline_from_mongo_json_to_postgre_spark.sources.parquet import (
        load_table,
    )

    def q17_shape():
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_partkey", "l_extendedprice")
        pt = load_table(spark, sf_dir, "part").where(
            F.col("p_brand") == "Brand#23"
        ).select("p_partkey")
        return li.join(pt, li.l_partkey == pt.p_partkey).agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")), 2)
            .alias("rev"),
        )

    baseline = q17_shape().collect()
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        df = q17_shape()
        rows = df.collect()
        plan = physical_plan(df).split("== Initial Plan ==")[0]
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
    # the runtime filter is a scalar-subquery bloom probe on the fact side
    assert "might_contain" in plan, "runtime bloom filter did not inject"
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert rows == baseline


def test_mm_crossmodal_mp_plan_digest_keyed_no_rescan(spark, sf_dir):
    """The widened-probe cross-modal retriever keeps the family's scale
    shape (mm_probe module docstring): the returned plan reads ZERO
    parquet FileScans (embeddings and the payload projection are each
    scanned once into localCheckpoints upstream), every join is
    broadcast (hit list and canonical map are query-bounded — a
    SortMergeJoin or CartesianProduct means a data-scale frame leaked
    into the join graph), and every exchange is keyed on the sha256
    digest — raw payload bytes never cross a shuffle."""
    from etl_pipeline_from_mongo_json_to_postgre_spark.operators.mm_probe import (
        mm_crossmodal_topk_mp,
    )

    plan = physical_plan(mm_crossmodal_topk_mp(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert "FileScan" not in plan
    for chunk in plan.split("Exchange hashpartitioning")[1:]:
        head = chunk.splitlines()[0]
        assert "payload_sha256" in head
        assert "payload#" not in head
