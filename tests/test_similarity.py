

def test_ivf_pq_adc_ranks_are_wellformed(spark, sf_dir):
    """ADC ranking contract: ranks are dense 1..TOPK per query, adc is
    non-decreasing along each query's ranks, no self-matches, and the
    candidate side of the probe join carries PQ codes, never vectors
    (the plan must not re-read `v` on the corpus side of the join)."""
    from etl_pipeline_from_mongo_json_to_postgre_spark.operators.similarity import (
        TOPK,
        ann_ivf_pq_topk,
    )

    df = ann_ivf_pq_topk(spark, sf_dir)
    rows = df.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert by_q
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= TOPK
        dists = [r.adc_dist for r in rs]
        assert dists == sorted(dists), f"adc not sorted for query {qid}"
        assert all(r.neighbor_id != qid for r in rs)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, "probe join must broadcast"
    # the stream (corpus) side AFTER the broadcast join must carry PQ
    # codes and never re-read the vector column (ADVICE r6: assert on
    # the join's downstream slice, not the whole plan string)
    after_join = plan.split("BroadcastHashJoin", 1)[1]
    assert "codes" in after_join


def test_pq_recall_eval_wellformed(spark, sf_dir):
    """Every query gets exactly one row; recall = hits/TOPK in [0,1].
    (On this corpus recall is ~0 BY DESIGN — untrained random codebooks
    must fail the acceptance gate; see the operator docstring.)"""
    from etl_pipeline_from_mongo_json_to_postgre_spark.operators.similarity import (
        N_QUERIES,
        TOPK,
        ann_pq_recall_eval,
    )

    rows = ann_pq_recall_eval(spark, sf_dir).collect()
    assert len(rows) == len({r.query_id for r in rows})
    assert len(rows) <= N_QUERIES
    for r in rows:
        assert 0 <= r.hits <= TOPK
        assert r.recall == r.hits / TOPK
