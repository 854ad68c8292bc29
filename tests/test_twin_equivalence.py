"""Result-equality pins for dataflow twins that live in separate
modules (r13 review findings 3/4).

`mm_probe` re-states the IVF retriever / recall census with a
parameterized probe width, and `tools/stream_ann_decompose` re-states
`stream_ann_cell_assign` with the query handle retained — deliberate
copies (parameterizing the originals would strong-drift green
registry entries for a refactor), so the divergence risk is pinned
HERE instead: at the shared probe width / same input, each twin must
produce row-identical results to the registered original. A fix
applied to one side and not the other fails these tests instead of
silently breaking the "only the probe width differs" measurement
claim.
"""

import pytest

pytest.importorskip("pyspark")

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_parameterized_retriever_matches_ann_ivf_topk_at_nprobe4(spark):
    """mm_probe._ivf_topk_probed(N_PROBE) == similarity.ann_ivf_topk:
    same assignment, probe rank rule, and exact-cosine re-rank."""
    from etl_pipeline_from_mongo_json_to_postgre_spark.operators import (
        mm_probe,
        similarity,
    )

    base = similarity.ann_ivf_topk(spark, SF)
    param = mm_probe._ivf_topk_probed(spark, SF, similarity.N_PROBE)
    assert base.columns == param.columns
    assert _rows(base) == _rows(param)


def test_parameterized_recall_matches_mm_crossmodal_recall_eval(spark):
    """mm_probe.crossmodal_recall(N_PROBE) == multimodal.
    mm_crossmodal_recall_eval: same exact-truth side, same canonical
    (keep-first) collapse, same per-query recall arithmetic."""
    from etl_pipeline_from_mongo_json_to_postgre_spark.operators import (
        mm_probe,
        multimodal,
        similarity,
    )

    base = multimodal.mm_crossmodal_recall_eval(spark, SF)
    param = mm_probe.crossmodal_recall(spark, SF, similarity.N_PROBE)
    assert base.columns == param.columns
    assert _rows(base) == _rows(param)


def test_decomposition_census_matches_registered_stream_entry(spark):
    """tools/stream_ann_decompose's retained-handle harness computes
    the SAME (cell, n_vecs) census as the registered
    stream_ann_cell_assign entry — the budgets it pins are measuring
    the entry's dataflow, not a stale copy."""
    from etl_pipeline_from_mongo_json_to_postgre_spark.streaming.doc_chunks import (
        stream_ann_cell_assign,
    )
    from tools.stream_ann_decompose import run_decomposed

    entry_rows = _rows(stream_ann_cell_assign(spark, SF))
    r = run_decomposed(spark, SF)
    # read the sink by the name run_decomposed reports — a catalog scan
    # for decomp_* picked up stale sf0.1 sinks from earlier suite tests
    harness_rows = _rows(spark.table(r["qname"]))
    assert harness_rows == entry_rows
