"""Behavioral tests for the similarity-search operators beyond oracle
parity: IVF recall against the brute-force baseline, and near-dup
canonicalization invariants."""

import pytest
from pyspark.sql import functions as F

from etl_pipeline_from_mongo_json_to_postgre_spark.operators import similarity


@pytest.fixture(scope="module")
def brute(spark, sf_dir):
    return {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.ann_cosine_topk(spark, sf_dir).collect()
    }


@pytest.fixture(scope="module")
def ivf(spark, sf_dir):
    return similarity.ann_ivf_topk(spark, sf_dir).collect()


def test_ivf_shape(ivf):
    by_q = {}
    for r in ivf:
        by_q.setdefault(r["query_id"], []).append(r)
    assert len(by_q) == similarity.N_QUERIES
    for q, rows in by_q.items():
        assert len(rows) == similarity.TOPK
        assert sorted(r["rank"] for r in rows) == list(range(1, similarity.TOPK + 1))
        assert all(r["neighbor_id"] != q for r in rows)


def test_ivf_recall_vs_brute_force(brute, ivf):
    """IVF probes 4/16 partitions; on this corpus (cluster-structured
    labels) it must still recover a sizeable share of the exact top-k.
    This is a recall sanity floor, not an exactness claim."""
    hits = sum(1 for r in ivf if (r["query_id"], r["neighbor_id"]) in brute)
    assert hits / len(brute) >= 0.30


def test_ivf_cluster_assignment_covers_corpus(spark, sf_dir):
    vecs = similarity._vectors(spark, sf_dir)
    dots = F.array(
        *[similarity._dot(F.col("v"), similarity._plane_lit(c))
          for c in similarity.CENTROIDS]
    )
    assigned = vecs.select(
        F.array_position(dots, F.array_max(dots)).alias("cluster_id")
    )
    stats = assigned.agg(
        F.countDistinct("cluster_id").alias("n"),
        F.min("cluster_id").alias("lo"),
        F.max("cluster_id").alias("hi"),
    ).collect()[0]
    assert stats["lo"] >= 1 and stats["hi"] <= similarity.N_CENTROIDS
    assert stats["n"] >= 2  # corpus spreads over multiple inverted lists


def test_embedding_near_dup_invariants(spark, sf_dir):
    rows = similarity.dedup_embedding_cosine(spark, sf_dir).collect()
    n_vecs = similarity._vectors(spark, sf_dir).count()
    assert len(rows) == n_vecs  # total assignment: every vector classified
    for r in rows:
        assert r["canonical_id"] <= r["vec_id"]
        assert r["is_duplicate"] == (r["canonical_id"] != r["vec_id"])
    # canonical vectors must themselves be non-duplicates OR point lower:
    # single-hop semantics allow a canonical to be a dup of a still-lower
    # id, but never of a higher one
    canon = {r["vec_id"]: r["canonical_id"] for r in rows}
    for r in rows:
        if r["is_duplicate"]:
            assert canon[r["canonical_id"]] <= r["canonical_id"]


def test_components_close_pairs_transitively(spark, sf_dir):
    """Connected components: every verified near-dup pair must share a
    component, labels are component minima, and the closure can only
    merge groups relative to single-hop canonicalization."""
    comp = {
        r["vec_id"]: r["component_id"]
        for r in similarity.dedup_components(spark, sf_dir).collect()
    }
    vecs = similarity._vectors(spark, sf_dir)
    pairs = similarity._lsh_verified_pairs(
        vecs, similarity.NEAR_DUP_THRESHOLD
    ).collect()
    for p in pairs:
        assert comp[p["vec_a"]] == comp[p["vec_b"]]
    assert all(lbl <= v for v, lbl in comp.items())
    n_components = len(set(comp.values()))
    n_single_hop = len(
        {
            r["canonical_id"]
            for r in similarity.dedup_embedding_cosine(spark, sf_dir).collect()
        }
    )
    assert n_components <= n_single_hop


def test_brute_force_query_bound_guard(spark, sf_dir):
    """ann_cosine_topk is O(q*n) by design; the guard must refuse a
    corpus-scale query batch before any job is launched."""
    import pytest
    from etl_pipeline_from_mongo_json_to_postgre_spark.operators.similarity import (
        MAX_BRUTE_FORCE_QUERIES,
        ann_cosine_topk,
    )

    with pytest.raises(ValueError, match="brute-force"):
        ann_cosine_topk(spark, sf_dir, n_queries=MAX_BRUTE_FORCE_QUERIES + 1)


def test_bigstar_components_on_pathological_graphs(spark):
    """Star contraction must be exact on shapes the LSH pair graph never
    produces: a long chain (worst case for label propagation), a giant
    star, a forest with singleton-free merge order, and an empty graph."""
    from etl_pipeline_from_mongo_json_to_postgre_spark.operators.similarity import (
        connected_components_bigstar,
    )

    def labels_of(edges):
        df = spark.createDataFrame(edges or [(0, 0)], "a long, b long")
        if not edges:
            df = df.where("a != a")
        out = connected_components_bigstar(df)
        return {r.vec_id: r.lbl for r in out.collect()}

    # 100-vertex chain: diameter 99, must still converge in O(log^2 n)
    chain = [(i, i + 1) for i in range(100)]
    got = labels_of(chain)
    assert got == {i: 0 for i in range(1, 101)} | {0: 0}

    # giant star centered on the LARGEST id (worst orientation)
    star = [(100, i) for i in range(100)]
    assert labels_of(star) == {i: 0 for i in range(1, 101)} | {0: 0}

    # two components + reversed/duplicated/self-loop edges
    messy = [(5, 3), (3, 5), (3, 1), (7, 7), (10, 12), (12, 11)]
    got = labels_of(messy)
    assert got == {3: 1, 5: 1, 1: 1, 10: 10, 11: 10, 12: 10}

    # empty edge set -> no labels
    assert labels_of([]) == {}


def test_hybrid_rerank_properties(spark, sf_dir):
    """The rerank stage may only PERMUTE the lexical candidate set that
    has embeddings: per query, reranks are 1..m, ordered by cosine desc
    (doc_id tie-break), and every row keeps its BM25 rank/score."""
    from etl_pipeline_from_mongo_json_to_postgre_spark.operators.curation_ext import (
        text_bm25_topk,
    )
    from etl_pipeline_from_mongo_json_to_postgre_spark.operators.similarity import (
        search_hybrid_rerank,
    )
    from etl_pipeline_from_mongo_json_to_postgre_spark.sources.parquet import (
        load_table,
    )

    lex = {(r.query_id, r.doc_id): (r.rank, r.score)
           for r in text_bm25_topk(spark, sf_dir).collect()}
    have_vec = {r.vec_id for r in
                load_table(spark, sf_dir, "embeddings").select("vec_id").collect()}
    rows = search_hybrid_rerank(spark, sf_dir).collect()
    assert rows
    by_q = {}
    for r in rows:
        assert (r.query_id, r.doc_id) in lex, "rerank invented a candidate"
        assert r.doc_id in have_vec
        assert lex[(r.query_id, r.doc_id)][0] == r.lex_rank
        assert abs(lex[(r.query_id, r.doc_id)][1] - r.bm25) < 1e-6
        assert -1.0 - 1e-9 <= r.cosine <= 1.0 + 1e-9
        by_q.setdefault(r.query_id, []).append(r)
    expected_m = {q: sum(1 for (qq, d) in lex if qq == q and d in have_vec)
                  for q in by_q}
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rerank)
        assert [r.rerank for r in rs] == list(range(1, expected_m[q] + 1))
        cosines = [r.cosine for r in rs]
        assert cosines == sorted(cosines, reverse=True)


class TestSemanticCellDedup:
    """SemDeDup (cluster-then-prune) semantics: candidates bounded by
    cell occupancy, cross-cell pairs unrepresentable, keep-first
    canonical rule consistent with the single-hop contract."""

    @pytest.fixture(scope="class")
    def sem(self, spark, sf_dir):
        return similarity.dedup_semantic_cells(spark, sf_dir).collect()

    def test_canonical_invariants(self, sem):
        by_id = {r["vec_id"]: r for r in sem}
        assert len(by_id) == len(sem)  # one row per vector
        for r in sem:
            assert r["canonical_id"] <= r["vec_id"]
            assert r["is_duplicate"] == (r["canonical_id"] != r["vec_id"])
            # single-hop keep-first: the canonical target must live in
            # the SAME cell (pairs are generated within cells only)
            assert by_id[r["canonical_id"]]["cluster_id"] == r["cluster_id"]

    def test_within_cell_rule_matches_brute_force(self, spark, sf_dir, sem):
        """Every marked duplicate must have an exact-cosine >= threshold
        partner with a smaller id IN ITS CELL, and its canonical must be
        the smallest such partner — recomputed brute force here."""
        vecs = similarity._vectors(spark, sf_dir)
        dots = similarity._matrix_dots(F.col("v"), similarity.CENTROIDS)
        assigned = vecs.select(
            "vec_id", "v", "nrm",
            F.array_position(dots, F.array_max(dots)).alias("cell"),
        )
        a = assigned.select(F.col("vec_id").alias("ia"), F.col("v").alias("va"),
                            F.col("nrm").alias("na"), F.col("cell").alias("ca"))
        b = assigned.select(F.col("vec_id").alias("ib"), F.col("v").alias("vb"),
                            F.col("nrm").alias("nb"), F.col("cell").alias("cb"))
        cos = similarity._dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
        brute_pairs = (
            a.crossJoin(b)
            .where((F.col("ca") == F.col("cb")) & (F.col("ia") < F.col("ib")))
            .where(F.round(cos, 6) >= similarity.NEAR_DUP_THRESHOLD)
            .select("ia", "ib")
            .collect()
        )
        min_partner = {}
        for p in brute_pairs:
            min_partner[p["ib"]] = min(min_partner.get(p["ib"], p["ia"]), p["ia"])
        for r in sem:
            want = min(r["vec_id"], min_partner.get(r["vec_id"], r["vec_id"]))
            assert r["canonical_id"] == want

    def test_plan_has_no_cross_cell_pair_generation(self, spark, sf_dir):
        """The pair join must be keyed on cluster_id (a cross-cell pair
        is unrepresentable) and the plan must contain no cartesian
        product — the SemDeDup candidate bound is structural, not a
        filter that an optimizer could reorder away."""
        from etl_pipeline_from_mongo_json_to_postgre_spark.storage import physical_plan

        plan = physical_plan(similarity.dedup_semantic_cells(spark, sf_dir))
        assert "CartesianProduct" not in plan
        assert "cluster_id" in plan  # join key reaches the physical join


class TestShardedTripletMining:
    """Batch-hard semantics: extremes are per-BATCH (never global), the
    pair join is keyed on batch_id, and the full corpus is the anchor
    set — the guard-free n x B path the brute entry's error points at."""

    @pytest.fixture(scope="class")
    def mined(self, spark, sf_dir):
        return similarity.emb_triplet_mining_sharded(spark, sf_dir).collect()

    def test_every_vector_is_an_anchor(self, spark, sf_dir, mined):
        n = similarity._vectors(spark, sf_dir).count()
        assert len(mined) == n
        assert len({r["anchor_id"] for r in mined}) == n

    def test_extremes_match_within_batch_brute_force(self, spark, sf_dir, mined):
        vecs = similarity._vectors(spark, sf_dir, "label")
        rows = vecs.collect()
        import math

        by_batch = {}
        for r in rows:
            by_batch.setdefault(r["vec_id"] // similarity.TRIPLET_BATCH_SIZE, []).append(r)
        by_anchor = {r["anchor_id"]: r for r in mined}
        checked = 0
        for batch in list(by_batch.values())[:3]:  # spot-check 3 batches
            for a in batch:
                best_pos, best_neg = None, None
                for t in batch:
                    if t["vec_id"] == a["vec_id"]:
                        continue
                    cos = round(
                        sum(x * y for x, y in zip(a["v"], t["v"]))
                        / (a["nrm"] * t["nrm"]), 6)
                    if t["label"] == a["label"]:
                        k = (cos, t["vec_id"])
                        if best_pos is None or k < best_pos:
                            best_pos = k
                    else:
                        k = (-cos, t["vec_id"])
                        if best_neg is None or k < best_neg:
                            best_neg = k
                got = by_anchor[a["vec_id"]]
                assert (got["pos_id"] is None) == (best_pos is None)
                assert (got["neg_id"] is None) == (best_neg is None)
                if best_pos:
                    assert got["pos_id"] == best_pos[1]
                    assert math.isclose(got["pos_cos"], best_pos[0], abs_tol=1e-6)
                if best_neg:
                    assert got["neg_id"] == best_neg[1]
                    assert math.isclose(got["neg_cos"], -best_neg[0], abs_tol=1e-6)
                checked += 1
        assert checked >= 50

    def test_plan_joins_on_batch_id_no_cartesian(self, spark, sf_dir):
        from etl_pipeline_from_mongo_json_to_postgre_spark.storage import physical_plan

        plan = physical_plan(similarity.emb_triplet_mining_sharded(spark, sf_dir))
        assert "CartesianProduct" not in plan
        assert "batch_id" in plan


class TestCellTripletMining:
    """Per-IVF-cell batch-hard mining: every vector is an anchor, both
    extremes come from the anchor's OWN cell, and the cell rule is the
    same max-dot assignment the rest of the IVF family uses."""

    @pytest.fixture(scope="class")
    def cells(self, spark, sf_dir):
        return similarity.emb_triplet_mining_cells(spark, sf_dir).collect()

    def test_full_corpus_anchors_and_extremes_stay_in_cell(
        self, spark, sf_dir, cells
    ):
        vecs = similarity._vectors(spark, sf_dir)
        n = vecs.count()
        assert len(cells) == n
        dots = similarity._matrix_dots(F.col("v"), similarity.CENTROIDS)
        cell_of = {
            r["vec_id"]: r["cell"]
            for r in vecs.select(
                "vec_id",
                F.array_position(dots, F.array_max(dots)).cast("long")
                .alias("cell"),
            ).collect()
        }
        for r in cells:
            assert r["cell_id"] == cell_of[r["anchor_id"]]
            for side in ("pos_id", "neg_id"):
                if r[side] is not None:
                    assert cell_of[r[side]] == r["cell_id"], (
                        f"{side} of anchor {r['anchor_id']} crossed cells")

    def test_margins_are_batch_hard_within_cell(self, spark, sf_dir, cells):
        """Spot-check one populated cell brute force: mined pos is the
        LOWEST same-label cosine, mined neg the HIGHEST other-label
        cosine, ties to lowest id."""
        import math

        vecs = similarity._vectors(spark, sf_dir, "label")
        dots = similarity._matrix_dots(F.col("v"), similarity.CENTROIDS)
        rows = vecs.select(
            "vec_id", "label", "v", "nrm",
            F.array_position(dots, F.array_max(dots)).cast("long")
            .alias("cell"),
        ).collect()
        by_cell = {}
        for r in rows:
            by_cell.setdefault(r["cell"], []).append(r)
        cell, members = max(by_cell.items(), key=lambda kv: len(kv[1]))
        assert len(members) >= 5
        by_anchor = {r["anchor_id"]: r for r in cells}
        for a in members:
            best_pos, best_neg = None, None
            for t in members:
                if t["vec_id"] == a["vec_id"]:
                    continue
                cos = round(
                    sum(x * y for x, y in zip(a["v"], t["v"]))
                    / (a["nrm"] * t["nrm"]), 6)
                if t["label"] == a["label"]:
                    k = (cos, t["vec_id"])
                    best_pos = k if best_pos is None or k < best_pos else best_pos
                else:
                    k = (-cos, t["vec_id"])
                    best_neg = k if best_neg is None or k < best_neg else best_neg
            got = by_anchor[a["vec_id"]]
            if best_pos:
                assert got["pos_id"] == best_pos[1]
                assert math.isclose(got["pos_cos"], best_pos[0], abs_tol=1e-6)
            else:
                assert got["pos_id"] is None
            if best_neg:
                assert got["neg_id"] == best_neg[1]
                assert math.isclose(got["neg_cos"], -best_neg[0], abs_tol=1e-6)
            else:
                assert got["neg_id"] is None


class TestIncSemanticDedup:
    """Incremental semantic dedup: batch x index within cells only —
    the canonical is always an INDEX id (never another arrival), and
    the verdicts match a brute-force within-cell batch-vs-index check."""

    def test_verdicts_match_brute_force_and_index_wins(self, spark, sf_dir):
        from etl_pipeline_from_mongo_json_to_postgre_spark.functions.sampling import (
            scrambled_bucket,
        )

        got = {
            r["vec_id"]: r
            for r in similarity.inc_semantic_dedup(spark, sf_dir).collect()
        }
        vecs = similarity._vectors(spark, sf_dir)
        dots = similarity._matrix_dots(F.col("v"), similarity.CENTROIDS)
        rows = vecs.select(
            "vec_id", "v", "nrm",
            F.array_position(dots, F.array_max(dots)).cast("long")
            .alias("cell"),
            (scrambled_bucket(F.col("vec_id"), similarity.INC_VEC_BATCH_MOD) == 0)
            .alias("is_batch"),
        ).collect()
        batch = [r for r in rows if r["is_batch"]]
        index_by_cell = {}
        for r in rows:
            if not r["is_batch"]:
                index_by_cell.setdefault(r["cell"], []).append(r)
        assert set(got) == {r["vec_id"] for r in batch}
        index_ids = {r["vec_id"] for r in rows if not r["is_batch"]}
        n_dups = 0
        for b in batch:
            want = None
            for i in index_by_cell.get(b["cell"], []):
                cos = round(
                    sum(x * y for x, y in zip(b["v"], i["v"]))
                    / (b["nrm"] * i["nrm"]), 6)
                if cos >= similarity.NEAR_DUP_THRESHOLD:
                    want = i["vec_id"] if want is None else min(want, i["vec_id"])
            r = got[b["vec_id"]]
            if want is None:
                assert not r["is_dup"] and r["canonical_id"] == b["vec_id"]
            else:
                assert r["is_dup"] and r["canonical_id"] == want
                assert r["canonical_id"] in index_ids  # index always wins
                n_dups += 1
        assert n_dups > 0, "fixture must produce some incremental dups"


class TestSemanticMultiProbe:
    """r11 multi-probe family: the candidate bound must stay STRUCTURAL
    under top-2 probing — the pair/probe joins key on the probed cell,
    so no cartesian can appear; and the probe set must contain exactly
    the primary plus the second-best cell under the shared rank rule."""

    def test_mp_plans_have_no_cartesian(self, spark, sf_dir):
        from etl_pipeline_from_mongo_json_to_postgre_spark.storage import physical_plan

        for fn, key in (
            (similarity.dedup_semantic_cells_mp, "probe_cell"),
            (similarity.inc_semantic_dedup_mp, "cell_id"),
            (similarity.sem_probe_eval, "probe_cell"),
        ):
            plan = physical_plan(fn(spark, sf_dir))
            assert "CartesianProduct" not in plan, fn.__name__
            assert key in plan, f"{fn.__name__}: join key missing from plan"

    def test_top2_rule_matches_rank_definition(self, spark, sf_dir):
        """_primary_cell/_top2_cells vs an independent numpy rank by
        (dot DESC, cell ASC) over the REAL corpus — the helper is the
        single source the oracles mirror, so it gets its own
        engine-independent check."""
        import numpy as np

        vecs = similarity._vectors(spark, sf_dir)
        dots_col = similarity._matrix_dots(F.col("v"), similarity.CENTROIDS)
        got = {
            r["vec_id"]: (r["c1"], r["c2"])
            for r in vecs.select(
                "vec_id", "v", dots_col.alias("dots")
            ).select(
                "vec_id", "v",
                similarity._primary_cell(F.col("dots")).alias("c1"),
                similarity._top2_cells(
                    F.col("dots"),
                    similarity._primary_cell(F.col("dots")),
                ).alias("c2"),
            ).collect()
        }
        emb = {
            r["vec_id"]: list(r["v"])
            for r in vecs.select("vec_id", "v").collect()
        }

        def _seq_dot(a, b):
            # same left-to-right sequential fold as similarity._dot —
            # BLAS pairwise/FMA summation (C @ v) can differ in the last
            # ulp and flip a near-tie between cells (ADVICE r11)
            s = 0.0
            for x, y in zip(a, b):
                s += x * y
            return s

        for vid, v in emb.items():
            d = np.array([_seq_dot(c, v) for c in similarity.CENTROIDS])
            order = np.lexsort((np.arange(len(d)), -d))  # dot DESC, cell ASC
            want = (int(order[0]) + 1, int(order[1]) + 1)  # 1-based
            assert got[vid] == want, f"vec {vid}: {got[vid]} != {want}"
