"""Training-mixture operators: DSIR weights, classifier inference,
temperature mixing — crafted-frame behavior pins (the registry parity
sweep covers the real tables)."""

import pytest

from etl_pipeline_from_mongo_json_to_postgre_spark.operators import mixing


def _fold_hash(word: str) -> int:
    h = 7
    for ch in word:
        h = (h * 31 + ord(ch)) % 1_000_000_007
    return h


@pytest.fixture()
def docs(spark, monkeypatch):
    def _install(rows):
        df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
        monkeypatch.setattr(mixing, "load_table", lambda sp, sf, t: df)
        return df
    return _install


def test_importance_weights_point_toward_target(spark, docs):
    """Docs made of target-domain tokens must outweigh docs made of
    off-domain tokens; a doc mixing both sits between."""
    docs(
        [(1, "aa aa aa aa", "en", "s1"),
         (2, "aa aa aa aa", "en", "s1"),
         (3, "bb bb bb bb", "de", "s1"),
         (4, "bb bb bb bb", "de", "s1"),
         (5, "aa aa bb bb", "de", "s1"),   # mixed, off-target label
         (6, "aa aa aa aa", "de", "s1")]   # target-looking text, wrong lang
    )
    got = {r.doc_id: r for r in
           mixing.sample_importance_weights(spark, "unused").collect()}
    assert got[1].log_weight > 0 > got[3].log_weight
    assert got[3].log_weight < got[5].log_weight < got[1].log_weight
    # the weight scores TEXT, not the label: doc 6 scores like doc 1
    assert got[6].log_weight == got[1].log_weight
    assert got[1].n_tokens == 4


def test_classifier_score_matches_hand_computation(spark, docs):
    docs([(1, "aa bb aa", "en", "s1")])
    got = mixing.text_classifier_score(spark, "unused").collect()[0]

    def w(word):
        b = _fold_hash(word) % mixing.N_BUCKETS
        return (b + 1) * mixing._W_MULT % mixing._W_RANGE - (mixing._W_RANGE - 1) // 2

    expect = 2 * w("aa") + w("bb")
    assert got.sum_w == expect
    assert got.n_tokens == 3
    assert got.label_hq == (expect * 1000 > mixing._HQ_MEAN_MILLI * 3)


def test_temperature_mix_tempers_the_head(spark, docs):
    """400-token source vs 100-token source: raw shares 0.8/0.2 temper
    to 2/3 and 1/3 at alpha=0.5; the small domain's boost is 5/3."""
    rows = []
    for i in range(4):
        rows.append((i, " ".join(["tok"] * 100), "en", "big"))
    rows.append((10, " ".join(["tok"] * 100), "en", "small"))
    docs(rows)
    got = {r.source: r for r in
           mixing.sample_temperature_mix(spark, "unused").collect()}
    assert got["big"].p_raw == 0.8 and got["small"].p_raw == 0.2
    assert got["big"].p_temp == round(2 / 3, 6)
    assert got["small"].p_temp == round(1 / 3, 6)
    assert got["small"].boost == round((1 / 3) / 0.2, 4)
    assert got["big"].boost < 1 < got["small"].boost


def test_mixture_plan_gates_then_allocates(spark, docs):
    """Composition semantics: a domain whose docs all fail the
    classifier gate gets NO budget row; budgets across surviving
    domains sum to <= MIX_TOKEN_BUDGET and shares to ~1."""
    def w_sign(word):
        b = _fold_hash(word) % mixing.N_BUCKETS
        return (b + 1) * mixing._W_MULT % mixing._W_RANGE - (mixing._W_RANGE - 1) // 2

    # find one clearly-positive and one clearly-negative token
    pos = next(f"t{i}" for i in range(1000) if w_sign(f"t{i}") > 400)
    neg = next(f"t{i}" for i in range(1000) if w_sign(f"t{i}") < -400)
    rows = []
    for i in range(4):
        rows.append((i, " ".join([pos] * 50), "en", "good_src"))
    for i in range(4, 6):
        rows.append((i, " ".join([pos] * 30), "de", "mixed_src"))
    for i in range(6, 9):
        rows.append((i, " ".join([neg] * 40), "de", "junk_src"))
    docs(rows)
    got = {r.source: r for r in
           mixing.mixture_plan_summary(spark, "unused").collect()}
    assert "junk_src" not in got, "all-junk domain must be gated out"
    assert set(got) == {"good_src", "mixed_src"}
    assert got["good_src"].n_docs_kept == 4
    assert got["good_src"].n_tokens_kept == 200
    total_budget = sum(r.budget_tokens for r in got.values())
    assert total_budget <= mixing.MIX_TOKEN_BUDGET
    assert abs(sum(r.p_temp for r in got.values()) - 1.0) < 1e-5
    # the en-target corpus makes the en-source's kept docs score higher
    assert got["good_src"].mean_log_weight > got["mixed_src"].mean_log_weight


def test_shard_manifest_matches_written_files(spark, sf_dir, tmp_path):
    """The manifest IS the contract for the shard writer (VERDICT r6
    task 5): write_mixture_shards lays down shard=K/ directories whose
    per-(source, shard) doc and token counts reproduce
    mixture_shard_manifest exactly, membership is budget-respecting
    per source, and a second write is byte-for-byte deterministic in
    membership."""
    from pyspark.sql import functions as F

    manifest = {
        (r.source, r.shard): (r.n_docs, r.n_tokens)
        for r in mixing.mixture_shard_manifest(spark, sf_dir).collect()
    }
    assert manifest
    out = str(tmp_path / "shards")
    mixing.write_mixture_shards(spark, sf_dir, out)
    written = spark.read.parquet(out)
    got = {
        (r.source, r.shard): (r.n_docs, r.n_tokens)
        for r in written.groupBy("source", "shard")
        .agg(F.count("*").alias("n_docs"),
             F.sum("n_tokens").cast("bigint").alias("n_tokens"))
        .collect()
    }
    assert got == manifest
    # per-source totals respect the tempered budgets
    budgets = {r.source: r.budget_tokens
               for r in mixing.mixture_plan_summary(spark, sf_dir).collect()}
    per_src = written.groupBy("source").agg(
        F.sum("n_tokens").cast("bigint").alias("t")).collect()
    for r in per_src:
        assert r.t <= budgets[r.source], f"{r.source} over budget"
    # text rides along for the dataloader
    assert written.where(F.col("text").isNull()).count() == 0
    # determinism: rewriting yields the identical membership
    out2 = str(tmp_path / "shards2")
    mixing.write_mixture_shards(spark, sf_dir, out2)
    a = {tuple(r) for r in spark.read.parquet(out).select("doc_id", "shard").collect()}
    b = {tuple(r) for r in spark.read.parquet(out2).select("doc_id", "shard").collect()}
    assert a == b
