"""Semantic invariants of the incremental-load operators (oracle
parity is covered registry-wide by test_oracle_parity.py; these pin
the merge laws the oracle can't express)."""

from pyspark.sql import functions as F

from etl_pipeline_from_mongo_json_to_postgre_spark.operators import incremental as inc


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_upsert_latest_is_idempotent(spark, sf_dir):
    """Applying the same change batch twice must be a no-op: the
    re-applied rows tie with themselves and exactly one survives."""
    base = inc._orders(spark, sf_dir).withColumn("version", F.lit(1))
    changes = inc._changes(inc._orders(spark, sf_dir))
    once = inc.upsert_latest(base, changes, ["o_orderkey"])
    twice = inc.upsert_latest(once, changes, ["o_orderkey"])
    assert _sorted_rows(once) == _sorted_rows(twice)


def test_upsert_latest_keys_unique_and_versions_win(spark, sf_dir):
    out = inc.inc_upsert_latest(spark, sf_dir)
    n = out.count()
    assert out.select("o_orderkey").distinct().count() == n
    # every key in the update slice must carry the new version + status
    upd = out.where(
        (F.col("o_orderkey") % inc.UPD_MOD == 0)
        & (F.col("o_orderkey") < inc.INSERT_KEY_OFFSET)
    )
    assert upd.where((F.col("version") != 2) | (F.col("o_orderstatus") != "U")).count() == 0
    # untouched keys keep version 1
    keep = out.where(
        (F.col("o_orderkey") % inc.UPD_MOD != 0)
        & (F.col("o_orderkey") < inc.INSERT_KEY_OFFSET)
    )
    assert keep.where(F.col("version") != 1).count() == 0


def test_snapshot_diff_counts_match_slices(spark, sf_dir):
    base = inc._orders(spark, sf_dir)
    diff = inc.inc_snapshot_diff(spark, sf_dir).cache()
    by_type = dict(
        diff.groupBy("change_type").count().collect()
    )
    n_del = base.where(F.col("o_orderkey") % inc.DEL_MOD == 0).count()
    n_ins = base.where(F.col("o_orderkey") % inc.INS_MOD == 0).count()
    n_upd = base.where(
        (F.col("o_orderkey") % inc.UPD_MOD == 0)
        & (F.col("o_orderkey") % inc.DEL_MOD != 0)
    ).count()
    assert by_type.get("DELETE", 0) == n_del
    assert by_type.get("INSERT", 0) == n_ins
    assert by_type.get("UPDATE", 0) == n_upd
    diff.unpersist()


def test_oplog_apply_known_answer(spark):
    """Hand-built op-log with every tricky shape: partial updates keep
    the other field, delete erases, ops after the last delete rebuild,
    a trailing delete removes the key entirely."""
    rows = [
        # key 1: insert, partial status update, partial amount update
        (1, 10, "i", "new", 5.0),
        (1, 20, "u_status", "active", None),
        (1, 30, "u_amount", None, 9.5),
        # key 2: insert then delete -> absent
        (2, 11, "i", "new", 1.0),
        (2, 21, "d", None, None),
        # key 3: insert, delete, re-insert -> only post-delete state
        (3, 12, "i", "old", 2.0),
        (3, 22, "d", None, None),
        (3, 32, "i", "reborn", 3.0),
        # key 4: update with no prior insert after fence -> still a doc
        # (upsert semantics), fields only what the op set
        (4, 13, "u_status", "ghost", None),
    ]
    ops = spark.createDataFrame(
        rows, "doc_key int, seq int, op string, status string, amount double"
    )
    got = {
        r["doc_key"]: (r["status"], r["amount"], r["last_seq"], r["n_ops"])
        for r in inc.oplog_apply(ops).collect()
    }
    assert got == {
        1: ("active", 9.5, 30, 3),
        3: ("reborn", 3.0, 32, 1),
        4: ("ghost", None, 13, 1),
    }


def test_oplog_apply_single_exchange(spark, sf_dir):
    """All three window passes share one hash partitioning on the key —
    the physical plan must contain exactly ONE shuffle."""
    plan = inc.inc_oplog_apply(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    import re

    exchanges = re.findall(r"Exchange hashpartitioning\(doc_key", plan)
    assert len(exchanges) == 1, plan


def test_oplog_apply_no_key_ends_deleted(spark, sf_dir):
    """No emitted key's op-log may end with a delete."""
    final = inc.inc_oplog_apply(spark, sf_dir)
    log = inc._oplog(spark, sf_dir)
    from pyspark.sql.window import Window

    w = Window.partitionBy("doc_key").orderBy(F.desc("seq"))
    last_ops = (
        log.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_key", "op")
    )
    dead = last_ops.where(F.col("op") == "d").select("doc_key")
    assert final.join(dead, "doc_key", "inner").count() == 0


def test_scd2_intervals_are_well_formed(spark, sf_dir):
    out = inc.inc_scd2_intervals(spark, sf_dir).cache()
    # islands are 1..n consecutive per customer
    agg = out.groupBy("o_custkey").agg(
        F.min("island").alias("lo"),
        F.max("island").alias("hi"),
        F.count("*").alias("n"),
    )
    assert agg.where((F.col("lo") != 1) | (F.col("hi") != F.col("n"))).count() == 0
    # exactly one open (current) interval per customer; closed intervals
    # never end before they start
    assert (
        out.where(F.col("valid_to").isNull()).groupBy("o_custkey").count()
        .where(F.col("count") != 1).count() == 0
    )
    assert out.where(F.col("valid_to") < F.col("valid_from")).count() == 0
    # adjacent intervals chain: valid_to == next island's valid_from
    from pyspark.sql.window import Window

    w = Window.partitionBy("o_custkey").orderBy("island")
    chained = out.withColumn("nxt", F.lead("valid_from").over(w))
    assert chained.where(
        F.col("nxt").isNotNull() & (F.col("valid_to") != F.col("nxt"))
    ).count() == 0
    out.unpersist()


def test_oplog_apply_matches_sequential_fold(spark):
    """Property: the distributed window-based replay equals a sequential
    per-key fold of the same log (the semantics a single-node consumer
    would produce), across randomized op sequences."""
    from hypothesis import given, settings, strategies as st

    op_strat = st.tuples(
        st.integers(0, 4),                        # doc_key
        st.sampled_from(["i", "u_status", "u_amount", "d"]),
        st.sampled_from(["a", "b", "c"]),         # status payload
        st.floats(0, 100, allow_nan=False).map(lambda x: round(x, 2)),
    )

    def sequential(rows):
        state = {}
        for seq, (key, op, sv, av) in enumerate(rows):
            if op == "d":
                state.pop(key, None)
                continue
            cur = state.get(key, {"status": None, "amount": None, "n": 0})
            if op in ("i", "u_status"):
                cur["status"] = sv
            if op in ("i", "u_amount"):
                cur["amount"] = av
            cur["n"] += 1
            cur["last_seq"] = seq
            state[key] = cur
        return {
            k: (v["status"], v["amount"], v["last_seq"], v["n"])
            for k, v in state.items()
        }

    @settings(max_examples=8, deadline=None)
    @given(st.lists(op_strat, min_size=1, max_size=40))
    def check(rows):
        data = [
            (
                key,
                seq,
                op,
                sv if op in ("i", "u_status") else None,
                av if op in ("i", "u_amount") else None,
            )
            for seq, (key, op, sv, av) in enumerate(rows)
        ]
        ops = spark.createDataFrame(
            data, "doc_key int, seq int, op string, status string, amount double"
        )
        got = {
            r["doc_key"]: (r["status"], r["amount"], r["last_seq"], r["n_ops"])
            for r in inc.oplog_apply(ops).collect()
        }
        assert got == sequential(rows)

    check()
