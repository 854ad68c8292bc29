"""Behavioral invariants for the association/co-occurrence operators."""

from pyspark.sql import functions as F

from etl_pipeline_from_mongo_json_to_postgre_spark.operators.association import (
    copurchase_pairs,
)


def test_mega_basket_capped(spark):
    """A pathological basket with more items than BASKET_CAP must emit
    exactly C(cap, 2) pairs from its cap smallest items — the quadratic
    bound the 100 TB design depends on."""
    rows = [(1, p) for p in range(100)]
    df = spark.createDataFrame(rows, "l_orderkey int, l_partkey int")
    out = copurchase_pairs(df, min_count=1, cap=10)
    pairs = out.collect()
    assert len(pairs) == 45  # C(10,2)
    # only the 10 smallest items participate (deterministic truncation)
    items = {r.part_a for r in pairs} | {r.part_b for r in pairs}
    assert items == set(range(10))


def test_mega_basket_oracle_parity(spark):
    """The DuckDB oracle snippet (capped_basket_sql) must agree with the
    engine on a basket EXCEEDING the cap — the ADVICE r4 gap: oracles
    used to derive edges uncapped, so parity silently relied on TPC-H
    baskets staying small."""
    import duckdb

    from etl_pipeline_from_mongo_json_to_postgre_spark.operators.association import (
        capped_basket_sql,
    )

    rows = [(1, p) for p in range(80)] + [(2, 3), (2, 99), (1, 7)]
    df = spark.createDataFrame(rows, "l_orderkey int, l_partkey int")
    got = sorted(
        (r.part_a, r.part_b, r.n_orders)
        for r in copurchase_pairs(df, min_count=1).collect()
    )

    con = duckdb.connect()
    con.execute("CREATE TABLE lineitem(l_orderkey int, l_partkey int)")
    con.executemany("INSERT INTO lineitem VALUES (?, ?)", rows)
    want = sorted(
        tuple(r) for r in con.execute(f"""
            WITH parts AS (
                {capped_basket_sql('lineitem', 'l_orderkey', 'l_partkey')}
            )
            SELECT a.l_partkey, b.l_partkey, CAST(count(*) AS BIGINT)
            FROM parts a JOIN parts b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2
        """).fetchall()
    )
    assert got == want
    # basket 1 has 81 distinct items -> capped to its 50 smallest
    assert max(x for a, b, _ in got if True for x in (a, b)) == 99
    items_b1 = {x for a, b, n in got for x in (a, b)} - {99}
    assert max(items_b1) == 49


def test_pair_ordering_and_counts(spark):
    """Pairs are unordered (a < b) and counts accumulate across
    baskets; duplicate items within one basket count once."""
    rows = [
        (1, 5), (1, 3), (1, 3),   # dup item in basket
        (2, 3), (2, 5),
        (3, 3), (3, 5), (3, 9),
    ]
    df = spark.createDataFrame(rows, "l_orderkey int, l_partkey int")
    out = {(r.part_a, r.part_b): r.n_orders
           for r in copurchase_pairs(df, min_count=1).collect()}
    assert out[(3, 5)] == 3
    assert out[(3, 9)] == 1
    assert out[(5, 9)] == 1
    assert all(a < b for (a, b) in out)


def test_funnel_matches_bruteforce(spark):
    """ts_funnel_stages' filter-join-min chain must equal the obvious
    sequential per-user scan on randomized event sequences."""
    import random

    rng = random.Random(20260814)
    rows = []
    eid = 0
    for user in range(40):
        for _ in range(rng.randint(0, 12)):
            eid += 1
            rows.append(
                (eid, user,
                 rng.choice(["view", "click", "purchase", "error"]),
                 rng.randint(0, 10_000))
            )
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, event_type string, t_us bigint"
    )

    # brute force in plain Python
    by_user = {}
    for e_id, user, typ, t in rows:
        by_user.setdefault(user, []).append((t, e_id, typ))
    expected = {}
    for user, evs in by_user.items():
        evs.sort()
        t1 = min((t for t, _, ty in evs if ty == "view"), default=None)
        t2 = (min((t for t, _, ty in evs if ty == "click" and t > t1),
                  default=None) if t1 is not None else None)
        t3 = (min((t for t, _, ty in evs if ty == "purchase" and t > t2),
                  default=None) if t2 is not None else None)
        if t1 is not None:
            expected[user] = (t1, t2, t3)

    # re-run the operator's stage chain over the synthetic frame
    from pyspark.sql import functions as F

    ev = df.select("user_id", "event_type", F.col("t_us"))
    s1 = (ev.where(F.col("event_type") == "view")
            .groupBy("user_id").agg(F.min("t_us").alias("t_view_us")))
    s2 = (ev.where(F.col("event_type") == "click")
            .join(s1, "user_id").where(F.col("t_us") > F.col("t_view_us"))
            .groupBy("user_id").agg(F.min("t_us").alias("t_click_us")))
    s3 = (ev.where(F.col("event_type") == "purchase")
            .join(s2, "user_id").where(F.col("t_us") > F.col("t_click_us"))
            .groupBy("user_id").agg(F.min("t_us").alias("t_purchase_us")))
    got = {
        r.user_id: (r.t_view_us, r.t_click_us, r.t_purchase_us)
        for r in s1.join(s2, "user_id", "left").join(s3, "user_id", "left").collect()
    }
    assert got == expected


def test_association_rules_math(spark):
    """Hand-checked support/confidence/lift on a tiny basket set, plus
    directionality: confidence(a->b) != confidence(b->a) when the
    marginals differ."""
    from etl_pipeline_from_mongo_json_to_postgre_spark.operators import association

    rows = [
        (1, 3), (1, 5),
        (2, 3), (2, 5),
        (3, 3), (3, 5),
        (4, 3),
        (5, 9),
    ]
    df = spark.createDataFrame(rows, "l_orderkey int, l_partkey int")

    import unittest.mock as mock

    with mock.patch.object(association, "load_table", return_value=df), \
         mock.patch.object(association, "tune_for_oracle", lambda s: None):
        out = {(r.antecedent, r.consequent): r
               for r in association.basket_association_rules(spark, "x").collect()}
    # pair (3,5) co-occurs 3x of 5 baskets; item 3 in 4, item 5 in 3
    r = out[(3, 5)]
    assert (r.n_orders, r.n_ante, r.n_cons) == (3, 4, 3)
    assert r.support == round(3 / 5, 6)
    assert r.confidence == round(3 / 4, 6)
    assert r.lift == round((3 * 5) / (4 * 3), 6)
    rb = out[(5, 3)]
    assert rb.confidence == round(3 / 3, 6)  # direction matters
    assert rb.lift == r.lift                 # lift is symmetric
    assert (3, 9) not in out                 # below MIN_PAIR_COUNT
