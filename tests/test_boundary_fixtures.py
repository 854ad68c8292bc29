"""Adversarial oracle-shared-blind-spot fixtures (VERDICT r10 task 4).

Hash parity can never catch a rule BOTH engines encode the same way —
the r10 `sessions_concurrency_daily` dense-day bug lived in exactly that
class. Each test here plants a boundary pathology in a tiny events
table, asserts the HAND-COMPUTED expected output (independent of either
engine), and then re-checks engine/oracle parity on the same fixture so
the pinned rule is provably the shared one:

- ts_active_time_coverage: an activity interval spanning midnight must
  merge across the day boundary (epoch-minute sweep, no day bucketing),
  and TOUCHING intervals (next start == prior end) merge — the flag is
  strictly `start > prior_max_end`.
- events_attribution_last_touch: a touch EXACTLY at the 7-day horizon
  is attributed (<=, closed boundary); one microsecond past it is
  'direct'.
- ts_funnel_stages: stage ordering is STRICT (>) — a click sharing the
  first view's timestamp does not count, nor a purchase sharing the
  qualifying click's timestamp.
- ts_cohort_retention: weeks truncate to ISO Monday in both engines — a
  Sunday-23:59:59 signup lands in the SAME cohort week as that week's
  Monday-00:00:00 signup, and the following Monday is offset 1.

Extended beyond the four tasked entries with the same treatment:
as-of join (tie/zero-gap/NULL-keep), range join (closed 1h horizon at
the adjacent-bucket edge), tumbling windows ([start, end)), rolling
RANGE frame (closed trailing edge), lateness census (closed bucket
bounds), SCD2 (zero-length same-day interval, as-of instant
open/closed edges, status-reappearance island), w3 strict >400 carry,
sliding-window membership at the slide boundary.
"""

import datetime

import pyarrow as pa
import pyarrow.parquet as pq

from tests.oracle_compare import compare, duckdb_conn

UTC = datetime.timezone.utc


def _us(dt: datetime.datetime) -> int:
    return int(dt.replace(tzinfo=UTC).timestamp() * 1_000_000)


def _write_events(tmp_path, rows):
    """rows: (event_id, ts, user_id, event_type, value)."""
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def _parity(spark, sf_dir, name):
    import __spark_entry__ as e

    q, o = e.queries(), e.oracle_sql()
    con = duckdb_conn(sf_dir)
    try:  # close even when compare raises (ADVICE r11: walrus leaked the con)
        ok, msg = compare(q[name](spark, sf_dir), con, o[name])
    finally:
        con.close()
    assert ok, f"{name}: {msg}"


def test_coverage_interval_spanning_midnight_merges(spark, tmp_path):
    """Three planted users, all rules hand-computed:
    - user 1: events 23:50 and 00:05 (+1 day) — the intervals
      [23:50, 00:20) and [00:05, 00:35) overlap ACROSS midnight; a
      day-bucketed implementation would split them. One visit,
      00:35 - 23:50 = 45 covered minutes.
    - user 2: second event exactly 30 min after the first — its start
      EQUALS the prior interval's end; strict `>` means touching
      intervals MERGE. One visit, 60 minutes.
    - user 3: second event 31 min after the first — strictly past the
      end. Two visits, 30 + 30 = 60 minutes."""
    d1 = datetime.datetime(2024, 3, 1, 23, 50, 0)
    d2 = datetime.datetime(2024, 3, 2, 0, 5, 0)
    t = datetime.datetime(2024, 3, 5, 10, 0, 0)
    rows = [
        (1, d1, 1, "click", 1.0),
        (2, d2, 1, "click", 1.0),
        (3, t, 2, "view", 1.0),
        (4, t + datetime.timedelta(minutes=30), 2, "view", 1.0),
        (5, t, 3, "view", 1.0),
        (6, t + datetime.timedelta(minutes=31), 3, "view", 1.0),
    ]
    sf = _write_events(tmp_path, rows)

    from etl_pipeline_from_mongo_json_to_postgre_spark.operators.timeseries import (
        ts_active_time_coverage,
    )

    out = {r.user_id: (r.n_visits, r.covered_minutes)
           for r in ts_active_time_coverage(spark, sf).collect()}
    assert out[1] == (1, 45), "midnight-spanning intervals must merge"
    assert out[2] == (1, 60), "touching intervals (start == prior end) merge"
    assert out[3] == (2, 60), "a 1-minute gap splits the visit"
    _parity(spark, sf, "ts_active_time_coverage")


def test_attribution_touch_exactly_at_horizon(spark, tmp_path):
    """The 7-day lookback is CLOSED at the horizon: purchase minus
    touch == exactly 7 days attributes to the touch; one microsecond
    more is 'direct'.
    - user 1: click at t0, purchase (10.0) at t0 + 7d exactly -> click.
    - user 2: view at t0, purchase (5.0) at t0 + 7d + 1us -> direct."""
    t0 = datetime.datetime(2024, 3, 1, 12, 0, 0)
    horizon = datetime.timedelta(days=7)
    rows = [
        (1, t0, 1, "click", 1.0),
        (2, t0 + horizon, 1, "purchase", 10.0),
        (3, t0, 2, "view", 1.0),
        (4, t0 + horizon + datetime.timedelta(microseconds=1), 2,
         "purchase", 5.0),
    ]
    sf = _write_events(tmp_path, rows)

    from etl_pipeline_from_mongo_json_to_postgre_spark.operators.timeseries import (
        events_attribution_last_touch,
    )

    out = {r.channel: (r.n_purchases, r.revenue)
           for r in events_attribution_last_touch(spark, sf).collect()}
    assert out == {"click": (1, 10.0), "direct": (1, 5.0)}, (
        "horizon must be closed (<=): exactly-7d attributes, 7d+1us is direct")
    _parity(spark, sf, "events_attribution_last_touch")


def test_funnel_same_timestamp_stage_ties(spark, tmp_path):
    """Stage progression is STRICTLY later (>), so a same-timestamp
    next stage never counts:
    - user 1: view@t, click@t (tie -> skipped), click@t+2s (counts),
      purchase@t+2s (ties the qualifying click -> skipped),
      purchase@t+5s (counts).
    - user 2: view@t, click@t only -> click NULL, and the purchase@t+10s
      can never qualify (no qualifying click) -> NULL."""
    t = datetime.datetime(2024, 3, 1, 9, 0, 0)
    s = datetime.timedelta(seconds=1)
    rows = [
        (1, t, 1, "view", 1.0),
        (2, t, 1, "click", 1.0),
        (3, t + 2 * s, 1, "click", 1.0),
        (4, t + 2 * s, 1, "purchase", 1.0),
        (5, t + 5 * s, 1, "purchase", 1.0),
        (6, t, 2, "view", 1.0),
        (7, t, 2, "click", 1.0),
        (8, t + 10 * s, 2, "purchase", 1.0),
    ]
    sf = _write_events(tmp_path, rows)

    from etl_pipeline_from_mongo_json_to_postgre_spark.operators.timeseries import (
        ts_funnel_stages,
    )

    out = {r.user_id: (r.t_view_us, r.t_click_us, r.t_purchase_us)
           for r in ts_funnel_stages(spark, sf).collect()}
    assert out[1] == (_us(t), _us(t + 2 * s), _us(t + 5 * s)), (
        "tied click/purchase must be skipped; the next strict one counts")
    assert out[2] == (_us(t), None, None), (
        "a click tying the first view never qualifies, so neither can "
        "the purchase")
    _parity(spark, sf, "ts_funnel_stages")


def test_cohort_week_boundary_signup(spark, tmp_path):
    """2024-03-04 is a Monday. Both a Monday-00:00:00 signup (user 1)
    and a Sunday-23:59:59 signup SIX DAYS LATER (user 2) belong to the
    SAME ISO cohort week 2024-03-04; activity on the following Monday
    00:00:00 is week_offset 1 for both."""
    mon = datetime.datetime(2024, 3, 4, 0, 0, 0)
    sun_end = datetime.datetime(2024, 3, 10, 23, 59, 59)
    next_mon = datetime.datetime(2024, 3, 11, 0, 0, 0)
    rows = [
        (1, mon, 1, "view", 1.0),
        (2, sun_end, 1, "view", 1.0),       # same week -> offset 0
        (3, next_mon, 1, "view", 1.0),      # offset 1
        (4, sun_end, 2, "view", 1.0),       # signup at week's last second
        (5, next_mon, 2, "view", 1.0),      # offset 1
    ]
    sf = _write_events(tmp_path, rows)

    from etl_pipeline_from_mongo_json_to_postgre_spark.operators.timeseries import (
        ts_cohort_retention,
    )

    wk = datetime.date(2024, 3, 4)
    out = {(r.cohort_week, r.week_offset): r.n_users
           for r in ts_cohort_retention(spark, sf).collect()}
    assert out == {(wk, 0): 2, (wk, 1): 2}, (
        "Sunday-23:59:59 and Monday-00:00:00 signups share the ISO "
        "Monday cohort week; next Monday is offset 1")
    _parity(spark, sf, "ts_cohort_retention")


def test_asof_join_tie_and_no_prior_view(spark, tmp_path):
    """As-of semantics at the boundary: a view at EXACTLY the purchase
    timestamp matches (\"at or before\" is closed, gap 0); among
    same-timestamp views the LARGEST event_id wins (the engine's
    (ts, tag, event_id) ordering and the oracle's max(event_id)
    pre-collapse encode the same pick); a purchase with no prior view
    carries NULLs, never drops."""
    t0 = datetime.datetime(2024, 3, 1, 12, 0, 0)
    rows = [
        (1, t0, 1, "view", 1.0),
        (2, t0, 1, "view", 1.0),       # same-ts twin: id 2 must win
        (3, t0, 1, "purchase", 9.0),   # tied with its views: gap 0
        (4, t0 - datetime.timedelta(hours=1), 2, "purchase", 5.0),
        (5, t0, 2, "view", 1.0),       # AFTER user 2's purchase
    ]
    sf = _write_events(tmp_path, rows)

    from etl_pipeline_from_mongo_json_to_postgre_spark.operators.analytics import (
        j5_asof_join,
    )

    out = {r.purchase_id: (r.view_event_id, r.gap_us)
           for r in j5_asof_join(spark, sf).collect()}
    assert out[3] == (2, 0), (
        "a view AT the purchase ts matches with gap 0, larger id wins ties")
    assert out[4] == (None, None), "no prior view -> NULL sides, row kept"
    _parity(spark, sf, "j5_asof_join")


def test_range_join_closed_horizon(spark, tmp_path):
    """The 1-hour range-join horizon is CLOSED: a pair exactly 1 hour
    apart qualifies (and necessarily spans two adjacent buckets, so
    the bucket trick must surface it); one microsecond more does not."""
    t0 = datetime.datetime(2024, 3, 1, 12, 0, 0)
    us = datetime.timedelta(microseconds=1)
    rows = [
        (6, t0, 3, "view", 1.0),
        (7, t0 + datetime.timedelta(hours=1), 3, "view", 1.0),
        (8, t0 + datetime.timedelta(hours=2) + us, 3, "view", 1.0),
        (9, t0, 4, "view", 1.0),
        (10, t0 + datetime.timedelta(hours=1) + us, 4, "view", 1.0),
    ]
    sf = _write_events(tmp_path, rows)

    from etl_pipeline_from_mongo_json_to_postgre_spark.operators.analytics import (
        j6_range_join,
    )

    pairs = {(r.a_id, r.b_id): r.gap_us
             for r in j6_range_join(spark, sf).collect()}
    assert pairs == {(6, 7): 3_600_000_000}, (
        "exactly-1h pair is in (closed horizon, adjacent buckets); "
        "1h+1us pairs are out")
    _parity(spark, sf, "j6_range_join")


def test_tumbling_window_start_inclusive(spark, tmp_path):
    """Tumbling windows are [start, end): an event at EXACTLY the hour
    boundary belongs to the window it starts, not the one it ends."""
    rows = [
        (1, datetime.datetime(2024, 3, 1, 9, 59, 59, 999999), 1, "view", 1.0),
        (2, datetime.datetime(2024, 3, 1, 10, 0, 0), 1, "view", 1.0),
        (3, datetime.datetime(2024, 3, 1, 10, 59, 59, 999999), 1, "view", 1.0),
        (4, datetime.datetime(2024, 3, 1, 11, 0, 0), 1, "view", 1.0),
    ]
    sf = _write_events(tmp_path, rows)

    from etl_pipeline_from_mongo_json_to_postgre_spark.operators.analytics import (
        tumbling_window_agg,
    )

    out = {r.window_start.replace(tzinfo=None): r.cnt
           for r in tumbling_window_agg(spark, sf).collect()}
    assert out == {
        datetime.datetime(2024, 3, 1, 9, 0): 1,
        datetime.datetime(2024, 3, 1, 10, 0): 2,
        datetime.datetime(2024, 3, 1, 11, 0): 1,
    }
    _parity(spark, sf, "tumbling_window_agg")


def test_rolling_range_frame_inclusive_edge(spark, tmp_path):
    """The trailing 1-hour RANGE frame is closed at its trailing edge:
    an event exactly 1 hour older is counted; one microsecond older is
    not. First event's lag gap is NULL."""
    t0 = datetime.datetime(2024, 3, 1, 9, 0, 0)
    rows = [
        (1, t0, 1, "view", 1.0),
        (2, t0 + datetime.timedelta(hours=1), 1, "view", 2.0),
        (3, t0 + datetime.timedelta(hours=2, microseconds=1), 1,
         "view", 4.0),
    ]
    sf = _write_events(tmp_path, rows)

    from etl_pipeline_from_mongo_json_to_postgre_spark.operators.timeseries import (
        ts_rolling_stats,
    )

    out = {r.event_id: (r.n_1h, r.sum_1h, r.gap_us)
           for r in ts_rolling_stats(spark, sf).collect()}
    assert out[1] == (1, 1.0, None)
    assert out[2] == (2, 3.0, 3_600_000_000), (
        "exactly-1h-older event is inside the closed trailing frame")
    assert out[3] == (1, 4.0, 3_600_000_001), (
        "1h+1us-older event is outside")
    _parity(spark, sf, "ts_rolling_stats")


def test_lateness_bucket_edges(spark, tmp_path):
    """Lateness buckets are closed at their upper bounds: lateness 0 is
    in_order, EXACTLY 60s is '<=60s', 60s+1us falls to '<=10m'.
    Arrival order is event_id; the running max of event time defines
    lateness."""
    t = datetime.datetime(2024, 3, 1, 12, 0, 0)
    rows = [
        (1, t, 1, "view", 1.0),                                    # rm=t, 0
        (2, t - datetime.timedelta(seconds=60), 1, "view", 1.0),   # 60s
        (3, t - datetime.timedelta(seconds=60, microseconds=1), 1,
         "view", 1.0),                                             # 60s+1us
        (4, t, 1, "view", 1.0),                                    # 0
    ]
    sf = _write_events(tmp_path, rows)

    from etl_pipeline_from_mongo_json_to_postgre_spark.operators.timeseries import (
        events_lateness_census,
    )

    out = {r.label: (r.n_events, r.share, r.max_lateness_s)
           for r in events_lateness_census(spark, sf).collect()}
    assert out == {
        "in_order": (2, 0.5, 0.0),
        "<=60s": (1, 0.25, 60.0),
        "<=10m": (1, 0.25, 60.000001),
    }
    _parity(spark, sf, "events_lateness_census")


def _write_orders(tmp_path, rows):
    """rows: (o_orderkey, o_custkey, o_orderstatus, o_totalprice,
    o_orderdate)."""
    tbl = pa.table(
        {
            "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
            "o_orderstatus": pa.array([r[2] for r in rows], pa.string()),
            "o_totalprice": pa.array([r[3] for r in rows], pa.float64()),
            "o_orderdate": pa.array([r[4] for r in rows], pa.timestamp("us")),
            "o_orderpriority": pa.array(["1-URGENT"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "orders.parquet"))
    return str(tmp_path)


def test_scd2_same_day_change_and_asof_edge(spark, tmp_path):
    """SCD2 boundary rules, hand-computed:
    - cust 1: status change exactly ON the AS-OF date (1998-06-15) —
      the closing interval's valid_to == T is EXCLUDED (valid_to > T
      strict) and the opening interval's valid_from == T is INCLUDED
      (valid_from <= T closed): as-of returns the NEW status.
    - cust 2: two different-status orders on the SAME day produce a
      ZERO-LENGTH interval (valid_from == valid_to), kept, never
      merged or dropped; as-of never matches it.
    - cust 3: a status REAPPEARING (O -> F -> O) opens a third island —
      islands are runs, not distinct values."""
    d = datetime.datetime
    rows = [
        (1, 1, "O", 10.0, d(1998, 6, 10)),
        (2, 1, "F", 10.0, d(1998, 6, 15)),
        (3, 2, "O", 10.0, d(1998, 6, 1)),
        (4, 2, "F", 10.0, d(1998, 6, 1)),
        (5, 3, "O", 10.0, d(1998, 6, 1)),
        (6, 3, "F", 10.0, d(1998, 6, 5)),
        (7, 3, "O", 10.0, d(1998, 6, 10)),
    ]
    sf = _write_orders(tmp_path, rows)

    from etl_pipeline_from_mongo_json_to_postgre_spark.operators.incremental import (
        inc_scd2_as_of,
        inc_scd2_intervals,
    )

    def naive(ts):
        return ts.replace(tzinfo=None) if ts is not None else None

    iv = {(r.o_custkey, r.island): (r.o_orderstatus, naive(r.valid_from),
                                    naive(r.valid_to), r.n_orders)
          for r in inc_scd2_intervals(spark, sf).collect()}
    assert iv == {
        (1, 1): ("O", d(1998, 6, 10), d(1998, 6, 15), 1),
        (1, 2): ("F", d(1998, 6, 15), None, 1),
        (2, 1): ("O", d(1998, 6, 1), d(1998, 6, 1), 1),   # zero-length
        (2, 2): ("F", d(1998, 6, 1), None, 1),
        (3, 1): ("O", d(1998, 6, 1), d(1998, 6, 5), 1),
        (3, 2): ("F", d(1998, 6, 5), d(1998, 6, 10), 1),
        (3, 3): ("O", d(1998, 6, 10), None, 1),           # reappearance
    }

    asof = {r.o_custkey: r.o_orderstatus
            for r in inc_scd2_as_of(spark, sf).collect()}
    assert asof == {1: "F", 2: "F", 3: "O"}, (
        "interval closing AT the as-of instant is out; the one opening "
        "AT it is in")
    _parity(spark, sf, "inc_scd2_intervals")
    _parity(spark, sf, "inc_scd2_as_of")


def test_w3_big_value_threshold_strict(spark, tmp_path):
    """last_big_value carries values STRICTLY above 400: exactly 400.0
    never enters the carry; 400.000001 does. percent_rank/cume_dist
    hand-computed for the 3-row partition."""
    t = datetime.datetime(2024, 3, 1, 9, 0, 0)
    s = datetime.timedelta(seconds=1)
    rows = [
        (1, t, 1, "view", 400.0),
        (2, t + s, 1, "view", 400.000001),
        (3, t + 2 * s, 1, "view", 1.0),
    ]
    sf = _write_events(tmp_path, rows)

    from etl_pipeline_from_mongo_json_to_postgre_spark.operators.analytics import (
        w3_distribution_funcs,
    )

    out = {r.event_id: (r.pr, r.cd, r.last_big_value)
           for r in w3_distribution_funcs(spark, sf).collect()}
    # value order: 1.0 (e3), 400.0 (e1), 400.000001 (e2)
    assert out[3] == (0.0, 1 / 3, 400.000001)   # time-last row carries e2
    assert out[1] == (0.5, 2 / 3, None), (
        "exactly 400.0 is NOT big (strict >), so e1 carries nothing")
    assert out[2] == (1.0, 1.0, 400.000001)
    _parity(spark, sf, "w3_distribution_funcs")


def test_sliding_window_membership_at_slide_boundary(spark, tmp_path):
    """1h windows sliding every 30min: an event EXACTLY on a slide
    boundary (10:30:00) belongs to the windows starting 10:00 and
    10:30 — never three; one microsecond earlier shifts membership
    back to (09:30, 10:00)."""
    rows = [
        (1, datetime.datetime(2024, 3, 1, 10, 30, 0), 1, "view", 1.0),
        (2, datetime.datetime(2024, 3, 1, 10, 29, 59, 999999), 1,
         "view", 1.0),
    ]
    sf = _write_events(tmp_path, rows)

    from etl_pipeline_from_mongo_json_to_postgre_spark.operators.analytics import (
        sliding_window_agg,
    )

    out = {r.window_start.replace(tzinfo=None): r.cnt
           for r in sliding_window_agg(spark, sf).collect()}
    assert out == {
        datetime.datetime(2024, 3, 1, 9, 30): 1,
        datetime.datetime(2024, 3, 1, 10, 0): 2,
        datetime.datetime(2024, 3, 1, 10, 30): 1,
    }
    _parity(spark, sf, "sliding_window_agg")
