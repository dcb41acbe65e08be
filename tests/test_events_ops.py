"""asof_join + hierarchical_rollup edge semantics (operators/events)."""

from pyspark.sql import functions as F

from cordon_spark.operators.events import (
    asof_join,
    cohort_retention,
    event_transitions,
    funnel_steps,
    hierarchical_rollup,
    hopping_window_rollup,
)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, 100, 5), (2, 100, 10), (3, 100, 15), (4, 200, 7), (5, 300, 1)],
        "event_id long, user_id long, us long",
    )
    right = spark.createDataFrame(
        [(100, 5, 50.0), (100, 12, 120.0), (200, 9, 90.0)],
        "user_id long, us long, pv double",
    )
    got = {
        r.event_id: r.asof_pv
        for r in asof_join(left, right, key_col="user_id", ts_col="us",
                           value_cols=("pv",)).collect()
    }
    assert got[1] == 50.0   # inclusive tie: right at us=5 visible to left us=5
    assert got[2] == 50.0   # between updates -> earlier value
    assert got[3] == 120.0  # after second update
    assert got[4] is None   # left before any right row
    assert got[5] is None   # key with no right rows at all
    # partition-invariant: one keyed window, any input layout
    got2 = {
        r.event_id: r.asof_pv
        for r in asof_join(left.repartition(5), right.repartition(3),
                           key_col="user_id", ts_col="us",
                           value_cols=("pv",)).collect()
    }
    assert got == got2


def test_asof_join_multiple_value_cols(spark):
    left = spark.createDataFrame([(1, 7, 10)], "event_id long, user_id long, us long")
    right = spark.createDataFrame(
        [(7, 3, 1.5, "a")], "user_id long, us long, v double, tag string"
    )
    row = asof_join(left, right, key_col="user_id", ts_col="us",
                    value_cols=("v", "tag")).collect()[0]
    assert row.asof_v == 1.5 and row.asof_tag == "a"


def test_hierarchical_rollup_levels(spark):
    ev = spark.createDataFrame(
        [
            (1, "2026-01-01 01:00:00", "click", 1.0),
            (2, "2026-01-01 02:00:00", "click", 2.0),
            (3, "2026-01-01 03:00:00", "error", 4.0),
            (4, "2026-01-02 01:00:00", "click", 8.0),
        ],
        "event_id long, ts string, event_type string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    rows = hierarchical_rollup(ev).collect()
    by_key = {(r.bucket, r.event_type, r.gid): (r.n, r.value_sum) for r in rows}
    d0 = by_key[(20454, "click", 0)]
    assert d0 == (2, 3.0)
    # per-day subtotal (event_type rolled up -> gid 1)
    assert by_key[(20454, None, 1)] == (3, 7.0)
    assert by_key[(20455, None, 1)] == (1, 8.0)
    # grand total (gid 3)
    assert by_key[(None, None, 3)] == (4, 15.0)
    # one pass: exactly 3 leaf rows + 2 day rows + 1 total
    assert len(rows) == 6


def test_hopping_window_rollup(spark):
    """Each event lands in exactly window/hop overlapping windows;
    counts per window match a manual assignment."""
    ev = spark.createDataFrame(
        [(1, "2026-01-01 00:10:00", "click", 1.0),
         (2, "2026-01-01 00:50:00", "click", 2.0)],
        "event_id long, ts string, event_type string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    rows = hopping_window_rollup(ev, window_seconds=3600, hop_seconds=900).collect()
    per_event_windows = 3600 // 900
    assert sum(r.n for r in rows) == 2 * per_event_windows
    # the window starting at 00:00 contains both events
    base = {r.window_start_us: r.n for r in rows}
    epoch_2026 = 1767225600 * 1_000_000  # 2026-01-01 00:00:00 UTC in us
    assert base[epoch_2026] == 2


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def test_funnel_steps_order_matters(spark):
    """A step only counts when it happens STRICTLY AFTER the user's
    qualified previous step: u1 completes all 4 in order; u2 clicks
    BEFORE viewing (click must not count); u3 never signs up (nothing
    counts even though all later steps occur)."""
    ev = _ev(spark, [
        (1, "2026-01-01 00:00:00", 1, "signup", 0.0),
        (2, "2026-01-01 00:01:00", 1, "view", 0.0),
        (3, "2026-01-01 00:02:00", 1, "click", 0.0),
        (4, "2026-01-01 00:03:00", 1, "purchase", 0.0),
        (5, "2026-01-01 00:00:00", 2, "signup", 0.0),
        (6, "2026-01-01 00:01:00", 2, "click", 0.0),
        (7, "2026-01-01 00:02:00", 2, "view", 0.0),
        (8, "2026-01-01 00:00:00", 3, "view", 0.0),
        (9, "2026-01-01 00:01:00", 3, "click", 0.0),
        (10, "2026-01-01 00:02:00", 3, "purchase", 0.0),
    ])
    got = {r.step_name: r.users for r in funnel_steps(ev).collect()}
    assert got == {"signup": 2, "view": 2, "click": 1, "purchase": 1}


def test_funnel_steps_retry_after_failed_order(spark):
    """An out-of-order attempt doesn't burn the step: u2's early click
    is ignored but a LATER click (after the view) qualifies."""
    ev = _ev(spark, [
        (1, "2026-01-01 00:00:00", 2, "signup", 0.0),
        (2, "2026-01-01 00:01:00", 2, "click", 0.0),
        (3, "2026-01-01 00:02:00", 2, "view", 0.0),
        (4, "2026-01-01 00:03:00", 2, "click", 0.0),
    ])
    got = {r.step_name: r.users for r in funnel_steps(ev).collect()}
    assert got == {"signup": 1, "view": 1, "click": 1, "purchase": 0}


def test_cohort_retention_triangle(spark):
    ev = _ev(spark, [
        (1, "2026-01-01 10:00:00", 1, "view", 0.0),   # u1 cohort day d
        (2, "2026-01-02 10:00:00", 1, "view", 0.0),   # active d+1
        (3, "2026-01-02 11:00:00", 1, "view", 0.0),   # same day, once
        (4, "2026-01-02 10:00:00", 2, "view", 0.0),   # u2 cohort d+1
    ])
    rows = {(r.cohort_day, r.day_offset): r.active_users
            for r in cohort_retention(ev).collect()}
    d = 20454  # 2026-01-01 epoch days
    assert rows == {(d, 0): 1, (d, 1): 1, (d + 1, 0): 1}


def test_event_transitions_counts_and_prob(spark):
    ev = _ev(spark, [
        (1, "2026-01-01 00:00:00", 1, "view", 0.0),
        (2, "2026-01-01 00:01:00", 1, "click", 0.0),
        (3, "2026-01-01 00:02:00", 1, "view", 0.0),
        (4, "2026-01-01 00:03:00", 1, "view", 0.0),
        # user boundary: u2's first event must NOT chain from u1's last
        (5, "2026-01-01 00:04:00", 2, "purchase", 0.0),
    ])
    rows = {(r.src_type, r.dst_type): (r.n, r.prob_e4)
            for r in event_transitions(ev).collect()}
    assert rows == {
        ("view", "click"): (1, 5000),
        ("view", "view"): (1, 5000),
        ("click", "view"): (1, 10000),
    }


def test_fill_gaps_densifies_span(spark):
    """u1 active on days d and d+3: buckets d+1, d+2 appear zero-filled;
    nothing outside the user's own [first, last] span."""
    from cordon_spark.operators.events import fill_gaps
    ev = _ev(spark, [
        (1, "2026-01-01 10:00:00", 1, "view", 0.0),
        (2, "2026-01-01 11:00:00", 1, "view", 0.0),
        (3, "2026-01-04 10:00:00", 1, "view", 0.0),
        (4, "2026-01-02 10:00:00", 2, "view", 0.0),
    ])
    rows = {(r.user_id, r.bucket): r.n for r in fill_gaps(ev).collect()}
    d = 20454  # 2026-01-01 epoch days
    assert rows == {
        (1, d): 2, (1, d + 1): 0, (1, d + 2): 0, (1, d + 3): 1,
        (2, d + 1): 1,
    }


def test_last_touch_attribution_credits_preceding_touch(spark):
    """u1's purchase credits the most recent prior non-conversion
    (click); u2's purchase has no prior touch -> NULL bucket; a
    purchase immediately after another purchase still skips conversion
    events when looking back."""
    from cordon_spark.operators.events import last_touch_attribution
    ev = _ev(spark, [
        (1, "2026-01-01 00:00:00", 1, "view", 0.0),
        (2, "2026-01-01 00:01:00", 1, "click", 0.0),
        (3, "2026-01-01 00:02:00", 1, "purchase", 0.0),
        (4, "2026-01-01 00:03:00", 1, "purchase", 0.0),  # still credits click
        (5, "2026-01-01 00:00:00", 2, "purchase", 0.0),  # no prior touch
    ])
    rows = {r.touch_type: r.conversions
            for r in last_touch_attribution(ev).collect()}
    assert rows == {"click": 2, None: 1}


def test_interpolate_gaps_linear_and_edges(spark):
    """u1 observes 2.0 at day d and 8.0 at d+3: gap days interpolate to
    4.0 and 6.0; leading/trailing edges extend flat (u2)."""
    from cordon_spark.operators.events import interpolate_gaps
    ev = _ev(spark, [
        (1, "2026-01-01 10:00:00", 1, "view", 1.0),
        (2, "2026-01-01 11:00:00", 1, "view", 3.0),   # day d mean 2.0
        (3, "2026-01-04 10:00:00", 1, "view", 8.0),
        (4, "2026-01-02 10:00:00", 2, "view", 5.0),
    ])
    rows = {(r.user_id, r.bucket): (r.v, r.observed)
            for r in interpolate_gaps(ev).collect()}
    d = 20454
    assert rows == {
        (1, d): (2.0, True), (1, d + 1): (4.0, False),
        (1, d + 2): (6.0, False), (1, d + 3): (8.0, True),
        (2, d + 1): (5.0, True),
    }


def test_time_bucket_floor_semantics_pre_epoch(spark):
    """Bucket indexes FLOOR (matching SQL //), never truncate toward
    zero: a pre-1970 event must land in bucket -1, not share bucket 0
    with post-epoch events."""
    from cordon_spark.operators.events import fill_gaps
    ev = _ev(spark, [
        (1, "1969-12-31 12:00:00", 1, "view", 0.0),
        (2, "1970-01-01 12:00:00", 1, "view", 0.0),
    ])
    rows = {(r.user_id, r.bucket): r.n for r in fill_gaps(ev).collect()}
    assert rows == {(1, -1): 1, (1, 0): 1}


def test_funnel_latency_exact_percentiles(spark):
    """Two users complete signup->view with diffs 60s and 120s: median
    is the interpolated midpoint 90s (9e11 us e4-scaled); a pair no one
    completes is absent."""
    from cordon_spark.operators.events import funnel_latency
    ev = _ev(spark, [
        (1, "2026-01-01 00:00:00", 1, "signup", 0.0),
        (2, "2026-01-01 00:01:00", 1, "view", 0.0),
        (3, "2026-01-01 00:00:00", 2, "signup", 0.0),
        (4, "2026-01-01 00:02:00", 2, "view", 0.0),
    ])
    rows = {r.pair: (r.n_users, r.median_us_e4) for r in funnel_latency(ev).collect()}
    assert rows == {"signup->view": (2, 90_000_000 * 10000)}


def test_sessionize_chunked_equals_plain(spark):
    """Two-phase chunked sessionize must equal sessionize exactly —
    including sessions split by a chunk edge and sessions spanning
    entirely-empty chunks (chunk < gap case)."""
    import random
    from cordon_spark.operators.events import sessionize, sessionize_chunked
    rng = random.Random(7)
    rows, eid = [], 0
    for user in range(1, 6):
        t = rng.randint(0, 3600)
        for _ in range(rng.randint(5, 25)):
            # mixed small steps (within-session) and >30min jumps
            t += rng.choice([5, 60, 600, 2000, 4000, 90000])
            rows.append((eid, t, user, "view", float(rng.randint(0, 9))))
            eid += 1
    pdf = [(e, __import__("datetime").datetime(2026, 1, 1) +
            __import__("datetime").timedelta(seconds=t), u, ty, v)
           for e, t, u, ty, v in rows]
    ev = spark.createDataFrame(
        pdf, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )

    def canon(df):
        return sorted(
            (r.user_id, r.session_id, r.n_events, r.start_us, r.end_us, str(r.value_sum))
            for r in df.collect()
        )

    plain = canon(sessionize(ev))
    # chunk >> gap (normal), chunk just above gap, chunk < gap (stress)
    for chunk_s in (86_400, 3_600, 600):
        assert canon(sessionize_chunked(ev, chunk_seconds=chunk_s)) == plain, chunk_s


def test_sessionize_chunked_partitions_by_chunk(spark):
    """The heavy phase-1 window must partition by (user, chunk), not
    user alone — that's the whole skew defusal."""
    from cordon_spark.operators.events import sessionize_chunked
    ev = _ev(spark, [(1, "2026-01-01 00:00:00", 1, "view", 0.0)])
    plan = sessionize_chunked(ev)._jdf.queryExecution().executedPlan().toString()
    import re
    # the Window node's partition spec itself must carry _chunk — a
    # plain (user) window with _chunk merely projected elsewhere fails
    wins = re.findall(r"Window \[[^\]]*\], \[([^\]]*)\]", plan)
    assert any("_chunk" in spec for spec in wins), plan
