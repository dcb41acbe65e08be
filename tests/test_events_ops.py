"""asof_join + hierarchical_rollup edge semantics (operators/events)."""

from pyspark.sql import functions as F

from cordon_spark.operators.events import (
    asof_join,
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
