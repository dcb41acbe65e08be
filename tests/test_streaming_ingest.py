"""Streaming ingest -> snapshot catalog -> incremental rollup
(streaming/ingest.py): one append snapshot per micro-batch, rollup
kept fresh inline, and batch-id replay is a no-op (exactly-once)."""

import pandas as pd
from pyspark.sql import functions as F

from cordon_spark.sources.catalog import SnapshotCatalog
from cordon_spark.sources.rollup import IncrementalRollup
from cordon_spark.streaming.ingest import ingest_stream, read_appends, snapshot_sink


def _write_batch(path, rows):
    pdf = pd.DataFrame(rows, columns=["user_id", "value"])
    pdf["user_id"] = pdf["user_id"].astype("int64")
    pdf["value"] = pdf["value"].astype("float64")
    pdf.to_parquet(path)


def test_stream_to_snapshots_with_rollup(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    cat = SnapshotCatalog(tmp_path / "wh")
    mv = IncrementalRollup(cat, "events", "events_by_user", ["user_id"], ["value"])
    _write_batch(src / "b0.parquet", [(1, 1.5), (2, 2.5), (1, 3.0)])

    stream = spark.readStream.schema("user_id long, value double").parquet(str(src))
    q = ingest_stream(
        stream, cat, "events", rollup=mv,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()
        _write_batch(src / "b1.parquet", [(2, 0.5), (3, 9.0)])
        q.processAllAvailable()
    finally:
        q.stop()

    # one append snapshot per micro-batch, lineage marked
    sids = cat.snapshots("events")
    assert len(sids) == 2 and all(s.startswith("batch-") for s in sids)
    assert all(
        cat.manifest("events", s)["lineage"]["op"] == "stream_append" for s in sids
    )
    # table contents (append model: union of snapshots) == everything streamed
    assert read_appends(spark, cat, "events").count() == 5
    # rollup was refreshed inline and equals a batch recompute
    got = {
        r["user_id"]: (r["n"], str(r["sum_value"]))
        for r in cat.read(spark, "events_by_user").collect()
    }
    want_df = cat.read(spark, "events", sids[0]).unionByName(
        cat.read(spark, "events", sids[1])
    ).groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(30,6)")).alias("sum_value"),
    )
    want = {r["user_id"]: (r["n"], str(r["sum_value"])) for r in want_df.collect()}
    assert got == want


def test_batch_replay_is_exactly_once(spark, tmp_path):
    """A crashed-and-restarted stream replays the last batch with the
    SAME batch_id: the sink must not write a second snapshot nor
    double-fold the rollup."""
    cat = SnapshotCatalog(tmp_path / "wh")
    mv = IncrementalRollup(cat, "ev", "ev_by_user", ["user_id"], ["value"])
    sink = snapshot_sink(cat, "ev", rollup=mv)
    batch = spark.createDataFrame([(1, 2.0), (1, 3.0)], "user_id long, value double")

    sink(batch, 0)
    snaps_once = cat.snapshots("ev")
    rollup_once = [tuple(r) for r in cat.read(spark, "ev_by_user").collect()]
    rollup_sids_once = cat.snapshots("ev_by_user")

    sink(batch, 0)  # replay
    assert cat.snapshots("ev") == snaps_once
    assert cat.snapshots("ev_by_user") == rollup_sids_once  # refresh no-op
    assert [tuple(r) for r in cat.read(spark, "ev_by_user").collect()] == rollup_once

    sink(batch, 1)  # a genuinely new batch still lands
    assert len(cat.snapshots("ev")) == 2
    n, s = cat.read(spark, "ev_by_user").filter("user_id = 1").select(
        "n", "sum_value"
    ).collect()[0]
    assert (n, str(s)) == (4, "10.000000")


def test_compact_appends_folds_and_later_batches_append(spark, tmp_path):
    from cordon_spark.streaming.ingest import compact_appends

    cat = SnapshotCatalog(tmp_path / "wh")
    sink = snapshot_sink(cat, "ev")
    for i in range(3):
        sink(spark.createDataFrame([(i, float(i))], "user_id long, value double"), i)

    before = {tuple(r) for r in read_appends(spark, cat, "ev").collect()}
    m = compact_appends(spark, cat, "ev")
    assert m["rows"] == 3
    assert sorted(m["lineage"]["covered"]) == ["batch-000000", "batch-000001", "batch-000002"]
    # same logical contents, now scanned from the single base
    assert {tuple(r) for r in read_appends(spark, cat, "ev").collect()} == before

    # a post-compaction batch is still delta
    sink(spark.createDataFrame([(9, 9.0)], "user_id long, value double"), 3)
    after = {tuple(r) for r in read_appends(spark, cat, "ev").collect()}
    assert after == before | {(9, 9.0)}

    # chained compaction folds the prior base transitively
    m2 = compact_appends(spark, cat, "ev")
    assert m2["rows"] == 4
    assert "appends-compacted-000003" in m2["lineage"]["folded"]
    assert {tuple(r) for r in read_appends(spark, cat, "ev").collect()} == after


def test_rollup_ignores_compacted_base(spark, tmp_path):
    """compact_appends must not double-fold into an incremental rollup:
    the rollup's delta comes from the original appends, the compacted
    base is skipped like any rewrite."""
    from cordon_spark.streaming.ingest import compact_appends

    cat = SnapshotCatalog(tmp_path / "wh")
    mv = IncrementalRollup(cat, "ev", "ev_by_user", ["user_id"], ["value"])
    sink = snapshot_sink(cat, "ev", rollup=mv)
    sink(spark.createDataFrame([(1, 2.0), (1, 3.0)], "user_id long, value double"), 0)
    compact_appends(spark, cat, "ev")
    sink(spark.createDataFrame([(1, 5.0)], "user_id long, value double"), 1)
    n, s = cat.read(spark, "ev_by_user").filter("user_id = 1").select(
        "n", "sum_value"
    ).collect()[0]
    assert (n, str(s)) == (3, "10.000000")


def test_compact_appends_crash_leaves_table_intact(spark, tmp_path):
    """A compaction that dies before its manifest commit is invisible:
    the data directory may exist but without a manifest the snapshot
    doesn't, so read_appends still unions the original appends."""
    cat = SnapshotCatalog(tmp_path / "wh")
    sink = snapshot_sink(cat, "ev")
    for i in range(2):
        sink(spark.createDataFrame([(i, float(i))], "user_id long, value double"), i)
    before = {tuple(r) for r in read_appends(spark, cat, "ev").collect()}

    # simulate the crash window: data written, manifest never committed
    dead_dir = cat._data_dir("ev", "appends-compacted-000002")
    read_appends(spark, cat, "ev").coalesce(1).write.parquet(str(dead_dir))
    assert "appends-compacted-000002" not in cat.snapshots("ev")
    assert {tuple(r) for r in read_appends(spark, cat, "ev").collect()} == before

    # a retry after the crash commits cleanly over the leftover dir
    from cordon_spark.streaming.ingest import compact_appends
    m = compact_appends(spark, cat, "ev")
    assert m["rows"] == 2
    assert {tuple(r) for r in read_appends(spark, cat, "ev").collect()} == before
