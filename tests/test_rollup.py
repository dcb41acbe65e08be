"""Incremental materialized rollup (sources/rollup.py): delta-only
refresh equals a full recompute bit-for-bit, refresh is idempotent,
and rewrite snapshots (compaction/clustering) are never double-counted."""

import pytest
from pyspark.sql import functions as F

from cordon_spark.sources.catalog import SnapshotCatalog
from cordon_spark.sources.rollup import IncrementalRollup


def _mk_batch(spark, seed, n=200):
    return spark.range(0, n).select(
        (F.xxhash64(F.col("id") + seed) % 7).alias("k"),
        ((F.col("id") * 37 + seed) % 1000 / F.lit(100.0)).alias("v"),
    )


def _full_recompute(parts):
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    return df.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("v").cast("decimal(30,6)")).alias("sum_v"),
    )


def _as_dict(df):
    return {r["k"]: (r["n"], r["sum_v"]) for r in df.collect()}


def test_incremental_equals_full_recompute(spark, tmp_path):
    cat = SnapshotCatalog(tmp_path / "wh")
    mv = IncrementalRollup(cat, "events", "events_by_k", ["k"], ["v"])
    parts = []
    for i, sid in enumerate(["b1", "b2", "b3"]):
        part = _mk_batch(spark, seed=i * 1000)
        parts.append(part)
        cat.write_snapshot(part, "events", sid)
        m = mv.refresh(spark)
        assert m["lineage"]["covered"] == [f"b{j + 1}" for j in range(i + 1)]
        assert m["lineage"]["delta_snapshots"] == [sid]  # delta-only fold
        got = _as_dict(cat.read(spark, "events_by_k"))
        want = _as_dict(_full_recompute(parts))
        assert got == want  # decimal merge == full recompute, exactly

    # no new snapshots -> no-op, same snapshot returned, nothing written
    before = cat.snapshots("events_by_k")
    m2 = mv.refresh(spark)
    assert cat.snapshots("events_by_k") == before
    assert m2["snapshot_id"] == cat.current_snapshot("events_by_k")


def test_batched_refresh_folds_multiple_pending(spark, tmp_path):
    cat = SnapshotCatalog(tmp_path / "wh")
    mv = IncrementalRollup(cat, "ev", "ev_by_k", ["k"], ["v"])
    parts = [_mk_batch(spark, seed=s) for s in (1, 2, 3)]
    for sid, p in zip(["s1", "s2", "s3"], parts):
        cat.write_snapshot(p, "ev", sid)
    m = mv.refresh(spark)  # one refresh over three pending appends
    assert m["lineage"]["delta_snapshots"] == ["s1", "s2", "s3"]
    assert _as_dict(cat.read(spark, "ev_by_k")) == _as_dict(_full_recompute(parts))


def test_rewrite_snapshots_not_double_counted(spark, tmp_path):
    cat = SnapshotCatalog(tmp_path / "wh")
    mv = IncrementalRollup(cat, "ev", "ev_by_k", ["k"], ["v"])
    part = _mk_batch(spark, seed=9).repartition(6)
    cat.write_snapshot(part, "ev", "s1")
    mv.refresh(spark)
    # compaction, then clustering CHAINED on the compacted snapshot —
    # both rewrite the SAME rows; neither may re-enter the rollup
    cat.compact(spark, "ev", "s1")
    cat.cluster(spark, "ev", ["k"], n_files=2)
    assert mv.pending() == []  # rewrites skipped, even chained
    m = mv.refresh(spark)  # still a no-op
    assert m["lineage"]["delta_snapshots"] == ["s1"]
    assert _as_dict(cat.read(spark, "ev_by_k")) == _as_dict(_full_recompute([part]))


def test_refresh_with_no_source_raises(spark, tmp_path):
    cat = SnapshotCatalog(tmp_path / "wh")
    mv = IncrementalRollup(cat, "nope", "nope_by_k", ["k"])
    with pytest.raises(FileNotFoundError):
        mv.refresh(spark)
