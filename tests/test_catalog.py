"""Snapshot catalog: atomic commit, time travel, idempotent resume
(the analog of the reference benchmark's --resume,
benchmark/evaluate.py:898-965)."""

import pandas as pd
import pytest

from cordon_spark.config import AnalysisConfig
from cordon_spark.plans.pipeline import analyze_transcripts
from cordon_spark.sources.catalog import SnapshotCatalog


def test_write_read_roundtrip(spark, tmp_path):
    cat = SnapshotCatalog(tmp_path / "wh")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    m = cat.write_snapshot(df, "t1", "s1")
    assert m["rows"] == 2
    assert cat.current_snapshot("t1") == "s1"
    got = cat.read(spark, "t1").orderBy("id").collect()
    assert [(r.id, r.v) for r in got] == [(1, "a"), (2, "b")]


def test_snapshot_isolation_and_time_travel(spark, tmp_path):
    cat = SnapshotCatalog(tmp_path / "wh")
    cat.write_snapshot(spark.createDataFrame([(1,)], "id long"), "t", "s1")
    cat.write_snapshot(spark.createDataFrame([(2,), (3,)], "id long"), "t", "s2")
    assert cat.current_snapshot("t") == "s2"
    assert cat.read(spark, "t").count() == 2
    assert cat.read(spark, "t", "s1").count() == 1  # time travel
    assert cat.snapshots("t") == ["s1", "s2"]


def test_missing_table_raises(spark, tmp_path):
    cat = SnapshotCatalog(tmp_path / "wh")
    with pytest.raises(FileNotFoundError):
        cat.read(spark, "nope")


def test_pipeline_resume_idempotent(spark, tiny_transcripts, tmp_path):
    pdf, _ = tiny_transcripts
    df = spark.createDataFrame(pdf)
    cfg = AnalysisConfig()
    cat = SnapshotCatalog(tmp_path / "wh")

    res1 = analyze_transcripts(spark, df, cfg, catalog=cat, run_id="r1", resume=True)
    blocks1 = sorted(
        (r.conv_id, r.start_idx, r.end_idx, round(r.max_score, 6))
        for r in res1.blocks.collect()
    )
    counts1 = dict(res1.counts)

    # resume: all stages must be read back, not recomputed
    res2 = analyze_transcripts(spark, df, cfg, catalog=cat, run_id="r1", resume=True)
    blocks2 = sorted(
        (r.conv_id, r.start_idx, r.end_idx, round(r.max_score, 6))
        for r in res2.blocks.collect()
    )
    assert blocks1 == blocks2
    assert counts1 == res2.counts
    assert res2.metrics["scored_windows"].get("resumed") == 1.0
    assert res2.metrics["blocks"].get("resumed") == 1.0
    # sink snapshots committed exactly once
    assert cat.snapshots("anomalous_turns") == ["r1-anomalous_turns"]

    # kill-and-rerun: drop a downstream stage, upstream stays cached
    cat.drop_snapshot("blocks", "r1-blocks")
    res3 = analyze_transcripts(spark, df, cfg, catalog=cat, run_id="r1", resume=True)
    blocks3 = sorted(
        (r.conv_id, r.start_idx, r.end_idx, round(r.max_score, 6))
        for r in res3.blocks.collect()
    )
    assert blocks3 == blocks1
    assert res3.metrics["scored_windows"].get("resumed") == 1.0  # upstream reused


def test_lineage_recorded(spark, tiny_transcripts, tmp_path):
    pdf, _ = tiny_transcripts
    df = spark.createDataFrame(pdf)
    cat = SnapshotCatalog(tmp_path / "wh")
    analyze_transcripts(spark, df, AnalysisConfig(), catalog=cat, run_id="r9")
    man = cat.manifest("scored_windows", "r9-scored_windows")
    parts = man["lineage"]["partitions"]
    assert parts and sum(p["rows"] for p in parts) == man["rows"]


def test_mid_write_kill_recovers(spark, tiny_transcripts, tmp_path):
    """Chaos case for the manifest-commit-after-data invariant: a kill
    MID-PARQUET-WRITE leaves a truncated data dir with NO manifest.
    Because resume trusts only the manifest (has_snapshot), the stage
    must be recomputed — overwriting the garbage — and the rerun's
    output must equal an uninterrupted run's."""
    import shutil

    pdf, _ = tiny_transcripts
    df = spark.createDataFrame(pdf)
    cfg = AnalysisConfig()
    cat = SnapshotCatalog(tmp_path / "wh")

    res1 = analyze_transcripts(spark, df, cfg, catalog=cat, run_id="r1", resume=True)
    blocks1 = sorted(
        (r.conv_id, r.start_idx, r.end_idx, round(r.max_score, 6))
        for r in res1.blocks.collect()
    )

    # simulate the mid-write kill on the scored_windows stage: delete the
    # manifest (it was never written), then truncate the data dir to a
    # partial, unreadable state (one stray non-parquet part file).
    sid = "r1-scored_windows"
    cat._manifest_path("scored_windows", sid).unlink()
    ddir = cat._data_dir("scored_windows", sid)
    shutil.rmtree(ddir)
    ddir.mkdir(parents=True)
    (ddir / "part-00000.parquet").write_bytes(b"truncated garbage, not parquet")

    assert not cat.has_snapshot("scored_windows", sid)  # invariant holds
    res2 = analyze_transcripts(spark, df, cfg, catalog=cat, run_id="r1", resume=True)
    blocks2 = sorted(
        (r.conv_id, r.start_idx, r.end_idx, round(r.max_score, 6))
        for r in res2.blocks.collect()
    )
    assert blocks2 == blocks1
    # stage was recomputed (not resumed) and recommitted atomically
    assert res2.metrics["scored_windows"].get("resumed") is None
    assert cat.has_snapshot("scored_windows", sid)
    # downstream stages HAD committed manifests, so they resume
    assert res2.metrics["blocks"].get("resumed") == 1.0


def test_compact_snapshot(spark, tmp_path):
    """Compaction rewrites a many-small-files snapshot into few files
    as a NEW snapshot: rows identical, old snapshot still readable
    (time travel preserved), current pointer flips to the compacted
    one, lineage records the source."""
    from cordon_spark.sources.catalog import SnapshotCatalog

    cat = SnapshotCatalog(tmp_path / "wh")
    df = spark.range(0, 10_000).withColumnRenamed("id", "v").repartition(40)
    cat.write_snapshot(df, "t", "s1")
    src_files = list((tmp_path / "wh/t/data/snapshot=s1").rglob("*.parquet"))
    assert len(src_files) >= 40

    m = cat.compact(spark, "t", target_file_bytes=1 << 30)
    assert m["snapshot_id"] == "s1-compacted"
    assert m["rows"] == 10_000
    assert m["lineage"]["op"] == "compact" and m["lineage"]["source_snapshot"] == "s1"
    new_files = list(
        (tmp_path / "wh/t/data/snapshot=s1-compacted").rglob("*.parquet")
    )
    assert len(new_files) == 1  # 40 tiny files -> one ~target file
    # identical content, both snapshots readable
    assert cat.read(spark, "t").count() == 10_000
    assert sorted(r.v for r in cat.read(spark, "t", "s1").collect()) == sorted(
        r.v for r in cat.read(spark, "t", "s1-compacted").collect()
    )
    assert cat.current_snapshot("t") == "s1-compacted"
    # compacting a missing table refuses
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        cat.compact(spark, "nope")
