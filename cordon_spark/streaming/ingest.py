"""Streaming ingest into the snapshot catalog: every micro-batch
lands as one immutable append snapshot, with optional incremental
rollup refresh — the foreachBatch pattern that turns Structured
Streaming into an exactly-once table writer.

Exactly-once: Structured Streaming guarantees at-least-once delivery
to foreachBatch — after a crash, the LAST batch may replay with the
SAME batch_id. The sink derives the snapshot id from the batch id and
skips batches whose snapshot is already committed (the manifest write
is the atomic commit point), so a replay is a no-op: effectively
exactly-once, the same txn-version-by-batchId idea Delta's streaming
sink uses. The rollup refresh is idempotent by the same mechanism —
IncrementalRollup folds by snapshot id and a replayed batch's
snapshot is already covered.

At 100 TB-equivalent stream rates this composition keeps EVERYTHING
incremental: the micro-batch writes only its own rows, the rollup
refresh reads only the new snapshot plus the current (small) rollup
state (see scripts/rollup_bench.py: flat refresh cost vs linear
recompute), and downstream batch readers get snapshot-isolated views
with time travel."""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from cordon_spark.sources.catalog import SnapshotCatalog
from cordon_spark.sources.rollup import REWRITE_OPS, IncrementalRollup


def read_appends(
    spark: SparkSession, catalog: SnapshotCatalog, table: str
) -> DataFrame:
    """Read the full contents of an APPEND-model table: the union of
    every append snapshot, skipping rewrite snapshots (compaction /
    clustering re-layout EXISTING rows — same skip rule as
    IncrementalRollup.pending). This is the batch-reader counterpart
    of the streaming sink's one-snapshot-per-micro-batch contract.

    Scale note: each snapshot is one parquet directory; the union is a
    metadata-only plan concatenation (no shuffle). The file count grows
    with the number of snapshots — `catalog.compact` rewrites only the
    CURRENT snapshot (not the append union), so bounding an append
    table's file count needs an append-aware compaction (future work);
    do NOT drop_snapshot the originals, this reader is what sees them."""
    out = None
    for sid in catalog.snapshots(table):
        lin = catalog.manifest(table, sid).get("lineage") or {}
        if lin.get("op") in REWRITE_OPS:
            continue
        part = catalog.read(spark, table, sid)
        out = part if out is None else out.unionByName(part)
    if out is None:
        raise FileNotFoundError(f"no committed snapshot for table {table}")
    return out


def snapshot_sink(
    catalog: SnapshotCatalog,
    table: str,
    rollup: IncrementalRollup | None = None,
    run_prefix: str = "batch",
) -> Callable[[DataFrame, int], None]:
    """Build a foreachBatch function: commit the micro-batch as append
    snapshot `{run_prefix}-{batch_id:06d}` (skip if already committed
    — replay safety), then refresh `rollup` if given."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        sid = f"{run_prefix}-{batch_id:06d}"
        if not catalog.has_snapshot(table, sid):
            catalog.write_snapshot(
                batch_df,
                table,
                sid,
                lineage={"op": "stream_append", "batch_id": int(batch_id)},
            )
        if rollup is not None:
            rollup.refresh(batch_df.sparkSession)

    return _sink


def ingest_stream(
    stream_df: DataFrame,
    catalog: SnapshotCatalog,
    table: str,
    rollup: IncrementalRollup | None = None,
    run_prefix: str | None = None,
    checkpoint_dir: str | None = None,
):
    """Start the streaming query: stream -> snapshot-per-micro-batch
    (+ rollup refresh). `checkpoint_dir` enables restart-with-replay,
    which the snapshot-id skip makes exactly-once.

    Identity contract (the (appId, version) idea of Delta's streaming
    sink, keyed here as (run_prefix, batch_id)): a STABLE run_prefix
    must be paired with a stable checkpoint_dir, and no two streams may
    share (table, run_prefix) — otherwise a restarted-from-zero batch
    counter collides with committed snapshot ids and the skip rule
    silently drops the new run's data. Enforced default: without a
    checkpoint there is no replay to dedup, so run_prefix defaults to a
    fresh unique value per start; with a checkpoint it defaults to
    'batch' (stable across restarts, which replay safety needs)."""
    if run_prefix is None:
        if checkpoint_dir is None:
            import uuid

            run_prefix = f"run-{uuid.uuid4().hex[:12]}"
        else:
            run_prefix = "batch"
    writer = stream_df.writeStream.foreachBatch(
        snapshot_sink(catalog, table, rollup, run_prefix)
    ).outputMode("append")
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
