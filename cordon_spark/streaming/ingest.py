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


_COMPACT_PREFIX = "appends-compacted-"


def _append_state(catalog: SnapshotCatalog, table: str):
    """(base_sid | None, covered set, live append sids, manifests read)
    for an append-model table: the newest compact_appends snapshot (if
    any) is the base; appends it covers are superseded; everything else
    that isn't a rewrite is live delta.

    Driver cost: manifests are read ONLY for base candidates (their id
    prefix marks them) and for sids NOT in the base's covered set — a
    month of compacted 1-minute batches classifies its ~43k superseded
    sids from the covered list alone, without opening their manifests."""
    sids = catalog.snapshots(table)
    manifests: dict = {}
    bases = []
    for sid in sids:
        if sid.startswith(_COMPACT_PREFIX):
            m = manifests[sid] = catalog.manifest(table, sid)
            if (m.get("lineage") or {}).get("op") == "compact_appends":
                bases.append((m["committed_at"], sid))
    base_sid = max(bases)[1] if bases else None
    covered = (
        set(manifests[base_sid]["lineage"]["covered"]) if base_sid else set()
    )
    live = []
    for sid in sids:
        if sid in covered or sid.startswith(_COMPACT_PREFIX):
            continue
        m = manifests.setdefault(sid, catalog.manifest(table, sid))
        if (m.get("lineage") or {}).get("op") not in REWRITE_OPS:
            live.append(sid)
    return base_sid, covered, sorted(live), manifests


def read_appends(
    spark: SparkSession, catalog: SnapshotCatalog, table: str
) -> DataFrame:
    """Read the full contents of an APPEND-model table: the newest
    `compact_appends` base (when one exists) unioned with every append
    snapshot it doesn't cover. Plain rewrite snapshots (compact /
    cluster re-layout EXISTING rows) are skipped by the same rule as
    IncrementalRollup.pending. This is the batch-reader counterpart of
    the streaming sink's one-snapshot-per-micro-batch contract.

    Scale note: each snapshot is one parquet directory; the union is a
    metadata-only plan concatenation (no shuffle). Run compact_appends
    periodically so the union stays [one compacted base + recent
    micro-batches] instead of thousands of tiny snapshots."""
    base_sid, _covered, live, _m = _append_state(catalog, table)
    parts = [catalog.read(spark, table, s) for s in ([base_sid] if base_sid else [])]
    parts += [catalog.read(spark, table, s) for s in live]
    if not parts:
        raise FileNotFoundError(f"no committed snapshot for table {table}")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def compact_appends(
    spark: SparkSession,
    catalog: SnapshotCatalog,
    table: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Append-aware compaction: rewrite the table's CURRENT logical
    contents (base + live appends) into one combined snapshot whose
    lineage `covered` lists every snapshot it folds — read_appends then
    scans [new base + later appends] only. History is preserved
    (Iceberg rewrite_data_files semantics): old snapshots stay readable
    and the row-count invariant is checked after the commit.

    The 100 TB why: a streaming sink lands one snapshot per
    micro-batch; without this, a day of 1-minute batches puts 1,440
    directories under every read_appends plan and the driver pays
    per-file planning forever. Chained compactions fold prior bases
    (covered is transitive). Dropping superseded originals afterwards
    is safe for THIS reader; do it only once downstream rollups cover
    them (IncrementalRollup skips compact_appends snapshots and relies
    on the originals for its delta)."""
    base_sid, covered, live, manifests = _append_state(catalog, table)
    folded = ([base_sid] if base_sid else []) + live
    if not folded:
        raise FileNotFoundError(f"no committed snapshot for table {table}")
    total_bytes = 0
    for sid in folded:
        d = catalog._data_dir(table, sid)
        total_bytes += sum(p.stat().st_size for p in d.rglob("*.parquet"))
    n_files = max(1, -(-total_bytes // target_file_bytes))  # ceil
    # Union EXACTLY the pinned `folded` list — re-deriving via
    # read_appends here would race a concurrent sink: a micro-batch
    # committed between _append_state and the read would be folded into
    # the base but left out of `covered`, double-counting it forever.
    df = catalog.read(spark, table, folded[0])
    for sid in folded[1:]:
        df = df.unionByName(catalog.read(spark, table, sid))
    df = df.coalesce(int(n_files))
    new_covered = sorted(covered | set(folded))
    new_sid = f"appends-compacted-{len(new_covered):06d}"
    manifest = catalog.write_snapshot(
        df,
        table,
        new_sid,
        lineage={
            "op": "compact_appends",
            "covered": new_covered,
            "folded": folded,
            "source_bytes": int(total_bytes),
            "target_file_bytes": int(target_file_bytes),
        },
    )
    expect = sum(manifests[s]["rows"] for s in folded)
    if manifest["rows"] != expect:  # pragma: no cover - invariant
        raise RuntimeError(
            f"append compaction row mismatch: {manifest['rows']} != {expect}"
        )
    return manifest


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
