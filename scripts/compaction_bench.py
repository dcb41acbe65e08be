"""Measured evidence for compact_appends: a streaming-ingested table
accumulates N tiny micro-batch snapshots; read_appends over N
directories pays per-snapshot planning every query. Compaction folds
them into one base, after which the same query plans one directory
plus the post-compaction tail.

The run ingests N batches through the real snapshot_sink, times a full
read_appends count before compaction, compacts, appends a small tail,
times again — and asserts the logical contents are IDENTICAL (count +
grouped checksum) so the speedup can't come from dropped rows.

Usage: python scripts/compaction_bench.py  (env: COMPACT_BATCHES=240,
COMPACT_ROWS=5000, COMPACT_TRIALS=3). Appends a section to BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def main() -> None:
    from pyspark.sql import functions as F

    from cordon_spark.session import get_spark
    from cordon_spark.sources.catalog import SnapshotCatalog
    from cordon_spark.streaming.ingest import (
        compact_appends,
        read_appends,
        snapshot_sink,
    )

    n_batches = int(os.environ.get("COMPACT_BATCHES", "240"))
    rows_per = int(os.environ.get("COMPACT_ROWS", "5000"))
    trials = int(os.environ.get("COMPACT_TRIALS", "3"))

    spark = get_spark("compaction_bench", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="compact_bench_")
    cat = SnapshotCatalog(root)
    sink = snapshot_sink(cat, "ev")

    t0 = time.perf_counter()
    for b in range(n_batches):
        lo = b * rows_per
        df = spark.range(lo, lo + rows_per).select(
            (F.col("id") % 1000).alias("user_id"),
            (F.col("id") % 97).cast("double").alias("value"),
        )
        sink(df, b)
    t_ingest = time.perf_counter() - t0

    def checksum():
        r = read_appends(spark, cat, "ev").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("user_id") * F.col("value").cast("long")).alias("s"),
        ).collect()[0]
        return (r["n"], r["s"])

    def timed_scan():
        best = None
        for _ in range(trials):
            t = time.perf_counter()
            c = checksum()
            el = time.perf_counter() - t
            best = el if best is None else min(best, el)
        return best, c

    sec_before, sum_before = timed_scan()
    n_snaps_before = len(cat.snapshots("ev"))

    t0 = time.perf_counter()
    m = compact_appends(spark, cat, "ev")
    sec_compact = time.perf_counter() - t0

    # a post-compaction tail proves later appends stay visible
    tail = spark.range(n_batches * rows_per, n_batches * rows_per + rows_per).select(
        (F.col("id") % 1000).alias("user_id"),
        (F.col("id") % 97).cast("double").alias("value"),
    )
    tail_row = tail.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("user_id") * F.col("value").cast("long")).alias("s"),
    ).collect()[0]
    sink(tail, n_batches)
    sec_after_with_tail, sum_after = timed_scan()

    # contents identity: counts AND value checksums must reconcile —
    # after = before + tail exactly, or the speedup proves nothing
    ok = (
        m["rows"] == n_batches * rows_per
        and sum_before[0] == n_batches * rows_per
        and sum_after[0] == sum_before[0] + tail_row["n"]
        and sum_after[1] == sum_before[1] + tail_row["s"]
    )
    result = {
        "n_batches": n_batches,
        "rows_per_batch": rows_per,
        "total_rows": n_batches * rows_per,
        "snapshots_before": n_snaps_before,
        "sec_ingest": round(t_ingest, 2),
        "sec_scan_before": round(sec_before, 3),
        "sec_compact": round(sec_compact, 2),
        "sec_scan_after_plus_tail": round(sec_after_with_tail, 3),
        "speedup": round(sec_before / sec_after_with_tail, 2),
        "contents_ok": ok,
    }
    lines = [
        "",
        f"## Append compaction at {n_batches} micro-batch snapshots, "
        f"{time.strftime('%Y-%m-%d %H:%M')}",
        "",
        "read_appends over N one-per-micro-batch snapshot directories vs",
        "the same logical table after compact_appends (+1 tail batch to",
        "prove later appends stay visible); contents asserted identical",
        "by count + grouped checksum (scripts/compaction_bench.py):",
        "",
        "| layout | snapshots scanned | scan+agg s (best of "
        f"{trials}) |",
        "|---|---|---|",
        f"| before compaction | {n_snaps_before} | {sec_before:.3f} |",
        f"| after (base + 1 tail) | 2 | {sec_after_with_tail:.3f} |",
        "",
        f"Compaction itself: {sec_compact:.2f}s once; scan speedup "
        f"**{result['speedup']}x** every query thereafter; contents "
        f"{'IDENTICAL' if ok else 'MISMATCH'}.",
        "",
        "```json",
        json.dumps(result),
        "```",
    ]
    with open(ROOT / "BENCH.md", "a") as fh:
        fh.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    spark.stop()


if __name__ == "__main__":
    main()
