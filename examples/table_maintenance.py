#!/usr/bin/env python3
"""Table maintenance walkthrough: the snapshot-table lifecycle a
long-running 100 TB log pipeline needs, on a small self-contained
fixture. Run from the repo root:

    python examples/table_maintenance.py [WAREHOUSE_DIR]

Lifecycle demonstrated (each step is an immutable snapshot with
lineage — history and time travel always preserved):

  1. ingest      three append snapshots (the micro-batch pattern)
  2. rollup      IncrementalRollup refresh after each append — folds
                 ONLY the delta, equals a full recompute exactly
  3. compact     small files -> scan-sized files (new snapshot)
  4. cluster     Z-order rewrite on (user_id, ts) so per-file min/max
                 envelopes prune scans on EITHER column
  5. verify      rollup refresh after both rewrites is a no-op (their
                 lineage marks them as rewrites of covered rows)
"""

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F


def main() -> None:
    from cordon_spark.session import get_spark
    from cordon_spark.sources.catalog import SnapshotCatalog
    from cordon_spark.sources.layout import file_locality
    from cordon_spark.sources.rollup import IncrementalRollup

    wh = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="wh_")
    spark = get_spark("table_maintenance", master="local[4]", shuffle_partitions=4)
    cat = SnapshotCatalog(wh)
    mv = IncrementalRollup(cat, "events", "events_by_user", ["user_id"], ["value"])

    # 1+2: ingest three appends; refresh the rollup after each
    for day in range(3):
        batch = spark.range(0, 3000).select(
            (F.xxhash64(F.col("id") + day * 17) % 50).alias("user_id"),
            (F.lit(day * 86_400_000_000) + F.col("id") * 1_000_000).alias("ts_us"),
            ((F.col("id") % 997) / F.lit(10.0)).alias("value"),
        ).withColumn("ts", F.timestamp_micros(F.col("ts_us"))).drop("ts_us")
        cat.write_snapshot(batch.repartition(8), "events", f"day{day}")
        m = mv.refresh(spark)
        print(f"day{day}: rollup folded {m['lineage']['delta_snapshots']}, "
              f"{m['rows']} user rows")

    # 3: compact the small ingest files of the latest snapshot
    c = cat.compact(spark, "events", "day2", target_file_bytes=1 << 20)
    print(f"compacted day2 -> {c['snapshot_id']} ({c['rows']} rows)")

    # 4: Z-order the compacted snapshot on (user_id, ts)
    z = cat.cluster(spark, "events", ["user_id", "ts"], n_files=8)
    loc = file_locality(
        cat.read(spark, "events").withColumn("_file", F.input_file_name()),
        ["user_id"],
    )
    frac = loc.agg(F.avg("frac_user_id")).collect()[0][0]
    print(f"clustered -> {z['snapshot_id']}; mean per-file user_id "
          f"envelope {frac:.2f} of global range (1.0 = unclustered)")

    # 5: rewrites must not re-enter the rollup
    assert mv.pending() == [], mv.pending()
    print(f"rollup pending after rewrites: {mv.pending()} (rewrites skipped)")
    print(f"snapshots: {cat.snapshots('events')}")
    spark.stop()


if __name__ == "__main__":
    main()
