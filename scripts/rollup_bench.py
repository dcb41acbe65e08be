"""Incremental-rollup evidence: refresh cost must stay FLAT as history
grows, while a full recompute grows linearly — the property that makes
the rollup viable on an append-heavy 100 TB table.

Appends N daily snapshots of `rows_per_day` synthetic events each;
after every append, times IncrementalRollup.refresh (reads the one new
snapshot + the current rollup). At the end, times the equivalent full
recompute over ALL snapshots and verifies the maintained rollup equals
it EXACTLY (the test-suite invariant, re-asserted inside the timed
harness at scale).

Usage: python scripts/rollup_bench.py [n_days] [rows_per_day]
Prints one JSON line; paste the row into BENCH.md.
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def main() -> None:
    n_days = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    rows_per_day = int(sys.argv[2]) if len(sys.argv) > 2 else 250_000

    from pyspark.sql import functions as F

    from cordon_spark.session import get_spark
    from cordon_spark.sources.catalog import SnapshotCatalog
    from cordon_spark.sources.rollup import IncrementalRollup

    spark = get_spark("rollup_bench", master="local[8]", shuffle_partitions=16)
    wh = tempfile.mkdtemp(prefix="rollup_bench_")
    cat = SnapshotCatalog(wh)
    mv = IncrementalRollup(cat, "events", "events_by_user", ["user_id"], ["value"])

    refresh_secs = []
    for day in range(n_days):
        batch = spark.range(0, rows_per_day).select(
            (F.xxhash64(F.col("id") + day * 7919) % 100_000).alias("user_id"),
            ((F.col("id") % 9973) / F.lit(10.0)).alias("value"),
        )
        cat.write_snapshot(batch, "events", f"day{day:03d}")
        t0 = time.perf_counter()
        mv.refresh(spark)
        refresh_secs.append(round(time.perf_counter() - t0, 2))

    # full recompute over the whole history, same aggregate
    t0 = time.perf_counter()
    full = None
    for sid in cat.snapshots("events"):
        part = cat.read(spark, "events", sid)
        full = part if full is None else full.unionByName(part)
    full_agg = full.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(30,6)")).alias("sum_value"),
    )
    full_rows = {r["user_id"]: (r["n"], str(r["sum_value"])) for r in full_agg.collect()}
    t_full = time.perf_counter() - t0

    inc_rows = {
        r["user_id"]: (r["n"], str(r["sum_value"]))
        for r in cat.read(spark, "events_by_user").collect()
    }
    assert inc_rows == full_rows, "incremental rollup diverged from full recompute"

    half = len(refresh_secs) // 2
    print(
        json.dumps(
            {
                "n_days": n_days,
                "rows_per_day": rows_per_day,
                "total_rows": n_days * rows_per_day,
                "refresh_secs": refresh_secs,
                "refresh_mean_first_half": round(
                    sum(refresh_secs[:half]) / half, 2
                ),
                "refresh_mean_second_half": round(
                    sum(refresh_secs[half:]) / (len(refresh_secs) - half), 2
                ),
                "full_recompute_sec": round(t_full, 2),
                "equal_to_full_recompute": True,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
