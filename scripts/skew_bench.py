"""Hot-key skew evidence for sessionize_chunked: a planted bot user
holding a large fraction of the event log makes plain sessionize's
(user) window a single straggler task; the chunked variant bounds
per-task work by events-per-user-per-chunk. Both run on the SAME
input, equality of output asserted inside the timed run (count + an
order-independent full-row md5 fold incl. session_id), wall time of
each reported.

Corpus: SKEW_USERS normal users with SKEW_PER_USER events each on a
10-minute cadence, plus ONE bot user with SKEW_HOT events on a
1-second cadence (so the bot contributes many sessions only via the
configured gap; everything stays deterministic).

Usage: python scripts/skew_bench.py  (env: SKEW_USERS=100000,
SKEW_PER_USER=100, SKEW_HOT=10000000, SKEW_CHUNK=86400,
SKEW_TRIALS=2, SKEW_CPUS=8). Appends a section to BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

CACHE = "/tmp/cordon_bench"
BASE_US = 20454 * 86_400_000_000  # 2026-01-01


def data_path(n_users: int, per_user: int, hot: int) -> str:
    path = f"{CACHE}/skew_{n_users}x{per_user}_h{hot}"
    if os.path.exists(f"{path}/_DONE"):
        return path
    import numpy as np
    import pandas as pd

    from cordon_spark.datagen import write_parquet

    os.makedirs(path, exist_ok=True)
    n_files = 32
    # normal users spread over the files
    step = (n_users + n_files - 1) // n_files
    hot_step = (hot + n_files - 1) // n_files
    for f in range(n_files):
        lo, hi = f * step, min((f + 1) * step, n_users)
        u = np.repeat(np.arange(lo, hi, dtype=np.int64) + 1, per_user)
        seq = np.tile(np.arange(per_user, dtype=np.int64), max(hi - lo, 0))
        ts_us = BASE_US + u * 1_000 + seq * 600_000_000
        eid = u * per_user + seq
        # the bot (user 0): 1-second cadence, sliced across files
        hlo, hhi = f * hot_step, min((f + 1) * hot_step, hot)
        hseq = np.arange(hlo, hhi, dtype=np.int64)
        frames = [
            pd.DataFrame(
                {"event_id": eid, "ts": pd.to_datetime(ts_us, unit="us"),
                 "user_id": u, "event_type": "view",
                 "value": (seq % 7) * 0.5}
            ),
            pd.DataFrame(
                {"event_id": (n_users + 1) * per_user + hseq,
                 "ts": pd.to_datetime(BASE_US + hseq * 1_000_000, unit="us"),
                 "user_id": np.zeros(len(hseq), dtype=np.int64),
                 "event_type": "view",
                 "value": (hseq % 7) * 0.5}
            ),
        ]
        write_parquet(
            pd.concat(frames, ignore_index=True), f"{path}/part-{f:04d}.parquet"
        )
    open(f"{path}/_DONE", "w").write("ok")
    return path


def main() -> None:
    from pyspark.sql import functions as F

    from cordon_spark.operators.events import sessionize, sessionize_chunked
    from cordon_spark.session import get_spark

    n_users = int(os.environ.get("SKEW_USERS", "100000"))
    per_user = int(os.environ.get("SKEW_PER_USER", "100"))
    hot = int(os.environ.get("SKEW_HOT", "10000000"))
    chunk = int(os.environ.get("SKEW_CHUNK", "86400"))
    trials = int(os.environ.get("SKEW_TRIALS", "2"))
    cpus = int(os.environ.get("SKEW_CPUS", "8"))

    data = data_path(n_users, per_user, hot)
    spark = get_spark(
        "skew_bench", master=f"local[{cpus}]", shuffle_partitions=cpus * 4
    )
    spark.sparkContext.setLogLevel("ERROR")
    ev = spark.read.parquet(data)
    n_events = ev.count()

    def canon(df):
        # every output column participates, INCLUDING session_id (a
        # renumbering regression must not slip past the identity check);
        # md5 over the whole row, sum-folded, is order-independent
        h = F.conv(F.substring(F.md5(F.concat_ws(
            "|", "user_id", "session_id", "n_events", "start_us", "end_us",
            F.col("value_sum").cast("string"))), 1, 15), 16, 10).cast("decimal(38,0)")
        r = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(h).alias("rowhash"),  # decimal: no int64 overflow at any row count
            F.sum(F.col("value_sum")).alias("vsum"),
        ).collect()[0]
        return (r["n"], str(r["rowhash"]), str(r["vsum"]))

    def timed(fn):
        best, sig = None, None
        for _ in range(trials):
            t0 = time.perf_counter()
            sig = canon(fn())
            el = time.perf_counter() - t0
            best = el if best is None else min(best, el)
        return best, sig

    sec_chunked, sig_chunked = timed(lambda: sessionize_chunked(ev, chunk_seconds=chunk))
    sec_plain, sig_plain = timed(lambda: sessionize(ev))
    ok = sig_plain == sig_chunked

    result = {
        "n_events": n_events, "hot_user_events": hot,
        "hot_fraction": round(hot / n_events, 3),
        "cpus": cpus, "chunk_seconds": chunk,
        "sec_plain": round(sec_plain, 2),
        "sec_chunked": round(sec_chunked, 2),
        "speedup": round(sec_plain / sec_chunked, 2),
        "outputs_identical": ok, "sessions": sig_plain[0],  # full-row md5 identity
    }
    lines = [
        "",
        f"## Hot-key skew: sessionize vs sessionize_chunked at "
        f"{n_events:,} events, {time.strftime('%Y-%m-%d %H:%M')}",
        "",
        f"One bot user holds {hot:,} events "
        f"({100 * hot / n_events:.0f}% of the log): plain sessionize's",
        "(user) window makes that one partition a straggler task; the",
        "chunked variant bounds per-task work by events-per-chunk. Same",
        "input, outputs asserted IDENTICAL (count + order-independent",
        "full-row md5 fold incl. session_id) inside the timed run",
        "",
        f"| variant | wall s (best of {trials}, local[{cpus}]) |",
        "|---|---|",
        f"| sessionize (user window) | {sec_plain:.2f} |",
        f"| sessionize_chunked ((user, {chunk}s-chunk) window) "
        f"| {sec_chunked:.2f} |",
        "",
        f"Speedup **{result['speedup']}x** under the planted skew; "
        f"outputs {'IDENTICAL' if ok else 'MISMATCH'} "
        f"({sig_plain[0]:,} sessions).",
        "",
        "```json", json.dumps(result), "```",
    ]
    with open(ROOT / "BENCH.md", "a") as fh:
        fh.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    spark.stop()


if __name__ == "__main__":
    main()
