"""Dedup-chain scale run: minhash-LSH -> connected components -> apply
at >=2M documents on the real standalone cluster (the round-3 verdict's
order-of-magnitude ask for the second-most-expensive bench family; the
pipeline got its 20M-turn run in r3).

The corpus is synthesized deterministically with a KNOWN duplicate
structure, so the run verifies exact pair/cluster/survivor counts while
it times the chain — correctness travels with the scale evidence:

  * doc ids 0..n-1; every id with i % 20 == 19 is a near-copy of i-1
    (last 2 of 24 tokens replaced), so the TRUE pair set is exactly
    {(i-1, i)} and every component has size 2 with rep i-1;
  * all other docs draw pseudo-random tokens from a 50k vocabulary via
    multiplicative hashing — cross-doc Jaccard is ~0, so LSH false
    positives die in verification.

Expected: ZERO false positives (every verified pair is a planted pair,
every cluster rep is the planted source doc), recall >= 0.995 of the
n/20 planted pairs (a banded LSH misses a ~1e-3 tail by construction —
that tail is the price of linearity and is measured, not hidden),
survivors == n_docs - found_pairs, convergence in ~2 path-halving
rounds.

Usage: python scripts/dedup_scale_bench.py  (env: DEDUP_DOCS=2000000,
SCALE_EXEC_CORES=2, DEDUP_LEGS=1,4 executor counts, DEDUP_TRIALS=2).
Appends a section to BENCH.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

SPARK_HOME = os.environ.get("SPARK_HOME", "/opt/spark")
MASTER_URL = "spark://127.0.0.1:7077"
CACHE = "/tmp/cordon_bench"


def docs_path(n_docs: int, seed: int = 42) -> str:
    """Deterministic 24-token docs with the planted (i-1, i%20==19)
    near-dup pairs; 64 part files so every executor core scans."""
    path = f"{CACHE}/docs_{n_docs}_{seed}"
    if os.path.exists(f"{path}/_DONE"):
        return path
    import numpy as np
    import pandas as pd

    from cordon_spark.datagen import write_parquet

    os.makedirs(path, exist_ok=True)
    rng = np.random.RandomState(seed)
    vocab = np.array([f"w{i:05d}" for i in range(50_000)])
    n_tok = 24
    ids = np.arange(n_docs, dtype=np.int64)
    # token indices need a REAL mix (xorshift-multiply finalizer): a
    # linear i*A + j*B formula makes doc i+d a token-SHIFT of doc i for
    # the d solving d*A = k*B (mod V) — measured 1.4M phantom near-dup
    # pairs at 100k docs before this fix
    x = (
        ids[:, None].astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        + (np.arange(n_tok, dtype=np.uint64)[None, :] + np.uint64(1))
        * np.uint64(0xBF58476D1CE4E5B9)
        + np.uint64(seed)
    )
    x ^= x >> np.uint64(33)
    x *= np.uint64(0xFF51AFD7ED558CCD)
    x ^= x >> np.uint64(29)
    idx = (x % np.uint64(50_000)).astype(np.int32)
    # near-dups: copy the source row, replace the last 2 tokens
    dup_mask = (ids % 20) == 19
    idx[dup_mask] = idx[np.where(dup_mask)[0] - 1]
    idx[dup_mask, -2:] = rng.randint(0, 50_000, size=(dup_mask.sum(), 2))
    toks = vocab[idx]
    n_files = 64
    step = (n_docs + n_files - 1) // n_files
    for f in range(n_files):
        lo, hi = f * step, min((f + 1) * step, n_docs)
        if lo >= hi:
            continue
        texts = [" ".join(row) for row in toks[lo:hi]]
        write_parquet(
            pd.DataFrame({"doc_id": ids[lo:hi], "text": texts}),
            f"{path}/part-{f:04d}.parquet",
        )
    open(f"{path}/_DONE", "w").write("ok")
    return path


LEG_CODE = '''
import sys, time, json
sys.path.insert(0, "{root}")
from pyspark.sql import functions as F
from cordon_spark.session import get_spark
from cordon_spark.operators.dedup import minhash_lsh_pairs, dedup_clusters, apply_dedup

spark = get_spark("dedup_scale_leg", master="{master}", shuffle_partitions={parts},
  extra_conf={{"spark.executor.cores": "{exec_cores}", "spark.cores.max": "{cores_max}",
              "spark.executor.memory": "8g", "spark.pyspark.python": sys.executable}})
docs = spark.read.parquet("{data}")
n_docs = docs.count()
expect_pairs = n_docs // 20

# warmup: full chain on a 5% slice (python workers + page cache)
w = docs.filter(F.col("doc_id") % 20 < 1)
wp = minhash_lsh_pairs(w)
apply_dedup(w, dedup_clusters(wp)).count()

best = None
for _trial in range({trials}):
    t0 = time.perf_counter()
    pairs = minhash_lsh_pairs(docs).persist()
    n_pairs = pairs.count()
    t_pairs = time.perf_counter() - t0
    stats = {{}}
    clusters = dedup_clusters(pairs, stats=stats).persist()
    n_cluster_rows = clusters.count()
    t_clusters = time.perf_counter() - t0 - t_pairs
    kept = apply_dedup(docs, clusters)
    n_kept = kept.count()
    total = time.perf_counter() - t0
    # exact-structure verification (planted dup graph), every trial
    bad_pairs = pairs.filter(
        (F.col("doc_b") != F.col("doc_a") + 1) | (F.col("doc_b") % 20 != 19)
    ).count()
    bad_reps = clusters.filter(
        F.col("cluster_rep")
        != F.col("doc_id") - (F.col("doc_id") % 20 == 19).cast("long")
    ).count()
    # fully unpersist BEFORE the next trial: a persisted frame from a
    # previous trial substitutes into the next trial's identical plan
    # (cache lookup is by analyzed plan), which would time a cache read
    # as if it were the LSH (measured: 81s -> 1.05s phantom "speedup")
    pairs.unpersist(blocking=True)
    clusters.unpersist(blocking=True)
    spark.catalog.clearCache()
    if best is None or total < best[0]:
        best = (total, t_pairs, t_clusters)
total, t_pairs, t_clusters = best
print("LEG_RESULT " + json.dumps({{
  "n_docs": n_docs, "n_pairs": n_pairs, "expect_pairs": expect_pairs,
  "bad_pairs": bad_pairs, "n_cluster_rows": n_cluster_rows,
  "bad_reps": bad_reps, "n_kept": n_kept, "rounds": stats.get("rounds"),
  "sec_pairs": t_pairs, "sec_clusters": t_clusters, "sec_total": total,
  "docs_per_sec": n_docs / total,
}}))
'''


def run_leg(data: str, exec_cores: int, n_execs: int) -> dict:
    from cordon_spark.session import package_zip

    cores_max = exec_cores * n_execs
    trials = int(os.environ.get("DEDUP_TRIALS", "2"))
    code = LEG_CODE.format(
        root=ROOT, master=MASTER_URL, parts=max(cores_max * 4, 32),
        exec_cores=exec_cores, cores_max=cores_max, data=data, trials=trials,
    )
    driver = Path("/tmp/dedup_scale_leg.py")
    driver.write_text(code)
    out = subprocess.run(
        [f"{SPARK_HOME}/bin/spark-submit", "--master", MASTER_URL,
         "--py-files", package_zip(), str(driver)],
        capture_output=True, text=True, timeout=3600, cwd=str(ROOT),
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("LEG_RESULT ")]
    if not lines:
        sys.stderr.write(out.stdout[-1500:] + "\n" + out.stderr[-3000:])
        raise RuntimeError(f"dedup leg failed ({n_execs} executors)")
    return json.loads(lines[-1][len("LEG_RESULT "):])


def main() -> None:
    from scripts.scaling_bench import start_cluster, stop_cluster

    n_docs = int(os.environ.get("DEDUP_DOCS", "2000000"))
    # default 2 cores/executor: the 1-vs-4-executor legs then span
    # N=2 -> 4N=8 cores, the band where this overcommitted host
    # actually delivers requested CPU (BENCH.md environment caveats);
    # 8 -> 32 core legs measured the host throttle, not the plan
    exec_cores = int(os.environ.get("SCALE_EXEC_CORES", "2"))
    legs = [int(x) for x in os.environ.get("DEDUP_LEGS", "1,4").split(",")]
    data = docs_path(n_docs)
    start_cluster()
    results = {}
    try:
        for n_execs in legs:
            results[n_execs] = run_leg(data, exec_cores, n_execs)
    finally:
        stop_cluster()

    for n_execs, r in results.items():
        r["recall"] = r["n_pairs"] / r["expect_pairs"]
        ok = (
            r["bad_pairs"] == 0
            and r["bad_reps"] == 0
            and r["recall"] >= 0.995
            and r["n_cluster_rows"] == 2 * r["n_pairs"]
            and r["n_kept"] == r["n_docs"] - r["n_pairs"]
        )
        r["exact_structure_ok"] = ok

    lines = [
        "",
        f"## Dedup chain at {n_docs:,} docs, {time.strftime('%Y-%m-%d %H:%M')}",
        "",
        "minhash-LSH -> connected components (path halving) -> apply, on",
        "the standalone cluster via spark-submit --py-files; planted dup",
        "graph verified EXACTLY inside the timed job (pair set, cluster",
        "reps, survivor count — see scripts/dedup_scale_bench.py):",
        "",
        "| cluster size | LSH pairs s | components s | total s | docs/s | rounds | recall | structure |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for n_execs, r in results.items():
        lines.append(
            f"| {n_execs} executor(s) x {exec_cores} cores "
            f"| {r['sec_pairs']:.1f} | {r['sec_clusters']:.1f} "
            f"| {r['sec_total']:.1f} | {r['docs_per_sec']:,.0f} "
            f"| {r['rounds']} | {r['recall']:.4f} "
            f"| {'PASS' if r['exact_structure_ok'] else 'FAIL'} |"
        )
    if len(results) >= 2:
        ks = sorted(results)
        eff = (
            results[ks[-1]]["docs_per_sec"] / results[ks[0]]["docs_per_sec"]
        ) / (ks[-1] / ks[0])
        lines += ["", f"Scaling efficiency {ks[0]} -> {ks[-1]} executors: "
                      f"**{eff:.3f}**"]
    lines += ["", "```json", json.dumps(results), "```",
              "", f"Generated {time.strftime('%Y-%m-%d %H:%M:%S')}."]
    with open(ROOT / "BENCH.md", "a") as fh:
        fh.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
