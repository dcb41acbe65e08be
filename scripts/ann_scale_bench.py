"""ANN serving scale run: IVF-PQ index build + batch query at 1M
64-dim vectors on the standalone cluster, at two cluster sizes (the
north rule's N vs 4N criterion applied to the similarity tier, which
so far only had sf0.1-local evidence).

Per leg (spark-submit --py-files, fresh index path):
  build  = pq codebook fit + coarse quantizer fit + encode + write of
           cluster-partitioned (nid, codes) lists     [timed]
  query  = 500 query vectors, k=10, n_probe/n_clusters = 1/16 of the
           index scanned (partition pruning asserted on a single-query
           executed plan inside the leg), PQ shortlist of 100 exactly
           RE-RANKED against the raw table (the FAISS refine serving
           pattern — quantization picks membership, raw vectors pick
           order)                                     [timed]
Recall@10 for 20 probe queries is checked against exact brute-force
results computed ONCE at data-gen time (exactness does not depend on
parallelism) — correctness travels with the scale evidence, same
policy as dedup_scale_bench.

Usage: python scripts/ann_scale_bench.py
(env: ANN_VECTORS=2000000, SCALE_EXEC_CORES=2,
ANN_LEGS=1,4). Appends a section to BENCH.md.
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

from scripts.dedup_scale_bench import CACHE, MASTER_URL, SPARK_HOME

DIM = 64
N_CLUSTERS = 64
N_PROBE = 4
PQ_M = 16
K = 10
N_QUERIES = 500
N_EXACT = 20


def vectors_path(n: int, seed: int = 7) -> str:
    """Deterministic unit vectors with LOW INTRINSIC DIMENSION (rank-8
    latent + noise): uniform random vectors have near-uniform pairwise
    distances, which makes ANN recall meaningless as a metric; real
    embeddings are structured. Also computes exact top-K for the first
    N_EXACT query ids (numpy, blocked) and stores them next to the
    parquet."""
    path = f"{CACHE}/vectors_{n}_{seed}"
    if os.path.exists(f"{path}/_DONE"):
        return path
    import numpy as np
    import pandas as pd

    from cordon_spark.datagen import write_parquet

    os.makedirs(path, exist_ok=True)
    rng = np.random.RandomState(seed)
    basis = rng.randn(8, DIM)
    n_files = 64
    step = (n + n_files - 1) // n_files
    all_for_exact = np.empty((n, DIM), dtype=np.float32)
    for f in range(n_files):
        lo, hi = f * step, min((f + 1) * step, n)
        if lo >= hi:
            continue
        frng = np.random.RandomState(seed * 100003 + f)
        lat = frng.randn(hi - lo, 8)
        mat = lat @ basis + 0.05 * frng.randn(hi - lo, DIM)
        mat /= np.linalg.norm(mat, axis=1, keepdims=True)
        all_for_exact[lo:hi] = mat
        write_parquet(
            pd.DataFrame(
                {
                    "vec_id": np.arange(lo, hi, dtype=np.int64),
                    "v": [row.astype(np.float64).tolist() for row in mat],
                }
            ),
            f"{path}/part-{f:04d}.parquet",
        )
    # exact top-K for the first N_EXACT ids, blocked numpy
    q = all_for_exact[:N_EXACT].astype(np.float64)
    best = {}
    bs = 200_000
    tops = []
    for lo in range(0, n, bs):
        blk = all_for_exact[lo : lo + bs].astype(np.float64)
        d = q @ blk.T  # cosine similarity (unit vectors)
        tops.append(
            [
                [(float(d[i, j]), int(lo + j)) for j in np.argsort(-d[i])[: K + 1]]
                for i in range(N_EXACT)
            ]
        )
    for i in range(N_EXACT):
        cand = sorted(
            (c for t in tops for c in t[i]), key=lambda x: (-x[0], x[1])
        )
        best[i] = [nid for _, nid in cand if nid != i][:K]
    Path(f"{path}/_exact.json").write_text(json.dumps(best))
    open(f"{path}/_DONE", "w").write("ok")
    return path


LEG_CODE = '''
import sys, time, json
sys.path.insert(0, "{root}")
from pyspark.sql import functions as F
from cordon_spark.session import get_spark
from cordon_spark.operators import similarity as S

spark = get_spark("ann_scale_leg", master="{master}", shuffle_partitions={parts},
  extra_conf={{"spark.executor.cores": "{exec_cores}", "spark.cores.max": "{cores_max}",
              "spark.executor.memory": "8g", "spark.pyspark.python": sys.executable}})
vecs = spark.read.parquet("{data}")
n = vecs.count()

# warmup python workers on a slice
S.pq_fit(vecs.filter(F.col("vec_id") % 97 == 0), m={pq_m}, n_codes=16, iters=1)

t0 = time.perf_counter()
meta = S.ivf_build_index(vecs, "{index}", n_clusters={n_clusters}, iters=2,
                         pq_m={pq_m}, pq_codes=16, pq_iters=2)
t_build = time.perf_counter() - t0

queries = vecs.filter(F.col("vec_id") < {n_queries})
t1 = time.perf_counter()
out = S.ivf_query_index(spark, "{index}", queries, k={k}, n_probe={n_probe},
                        refine_with=vecs, shortlist=100)
rows = out.collect()
t_query = time.perf_counter() - t1

# a 1,000-query batch's probe UNION covers (nearly) every cluster, so
# the batch scan legitimately reads the whole index; the partition-
# pruning property is asserted on a SINGLE-query plan, whose union is
# its own n_probe clusters
single = S.ivf_query_index(spark, "{index}", vecs.filter(F.col("vec_id") == 3),
                           k={k}, n_probe={n_probe})
single.collect()
plan = single._jdf.queryExecution().executedPlan().toString()
pruned = "PartitionFilters: [cluster" in plan

exact = json.loads(open("{data}/_exact.json").read())
got = {{}}
for r in rows:
    got.setdefault(r.qid, []).append(r.nid)
hits = sum(len(set(got.get(int(q), [])) & set(nids)) for q, nids in exact.items())
recall = hits / ({k} * len(exact))

print("LEG_RESULT " + json.dumps({{
  "n": n, "t_build": t_build, "t_query": t_query,
  "queries_per_sec": {n_queries} / t_query,
  "recall_at_k": recall, "partition_pruned": bool(pruned),
  "n_result_rows": len(rows),
}}))
'''


def run_leg(data: str, exec_cores: int, n_execs: int) -> dict:
    from cordon_spark.session import package_zip

    cores_max = exec_cores * n_execs
    index = f"{CACHE}/ivfpq_index_{n_execs}"
    subprocess.run(["rm", "-rf", index], check=False)
    code = LEG_CODE.format(
        root=ROOT, master=MASTER_URL, parts=max(cores_max * 4, 32),
        exec_cores=exec_cores, cores_max=cores_max, data=data, index=index,
        n_clusters=N_CLUSTERS, n_probe=N_PROBE, pq_m=PQ_M, k=K,
        n_queries=N_QUERIES,
    )
    driver = Path("/tmp/ann_scale_leg.py")
    driver.write_text(code)
    out = subprocess.run(
        [f"{SPARK_HOME}/bin/spark-submit", "--master", MASTER_URL,
         "--py-files", package_zip(), str(driver)],
        capture_output=True, text=True, timeout=3600, cwd=str(ROOT),
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("LEG_RESULT ")]
    if not lines:
        sys.stderr.write(out.stdout[-1500:] + "\n" + out.stderr[-3000:])
        raise RuntimeError(f"ann leg failed ({n_execs} executors)")
    return json.loads(lines[-1][len("LEG_RESULT "):])


def main() -> None:
    from scripts.scaling_bench import start_cluster, stop_cluster

    n = int(os.environ.get("ANN_VECTORS", "1000000"))
    exec_cores = int(os.environ.get("SCALE_EXEC_CORES", "2"))
    legs = [int(x) for x in os.environ.get("ANN_LEGS", "1,4").split(",")]
    data = vectors_path(n)
    start_cluster()
    results = {}
    try:
        for n_execs in legs:
            results[n_execs] = run_leg(data, exec_cores, n_execs)
    finally:
        stop_cluster()

    lines = [
        "",
        f"## ANN serving (IVF-PQ) at {n:,} x {DIM}-dim vectors",
        "",
        f"Build = codebook fit + coarse fit + encode + write of "
        f"{N_CLUSTERS}-way cluster-partitioned (nid, codes) lists "
        f"(pq_m={PQ_M}: {PQ_M * 4} bytes/vector vs {DIM * 8} raw); "
        f"query = PQ shortlist 100 + exact re-rank (refine_with); "
        f"query = {N_QUERIES:,} queries, k={K}, n_probe={N_PROBE} "
        f"(scan reads {N_PROBE}/{N_CLUSTERS} of the index — pruning "
        "asserted on the executed plan inside each leg); recall@10 vs "
        f"exact brute force for {N_EXACT} probe queries "
        "(scripts/ann_scale_bench.py):",
        "",
        "| cluster size | build s | query s | queries/s | recall@10 | pruned |",
        "|---|---|---|---|---|---|",
    ]
    for n_execs, r in results.items():
        lines.append(
            f"| {n_execs} executor(s) x {exec_cores} cores "
            f"| {r['t_build']:.1f} | {r['t_query']:.1f} "
            f"| {r['queries_per_sec']:,.0f} | {r['recall_at_k']:.3f} "
            f"| {'yes' if r['partition_pruned'] else 'NO'} |"
        )
    if len(results) >= 2:
        ks = sorted(results)
        eff_b = (
            results[ks[0]]["t_build"] / results[ks[-1]]["t_build"]
        ) / (ks[-1] / ks[0])
        eff_q = (
            results[ks[0]]["t_query"] / results[ks[-1]]["t_query"]
        ) / (ks[-1] / ks[0])
        lines += ["", f"Scaling efficiency {ks[0]} -> {ks[-1]} executors: "
                      f"build **{eff_b:.3f}**, query **{eff_q:.3f}**"]
    lines += ["", "```json", json.dumps(results), "```",
              "", f"Generated {time.strftime('%Y-%m-%d %H:%M:%S')}."]
    with open(ROOT / "BENCH.md", "a") as fh:
        fh.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
