"""Two-cluster-size scaling evidence (north rule): the IDENTICAL pipeline
on a real multi-executor Spark standalone cluster (localhost) at N and
4N executor cores, best-of-3 steady-state trials per leg, written to
BENCH.md.

Environment notes that shaped this harness (all measured, see BENCH.md):
  * This sandbox is a Firecracker microVM whose host overcommits CPU:
    guest loadavg ~10 at 0% guest utilization, and wall times at 32
    vCPUs vary ~3x run-to-run. Legs sized SCALE_EXEC_CORES(=2) vs
    4x that get reliably-delivered CPU; best-of-3 reports capability,
    not host noise.
  * A single process's threads cap at ~8-14 effective cores here while
    separate processes scale to the full machine — so the legs are
    EXECUTOR PROCESSES (1 vs 4 executors), which is also the exact
    shape the north rule's criterion names.
  * Trials are steady-state: a full-width warmup first (python workers
    + page cache), like any long-running production job.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
SPARK_HOME = os.environ.get("SPARK_HOME", "/opt/spark")
MASTER_URL = "spark://127.0.0.1:7077"

LEG_CODE = '''
import sys, time, json, os
sys.path.insert(0, "{root}")
from cordon_spark.session import get_spark
from cordon_spark.config import AnalysisConfig
from cordon_spark.datagen import TEMPLATES
from cordon_spark.plans.pipeline import analyze_transcripts
spark = get_spark("scaling_leg", master="{master}", shuffle_partitions={parts},
  extra_conf={{"spark.executor.cores": "{exec_cores}", "spark.cores.max": "{cores_max}",
              "spark.executor.memory": "8g", "spark.pyspark.python": sys.executable}})
t = spark.read.parquet("{data}")
cfg = AnalysisConfig(scorer="centroid", anomaly_percentile=0.02)
warm = analyze_transcripts(spark, t.sample(0.05, seed=1), cfg, templates=TEMPLATES)
warm.unpersist()
results = []
for trial in range({trials}):
    t0 = time.perf_counter()
    res = analyze_transcripts(spark, t, cfg, templates=TEMPLATES)
    n = res.counts["anomalous"] + res.counts["routine"]
    el = time.perf_counter() - t0
    res.unpersist()
    results.append({{"seconds": el, "turns": n, "tps": n / el}})
print("LEG_RESULT " + json.dumps(results))
'''


def _wait_port(port: int, timeout: float = 30.0) -> None:
    t0 = time.time()
    while time.time() - t0 < timeout:
        with socket.socket() as s:
            if s.connect_ex(("127.0.0.1", port)) == 0:
                return
        time.sleep(0.5)
    raise RuntimeError(f"port {port} never opened")


def start_cluster(worker_cores: int = 32, worker_mem: str = "64g") -> None:
    env = dict(
        os.environ,
        SPARK_MASTER_HOST="127.0.0.1",
        SPARK_LOG_DIR="/tmp/spark-standalone-logs",
        SPARK_WORKER_DIR="/tmp/spark-standalone-work",
        # executors take local dirs from the WORKER env in standalone
        # mode (app-level spark.local.dir is ignored); tmpfs — see
        # session.py note on the virtual-disk bottleneck
        SPARK_LOCAL_DIRS="/dev/shm/spark-local",
    )
    os.makedirs("/dev/shm/spark-local", exist_ok=True)
    subprocess.run([f"{SPARK_HOME}/sbin/start-master.sh"], env=env, check=True,
                   capture_output=True)
    _wait_port(7077)
    subprocess.run(
        [f"{SPARK_HOME}/sbin/start-worker.sh", MASTER_URL,
         "-c", str(worker_cores), "-m", worker_mem],
        env=env, check=True, capture_output=True,
    )
    time.sleep(2)


def stop_cluster() -> None:
    env = dict(os.environ, SPARK_LOG_DIR="/tmp/spark-standalone-logs")
    subprocess.run([f"{SPARK_HOME}/sbin/stop-worker.sh"], env=env, capture_output=True)
    subprocess.run([f"{SPARK_HOME}/sbin/stop-master.sh"], env=env, capture_output=True)


def bench_data(n_turns: int) -> str:
    sys.path.insert(0, str(ROOT))
    import bench

    return bench._transcripts_path(n_turns)


def run_leg(data: str, exec_cores: int, n_execs: int, trials: int) -> list[dict]:
    """One cluster-size leg, launched EXACTLY like the north rule's
    deployment: `spark-submit --py-files cordon_spark.zip driver.py`
    against the standalone master (executors import the package from
    the shipped zip, not the repo path)."""
    cores_max = exec_cores * n_execs
    code = LEG_CODE.format(
        root=ROOT, master=MASTER_URL, parts=max(cores_max, 8),
        exec_cores=exec_cores, cores_max=cores_max, data=data, trials=trials,
    )
    sys.path.insert(0, str(ROOT))
    from cordon_spark.session import package_zip

    zip_path = package_zip()
    driver = Path("/tmp/scaling_leg_driver.py")
    driver.write_text(code)
    out = subprocess.run(
        [
            f"{SPARK_HOME}/bin/spark-submit",
            "--master", MASTER_URL,
            "--py-files", zip_path,
            str(driver),
        ],
        capture_output=True, text=True,
        timeout=1500, cwd=str(ROOT), env=dict(os.environ),
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("LEG_RESULT ")]
    if not lines:
        sys.stderr.write(out.stdout[-1500:] + "\n" + out.stderr[-3000:])
        raise RuntimeError(f"leg failed ({n_execs} executors)")
    return json.loads(lines[-1][len("LEG_RESULT "):])


def main() -> None:
    n_turns = int(os.environ.get("SPARK_GRAFT_TURNS", "8000000"))
    exec_cores = int(os.environ.get("SCALE_EXEC_CORES", "2"))
    trials = int(os.environ.get("SCALE_TRIALS", "3"))
    data = bench_data(n_turns)
    start_cluster()
    try:
        small = run_leg(data, exec_cores, 1, trials)
        large = run_leg(data, exec_cores, 4, trials)
    finally:
        stop_cluster()

    best_s = max(small, key=lambda r: r["tps"])
    best_l = max(large, key=lambda r: r["tps"])
    eff = (best_l["tps"] / best_s["tps"]) / 4.0
    n_small, n_large = exec_cores, exec_cores * 4

    lines = [
        "",
        f"## Pipeline scaling legs, {time.strftime('%Y-%m-%d %H:%M')}",
        "",
        f"Input: synthetic transcripts, {best_s['turns']:,} turns (identical "
        "table both legs, 64 parquet part files).",
        "",
        "Job = end-to-end parse + window + embed + centroid-score + threshold",
        "+ merge + route pipeline (the BASELINE.json metric), on a REAL",
        "multi-executor Spark standalone cluster on this host, each leg",
        "launched with `spark-submit --py-files cordon_spark.zip` (the north",
        "rule's deployment: executors import the package from the shipped",
        f"zip), steady-state (full-width warmup, best of {trials} trials per leg).",
        "",
        "| cluster size | pipeline sec | turns/sec |",
        "|---|---|---|",
        f"| 1 executor x {exec_cores} cores (N={n_small}) "
        f"| {best_s['seconds']:.1f} | {best_s['tps']:,.0f} |",
        f"| 4 executors x {exec_cores} cores (4N={n_large}) "
        f"| {best_l['seconds']:.1f} | {best_l['tps']:,.0f} |",
        "",
        f"**Scaling efficiency (N={n_small} -> 4N={n_large} cores): {eff:.3f}**  "
        f"(target >= 0.8; speedup {best_l['tps'] / best_s['tps']:.2f}x on 4x cores)",
        "",
        "All trials:",
        "```json",
        json.dumps({"small": small, "large": large}),
        "```",
        "",
        f"Generated by scripts/scaling_bench.py at "
        f"{time.strftime('%Y-%m-%d %H:%M:%S')}.",
    ]
    # APPEND a dated section — never rewrite the file head (an earlier
    # version did, and silently dropped the whole measurement history;
    # the environment-caveats section at the top of BENCH.md is shared
    # context for every run and stays put)
    with open(ROOT / "BENCH.md", "a") as fh:
        fh.write("\n".join(lines) + "\n")
    print("\n".join(lines[:19]))


if __name__ == "__main__":
    main()
