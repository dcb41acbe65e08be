"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line
{"metric", "value", "unit": "sec", "queries": {...}, "sf": ...}.

Headline: the end-to-end parse + score + route pipeline (the
BASELINE.json metric, turns/sec) over a synthetic transcripts table
sized to the scale factor (sf0.1 -> 2M turns), using the centroid-sketch
scorer — the 10^12-scale path (exact k-NN is O(n^2) by design and is
benchmarked separately on the embeddings table where n is small).

Extra keys beyond the driver contract: turns_per_sec, n_turns,
parallelism — used by scripts/scaling_bench.py for the N-vs-4N
scaling-efficiency evidence in BENCH.md.
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parent
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))

BENCH_CACHE = "/tmp/cordon_bench"


def _sf_of(sf_dir: str) -> float:
    name = pathlib.Path(sf_dir).name
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return 0.1


def _transcripts_path(n_turns: int, seed: int = 42) -> str:
    os.makedirs(BENCH_CACHE, exist_ok=True)
    path = f"{BENCH_CACHE}/transcripts_{n_turns}_{seed}"
    if not os.path.exists(f"{path}/_DONE"):
        from cordon_spark.datagen import generate_transcripts_fast, write_parquet

        # a real table is many files; one small parquet file = ONE scan
        # task no matter how many cores (Spark splits by byte ranges,
        # 128MB default) — measured: the whole map side ran on 2 cores.
        # 64 part files let every executor thread scan in parallel.
        os.makedirs(path, exist_ok=True)
        pdf = generate_transcripts_fast(n_turns, seed=seed)
        n_files = 64
        step = (len(pdf) + n_files - 1) // n_files
        for i in range(n_files):
            chunk = pdf.iloc[i * step : (i + 1) * step]
            if len(chunk):
                write_parquet(chunk, f"{path}/part-{i:04d}.parquet")
        open(f"{path}/_DONE", "w").write("ok")
    return path


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = _sf_of(sf_dir)
    n_turns = int(os.environ.get("SPARK_GRAFT_TURNS", max(int(20_000_000 * sf), 20_000)))

    from cordon_spark import entry_queries as Q
    from cordon_spark.config import AnalysisConfig
    from cordon_spark.datagen import TEMPLATES
    from cordon_spark.plans.pipeline import analyze_transcripts
    from cordon_spark.session import get_spark

    extra_conf = {}
    master = os.environ.get("SPARK_GRAFT_MASTER")  # e.g. spark://host:7077
    if master:
        # standalone cluster: executor processes sized by env
        extra_conf["spark.executor.cores"] = os.environ.get("SPARK_EXECUTOR_CORES", "8")
        extra_conf["spark.cores.max"] = str(cpus)
        extra_conf["spark.executor.memory"] = os.environ.get("SPARK_EXECUTOR_MEMORY", "8g")
        extra_conf["spark.pyspark.python"] = sys.executable
    spark = get_spark(
        "cordon_bench",
        master=master or f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
        arrow_batch=20_000,
        extra_conf=extra_conf,
    )
    tpath = _transcripts_path(n_turns)
    timings: dict[str, float] = {}
    extras: dict[str, float] = {}
    # host CPU-steal on this box swings identical runs 2-3x (BENCH.md);
    # best-of-N is the stable steady-state signal a long job would see.
    # The HEADLINE gets best-of-5: a single steal-band sample whipsawed
    # the round-3 driver record by 59% on byte-identical code, so the
    # headline number needs enough samples to punch through the band.
    repeats = int(os.environ.get("SPARK_GRAFT_REPEATS", "2"))
    headline_repeats = int(os.environ.get("SPARK_GRAFT_HEADLINE_REPEATS", "5"))

    # ---- headline: parse + window + embed + centroid-score + route ----
    transcripts = spark.read.parquet(tpath)
    # full-width warmup on a 5% sample: spawns + warms every python
    # worker (numpy/pandas/kernel imports) and the page cache, so the
    # timed run measures steady-state throughput — what a long-running
    # job sees — not one-time worker cold-start (measured 24s cold vs
    # 4.7s warm for the identical pass on 4 executors)
    warm_cfg = AnalysisConfig(scorer="centroid", anomaly_percentile=0.02)
    warm = analyze_transcripts(
        spark, transcripts.sample(0.05, seed=1), warm_cfg, templates=TEMPLATES
    )
    warm.unpersist()
    samples = []
    for _ in range(headline_repeats):
        t0 = time.perf_counter()
        cfg = AnalysisConfig(scorer="centroid", anomaly_percentile=0.02)
        res = analyze_transcripts(spark, transcripts, cfg, templates=TEMPLATES)
        n_routed = res.counts["anomalous"] + res.counts["routine"]
        elapsed = time.perf_counter() - t0
        res.unpersist()
        samples.append(elapsed)
    best = min(samples)
    samples.sort()
    timings["pipeline_centroid"] = best
    extras["turns_per_sec"] = n_routed / best if best else 0.0
    extras["n_turns"] = float(n_routed)
    # full disclosure of the steal band this run saw
    extras["headline_samples"] = [round(s, 3) for s in samples]
    extras["headline_median"] = samples[len(samples) // 2]

    # ---- exact k-NN pipeline at oracle scale (windows are few) --------
    timings["pipeline_knn_vec"] = min(
        _timed(lambda: Q.q_pipeline_blocks(spark, sf_dir).collect())
        for _ in range(repeats)
    )

    # ---- component headliners over the driver tables ------------------
    for name in (
        "knn_score",
        "window_segment",
        "dedup_minhash_lsh",
        "ann_topk",
        "token_count",
        "enrich_events",
        "tfidf_terms",
        "curate_corpus",
        "tpch_pricing_summary",
        "tpch_local_supplier_volume",
        "tpch_volume_shipping",
        "semdedup",
        "substring_dup_spans",
        "tpch_order_priority",
        "tpch_parts_supplier",
        "rolling_metrics",
        "funnel_steps",
        "cohort_retention",
    ):
        timings[name] = min(
            _timed(lambda: Q.QUERIES[name](spark, sf_dir).collect())
            for _ in range(repeats)
        )

    # ---- curation path at transcript scale (regex tier, 2M turns) ----
    from pyspark.sql import functions as F

    from cordon_spark.operators.curation import pii_scrub

    timings["pii_scrub_turns"] = min(
        _timed(
            lambda: pii_scrub(transcripts.select("text"))
            .agg(F.sum("n_emails"), F.sum("n_ips"), F.sum("n_phones"))
            .collect()
        )
        for _ in range(repeats)
    )

    total = sum(timings.values())
    print(
        json.dumps(
            {
                "metric": "bench_total_seconds",
                "value": round(total, 3),
                "unit": "sec",
                "queries": {k: round(v, 3) for k, v in timings.items()},
                "sf": sf,
                "parallelism": cpus,
                "turns_per_sec": round(extras["turns_per_sec"], 1),
                "n_turns": int(extras["n_turns"]),
                "headline_samples": extras["headline_samples"],
                "headline_median": round(extras["headline_median"], 3),
            }
        )
    )


if __name__ == "__main__":
    main()
