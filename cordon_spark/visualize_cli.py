"""Standalone visualization CLI (reference benchmark/visualize.py:492-652).

Two modes over the distributed plot-data functions in plans/visualize:

  # run the pipeline on a transcripts table and write plot artifacts
  python -m cordon_spark.visualize_cli DATASET [flags]
  python -m cordon_spark.visualize_cli --input transcripts.parquet [flags]

  # re-render a saved run's plots/*.json (no Spark session needed)
  python -m cordon_spark.visualize_cli --run-dir benchmark/runs/x/run_000

The pipeline mode mirrors the reference main's surface (dataset id via
the YAML manifest, --sample-size/--window-size/--k-neighbors/--model,
--output-dir) but computes the plot DATA distributed: score histogram
as one hash-agg, 2-D projection via deterministic distributed PCA
(umap-learn when importable — the reference's own fallback chain,
visualize.py:14-32). JSON artifacts always persist; figures render
only when matplotlib imports, same degrade path as the reference.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="cordon-spark-visualize",
        description="Visualize embedding space and score distributions",
    )
    p.add_argument("dataset", nargs="?", default=None,
                   help="dataset id from the manifest (or use --input/--run-dir)")
    p.add_argument("--manifest", default="benchmark/datasets.yaml",
                   help="YAML dataset manifest path")
    p.add_argument("--input", default=None,
                   help="transcripts table path (bypasses the manifest)")
    p.add_argument("--run-dir", default=None,
                   help="re-render a saved run directory's plots/*.json "
                        "instead of running the pipeline")
    p.add_argument("--sample-size", type=str, default="100000",
                   help="turns to analyze (int or 'full')")
    p.add_argument("--window-size", type=int, default=4)
    p.add_argument("--k-neighbors", type=int, default=5)
    p.add_argument("--model", default="hash",
                   help="embedding backend (reference --model)")
    p.add_argument("--scorer", default="knn", choices=["knn", "centroid"],
                   help="knn mirrors the reference visualize main's "
                        "compute_knn_scores; centroid is the scale path")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--output-dir", default="benchmark/results")
    p.add_argument("--master", default=None)
    return p


def rerender_run_dir(run_dir: str | Path) -> int:
    """Re-render a saved run's plot JSON (the `--run-dir` path: plot
    data persists with every run precisely so figures can be re-made
    on a machine that has matplotlib)."""
    from cordon_spark.plans.visualize import write_plot_artifacts

    plots = Path(run_dir) / "plots"
    if not plots.is_dir():
        print(f"ERROR: no plots/ directory under {run_dir}", file=sys.stderr)
        return 1
    data = {}
    for name in ("score_distribution", "template_coverage", "projection"):
        p = plots / f"{name}.json"
        if p.exists():
            data[name] = json.loads(p.read_text())
    if not data:
        print(f"ERROR: no plot JSON artifacts found in {plots}", file=sys.stderr)
        return 1
    written = write_plot_artifacts(
        Path(run_dir),
        score_dist=data.get("score_distribution"),
        coverage=data.get("template_coverage"),
        projection=data.get("projection"),
    )
    print(f"Re-rendered {len(written)} artifacts under {plots}")
    return 0


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if args.run_dir is not None:
        return rerender_run_dir(args.run_dir)
    if args.input is None and args.dataset is None:
        print("error: provide a DATASET id, --input, or --run-dir", file=sys.stderr)
        return 2

    from cordon_spark.config import AnalysisConfig
    from cordon_spark.plans.evaluate import contiguous_sample, load_dataset_config
    from cordon_spark.session import get_spark
    from cordon_spark.sources.transcripts import read_transcripts

    path = args.input
    if path is None:
        try:
            ds = load_dataset_config(args.dataset, args.manifest)
        except (OSError, ValueError) as exc:
            print(f"error: {exc}", file=sys.stderr)
            return 2
        # reference manifest shape: log_file is relative to extract_to
        path = (
            str(Path(ds["extract_to"]) / ds["log_file"])
            if "extract_to" in ds
            else ds["log_file"]
        )
        if not Path(path).exists():
            # reference visualize.py:543-545 / evaluate.py:914-917 hint
            print(f"ERROR: Dataset not found at {path}")
            print(f"       Run: python -m cordon_spark.download {args.dataset}")
            return 1

    try:
        sample_size = (
            None if args.sample_size.lower() == "full" else int(args.sample_size)
        )
    except ValueError:
        print(f"error: --sample-size must be an integer or 'full', got "
              f"{args.sample_size!r}", file=sys.stderr)
        return 2

    spark = get_spark("cordon_spark_visualize", master=args.master)
    try:
        turns = read_transcripts(spark, path)
    except Exception as exc:
        print(f"error: {path}: {exc}", file=sys.stderr)
        return 2
    if "is_anomaly" not in turns.columns:
        print("error: input is missing required column 'is_anomaly'",
              file=sys.stderr)
        return 2

    # Standalone scope mirrors the reference main (visualize.py:492-652):
    # window -> embed -> score -> label -> projection + score histogram.
    # Template coverage needs the full evaluation's block set and is
    # produced by `evaluate_cli --generate-plots`, exactly like the
    # reference's own "skipped in standalone" note (visualize.py:634-638).
    from pyspark.sql import functions as F

    from cordon_spark.functions.embeddings import create_embedder
    from cordon_spark.operators.scoring import (
        score_windows_centroid,
        score_windows_knn,
    )
    from cordon_spark.operators.windowing import segment_windows
    from cordon_spark.plans import visualize as V

    # --model takes either a backend id or (like the reference) a
    # sentence-transformers model name
    backends = ("hash", "sentence-transformers", "remote", "llama-cpp")
    cfg = AnalysisConfig(
        window_size=args.window_size,
        k_neighbors=args.k_neighbors,
        scorer=args.scorer,
        backend=args.model if args.model in backends else "sentence-transformers",
        model_name=args.model,
    )
    sampled = contiguous_sample(turns, sample_size, args.seed)
    windows = segment_windows(sampled, cfg)
    embedded = create_embedder(cfg)(windows, "content").drop("content").persist()
    try:
        if cfg.scorer == "centroid":
            scored = score_windows_centroid(
                spark, embedded.withColumn("signature", F.lit("?")), cfg
            )
        else:
            scored = score_windows_knn(spark, embedded, cfg)
        labeled = V.window_labels(scored, sampled).persist()
        score_dist = V.score_distribution_data(labeled)
        projection = V.projection_data(labeled, seed=args.seed)
        written = V.write_plot_artifacts(
            args.output_dir,
            score_dist=score_dist,
            projection=projection,
        )
        labeled.unpersist()
    finally:
        embedded.unpersist()
    print(f"Visualization complete! {len(written)} artifacts under "
          f"{Path(args.output_dir) / 'plots'}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
