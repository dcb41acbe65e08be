"""Evaluation CLI mirroring the reference benchmark harness's argparse
surface (reference benchmark/evaluate.py:809-965), Spark-backed:

    python -m cordon_spark.evaluate_cli DATASET [flags]
    python -m cordon_spark.evaluate_cli --input transcripts.parquet [flags]

DATASET resolves through a YAML manifest (reference datasets.yaml
shape; --manifest points at it and the dataset's `log_file` must be a
transcripts table readable by sources.transcripts with `is_anomaly` +
`template_id` columns). --resume requires --run-name and continues a
killed multi-run sweep from the first missing run (reference
:927-955, incl. the original seed reloaded from parameters.yaml and
the "Nothing to do." early exit)."""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="cordon-spark-evaluate",
        description="Evaluate the pipeline using template-based metrics",
    )
    p.add_argument("dataset", nargs="?", default=None,
                   help="dataset id from the manifest (or use --input)")
    p.add_argument("--manifest", default="benchmark/datasets.yaml",
                   help="YAML dataset manifest path")
    p.add_argument("--input", default=None,
                   help="transcripts table path (bypasses the manifest)")
    p.add_argument("--sample-size", type=str, default="100000",
                   help="turns to analyze per run (int or 'full')")
    p.add_argument("--window-size", type=int, default=4)
    p.add_argument("--k-neighbors", type=int, default=5)
    p.add_argument("--anomaly-percentile", type=float, default=0.1)
    p.add_argument("--scorer", default="centroid", choices=["knn", "centroid"])
    p.add_argument("--runs", type=int, default=1)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--rare-threshold", type=int, default=100)
    p.add_argument("--generate-plots", action="store_true")
    p.add_argument("--output-dir", default=None)
    p.add_argument("--run-name", default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--master", default=None)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if args.input is None and args.dataset is None:
        print("error: provide a DATASET id or --input", file=sys.stderr)
        return 2
    if args.resume and not args.run_name:
        # reference evaluate.py:929-931
        print("ERROR: --resume requires --run-name to specify which run to resume",
              file=sys.stderr)
        return 2
    if args.generate_plots and not (args.output_dir or args.run_name):
        # without an output dir there is nowhere to put the artifacts —
        # error instead of silently producing nothing
        print("error: --generate-plots requires --output-dir or --run-name",
              file=sys.stderr)
        return 2

    from cordon_spark.config import AnalysisConfig
    from cordon_spark.plans.evaluate import evaluate_runs, load_dataset_config
    from cordon_spark.session import get_spark
    from cordon_spark.sources.transcripts import read_transcripts

    path = args.input
    if path is None:
        try:
            ds = load_dataset_config(args.dataset, args.manifest)
        except (OSError, ValueError) as exc:
            print(f"error: {exc}", file=sys.stderr)
            return 2
        from pathlib import Path as _P

        # reference manifest shape: log_file is relative to extract_to
        # (evaluate.py:909-911); absolute/bare log_file also accepted
        path = (
            str(_P(ds["extract_to"]) / ds["log_file"])
            if "extract_to" in ds
            else ds["log_file"]
        )
        if not _P(path).exists():
            # reference evaluate.py:914-917 hint, pointing at the
            # download manager
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
    output_dir = None
    if args.output_dir or args.run_name:
        from pathlib import Path

        base = Path(args.output_dir) if args.output_dir else Path("benchmark/runs")
        output_dir = str(base / args.run_name) if args.run_name else str(base)
        if args.resume:
            run_dir = Path(output_dir)
            if not run_dir.exists():
                print(f"ERROR: Resume directory not found: {run_dir}", file=sys.stderr)
                return 2
            existing = sorted(run_dir.glob("run_*/results_run*.json"))
            if len(existing) >= args.runs:
                print(f"Resume: Already have {len(existing)} runs "
                      f"(target: {args.runs}). Nothing to do.")
                return 0

    spark = get_spark("cordon_spark_evaluate", master=args.master)
    try:
        turns = read_transcripts(spark, path)
    except Exception as exc:
        print(f"error: {path}: {exc}", file=sys.stderr)
        return 2
    missing = {"is_anomaly", "template_id"} - set(turns.columns)
    if missing:
        print(f"error: input is missing required columns {sorted(missing)}",
              file=sys.stderr)
        return 2
    cfg = AnalysisConfig(
        window_size=args.window_size,
        k_neighbors=args.k_neighbors,
        anomaly_percentile=args.anomaly_percentile,
        scorer=args.scorer,
    )
    from cordon_spark.datagen import TEMPLATES

    try:
        agg = evaluate_runs(
            spark,
            turns,
            cfg,
            templates=TEMPLATES if cfg.scorer == "centroid" else None,
            n_runs=args.runs,
            sample_size=sample_size,
            seed=args.seed,
            output_dir=output_dir,
            resume=args.resume,
            generate_plots=args.generate_plots,
            rare_threshold=args.rare_threshold,
        )
    except ValueError as exc:
        print(f"ERROR: {exc}", file=sys.stderr)
        return 2
    print(json.dumps(agg, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
