"""Cross-run benchmark analysis (reference
benchmark/results/generate_analysis_graphs.py:1-582).

Reads the run directories an evaluation sweep leaves behind
(`aggregated_results.json` + `run_*/results_run*.json`, the same
layout plans/evaluate.evaluate_runs writes) and produces the
reference's four comparison analyses:

  1. sample-size scaling   (metric means/stds + CV% per sample size)
  2. config comparison     (baseline vs tuned parameter sets)
  3. threshold sensitivity (a config comparison over percentiles)
  4. variance / stability  (per-run scatter + CV classification)

Same split as plans/visualize: the DATA for every graph is computed
here and always persists as JSON; the matplotlib/seaborn rendering is
import-gated (neither ships in this sandbox — the reference's own
style). No Spark involved: this is post-hoc analysis of saved metric
files, exactly like the reference script.
"""

from __future__ import annotations

import json
from pathlib import Path

AGG_KEYS = [
    ("template_recall_mean", "template_recall_std", "Template Recall"),
    ("rare_recall_mean", "rare_recall_std", "Rare Template Recall"),
    ("freq_weighted_mean", "freq_weighted_std", "Frequency-Weighted Recall"),
]
STABLE_CV_PCT = 15.0  # reference's stability threshold (":161-166")


def load_aggregated_results(config_path: str | Path) -> dict:
    """aggregated_results.json from a config dir, with the reference's
    nested run_*/ fallback (generate_analysis_graphs.py:25-36)."""
    config_path = Path(config_path)
    results_file = config_path / "aggregated_results.json"
    if not results_file.exists():
        run_dirs = list(config_path.glob("run_*/aggregated_results.json"))
        if run_dirs:
            results_file = run_dirs[0]
        else:
            raise FileNotFoundError(
                f"No aggregated_results.json found in {config_path}"
            )
    return json.loads(results_file.read_text())


def load_individual_runs(config_path: str | Path) -> list[dict]:
    """Per-run metric dicts (generate_analysis_graphs.py:39-60)."""
    runs = []
    for run_dir in sorted(Path(config_path).glob("run_*")):
        for f in sorted(run_dir.glob("results_run*.json")):
            runs.append(json.loads(f.read_text()))
            break
    return runs


def _cv_pct(mean: float, std: float) -> float:
    return (std / mean * 100.0) if mean > 0 else 0.0


def sample_size_scaling_data(
    results_dir: str | Path, configs: dict[str, str]
) -> dict:
    """Metric means/stds + CV%% per sample size, configs = label ->
    relative config path ordered smallest first (the reference's
    50k..1M map, :66-72). Missing configs are skipped with a warning
    entry, like the reference's prints."""
    out: dict = {"sizes": [], "missing": []}
    for label, rel in configs.items():
        try:
            d = load_aggregated_results(Path(results_dir) / rel)
        except FileNotFoundError:
            out["missing"].append(label)
            continue
        row = {"label": label}
        for mean_key, std_key, _ in AGG_KEYS:
            row[mean_key] = d[mean_key]
            row[std_key] = d[std_key]
        row["cv_pct"] = _cv_pct(
            d["template_recall_mean"], d["template_recall_std"]
        )
        row["stable"] = row["cv_pct"] <= STABLE_CV_PCT
        out["sizes"].append(row)
    return out


def config_comparison_data(
    results_dir: str | Path, configs: dict[str, str]
) -> dict:
    """Side-by-side metric comparison of named configs — covers both
    the reference's parameter-tuning and threshold-sensitivity charts
    (:182-299), which are this shape with different config maps."""
    out: dict = {"configs": [], "missing": []}
    for label, rel in configs.items():
        try:
            d = load_aggregated_results(Path(results_dir) / rel)
        except FileNotFoundError:
            out["missing"].append(label)
            continue
        row = {"label": label}
        for mean_key, std_key, _ in AGG_KEYS:
            row[mean_key] = d[mean_key]
            row[std_key] = d[std_key]
        out["configs"].append(row)
    return out


def variance_analysis_data(
    results_dir: str | Path, configs: dict[str, str]
) -> dict:
    """Per-run scatter + CV stability classification per config
    (reference :302-420): the per-run template recalls, their spread,
    and whether the config clears the 15% CV bar."""
    out: dict = {"configs": [], "missing": []}
    for label, rel in configs.items():
        runs = load_individual_runs(Path(results_dir) / rel)
        if not runs:
            out["missing"].append(label)
            continue
        vals = [r["template_coverage"] for r in runs if "template_coverage" in r]
        if not vals:
            out["missing"].append(label)
            continue
        n = len(vals)
        mean = sum(vals) / n
        var = sum((v - mean) ** 2 for v in vals) / n
        std = var ** 0.5
        out["configs"].append(
            {
                "label": label,
                "runs": vals,
                "mean": mean,
                "std": std,
                "cv_pct": _cv_pct(mean, std),
                "stable": _cv_pct(mean, std) <= STABLE_CV_PCT,
            }
        )
    return out


def write_analysis_artifacts(
    output_dir: str | Path,
    scaling: dict | None = None,
    comparison: dict | None = None,
    sensitivity: dict | None = None,
    variance: dict | None = None,
) -> list[Path]:
    """JSON artifacts always; figures only when matplotlib imports
    (the reference hard-imports matplotlib+seaborn and simply cannot
    run here — the data layer is the useful part)."""
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    written: list[Path] = []
    for name, data in (
        ("sample_size_scaling", scaling),
        ("parameter_tuning_comparison", comparison),
        ("threshold_sensitivity", sensitivity),
        ("variance_analysis", variance),
    ):
        if data is None:
            continue
        p = out / f"{name}.json"
        p.write_text(json.dumps(data, indent=1))
        written.append(p)
    try:  # pragma: no cover - matplotlib absent in sandbox
        import matplotlib

        matplotlib.use("Agg")
        written += _render(out, scaling, comparison, sensitivity, variance)
    except ImportError:
        print("WARNING: matplotlib not available; wrote analysis JSON only.")
    return written


def _render(out, scaling, comparison, sensitivity, variance):  # pragma: no cover
    """Reference-styled figures (errorbar scaling grid, comparison
    bars, CV bars) — reachable only with matplotlib installed."""
    import matplotlib.pyplot as plt

    written = []
    if scaling and scaling["sizes"]:
        fig, axes = plt.subplots(2, 2, figsize=(16, 12))
        xs = list(range(len(scaling["sizes"])))
        labels = [r["label"] for r in scaling["sizes"]]
        for ax, (mk, sk, title) in zip(axes.flat, AGG_KEYS):
            ax.errorbar(
                xs,
                [r[mk] for r in scaling["sizes"]],
                yerr=[r[sk] for r in scaling["sizes"]],
                marker="o",
            )
            ax.set_xticks(xs)
            ax.set_xticklabels(labels)
            ax.set_title(title)
            ax.set_ylim(0, 1.0)
        cvs = [r["cv_pct"] for r in scaling["sizes"]]
        ax = axes[1, 1]
        ax.bar(xs, cvs, color=["green" if c <= STABLE_CV_PCT else "red" for c in cvs])
        ax.axhline(y=STABLE_CV_PCT, color="red", linestyle="--")
        ax.set_title("Stability: CV% per sample size")
        p = out / "sample_size_scaling.png"
        plt.savefig(p, dpi=300, bbox_inches="tight")
        plt.close()
        written.append(p)
    for name, data in (
        ("parameter_tuning_comparison", comparison),
        ("threshold_sensitivity", sensitivity),
    ):
        if not (data and data["configs"]):
            continue
        fig, axes = plt.subplots(1, 3, figsize=(16, 6))
        xs = list(range(len(data["configs"])))
        for ax, (mk, sk, title) in zip(axes, AGG_KEYS):
            ax.bar(
                xs,
                [r[mk] for r in data["configs"]],
                yerr=[r[sk] for r in data["configs"]],
                capsize=5,
            )
            ax.set_xticks(xs)
            ax.set_xticklabels([r["label"] for r in data["configs"]])
            ax.set_title(title)
            ax.set_ylim(0, 1.0)
        p = out / f"{name}.png"
        plt.savefig(p, dpi=300, bbox_inches="tight")
        plt.close()
        written.append(p)
    return written


def main(argv: list[str] | None = None) -> int:
    """CLI over a results tree: every immediate subdirectory holding
    run artifacts becomes one labeled config (reference main,
    :545-582, generalized — the reference hardcodes its published
    sweep names)."""
    import argparse

    p = argparse.ArgumentParser(
        prog="cordon-spark-analysis-graphs",
        description="Generate comparison analyses for benchmark sweeps",
    )
    p.add_argument("results_dir", help="directory containing sweep run dirs")
    p.add_argument("--output-dir", default=None,
                   help="where to write artifacts (default: results_dir)")
    args = p.parse_args(argv)

    results_dir = Path(args.results_dir)
    if not results_dir.is_dir():
        print(f"ERROR: {results_dir} is not a directory")
        return 1
    configs = {}
    for d in sorted(results_dir.iterdir()):
        if d.is_dir() and (
            (d / "aggregated_results.json").exists() or list(d.glob("run_*"))
        ):
            configs[d.name] = d.name
    if not configs:
        print(f"ERROR: no sweep config directories under {results_dir}")
        return 1
    out = Path(args.output_dir) if args.output_dir else results_dir
    written = write_analysis_artifacts(
        out,
        scaling=sample_size_scaling_data(results_dir, configs),
        comparison=config_comparison_data(results_dir, configs),
        variance=variance_analysis_data(results_dir, configs),
    )
    print(f"Wrote {len(written)} artifacts under {out}")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
