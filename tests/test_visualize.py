"""Visualization data layer (reference benchmark/visualize.py): the
distributed aggregations behind each plot, plus the JSON artifact
writer (figure rendering is import-gated on matplotlib, absent here)."""

import json

import numpy as np
import pytest
from pyspark.sql import functions as F

from cordon_spark.plans import visualize as V


@pytest.fixture(scope="module")
def scored(spark):
    rows = [
        ("c0", i, float(i) / 10.0, i >= 8, [float(i), float(-i), 1.0, 0.0])
        for i in range(10)
    ]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, score double, is_anomaly boolean, "
        "embedding array<double>"
    )


def test_score_distribution_bins_and_means(spark, scored):
    d = V.score_distribution_data(scored, n_bins=10)
    assert len(d["bins"]) == 11 and len(d["normal"]) == 10
    assert sum(d["normal"]) == 8 and sum(d["anomaly"]) == 2
    # means: normal scores 0.0..0.7, anomaly 0.8, 0.9
    assert d["normal_mean"] == pytest.approx(sum(i / 10 for i in range(8)) / 8)
    assert d["anomaly_mean"] == pytest.approx(0.85)
    # histogram totals survive any partitioning
    d2 = V.score_distribution_data(scored.repartition(7), n_bins=10)
    assert d2 == d


def test_score_distribution_empty(spark):
    empty = spark.createDataFrame([], "score double, is_anomaly boolean")
    d = V.score_distribution_data(empty)
    assert d["bins"] == [] and d["normal_mean"] is None


def test_template_coverage_detected_vs_missed(spark):
    turns = spark.createDataFrame(
        [
            ("c0", 0, True, "tA"),
            ("c0", 1, True, "tA"),
            ("c0", 5, True, "tB"),
            ("c0", 6, False, "tC"),  # not an anomaly template
        ],
        "conv_id string, turn_idx int, is_anomaly boolean, template_id string",
    )
    blocks = spark.createDataFrame(
        [("c0", 0, 2)], "conv_id string, start_idx int, end_idx int"
    )
    cov = V.template_coverage_data(turns, blocks)
    by_id = {c["template_id"]: c for c in cov}
    assert set(by_id) == {"tA", "tB"}  # only anomaly templates plotted
    assert by_id["tA"]["detected"] and by_id["tA"]["count"] == 2
    assert not by_id["tB"]["detected"]
    # sorted most-common first (reference bar order)
    assert cov[0]["template_id"] == "tA"


def test_pca_projection_deterministic_and_separating(spark):
    rng = np.random.default_rng(7)
    a = rng.normal(0.0, 0.1, (40, 8)) + np.array([3.0] + [0.0] * 7)
    b = rng.normal(0.0, 0.1, (40, 8)) - np.array([3.0] + [0.0] * 7)
    rows = [
        (f"c{i}", float(i % 3), i < 40, [float(x) for x in v])
        for i, v in enumerate(np.vstack([a, b]))
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, score double, is_anomaly boolean, embedding array<double>"
    )
    pts = V.projection_data(df, sample=100)
    assert len(pts) == 80 and pts[0]["method"] == "pca"
    # the first axis must separate the two blobs
    xa = [p["x"] for p in pts if p["label"]]
    xb = [p["x"] for p in pts if not p["label"]]
    assert (max(xa) < min(xb)) or (max(xb) < min(xa))
    # deterministic up to partial-merge float order: a different
    # partitioning moves the covariance (and thus the projection) only
    # at the last-ulp level; sign fix keeps orientation stable
    pts2 = V.projection_data(df.repartition(5), sample=100)
    a = np.array(sorted((p["x"], p["y"]) for p in pts))
    b = np.array(sorted((p["x"], p["y"]) for p in pts2))
    assert np.allclose(a, b, atol=1e-9)


def test_write_plot_artifacts_json_only(spark, scored, tmp_path, capsys):
    blocks = spark.createDataFrame(
        [("c0", 8, 9)], "conv_id string, start_idx int, end_idx int"
    )
    sd = V.score_distribution_data(scored)
    cov = V.template_coverage_data(
        scored.withColumn("template_id", F.lit("t0")), blocks
    )
    proj = V.projection_data(scored, sample=10)
    written = V.write_plot_artifacts(tmp_path, score_dist=sd, coverage=cov,
                                     projection=proj)
    names = {p.name for p in written}
    assert {"score_distribution.json", "template_coverage.json",
            "projection.json"} <= names
    # matplotlib absent in this sandbox -> degrade message, JSON persists
    assert "matplotlib not available" in capsys.readouterr().out
    loaded = json.loads((tmp_path / "plots" / "projection.json").read_text())
    assert len(loaded) == 10


def test_window_labels_any_turn_rule(spark):
    windows = spark.createDataFrame(
        [("c0", 0, 3, 0.1), ("c0", 4, 7, 0.9), ("c1", 0, 3, 0.2)],
        "conv_id string, start_idx int, end_idx int, score double",
    )
    turns = spark.createDataFrame(
        [("c0", 5, True), ("c0", 1, False), ("c1", 2, False)],
        "conv_id string, turn_idx int, is_anomaly boolean",
    )
    lab = {(r.conv_id, r.start_idx): r.is_anomaly
           for r in V.window_labels(windows, turns).collect()}
    assert lab == {("c0", 0): False, ("c0", 4): True, ("c1", 0): False}


def test_evaluate_runs_generate_plots(spark, tmp_path):
    """generate_plots emits the per-run plots/ artifacts (reference
    run-directory layout) without changing the metric output."""
    from cordon_spark.config import AnalysisConfig
    from cordon_spark.datagen import generate_transcripts
    from cordon_spark.plans.evaluate import evaluate_runs

    pdf, _ = generate_transcripts(n_convs=4, mean_turns=20, seed=9,
                                  with_edge_cases=False)
    pdf["is_anomaly"] = pdf.index % 17 == 0
    pdf["template_id"] = pdf["text"].str.split().str[0]
    turns = spark.createDataFrame(pdf)
    cfg = AnalysisConfig(window_size=4, anomaly_percentile=0.2)
    base = evaluate_runs(spark, turns, cfg, n_runs=1, seed=2, rare_threshold=10)
    out = evaluate_runs(spark, turns, cfg, n_runs=1, seed=2, rare_threshold=10,
                        output_dir=str(tmp_path), generate_plots=True)
    assert out == base
    plots = tmp_path / "run_000" / "plots"
    assert (plots / "score_distribution.json").exists()
    assert (plots / "template_coverage.json").exists()
