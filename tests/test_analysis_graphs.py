"""Cross-run analysis layer (plans/analysis_graphs) + the
aggregated_results.json contract + the library-usage example."""

import json

import pytest

from cordon_spark.plans import analysis_graphs as AG


def _write_config(root, name, agg, runs):
    d = root / name
    for i, r in enumerate(runs):
        rd = d / f"run_{i:03d}"
        rd.mkdir(parents=True)
        (rd / f"results_run{i:03d}.json").write_text(json.dumps(r))
    (d / "aggregated_results.json").write_text(json.dumps(agg))
    return d


AGG_A = {"template_recall_mean": 0.8, "template_recall_std": 0.04,
         "rare_recall_mean": 0.6, "rare_recall_std": 0.1,
         "freq_weighted_mean": 0.7, "freq_weighted_std": 0.05}
AGG_B = {"template_recall_mean": 0.5, "template_recall_std": 0.2,
         "rare_recall_mean": 0.3, "rare_recall_std": 0.15,
         "freq_weighted_mean": 0.4, "freq_weighted_std": 0.2}


def test_scaling_and_comparison_data(tmp_path):
    _write_config(tmp_path, "50k", AGG_A,
                  [{"template_coverage": 0.78}, {"template_coverage": 0.82}])
    _write_config(tmp_path, "100k", AGG_B, [{"template_coverage": 0.5}])
    configs = {"50k": "50k", "100k": "100k", "1M": "1M"}  # 1M missing

    sc = AG.sample_size_scaling_data(tmp_path, configs)
    assert [r["label"] for r in sc["sizes"]] == ["50k", "100k"]
    assert sc["missing"] == ["1M"]
    assert sc["sizes"][0]["cv_pct"] == pytest.approx(5.0)
    assert sc["sizes"][0]["stable"] is True
    assert sc["sizes"][1]["cv_pct"] == pytest.approx(40.0)
    assert sc["sizes"][1]["stable"] is False  # > the reference's 15% bar

    cmp_ = AG.config_comparison_data(tmp_path, {"base": "50k", "tuned": "100k"})
    assert {r["label"] for r in cmp_["configs"]} == {"base", "tuned"}

    var = AG.variance_analysis_data(tmp_path, {"50k": "50k"})
    assert var["configs"][0]["runs"] == [0.78, 0.82]
    assert var["configs"][0]["mean"] == pytest.approx(0.80)


def test_nested_run_dir_fallback(tmp_path):
    """aggregated_results.json inside run_*/ resolves (reference
    generate_analysis_graphs.py:28-33)."""
    d = tmp_path / "cfg" / "run_000"
    d.mkdir(parents=True)
    (d / "aggregated_results.json").write_text(json.dumps(AGG_A))
    assert AG.load_aggregated_results(tmp_path / "cfg") == AGG_A
    with pytest.raises(FileNotFoundError):
        AG.load_aggregated_results(tmp_path / "nope")


def test_analysis_cli_end_to_end(tmp_path, capsys):
    _write_config(tmp_path, "a", AGG_A, [{"template_coverage": 0.8}])
    _write_config(tmp_path, "b", AGG_B, [{"template_coverage": 0.5}])
    rc = AG.main([str(tmp_path)])
    assert rc == 0
    for name in ("sample_size_scaling", "parameter_tuning_comparison",
                 "variance_analysis"):
        assert (tmp_path / f"{name}.json").exists()
    # empty dir refuses cleanly
    empty = tmp_path / "empty"
    empty.mkdir()
    assert AG.main([str(empty)]) == 1


def test_evaluate_runs_writes_aggregated_results(spark, tmp_path):
    """The sweep persists aggregated_results.json — the file the
    analysis layer (and the reference's graphs script) reads."""
    from cordon_spark.config import AnalysisConfig
    from cordon_spark.datagen import generate_transcripts
    from cordon_spark.plans.evaluate import evaluate_runs

    pdf, _ = generate_transcripts(n_convs=3, mean_turns=15, seed=6,
                                  with_edge_cases=False)
    pdf["is_anomaly"] = False
    pdf["template_id"] = pdf["text"].str.split().str[0]
    turns = spark.createDataFrame(pdf)
    out = tmp_path / "sweepagg"
    agg = evaluate_runs(spark, turns, AnalysisConfig(anomaly_percentile=0.2),
                        n_runs=1, sample_size=30, output_dir=str(out),
                        rare_threshold=10)
    on_disk = json.loads((out / "aggregated_results.json").read_text())
    assert on_disk == agg
    # and the analysis layer consumes the real layout end-to-end
    sc = AG.sample_size_scaling_data(tmp_path, {"sweep": "sweepagg"})
    assert sc["sizes"][0]["label"] == "sweep"


def test_library_usage_example(spark, capsys, monkeypatch):
    """The example runs end-to-end against the in-process session."""
    import importlib.util
    import sys
    from pathlib import Path

    ex = Path(__file__).resolve().parent.parent / "examples/library_usage.py"
    spec = importlib.util.spec_from_file_location("library_usage", ex)
    mod = importlib.util.module_from_spec(spec)
    monkeypatch.setattr(sys, "argv", [str(ex)])
    spec.loader.exec_module(mod)
    mod.main()
    out = capsys.readouterr().out
    assert "Anomalous blocks (percentile mode):" in out
    assert "Total windows:" in out
    assert "Range mode: exclude top 5%, keep next 10%" in out
