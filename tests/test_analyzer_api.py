"""Drop-in SemanticLogAnalyzer API — mirrors the reference's
tests/test_integration.py suite 1:1 (same fixtures, same assertions)."""

import pytest

from cordon_spark.analyzer import AnalysisResult, SemanticLogAnalyzer
from cordon_spark.config import AnalysisConfig


def test_analyze_simple_log(spark, tmp_path):
    p = tmp_path / "simple.log"
    lines = [f"INFO: Normal operation {i}" for i in range(20)]
    lines += [
        "ERROR: Critical failure in subsystem A",
        "TRACE: Stack trace follows",
        "at module.function (file.py:123)",
    ]
    lines += [f"INFO: Normal operation {i}" for i in range(20)]
    p.write_text("\n".join(lines) + "\n")

    config = AnalysisConfig(window_size=5, k_neighbors=3, anomaly_percentile=0.1)
    result = SemanticLogAnalyzer(config, spark=spark).analyze_file_detailed(p)
    assert isinstance(result, AnalysisResult)
    assert result.total_windows > 0
    assert result.significant_windows > 0
    assert result.merged_blocks >= 0
    assert result.processing_time > 0
    assert "min" in result.score_distribution and "p90" in result.score_distribution
    assert result.output is not None and "<block lines=" in result.output


def test_analyze_empty_log(spark, tmp_path):
    p = tmp_path / "empty.log"
    p.write_text("")
    result = SemanticLogAnalyzer(AnalysisConfig(), spark=spark).analyze_file_detailed(p)
    assert result.total_windows == 0
    assert result.significant_windows == 0
    assert result.merged_blocks == 0
    assert result.output == ""


def test_analyze_single_line_log(spark, tmp_path):
    p = tmp_path / "one.log"
    p.write_text("Single log line\n")
    result = SemanticLogAnalyzer(AnalysisConfig(), spark=spark).analyze_file_detailed(p)
    assert result.total_windows == 1
    assert result.processing_time > 0


def test_analyze_with_different_configs(spark, tmp_path):
    p = tmp_path / "fifty.log"
    p.write_text("\n".join(f"Log line {i}" for i in range(50)) + "\n")
    r1 = SemanticLogAnalyzer(
        AnalysisConfig(anomaly_percentile=0.5), spark=spark
    ).analyze_file_detailed(p)
    r2 = SemanticLogAnalyzer(
        AnalysisConfig(anomaly_percentile=0.05), spark=spark
    ).analyze_file_detailed(p)
    assert r1.significant_windows >= r2.significant_windows


def test_analyze_file_simple_api(spark, tmp_path):
    p = tmp_path / "api.log"
    p.write_text("\n".join(f"Log line {i}" for i in range(10)) + "\n")
    out = SemanticLogAnalyzer(AnalysisConfig(), spark=spark).analyze_file(p)
    assert isinstance(out, str)


def test_nonexistent_file_raises_error(spark):
    with pytest.raises(FileNotFoundError):
        SemanticLogAnalyzer(AnalysisConfig(), spark=spark).analyze_file(
            "/nonexistent/file.log"
        )


def test_render_guard_bounds_library_collect(spark, tmp_path):
    """The library path must refuse an unbounded driver collect: with
    max_render_rows=0 any non-empty block set raises instead of
    collecting (the CLI --max-render-rows guard, ported)."""
    p = tmp_path / "guarded.log"
    lines = [f"INFO: Normal operation {i}" for i in range(20)]
    lines += ["ERROR: Critical failure in subsystem A"]
    p.write_text("\n".join(lines))
    cfg = AnalysisConfig(
        window_size=2, anomaly_percentile=0.3, extra={"max_render_rows": 0}
    )
    analyzer = SemanticLogAnalyzer(cfg, spark=spark)
    with pytest.raises(RuntimeError, match="max_render_rows"):
        analyzer.analyze_file(str(p))
