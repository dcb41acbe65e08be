#!/usr/bin/env python3
"""Library usage example (reference examples/library_usage.py:1-58),
Spark-backed: the drop-in SemanticLogAnalyzer API over a local
SparkSession. Run from the repo root:

    python examples/library_usage.py [LOG_FILE]

With no argument a small synthetic transcript log is generated."""

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from cordon_spark.analyzer import SemanticLogAnalyzer
from cordon_spark.config import AnalysisConfig


def main() -> None:
    if len(sys.argv) > 1:
        log_path = Path(sys.argv[1])
    else:
        # synthesize a small log so the example is self-contained
        from cordon_spark.datagen import generate_transcripts

        pdf, _ = generate_transcripts(n_convs=2, mean_turns=60, seed=3)
        log_path = Path(tempfile.mkdtemp()) / "sample.log"
        log_path.write_text("\n".join(pdf["text"].fillna("")) + "\n")

    # Example 1: percentile mode (default) — keep top 10% most anomalous
    config = AnalysisConfig(
        window_size=4,
        k_neighbors=5,
        anomaly_percentile=0.1,
        batch_size=32,
        device="cpu",  # informational on CPU executors
    )
    analyzer = SemanticLogAnalyzer(config)

    output = analyzer.analyze_file(log_path)
    print("Anomalous blocks (percentile mode):")
    print(output)

    result = analyzer.analyze_file_detailed(log_path)
    print("\nStatistics:")
    print(f"  Total windows: {result.total_windows}")
    print(f"  Significant windows: {result.significant_windows}")
    print(f"  Processing time: {result.processing_time:.2f}s")
    print("\nScore distribution:")
    print(f"  Mean: {result.score_distribution['mean']:.4f}")
    print(f"  Max: {result.score_distribution['max']:.4f}")

    # Example 2: range mode — exclude top 5%, keep next 10%
    print("\n" + "=" * 60)
    print("Range mode: exclude top 5%, keep next 10%")
    print("=" * 60)
    config_range = AnalysisConfig(
        window_size=4,
        k_neighbors=5,
        anomaly_range_min=0.05,
        anomaly_range_max=0.15,
        device="cpu",
    )
    result_range = SemanticLogAnalyzer(config_range).analyze_file_detailed(log_path)
    print(f"  Significant windows: {result_range.significant_windows}")
    print("  (Excludes the most extreme anomalies, focuses on moderate ones)")


if __name__ == "__main__":
    main()
