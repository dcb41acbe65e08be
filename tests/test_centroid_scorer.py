"""Centroid-sketch scorer (the 10^12-scale path, SURVEY.md §7.5):
anomalies still surface, broadcast state is tiny, scores are
partition-invariant (within float tolerance of the partial-sum order)."""

import numpy as np

from cordon_spark.config import AnalysisConfig
from cordon_spark.datagen import TEMPLATES, generate_transcripts
from cordon_spark.plans.pipeline import analyze_transcripts


def _structured_corpus():
    """Centroid-scorer regime: conversations with REPEATED template
    structure (template = turn_idx % n, like real service logs), so
    window signatures have high support; anomaly bursts both break the
    signature and sit far from every centroid. Random-template corpora
    make every 4-gram signature a singleton — that regime belongs to the
    exact k-NN scorer, not the sketch."""
    import numpy as np
    import pandas as pd

    from cordon_spark.datagen import ANOMALY_TEXTS, _template_text

    rng = np.random.RandomState(17)
    rows = []
    truth = {}
    for c in range(8):
        conv = f"conv_{c:03d}"
        anom_at = 20 + 4 * c if c % 2 == 0 else None
        if anom_at is not None:
            truth[conv] = [(anom_at, anom_at + 2)]
        for t in range(80):
            if anom_at is not None and anom_at <= t <= anom_at + 2:
                text = ANOMALY_TEXTS[(c + t) % len(ANOMALY_TEXTS)]
            else:
                text = _template_text(rng, t % len(TEMPLATES))
            rows.append((conv, t, text))
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "text"])
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    return pdf, truth


def test_centroid_pipeline_finds_planted_anomalies(spark):
    pdf, truth = _structured_corpus()
    df = spark.createDataFrame(pdf)
    cfg = AnalysisConfig(scorer="centroid", anomaly_percentile=0.1)
    res = analyze_transcripts(spark, df, cfg, templates=TEMPLATES)
    blocks = res.blocks.toPandas()
    assert len(blocks) > 0
    hits = 0
    total = 0
    for conv, spans in truth.items():
        for s, e in spans:
            total += 1
            found = blocks[
                (blocks.conv_id == conv) & (blocks.start_idx <= e) & (blocks.end_idx >= s)
            ]
            hits += 1 if len(found) else 0
    assert hits == total
    res.unpersist()


def test_centroid_scores_partition_invariant(spark):
    pdf, _ = generate_transcripts(n_convs=4, mean_turns=40, seed=5, with_edge_cases=False)
    cfg = AnalysisConfig(scorer="centroid")
    outs = []
    for n in (2, 16):
        df = spark.createDataFrame(pdf).repartition(n)
        res = analyze_transcripts(spark, df, cfg, templates=TEMPLATES)
        got = (
            res.scored_windows.orderBy("conv_id", "window_id")
            .select("score")
            .toPandas()["score"]
            .to_numpy()
        )
        outs.append(got)
        res.unpersist()
    assert np.allclose(outs[0], outs[1], atol=1e-9)


def test_centroid_tree_reduce_matches_flat_merge(spark):
    """Above _TREE_FANIN input partitions the partial sums reduce
    executor-side first (two-level treeAggregate shape); the resulting
    sum/count maps must match the driver-only merge to float ulp."""
    import pandas as pd

    from cordon_spark.operators.scoring import _TREE_FANIN, template_centroids

    rng = np.random.RandomState(3)
    n = 4000
    pdf = pd.DataFrame(
        {
            "signature": [f"s{i % 7}" for i in range(n)],
            "embedding": [list(v) for v in rng.randn(n, 8)],
        }
    )
    base = spark.createDataFrame(pdf)
    flat_sums, flat_cnts = template_centroids(base.repartition(4), "signature")
    tree_sums, tree_cnts = template_centroids(
        base.repartition(_TREE_FANIN + 36), "signature"
    )
    assert flat_cnts == tree_cnts
    assert set(flat_sums) == set(tree_sums)
    for sig in flat_sums:
        assert np.allclose(flat_sums[sig], tree_sums[sig], atol=1e-9), sig


def test_knn_scorer_guard_refuses_above_limit(spark):
    """score_windows_knn collects the full matrix to the driver — it must
    refuse above cfg.knn_max_windows with a message pointing at the
    centroid scale path, so defaults can't OOM a driver at 10^12 turns."""
    import pandas as pd
    import pytest

    from cordon_spark.config import AnalysisConfig
    from cordon_spark.operators.scoring import score_windows_knn

    pdf = pd.DataFrame(
        {
            "conv_id": ["c"] * 8,
            "window_id": range(8),
            "embedding": [[1.0, 0.0]] * 8,
        }
    )
    windows = spark.createDataFrame(pdf)
    cfg = AnalysisConfig(knn_max_windows=5)
    with pytest.raises(ValueError, match="centroid"):
        score_windows_knn(spark, windows, cfg)
    # at or below the limit it scores normally
    ok = score_windows_knn(spark, windows, AnalysisConfig(knn_max_windows=8))
    assert ok.count() == 8


def test_centroid_without_templates_uses_global(spark, tiny_df):
    cfg = AnalysisConfig(scorer="centroid")
    res = analyze_transcripts(spark, tiny_df, cfg)  # no templates
    assert res.scored_windows.count() > 0
    assert (res.scored_windows.selectExpr("min(score)").first()[0] or 0.0) >= 0.0
    res.unpersist()
