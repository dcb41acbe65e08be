"""The correctness gate (SURVEY.md §7.4): Spark pipeline vs numpy oracle.

Exact anomaly-set equality, per-sink counts, routed-row / per-turn text
equality under (conv_id, turn_idx) ordering, partition invariance, and
golden formatted blocks — on the deterministic synthetic fixture."""

import numpy as np
import pandas as pd
import pytest

from cordon_spark.config import AnalysisConfig
from cordon_spark.operators.routing import render_blocks
from cordon_spark.oracle import run_oracle
from cordon_spark.plans.pipeline import analyze_transcripts

CFGS = [
    AnalysisConfig(),  # defaults: w4 k5 p0.1
    AnalysisConfig(window_size=5, k_neighbors=10, anomaly_percentile=0.02),
    AnalysisConfig(window_size=2, k_neighbors=3, anomaly_percentile=0.5),
    AnalysisConfig(anomaly_range_min=0.05, anomaly_range_max=0.15),  # band mode
]


def _block_set(blocks_pdf):
    return {
        (r.conv_id, int(r.start_idx), int(r.end_idx), round(float(r.max_score), 4))
        for r in blocks_pdf.itertuples()
    }


@pytest.mark.parametrize("cfg", CFGS, ids=["default", "w5k10p02", "w2k3p50", "band"])
def test_exact_parity(spark, tiny_transcripts, tiny_df, cfg):
    pdf, _ = tiny_transcripts
    oracle = run_oracle(pdf, cfg)
    res = analyze_transcripts(spark, tiny_df, cfg)

    # scores: exact per-window equality
    got = (
        res.scored_windows.orderBy("conv_id", "window_id")
        .select("conv_id", "window_id", "score")
        .toPandas()
    )
    exp = oracle.windows[["conv_id", "window_id", "score"]].reset_index(drop=True)
    assert len(got) == len(exp)
    assert (got.conv_id == exp.conv_id).all()
    assert np.allclose(got.score.to_numpy(), exp.score.to_numpy(), atol=1e-12)

    # thresholds
    if oracle.threshold_lower is not None:
        assert np.isclose(res.threshold_lower, oracle.threshold_lower, atol=1e-12)
    if oracle.threshold_upper is not None:
        assert np.isclose(res.threshold_upper, oracle.threshold_upper, atol=1e-12)

    # anomaly set: exact block equality
    got_blocks = res.blocks.toPandas()
    assert _block_set(got_blocks) == _block_set(oracle.blocks)

    # per-sink counts + routed-row text equality under stable ordering
    assert res.counts["anomalous"] == oracle.stats["anomalous_turns"]
    assert res.counts["routine"] == oracle.stats["routine_turns"]
    got_routed = (
        res.routed.orderBy("conv_id", "turn_idx")
        .select("conv_id", "turn_idx", "text", "sink")
        .toPandas()
        .reset_index(drop=True)
    )
    exp_routed = oracle.routing.reset_index(drop=True)
    pd.testing.assert_frame_equal(got_routed, exp_routed, check_dtype=False)

    # score distribution stats
    for key in ("min", "max", "mean", "median", "p90"):
        assert np.isclose(res.stats[key], oracle.stats[key], atol=1e-12), key


def test_formatted_blocks_golden(spark, tiny_transcripts, tiny_df):
    pdf, _ = tiny_transcripts
    cfg = AnalysisConfig()
    oracle = run_oracle(pdf, cfg)
    res = analyze_transcripts(spark, tiny_df, cfg)
    rendered = (
        render_blocks(tiny_df, res.blocks)
        .orderBy("conv_id", "start_idx")
        .select("conv_id", "block_text")
        .collect()
    )
    exp = sorted(oracle.formatted)
    got = sorted((r.conv_id, r.block_text) for r in rendered)
    assert got == exp  # byte-identical reference-format rendering
    for _, text in got:
        assert text.startswith("<block lines=")


def test_partition_count_invariance(spark, tiny_transcripts):
    pdf, _ = tiny_transcripts
    cfg = AnalysisConfig()
    results = []
    for n in (2, 16):
        df = spark.createDataFrame(pdf).repartition(n)
        res = analyze_transcripts(spark, df, cfg)
        results.append(_block_set(res.blocks.toPandas()))
    assert results[0] == results[1]


def test_empty_input(spark):
    cfg = AnalysisConfig()
    schema = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    empty = spark.createDataFrame([], schema)
    res = analyze_transcripts(spark, empty, cfg)
    assert res.scored_windows.count() == 0
    assert res.blocks.count() == 0
    assert res.stats["min"] == 0.0


def test_percentile_monotonicity(spark, tiny_transcripts, tiny_df):
    # higher percentile keeps >= windows (reference test_integration.py:80-101)
    pdf, _ = tiny_transcripts
    kept = []
    for p in (0.05, 0.1, 0.3):
        res = analyze_transcripts(spark, tiny_df, AnalysisConfig(anomaly_percentile=p))
        kept.append(res.significant.count())
    assert kept[0] <= kept[1] <= kept[2]


def test_planted_anomalies_found(spark):
    # integration semantics (reference tests/test_integration.py:12-44):
    # repetitive turns + unique error burst -> burst flagged
    from cordon_spark.datagen import generate_transcripts

    pdf, truth = generate_transcripts(
        n_convs=4, mean_turns=60, seed=3, anomaly_conv_frac=0.9, with_edge_cases=False
    )
    assert truth.anomalies  # at least one planted burst
    spark_df = spark.createDataFrame(pdf)
    res = analyze_transcripts(spark, spark_df, AnalysisConfig(anomaly_percentile=0.1))
    blocks = res.blocks.toPandas()
    found = 0
    for conv, spans in truth.anomalies.items():
        for s, e in spans:
            hit = blocks[
                (blocks.conv_id == conv)
                & (blocks.start_idx <= e)
                & (blocks.end_idx >= s)
            ]
            found += 1 if len(hit) else 0
    total = sum(len(v) for v in truth.anomalies.values())
    assert found == total  # every planted burst overlapped by a block


def test_salted_repartition_same_result(spark, tiny_transcripts, tiny_df):
    # cfg.salt_buckets forces an explicit pre-window repartition (the
    # long-conversation skew hook); results must be identical
    pdf, _ = tiny_transcripts
    base = analyze_transcripts(spark, tiny_df, AnalysisConfig())
    salted = analyze_transcripts(spark, tiny_df, AnalysisConfig(salt_buckets=7))
    assert _block_set(base.blocks.toPandas()) == _block_set(salted.blocks.toPandas())
    assert base.counts == salted.counts


def test_windowed_router_equals_broadcast_router(spark, tiny_transcripts, tiny_df):
    """The equi-join scale router must route every turn identically to
    the broadcast range-join router (blocks are exactly the union of
    significant windows' spans), including when forced in the pipeline
    via broadcast_blocks_limit=0."""
    from cordon_spark.operators.routing import route_turns, route_turns_windowed

    cfg = AnalysisConfig()
    res = analyze_transcripts(spark, tiny_df, cfg)
    try:
        a = route_turns(tiny_df, res.blocks)
        b = route_turns_windowed(tiny_df, res.significant, cfg.window_size)
        ra = {(r.conv_id, r.turn_idx, r.text, r.sink) for r in a.collect()}
        rb = {(r.conv_id, r.turn_idx, r.text, r.sink) for r in b.collect()}
        assert ra == rb
        counts = dict(res.counts)
    finally:
        res.unpersist()

    # pipeline with the broadcast path disabled routes identically
    res0 = analyze_transcripts(
        spark, tiny_df, AnalysisConfig(broadcast_blocks_limit=0)
    )
    try:
        assert res0.counts == counts
        r0 = {
            (r.conv_id, r.turn_idx, r.text, r.sink) for r in res0.routed.collect()
        }
        assert r0 == ra
    finally:
        res0.unpersist()
