"""Streaming variants of the parse -> score -> route stages.

The reference is batch-only; this module is the graft's streaming
extension for continuously-arriving transcript turns: score each turn
against FROZEN broadcast state (centroids built by a batch run), route
by a fixed threshold to two sinks, and maintain watermarked per-window
anomaly counts. Stateless scoring + static broadcast state means the
streaming plan is a pure map — no state store needed; late data only
affects the windowed counts, which carry the watermark."""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from cordon_spark.config import AnalysisConfig


def score_turns_streaming(
    turns: DataFrame, centroid_map: dict, default: np.ndarray, cfg: AnalysisConfig
) -> DataFrame:
    """Per-TURN streaming scores: embed each turn, cosine distance to its
    template centroid (broadcast dict captured in the UDF closure)."""
    spark = turns.sparkSession
    bc = spark.sparkContext.broadcast((dict(centroid_map), np.asarray(default)))
    dim = cfg.embedding_dim

    @F.pandas_udf(T.DoubleType())
    def score_udf(texts: pd.Series, sigs: pd.Series) -> pd.Series:
        from cordon_spark import kernel

        cmap, dflt = bc.value
        emb = kernel.embed_texts(texts.fillna("").tolist(), dim)
        return pd.Series(
            kernel.centroid_scores(emb, sigs.fillna("?").tolist(), cmap, dflt)
        )

    return turns.withColumn(
        "score", score_udf(F.col("text"), F.coalesce("template_id", F.lit("?")))
    )


def route_stream(scored: DataFrame, threshold: float) -> DataFrame:
    """Threshold router as a streaming-safe projection (percentile must
    come from the batch side; streams can't sort globally)."""
    return scored.withColumn(
        "sink",
        F.when(F.col("score") >= F.lit(threshold), F.lit("anomalous")).otherwise(
            F.lit("routine")
        ),
    )


def windowed_anomaly_counts(
    routed: DataFrame, ts_col: str = "ts", window: str = "5 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Watermarked tumbling-time-window counts per sink (late rows beyond
    the watermark are dropped by the engine)."""
    return (
        routed.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), "sink")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "sink", "n")
    )
