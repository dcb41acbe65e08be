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


SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.StringType()),
        T.StructField("session_start_us", T.LongType()),
        T.StructField("session_end_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("value_sum", T.DoubleType()),
    ]
)

_SESSION_STATE_SCHEMA = "start_us long, end_us long, n long, vsum double"


def sessionize_stream(
    events: DataFrame,
    gap_seconds: int = 1800,
    ts_col: str = "ts",
    user_col: str = "user_id",
    watermark: str = "30 minutes",
) -> DataFrame:
    """STREAMING gap sessionization via applyInPandasWithState — the
    custom stateful operator the batch operators.events.sessionize
    mirrors (same gap semantics): per user, events within `gap_seconds`
    of the running session extend it; a larger gap (or state timeout at
    the watermark) closes and EMITS the session.

    State is O(1) per user (bounds, count, sum); the stream shuffles
    once on the user key — the canonical keyed-state shape that holds at
    any executor count. Timeout = event-time, so sessions close exactly
    when the watermark passes their gap horizon; late rows beyond the
    watermark are dropped by the engine."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_us = gap_seconds * 1_000_000

    def update(key, pdfs, state):
        user = key[0]
        if state.hasTimedOut:
            start_us, end_us, n, vsum = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user],
                    "session_start_us": [start_us],
                    "session_end_us": [end_us],
                    "n_events": [n],
                    "value_sum": [vsum],
                }
            )
            return
        rows = pd.concat(list(pdfs), ignore_index=True)
        ser = rows[ts_col]
        if getattr(ser.dt, "tz", None) is not None:
            ser = ser.dt.tz_localize(None)
        us = (ser.astype("int64") // 1000).to_numpy()  # ns -> us
        order = np.argsort(us, kind="stable")
        us = us[order]
        vals = rows["value"].to_numpy()[order]
        if state.exists:
            start_us, end_us, n, vsum = state.get
        else:
            start_us = end_us = n = vsum = None  # no open session yet
        closed = []
        for t, v in zip(us, vals):
            if start_us is None:
                start_us, end_us, n, vsum = int(t), int(t), 1, float(v)
            elif t - end_us > gap_us:
                closed.append((start_us, end_us, n, vsum))
                start_us, end_us, n, vsum = int(t), int(t), 1, float(v)
            else:
                end_us = max(end_us, int(t))
                n += 1
                vsum += float(v)
        state.update((int(start_us), int(end_us), int(n), float(vsum)))
        # close the open session once the watermark passes its gap
        state.setTimeoutTimestamp((end_us + gap_us) // 1000)  # ms
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user] * len(closed),
                    "session_start_us": [c[0] for c in closed],
                    "session_end_us": [c[1] for c in closed],
                    "n_events": [c[2] for c in closed],
                    "value_sum": [c[3] for c in closed],
                }
            )

    # watermarks require TIMESTAMP (tz-aware); parquet NTZ columns cast up
    events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(user_col)
        .applyInPandasWithState(
            update,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
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
