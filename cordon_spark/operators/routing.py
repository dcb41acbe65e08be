"""OP-8 (+graft router): blocks -> routed turn sinks + rendered blocks.

Router (north_rule): every turn inside any merged anomalous block routes
to the `anomalous` sink, everything else to `routine`. Spark spelling: a
RANGE JOIN of the (small) blocks table onto the (huge) turns table —
blocks are the post-threshold minority, so we BROADCAST them; the range
predicate `turn_idx between start_idx and end_idx` plus the conv_id
equi-key makes this a broadcast hash join with a residual filter — no
shuffle of the big side.

Formatting (formatter.py:15-68): the rendered `<block ...>` string uses
the RAW (unstripped) turn text — the reference re-reads the original
file (formatter.py:49-59) while windows scored rstripped text
(reader.py:25); we keep both columns (OP-9 parity note). The %.4f score
is rendered with PYTHON formatting inside a pandas UDF so golden strings
match the oracle byte-for-byte (Java's %.4f rounds half-up, Python
half-even)."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T


def route_turns(
    turns: DataFrame, blocks: DataFrame, text_col: str = "text"
) -> DataFrame:
    """turns + blocks -> (conv_id, turn_idx, text(raw), sink)."""
    b = blocks.select("conv_id", "start_idx", "end_idx").alias("b")
    t = turns.alias("t")
    # merged blocks are DISJOINT per conversation (merger invariant), so
    # each turn matches at most one block -> plain left broadcast join,
    # no dedup aggregation, no shuffle of the big side.
    joined = t.join(
        F.broadcast(b),
        (F.col("t.conv_id") == F.col("b.conv_id"))
        & F.col("t.turn_idx").between(F.col("b.start_idx"), F.col("b.end_idx")),
        "left",
    )
    return joined.select(
        F.col("t.conv_id").alias("conv_id"),
        F.col("t.turn_idx").alias("turn_idx"),
        F.col(f"t.{text_col}").alias("text"),
        *_extra_cols(turns, text_col),
        F.when(F.col("b.start_idx").isNotNull(), F.lit("anomalous"))
        .otherwise(F.lit("routine"))
        .alias("sink"),
    )


def _extra_cols(turns: DataFrame, text_col: str):
    """Carry every non-contract column (enrichment dims etc.) through
    the router unchanged — the north_star routes ENRICHED turns."""
    contract = {"conv_id", "turn_idx", text_col}
    return [
        F.col(f"t.{f.name}").alias(f.name)
        for f in turns.schema.fields
        if f.name not in contract
    ]


def route_turns_windowed(
    turns: DataFrame,
    significant: DataFrame,
    window_size: int,
    text_col: str = "text",
) -> DataFrame:
    """Scale-path router: EQUI-join on (conv_id, window_id) against the
    significant-window set instead of broadcasting merged blocks.

    Identical output to route_turns by construction: merged blocks are
    exactly the union of significant windows' [start_idx, end_idx]
    spans, and windows tile turn_idx contiguously — so `turn inside some
    block` <=> `turn's own window (turn_idx // window_size) is
    significant`. Use this when the anomalous fraction of a 10^12-turn
    input makes the block set too large to broadcast (p=0.02 at 10^12
    turns is ~10^10 block rows); the equi-join is a plain shuffle hash
    join on fine-grained keys — skew-safe, no driver/executor-memory
    ceiling. route_turns (broadcast range join, zero shuffle of the big
    side) stays the fast path while blocks fit a broadcast."""
    sig = significant.select("conv_id", "window_id").distinct().alias("s")
    t = turns.withColumn(
        "_wid", (F.col("turn_idx") / F.lit(window_size)).cast("long")
    ).alias("t")
    joined = t.join(
        sig,
        (F.col("t.conv_id") == F.col("s.conv_id"))
        & (F.col("t._wid") == F.col("s.window_id")),
        "left",
    )
    return joined.select(
        F.col("t.conv_id").alias("conv_id"),
        F.col("t.turn_idx").alias("turn_idx"),
        F.col(f"t.{text_col}").alias("text"),
        *_extra_cols(turns, text_col),
        F.when(F.col("s.window_id").isNotNull(), F.lit("anomalous"))
        .otherwise(F.lit("routine"))
        .alias("sink"),
    )


def split_sinks(routed: DataFrame) -> tuple[DataFrame, DataFrame]:
    anomalous = routed.filter(F.col("sink") == "anomalous")
    routine = routed.filter(F.col("sink") == "routine")
    return anomalous, routine


def sink_counts(routed: DataFrame) -> dict[str, int]:
    rows = routed.groupBy("sink").count().collect()
    counts = {"anomalous": 0, "routine": 0}
    for r in rows:
        counts[r["sink"]] = r["count"]
    return counts


_BLOCK_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("start_idx", T.IntegerType()),
        T.StructField("end_idx", T.IntegerType()),
        T.StructField("max_score", T.DoubleType()),
        T.StructField("block_text", T.StringType()),
    ]
)


def render_blocks(
    turns: DataFrame, blocks: DataFrame, text_col: str = "text", index_base: int = 0
) -> DataFrame:
    """blocks + raw turn text -> rendered reference-format block strings.

    Broadcast range join pulls each block's raw lines; the per-block
    ordered join + Python %.4f rendering happens in one grouped pandas
    UDF over (conv_id, start_idx) groups (each group is <= a few
    window_size spans of lines).

    index_base shifts the rendered `lines="a-b"` numbers: log-file
    inputs carry turn_idx = line_no - 1, and the reference renders
    1-INDEXED line numbers (formatter.py:54) — pass index_base=1 there;
    transcript tables keep their native 0-based turn indices."""
    b = blocks.select("conv_id", "start_idx", "end_idx", "max_score").alias("b")
    t = turns.select("conv_id", "turn_idx", F.col(text_col).alias("_raw")).alias("t")
    joined = t.join(
        F.broadcast(b),
        (F.col("t.conv_id") == F.col("b.conv_id"))
        & F.col("t.turn_idx").between(F.col("b.start_idx"), F.col("b.end_idx")),
        "inner",
    ).select(
        F.col("t.conv_id").alias("conv_id"),
        F.col("b.start_idx").alias("start_idx"),
        F.col("b.end_idx").alias("end_idx"),
        F.col("b.max_score").alias("max_score"),
        F.col("t.turn_idx").alias("turn_idx"),
        F.col("_raw"),
    )

    def render(pdf: pd.DataFrame) -> pd.DataFrame:
        from cordon_spark import kernel

        pdf = pdf.sort_values("turn_idx")
        head = pdf.iloc[0]
        text = kernel.format_block(
            int(head["start_idx"]) + index_base,
            int(head["end_idx"]) + index_base,
            float(head["max_score"]),
            [x if x is not None else "" for x in pdf["_raw"].tolist()],
        )
        return pd.DataFrame(
            {
                "conv_id": [head["conv_id"]],
                "start_idx": [int(head["start_idx"])],
                "end_idx": [int(head["end_idx"])],
                "max_score": [float(head["max_score"])],
                "block_text": [text],
            }
        )

    return joined.groupBy("conv_id", "start_idx").applyInPandas(render, _BLOCK_SCHEMA)
