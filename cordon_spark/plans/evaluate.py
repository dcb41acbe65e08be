"""OP-13: evaluation harness ops (reference benchmark/evaluate.py).

Given routed/flagged blocks and per-turn template ground truth, computes
the reference's metric set as DataFrame aggregations:

  precision / recall / F1 over flagged turn sets   (evaluate.py:272-303)
  template coverage                                 (evaluate.py:306-326)
  rare-template recall (< rare_threshold occurrences) (evaluate.py:329-351)
  inverse-frequency-weighted recall                 (evaluate.py:354-369)

Flagged turns = turns inside any merged block (the flagged-range
extraction of evaluate.py:255-261, relationally: a broadcast range
join). All set algebra is joins/aggregations — no driver-side sets."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def flagged_turns(turns: DataFrame, blocks: DataFrame) -> DataFrame:
    """(conv_id, turn_idx) inside any block — broadcast range join."""
    b = blocks.select("conv_id", "start_idx", "end_idx").alias("b")
    t = turns.select("conv_id", "turn_idx").alias("t")
    return t.join(
        F.broadcast(b),
        (F.col("t.conv_id") == F.col("b.conv_id"))
        & F.col("t.turn_idx").between(F.col("b.start_idx"), F.col("b.end_idx")),
        "left_semi",
    ).select("conv_id", "turn_idx")


def turn_level_metrics(
    turns: DataFrame, blocks: DataFrame, label_col: str = "is_anomaly"
) -> dict:
    """Precision/recall/F1 of flagged turns vs boolean ground truth."""
    flagged = flagged_turns(turns, blocks).withColumn("flagged", F.lit(True))
    joined = turns.join(flagged, on=["conv_id", "turn_idx"], how="left").select(
        F.coalesce("flagged", F.lit(False)).alias("flagged"), F.col(label_col)
    )
    row = joined.agg(
        F.sum(F.when(F.col("flagged") & F.col(label_col), 1).otherwise(0)).alias("tp"),
        F.sum(F.when(F.col("flagged") & ~F.col(label_col), 1).otherwise(0)).alias("fp"),
        F.sum(F.when(~F.col("flagged") & F.col(label_col), 1).otherwise(0)).alias("fn"),
    ).first()
    tp, fp, fn = row["tp"] or 0, row["fp"] or 0, row["fn"] or 0
    precision = tp / (tp + fp) if tp + fp else 0.0
    recall = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {"tp": tp, "fp": fp, "fn": fn, "precision": precision, "recall": recall, "f1": f1}


def template_metrics(
    turns: DataFrame,
    blocks: DataFrame,
    template_col: str = "template_id",
    rare_threshold: int = 100,
) -> dict:
    """Template coverage + rare-template recall + inverse-frequency-
    weighted recall over turns carrying template attribution."""
    labeled = turns.filter(F.col(template_col).isNotNull())
    freq = labeled.groupBy(template_col).agg(F.count(F.lit(1)).alias("freq"))
    flagged = flagged_turns(turns, blocks)
    flagged_templates = (
        labeled.join(flagged, on=["conv_id", "turn_idx"], how="left_semi")
        .select(template_col)
        .distinct()
    )
    stats = (
        freq.join(
            flagged_templates.withColumn("hit", F.lit(True)), on=template_col, how="left"
        )
        .select(
            F.col("freq"),
            F.coalesce("hit", F.lit(False)).alias("hit"),
            (F.lit(1.0) / F.col("freq")).alias("w"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_templates"),
            F.sum(F.when(F.col("hit"), 1).otherwise(0)).alias("n_hit"),
            F.sum(F.when(F.col("freq") < rare_threshold, 1).otherwise(0)).alias("n_rare"),
            F.sum(
                F.when((F.col("freq") < rare_threshold) & F.col("hit"), 1).otherwise(0)
            ).alias("n_rare_hit"),
            F.sum("w").alias("w_total"),
            F.sum(F.when(F.col("hit"), F.col("w")).otherwise(0.0)).alias("w_hit"),
        )
        .first()
    )
    n_t = stats["n_templates"] or 0
    return {
        "n_templates": n_t,
        "template_coverage": (stats["n_hit"] / n_t) if n_t else 0.0,
        "rare_templates": stats["n_rare"] or 0,
        "rare_template_recall": (
            stats["n_rare_hit"] / stats["n_rare"] if stats["n_rare"] else 0.0
        ),
        "weighted_recall": (
            float(stats["w_hit"]) / float(stats["w_total"]) if stats["w_total"] else 0.0
        ),
    }
