"""OP-7: interval merge via gaps-and-islands (merger.py:14-77).

The reference's sweep-line becomes the classic Spark window-function
pattern, partitioned per conversation:

  running_max_end = max(end_idx) over (partition by conv_id
                                       order by start_idx
                                       rows unbounded preceding to 1 preceding)
  new_island      = start_idx > running_max_end + 1      -- adjacency merges
  island_id       = sum(new_island) over (... to current row)
  block           = groupBy(conv_id, island_id)
                      .agg(min(start_idx), max(end_idx), max(score),
                           sort_array(collect_list(window_id)))

running-MAX (not lag) because kept intervals can nest when window sizes
vary. Adjacency rule `start <= current_end + 1` (merger.py:47) ->
`start_idx > running_max_end + 1` starts a new island. Scale: the
shuffle is on conv_id; significant windows are a small fraction
(anomaly_percentile) of all windows, so the sorted partitions are tiny.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def merge_blocks(
    significant: DataFrame,
    conv_col: str = "conv_id",
    start_col: str = "start_idx",
    end_col: str = "end_idx",
    id_col: str = "window_id",
    score_col: str = "score",
) -> DataFrame:
    """significant windows -> blocks(conv_id, start_idx, end_idx,
    original_windows: array<long>, max_score)."""
    w_order = W.partitionBy(conv_col).orderBy(F.col(start_col), F.col(end_col))
    prev_max_end = F.max(end_col).over(
        w_order.rowsBetween(W.unboundedPreceding, -1)
    )
    new_island = F.when(
        prev_max_end.isNull() | (F.col(start_col) > prev_max_end + 1), 1
    ).otherwise(0)
    with_island = significant.withColumn(
        "_island",
        F.sum(new_island).over(w_order.rowsBetween(W.unboundedPreceding, 0)),
    )
    return (
        with_island.groupBy(conv_col, "_island")
        .agg(
            F.min(start_col).alias("start_idx"),
            F.max(end_col).alias("end_idx"),
            F.sort_array(F.collect_list(F.col(id_col).cast("long"))).alias(
                "original_windows"
            ),
            F.max(score_col).alias("max_score"),
        )
        .drop("_island")
    )
