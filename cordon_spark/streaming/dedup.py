"""Streaming exact deduplication: emit only the FIRST occurrence of
each content digest on a continuous document stream.

The batch twin is operators/dedup.exact_dedup (one hash agg); a stream
cannot group globally, so the canonical Structured Streaming shape is
keyed state: shuffle once on the digest, keep O(1) state per distinct
digest ("seen"), and drop every later arrival. applyInPandasWithState
with a processing-time TTL bounds the state for unbounded streams —
after `ttl` of silence a digest is forgotten (and a much-later
duplicate would re-emit), the standard watermark/TTL trade every
streaming dedup documents (Kafka Streams, Flink dedup do the same).

At 100 TB-equivalent stream rates this is the only shape that works:
state is per-DISTINCT-key (bounded by TTL), the shuffle key is the
digest (uniform by construction — md5 — so no skew), and each
micro-batch does one keyed pass.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

_STATE_SCHEMA = "seen boolean"


def dedup_stream(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ttl_minutes: int = 0,
) -> DataFrame:
    """First-occurrence filter on (digest of `text_col`): within one
    micro-batch, the smallest `id_col` wins (deterministic — arrival
    order inside a batch is not); across batches, state wins.
    `ttl_minutes` > 0 expires idle digests (bounded state for unbounded
    streams); 0 keeps state forever (exact dedup, growing state).

    Output schema: (digest, <id_col>, <text_col>) — the survivor row;
    the id/text field types are taken from the input schema, so string
    or composite-friendly id columns work, not just longs."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = T.StructType(
        [
            T.StructField("digest", T.StringType()),
            T.StructField(id_col, docs.schema[id_col].dataType),
            T.StructField(text_col, docs.schema[text_col].dataType),
        ]
    )
    ttl_ms = ttl_minutes * 60_000

    def update(key, pdfs: Iterator[pd.DataFrame], state):
        if state.hasTimedOut:
            state.remove()
            return
        rows = pd.concat(list(pdfs), ignore_index=True)
        if state.exists:
            first = None  # digest already emitted in an earlier batch
        else:
            # sort_values (not idxmin) so string ids order correctly too
            first = rows.sort_values(id_col, kind="stable").iloc[0]
            state.update((True,))
        if ttl_ms > 0:
            state.setTimeoutDuration(ttl_ms)
        if first is not None:
            yield pd.DataFrame(
                {
                    "digest": [key[0]],
                    id_col: [first[id_col]],
                    text_col: [first[text_col]],
                }
            )

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout if ttl_ms > 0
        else GroupStateTimeout.NoTimeout
    )
    withd = docs.withColumn(
        "digest", F.md5(F.coalesce(F.col(text_col), F.lit("")))
    )
    return (
        withd.groupBy("digest")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=timeout,
        )
    )
