"""Streaming NEAR-duplicate detection: MinHash/LSH band buckets as
keyed state on a continuous document stream.

The batch twin is operators/dedup.minhash_lsh_pairs (shingle ->
minhash signature -> band buckets -> candidate pairs -> exact-Jaccard
verification). A stream cannot self-join globally, so the canonical
Structured Streaming shape is keyed state on the BAND BUCKET: each
arriving document computes its band signatures statelessly (the exact
batch hash family — md5 over the same distinct shingle set, so a doc
hashes to the same buckets whether it arrives in a batch job or on
the stream), shuffles once on (band, sig), and pairs against the
documents already resident in that bucket's state, verifying true
Jaccard over the stored shingle sets before emitting. Out-of-order
arrival does not change the PAIR SET — only which endpoint triggers
the emission — and (doc_a, doc_b) is always (min_id, max_id), so the
stream reproduces the batch pair set on the same corpus (asserted in
tests/test_streaming_neardup.py).

State per bucket is O(members x shingles) — the exact-verification
trade. Two levers bound it for unbounded streams: `ttl_minutes`
expires idle buckets (the watermark/TTL trade every streaming dedup
documents), and `max_bucket` hard-caps members per bucket (a
byte-identical boilerplate storm lands m copies in EVERY band bucket;
the batch tier defuses that with minhash_lsh_pairs_collapsed — on a
stream, chain dedup_stream (exact first-occurrence filter) IN FRONT
of this operator so exact dups never reach the LSH state, which is
the composition the module-level docs recommend).

A pair that collides in k > 1 bands is emitted k times (each bucket's
state is independent); `distinct_pairs_stream` is the first-occurrence
filter on the pair key. Spark does NOT allow two
applyInPandasWithState operators in one streaming query (multiple
arbitrary-stateful operators are an unsupported operation — the
AnalysisException names them), so compose it as a second hop: stage 1
writes pairs to an intermediate sink (parquet/Kafka), stage 2 streams
that sink through distinct_pairs_stream — exactly what
tests/test_streaming_neardup.py does.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from cordon_spark.operators.dedup import with_shingles

# shingles are space-joined runs of whitespace-split tokens, so "\n"
# can never occur inside one — safe join char for the state encoding
_SH_SEP = "\n"


def _band_signatures(
    docs: DataFrame,
    n: int,
    bands: int,
    rows: int,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """(id, band, sig, sh) — one row per (doc, band), stateless.

    Signature parity with the batch path (dedup.minhash_lsh_pairs):
    batch computes min(md5(f"{j}|{shingle}")) via an explode+groupBy
    (the map-side-combined spelling for a corpus pass); per-row
    array_min over the SAME distinct shingle array is the identical
    value without the aggregation — a stream-legal projection. The
    shingle array is materialized once behind with_shingles' Generate
    barrier, so the 16 hash functions scan it, not re-tokenize it.
    Docs with zero shingles (null/empty/whitespace-only text) drop
    here, exactly like the batch explode drops them."""
    nh = bands * rows
    sh = with_shingles(docs, n, text_col).select(F.col(id_col), "sh")
    sh = sh.filter(F.size("sh") > 0)
    mins = sh.select(
        id_col,
        "sh",
        *[
            F.array_min(
                F.transform(
                    F.col("sh"),
                    lambda s, j=j: F.md5(F.concat(F.lit(f"{j}|"), s)),
                )
            ).alias(f"m{j}")
            for j in range(nh)
        ],
    )
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).cast("long").alias("band"),
                F.concat_ws(
                    "|", *[f"m{b * rows + r}" for r in range(rows)]
                ).alias("sig"),
            )
            for b in range(bands)
        ]
    )
    return mins.select(
        id_col, "sh", F.explode(band_structs).alias("bs")
    ).select(
        id_col,
        F.col("bs.band").alias("band"),
        F.col("bs.sig").alias("sig"),
        "sh",
    )


def minhash_pairs_stream(
    docs: DataFrame,
    n: int = 3,
    bands: int = 8,
    rows: int = 2,
    verify_threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    ttl_minutes: int = 0,
    max_bucket: int = 0,
) -> DataFrame:
    """Near-dup pairs on a stream: output (doc_a, doc_b, jaccard) with
    doc_a < doc_b, Jaccard verified EXACTLY (same array-size formula as
    the batch _with_jaccard, so values match bitwise), threshold
    applied after verification like the batch path. Pairs colliding in
    several bands are emitted once per band — chain
    distinct_pairs_stream for the batch-identical distinct set.

    `ttl_minutes` > 0 expires idle buckets; `max_bucket` > 0 stops
    admitting members past the cap (emissions against existing members
    still happen; a warning row is not emitted — the cap is a
    documented state bound, not silent truncation: hot buckets are
    exact-dup storms the exact-dedup front filter should have
    removed)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    id_type = docs.schema[id_col].dataType
    out_schema = T.StructType(
        [
            T.StructField("doc_a", id_type),
            T.StructField("doc_b", id_type),
            T.StructField("jaccard", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("ids", T.ArrayType(id_type)),
            T.StructField("shs", T.ArrayType(T.StringType())),
        ]
    )
    ttl_ms = ttl_minutes * 60_000

    def update(key, pdfs: Iterator[pd.DataFrame], state):
        if state.hasTimedOut:
            state.remove()
            return
        rows_pd = pd.concat(list(pdfs), ignore_index=True)
        if state.exists:
            ids, shs = state.get
            ids, shs = list(ids), list(shs)
        else:
            ids, shs = [], []
        sets = [set(s.split(_SH_SEP)) if s else set() for s in shs]
        seen = set(ids)
        out_a, out_b, out_j = [], [], []
        for r in rows_pd.sort_values(id_col, kind="stable").itertuples():
            rid = getattr(r, id_col)
            if rid in seen:  # replay / duplicate delivery: idempotent
                continue
            rsh = list(r.sh)
            rset = set(rsh)
            for mid, mset in zip(ids, sets):
                isz = float(len(rset & mset))
                union = len(rset) + len(mset) - isz
                jac = isz / union if union > 0 else 0.0
                if jac >= verify_threshold:
                    a, b = (mid, rid) if mid < rid else (rid, mid)
                    out_a.append(a)
                    out_b.append(b)
                    out_j.append(jac)
            seen.add(rid)
            if max_bucket <= 0 or len(ids) < max_bucket:
                ids.append(rid)
                sets.append(rset)
                shs.append(_SH_SEP.join(rsh))
        state.update((ids, shs))
        if ttl_ms > 0:
            state.setTimeoutDuration(ttl_ms)
        if out_a:
            yield pd.DataFrame(
                {"doc_a": out_a, "doc_b": out_b, "jaccard": out_j}
            )

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms > 0
        else GroupStateTimeout.NoTimeout
    )
    sigs = _band_signatures(docs, n, bands, rows, id_col, text_col)
    return sigs.groupBy("band", "sig").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=timeout,
    )


def distinct_pairs_stream(
    pairs: DataFrame, ttl_minutes: int = 0
) -> DataFrame:
    """First-occurrence filter on the (doc_a, doc_b) pair key: collapses
    multi-band duplicate emissions (every emission of a pair carries
    the same exact-verified jaccard, so which one survives is
    immaterial). Same keyed-state shape as dedup.dedup_stream: O(1)
    state per distinct pair, TTL-bounded when requested."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    a_type = pairs.schema["doc_a"].dataType
    out_schema = T.StructType(
        [
            T.StructField("doc_a", a_type),
            T.StructField("doc_b", pairs.schema["doc_b"].dataType),
            T.StructField("jaccard", T.DoubleType()),
        ]
    )
    ttl_ms = ttl_minutes * 60_000

    def update(key, pdfs: Iterator[pd.DataFrame], state):
        if state.hasTimedOut:
            state.remove()
            return
        rows_pd = pd.concat(list(pdfs), ignore_index=True)
        emit = not state.exists
        state.update((True,))
        if ttl_ms > 0:
            state.setTimeoutDuration(ttl_ms)
        if emit and len(rows_pd):
            first = rows_pd.iloc[0]
            yield pd.DataFrame(
                {
                    "doc_a": [first["doc_a"]],
                    "doc_b": [first["doc_b"]],
                    "jaccard": [first["jaccard"]],
                }
            )

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms > 0
        else GroupStateTimeout.NoTimeout
    )
    return pairs.groupBy("doc_a", "doc_b").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=T.StructType([T.StructField("seen", T.BooleanType())]),
        outputMode="append",
        timeoutConf=timeout,
    )
