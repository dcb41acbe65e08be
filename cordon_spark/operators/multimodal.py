"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side machinery (schemas, Arrow batch shape, mapInPandas
signatures, partitioning) is real and tested; the actual media DECODE is
stubbed behind a clearly-marked seam because no image/audio libraries
exist in this container — `decode_fn=None` raises NotImplementedError,
and tests inject a deterministic fake decoder."""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("content_md5", T.StringType(), False),
        T.StructField("features", T.ArrayType(T.DoubleType()), True),
    ]
)


def binary_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Cheap JVM-side metadata over the opaque payload: byte length +
    content digest. No decode, fully pushdown-friendly."""
    return df.withColumn("n_bytes", F.octet_length(payload_col).cast("long")).withColumn(
        "content_md5", F.md5(F.col(payload_col))
    )


def _default_decode(kind: str, payload: bytes):  # the stub seam
    raise NotImplementedError(
        "media decode requires image/audio libraries not present in this "
        "container; inject decode_fn (tests use a deterministic fake)"
    )


def extract_features(
    media: DataFrame,
    decode_fn: Callable[[str, bytes], np.ndarray] | None = None,
    feature_dim: int = 8,
) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches, decoder
    state loaded once per worker). decode_fn(kind, payload) -> 1-D
    np.ndarray; None -> the NotImplementedError stub."""
    decode = decode_fn or _default_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            feats, nbytes, digests = [], [], []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                raw = bytes(payload) if payload is not None else b""
                nbytes.append(len(raw))
                digests.append(hashlib.md5(raw).hexdigest())
                vec = decode(kind, raw)
                feats.append(
                    None if vec is None else np.asarray(vec, dtype=np.float64)[:feature_dim]
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pd.Series(nbytes, dtype="int64"),
                    "content_md5": digests,
                    "features": feats,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def fake_decoder(kind: str, payload: bytes) -> np.ndarray:
    """Deterministic stand-in decoder for tests: hashes the payload into
    a fixed-dim feature vector (the Spark plumbing around it is what's
    under test)."""
    import hashlib

    h = hashlib.md5(payload).digest()
    return np.frombuffer(h[:8], dtype=np.uint8).astype(np.float64)
