"""Transcript-table source: one reader for every serialization of the
input_hint schema (conv_id, turn_idx, role, text, tool, ts).

Formats by extension: parquet (native), .jsonl/.json (JSON lines),
.csv (headered), raw logs (.log/.txt[.gz...] via the OP-1 text source).
Schema is ENFORCED, not inferred: json/csv read against the explicit
StructType (inference at 100 TB means a second full scan and silently
drifting types), then cast/checked into the canonical shape."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

# Compression suffixes Spark's text/json/csv readers decode natively via
# Hadoop codecs (gz/bz2 always; zst/lz4 with the bundled codec jars).
_COMPRESSION_EXTS = (".gz", ".bz2", ".zst", ".lz4")


def _with_compression(*stems: str) -> tuple[str, ...]:
    return tuple(stems) + tuple(
        f"{stem}{ext}" for stem in stems for ext in _COMPRESSION_EXTS
    )


_RAW_LOG_SUFFIXES = _with_compression(".log", ".txt")
_JSONL_SUFFIXES = _with_compression(".jsonl", ".json")
_CSV_SUFFIXES = _with_compression(".csv")


def _canonical(df: DataFrame) -> DataFrame:
    """Cast/reorder into the canonical schema; missing optional columns
    become typed nulls; unknown extra columns are preserved after the
    canonical six (they ride through enrichment/routing)."""
    cols = []
    present = {f.name for f in df.schema.fields}
    for field in TRANSCRIPT_SCHEMA.fields:
        if field.name in present:
            cols.append(F.col(field.name).cast(field.dataType).alias(field.name))
        elif field.name in ("conv_id", "turn_idx"):
            raise ValueError(f"transcripts input is missing required column {field.name!r}")
        else:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
    extras = [c for c in df.columns if c not in {f.name for f in TRANSCRIPT_SCHEMA.fields}]
    return df.select(*cols, *extras)


def read_transcripts(spark: SparkSession, path: str) -> DataFrame:
    """Read a transcripts table from parquet / JSON-lines / CSV / raw
    log, returning the canonical input_hint schema."""
    lower = path.lower()
    if lower.endswith(_RAW_LOG_SUFFIXES):
        from cordon_spark.sources.textfile import log_lines_as_transcript

        return log_lines_as_transcript(spark, path)
    if lower.endswith(_JSONL_SUFFIXES):
        # imposed schema = single pass (no inference scan); JSON maps
        # fields BY NAME, so wrong/missing field names surface as nulls —
        # the probe below turns that into a loud error
        df = spark.read.schema(TRANSCRIPT_SCHEMA).json(path)
        return _validated(_canonical(df), path)
    if lower.endswith(_CSV_SUFFIXES):
        # header names drive the mapping (read as all-string columns,
        # then cast by NAME in _canonical): an imposed schema would bind
        # CSV columns POSITIONALLY and silently mis-assign a reordered
        # file. Still a single pass — no inferSchema.
        df = spark.read.option("header", "true").csv(path)
        return _validated(_canonical(df), path)
    # default: parquet (directory or file)
    return _canonical(spark.read.parquet(path))


def _validated(df: DataFrame, path: str) -> DataFrame:
    """Loud failure for schema-on-read formats: a file whose records use
    different field names yields all-null required columns (JSON maps by
    name; CSV headers may simply not match). limit(1) early-terminates,
    so the probe costs ~one row at any scale."""
    bad = df.filter(F.col("conv_id").isNull() | F.col("turn_idx").isNull()).limit(1)
    if bad.count() > 0:
        raise ValueError(
            f"transcripts input {path!r} has rows with NULL conv_id/turn_idx "
            "— field names likely don't match the transcript schema "
            "(conv_id, turn_idx, role, text, tool, ts)"
        )
    return df
