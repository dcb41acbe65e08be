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

_RAW_LOG_SUFFIXES = (
    ".log", ".txt",
    ".log.gz", ".txt.gz", ".log.bz2", ".txt.bz2",
)


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
    if lower.endswith((".jsonl", ".json", ".jsonl.gz", ".json.gz")):
        df = spark.read.schema(TRANSCRIPT_SCHEMA).json(path)
        return _canonical(df)
    if lower.endswith((".csv", ".csv.gz")):
        df = (
            spark.read.schema(TRANSCRIPT_SCHEMA)
            .option("header", "true")
            .option("timestampFormat", "yyyy-MM-dd HH:mm:ss[.SSSSSS]")
            .csv(path)
        )
        return _canonical(df)
    # default: parquet (directory or file)
    return _canonical(spark.read.parquet(path))
