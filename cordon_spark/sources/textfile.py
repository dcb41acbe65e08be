"""OP-1: raw log-file source (reference ingestion/reader.py:27-45).

Parity contract: 1-indexed line numbers (reader.py:24), trailing
whitespace stripped for analysis (reader.py:25) while the RAW line is
kept for output (formatter.py:49-59, OP-9), decode with UTF-8 and
latin-1 fallback (reader.py:41-45).

Spark spelling: spark.read.text preserves intra-file order by (file,
offset); zipWithIndex assigns the global 1-indexed line number. This is
the one place an RDD appears in the engine — a global sequential index
over a text file has no DataFrame-only spelling (input_hint's transcript
tables carry turn_idx instead, which is why the main pipeline never
needs this)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

_SCHEMA = T.StructType(
    [
        T.StructField("line_no", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
    ]
)


def read_log_lines(spark: SparkSession, path: str) -> DataFrame:
    """(line_no 1-indexed, text raw) for a single log file; add
    text_stripped with windowing.with_stripped_text for analysis."""
    rdd = (
        spark.read.format("text")
        .option("encoding", "UTF-8")
        .load(path)
        .rdd.map(lambda r: r[0])
        .zipWithIndex()
        .map(lambda pair: (pair[1] + 1, pair[0]))
    )
    return spark.createDataFrame(rdd, _SCHEMA)


def log_lines_as_transcript(spark: SparkSession, path: str, conv_id: str = "file") -> DataFrame:
    """Adapt a raw log file to the transcript schema: one conversation,
    turn_idx = line_no - 1 (keeps the 0-based contiguous invariant)."""
    lines = read_log_lines(spark, path)
    return lines.select(
        F.lit(conv_id).alias("conv_id"),
        (F.col("line_no") - 1).cast("int").alias("turn_idx"),
        F.lit("log").alias("role"),
        F.col("text"),
        F.lit(None).cast("string").alias("tool"),
        F.lit(None).cast("timestamp").alias("ts"),
    )
