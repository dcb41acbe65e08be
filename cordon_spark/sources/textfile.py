"""OP-1: raw log-file source (reference ingestion/reader.py:27-45).

Parity contract: 1-indexed line numbers (reader.py:24), trailing
whitespace stripped for analysis (reader.py:25) while the RAW line is
kept for output (formatter.py:49-59, OP-9), decode with UTF-8 and
latin-1 fallback (reader.py:41-45).

Decode fallback: the reference retries the WHOLE file with latin-1 on
the first UnicodeDecodeError (reader.py:41-45; because the retry is a
fresh generator, the file is decoded entirely with one encoding — we
reproduce that whole-file semantic, not Python's buffered mid-stream
restart artifact). Spark's text reader silently substitutes U+FFFD for
malformed bytes, which is a THIRD behavior and matches neither — so we
probe the bytes for UTF-8 validity first (streaming, constant memory)
and route to the matching decode path.

Spark spelling: the (common) valid-UTF-8 path is spark.read.text, which
preserves intra-file order by (file, offset); zipWithIndex assigns the
global 1-indexed line number. The latin-1 path reads the file bytes via
binaryFile and decodes in one task — acceptable because it only
triggers for binary-contaminated logs, and latin-1 is a 1:1 byte map.
This is the one place an RDD appears in the engine — a global
sequential index over a text file has no DataFrame-only spelling
(input_hint's transcript tables carry turn_idx instead, which is why
the main pipeline never needs this)."""

from __future__ import annotations

import codecs
import os

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

_SCHEMA = T.StructType(
    [
        T.StructField("line_no", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
    ]
)

_PROBE_CHUNK = 1 << 20


def _is_valid_utf8(path: str) -> bool:
    """Streaming UTF-8 validity probe: O(size) time, O(chunk) memory.
    Mirrors the reference's decision point — the first undecodable byte
    flips the whole file to latin-1 (reader.py:41-45)."""
    dec = codecs.getincrementaldecoder("utf-8")()
    with open(path, "rb") as fh:
        while True:
            chunk = fh.read(_PROBE_CHUNK)
            try:
                dec.decode(chunk, final=not chunk)
            except UnicodeDecodeError:
                return False
            if not chunk:
                return True


def _read_lines_latin1(spark: SparkSession, path: str) -> DataFrame:
    """latin-1 fallback: bytes -> lines in one task (rare path; latin-1
    maps every byte 1:1 so no decode error is possible)."""
    binary = spark.read.format("binaryFile").load(path).select("content")

    def to_lines(pdf_iter):
        import re

        import pandas as pd

        for pdf in pdf_iter:
            for content in pdf["content"]:
                text = bytes(content).decode("latin-1")
                # universal-newline split exactly like Python text-mode
                # iteration (reader.py:24 iterates the file handle):
                # \r\n, \r, \n terminate lines; NOTHING else does
                # (str.splitlines would also split on \v \f \x85  )
                lines = re.split("\r\n|\r|\n", text)
                if lines and lines[-1] == "":
                    lines.pop()  # trailing terminator yields no extra line
                yield pd.DataFrame(
                    {
                        "line_no": range(1, len(lines) + 1),
                        "text": lines,
                    }
                )

    return binary.mapInPandas(to_lines, _SCHEMA)


def read_log_lines(spark: SparkSession, path: str) -> DataFrame:
    """(line_no 1-indexed, text raw) for a single log file; add
    text_stripped with windowing.with_stripped_text for analysis.

    The latin-1 fallback probe needs local byte access, so it only runs
    for local single-file UNCOMPRESSED paths (the reference's own scope —
    reader.py:23 open()); hdfs://, s3a:// URIs, directories and
    compressed files (.gz/.bz2/...: Spark's text reader decompresses
    them itself — probing the raw compressed bytes would misroute them
    to latin-1) go straight to spark.read.text (UTF-8)."""
    compressed = path.lower().endswith(
        (".gz", ".bz2", ".zst", ".lz4", ".snappy", ".deflate")
    )
    if os.path.isfile(path) and not compressed and not _is_valid_utf8(path):
        return _read_lines_latin1(spark, path)
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
