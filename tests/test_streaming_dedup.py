"""Streaming exact dedup (streaming/dedup.dedup_stream): first
occurrence per content digest survives; later arrivals — in the same
micro-batch or a later one — drop. Batch twin for parity:
operators/dedup.exact_dedup."""

import pandas as pd
from pyspark.sql import functions as F


def _write_batch(path, rows):
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    pdf["doc_id"] = pdf["doc_id"].astype("int64")
    pdf.to_parquet(path)


def _run_stream(spark, src, n_batches_hint=None):
    from cordon_spark.streaming.dedup import dedup_stream

    schema = "doc_id long, text string"
    stream = spark.readStream.schema(schema).parquet(str(src))
    out = dedup_stream(stream)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_stream_t")
        .start()
    )
    return q


def test_dedup_stream_single_batch(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    _write_batch(src / "b0.parquet", [
        (3, "hello world"), (1, "hello world"), (2, "unique text"),
    ])
    q = _run_stream(spark, src)
    try:
        q.processAllAvailable()
        got = {
            (r.doc_id, r.text)
            for r in spark.sql("SELECT * FROM dedup_stream_t").collect()
        }
    finally:
        q.stop()
    # smallest doc_id survives within a batch
    assert got == {(1, "hello world"), (2, "unique text")}


def test_dedup_stream_across_batches_and_batch_parity(spark, tmp_path):
    from cordon_spark.operators.dedup import exact_dedup

    src = tmp_path / "src"
    src.mkdir()
    _write_batch(src / "b0.parquet", [(1, "alpha"), (2, "beta")])
    q = _run_stream(spark, src)
    try:
        q.processAllAvailable()
        # second micro-batch: duplicate of an earlier batch + a new doc
        _write_batch(src / "b1.parquet", [(3, "alpha"), (4, "gamma")])
        q.processAllAvailable()
        got = {
            (r.doc_id, r.text)
            for r in spark.sql("SELECT * FROM dedup_stream_t").collect()
        }
    finally:
        q.stop()
    assert got == {(1, "alpha"), (2, "beta"), (4, "gamma")}
    # parity: the batch operator on the full accumulated input keeps the
    # same survivor set (exact_dedup keeps min doc_id per digest too)
    full = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "alpha"), (4, "gamma")],
        "doc_id long, text string",
    )
    batch = exact_dedup(full)
    batch_ids = {r.doc_id for r in batch.collect()}
    assert batch_ids == {d for d, _ in got}


def test_dedup_stream_string_ids(spark, tmp_path):
    """Output schema follows the input column types — string ids work,
    with lexicographic min as the in-batch survivor."""
    src = tmp_path / "src"
    src.mkdir()
    pdf = pd.DataFrame(
        [("doc-b", "same"), ("doc-a", "same"), ("doc-c", "other")],
        columns=["doc_id", "text"],
    )
    pdf.to_parquet(src / "b0.parquet")
    from cordon_spark.streaming.dedup import dedup_stream

    stream = spark.readStream.schema("doc_id string, text string").parquet(str(src))
    q = (
        dedup_stream(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_stream_s")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.doc_id, r.text)
            for r in spark.sql("SELECT * FROM dedup_stream_s").collect()
        }
    finally:
        q.stop()
    assert got == {("doc-a", "same"), ("doc-c", "other")}
