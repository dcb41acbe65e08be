"""Streaming near-dup dedup (streaming/neardup): MinHash band buckets
as keyed state must reproduce the BATCH pair set
(operators/dedup.minhash_lsh_pairs) on the same corpus, regardless of
arrival order or micro-batch boundaries — the parity contract of the
batch/streaming split."""

import pandas as pd

# near-dup families (share most shingles) + exact-unique docs + a
# null/empty tail that must vanish at the shingle guard on both paths
DOCS = [
    (1, "the quick brown fox jumps over the lazy dog today"),
    (2, "the quick brown fox jumps over the lazy dog tonight"),
    (3, "the quick brown fox jumps over the lazy dog today"),
    (4, "completely different content about databases and queries"),
    (5, "completely different content about databases and indexes"),
    (6, "an unrelated sentence mentioning nothing from the others"),
    (7, None),
    (8, ""),
    (9, "   "),
]


def _write_batch(path, rows):
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    pdf["doc_id"] = pdf["doc_id"].astype("int64")
    pdf.to_parquet(path)


def _batch_pairs(spark):
    from cordon_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    return {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in minhash_lsh_pairs(docs).collect()
    }


def _run(spark, src, name):
    from cordon_spark.streaming.neardup import minhash_pairs_stream

    stream = spark.readStream.schema("doc_id long, text string").parquet(
        str(src)
    )
    out = minhash_pairs_stream(stream)
    return (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )


def test_stream_pairs_match_batch_single_batch(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    _write_batch(src / "b0.parquet", DOCS)
    q = _run(spark, src, "neardup_t1")
    try:
        q.processAllAvailable()
        got = {
            (r.doc_a, r.doc_b, r.jaccard)
            for r in spark.sql("SELECT * FROM neardup_t1").collect()
        }
    finally:
        q.stop()
    expected = _batch_pairs(spark)
    assert got == expected
    assert expected  # fixture sanity: there ARE near-dup pairs


def test_stream_pairs_match_batch_out_of_order(spark, tmp_path):
    """Same corpus split across three micro-batches with each near-dup
    family's members arriving in different batches, later ids first —
    the pair SET must not change (only the arrival endpoint that
    triggers each emission does)."""
    src = tmp_path / "src"
    src.mkdir()
    by_id = dict(DOCS)
    q = _run(spark, src, "neardup_t2")
    try:
        for i, batch_ids in enumerate([(3, 5, 9), (2, 6, 4, 7), (1, 8)]):
            _write_batch(
                src / f"b{i}.parquet", [(d, by_id[d]) for d in batch_ids]
            )
            q.processAllAvailable()
        got = {
            (r.doc_a, r.doc_b, r.jaccard)
            for r in spark.sql("SELECT * FROM neardup_t2").collect()
        }
    finally:
        q.stop()
    assert got == _batch_pairs(spark)


def test_distinct_pairs_stream_collapses_multiband(spark, tmp_path):
    """Two-hop stateful distinct (Spark forbids two
    applyInPandasWithState ops in ONE query): stage 1 streams pairs to
    a parquet hop, stage 2 streams the hop through
    distinct_pairs_stream. The final multiset has no duplicates and
    equals the batch DISTINCT pair set (a near-dup pair colliding in k
    bands emits k times from the bucket stage)."""
    from cordon_spark.streaming.neardup import (
        distinct_pairs_stream,
        minhash_pairs_stream,
    )

    src = tmp_path / "src"
    src.mkdir()
    hop = tmp_path / "hop"
    _write_batch(src / "b0.parquet", DOCS)
    stream1 = spark.readStream.schema("doc_id long, text string").parquet(
        str(src)
    )
    q1 = (
        minhash_pairs_stream(stream1)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", str(hop))
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .start()
    )
    try:
        q1.processAllAvailable()
    finally:
        q1.stop()
    stream2 = spark.readStream.schema(
        "doc_a long, doc_b long, jaccard double"
    ).parquet(str(hop))
    q2 = (
        distinct_pairs_stream(stream2)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("neardup_t3")
        .start()
    )
    try:
        q2.processAllAvailable()
        rows = spark.sql("SELECT * FROM neardup_t3").collect()
    finally:
        q2.stop()
    keys = [(r.doc_a, r.doc_b) for r in rows]
    assert len(keys) == len(set(keys))  # no duplicate emissions survive
    assert {
        (r.doc_a, r.doc_b, r.jaccard) for r in rows
    } == _batch_pairs(spark)


def test_stream_replay_is_idempotent(spark, tmp_path):
    """Re-delivering the same documents (replay after failure) must not
    re-emit or self-pair: a doc id already in bucket state is skipped."""
    src = tmp_path / "src"
    src.mkdir()
    _write_batch(src / "b0.parquet", DOCS)
    q = _run(spark, src, "neardup_t4")
    try:
        q.processAllAvailable()
        _write_batch(src / "b1.parquet", DOCS)  # full replay
        q.processAllAvailable()
        got = [
            (r.doc_a, r.doc_b)
            for r in spark.sql("SELECT * FROM neardup_t4").collect()
        ]
    finally:
        q.stop()
    batch_keys = {(a, b) for a, b, _ in _batch_pairs(spark)}
    # per-band emissions, but no NEW pairs from the replay and no
    # (x, x) self-pairs
    assert {k for k in got} == batch_keys
    assert all(a < b for a, b in got)


def test_max_bucket_caps_state(spark, tmp_path):
    """max_bucket=1: only the first member per bucket is retained, so a
    three-way identical family emits pairs against that first member
    only (the documented state bound for hot buckets)."""
    from cordon_spark.streaming.neardup import minhash_pairs_stream

    src = tmp_path / "src"
    src.mkdir()
    _write_batch(
        src / "b0.parquet",
        [(1, "same exact text here"), (2, "same exact text here"),
         (3, "same exact text here")],
    )
    stream = spark.readStream.schema("doc_id long, text string").parquet(
        str(src)
    )
    q = (
        minhash_pairs_stream(stream, max_bucket=1)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("neardup_t5")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.doc_a, r.doc_b)
            for r in spark.sql("SELECT * FROM neardup_t5").collect()
        }
    finally:
        q.stop()
    # capped: pairs only against doc 1; (2,3) is sacrificed by the cap
    assert got == {(1, 2), (1, 3)}
