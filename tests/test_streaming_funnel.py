"""Streaming funnel (streaming/funnel.py): in-order parity with the
batch funnel_steps recurrence, strictly-after semantics across
micro-batches, and the documented bounded-state straggler divergence."""

import datetime as dt

import pandas as pd
from pyspark.sql import functions as F

from cordon_spark.datagen import write_parquet
from cordon_spark.operators.events import funnel_steps
from cordon_spark.streaming.funnel import funnel_stream


def _pdf(rows):
    return pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value"])


def _run_stream(spark, tmp_path, batches, name):
    src = tmp_path / f"{name}_src"
    src.mkdir()
    write_parquet(batches[0], str(src / "b0.parquet"))
    schema = spark.read.parquet(str(src)).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        funnel_stream(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / f"{name}_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        for i, b in enumerate(batches[1:], 1):
            write_parquet(b, str(src / f"b{i}.parquet"))
            q.processAllAvailable()
        return spark.sql(f"SELECT * FROM {name}").collect()
    finally:
        q.stop()


def test_funnel_stream_in_order_matches_batch(spark, tmp_path):
    t0 = dt.datetime(2026, 1, 1)

    def ev(eid, secs, user, etype):
        return (eid, t0 + dt.timedelta(seconds=secs), user, etype, 0.0)

    b0 = _pdf([
        ev(1, 0, 1, "signup"), ev(2, 60, 1, "view"),
        ev(3, 0, 2, "signup"), ev(4, 60, 2, "click"),  # click before view: no credit
        ev(5, 0, 3, "view"),                           # no signup: nothing counts
    ])
    b1 = _pdf([
        ev(6, 120, 1, "click"), ev(7, 180, 1, "purchase"),
        ev(8, 120, 2, "view"), ev(9, 180, 2, "click"),  # retry click qualifies now
        ev(10, 60, 3, "click"),
    ])
    got = _run_stream(spark, tmp_path, [b0, b1], "funnel_in_order")
    stream_counts = {}
    for r in got:
        stream_counts[r.step_name] = stream_counts.get(r.step_name, 0) + 1

    full = spark.createDataFrame(pd.concat([b0, b1], ignore_index=True))
    batch_counts = {
        r.step_name: r.users for r in funnel_steps(full).collect() if r.users > 0
    }
    assert stream_counts == batch_counts == {
        "signup": 2, "view": 2, "click": 2, "purchase": 1,
    }
    # each user emits a step at most once
    assert len(got) == len({(r.user_id, r.step) for r in got})


def test_funnel_stream_cross_batch_straggler_divergence(spark, tmp_path):
    """Documented bounded-state trade: a straggler signup arriving
    AFTER its dependent view was already rejected cannot retroactively
    credit the view (batch would). The signup itself still counts."""
    t0 = dt.datetime(2026, 1, 1)
    b0 = _pdf([(1, t0 + dt.timedelta(seconds=60), 1, "view", 0.0)])
    b1 = _pdf([(2, t0, 1, "signup", 0.0)])
    got = _run_stream(spark, tmp_path, [b0, b1], "funnel_straggler")
    assert {(r.step_name) for r in got} == {"signup"}

    full = spark.createDataFrame(pd.concat([b0, b1], ignore_index=True))
    batch = {r.step_name: r.users for r in funnel_steps(full).collect()}
    assert batch["view"] == 1  # batch DOES credit it — the divergence is real
