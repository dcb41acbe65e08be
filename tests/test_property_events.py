"""Property-based differentials for the round-3 event/curation
operators: randomized inputs against independent oracles —
pandas.merge_asof for the as-of join, direct recomputation for
sequence packing. Few examples (each runs real Spark jobs), wide
input space."""

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings, strategies as st

from cordon_spark.operators.curation import pack_sequences
from cordon_spark.operators.events import asof_join


@st.composite
def asof_inputs(draw):
    n_keys = draw(st.integers(1, 3))
    left_rows, right_rows = [], []
    eid = 0
    for k in range(n_keys):
        for _ in range(draw(st.integers(0, 6))):
            left_rows.append((eid, k, draw(st.integers(0, 50))))
            eid += 1
        # unique (key, ts) on the right — the operator's precondition
        ts_set = draw(
            st.lists(st.integers(0, 50), max_size=5, unique=True)
        )
        for t in ts_set:
            right_rows.append((k, t, float(draw(st.integers(-5, 5)))))
    return left_rows, right_rows


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(data=asof_inputs())
def test_asof_join_matches_pandas_merge_asof(spark, data):
    left_rows, right_rows = data
    if not left_rows:
        return
    left = spark.createDataFrame(left_rows, "event_id long, user_id long, us long")
    if right_rows:
        right = spark.createDataFrame(right_rows, "user_id long, us long, pv double")
    else:
        right = spark.createDataFrame([], "user_id long, us long, pv double")
    got = {
        r.event_id: r.asof_pv
        for r in asof_join(
            left, right, key_col="user_id", ts_col="us", value_cols=("pv",)
        ).collect()
    }
    lp = (
        pd.DataFrame(left_rows, columns=["event_id", "user_id", "us"])
        .astype({"event_id": "int64", "user_id": "int64", "us": "int64"})
        .sort_values("us")
    )
    rp = (
        pd.DataFrame(right_rows, columns=["user_id", "us", "pv"])
        .astype({"user_id": "int64", "us": "int64", "pv": "float64"})
        .sort_values("us")
    )
    merged = pd.merge_asof(
        lp, rp, on="us", by="user_id", direction="backward", allow_exact_matches=True
    )
    want = {
        int(r.event_id): (None if pd.isna(r.pv) else float(r.pv))
        for r in merged.itertuples()
    }
    assert got == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    tokens=st.lists(st.integers(1, 700), min_size=1, max_size=40),
    max_tokens=st.integers(100, 600),
)
def test_pack_sequences_property(spark, tokens, max_tokens):
    rows = [(i, "g", t) for i, t in enumerate(tokens)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_tokens long")
    out = (
        pack_sequences(df, max_tokens=max_tokens, group_col="lang")
        .orderBy("doc_id")
        .collect()
    )
    cum = 0
    prev_pack = 0
    for r, t in zip(out, tokens):
        assert r.pack_offset == cum
        assert r.pack_id == cum // max_tokens
        assert r.pack_id >= prev_pack  # packs are monotone in order
        prev_pack = r.pack_id
        cum += t
    # docs no longer than the budget never straddle more than one pack
    # boundary: their pack's total is < max + that one straddler
    by_pack: dict = {}
    for r, t in zip(out, tokens):
        by_pack.setdefault(r.pack_id, []).append(t)
    for sizes in by_pack.values():
        assert sum(sizes) < max_tokens + max(sizes)


@st.composite
def funnel_inputs(draw):
    """Random per-user event sequences over the 4 funnel types plus a
    distractor; distinct microsecond-grade timestamps via unique secs."""
    types = ["signup", "view", "click", "purchase", "other"]
    rows = []
    eid = 0
    for user in range(draw(st.integers(1, 3))):
        secs = draw(st.lists(st.integers(0, 40), max_size=10, unique=True))
        for t in secs:
            rows.append((eid, t, user, types[draw(st.integers(0, 4))]))
            eid += 1
    return rows


def _funnel_oracle(rows, steps=("signup", "view", "click", "purchase")):
    """Direct recurrence: step-k first-time = min t of a step-k event
    strictly after the user's qualified step-(k-1) time."""
    users = {}
    for _eid, t, user, etype in rows:
        users.setdefault(user, []).append((t, etype))
    counts = dict.fromkeys(steps, 0)
    for evs in users.values():
        prev = None
        for i, step in enumerate(steps):
            cand = [
                t for t, e in evs
                if e == step and (i == 0 or (prev is not None and t > prev))
            ]
            prev = min(cand) if cand else None
            if prev is not None:
                counts[step] += 1
            else:
                break
    return counts


@given(funnel_inputs())
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_funnel_steps_matches_direct_recurrence(spark, rows):
    from cordon_spark.operators.events import funnel_steps

    pdf = pd.DataFrame(rows, columns=["event_id", "secs", "user_id", "event_type"])
    pdf["ts"] = pd.to_datetime("2026-01-01") + pd.to_timedelta(pdf["secs"], unit="s")
    df = spark.createDataFrame(
        pdf[["event_id", "ts", "user_id", "event_type"]],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    got = {r.step_name: r.users for r in funnel_steps(df).collect()}
    assert got == _funnel_oracle(rows)
