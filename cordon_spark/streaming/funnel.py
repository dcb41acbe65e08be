"""STREAMING ordered funnel via applyInPandasWithState — the stateful
twin of operators.events.funnel_steps (same strictly-after
qualification recurrence).

State per user is O(k): the qualified first-time of each step (a
monotone vector — a step's time only ever DECREASES as earlier
qualifying events arrive within the same rules). Each micro-batch's
rows are sorted by (event time, event_id) and replayed through the
recurrence; whenever a step's time is newly set the operator EMITS a
(user, step, step_name, reached_us) transition row, so a downstream
streaming count per step is the live funnel. The stream shuffles once
on the user key — the canonical keyed-state shape.

Bounded-state divergence from batch funnel_steps (deliberate, the same
O(1)-state trade sessionize_stream documents): rows are folded in
ARRIVAL order (sorted within each batch). A cross-batch straggler that
arrives AFTER a later-step event was already rejected cannot
retroactively qualify that rejected event — batch, seeing all data at
once, would. In-order streams (per user) reproduce batch exactly
(parity-tested); consumers under heavy disorder should widen the
micro-batch or re-run the batch funnel over the affected window.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame

DEFAULT_STEPS: Tuple[str, ...] = ("signup", "view", "click", "purchase")


def funnel_stream(
    events: DataFrame,
    steps: Tuple[str, ...] = DEFAULT_STEPS,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """events stream -> transition rows: one output row the first time
    a user's step k qualifies (strictly after their step k-1 time).
    Requires `event_type` and `event_id` columns (the shared events
    contract); the output key column mirrors user_col's name AND type.

    Disorder semantics: `reached_us` is FIRST-ARRIVAL, not the true
    minimum — when a later micro-batch delivers an earlier qualifying
    event, the internal state lowers (so step COUNTS stay exact) but no
    corrected transition row is re-emitted; downstream latency readers
    see the time of the first arrival that qualified. This is the
    standard bounded-state trade (an update row would make the sink
    at-least-once); batch `funnel_latency` is the exact replay."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    for required in (user_col, ts_col, "event_type", "event_id"):
        if required not in events.columns:
            raise ValueError(f"funnel_stream input lacks column {required!r}")
    user_type = events.schema[user_col].dataType.simpleString()
    out_schema = (
        f"{user_col} {user_type}, step integer, step_name string, reached_us long"
    )
    k = len(steps)
    state_schema = ", ".join(f"q{i} long" for i in range(k))
    step_index = {s: i for i, s in enumerate(steps)}

    def update(key, pdfs, state) -> Iterator[pd.DataFrame]:
        user = key[0]
        qs = list(state.get) if state.exists else [None] * k
        rows = pd.concat(list(pdfs), ignore_index=True)
        ser = rows[ts_col]
        if getattr(ser.dt, "tz", None) is not None:
            ser = ser.dt.tz_localize(None)
        rows = rows.assign(_us=ser.astype("int64") // 1000)
        rows = rows.sort_values(["_us", "event_id"], kind="mergesort")
        emitted = []
        for us, etype in zip(rows["_us"], rows["event_type"]):
            i = step_index.get(etype)
            if i is None:
                continue
            if i > 0 and (qs[i - 1] is None or us <= qs[i - 1]):
                continue  # previous step not yet qualified at this time
            if qs[i] is None or us < qs[i]:
                first_time = qs[i] is None
                qs[i] = int(us)
                if first_time:
                    emitted.append((i, int(us)))
        state.update(tuple(qs))
        if emitted:
            yield pd.DataFrame(
                {
                    user_col: [user] * len(emitted),
                    "step": [i + 1 for i, _ in emitted],
                    "step_name": [steps[i] for i, _ in emitted],
                    "reached_us": [us for _, us in emitted],
                }
            )

    return (
        events.groupBy(user_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
