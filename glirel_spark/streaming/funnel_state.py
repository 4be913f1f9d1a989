"""Custom stateful streaming operator: the ordered conversion funnel as
a per-user state machine via ``applyInPandasWithState``.

Batch twin: operators/events.funnel_counts. The state per user is one
fixed-size tuple — the first-qualifying event time of each funnel step
(-1 = not reached) — so state is O(|steps|) per user no matter how many
events flow past, the property that lets this run forever on an
unbounded stream. A step's slot fills when an event of its type arrives
at-or-after the previous step's slot time, and each (user, step_idx)
emits EXACTLY ONCE (append mode, no retraction).

Ordering contract (same as sessions_state.sessionize_stateful): events
for a user must arrive in event-time order up to in-batch sorting —
true for the engine's replayed event log, and in production enforced
upstream by the log's per-key ordering. Under that contract
"first-qualifying seen" == "min-qualifying", so the stream output
matches the batch chain of conditional mins exactly — asserted in
tests/test_streaming.py.

The per-batch update is vectorized: one sort, then one boolean-mask min
per unfilled step — no per-event python loop.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from glirel_spark.operators.events import FUNNEL_STEPS

OUT_SCHEMA = "user_id long, step_idx long, ts timestamp"
# first-qualifying time per step, epoch ns; -1 = not reached
STATE_SCHEMA = ", ".join(f"t{i} long" for i in range(len(FUNNEL_STEPS)))


def funnel_stateful(
    events: DataFrame, steps: list[str] | None = None
) -> DataFrame:
    from pyspark.sql.streaming.state import GroupStateTimeout

    steps = steps if steps is not None else FUNNEL_STEPS
    n_steps = len(steps)

    def update(key: Any, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        df = pd.concat(list(pdfs), ignore_index=True)
        df = df.sort_values(["ts", "event_id"], kind="mergesort")
        ts = (
            pd.to_datetime(df["ts"]).astype("datetime64[ns]").astype("int64").to_numpy()
        )
        types = df["event_type"].to_numpy()

        slots = list(state.get) if state.exists else [-1] * n_steps
        emitted: list[tuple[int, int]] = []
        for k in range(n_steps):
            if slots[k] >= 0:
                continue
            if k > 0 and slots[k - 1] < 0:
                break  # chain not reached yet; later steps can't fill
            mask = types == steps[k]
            if k > 0:
                mask = mask & (ts >= slots[k - 1])
            hits = ts[mask]
            if len(hits) == 0:
                break
            slots[k] = int(hits[0])  # sorted -> first == min
            emitted.append((k, slots[k]))
        state.update(tuple(slots))
        if emitted:
            yield pd.DataFrame(
                {
                    "user_id": np.repeat(np.int64(user_id), len(emitted)),
                    "step_idx": np.array([e[0] for e in emitted], dtype=np.int64),
                    "ts": pd.to_datetime([e[1] for e in emitted]),
                }
            )

    return events.groupBy("user_id").applyInPandasWithState(
        update, OUT_SCHEMA, STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
    )
