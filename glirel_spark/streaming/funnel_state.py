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
upstream by the log's per-key ordering. Timestamps need NOT be
strictly increasing: ties across a micro-batch boundary are handled by
a bounded boundary buffer. A step-k event at ts == the (future) fill
time of step k-1 can only tie if its ts equals the max event time seen
so far for the user (later events are >= it under the ordering
contract), so the state keeps, per unfilled step, the earliest seen
event time that equals the running per-user max — O(|steps|) extra
longs, still constant state — and replays those candidates at the
start of every batch. With the buffer, "first-qualifying seen" ==
"min-qualifying" holds even with equal timestamps, so the stream
output matches the batch chain of conditional mins exactly — asserted
(including a forced cross-batch tie) in tests/test_streaming.py.

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
# per step: first-qualifying time (t{i}) and boundary-buffer candidate
# time (b{i}) — the earliest seen step-i event at the running max event
# time (m) that has not yet qualified; -1 = absent. All epoch ns.
#
# CHECKPOINT COMPATIBILITY: this schema widened in round 4 from
# n_steps longs (t{i} only) to 2*n_steps+1 (boundary buffers + running
# max). applyInPandasWithState state is positional: resuming a
# checkpoint written under the v1 schema would misread state, so the
# checkpoint dir convention is versioned — use a fresh
# `.../funnel_state_v2` checkpoint dir (see funnel_checkpoint_dir),
# never resume a pre-round-4 funnel checkpoint against this schema.
STATE_SCHEMA_VERSION = 2


def funnel_checkpoint_dir(base: str) -> str:
    """Checkpoint dir keyed on the state-schema version so an old
    (incompatible) positional state layout is never resumed."""
    return f"{base.rstrip('/')}/funnel_state_v{STATE_SCHEMA_VERSION}"

STATE_SCHEMA = (
    ", ".join(f"t{i} long" for i in range(len(FUNNEL_STEPS)))
    + ", "
    + ", ".join(f"b{i} long" for i in range(len(FUNNEL_STEPS)))
    + ", m long"
)


def make_update(steps: list[str]):
    """The per-key state-transition function, factored out so
    tests/test_funnel_property.py can drive the EXACT production
    closure through randomized micro-batch splits without a streaming
    query (same pattern as the tensor-plane property tests: Spark
    stays out, hypothesis runs hundreds of examples)."""
    n_steps = len(steps)

    def update(key: Any, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        df = pd.concat(list(pdfs), ignore_index=True)
        df = df.sort_values(["ts", "event_id"], kind="mergesort")
        ts = (
            pd.to_datetime(df["ts"]).astype("datetime64[ns]").astype("int64").to_numpy()
        )
        types = df["event_type"].to_numpy()

        if state.exists:
            st = list(state.get)
            slots = st[:n_steps]
            bufs = st[n_steps : 2 * n_steps]
            max_ts = st[2 * n_steps]
        else:
            slots = [-1] * n_steps
            bufs = [-1] * n_steps
            max_ts = -1

        # replay buffered boundary candidates: under the ordering
        # contract every new event has ts >= max_ts >= buffered ts, so
        # prepending keeps the arrays sorted
        pre_t = [b for b in bufs if b >= 0]
        if pre_t:
            pre_y = [steps[i] for i, b in enumerate(bufs) if b >= 0]
            order = np.argsort(pre_t, kind="stable")
            ts = np.concatenate(
                [np.asarray(pre_t, dtype=np.int64)[order], ts]
            )
            types = np.concatenate(
                [np.asarray(pre_y, dtype=object)[order], types]
            )

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

        # rebuild boundary buffers: only an event at the NEW per-user
        # max time can still tie a future fill of its predecessor step
        new_max = int(ts.max()) if len(ts) else max_ts
        new_bufs = [-1] * n_steps
        if new_max >= 0:
            for k in range(n_steps):
                if slots[k] >= 0:
                    continue  # exactly-once: filled steps never re-emit
                cand = ts[(types == steps[k]) & (ts == new_max)]
                if len(cand):
                    new_bufs[k] = int(cand[0])
        state.update(tuple(slots) + tuple(new_bufs) + (new_max,))
        if emitted:
            yield pd.DataFrame(
                {
                    "user_id": np.repeat(np.int64(user_id), len(emitted)),
                    "step_idx": np.array([e[0] for e in emitted], dtype=np.int64),
                    "ts": pd.to_datetime([e[1] for e in emitted]),
                }
            )

    return update


def funnel_stateful(
    events: DataFrame, steps: list[str] | None = None
) -> DataFrame:
    from pyspark.sql.streaming.state import GroupStateTimeout

    steps = steps if steps is not None else FUNNEL_STEPS
    return events.groupBy("user_id").applyInPandasWithState(
        make_update(steps), OUT_SCHEMA, STATE_SCHEMA, "append",
        GroupStateTimeout.NoTimeout,
    )
