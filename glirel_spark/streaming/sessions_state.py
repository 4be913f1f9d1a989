"""Custom stateful streaming operator: gap-based sessionization with
explicit per-user state via ``applyInPandasWithState``.

The windowed/sessionized twins in events_stream.py lean on Spark's
built-in watermark aggregation; THIS operator is the custom-state path
the engine uses when built-ins can't express the semantics — per-key
state that survives across micro-batches (the open session plus a
closed-session counter) with arbitrary python update logic,
Arrow-batched per key group.

Semantics match operators/events.sessionize exactly for CLOSED
sessions: a session closes when a later event for the same user
arrives more than ``gap_seconds`` after it ends; session ids number
1..k per user in event order. The still-open trailing session stays in
the state store (in production it drains via an event-time timeout as
the watermark passes; a finite availableNow run simply ends first), so
the streaming output equals the batch output minus each user's last
session — asserted in tests/test_streaming.py.

The per-batch update is vectorized (one numpy diff over the sorted
batch, one state tuple per user) — no per-event python loop.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

OUT_SCHEMA = (
    "user_id long, sess_id long, n_events long, "
    "sess_start timestamp, sess_end timestamp"
)
# sessions closed so far + the open session's (start, end, n);
# timestamps as int64 ns so the state round-trip is exact
STATE_SCHEMA = "sess_count long, start_ns long, end_ns long, n long"


def sessionize_stateful(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_ns = int(gap_seconds) * 1_000_000_000

    def update(key: Any, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        df = pd.concat(list(pdfs), ignore_index=True)
        df = df.sort_values(["ts", "event_id"], kind="mergesort")
        ts = (
            pd.to_datetime(df["ts"]).astype("datetime64[ns]").astype("int64").to_numpy()
        )

        carry = state.get if state.exists else None  # (count, start, end, n)
        sess_count = carry[0] if carry else 0

        # new-session flag per event: first vs the carried open session,
        # rest vs their predecessor — one vectorized diff
        new = np.empty(len(ts), dtype=bool)
        new[0] = carry is None or (ts[0] - carry[2]) > gap_ns
        if len(ts) > 1:
            new[1:] = np.diff(ts) > gap_ns

        # batch groups always begin at offset 0 (even when event 0
        # extends the carried session)
        starts = np.flatnonzero(new)
        if len(starts) == 0 or starts[0] != 0:
            starts = np.insert(starts, 0, 0)
        bounds = np.append(starts, len(ts))
        groups = [
            (int(ts[lo]), int(ts[hi - 1]), int(hi - lo))
            for lo, hi in zip(bounds[:-1], bounds[1:])
        ]

        if carry is not None:
            if new[0]:  # the carried session closed on its own
                sessions = [(carry[1], carry[2], carry[3])] + groups
            else:  # event 0 extends it: merge into the first group
                sessions = [(carry[1], groups[0][1], carry[3] + groups[0][2])] + groups[1:]
        else:
            sessions = groups

        closed, open_sess = sessions[:-1], sessions[-1]
        state.update(
            (sess_count + len(closed), open_sess[0], open_sess[1], open_sess[2])
        )
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": np.repeat(np.int64(user_id), len(closed)),
                    "sess_id": sess_count + 1 + np.arange(len(closed), dtype=np.int64),
                    "n_events": np.array([s[2] for s in closed], dtype=np.int64),
                    "sess_start": pd.to_datetime([s[0] for s in closed]),
                    "sess_end": pd.to_datetime([s[1] for s in closed]),
                }
            )

    return events.groupBy("user_id").applyInPandasWithState(
        update, OUT_SCHEMA, STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
    )
