"""Stateful streaming as-of enrichment via ``applyInPandasWithState``:
every event annotated with the most recent 'error' event of the same
user seen so far — the streaming twin of
operators/events.asof_last_event.

Unlike sessionization there is nothing to hold back: each event's
answer is final the moment it arrives (later events can't change which
error preceded it), so the streaming output equals the batch as-of row
for row when events are replayed in time order — asserted across
micro-batch boundaries in tests/test_streaming.py.

State per user is two longs (last error event_id, last error ts in ns)
— the smallest possible as-of state; contrast with a stream-stream
interval join, which must buffer the whole right side within the
watermark. The per-batch update is vectorized: one boolean mask + one
``np.maximum.accumulate`` over the sorted batch, no per-event loop.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

OUT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "last_error_event_id long, us_since_error long"
)
STATE_SCHEMA = "last_id long, last_ts_ns long"


def asof_stateful(events: DataFrame, right_type: str = "error") -> DataFrame:
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key: Any, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        df = pd.concat(list(pdfs), ignore_index=True)
        df = df.sort_values(["ts", "event_id"], kind="mergesort")
        n = len(df)
        ts_ns = (
            pd.to_datetime(df["ts"]).astype("datetime64[ns]").astype("int64").to_numpy()
        )
        eid = df["event_id"].to_numpy(dtype=np.int64)
        is_r = (df["event_type"] == right_type).to_numpy()

        # index of the latest right-side row at-or-before each row
        # (inclusive: an error row is its own match), -1 = none yet
        idx = np.where(is_r, np.arange(n), -1)
        last_idx = np.maximum.accumulate(idx)

        carry = state.get if state.exists else None  # (last_id, last_ts_ns)
        match_id = np.where(last_idx >= 0, eid[np.clip(last_idx, 0, None)],
                            carry[0] if carry else -1)
        match_ts = np.where(last_idx >= 0, ts_ns[np.clip(last_idx, 0, None)],
                            carry[1] if carry else -1)
        has = (last_idx >= 0) | (carry is not None)

        if is_r.any():
            j = int(np.flatnonzero(is_r)[-1])
            state.update((int(eid[j]), int(ts_ns[j])))
        elif carry is not None:
            state.update(carry)

        out = pd.DataFrame(
            {
                "event_id": eid,
                "ts": df["ts"].to_numpy(),
                "user_id": np.repeat(np.int64(user_id), n),
                "event_type": df["event_type"].to_numpy(),
                "last_error_event_id": pd.array(
                    np.where(has, match_id, 0), dtype="Int64"
                ),
                "us_since_error": pd.array(
                    np.where(has, (ts_ns - match_ts) // 1000, 0), dtype="Int64"
                ),
            }
        )
        out.loc[~has, ["last_error_event_id", "us_since_error"]] = pd.NA
        yield out

    return events.groupBy("user_id").applyInPandasWithState(
        update, OUT_SCHEMA, STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
    )
