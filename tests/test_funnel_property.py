"""Property test (hypothesis): the stateful streaming funnel equals the
batch funnel on ADVERSARIAL equal-timestamp inputs under RANDOM
micro-batch splits (VERDICT r4 #6 — the round-4 boundary-buffer fix
was covered by examples only; this explores the input space).

The production state machine (funnel_state.make_update — the exact
closure applyInPandasWithState runs) is driven through a faithful
GroupState stub, one call per (micro-batch, user) exactly as the real
source would deliver it. Spark stays out of the hypothesis loop so
hundreds of examples run in seconds (same pattern as
tests/test_properties.py); the real-streaming integration anchors live
in tests/test_streaming.py (test_stateful_funnel_equals_batch,
test_funnel_cross_batch_timestamp_tie), and
test_python_reference_matches_spark_batch below pins this module's
pure-python batch reference to the Spark funnel_counts operator on a
tie-dense dataset.

Adversarial split generator: per user, events are drawn from a TINY
timestamp domain (0..4, so equal-ts runs are the norm, not the edge)
and assigned to micro-batches under exactly the operator's ordering
contract — an event at a strictly later ts never lands in an earlier
batch, while events within an equal-ts run may scatter across batches
arbitrarily (the case the boundary buffer exists for).
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from glirel_spark.operators.events import FUNNEL_STEPS
from glirel_spark.streaming.funnel_state import make_update


class FakeGroupState:
    """Just the surface make_update touches: exists / get / update."""

    def __init__(self) -> None:
        self._v = None

    @property
    def exists(self) -> bool:
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v) -> None:
        self._v = v


def batch_funnel_times(events: list[tuple[int, str]], steps: list[str]):
    """Pure-python twin of operators/events.funnel_counts' chained
    conditional mins: fill time of step k = min ts of a step-k event
    at-or-after the step-(k-1) fill time. Returns {step_idx: ts}."""
    out: dict[int, int] = {}
    t_prev = None
    for k, s in enumerate(steps):
        cand = [ts for ts, ty in events if ty == s and (k == 0 or ts >= t_prev)]
        if not cand:
            break
        t_prev = min(cand)
        out[k] = t_prev
    return out


@st.composite
def split_scenarios(draw):
    """[(user, [(ts, type, batch), ...])] with contract-respecting,
    tie-adversarial batch assignment."""
    steps = FUNNEL_STEPS
    n_batches = draw(st.integers(1, 4))
    users = []
    for u in range(draw(st.integers(1, 3))):
        n_ev = draw(st.integers(0, 9))
        tss = sorted(
            draw(st.lists(st.integers(0, 4), min_size=n_ev, max_size=n_ev))
        )
        evs, cur, i = [], 0, 0
        while i < len(tss):
            j = i
            while j < len(tss) and tss[j] == tss[i]:
                j += 1
            batches = [
                draw(st.integers(cur, n_batches - 1)) for _ in range(j - i)
            ]
            cur = max(batches)
            for k in range(i, j):
                evs.append(
                    (tss[k], draw(st.sampled_from(steps)), batches[k - i])
                )
            i = j
        users.append((u, evs))
    return n_batches, users


@given(split_scenarios())
@settings(max_examples=300, deadline=None)
def test_stream_equals_batch_under_random_splits(scenario):
    n_batches, users = scenario
    update = make_update(FUNNEL_STEPS)
    states = {u: FakeGroupState() for u, _ in users}
    emitted: dict[tuple[int, int], int] = {}

    eid = 0
    for b in range(n_batches):
        for u, evs in users:
            rows = [(ts, ty) for ts, ty, bb in evs if bb == b]
            if not rows:
                continue  # applyInPandasWithState skips absent keys
            pdf = pd.DataFrame(
                {
                    "event_id": range(eid, eid + len(rows)),
                    "ts": pd.to_datetime([ts for ts, _ in rows], unit="s"),
                    "event_type": [ty for _, ty in rows],
                }
            )
            eid += len(rows)
            for out in update((u,), iter([pdf]), states[u]) or []:
                for r in out.itertuples(index=False):
                    key = (u, int(r.step_idx))
                    # append mode: each (user, step) emits exactly once
                    assert key not in emitted
                    emitted[key] = int(r.ts.timestamp())

    expect = {
        (u, k): ts
        for u, evs in users
        for k, ts in batch_funnel_times(
            [(ts, ty) for ts, ty, _ in evs], FUNNEL_STEPS
        ).items()
    }
    assert emitted == expect


@pytest.mark.usefixtures("spark")
def test_python_reference_matches_spark_batch(spark):
    """Anchor: batch_funnel_times == operators/events.funnel_counts on
    a tie-dense multi-user dataset (so the property test above is
    checking against the real batch semantics, not a drifted copy)."""
    import datetime

    from glirel_spark.operators.events import funnel_counts

    base = datetime.datetime(2024, 1, 1)
    raw = {
        1: [(0, "click"), (0, "view"), (0, "purchase"), (1, "click")],
        2: [(0, "view"), (2, "click"), (2, "click"), (2, "purchase")],
        3: [(3, "click"), (3, "purchase"), (4, "view"), (4, "view")],
        4: [(1, "view"), (1, "purchase"), (2, "click"), (3, "purchase")],
    }
    rows = [
        (i, base + datetime.timedelta(seconds=ts), u, ty, 1.0, "{}")
        for i, (u, evs) in enumerate(
            (u, ev) for u, evs in raw.items() for ev in evs
        )
        for ts, ty in [evs]
    ]
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    got = {
        r["step_idx"]: r["n_users"]
        for r in funnel_counts(spark.createDataFrame(rows, cols)).collect()
    }
    fills = [batch_funnel_times(evs, FUNNEL_STEPS) for evs in raw.values()]
    expect = {
        k: sum(1 for f in fills if k in f) for k in range(len(FUNNEL_STEPS))
    }
    assert got == expect
    # the dataset exercises what it claims: user 1 fills all three
    # steps at ONE tied timestamp; user 3 reaches step 0 only at ts=4
    # (after its click), so the chain never rewinds to click@3
    assert fills[0] == {0: 0, 1: 0, 2: 0}
    assert fills[2] == {0: 4}
