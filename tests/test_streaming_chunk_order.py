"""Pins the r9 streaming chunk-order fix (ADVICE r8 #4): a key's rows
within one micro-batch can arrive split across MULTIPLE Arrow chunks,
and per-chunk sorts do not compose into a global (ts, event_id) order
— the update functions must concat all chunks and sort ONCE before
extending the tail, or the fold diverges from the batch twin on chunk
boundaries.

Exercised at the unit level (the only way to force Arrow chunking
deterministically): ``_update_user`` is called directly with two
deliberately interleaved pandas chunks whose concatenation is
unordered, and the emitted fold must equal the brute-force recurrence
over the globally sorted values.  The pre-fix code (sort each chunk,
extend, truncate) produces a DIFFERENT tail here — asserted too, so
the test fails if the fix regresses AND documents why it matters.

streaming/cusum.py keeps the per-chunk form until its r10 rotation
(registry r9 notes) — no pin for it yet, by design.
"""

from __future__ import annotations

import pandas as pd


class _FakeState:
    """Minimal stand-in for pyspark GroupState (get/update/exists)."""

    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v


def _chunks():
    # two chunks; the key's rows interleave in time ACROSS them, so
    # sorted(c1) + sorted(c2) != sorted(c1 + c2)
    c1 = pd.DataFrame({
        "user_id": [7, 7, 7],
        "ts": pd.to_datetime(["2024-01-01 00:05", "2024-01-01 00:01",
                              "2024-01-01 00:09"]),
        "event_id": [5.0, 1.0, 9.0],
        "value": [50.0, 10.0, 90.0],
    })
    c2 = pd.DataFrame({
        "user_id": [7, 7, 7],
        "ts": pd.to_datetime(["2024-01-01 00:03", "2024-01-01 00:07",
                              "2024-01-01 00:02"]),
        "event_id": [3.0, 7.0, 2.0],
        "value": [30.0, 70.0, 20.0],
    })
    return c1, c2


def _global_values():
    c1, c2 = _chunks()
    both = pd.concat([c1, c2]).sort_values(["ts", "event_id"])
    return [float(v) for v in both["value"]]


def test_streaming_ewma_folds_in_global_order_across_chunks():
    from hypertension_dashboard_pipeline_spark.streaming.ewma import (
        TAIL, _fold, _update_user,
    )

    state = _FakeState()
    out = list(_update_user((7,), iter(_chunks()), state))
    assert len(out) == 1
    got = out[0]["ewma_last"].iloc[0]
    expect = _fold(_global_values()[-TAIL:])
    assert got == expect  # identical IEEE fold — exact
    # and the broken per-chunk composition really is different here
    c1, c2 = _chunks()
    per_chunk = (
        [float(v) for v in c1.sort_values(["ts", "event_id"])["value"]]
        + [float(v) for v in c2.sort_values(["ts", "event_id"])["value"]]
    )[-TAIL:]
    assert _fold(per_chunk) != expect

    n_events, tail = state.get
    assert n_events == 6
    assert list(tail) == _global_values()[-TAIL:]


def test_streaming_holt_folds_in_global_order_across_chunks():
    from hypertension_dashboard_pipeline_spark.streaming.holt import (
        TAIL, _fold, _update_user,
    )

    state = _FakeState()
    out = list(_update_user((7,), iter(_chunks()), state))
    assert len(out) == 1
    lvl, trd = _fold(_global_values()[-TAIL:])
    assert out[0]["level"].iloc[0] == lvl
    assert out[0]["trend"].iloc[0] == trd


def test_streaming_ewma_state_carries_across_microbatches():
    # second micro-batch: state tail extends and truncates; all-null
    # chunks leave state untouched but still emit (tail non-empty)
    from hypertension_dashboard_pipeline_spark.streaming.ewma import (
        TAIL, _fold, _update_user,
    )

    state = _FakeState()
    list(_update_user((7,), iter(_chunks()), state))
    nxt = pd.DataFrame({
        "user_id": [7, 7],
        "ts": pd.to_datetime(["2024-01-01 00:11", "2024-01-01 00:10"]),
        "event_id": [11.0, 10.0],
        "value": [110.0, None],
    })
    out = list(_update_user((7,), iter([nxt]), state))
    n_events, tail = state.get
    assert n_events == 7  # null skipped
    vals = (_global_values() + [110.0])[-TAIL:]
    assert list(tail) == vals
    assert out[0]["ewma_last"].iloc[0] == _fold(vals)
