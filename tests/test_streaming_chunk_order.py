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

streaming/cusum.py got the same fix in r10 (its rotation round): its
reset-on-alarm fold is NONLINEAR in input order, so chunk-order
divergence is worse there than for the linear EWMA — pinned below
with a value set chosen so the per-chunk composition fires a
different alarm count, not just a different final s.
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


def _cusum_chunks():
    # same interleaved-ts chunk layout as _chunks(), with values chosen
    # so the broken sorted(c1)+sorted(c2) composition folds the three
    # 150s CONSECUTIVELY (s walks 60 → 120 → alarm) while the true
    # global (ts, event_id) order alternates them with sub-level values
    # (s never exceeds 60, zero alarms) — a different ALARM COUNT, the
    # worst-case divergence for a reset-on-alarm fold.
    c1 = pd.DataFrame({
        "user_id": [7, 7, 7],
        "ts": pd.to_datetime(["2024-01-01 00:05", "2024-01-01 00:01",
                              "2024-01-01 00:09"]),
        "event_id": [5.0, 1.0, 9.0],
        "value": [150.0, 150.0, 150.0],
    })
    c2 = pd.DataFrame({
        "user_id": [7, 7, 7],
        "ts": pd.to_datetime(["2024-01-01 00:03", "2024-01-01 00:07",
                              "2024-01-01 00:02"]),
        "event_id": [3.0, 7.0, 2.0],
        "value": [10.0, 10.0, 10.0],
    })
    return c1, c2


def _cusum_fold(values):
    from hypertension_dashboard_pipeline_spark.streaming.cusum import (
        LEVEL, THRESHOLD,
    )

    s, a = 0.0, 0
    for x in values:
        t = max(0.0, s + float(x) - LEVEL)
        if t > THRESHOLD:
            a += 1
            s = 0.0
        else:
            s = t
    return s, a


def test_streaming_cusum_folds_in_global_order_across_chunks():
    from hypertension_dashboard_pipeline_spark.streaming.cusum import (
        _update_user,
    )

    c1, c2 = _cusum_chunks()
    both = pd.concat([c1, c2]).sort_values(["ts", "event_id"])
    expect_s, expect_a = _cusum_fold([float(v) for v in both["value"]])
    per_chunk = (
        [float(v) for v in c1.sort_values(["ts", "event_id"])["value"]]
        + [float(v) for v in c2.sort_values(["ts", "event_id"])["value"]]
    )
    broken_s, broken_a = _cusum_fold(per_chunk)
    # the construction really discriminates: the broken composition
    # fires an alarm the true order never reaches
    assert expect_a == 0 and broken_a == 1

    state = _FakeState()
    out = list(_update_user((7,), iter([c1, c2]), state))
    assert len(out) == 1
    assert out[0]["n_alarms"].iloc[0] == expect_a
    assert out[0]["final_s"].iloc[0] == expect_s
    assert state.get == (6, expect_s, expect_a)


def test_streaming_cusum_state_carries_across_microbatches():
    from hypertension_dashboard_pipeline_spark.streaming.cusum import (
        _update_user,
    )

    c1, c2 = _cusum_chunks()
    both = pd.concat([c1, c2]).sort_values(["ts", "event_id"])
    vals = [float(v) for v in both["value"]]
    state = _FakeState()
    list(_update_user((7,), iter([c1, c2]), state))
    nxt = pd.DataFrame({
        "user_id": [7, 7],
        "ts": pd.to_datetime(["2024-01-01 00:11", "2024-01-01 00:10"]),
        "event_id": [11.0, 10.0],
        "value": [300.0, None],
    })
    out = list(_update_user((7,), iter([nxt]), state))
    s, a = _cusum_fold(vals + [300.0])
    assert a == 1  # 60 + 300 - 90 = 270 > 120: the carried s matters
    assert state.get == (7, s, a)  # null skipped in n_events
    assert out[0]["n_alarms"].iloc[0] == a
    assert out[0]["final_s"].iloc[0] == s


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
