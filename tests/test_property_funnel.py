"""Property-based cross-check for the windowed funnel DP.

The latest-reach DP in ``operators/analytics.funnel_within`` claims
equivalence with "does any qualifying chain exist" — this drives it
with random multi-user event sequences INCLUDING duplicate per-user
timestamps (small offset range, so hypothesis collides them
constantly — the case the per-instant commit batching exists for) and
compares against an independent brute-force chain search, the same
recompute-by-hand QC idiom the dedup property tests use."""

from __future__ import annotations

import datetime as dt
from itertools import product

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hypertension_dashboard_pipeline_spark.operators import analytics as an

STEPS = ["s0", "s1", "s2"]
EVENT_TYPES = STEPS + ["noise"]
BASE = dt.datetime(2024, 1, 1)

# per user: a list of (offset_seconds, event_type); offsets are made
# distinct per user below
user_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=50),
        st.sampled_from(EVENT_TYPES),
    ),
    min_size=0,
    max_size=8,
)
scenario = st.lists(user_events, min_size=1, max_size=4)


def _brute_depth(events, gap_s: int) -> int:
    """Max funnel depth via exhaustive chain search: exists
    t0 < t1 <= t0+gap < ... over events of the right types."""
    by_step = [sorted(t for t, e in events if e == s) for s in STEPS]
    best = 0
    if by_step[0]:
        best = 1
    for d in range(2, len(STEPS) + 1):
        found = False
        for chain in product(*by_step[:d]):
            ok = all(
                chain[i] > chain[i - 1] and chain[i] <= chain[i - 1] + gap_s
                for i in range(1, d)
            )
            if ok:
                found = True
                break
        if found:
            best = d
    return best


@pytest.mark.usefixtures("spark")
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(scenario=scenario, gap_s=st.sampled_from([1, 5, 20]))
def test_windowed_funnel_matches_brute_force(spark, scenario, gap_s):
    rows = []
    truth_depths = []
    for uid, evs in enumerate(scenario):
        # duplicate offsets are kept AS-IS: the brute force compares
        # times by value (strict >), which is the exact semantics the
        # commit-batched DP must reproduce under collisions
        truth_depths.append(_brute_depth(evs, gap_s))
        for off, typ in evs:
            rows.append((uid, BASE + dt.timedelta(seconds=off), typ))
    expected = {
        i: sum(1 for d in truth_depths if d > i) for i in range(len(STEPS))
    }
    if not rows:
        return
    df = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_type string"
    )
    got = {
        r["step_idx"]: r["n_users"]
        for r in an.funnel_within(df, STEPS, gap_s * 1_000_000).collect()
    }
    assert got == expected
