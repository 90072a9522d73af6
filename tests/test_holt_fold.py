"""Unit + property tests for the r8 Holt linear-trend fold
(operators/timeseries.holt_linear_last), cross-checked against an
independent brute-force Python recurrence (the recompute-by-hand QC
idiom, 3_blood_pressure.R:177-182, SURVEY.md §5.4) — same treatment
as the EWMA/CUSUM folds in test_r8_ops.py."""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hypertension_dashboard_pipeline_spark.operators.timeseries import holt_linear_last

ALPHA, BETA, TAIL = 0.5, 0.25, 12


def _brute_holt(vals: list[float], alpha: float = ALPHA,
                beta: float = BETA, tail: int = TAIL) -> tuple[float, float]:
    t = vals[-tail:]
    lvl, trd = float(t[0]), 0.0
    for x in t[1:]:
        lp = alpha * x + (1.0 - alpha) * (lvl + trd)
        trd = beta * (lp - lvl) + (1.0 - beta) * trd
        lvl = lp
    return lvl, trd


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(series=st.lists(
    st.lists(
        st.floats(min_value=-1e6, max_value=1e6,
                  allow_nan=False, allow_infinity=False),
        min_size=1, max_size=20,
    ),
    min_size=1, max_size=4,
))
def test_holt_matches_bruteforce(spark, series):
    rows = [
        (uid, seq, float(seq), v)
        for uid, vals in enumerate(series)
        for seq, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "user_id int, ts int, event_id double, value double")
    got = {
        r.user_id: (r.n_events, r.level, r.trend)
        for r in holt_linear_last(
            df, "user_id", ["ts", "event_id"], "value",
            alpha=ALPHA, beta=BETA, tail=TAIL,
        ).collect()
    }
    for uid, vals in enumerate(series):
        lvl, trd = _brute_holt(vals)
        n, glvl, gtrd = got[uid]
        assert n == len(vals)
        # the Spark fold runs the identical IEEE sequence — exact
        assert glvl == lvl and gtrd == trd, (uid, vals)


def test_holt_single_event_is_identity(spark):
    df = spark.createDataFrame(
        [(1, 0, 0.0, 42.5)], "user_id int, ts int, event_id double, value double"
    )
    r = holt_linear_last(df, "user_id", ["ts", "event_id"], "value").collect()[0]
    assert (r.n_events, r.level, r.trend) == (1, 42.5, 0.0)


def test_holt_ts_ties_break_on_event_id(spark):
    # same ts for all three rows: fold order must follow event_id
    df = spark.createDataFrame(
        [(1, 5, 2.0, 20.0), (1, 5, 0.0, 0.0), (1, 5, 1.0, 10.0)],
        "user_id int, ts int, event_id double, value double",
    )
    r = holt_linear_last(df, "user_id", ["ts", "event_id"], "value").collect()[0]
    lvl, trd = _brute_holt([0.0, 10.0, 20.0])
    assert math.isclose(r.level, lvl, rel_tol=0, abs_tol=0)
    assert math.isclose(r.trend, trd, rel_tol=0, abs_tol=0)


def test_holt_tail_bounds_lookback(spark):
    # 30 leading junk values then TAIL constant 7.0s: the fold must see
    # only the constant tail (level 7, trend 0)
    rows = [(1, i, float(i), 1e6) for i in range(30)]
    rows += [(1, 30 + i, float(30 + i), 7.0) for i in range(TAIL)]
    df = spark.createDataFrame(
        rows, "user_id int, ts int, event_id double, value double"
    )
    r = holt_linear_last(df, "user_id", ["ts", "event_id"], "value").collect()[0]
    assert (r.level, r.trend) == (7.0, 0.0)
    assert r.n_events == 30 + TAIL


def test_holt_null_measurement_contract(spark):
    # nulls are SKIPPED (n_events counts only non-null); an all-null
    # key emits no row (SURVEY §7 r7->r8 step 5)
    df = spark.createDataFrame(
        [(1, 0, 0.0, 3.0), (1, 1, 1.0, None), (1, 2, 2.0, 5.0),
         (2, 0, 0.0, None)],
        "user_id int, ts int, event_id double, value double",
    )
    out = holt_linear_last(df, "user_id", ["ts", "event_id"], "value").collect()
    assert len(out) == 1 and out[0].user_id == 1
    lvl, trd = _brute_holt([3.0, 5.0])
    assert (out[0].n_events, out[0].level, out[0].trend) == (2, lvl, trd)
