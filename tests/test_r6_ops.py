"""Property tests for the r6 debut operators: sampled heavy hitters,
linear gap interpolation."""

from __future__ import annotations

import datetime as dt
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from hypertension_dashboard_pipeline_spark.operators.analytics import heavy_hitters
from hypertension_dashboard_pipeline_spark.operators.timeseries import (
    gap_fill_interpolate,
)


def test_heavy_hitters_exact_on_skewed_corpus(spark):
    # 1 hot key with 60% of rows, 1 warm key at 20%, 200 cold keys
    rows = []
    rid = 0
    for _ in range(600):
        rows.append((rid, "hot")); rid += 1
    for _ in range(200):
        rows.append((rid, "warm")); rid += 1
    for i in range(200):
        rows.append((rid, f"cold_{i}")); rid += 1
    df = spark.createDataFrame(rows, "rid LONG, key STRING")
    out = {
        r["key"]: (r["n_rows"], r["pct_of_total"])
        for r in heavy_hitters(df, "key", "rid", theta=0.1).collect()
    }
    # precision contract: every emitted row is a TRUE theta-hitter with
    # its TRUE count
    assert out["hot"] == (600, 60.0)
    assert out["warm"] == (200, 20.0)
    assert all(not k.startswith("cold") for k in out)


def test_heavy_hitters_no_false_positives_below_theta(spark):
    df = spark.createDataFrame(
        [(i, f"k{i % 50}") for i in range(1000)], "rid LONG, key STRING"
    )  # every key at exactly 2% < theta=10%
    assert heavy_hitters(df, "key", "rid", theta=0.1).count() == 0


def _brute_interpolate(obs: dict[int, float], d0: int, d1: int) -> dict[int, float]:
    """Reference: linear interpolation on integer day axis with LOCF
    tail, floor-form rounding at 4dp."""
    days = sorted(obs)
    out = {}
    for d in range(d0, d1 + 1):
        prev = max((x for x in days if x <= d), default=None)
        nxt = min((x for x in days if x >= d), default=None)
        if nxt is None or nxt == prev:
            v = obs[prev]
        else:
            v = obs[prev] + (obs[nxt] - obs[prev]) * ((d - prev) / (nxt - prev))
        s = v * 10000.0 + 0.5
        # true floor (round_fixed computes it as s - pmod(s, 1.0), a
        # NONNEGATIVE remainder — C fmod would truncate toward zero on
        # negatives and round the wrong way)
        out[d] = float(math.floor(s)) / 10000.0
    return out


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    obs=st.dictionaries(
        st.integers(min_value=0, max_value=25),
        st.floats(min_value=-100, max_value=100, allow_nan=False,
                  width=32),
        min_size=1, max_size=10,
    ),
    horizon_extra=st.integers(min_value=0, max_value=5),
)
def test_interpolate_matches_brute_force(spark, obs, horizon_extra):
    base = dt.date(2024, 1, 1)
    d1_int = max(obs) + horizon_extra
    rows = [
        (1, base + dt.timedelta(days=d), float(v)) for d, v in obs.items()
    ]
    daily = spark.createDataFrame(rows, "key INT, day DATE, v DOUBLE")
    horizon = spark.createDataFrame(
        [(base + dt.timedelta(days=d1_int),)], "d1 DATE"
    )
    out = gap_fill_interpolate(daily, "key", "day", "v", horizon)
    got = {(r["day"] - base).days: r["filled"] for r in out.collect()}
    want = _brute_interpolate(obs, min(obs), d1_int)
    assert got.keys() == want.keys()
    for d in want:
        assert got[d] == want[d], (d, got[d], want[d], obs)


def test_interpolate_flags_gaps_and_midpoint(spark):
    base = dt.date(2024, 1, 1)
    daily = spark.createDataFrame(
        [(1, base, 10.0), (1, base + dt.timedelta(days=2), 20.0)],
        "key INT, day DATE, v DOUBLE",
    )
    horizon = spark.createDataFrame([(base + dt.timedelta(days=3),)], "d1 DATE")
    out = {
        (r["day"] - base).days: (r["filled"], r["is_gap"])
        for r in gap_fill_interpolate(
            daily, "key", "day", "v", horizon
        ).collect()
    }
    assert out[0] == (10.0, False)
    assert out[1] == (15.0, True)   # linear midpoint, not LOCF's 10
    assert out[2] == (20.0, False)
    assert out[3] == (20.0, True)   # LOCF tail past the last observation


def test_power_iteration_matches_numpy():
    import numpy as np

    from hypertension_dashboard_pipeline_spark.operators.analytics import (
        power_iteration_top_component,
    )

    rng = np.random.default_rng(7)
    for _ in range(20):
        a = rng.normal(size=(8, 8))
        gram = (a @ a.T).tolist()  # symmetric PSD, generic spectrum
        # error ~ (lambda2/lambda1)^iters; random 8x8 gaps reach 0.92,
        # so 300 iterations put every trial far below the tolerance
        v, lam = power_iteration_top_component(gram, iters=300)
        w, vecs = np.linalg.eigh(np.array(gram))
        top = vecs[:, -1]
        got = np.array(v)
        # sign-align, then compare direction and eigenvalue
        if float(np.dot(got, top)) < 0:
            top = -top
        assert np.allclose(got, top, atol=1e-6), (got, top)
        assert abs(lam - w[-1]) < 1e-6 * max(1.0, abs(w[-1]))


def test_power_iteration_zero_gram_contract():
    from hypertension_dashboard_pipeline_spark.operators.analytics import (
        power_iteration_top_component,
    )

    v, lam = power_iteration_top_component([[0.0] * 8 for _ in range(8)])
    assert v == [0.0] * 8 and lam == 0.0
