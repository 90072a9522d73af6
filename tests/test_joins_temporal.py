"""Temporal join operators (as-of, band/range) — semantics pinned on
hand-built frames where the expected matches are computable by eye,
plus plan shape (one equi-shuffle, no cartesian/range explosion)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from hypertension_dashboard_pipeline_spark.operators import joins as jn


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def asof_frames(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts("2024-01-01 10:00:00")),  # after q1 → q1
            (2, "u1", _ts("2024-01-01 12:00:00")),  # exactly at q2 → q2 (<=)
            (3, "u1", _ts("2024-01-01 09:00:00")),  # before any quote → null
            (4, "u2", _ts("2024-01-02 00:00:00")),  # other key → u2's quote
            (5, "u3", _ts("2024-01-02 00:00:00")),  # key with no right rows
        ],
        "order_id long, user string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01 09:30:00"), 10.0),  # q1
            ("u1", _ts("2024-01-01 12:00:00"), 20.0),  # q2
            ("u1", _ts("2024-01-01 13:00:00"), 30.0),  # later than all orders
            ("u2", _ts("2024-01-01 23:00:00"), 40.0),
        ],
        "user string, ts timestamp, quote double",
    )
    return left, right


def test_asof_backward_semantics(asof_frames):
    left, right = asof_frames
    got = {
        r["order_id"]: r["quote"]
        for r in jn.asof_join(left, right, on=["user"]).collect()
    }
    assert got == {1: 10.0, 2: 20.0, 3: None, 4: 40.0, 5: None}


def test_asof_preserves_left_rowcount(asof_frames):
    left, right = asof_frames
    assert jn.asof_join(left, right, on=["user"]).count() == left.count()


def test_asof_null_payload_field_still_matches(spark):
    """A right row whose payload VALUE is null must still win over an
    older non-null row (struct carry, not value carry)."""
    left = spark.createDataFrame(
        [(1, "u", _ts("2024-01-01 10:00:00"))],
        "order_id long, user string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u", _ts("2024-01-01 08:00:00"), 1.0),
            ("u", _ts("2024-01-01 09:00:00"), None),  # latest, null payload
        ],
        "user string, ts timestamp, quote double",
    )
    [row] = jn.asof_join(left, right, on=["user"]).collect()
    assert row["quote"] is None


def test_asof_payload_collision_raises(asof_frames):
    left, right = asof_frames
    with pytest.raises(ValueError, match="collide"):
        jn.asof_join(left, right, on=["user"], payload=["ts"])


def test_asof_plan_single_shuffle_no_python(asof_frames):
    left, right = asof_frames
    plan = (
        jn.asof_join(left, right, on=["user"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    # union + window: exactly one exchange on the key (plus AQE reads)
    assert plan.count("Exchange hashpartitioning") <= 1


@pytest.fixture(scope="module")
def band_frames(spark):
    a = spark.createDataFrame(
        [
            (1, "u1", _ts("2024-01-01 10:00:00")),
            (2, "u1", _ts("2024-01-01 11:00:00")),
            (3, "u2", _ts("2024-01-01 10:00:00")),
        ],
        "a_id long, user string, ts timestamp",
    )
    b = spark.createDataFrame(
        [
            # 60s after a1: in band for gap>=60
            (101, "u1", _ts("2024-01-01 10:01:00")),
            # exactly at the band edge for gap=120 (inclusive)
            (102, "u1", _ts("2024-01-01 10:02:00")),
            # 1s past the band for gap=120
            (103, "u1", _ts("2024-01-01 10:02:01")),
            # other key, same instant as a3
            (104, "u2", _ts("2024-01-01 10:00:00")),
        ],
        "b_id long, user string, b_ts timestamp",
    )
    return a, b


def test_range_join_band_inclusive(band_frames):
    a, b = band_frames
    got = {
        (r["a_id"], r["b_id"], r["gap_us"])
        for r in jn.range_join(
            a, b, on=["user"], ts_a="ts", ts_b="b_ts", max_gap_sec=120
        ).collect()
    }
    assert got == {
        (1, 101, 60_000_000),
        (1, 102, 120_000_000),  # inclusive edge
        (3, 104, 0),
    }


def test_range_join_pairs_emitted_exactly_once(band_frames):
    """Bucket replication must not duplicate a qualifying pair (each
    pair meets on exactly one bucket equality)."""
    a, b = band_frames
    rows = jn.range_join(
        a, b, on=["user"], ts_a="ts", ts_b="b_ts", max_gap_sec=86_400
    ).collect()
    pairs = [(r["a_id"], r["b_id"]) for r in rows]
    assert len(pairs) == len(set(pairs))
    # all same-key pairs qualify at a 1-day band on this fixture:
    # u1: 2 a-rows × 3 b-rows, u2: 1 × 1
    assert len(pairs) == 7


def test_range_join_equijoin_plan(band_frames):
    a, b = band_frames
    plan = (
        jn.range_join(a, b, on=["user"], ts_a="ts", ts_b="b_ts")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan


# ---------------------------------------------------------------------------
# property tests: random frames vs brute-force python reference
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_ts_strategy = st.integers(0, 3600)  # seconds within an hour
_key_strategy = st.sampled_from(["u1", "u2", "u3"])


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    left=st.lists(st.tuples(_key_strategy, _ts_strategy), min_size=1,
                  max_size=12),
    right=st.lists(st.tuples(_key_strategy, _ts_strategy), min_size=0,
                   max_size=12),
)
def test_asof_join_matches_bruteforce(spark, left, right):
    """asof_join == per-row 'latest right ts <= left ts' scan, for any
    key/ts combination (right deduped per (key, ts) as the operator
    contract requires)."""
    lrows = [
        (i, k, _ts("2024-01-01 00:00:00") + dt.timedelta(seconds=s))
        for i, (k, s) in enumerate(left)
    ]
    rdedup = {}
    for k, s in right:
        ts = _ts("2024-01-01 00:00:00") + dt.timedelta(seconds=s)
        rdedup[(k, ts)] = float(s)
    rrows = [(k, ts, v) for (k, ts), v in rdedup.items()]

    ldf = spark.createDataFrame(lrows, "row_id long, user string, ts timestamp")
    rdf = spark.createDataFrame(
        rrows or [("zz", _ts("1999-01-01 00:00:00"), 0.0)],
        "user string, ts timestamp, quote double",
    )
    got = {
        r["row_id"]: r["quote"]
        for r in jn.asof_join(ldf, rdf, on=["user"]).collect()
    }
    want = {}
    for i, k, ts in lrows:
        cands = [(rts, v) for (rk, rts, v) in rrows if rk == k and rts <= ts]
        want[i] = max(cands)[1] if cands else None
    assert got == want


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    a=st.lists(st.tuples(_key_strategy, _ts_strategy), min_size=1,
               max_size=10),
    b=st.lists(st.tuples(_key_strategy, _ts_strategy), min_size=1,
               max_size=10),
    gap=st.sampled_from([60, 127, 600]),
)
def test_range_join_matches_bruteforce(spark, a, b, gap):
    """range_join == the filtered cross product |Δt| <= gap, for any
    bucket alignment (gap chosen to exercise odd strides)."""
    arows = [
        (i, k, _ts("2024-01-01 00:00:00") + dt.timedelta(seconds=s))
        for i, (k, s) in enumerate(a)
    ]
    brows = [
        (1000 + j, k, _ts("2024-01-01 00:00:00") + dt.timedelta(seconds=s))
        for j, (k, s) in enumerate(b)
    ]
    adf = spark.createDataFrame(arows, "a_id long, user string, ts timestamp")
    bdf = spark.createDataFrame(brows, "b_id long, user string, b_ts timestamp")
    got = {
        (r["a_id"], r["b_id"]): r["gap_us"]
        for r in jn.range_join(
            adf, bdf, on=["user"], ts_a="ts", ts_b="b_ts", max_gap_sec=gap
        ).collect()
    }
    want = {}
    for ai, ak, ats in arows:
        for bj, bk, bts in brows:
            if ak == bk and abs((bts - ats).total_seconds()) <= gap:
                want[(ai, bj)] = int((bts - ats).total_seconds() * 1_000_000)
    assert got == want
