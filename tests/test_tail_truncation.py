"""The r9 tail-fold state bound (operators/timeseries._tail_truncated):
``ewma_last`` / ``holt_linear_last`` pre-truncate each key's history
map-side, so the collected per-key array is ≤ ``tail`` elements at ANY
history length — the grouped_topk_partial treatment the r8 verdict
prescribed for the unbounded collect_list buffers.

Equivalence is the load-bearing claim: the last-k of a union equals
the last-k of the per-part last-k's, so the bounded plan must produce
BIT-IDENTICAL folds to the brute-force recurrence over the full
history — exercised here with long histories deliberately scattered
across many input partitions (the WindowGroupLimit Partial node
truncates each partition independently, the case a single-partition
hypothesis example never reaches).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from hypertension_dashboard_pipeline_spark.operators.timeseries import (
    _tail_truncated,
    ewma_last,
    holt_linear_last,
)


def _mk_events(spark, n_users=5, n_events=500, n_parts=16):
    """Interleaved long histories: values depend on (user, seq) so any
    ordering or truncation mistake changes the fold result."""
    rows = [
        (u, s, float(u * 100000 + s), (u + 1) * 0.5 + s * 0.125)
        for u in range(n_users)
        for s in range(n_events)
    ]
    df = spark.createDataFrame(
        rows, "user_id int, ts int, event_id double, value double"
    )
    return df.repartition(n_parts)


def _brute_ewma(vals, decay=0.9, tail=8):
    t = vals[-tail:]
    acc, w = float(t[0]), 1.0
    for x in t[1:]:
        acc = acc * decay + float(x)
        w = w * decay + 1.0
    return acc / w


def _brute_holt(vals, alpha=0.5, beta=0.25, tail=12):
    t = vals[-tail:]
    lvl, trd = float(t[0]), 0.0
    for x in t[1:]:
        lp = alpha * x + (1.0 - alpha) * (lvl + trd)
        trd = beta * (lp - lvl) + (1.0 - beta) * trd
        lvl = lp
    return lvl, trd


def test_truncated_residue_is_exactly_tail_and_counts_full(spark):
    df = _mk_events(spark)
    counts, trunc = _tail_truncated(
        df, "user_id", ["ts", "event_id"], "value", tail=8
    )
    per_key = {
        r.user_id: r.n
        for r in trunc.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    assert per_key == {u: 8 for u in range(5)}
    got_counts = {r.user_id: r.n_events for r in counts.collect()}
    assert got_counts == {u: 500 for u in range(5)}
    # the residue is the true LAST 8 by (ts, event_id)
    kept = {
        r.user_id: sorted(r.tss)
        for r in trunc.groupBy("user_id")
        .agg(F.collect_list("ts").alias("tss"))
        .collect()
    }
    assert kept == {u: list(range(492, 500)) for u in range(5)}


def test_ewma_bounded_plan_equals_bruteforce_on_long_history(spark):
    df = _mk_events(spark)
    got = {
        r.user_id: (r.n_events, r.ewma_last)
        for r in ewma_last(
            df, "user_id", ["ts", "event_id"], "value", decay=0.9, tail=8
        ).collect()
    }
    for u in range(5):
        vals = [(u + 1) * 0.5 + s * 0.125 for s in range(500)]
        n, e = got[u]
        assert n == 500
        assert e == _brute_ewma(vals), u  # identical IEEE fold — exact


def test_holt_bounded_plan_equals_bruteforce_on_long_history(spark):
    df = _mk_events(spark)
    got = {
        r.user_id: (r.n_events, r.level, r.trend)
        for r in holt_linear_last(
            df, "user_id", ["ts", "event_id"], "value",
            alpha=0.5, beta=0.25, tail=12,
        ).collect()
    }
    for u in range(5):
        vals = [(u + 1) * 0.5 + s * 0.125 for s in range(500)]
        lvl, trd = _brute_holt(vals)
        n, glvl, gtrd = got[u]
        assert n == 500
        assert glvl == lvl and gtrd == trd, u


def test_ewma_null_and_tie_contracts_survive_truncation(spark):
    # nulls skipped everywhere (count AND tail); ts ties break on
    # event_id; all-null keys emit no row
    rows = [
        (1, 0, 1.0, 10.0), (1, 0, 2.0, 20.0), (1, 1, 3.0, None),
        (1, 2, 4.0, 30.0),
        (2, 0, 5.0, None),
    ]
    df = spark.createDataFrame(
        rows, "user_id int, ts int, event_id double, value double"
    ).repartition(4)
    out = {r.user_id: (r.n_events, r.ewma_last)
           for r in ewma_last(df, "user_id", ["ts", "event_id"], "value",
                              decay=0.9, tail=2).collect()}
    assert set(out) == {1}
    n, e = out[1]
    assert n == 3  # nulls excluded from the count too
    assert e == _brute_ewma([20.0, 30.0], tail=2)


def test_truncation_is_deterministic_when_order_cols_tie(spark):
    # ADVICE r9 #1: the contract is a unique trailing order column,
    # but if callers violate it, the value_col tiebreaker in the
    # truncation window must keep the kept SET deterministic.  Key 1
    # has a full (ts, event_id) tie at the tail boundary: with tail=2
    # exactly one of the two tied rows survives, and the tiebreaker
    # (value desc) pins WHICH one — the higher value — on every run
    # and partitioning.
    rows = [
        (1, 0, 1.0, 5.0),
        (1, 1, 2.0, 10.0),   # tied with the next row on (ts, event_id)
        (1, 1, 2.0, 40.0),
        (1, 2, 3.0, 30.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id int, ts int, event_id double, value double"
    )
    expect = _brute_ewma([40.0, 30.0], tail=2)
    for n_parts in (1, 3, 7):
        out = ewma_last(
            df.repartition(n_parts), "user_id", ["ts", "event_id"],
            "value", decay=0.9, tail=2,
        ).collect()
        assert len(out) == 1
        assert out[0]["n_events"] == 4
        assert out[0]["ewma_last"] == expect, n_parts


def test_tail_fold_plans_contain_mapside_truncation(spark):
    # the scale property is structural: the bounded plan must carry
    # the WindowGroupLimit rank-limit pushdown (Partial truncates each
    # partition BEFORE the exchange; state ≤ tail per key), with zero
    # Python in the path
    df = _mk_events(spark, n_users=2, n_events=30, n_parts=4)
    for op in (
        lambda d: ewma_last(d, "user_id", ["ts", "event_id"], "value"),
        lambda d: holt_linear_last(d, "user_id", ["ts", "event_id"], "value"),
    ):
        plan = op(df)._jdf.queryExecution().executedPlan().toString()
        assert "WindowGroupLimit" in plan, plan[:2000]
        assert "MapInPandas" not in plan, plan[:2000]
