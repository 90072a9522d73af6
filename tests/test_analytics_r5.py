"""Property tests for the r5-wave operators: gap sessionization,
KL drift, and the distributed-prefix-sum concurrency peak.

The parity sweep pins these against their DuckDB oracles on the
testdata; these tests pin the SEMANTICS on adversarial synthetic
inputs the testdata may not contain — above all intervals that cross
midnight, which is the one case that proves the concurrency carry-in
logic (a per-day running sum with carry_in=0 everywhere would pass the
testdata sweep if no interval happened to straddle a day boundary).
"""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import functions as F

from hypertension_dashboard_pipeline_spark.operators import analytics as an

T0 = dt.datetime(2024, 3, 1, 10, 0, 0)


def _events(spark, rows):
    """rows: (user_id, minutes_offset, event_id)"""
    return spark.createDataFrame(
        [
            (u, T0 + dt.timedelta(minutes=m), e)
            for u, m, e in rows
        ],
        "user_id long, ts timestamp, event_id long",
    )


def test_sessionize_splits_on_gap(spark):
    # user 1: events at 0, 10, 20 (one session), then 60 (new session)
    # user 2: single event
    df = _events(
        spark,
        [(1, 0, 1), (1, 10, 2), (1, 20, 3), (1, 60, 4), (2, 5, 5)],
    )
    out = {
        (r["user_id"], r["session_seq"]): r
        for r in an.sessionize(df, gap_us=30 * 60 * 1_000_000).collect()
    }
    assert set(out) == {(1, 1), (1, 2), (2, 1)}
    assert out[(1, 1)]["n_events"] == 3
    assert out[(1, 1)]["duration_us"] == 20 * 60 * 1_000_000
    assert out[(1, 2)]["n_events"] == 1
    assert out[(1, 2)]["duration_us"] == 0
    assert out[(2, 1)]["n_events"] == 1


def test_sessionize_gap_boundary_is_strict(spark):
    # a gap EXACTLY equal to gap_us does not split (rule is `> gap`)
    df = _events(spark, [(1, 0, 1), (1, 30, 2)])
    out = an.sessionize(df, gap_us=30 * 60 * 1_000_000).collect()
    assert len(out) == 1 and out[0]["n_events"] == 2


def test_concurrency_carry_in_across_midnight(spark):
    # Three intervals open 23:30-01:30 (next day), one at 00:30-02:30:
    # day-1 peak is 3; day-2 inherits 3 open intervals at midnight and
    # adds one more -> peak 4.  A carry_in-less per-day sum would
    # report day-2 peak as 1.
    base = dt.datetime(2024, 3, 1, 23, 30, 0)
    df = spark.createDataFrame(
        [
            (1, base, 1),
            (2, base + dt.timedelta(minutes=5), 2),
            (3, base + dt.timedelta(minutes=10), 3),
            (4, base + dt.timedelta(minutes=60), 4),  # 00:30 next day
        ],
        "user_id long, ts timestamp, event_id long",
    )
    out = {
        r["day"]: r
        for r in an.concurrency_peak_daily(
            df, horizon_us=2 * 3600 * 1_000_000
        ).collect()
    }
    d1, d2 = dt.date(2024, 3, 1), dt.date(2024, 3, 2)
    assert out[d1]["peak_concurrency"] == 3
    assert out[d1]["n_opens"] == 3
    assert out[d2]["peak_concurrency"] == 4
    assert out[d2]["n_opens"] == 1


def test_concurrency_matches_naive_global_prefix(spark, sf_smoke):
    """Distributed two-pass == naive single-partition global running
    sum, on real data (the identity the scale-safe plan must keep)."""
    from pyspark.sql.window import Window

    from hypertension_dashboard_pipeline_spark.io import load_table

    ev = load_table(spark, sf_smoke, "events")
    horizon = 1_800_000_000
    got = {
        r["day"]: (r["peak_concurrency"], r["n_opens"])
        for r in an.concurrency_peak_daily(ev, horizon_us=horizon).collect()
    }
    opens = ev.select(
        F.col("ts").alias("t"), F.lit(1).alias("d"),
        F.col("event_id").alias("eid"),
    )
    closes = ev.select(
        F.timestamp_micros(F.unix_micros("ts") + F.lit(horizon)).alias("t"),
        F.lit(-1).alias("d"),
        F.col("event_id").alias("eid"),
    )
    deltas = opens.unionByName(closes)
    w = Window.orderBy("t", "d", "eid").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    naive = (
        deltas.withColumn("run", F.sum("d").over(w))
        .groupBy(F.to_date(F.date_trunc("day", "t")).alias("day"))
        .agg(
            F.max("run").alias("peak"),
            F.sum(F.when(F.col("d") == 1, 1).otherwise(0)).alias("n_opens"),
        )
    )
    want = {
        r["day"]: (r["peak"], r["n_opens"]) for r in naive.collect()
    }
    assert got == want


def test_kl_zero_when_distributions_match(spark, sf_smoke):
    """KL(P_day || Q_global) == 0 exactly when every day has the global
    mix; and on real data every divergence is >= 0 (Gibbs)."""
    # synthetic: two days, identical type mix each day
    rows = []
    eid = 0
    for day in (1, 2):
        for typ, n in (("a", 2), ("b", 6)):
            for _ in range(n):
                eid += 1
                rows.append(
                    (1, dt.datetime(2024, 3, day, 12, 0, eid % 60), typ, eid)
                )
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, event_id long"
    )
    daily = df.groupBy(
        F.to_date(F.date_trunc("day", "ts")).alias("day"), "event_type"
    ).agg(F.count("*").alias("n_td"))
    # p == q per construction -> every term ln(1)*p == 0
    per_day = daily.groupBy("day").agg(F.sum("n_td").alias("n_d"))
    glob = df.groupBy("event_type").agg(F.count("*").alias("n_t"))
    tot = df.agg(F.count("*").alias("n"))
    p = F.col("n_td").cast("double") / F.col("n_d")
    q = F.col("n_t").cast("double") / F.col("n")
    terms = (
        daily.join(per_day, "day")
        .join(F.broadcast(glob), "event_type")
        .crossJoin(F.broadcast(tot))
        .select((p * F.log(p / q)).alias("term"))
    )
    assert all(r["term"] == 0.0 for r in terms.collect())

    from hypertension_dashboard_pipeline_spark.queries_analytics import dq_drift_kl

    for r in dq_drift_kl(spark, sf_smoke).collect():
        assert r["kl_vs_global"] >= 0.0 or math.isclose(
            r["kl_vs_global"], 0.0, abs_tol=1e-6
        )
