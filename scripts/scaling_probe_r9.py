#!/usr/bin/env python
"""r9 scale probes: (1) the tail-fold state bound under pathological
per-key history skew, (2) the unbounded-broadcast fixes' plan shapes.

Probe 1 — tail-fold collect bound (the r8 verdict's perf-weak #1).
Builds a synthetic events table with ONE hot key carrying N events
(plus background keys) and runs ewma_last / holt_linear_last both
ways:

* BOUNDED (shipped): _tail_truncated pre-truncation — per-key
  aggregation-buffer state ≤ tail elements at any history length;
* UNBOUNDED (the r8 form, reconstructed inline): collect_list the
  full history into one buffer row, slice the tail.

At probe scale both finish — the point is the TREND: the unbounded
form's buffer grows linearly with the hot key's history while the
bounded form's stays constant, which is the difference between a
working plan and an executor OOM at 100× skew.  The probe prints
wall times AND the per-key collected-array sizes (the content
record), so the SCALING.md row is attributable.

Probe 2 — broadcast direction: asserts the fixed
rec_copurchase_lift / graph_neighbor_jaccard plans no longer carry a
BroadcastExchange fed by the per-part count relation (the unbounded
dimension), by checking the executed plans at sf0.01.

Usage: python scripts/scaling_probe_r9.py
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

HOT = 2_000_000       # events on the single hot key
BG_KEYS = 1_000       # background keys
BG_EACH = 100


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )

    from hypertension_dashboard_pipeline_spark.operators.timeseries import (
        ewma_last,
        holt_linear_last,
    )

    # -- skewed corpus: one key with HOT events, 1k keys with 100 each
    hot = spark.range(HOT).select(
        F.lit(0).alias("user_id"),
        F.col("id").alias("ts"),
        F.col("id").cast("double").alias("event_id"),
        (F.col("id") % 97).cast("double").alias("value"),
    )
    bg = spark.range(BG_KEYS * BG_EACH).select(
        (F.col("id") % BG_KEYS + 1).alias("user_id"),
        (F.col("id") / BG_KEYS).cast("long").alias("ts"),
        F.col("id").cast("double").alias("event_id"),
        (F.col("id") % 31).cast("double").alias("value"),
    )
    df = hot.unionByName(bg).repartition(16).persist()
    n = df.count()
    print(f"corpus: {n} rows, hot key history = {HOT}", flush=True)

    def unbounded_ewma(d, tail=8, decay=0.9):
        """The r8 form: full-history collect, slice last `tail`."""
        d = d.filter(F.col("value").isNotNull())
        seq = d.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sort_array(
                F.collect_list(F.struct("ts", "event_id", "value"))
            ).alias("seq"),
        )
        l8 = F.slice(
            F.col("seq"),
            F.greatest(F.size("seq") - (tail - 1), F.lit(1)),
            F.lit(tail),
        )
        vals = F.transform(l8, lambda x: x["value"])
        length = F.size(vals)
        num = F.aggregate(
            F.slice(vals, 2, F.greatest(length - 1, F.lit(1))),
            F.element_at(vals, 1).cast("double"),
            lambda acc, x: acc * F.lit(decay) + x,
        )
        den = F.aggregate(
            F.slice(vals, 2, F.greatest(length - 1, F.lit(1))),
            F.lit(1.0),
            lambda acc, x: acc * F.lit(decay) + F.lit(1.0),
        )
        return seq.select("user_id", "n_events", (num / den).alias("ewma_last"))

    def timed(label, mk):
        best = None
        rows = None
        for _ in range(2):
            t0 = time.monotonic()
            rows = mk().collect()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        print(f"{label}: {best:.2f}s ({len(rows)} keys)", flush=True)
        return {r["user_id"]: r for r in rows}

    b = timed("ewma bounded   (shipped)", lambda: ewma_last(
        df, "user_id", ["ts", "event_id"], "value"))
    u = timed("ewma unbounded (r8 form)", lambda: unbounded_ewma(df))
    assert set(b) == set(u)
    diff = [k for k in b if (b[k]["n_events"], b[k]["ewma_last"])
            != (u[k]["n_events"], u[k]["ewma_last"])]
    print(f"ewma value parity bounded==unbounded: "
          f"{'EXACT' if not diff else f'DIVERGED {diff[:5]}'}", flush=True)

    timed("holt bounded   (shipped)", lambda: holt_linear_last(
        df, "user_id", ["ts", "event_id"], "value"))

    # content record: the collected-array bound
    from hypertension_dashboard_pipeline_spark.operators.timeseries import (
        _tail_truncated,
    )
    _, trunc = _tail_truncated(df, "user_id", ["ts", "event_id"], "value", 8)
    mx = trunc.groupBy("user_id").count().agg(F.max("count")).first()[0]
    print(f"bounded plan max collected rows/key: {mx} (tail=8); "
          f"unbounded form collects {HOT} for the hot key", flush=True)
    df.unpersist()

    # -- probe 2: broadcast direction on the fixed queries
    from hypertension_dashboard_pipeline_spark import registry
    registry.load_all()
    sf = "/root/testdata/sf0.01"
    for name in ("rec_copurchase_lift", "graph_neighbor_jaccard"):
        out = registry.QUERIES[name](spark, sf)
        out.collect()
        plan = out._jdf.queryExecution().executedPlan().toString()
        # the per-part count relation aggregates lineitem by l_partkey;
        # it must never sit under a BroadcastExchange
        bad = False
        for seg in plan.split("BroadcastExchange")[1:]:
            head = seg[:4000]
            if "l_partkey], functions=[count" in head.replace("ANSI ", ""):
                bad = True
        print(f"{name}: per-part counts under BroadcastExchange? "
              f"{'YES — REGRESSION' if bad else 'no (bounded sides only)'}",
              flush=True)

    # -- probe 3: content records for the superlinear-capable r9
    # debuts (the events_type_pmi treatment: counts beside times)
    for sfd in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        li = spark.read.parquet(f"{sfd}/lineitem.parquet")
        po = li.select("l_orderkey", "l_partkey").distinct()
        pairs = (
            po.alias("a")
            .join(po.alias("b"),
                  (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                  & (F.col("a.l_partkey") < F.col("b.l_partkey")))
            .groupBy(F.col("a.l_partkey"), F.col("b.l_partkey"))
            .count()
        )
        n_pairs = pairs.count()
        ev = spark.read.parquet(f"{sfd}/events.parquet")
        t0 = time.monotonic()
        aa_rows = len(registry.QUERIES["graph_adamic_adar"](spark, sfd).collect())
        t_aa = time.monotonic() - t0
        t0 = time.monotonic()
        ltv = registry.QUERIES["events_cohort_ltv"](spark, sfd).collect()
        t_ltv = time.monotonic() - t0
        print(f"{sfd}: adamic_adar {t_aa:.2f}s/{aa_rows} rows over "
              f"{n_pairs} distinct pairs; cohort_ltv {t_ltv:.2f}s, "
              f"surface {len(ltv)} (cohort, week) rows "
              f"(events={ev.count()})", flush=True)


if __name__ == "__main__":
    main()
