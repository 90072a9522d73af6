#!/usr/bin/env python
"""Determinism sweep: every registered query executed TWICE with
different shuffle-partition counts (7 vs 23); canonical sorted
outputs must be identical.

This mechanically verifies the package-wide determinism discipline —
explicit total orders on every top-k/limit/dedup, order-free or
exactly-summed aggregates, content-hash (not RNG) sampling — instead
of trusting docstrings: a collect_list without sort_array, a LIMIT
without ORDER BY, a float SUM compared unrounded, or a first()-based
probe would all surface here as a NONDET row, because changing the
partition count reorders every shuffle's consumption order.

Complementary to scripts/crash_sweep.py (hostile-data parity): this
one holds data fixed and shakes the EXECUTION instead.

r8 baseline: 271/271 OK, zero NONDET rows.

Usage: python scripts/determinism_sweep.py   (~12 min on local[24])
Exit code = number of nondeterministic/erroring queries.
"""

from __future__ import annotations

import datetime as dtt
import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = "/root/testdata/sf0.001"


def _norm(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    if isinstance(v, (dtt.datetime, dtt.date)):
        return v.isoformat()
    return v


def main() -> int:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[24]")
        .config("spark.sql.shuffle.partitions", "7")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    from hypertension_dashboard_pipeline_spark import registry

    registry.load_all()

    def canon(df):
        cols = df.columns
        idx = sorted(range(len(cols)), key=lambda i: cols[i])

        def key(row):
            return tuple((v is None, str(v)) for v in row)

        return sorted(
            (tuple(_norm(r[i]) for i in idx) for r in
             (tuple(x) for x in df.collect())),
            key=key,
        )

    bad = 0
    for name, fn in registry.QUERIES.items():
        try:
            spark.conf.set("spark.sql.shuffle.partitions", "7")
            a = canon(fn(spark, SF))
            spark.conf.set("spark.sql.shuffle.partitions", "23")
            b = canon(fn(spark, SF))
            if a != b:
                bad += 1
                diff = [(x, y) for x, y in zip(a, b) if x != y][:2]
                print(f"NONDET {name} rows={len(a)}/{len(b)} first={diff}",
                      flush=True)
            else:
                print(f"OK {name} {len(a)}", flush=True)
        except Exception as e:  # noqa: BLE001 — the sweep's whole point
            bad += 1
            msg = (str(e).splitlines() or [type(e).__name__])[0][:200]
            print(f"ERROR {name}: {msg}", flush=True)
    print(f"DONE nondet={bad}", flush=True)
    return bad


if __name__ == "__main__":
    raise SystemExit(main())
