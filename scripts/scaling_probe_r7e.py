#!/usr/bin/env python
"""Scaling evidence for the round-7 wave-13/14 operators: registered-
query wall time at sf0.01 vs sf0.1 (10x rows), best of 2, warm page
cache — appended to SCALING.md by hand from this script's output.

Usage: python scripts/scaling_probe_r7e.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hypertension_dashboard_pipeline_spark import registry
from hypertension_dashboard_pipeline_spark.session import build_session

registry.load_all()

QUERIES = [
    "curation_dsir_sample",
    "s13_compaction_roundtrip",
    "emb_norm_profile",
    "sim_range_search",
    "events_value_gini",
]


def main() -> None:
    spark = build_session(app_name="scaling-probe-r7e")
    for name in QUERIES:
        row = [name]
        for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
            best = None
            n = 0
            for _ in range(2):
                t0 = time.time()
                n = len(registry.QUERIES[name](spark, sf).collect())
                dt = time.time() - t0
                best = dt if best is None or dt < best else best
            row.append(f"{best:.2f}s(n={n})")
        print(" | ".join(row), flush=True)


if __name__ == "__main__":
    main()
