#!/usr/bin/env python
"""Scaling evidence for the round-7 wave-9/10 operators (the
remaining TPC-H shapes + diversity/link-prediction/mixture debuts):
registered-query wall time at sf0.01 vs sf0.1 (10x rows), best of 2,
warm page cache — appended to SCALING.md by hand from this script's
output.

Usage: python scripts/scaling_probe_r7c.py
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
    "j24_min_cost_supplier",
    "a33_order_priority_late",
    "a34_forecast_revenue",
    "j25_product_profit",
    "a35_important_parts",
    "j26_late_shipment_priority",
    "a36_promo_revenue_share",
    "j27_top_supplier",
    "a37_supplier_part_breadth",
    "j28_small_qty_revenue",
    "a38_disjunctive_revenue",
    "j29_dominant_suppliers",
    "j30_waiting_suppliers",
    "sample_kcenter_diversity",
    "graph_adamic_adar",
    "events_user_stickiness",
    "curation_mixture_report",
    "sim_mmr_rerank",
    "graph_lpa_communities",
    "events_user_features",
    "events_cohort_ltv",
    "ts_seasonality_profile",
    "w8_percent_rank_cume",
    "a39_grouped_corr",
    "dedup_cluster_size_profile",
]


def main() -> None:
    spark = build_session(app_name="scaling-probe-r7c")
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
