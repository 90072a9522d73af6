#!/usr/bin/env python
"""r8 scaling probes (VERDICT r7 items 4 and 7).

1. Hot-shingle pathology RE-RUN against the window-form max_df guard
   (operators/dedup.py _pair_intersections: document frequency as
   count-over-Window.partitionBy(shingle), riding the self-join's own
   exchange).  The standing SCALING.md hot-footer row measured the OLD
   groupBy+semi-join form; the window form puts every row of a
   corpus-frequent shingle into ONE window partition, so the claim
   "equivalent skew, window exec spills" must be measured, not
   inherited.  Runs at sf0.01 AND sf0.1.

2. Content records for the superlinear-scaling debuts rotating in r8:
   - events_type_pmi: the pair relation is sum_u C(|types_u|, 2)
     (wedges over the distinct user-type relation) — record that count
     and the per-user distinct-type distribution at both SFs, so a
     superlinear wall-clock row is attributable to data densification
     vs plan defect.
   - rec_copurchase_lift: pair relation is sum_o C(|basket_o|, 2) —
     record basket-size distribution and pair count at both SFs.

Usage: python scripts/scaling_probe_r8.py   (prints markdown rows)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hypertension_dashboard_pipeline_spark.io import load_table
from hypertension_dashboard_pipeline_spark.operators import dedup as dd
from hypertension_dashboard_pipeline_spark.session import build_session
from scaling_probe import with_hot_shingle

SFS = ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def hot_shingle_window_form(spark) -> list[str]:
    lines = [
        "",
        "### Hot-shingle pathology, window-form max_df guard (r8 re-measure)",
        "",
        "The r7 restructure moved the df cut from groupBy+semi-join to a",
        "count-over-window riding the self-join's exchange; a corpus-wide",
        "shingle now lands in ONE window partition.  Re-measured:",
        "",
    ]
    for sf in SFS:
        base = load_table(spark, sf, "documents").select("doc_id", "text")
        hot = with_hot_shingle(base)
        n_docs = hot.count()
        t0 = time.perf_counter()
        n_pairs = dd.shingle_pairs_jaccard(hot, threshold=0.1).count()
        t = time.perf_counter() - t0
        dd.release_persisted()
        spark.catalog.clearCache()
        # clean-corpus control on the same VM
        t0 = time.perf_counter()
        n_clean = dd.shingle_pairs_jaccard(base, threshold=0.1).count()
        t_clean = time.perf_counter() - t0
        dd.release_persisted()
        spark.catalog.clearCache()
        tag = os.path.basename(sf)
        lines.append(
            f"- {tag} ({n_docs:,} docs, every doc carrying the corpus-wide "
            f"footer): guarded near-dup **{t:.2f}s**, {n_pairs:,} pairs vs "
            f"clean-corpus **{t_clean:.2f}s**, {n_clean:,} pairs — the hot "
            f"shingle (df = {n_docs:,}) is cut in the window stage before "
            f"any pair exists."
        )
        print(lines[-1])
    return lines


def pmi_content_record(spark) -> list[str]:
    lines = [
        "",
        "### events_type_pmi content record (per-user distinct-type fan-out)",
        "",
    ]
    from hypertension_dashboard_pipeline_spark.registry import QUERIES

    for sf in SFS:
        ev = load_table(spark, sf, "events")
        ut = ev.select("user_id", "event_type").distinct()
        prof = (
            ut.groupBy("user_id").agg(F.count(F.lit(1)).alias("t"))
            .agg(
                F.count(F.lit(1)).alias("n_users"),
                F.max("t").alias("max_t"),
                F.avg("t").alias("avg_t"),
                F.sum(F.col("t") * (F.col("t") - 1) / 2).alias("wedges"),
            )
            .first()
        )
        t0 = time.perf_counter()
        n_out = QUERIES["events_type_pmi"](spark, sf).count()
        t = time.perf_counter() - t0
        tag = os.path.basename(sf)
        lines.append(
            f"- {tag}: {prof['n_users']:,} users, distinct types/user "
            f"avg {prof['avg_t']:.2f} / max {prof['max_t']} → pair relation "
            f"{int(prof['wedges']):,} rows (= Σ C(t_u,2), bounded by "
            f"|type vocab|² per user); query **{t:.2f}s**, {n_out} output "
            f"rows (≤ C(|vocab|,2))."
        )
        print(lines[-1])
    return lines


def lift_content_record(spark) -> list[str]:
    lines = [
        "",
        "### rec_copurchase_lift content record (basket-size bound)",
        "",
    ]
    from hypertension_dashboard_pipeline_spark.registry import QUERIES

    for sf in SFS:
        po = load_table(spark, sf, "lineitem").select(
            "l_orderkey", "l_partkey"
        ).distinct()
        prof = (
            po.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("b"))
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.max("b").alias("max_b"),
                F.avg("b").alias("avg_b"),
                F.sum(F.col("b") * (F.col("b") - 1) / 2).alias("pairs"),
            )
            .first()
        )
        t0 = time.perf_counter()
        n_out = QUERIES["rec_copurchase_lift"](spark, sf).count()
        t = time.perf_counter() - t0
        tag = os.path.basename(sf)
        lines.append(
            f"- {tag}: {prof['n_orders']:,} orders, basket size avg "
            f"{prof['avg_b']:.2f} / max {prof['max_b']} → pair relation "
            f"{int(prof['pairs']):,} rows (= Σ C(b_o,2), bounded by basket "
            f"size, never catalog²); query **{t:.2f}s**, {n_out} rows."
        )
        print(lines[-1])
    return lines


def main() -> None:
    from hypertension_dashboard_pipeline_spark.registry import load_all

    load_all()
    spark = build_session("scaling-probe-r8")
    out: list[str] = []
    out += hot_shingle_window_form(spark)
    out += pmi_content_record(spark)
    out += lift_content_record(spark)
    print("\n--- markdown ---")
    print("\n".join(out))


if __name__ == "__main__":
    main()
