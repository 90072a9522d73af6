#!/usr/bin/env python
"""Capture .explain('formatted') for the headline queries (r14 round).

Usage: python scripts/capture_plans_r14.py [before|after] [query ...]

Writes plans/r14/<query>_<tag>.txt for each headline query (or the
subset given).  Plan capture only constructs the DataFrame — iterative
queries run their internal bounded jobs, but nothing is timed here;
timings come from bench.py / scripts/bench_ab_r14.py.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hypertension_dashboard_pipeline_spark import registry
from hypertension_dashboard_pipeline_spark.session import build_session, cpu_count

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEADLINE = [
    "flagship_cohort_pipeline",
    "a3_same_day_avg",
    "a9_dedup_deterministic",
    "j1_left_enrich",
    "w1_latest_per_key",
    "u1_evidence_key_union",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_components",
    "sim_cosine_topk",
    "sim_cosine_near_dup",
    "text_quality_score",
    "curation_pipeline",
    "streaming_dedup",
    "graph_pagerank_transitions",
    "text_segment_boilerplate",
    "j16_local_supplier_volume",
    "emb_pq_codes",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or HEADLINE
    registry.load_all()
    spark = build_session(app_name="plans_r14", shuffle_partitions=cpu_count())
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r14")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        spark.sparkContext.setJobDescription(f"plan:{name}")
        df = registry.QUERIES[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        ex = plan.count("Exchange")
        print(f"{name}: {ex} Exchange mentions -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
