#!/usr/bin/env python
"""Scaling evidence for the round-6 late-wave operators (prefix-filter
exact Jaccard, span-level dedup, IVF-PQ, triangle counting, CMS,
Gopher rules, JL projection).

Three measurements, appended to SCALING.md:

1. sf0.01 -> sf0.1 (10x rows) wall time for the registered queries.
2. Prefix-filter pairs at 1x/4x/16x distinct-content replicas, PLUS
   the hot-shingle pathology (one sentence appended to every doc) —
   the operator's claim is that prefix filtering absorbs boilerplate
   WITHOUT a max_df knob because a corpus-frequent shingle sorts to
   the end of the global order and never enters prefixes; this probe
   measures that claim instead of asserting it.
3. duplicate_spans under the same pathology — the hot span lands on
   one grouping key, absorbed by map-side partial aggregation.

Usage: python scripts/scaling_probe_r6b.py  (appends to SCALING.md)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hypertension_dashboard_pipeline_spark import registry
from hypertension_dashboard_pipeline_spark.io import load_table
from hypertension_dashboard_pipeline_spark.operators import dedup as dd
from hypertension_dashboard_pipeline_spark.session import build_session, cpu_count

registry.load_all()

QUERIES = [
    "dedup_prefix_filter_pairs",
    "dedup_duplicate_spans",
    "sim_ivf_pq_topk",
    "graph_triangle_count",
    "a31_cms_point_estimates",
    "text_gopher_rules",
    "emb_random_projection",
]
SHAPES = {
    "dedup_prefix_filter_pairs": "shingle df agg + ONE ranked-prefix "
                                 "window + prefix-only self-join",
    "dedup_duplicate_spans": "narrow span explode + ONE digest groupBy",
    "sim_ivf_pq_topk": "centroid agg + broadcast probe prune + narrow "
                       "ADC + TakeOrdered",
    "graph_triangle_count": "pair agg + degree-oriented wedge join + "
                            "semi-join close",
    "a31_cms_point_estimates": "depth-explode + sketch-size hash agg",
    "text_gopher_rules": "pure narrow map, no shuffle",
    "emb_random_projection": "constant-folded matrix, narrow map",
}


def timed(fn, *a):
    t0 = time.perf_counter()
    out = fn(*a)
    n = out.count()
    return time.perf_counter() - t0, n


def replicate(base, k: int):
    """k distinct-content copies (token prefix r<i>_), as in
    scaling_probe.py — corpus grows in distinct content."""
    n = base.count()
    parts = [
        base.select(
            (F.col("doc_id") + F.lit(i * n)).alias("doc_id"),
            F.array_join(
                F.transform(
                    F.split(F.trim("text"), r"\s+"),
                    (lambda tag: lambda t: F.concat(F.lit(tag), t))(f"r{i}_"),
                ),
                " ",
            ).alias("text"),
        )
        for i in range(k)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


HOT = ("all rights reserved contact us for more information about this "
       "site and its terms")


def main() -> None:
    spark = build_session(app_name="scaling-r6b",
                          shuffle_partitions=cpu_count())
    lines = ["", "## Round-6 late-wave operators: 10x data", "",
             "Registered query at sf0.01 vs sf0.1 (10x rows), local[32],",
             "warm page cache, best of 2:", "",
             "| query | sf0.01 | sf0.1 (10x) | shape |", "|---|---|---|---|"]
    for name in QUERIES:
        times = {}
        for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
            best = min(
                timed(registry.QUERIES[name], spark, sf)[0] for _ in range(2)
            )
            times[sf] = best
        lines.append(
            f"| {name} | {times['/root/testdata/sf0.01']:.2f}s "
            f"| {times['/root/testdata/sf0.1']:.2f}s | {SHAPES[name]} |"
        )
        print(lines[-1])

    base = load_table(spark, "/root/testdata/sf0.1", "documents").select(
        "doc_id", "text"
    )
    lines += ["", "### Prefix-filter exact Jaccard: corpus growth and the "
              "hot-shingle pathology (no knob)", "",
              "Distinct-content corpus replicated kx:", "",
              "| k | docs | wall | output pairs |", "|---|---|---|---|"]
    for k in (1, 4, 16):
        df = replicate(base, k)
        n_docs = df.count()
        t, n = timed(dd.prefix_filter_pairs, df)
        lines.append(f"| {k}x | {n_docs:,} | {t:.2f}s | {n:,} |")
        print(lines[-1])

    hot = base.select(
        "doc_id", F.concat_ws(" ", F.col("text"), F.lit(HOT)).alias("text")
    )
    t_hot, n_hot = timed(dd.prefix_filter_pairs, hot)
    t_clean, n_clean = timed(dd.prefix_filter_pairs, base)
    lines += [
        "",
        f"Hot-shingle pathology — the same 14-word sentence appended to "
        f"every one of {base.count():,} docs (each of its shingles at "
        f"df = corpus size): clean corpus **{t_clean:.2f}s** "
        f"({n_clean:,} pairs) vs boilerplated **{t_hot:.2f}s** "
        f"({n_hot:,} pairs).  No max_df knob exists here: a "
        "corpus-frequent shingle sorts to the END of the global "
        "(df, shingle) order, so it enters a document's PREFIX only "
        "when the document consists almost entirely of frequent "
        "shingles — the boilerplate fans out through rare-shingle "
        "prefix entries exactly as on the clean corpus, and the "
        "result stays EXACT (dedup_ngram_jaccard's max_df cut, by "
        "contrast, redefines the metric to get the same protection).",
    ]
    print(lines[-1][:120])

    t_span_clean, n_span_clean = timed(dd.duplicate_spans, base)
    t_span_hot, n_span_hot = timed(dd.duplicate_spans, hot)
    lines += [
        "",
        f"duplicate_spans under the same pathology: clean "
        f"**{t_span_clean:.2f}s** ({n_span_clean:,} flagged spans) vs "
        f"boilerplated **{t_span_hot:.2f}s** ({n_span_hot:,}) — the "
        "hot footer contributes a handful of grouping keys (its "
        "8-token windows), each absorbed by map-side partial "
        "aggregation: one counter per task, never a shuffled row per "
        "occurrence, and no pairwise surface exists anywhere in the "
        "plan.",
    ]
    print(lines[-1][:120])

    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "SCALING.md"), "a") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
