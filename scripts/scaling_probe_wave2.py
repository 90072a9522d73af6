#!/usr/bin/env python
"""Scaling evidence for the round-4 wave-2 operators (gap-fill LOCF,
PageRank, anomaly z-score, segment boilerplate removal).

Two measurements, appended to SCALING.md:

1. sf0.01 -> sf0.1 (10x rows) wall time for the four registered
   queries — flat-ness shows the constant-shuffle-count shape.
2. Segment boilerplate at 1x/4x/16x distinct-content corpus replicas
   (same replication scheme as scaling_probe.py) — near-linear growth
   shows the document-frequency index never compares documents
   pairwise; plus a template-family corpus (every doc extended with
   the same footer segment) showing the boilerplate set stays small
   and the runtime stays at the clean-corpus level.

Usage: python scripts/scaling_probe_wave2.py  (appends to SCALING.md)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hypertension_dashboard_pipeline_spark import registry
from hypertension_dashboard_pipeline_spark.io import load_table
from hypertension_dashboard_pipeline_spark.operators import segments as sg
from hypertension_dashboard_pipeline_spark.session import build_session, cpu_count

registry.load_all()

QUERIES = [
    "ts_gap_fill_locf",
    "graph_pagerank_transitions",
    "events_anomaly_zscore",
    "text_segment_boilerplate",
]
SHAPES = {
    "ts_gap_fill_locf": "daily agg + scaffold join + ONE LOCF window",
    "graph_pagerank_transitions": "LEAD window + 4x (tiny join+agg) on a "
                                  "5-node graph",
    "events_anomaly_zscore": "daily agg + broadcast stats join",
    "text_segment_boilerplate": "narrow segmentize + ONE df shuffle + "
                                "anti-flag join + reassembly groupBy",
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


def main() -> None:
    spark = build_session(app_name="scaling-wave2",
                          shuffle_partitions=cpu_count())
    lines = ["", "## Round-4 wave-2 operators: 10x data, flat wall time", "",
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
    lines += ["", "### Segment boilerplate removal: corpus growth and the "
              "template pathology", "",
              "Distinct-content corpus replicated kx (same scheme as the "
              "near-dup probe):", "", "| k | docs | wall | output rows |",
              "|---|---|---|---|"]
    for k in (1, 4, 16):
        df = replicate(base, k)
        n_docs = df.count()
        t, n = timed(sg.remove_boilerplate, df)
        lines.append(f"| {k}x | {n_docs:,} | {t:.2f}s | {n:,} |")
        print(lines[-1])

    # template family: ONE document's text replicated corpus-size times
    # (identical docs => identical segments at identical positions, so
    # every family segment reaches df = family size).  NOTE an appended
    # footer would NOT reproduce this: positional chunking only aligns
    # repeated spans that start at the same word offset — the honest
    # limitation vs true line dedup, documented in operators/segments.py.
    n_base = base.count()
    one = base.orderBy("doc_id").limit(1).select("text")
    family = spark.range(n_base).select(
        (F.col("id") + 1_000_000).alias("doc_id")
    ).crossJoin(F.broadcast(one))
    hot = base.unionByName(family)
    t, n = timed(sg.remove_boilerplate, hot)
    lines += [
        "",
        f"Template pathology — {n_base:,} clean docs + a family of "
        f"{n_base:,} IDENTICAL template docs (every family segment at "
        f"df = family size): **{t:.2f}s**, {n:,} rows — the 2x-corpus "
        "time, not a blow-up, because the pipeline only aggregates "
        "(segment -> df count) and anti-flags; there is no pairwise "
        "surface for a hot segment to explode, unlike shingle "
        "self-joins (the n^2/2 hazard the near-dup family needs "
        "max_df to cut).  A corpus of MANY distinct template families "
        "grows the boilerplate SET instead — which is why the "
        "anti-flag join is left to AQE (broadcast when small, shuffle "
        "when not) rather than forced broadcast.",
    ]
    print(lines[-1][:120])

    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "SCALING.md"), "a") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
