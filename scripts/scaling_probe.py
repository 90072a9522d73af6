#!/usr/bin/env python
"""Empirical scaling probe for the near-dup/text operator family.

Replicates the sf0.1 documents corpus k× with every token prefixed by
a replica tag, so replicas share no shingles with their originals —
the corpus grows in *distinct* content, modeling real corpus growth
rather than duplicate inflation. Each operator then runs at 1x/4x/16x
and the wall-time curve is written to SCALING.md.

Near-linear growth here is the evidence that candidate generation is
blocked (LSH bands / shared-shingle index / chunk equality), not
quadratic — the property that survives the jump to 100 TB.

Usage: python scripts/scaling_probe.py  (writes SCALING.md, ~2 min)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hypertension_dashboard_pipeline_spark.io import load_table
from hypertension_dashboard_pipeline_spark.operators import dedup as dd
from hypertension_dashboard_pipeline_spark.session import build_session, cpu_count

SF_DIR = "/root/testdata/sf0.1"
FACTORS = [1, 4, 16]


def replicate(base, k: int):
    """k distinct-content copies: replica i prefixes every token r<i>_."""
    parts = []
    n = base.count()
    for i in range(k):
        part = base.select(
            (F.col("doc_id") + F.lit(i * n)).alias("doc_id"),
            F.array_join(
                F.transform(
                    F.split(F.trim("text"), r"\s+"),
                    lambda t: F.concat(F.lit(f"r{i}_"), t),
                ),
                " ",
            ).alias("text"),
        )
        parts.append(part)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


OPS = {
    "dedup_ngram_jaccard": lambda df: dd.shingle_pairs_jaccard(df, threshold=0.1),
    "dedup_minhash_lsh": lambda df: dd.minhash_lsh_pairs(df, n_hashes=16, bands=4),
    "dedup_simhash_pairs": lambda df: dd.simhash_pairs(df),
    "dedup_exact_groups": lambda df: dd.exact_dedup_groups(df),
}


def main() -> None:
    spark = build_session(app_name="scaling_probe",
                          shuffle_partitions=cpu_count())
    spark.sparkContext.setLogLevel("ERROR")
    base = load_table(spark, SF_DIR, "documents").select("doc_id", "text")

    results: dict[str, dict[int, tuple[float, int]]] = {n: {} for n in OPS}
    workdir = tempfile.mkdtemp(prefix="spark_graft_scaling_")
    try:
        for k in FACTORS:
            path = f"{workdir}/docs_{k}x.parquet"
            replicate(base, k).write.mode("overwrite").parquet(path)
            docs = spark.read.parquet(path)
            for name, make in OPS.items():
                make(docs).write.format("noop").mode("overwrite").save()  # warm
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                n_out = make(docs).count()
                elapsed = time.perf_counter() - t0
                spark.catalog.clearCache()
                results[name][k] = (elapsed, n_out)
                print(f"{name} @ {k}x: {elapsed:.2f}s, {n_out} rows")
    finally:
        shutil.rmtree(workdir, ignore_errors=True)

    lines = [
        "# SCALING — measured near-dup operator scaling",
        "",
        "`scripts/scaling_probe.py` on the sf0.1 documents corpus",
        f"(5,000 docs) replicated with distinct content to {FACTORS} x,",
        f"local[{cpu_count()}]. Output rows count emitted pairs/groups.",
        "",
        "| operator | " + " | ".join(f"{k}x time | {k}x rows" for k in FACTORS) + " | time ratio 16x/1x |",
        "|---|" + "---|" * (2 * len(FACTORS) + 1),
    ]
    for name, per_k in results.items():
        ratio = per_k[FACTORS[-1]][0] / per_k[FACTORS[0]][0]
        cells = " | ".join(
            f"{per_k[k][0]:.2f}s | {per_k[k][1]:,}" for k in FACTORS
        )
        lines.append(f"| {name} | {cells} | {ratio:.1f}x |")
    lines += [
        "",
        "A 16x corpus in ≲16x time (vs 256x for unblocked pairwise",
        "comparison) demonstrates candidate generation stays near-linear:",
        "LSH banding, shared-shingle inverted indexing, and SimHash chunk",
        "blocking bound the quadratic surface to within-bucket pairs.",
    ]
    with open("SCALING.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote SCALING.md")
    spark.stop()


if __name__ == "__main__":
    main()
