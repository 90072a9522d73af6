#!/usr/bin/env python
"""Package-wide crash sweep: EVERY registered query against EACH
hostile corpus (the adversarial fixtures from tests/test_adversarial_*
— midpoint floats, >2^53 sums, duplicate-instant bursts, zero/1e30/
denormal vectors, empty/whitespace/sub-shingle documents).

The curated adversarial parity sweeps check full value parity for the
queries LISTED in each test module; this sweep is the wider, cheaper
net — execution-only (no oracle compare) across the whole 270-query
registry, hunting runtime crashes the generated corpus never
provokes: ANSI DIVIDE_BY_ZERO, CAST_OVERFLOW, array-index errors.

Finds to date:
* r7/r8: zero-norm cosine DIVIDE_BY_ZERO in the five pinned top-k
  queries (fixed via cosine_guarded, the when-guard shape).
* r8: CAST_OVERFLOW in exact_vector_dup_groups' quantized digest on
  1e30 components (fixed via the fixed-point range contract).

Usage: python scripts/crash_sweep.py   (~20 min on local[24])
Exit code = number of crashing (corpus, query) pairs.
"""

from __future__ import annotations

import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

SF_SMOKE = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def main() -> int:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[24]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    from hypertension_dashboard_pipeline_spark import registry

    registry.load_all()

    from test_adversarial_documents import _build_adv_docs
    from test_adversarial_embeddings import _build_adv_embeddings
    from test_adversarial_events import _build_adv_events
    from test_adversarial_tpch import _build_adv_lineitem_orders

    work = tempfile.mkdtemp(prefix="crash_sweep_")

    def corpus(replaced: dict) -> str:
        root = tempfile.mkdtemp(dir=work)
        for t in TABLES:
            if t not in replaced:
                os.symlink(f"{SF_SMOKE}/{t}.parquet", f"{root}/{t}.parquet")
        for t, builder in replaced.items():
            builder(f"{root}/{t}.parquet")
        return root

    corpora = {
        "adv_events": corpus({"events": _build_adv_events}),
        "adv_docs": corpus({"documents": _build_adv_docs}),
        "adv_emb": corpus({"embeddings": _build_adv_embeddings}),
    }
    tpch_root = tempfile.mkdtemp(dir=work)
    for t in TABLES:
        if t not in ("lineitem", "orders"):
            os.symlink(f"{SF_SMOKE}/{t}.parquet", f"{tpch_root}/{t}.parquet")
    _build_adv_lineitem_orders(
        f"{tpch_root}/lineitem.parquet", f"{tpch_root}/orders.parquet"
    )
    corpora["adv_tpch"] = tpch_root

    failures = 0
    for cname, cdir in corpora.items():
        for name, fn in registry.QUERIES.items():
            try:
                n = fn(spark, cdir).count()
                print(f"OK {cname} {name} {n}", flush=True)
            except Exception as e:  # noqa: BLE001 — the sweep's whole point
                failures += 1
                msg = (str(e).splitlines() or [type(e).__name__])[0][:300]
                print(f"CRASH {cname} {name}: {msg}", flush=True)
    print(f"DONE failures={failures}", flush=True)
    return failures


if __name__ == "__main__":
    raise SystemExit(main())
