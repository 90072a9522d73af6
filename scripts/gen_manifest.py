#!/usr/bin/env python3
"""Snapshot query fingerprints into tests/query_manifest.json.

Run this ONLY at a round boundary, against the tree the external driver
actually verified (see hypertension_dashboard_pipeline_spark/manifest.py).  To snapshot a
historical tree:

    git archive <verified-sha> | tar -x -C /tmp/verified_tree
    cp hypertension_dashboard_pipeline_spark/manifest.py /tmp/verified_tree/hypertension_dashboard_pipeline_spark/
    PYTHONPATH=/tmp/verified_tree python scripts/gen_manifest.py \
        --out tests/query_manifest.json --verified-at <verified-sha>
"""

from __future__ import annotations

import argparse
import json
import pathlib


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="tests/query_manifest.json")
    ap.add_argument("--verified-at", default="WORKING-TREE")
    args = ap.parse_args()

    from hypertension_dashboard_pipeline_spark.manifest import (
        query_fingerprints,
        query_own_fingerprints,
    )

    doc = {
        "_meta": {
            "verified_at": args.verified_at,
            "note": (
                "Fingerprints of each registered query at the last "
                "externally-verified tree. Queries whose current "
                "fingerprint drifts from this snapshot (or that are "
                "absent from it) MUST be inside the driver window "
                "(registry._FRONT), UNLESS the drift is purely "
                "transitive (shared-callee optimization): 'own' holds "
                "the own-source+oracle fingerprints, and a query whose "
                "own fingerprint is unchanged may drift outside the "
                "window (tests/test_registry_contract.py documents "
                "why this is sound). Regenerate only at a round "
                "boundary from the tree CORRECTNESS_r{N} verified."
            ),
        },
        "queries": query_fingerprints(),
        "own": query_own_fingerprints(),
    }
    out = pathlib.Path(args.out)
    out.write_text(json.dumps(doc, indent=1, sort_keys=True) + "\n")
    print(f"wrote {out} ({len(doc['queries'])} queries)")


if __name__ == "__main__":
    main()
