#!/usr/bin/env python
"""Package-wide adversarial sweep: EVERY registered query against EACH
hostile corpus (the adversarial fixtures from tests/test_adversarial_*
— midpoint floats, >2^53 sums, duplicate-instant bursts, zero/1e30/
denormal vectors, empty/whitespace/sub-shingle documents, hostile
JSON payloads).

Two nets, both wider than the curated per-module adversarial tests:

* every oracle-bearing query runs FULL Spark-vs-DuckDB value parity
  (collect + canonical sorted compare).  Collecting matters: a
  ``.count()``-only sweep lets Catalyst prune the very projection
  column that crashes or diverges (that is exactly how
  f17_json_extract hid from the first crash-only pass);
* oracle-less queries still execute (crash net only).

Finds to date (each fixed + pinned in the curated sweeps):
* r7/r8: zero-norm cosine DIVIDE_BY_ZERO in the five pinned top-k
  queries (fixed via cosine_guarded, the when-guard shape).
* r8: CAST_OVERFLOW in exact_vector_dup_groups' quantized digest on
  1e30 components (fixed via the fixed-point range contract).
* r8: CAST_INVALID_INPUT in f17_json_extract on {"k": 3.7} (fixed
  via the tolerant-DOUBLE try-cast contract).
* r8: NULL-vs-'' chunk text for zero-token docs in
  text_chunk_documents' oracle (COALESCE added).
* r8: order-dependent raw-double sums in a12_salted_skew_agg /
  j9_salted_skew_join diverging from their unsalted oracles on
  fractional quantities (fixed via exact DECIMAL + dec_present).
* r8 empty-table passes: the KLL profile pair's None-subscript on an
  empty events table (fixed: empty-input contract), and
  dedup_lsh_recall's DIVIDE_BY_ZERO on an empty documents table
  (fixed: when-guarded recall).
* r9: the last three queued empty-corpus crashes fixed inside their
  window rotation — text_bm25_topk / text_retrieval_ndcg (the avgdl
  stats splice now bails to the typed empty result when the corpus
  is empty) and curation_attrition_funnel (when-guarded stage
  ratios).  KNOWN_EMPTY_LIMITS is now empty.
* r9 adds the SKEW_EVENTS corpus: one user with a 2,500-event ordered
  history (plus in-history ts-tie bursts and a null run) — full value
  parity for every events oracle at per-key depth, the net that
  guards the WindowGroupLimit tail-truncation and every per-user
  window/fold/session ordering contract under key skew.

The empty-EMBEDDINGS pass also documents a PRECONDITION class rather
than defects: every registered similarity/kmeans wrapper draws its
probe (query vector, centroid init, MMR pool) FROM the corpus, so
"top-k of a query taken from an empty corpus" is semantically
undefined — the operators themselves (brute_force_topk etc.) accept
an explicit query vector and degrade to empty output.  Those wrappers
are listed in PROBE_PRECONDITIONS and reported as KNOWN, not CRASH.

Usage: python scripts/crash_sweep.py   (~35 min on local[24]; the
skew corpus alone costs ~1.5 min, dominated by the cusum twins'
depth-2510 recursive-CTE oracle — expected, not a hang)
Exit code = number of failing (corpus, query) pairs outside the
documented known-limits/preconditions lists.
"""

from __future__ import annotations

import datetime as dtt
import math
import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

SF_SMOKE = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()

# Registered wrappers whose probe (query vector / centroid init / MMR
# pool / hyperplane-width sniff) is drawn FROM the corpus: undefined
# on an empty embeddings table BY CONSTRUCTION (the operators accept
# an explicit probe and degrade to empty output).
PROBE_PRECONDITIONS = {
    "sim_cosine_topk", "sim_ivf_topk", "sim_lsh_bucket_topk",
    "sim_lsh_bucket_topk_indexed", "sim_ivf_recall", "sim_range_search",
    "sim_mips_topk", "sim_quantized_topk", "sim_pq_adc_topk",
    "sim_ivf_pq_topk", "sim_mmr_rerank", "emb_kmeans_lloyd",
    "sim_cluster_purity", "sample_kcenter_diversity",
    "emb_top_component", "emb_remove_top_component",
}

# Empty-corpus-only crashes triaged in r8 were all FIXED in r9 inside
# their window rotation (bm25's typed-empty bail; the attrition
# funnel's when-guarded ratios) — the allowlist is empty; any new
# entry is a regression.
KNOWN_EMPTY_LIMITS: set[tuple[str, str]] = set()


def _norm(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    if isinstance(v, (dtt.datetime, dtt.date)):
        return v.isoformat()
    return v


def main() -> int:
    import duckdb
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

    work = tempfile.mkdtemp(prefix="adv_sweep_")

    def corpus(replaced: dict) -> str:
        root = tempfile.mkdtemp(dir=work)
        for t in TABLES:
            if t not in replaced:
                os.symlink(f"{SF_SMOKE}/{t}.parquet", f"{root}/{t}.parquet")
        for t, builder in replaced.items():
            builder(f"{root}/{t}.parquet")
        return root

    def _build_empty_events(path: str) -> None:
        # a day with no data — the most production-real empty input;
        # found the KLL profiles' None-subscript (r8)
        import pyarrow as pa
        import pyarrow.parquet as pq

        pq.write_table(
            pa.table({
                "event_id": pa.array([], pa.int64()),
                "ts": pa.array([], pa.timestamp("us")),
                "user_id": pa.array([], pa.int64()),
                "event_type": pa.array([], pa.string()),
                "value": pa.array([], pa.float64()),
                "props": pa.array([], pa.string()),
            }),
            path,
        )

    def _build_skew_events(path: str) -> None:
        # r9 net: ONE user carrying a deep ordered history (2,500
        # events: the WindowGroupLimit partial truncation must
        # reconstruct the exact tail across partitions, and every
        # per-user window/fold/session oracle must agree at depth),
        # plus ts-tie bursts inside the hot history, a mid-history
        # null run, and normal background traffic.
        import pyarrow as pa
        import pyarrow.parquet as pq

        t0 = dtt.datetime(2024, 1, 1)
        rows = {k: [] for k in
                ("event_id", "ts", "user_id", "event_type", "value",
                 "props")}
        types = ["view", "click", "purchase", "refund", "login"]
        eid = 0

        def add(ts, uid, typ, val):
            nonlocal eid
            eid += 1
            rows["event_id"].append(eid)
            rows["ts"].append(ts)
            rows["user_id"].append(uid)
            rows["event_type"].append(typ)
            rows["value"].append(val)
            rows["props"].append('{"k": %d}' % (eid % 7))

        for i in range(2500):  # the hot key: minute cadence, value
            # pattern that makes any tail mis-order change the folds
            ts = t0 + dtt.timedelta(minutes=i)
            val = None if 1200 <= i < 1210 else (i % 97) + (i % 8) * 0.125
            add(ts, 7, types[i % 5], val)
        burst = t0 + dtt.timedelta(days=1, hours=1)
        for i in range(10):  # ts ties INSIDE the hot history: only
            add(burst, 7, types[i % 5], 50.0 + i)  # event_id orders them
        for u in range(1, 50):  # background users, 20 events each
            for i in range(20):
                ts = t0 + dtt.timedelta(hours=u, minutes=i * 3)
                add(ts, 100 + u, types[(u + i) % 5], (u * i) % 43 + 0.5)

        pq.write_table(
            pa.table({
                "event_id": pa.array(rows["event_id"], pa.int64()),
                "ts": pa.array(rows["ts"], pa.timestamp("us")),
                "user_id": pa.array(rows["user_id"], pa.int64()),
                "event_type": pa.array(rows["event_type"], pa.string()),
                "value": pa.array(rows["value"], pa.float64()),
                "props": pa.array(rows["props"], pa.string()),
            }),
            path,
        )

    def _build_empty_docs(path: str) -> None:
        import pyarrow as pa
        import pyarrow.parquet as pq

        pq.write_table(
            pa.table({
                "doc_id": pa.array([], pa.int64()),
                "text": pa.array([], pa.string()),
                "lang": pa.array([], pa.string()),
                "source": pa.array([], pa.string()),
                "n_chars": pa.array([], pa.int64()),
            }),
            path,
        )

    def _build_empty_emb(path: str) -> None:
        import pyarrow as pa
        import pyarrow.parquet as pq

        pq.write_table(
            pa.table({
                "vec_id": pa.array([], pa.int64()),
                "embedding": pa.array([], pa.list_(pa.float32())),
                "label": pa.array([], pa.int32()),
            }),
            path,
        )

    corpora = {
        "adv_events": corpus({"events": _build_adv_events}),
        "skew_events": corpus({"events": _build_skew_events}),
        "adv_docs": corpus({"documents": _build_adv_docs}),
        "adv_emb": corpus({"embeddings": _build_adv_embeddings}),
        "empty_events": corpus({"events": _build_empty_events}),
        "empty_docs": corpus({"documents": _build_empty_docs}),
        "empty_emb": corpus({"embeddings": _build_empty_emb}),
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
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{cdir}/{t}.parquet'"
            )
        for name, fn in registry.QUERIES.items():
            if cname == "empty_emb" and name in PROBE_PRECONDITIONS:
                print(f"KNOWN {cname} {name} probe-precondition",
                      flush=True)
                continue
            if (cname, name) in KNOWN_EMPTY_LIMITS:
                print(f"KNOWN {cname} {name} queued-r9-fix", flush=True)
                continue
            try:
                sdf = fn(spark, cdir)
                srows = [tuple(r) for r in sdf.collect()]
                # the empty corpora are CRASH nets only: flag-style
                # oracles (a16/a17-class static within-bounds rows)
                # legitimately disagree with a 0-row engine answer
                if (name not in registry.ORACLES
                        or cname.startswith("empty_")):
                    print(f"OK {cname} {name} rows-only {len(srows)}",
                          flush=True)
                    continue
                res = con.execute(registry.ORACLES[name])
                dcols = [d[0] for d in res.description]
                osd = sorted(range(len(sdf.columns)),
                             key=lambda i: sdf.columns[i])
                odd = sorted(range(len(dcols)), key=lambda i: dcols[i])

                def key(row):
                    return tuple((v is None, str(v)) for v in row)

                cs = sorted(
                    (tuple(_norm(r[i]) for i in osd) for r in srows), key=key
                )
                cd = sorted(
                    (tuple(_norm(r[i]) for i in odd) for r in res.fetchall()),
                    key=key,
                )
                if sorted(sdf.columns) != sorted(dcols) or cs != cd:
                    failures += 1
                    diff = [(a, b) for a, b in zip(cs, cd) if a != b][:2]
                    print(
                        f"MISMATCH {cname} {name} rows={len(cs)}/{len(cd)} "
                        f"first={diff}", flush=True,
                    )
                else:
                    print(f"OK {cname} {name} {len(cs)}", flush=True)
            except Exception as e:  # noqa: BLE001 — the sweep's whole point
                failures += 1
                msg = (str(e).splitlines() or [type(e).__name__])[0][:300]
                print(f"CRASH {cname} {name}: {msg}", flush=True)
        con.close()
    print(f"DONE failures={failures}", flush=True)
    return failures


if __name__ == "__main__":
    raise SystemExit(main())
