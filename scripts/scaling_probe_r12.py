#!/usr/bin/env python
"""r12 scaling probe: Adam7 decode, Hamming-threshold calibration, and
weighted RRF.

Verifies the 100 TB posture of this round's additions empirically at
sf0.1:

1. the interlaced decode+stats stage is exchange-free after the
   documented ids-only generation scatter (plan assertion), same shape
   as every other media query;
2. the calibration query folds ALL corpus-sized work into the pair
   histogram + truth aggregates — the threshold sweep itself joins a
   <=7-row broadcast histogram (plan assertion: the inequality join is
   a BroadcastNestedLoopJoin over the bounded side, never a corpus
   shuffle);
3. the weighted-RRF fusion plan is identical in shape to the verified
   unweighted one (constant weights fold into the projection — no new
   exchange, no new window);
4. wall-clock for the record: interlaced decode at 1/8/32 partitions
   on a stored 100k-payload corpus (production shape — parallelism
   from input splits).
"""

from __future__ import annotations

import shutil
import tempfile
import time

from pyspark.sql import functions as F

from hypertension_dashboard_pipeline_spark import registry
from hypertension_dashboard_pipeline_spark.operators import media as m
from hypertension_dashboard_pipeline_spark.session import build_session

SF = "/root/testdata/sf0.1"


def main() -> None:
    registry.load_all()
    spark = build_session()
    from hypertension_dashboard_pipeline_spark.io import load_table

    docs = load_table(spark, SF, "documents")

    # 1. interlaced decode+stats: exchange-free but for the id scatter
    stats = m.image_position_stats(m.synth_interlaced_image_corpus(docs))
    plan = stats._jdf.queryExecution().executedPlan().toString()
    n_ex = plan.count("Exchange")
    assert n_ex == 1, f"expected only the id scatter, got {n_ex} exchanges"
    print(f"interlaced decode plan: {n_ex} exchange (the id scatter)")

    # 2. calibration: the sweep join must be broadcast-nested-loop over
    # the tiny histogram (inequality join on a <=7-row side), and the
    # corpus appears only below the histogram/truth aggregates
    cal = registry.QUERIES["media_hamming_calibration"](spark, SF)
    cplan = cal._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in cplan, "threshold sweep not BNLJ"
    print("calibration sweep: BroadcastNestedLoopJoin over the bounded "
          "histogram (plan-asserted)")
    rows = cal.collect()
    by_t = {r.max_hamming: r for r in rows}
    assert sorted(by_t) == [0, 1, 2, 3, 4, 5, 6]
    # monotone sweep + the blocked candidate set can never exceed truth
    # coverage semantics: n_pairs and n_hit non-decreasing in t
    for t in range(1, 7):
        assert by_t[t].n_pairs >= by_t[t - 1].n_pairs
        assert by_t[t].n_hit >= by_t[t - 1].n_hit
    print("calibration sweep at sf0.1:")
    for t in sorted(by_t):
        r = by_t[t]
        print(f"  t={t}: pairs={r.n_pairs} hit={r.n_hit} "
              f"truth={r.n_truth} P={r.precision} R={r.recall}")

    # 3. weighted vs unweighted RRF: same plan shape (the weights are
    # literals folded into the fused-score projection)
    unw = registry.QUERIES["text_hybrid_rrf"](spark, SF)
    wtd = registry.QUERIES["text_hybrid_weighted_rrf"](spark, SF)

    def shape(df) -> list[str]:
        p = df._jdf.queryExecution().executedPlan().toString()
        return [ln.strip().lstrip("+-*: ").split(" ")[0].split("(")[0]
                for ln in p.splitlines()
                if any(k in ln for k in ("Exchange", "Window", "Join",
                                         "Sort", "Limit"))]

    su, sw = shape(unw), shape(wtd)
    assert su == sw, f"plan shapes diverge:\n{su}\nvs\n{sw}"
    print(f"weighted RRF plan shape identical to unweighted "
          f"({len(su)} exchange/window/join/sort/limit nodes)")

    # 4. decode-stage parallel scaling on STORED interlaced payloads
    big = spark.range(100_000).select(F.col("id").alias("doc_id"))
    tmp_root = tempfile.mkdtemp(prefix="adam7_scaling_")
    try:
        corpus_path = tmp_root + "/corpus"
        m.synth_interlaced_image_corpus(big).write.parquet(corpus_path)
        stored = spark.read.parquet(corpus_path)
        for parts in (1, 8, 32):
            src = stored.repartition(parts)
            t0 = time.perf_counter()
            m.image_position_stats(src).write.format("noop").mode(
                "overwrite"
            ).save()
            print(f"Adam7 decode 100k stored payloads on {parts:>2} "
                  f"partitions: {time.perf_counter() - t0:.2f}s")
    finally:
        shutil.rmtree(tmp_root, ignore_errors=True)

    spark.stop()


if __name__ == "__main__":
    main()
