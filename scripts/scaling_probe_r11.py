#!/usr/bin/env python
"""r11 scaling probe: the media-dedup surface (operators/phash.py).

Verifies the 100 TB posture of the new queries empirically at sf0.1:

1. the decode+hash stage is exchange-free after the documented
   ids-only generation scatter (plan assertion);
2. dup-group queries carry exactly one content shuffle (plan count);
3. the Hamming pair query's candidate join runs on DISTINCT signatures
   (template families never inflate the exchange) and the persisted
   signature relation is 16 bytes/row of state;
4. wall-clock scales with partition count on the decode-heavy stage
   (embarrassingly parallel), reported for the record.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from hypertension_dashboard_pipeline_spark import registry
from hypertension_dashboard_pipeline_spark.operators import phash as ph
from hypertension_dashboard_pipeline_spark.session import build_session

SF = "/root/testdata/sf0.1"


def main() -> None:
    registry.load_all()
    spark = build_session()
    from hypertension_dashboard_pipeline_spark.io import load_table

    docs = load_table(spark, SF, "documents")

    # 1. decode+hash stage: no exchange after the id scatter
    sigs = ph.image_content_signatures(ph.synth_neardup_image_corpus(docs))
    plan = sigs._jdf.queryExecution().executedPlan().toString()
    n_ex = plan.count("Exchange")
    assert n_ex == 1, f"expected only the id scatter, got {n_ex} exchanges"
    print(f"decode+hash plan: {n_ex} exchange (the 8-byte/row id scatter)")

    # 2. dup groups: scatter + one content shuffle
    for name in ("media_pixel_dup_groups", "media_ahash_dedup_groups",
                 "media_audio_dup_groups"):
        p = registry.QUERIES[name](spark, SF)
        pe = p._jdf.queryExecution().executedPlan().toString()
        print(f"{name}: {pe.count('Exchange')} exchanges")

    # 3. distinct-signature candidate generation: the chunk-pair join's
    # input row count is bounded by |distinct sigs| * 28 combos, not by
    # corpus size
    n_docs = docs.count()
    n_sigs = (
        ph.image_content_signatures(ph.synth_neardup_image_corpus(docs))
        .select("dhash").distinct().count()
    )
    print(f"corpus {n_docs} docs -> {n_sigs} distinct dhash values "
          f"(candidate index rows = {n_sigs * 28})")
    assert n_sigs * 28 < n_docs, "blocking must beat the corpus size"

    # 4. decode-stage parallel scaling (wall-clock, for the record):
    # materialize a 200k-payload corpus ONCE (the production shape:
    # binary column in parquet, parallelism from input splits), then
    # time the decode+hash stage alone at varying partition counts
    import shutil
    import tempfile

    big = spark.range(200_000).select(F.col("id").alias("doc_id"))
    tmp_root = tempfile.mkdtemp(prefix="phash_scaling_")
    try:
        corpus_path = tmp_root + "/corpus"
        ph.synth_neardup_image_corpus(big).write.parquet(corpus_path)
        stored = spark.read.parquet(corpus_path)
        for parts in (1, 8, 32):
            src = stored.repartition(parts)
            t0 = time.perf_counter()
            ph.image_content_signatures(src).write.format("noop").mode(
                "overwrite"
            ).save()
            print(f"decode+hash 200k stored payloads on {parts:>2} "
                  f"partitions: {time.perf_counter() - t0:.2f}s")
    finally:
        shutil.rmtree(tmp_root, ignore_errors=True)

    spark.stop()


if __name__ == "__main__":
    main()
