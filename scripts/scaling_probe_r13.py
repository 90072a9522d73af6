#!/usr/bin/env python
"""r13 scaling probe: chroma-subsampled JPEG, 16-bit/tRNS PNG, and the
calibration operating-point selection.

Verifies the 100 TB posture of this round's additions empirically at
sf0.1:

1. the subsampled-JPEG decode+stats stage is exchange-free after the
   documented ids-only generation scatter (plan assertion) — the
   MCU-interleaved entropy decode and box-replicate upsample are
   per-payload work, same shape as every other media query;
2. the 16-bit and tRNS PNG stats queries keep that same shape (one
   id-scatter exchange, decode embarrassingly parallel);
3. media_calibration_select adds ZERO corpus passes beyond the two
   calibration curves it reads: its plan contains exactly the
   exchanges of the dHash + aHash sweeps (plan-asserted by count) and
   the selection itself runs on two <=7-row curve relations, emitting
   one operating point per hash;
4. wall-clock for the record: 16-bit Adam7-composed decode and 4:2:0
   JPEG decode at 1/8/32 partitions on stored 100k-payload corpora
   (production shape — parallelism from input splits).
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


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def main() -> None:
    registry.load_all()
    spark = build_session()

    # 1./2. the three new decode+stats queries: one exchange (the
    # documented ids-only generation scatter), nothing else
    for name in ("media_jpeg_subsampled_stats", "media_png_16bit_stats",
                 "media_png_trns_stats", "media_png_graya_stats",
                 "media_png_subbyte_stats", "media_audio_depth_stats",
                 "media_bmp_variant_stats", "media_gif_transparency_stats",
                 "media_audio_stereo_stats"):
        df = registry.QUERIES[name](spark, SF)
        n_ex = _plan(df).count("Exchange")
        assert n_ex == 1, f"{name}: expected only the id scatter, got {n_ex}"
        print(f"{name}: 1 exchange (the id scatter)")

    # 3. calibration select = the two curve subplans + bounded
    # selection; no additional exchange may appear on top of them
    sel = registry.QUERIES["media_calibration_select"](spark, SF)
    d_ex = _plan(
        registry.QUERIES["media_hamming_calibration"](spark, SF)
    ).count("Exchange")
    a_ex = _plan(
        registry.QUERIES["media_ahash_calibration"](spark, SF)
    ).count("Exchange")
    s_ex = _plan(sel).count("Exchange")
    # the +1 is the argmax window's hash-partition of the STACKED CURVE
    # (<= 14 rows — one per swept threshold per hash kind), constant in
    # corpus size; all corpus-sized work lives inside the two sweeps
    assert s_ex <= d_ex + a_ex + 1, (
        f"selection added corpus exchanges: {s_ex} > {d_ex}+{a_ex}+1"
    )
    rows = sel.collect()
    assert len(rows) == 2, f"expected one operating point per hash: {rows}"
    print(f"media_calibration_select: {s_ex} exchanges vs {d_ex}+{a_ex} in "
          "the two curves (the one extra is the bounded-curve argmax "
          "window); operating points:")
    for r in rows:
        print(f"  {r}")

    # 4. decode-stage parallel scaling on STORED payloads
    big = spark.range(100_000).select(F.col("id").alias("doc_id"))
    tmp_root = tempfile.mkdtemp(prefix="r13_scaling_")
    try:
        p16 = tmp_root + "/png16"
        m.synth_16bit_image_corpus(big).write.parquet(p16)
        stored = spark.read.parquet(p16)
        for parts in (1, 8, 32):
            src = stored.repartition(parts)
            t0 = time.perf_counter()
            m.image_position_stats(src).write.format("noop").mode(
                "overwrite"
            ).save()
            print(f"16-bit PNG decode 100k stored payloads on {parts:>2} "
                  f"partitions: {time.perf_counter() - t0:.2f}s")
    finally:
        shutil.rmtree(tmp_root, ignore_errors=True)

    spark.stop()


if __name__ == "__main__":
    main()
