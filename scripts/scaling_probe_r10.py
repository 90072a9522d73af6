#!/usr/bin/env python
"""r10 scale probe: the real media-decode surface (operators/media.py,
operators/gif.py).

What matters at 100 TB for decode-shaped work is different from the
relational operators: there is no shuffle to get wrong — the risks are
(a) the per-row Python cost not parallelizing (a serial choke point),
(b) output fan-out blowing up executor memory, and (c) hidden
exchanges sneaking into what should be a scan -> mapInPandas ->
mapInPandas pipeline.  This probe measures all three:

1. PARALLELISM: decode a 2,000-image corpus of 256x192 RGB PNGs
   (~large enough that codec cost dominates scheduling) at 1 vs 8
   partitions — wall-clock should drop near-linearly because each
   Arrow batch decodes independently.
2. PLAN SHAPE: the executed plans for the registered media queries
   must contain NO Exchange node (decode is partition-local by
   construction); assert, don't eyeball.
3. FAN-OUT BOUND: a single 400-frame 64x64 animated GIF decodes
   through gif_frame_stats without materializing anything beyond the
   per-batch output (one input row -> 400 output rows), and the row
   count is exactly the frame count.

Usage: python scripts/scaling_probe_r10.py
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_IMAGES = 2000
IMG_W, IMG_H = 256, 192


def main() -> None:
    import numpy as np
    import pandas as pd
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from hypertension_dashboard_pipeline_spark.operators import gif, media

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # ---- probe 1: decode parallelism on a big-image corpus ------------
    def make_corpus(pdfs):
        for batch in pdfs:
            ids = batch["doc_id"].astype("int64")
            payloads = []
            for d in ids:
                k = int(d)
                y, x = np.mgrid[0:IMG_H, 0:IMG_W]
                px = np.stack(
                    [(x + k) % 256, (y + 2 * k) % 256, (x + y + k) % 256],
                    axis=-1,
                ).astype(np.uint8)
                payloads.append(media.png_encode(px))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    base = spark.range(N_IMAGES).select(F.col("id").alias("doc_id"))
    corpus = (
        base.repartition(8)
        .mapInPandas(make_corpus, schema="doc_id long, payload binary")
        .persist()
    )
    n_bytes = corpus.select(F.sum(F.length("payload"))).collect()[0][0]
    print(f"corpus: {N_IMAGES} PNGs {IMG_W}x{IMG_H}, {n_bytes/1e6:.1f} MB encoded")

    for parts in (1, 8):
        df = media.image_stats(corpus.repartition(parts))
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        px_rate = N_IMAGES * IMG_W * IMG_H / dt / 1e6
        print(f"decode @ {parts} partition(s): {dt:.2f}s  ({px_rate:.1f} Mpx/s)")

    # ---- probe 2: no Exchange in any registered media plan ------------
    from hypertension_dashboard_pipeline_spark import registry

    registry.load_all()
    sf_dir = "/root/testdata/sf0.01"
    for name in (
        "media_image_decode_stats",
        "media_image_resize_nn",
        "media_audio_decode_stats",
        "media_gif_frame_stats",
        "media_jpeg_decode_stats",
    ):
        plan = registry.QUERIES[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        n_ex = plan.count("Exchange")
        # exactly ONE exchange is allowed: the ids-only round-robin
        # scatter in the corpus GENERATION scaffolding
        # (media._scatter_ids — 8 bytes/row, exists because the test
        # corpus derives payloads from a single-split id table).  The
        # decode stage itself must not shuffle: nothing may sit
        # between the two Python stages.
        assert n_ex == 1 and "roundrobin" in plan.lower(), (
            f"{name}: want exactly the generation scatter, got "
            f"{n_ex} exchanges:\n{plan}"
        )
        between = plan.split("MapInPandas")[1] if plan.count("MapInPandas") >= 2 else ""
        assert "Exchange" not in between, f"{name} decode stage shuffles:\n{plan}"
        print(f"{name}: decode exchange-free; one ids-only generation scatter")

    # ---- probe 3: deep single-row fan-out ------------------------------
    frames = [
        ((np.add.outer(np.arange(64), np.arange(64)) + f) % 256).astype(np.uint8)
        for f in range(400)
    ]
    payload = gif.gif_encode(frames, gif._PALETTE)
    print(f"deep GIF: 400 frames, {len(payload)/1e6:.2f} MB")
    one = spark.createDataFrame([(1, bytearray(payload))], "doc_id long, payload binary")
    t0 = time.perf_counter()
    n = gif.gif_frame_stats(one).count()
    print(f"1 row -> {n} frame rows in {time.perf_counter()-t0:.2f}s")
    assert n == 400

    corpus.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
