"""Streaming Count-Min sketch maintenance.

The CMS insight carries to Structured Streaming unchanged: the sketch
IS a (row j, bucket) -> counter relation with AT MOST depth x width
keys, so "maintain a frequency sketch over an unbounded stream" is a
plain streaming aggregation whose state is the sketch itself — no
custom stateful operator, no per-key state growth, no watermark
needed (counters only ever add).  That bounded-state property is
exactly why CMS (and not an exact key histogram, whose state grows
with key cardinality) is the 100 TB/unbounded-stream frequency
monitor.

The batch operator (operators/aggregates.count_min_profile) is reused
verbatim on the streaming DataFrame — explode + hash + groupBy runs
incrementally under ``complete`` output mode, and with a bounded
(availableNow) source the final sink equals the batch sketch row for
row, which is what lets the driver's batch SQL oracle value-check a
streaming operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..io import events_stream
from ..operators.aggregates import count_min_estimates, count_min_profile
from .runner import run_bounded


def run_cms_estimates(
    spark: SparkSession,
    sf_dir: str,
    probe_keys: list | None = None,
    depth: int = 4,
    width: int = 64,
    name: str = "cms_sketch_stream",
) -> DataFrame:
    """Maintain the CMS over the bounded event stream, then serve
    point estimates for ``probe_keys`` from the final sketch state
    (the dashboard read path — the fact stream is never rescanned)."""
    ev = events_stream(spark, sf_dir)
    sketch = count_min_profile(ev, "user_id", depth=depth, width=width)
    sink = run_bounded(
        spark,
        sketch,
        name,
        ckpt_prefix="spark_graft_cms_stream_",
        output_mode="complete",
    )
    return count_min_estimates(
        spark,
        sink,
        probe_keys=probe_keys or list(range(1, 11)),
        depth=depth,
        width=width,
    )


def run_hll_distinct(
    spark: SparkSession,
    sf_dir: str,
    tol: float = 0.05,
    name: str = "hll_sketch_stream",
) -> DataFrame:
    """Streaming HLL distinct-count maintenance — the distinct twin of
    :func:`run_cms_estimates`: the stream maintains one mergeable HLL
    sketch per (event_type, day) (a few KB each, fixed state
    regardless of user cardinality); the read path unions registers
    per type and estimates ONCE.  Exact counts (for the
    within-bounds check) come from the batch table — COUNT DISTINCT
    is exactly the aggregation a stream cannot maintain with bounded
    state, which is the point of the sketch."""
    from pyspark.sql import functions as F

    from ..io import load_table

    ev = events_stream(spark, sf_dir)
    per_bucket = ev.groupBy(
        "event_type", F.to_date("ts").alias("__b")
    ).agg(F.hll_sketch_agg("user_id").alias("__sk"))
    sink = run_bounded(
        spark,
        per_bucket,
        name,
        ckpt_prefix="spark_graft_hll_stream_",
        output_mode="complete",
    )
    merged = sink.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("__sk")).alias(
            "approx_distinct"
        )
    )
    exact = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n_exact"))
    )
    return merged.join(exact, "event_type").select(
        "event_type",
        "n_exact",
        (
            F.abs(F.col("approx_distinct") - F.col("n_exact"))
            <= F.lit(tol) * F.col("n_exact")
        )
        .cast("int")
        .alias("within_bounds"),
    )


def run_kll_quantiles(
    spark: SparkSession,
    sf_dir: str,
    quantiles: tuple = (0.5, 0.9, 0.99),
    rank_tol: float = 0.05,
    name: str = "kll_sketch_stream",
) -> DataFrame:
    """Streaming KLL quantile maintenance — the third sketch beside
    :func:`run_cms_estimates` (frequencies) and :func:`run_hll_distinct`
    (distincts): the stream maintains one KLL sketch per day
    (kll_sketch_agg_double IS a streaming aggregation; per-key state
    is the fixed-size sketch), the read path folds the per-day
    sketches in deterministic bucket order and probes the target
    quantiles.  Verification mirrors the batch operator's contract
    (operators/aggregates.mergeable_quantile_profile): KLL compaction
    is randomized, so the oracle-checkable output is the
    within-bounds flag against exact percentiles at rank q +/-
    ``rank_tol`` from the batch table."""
    from pyspark.sql import functions as F

    from ..io import load_table

    ev = events_stream(spark, sf_dir).filter(F.col("value").isNotNull())
    per_bucket = ev.groupBy(
        F.date_trunc("day", F.col("ts")).alias("__b")
    ).agg(F.kll_sketch_agg_double("value").alias("__sk"))
    sink = run_bounded(
        spark,
        per_bucket,
        name,
        ckpt_prefix="spark_graft_kll_stream_",
        output_mode="complete",
    )
    merged = sink.agg(
        F.sort_array(F.collect_list(F.struct("__b", "__sk"))).alias("__a")
    ).select(
        F.expr(
            "aggregate(slice(__a, 2, size(__a) - 1), __a[0].__sk,"
            " (acc, x) -> kll_sketch_merge_double(acc, x.__sk))"
        ).alias("__sk")
    )
    probes = merged.select(
        *[
            F.kll_sketch_get_quantile_double("__sk", F.lit(q)).alias(
                f"__q{i}"
            )
            for i, q in enumerate(quantiles)
        ]
    )
    rank_points = []
    for q in quantiles:
        rank_points.append(max(0.0, q - rank_tol))
        rank_points.append(min(1.0, q + rank_tol))
    batch = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    bounds = batch.agg(
        F.percentile(
            "value", F.array(*[F.lit(p) for p in rank_points])
        ).alias("__ex")
    ).first()["__ex"]
    if bounds is None:
        # EMPTY-INPUT CONTRACT (r8 empty-events sweep, mirroring the
        # batch operator): an empty stream yields the EMPTY profile
        return spark.createDataFrame(
            [], "quantile double, within_bounds int"
        )
    per_q = [
        F.struct(
            F.lit(q).alias("quantile"),
            (
                (F.col(f"__q{i}") >= F.lit(bounds[2 * i]))
                & (F.col(f"__q{i}") <= F.lit(bounds[2 * i + 1]))
            )
            .cast("int")
            .alias("within_bounds"),
        )
        for i, q in enumerate(quantiles)
    ]
    return probes.select(F.explode(F.array(*per_q)).alias("r")).select(
        "r.quantile", "r.within_bounds"
    )
