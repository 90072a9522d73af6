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
