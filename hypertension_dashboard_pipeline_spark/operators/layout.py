"""Data-layout operators: Z-order clustered writes.

A 100 TB table is pruned or scanned — there is no middle. Partition
columns prune one dimension; Z-ordering extends pruning to SEVERAL
numeric/orderable dimensions at once by writing rows so each output
file covers a small hyper-rectangle of the clustered columns. Parquet
then records per-file (and per-row-group) min/max for every column,
and any engine's scan planner — Spark's parquet filter pushdown
included — skips files whose [min, max] misses the predicate.

This is the same layout idea behind Delta's ``OPTIMIZE ZORDER BY`` /
Iceberg's sort orders, built here from public primitives only:

1. per-column bucketization to ``2^bits`` ranks via approx-quantile
   boundaries (skew-robust: equal-population, not equal-width buckets);
2. bit-interleaving the bucket ranks into one integer z-value (a
   space-filling curve: close z ⇒ close in every dimension);
3. ``repartitionByRange(z)`` + ``sortWithinPartitions(z)`` + write.

The z-value is a write-time ephemeral — readers see the original
schema and benefit purely through file/row-group statistics.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucketize(col: str, boundaries: list[float], bits: int) -> Column:
    """Map a numeric column to its quantile-bucket rank in [0, 2^bits):
    the count of boundaries strictly below the value — a monotone,
    data-skew-robust rank computed as a small fold over a boundary
    array literal (JVM-side, no UDF).  Nulls rank 0 (cluster with the
    minimum — they must land somewhere deterministic)."""
    arr = F.array(*[F.lit(float(b)) for b in boundaries])
    rank = F.aggregate(
        arr,
        F.lit(0),
        lambda acc, b: acc + F.when(F.col(col) > b, 1).otherwise(0),
    )
    max_rank = (1 << bits) - 1
    return F.least(F.coalesce(rank, F.lit(0)), F.lit(max_rank))


def _interleave_expr(rank_cols: Sequence[str], bits: int) -> Column:
    """Bit-interleave ``len(rank_cols)`` rank columns of ``bits`` bits
    each into one BIGINT z-value (Morton code), as a single generated
    shift/mask expression — whole-stage-codegen friendly."""
    n = len(rank_cols)
    terms = []
    for j, c in enumerate(rank_cols):
        for i in range(bits):
            src = f"shiftright({c}, {i}) & 1"
            terms.append(f"shiftleft(CAST({src} AS BIGINT), {i * n + j})")
    return F.expr(" | ".join(terms))


def zorder_value(df: DataFrame, cols: Sequence[str], bits: int = 8,
                 boundaries: dict[str, list[float]] | None = None,
                 ) -> tuple[DataFrame, str]:
    """Attach a z-value column for ``cols`` and return (df, colname).

    ``boundaries`` (per-column ascending bucket edges) can be supplied
    by the caller (e.g. reused from a previous compaction run); when
    absent they are estimated with ONE driver-side ``approxQuantile``
    pass — acceptable in a write/compaction job, which is already a
    full-data pass.
    """
    cols = list(cols)
    if boundaries is None:
        n_buckets = 1 << bits
        probs = [i / n_buckets for i in range(1, n_buckets)]
        qs = df.approxQuantile(cols, probs, 0.001)
        boundaries = dict(zip(cols, qs))
    ranked = df
    rank_names = []
    for c in cols:
        rn = f"__zr_{c}"
        ranked = ranked.withColumn(
            rn, _bucketize(c, boundaries[c], bits).cast("int")
        )
        rank_names.append(rn)
    out = ranked.withColumn("__z", _interleave_expr(rank_names, bits)).drop(
        *rank_names
    )
    return out, "__z"


def write_zordered(df: DataFrame, path: str, cols: Sequence[str],
                   bits: int = 8, num_files: int = 32,
                   mode: str = "overwrite") -> None:
    """Write ``df`` as parquet clustered on the Z-curve of ``cols``.

    ``repartitionByRange`` on the z-value gives each output file a
    contiguous z-range = a small hyper-rectangle in the clustered
    dimensions, so every clustered column's per-file min/max span is
    ~``1/2^bits``··√-ish of its domain instead of ~100% — multi-column
    predicates prune files regardless of which clustered column they
    hit.  (A plain sort by (a, b) prunes only on ``a``: every file
    spans all of ``b``.)
    """
    zdf, zc = zorder_value(df, cols, bits=bits)
    (
        zdf.repartitionByRange(num_files, F.col(zc))
        .sortWithinPartitions(zc)
        .drop(zc)
        .write.mode(mode)
        .parquet(path)
    )
