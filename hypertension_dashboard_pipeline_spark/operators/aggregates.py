"""Aggregation operators (reference A1-A11, SURVEY.md §2.4).

All are single-shuffle hash aggregations with map-side partial
aggregation — the groupBy key is the patient key, which is
high-cardinality/low-skew, so these scale linearly. None of them
collect to the driver.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def count_distinct_per_key(df: DataFrame, key: str | Sequence[str],
                           cols: Sequence[str]) -> DataFrame:
    """Reference A1/A2: per-patient n_distinct over identity columns to
    detect mis-bridged records (2_data_importing_cleaning.R:93-139).

    Output columns are named ``<col>_count`` like the reference.
    """
    keys = [key] if isinstance(key, str) else list(key)
    aggs = [F.countDistinct(c).alias(f"{c}_count") for c in cols]
    return df.groupBy(*keys).agg(*aggs)


def consistent_keys(df: DataFrame, key: str, cols: Sequence[str]) -> DataFrame:
    """Keys whose identity columns are all internally consistent
    (reference: filter(yob_count==1 & sex_count==1 & race_count==1),
    2_data_importing_cleaning.R:134-139)."""
    counted = count_distinct_per_key(df, key, cols)
    cond = None
    for c in cols:
        p = F.col(f"{c}_count") == 1
        cond = p if cond is None else cond & p
    return counted.filter(cond).select(key)


def same_day_avg(df: DataFrame, key: str, date_col: str, value_col: str,
                 out_col: str | None = None, scale: int = 1) -> DataFrame:
    """Reference A3: average same-day readings, rounded like R
    (half-to-even via bround, SURVEY.md §2.10-3)
    (3_blood_pressure.R:168-174)."""
    out = out_col or f"{value_col}_avg"
    return (
        df.groupBy(key, date_col)
        .agg(F.bround(F.avg(value_col), scale).alias(out))
    )


def sum_indicator(df: DataFrame, key: str, flag_col: str,
                  out_col: str = "n") -> DataFrame:
    """Reference A4: count of flagged days per patient
    (3_blood_pressure.R:286-288). F.sum ignores NULLs natively, matching
    ``sum(x, na.rm=TRUE)``."""
    return df.groupBy(key).agg(F.sum(flag_col).alias(out_col))


def freq_table(df: DataFrame, col: str, pct_scale: int = 6) -> DataFrame:
    """Reference A6: janitor ``tabyl`` — counts and percents per value
    (4_hypertension_phenotype_main.R:182-186).

    The percent denominator is a window total over an empty partition
    spec — a single-stage computation, no driver round-trip.
    """
    w = Window.partitionBy()
    return (
        df.groupBy(col)
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn(
            "percent",
            F.round(F.lit(100.0) * F.col("n") / F.sum("n").over(w), pct_scale),
        )
    )


def freq_table_with_total(df: DataFrame, col: str) -> DataFrame:
    """Reference A7: frequency table with an appended totals row
    (janitor ``adorn_totals``) — the one grouping-sets-shaped op in the
    reference. ``rollup`` emits the NULL-key total row natively."""
    return df.rollup(col).agg(F.count(F.lit(1)).alias("n"))


def dedup_deterministic(df: DataFrame, key: str | Sequence[str],
                        order_by: Sequence) -> DataFrame:
    """Reference A9: ``distinct(key, .keep_all=TRUE)`` with a
    deterministic survivor.

    dplyr keeps an arbitrary first row; Spark's dropDuplicates survivor
    varies per run. The engine picks the survivor by an explicit total
    order so result hashes are stable (SURVEY.md §2.10-4). The window
    shuffles once on the key — same cost as dropDuplicates.
    """
    keys = [key] if isinstance(key, str) else list(key)
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def salted_counts(df: DataFrame, key: str, value_col: str,
                  salt_buckets: int = 16,
                  salt_cols: Sequence[str] | None = None) -> DataFrame:
    """Two-phase skew-safe count/sum: rows are salted into
    ``salt_buckets`` sub-keys, partially aggregated, then merged.

    For a low-cardinality hot key (e.g. 3 distinct values across
    billions of rows) a plain groupBy concentrates each key's entire
    input on one reducer; salting spreads phase 1 across
    key×salt_buckets reducers and phase 2 only merges
    ``salt_buckets`` partial rows per key. Exact for algebraic
    aggregates (count/sum/min/max). AQE's skew handling covers joins;
    this is the aggregation-side equivalent.

    ``salt_cols`` (a high-cardinality id column / composite key) makes
    the salt a pure function of row content — the safe default shape:
    under stage retry or speculative re-execution a recomputed map task
    reproduces exactly the salt assignments reducers already fetched.
    Without it the salt falls back to per-row execution entropy
    (partition id + row position), which breaks skew even when the hot
    key's rows are bit-identical, but carries the same known exposure
    as the classic rand()-salting idiom (SPARK-23207 class): a map
    task recomputed after shuffle-fetch failure may re-bucket rows.
    Prefer ``salt_cols`` whenever any unique-ish column exists.
    """
    if salt_cols:
        salt = F.pmod(
            F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(salt_buckets)
        )
    else:
        salt = F.pmod(
            F.xxhash64(F.spark_partition_id(), F.monotonically_increasing_id()),
            F.lit(salt_buckets),
        )
    salted = df.withColumn("__salt", salt)
    partial = salted.groupBy(key, "__salt").agg(
        F.count(F.lit(1)).alias("__n"), F.sum(value_col).alias("__s")
    )
    return partial.groupBy(key).agg(
        F.sum("__n").alias("n"), F.sum("__s").alias("total")
    )


def grouped_percentiles(df: DataFrame, key: str, value_col: str,
                        percentiles: Sequence[float] = (0.5, 0.9, 0.99),
                        scale: int = 4) -> DataFrame:
    """Exact interpolated percentiles per group (``F.percentile``; same
    definition as ANSI PERCENTILE_CONT / DuckDB quantile_cont, so the
    oracle matches to the rounding scale).

    Exact percentiles require the group's values on one reducer; for
    100 TB hot groups use ``approx_percentiles`` (t-digest sketch,
    map-side combinable, bounded memory) instead.
    """
    aggs = [
        F.round(F.percentile(F.col(value_col), F.lit(p)), scale).alias(
            f"p{str(p).replace('0.', '')}"
        )
        for p in percentiles
    ]
    return df.groupBy(key).agg(*aggs)


def approx_distinct_and_percentiles(df: DataFrame, key: str,
                                    distinct_col: str, value_col: str,
                                    rsd: float = 0.05) -> DataFrame:
    """Sketch-based grouped profile: HyperLogLog++ distinct count and
    t-digest median — both map-side combinable with fixed-size state,
    the only viable shape for high-cardinality profiling at 100 TB
    (exact countDistinct shuffles every distinct value; exact
    percentile shuffles every row).

    Approximate by design → no SQL oracle; tests bound the relative
    error against exact computation instead.
    """
    return df.groupBy(key).agg(
        F.approx_count_distinct(distinct_col, rsd=rsd).alias("approx_distinct"),
        F.percentile_approx(value_col, 0.5, 10_000).alias("approx_median"),
    )


def attrition_pct(before: int, after: int, denom: int | None = None) -> float:
    """Reference A11: attrition percentage arithmetic over stage counts
    (2_data_importing_cleaning.R:403-405)."""
    d = denom if denom is not None else before
    return 100.0 * (before - after) / d
