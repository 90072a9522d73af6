"""Deterministic sampling and dataset splitting (extension surface).

Training-data pipelines need *reproducible* subsetting: re-running the
pipeline (or running it on another engine) must select the same rows.
Spark's ``df.sample``/``sampleBy`` are seeded-RNG based — reproducible
within Spark but partitioning-sensitive and not portable — so these
operators derive selection from a content hash instead:

    bucket(x) = md5(x) first 8 hex digits, mod ``buckets``

which is engine-agnostic (the DuckDB oracle reproduces it exactly),
stable under repartitioning, and needs no coordination — each row
decides membership locally, so sampling a 100 TB table is a pure
narrow map with full predicate pushdown of everything else.

Splitting by a *group* key (user, document family, patient) rather
than per-row prevents train/test leakage: all rows of one entity land
in the same split — the reason sampleBy can't be used for eval splits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(col: Column | str, buckets: int = 100) -> Column:
    """Deterministic [0, buckets) bucket from md5 of the column's
    string form. Engine-agnostic: DuckDB equivalent is
    ``('0x' || substr(md5(CAST(x AS VARCHAR)), 1, 8))::BIGINT % buckets``."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10)
        .cast("long") % buckets
    )


def deterministic_sample(df: DataFrame, key_col: str, pct: int,
                         buckets: int = 100) -> DataFrame:
    """Keep rows whose key hashes into the first ``pct`` of ``buckets``
    — a reproducible, repartition-stable ~pct% sample."""
    return df.filter(hash_bucket(key_col, buckets) < pct)


def temperature_mix(df: DataFrame, domain_col: str, key_col: str,
                    sample_frac: float = 0.5,
                    buckets: int = 100_000) -> DataFrame:
    """Temperature-flattened domain mixing (extension surface): sample
    ``sample_frac`` of the corpus so the sampled distribution over
    ``domain_col`` is proportional to ``n_d^0.5`` instead of ``n_d`` —
    the α=0.5 temperature re-weighting used for multilingual /
    multi-source LLM training mixes (Conneau & Lample 2019 §3.1), which
    up-weights small domains and down-weights dominant ones.

    Mechanics: per-domain target ``t_d = frac·N·√n_d / Σ√n_d``, keep
    probability ``p_d = min(1, t_d/n_d)``, realized deterministically
    as ``hash_bucket(key) < floor(p_d·buckets)`` — the same
    content-hash selection as ``deterministic_sample``, so membership
    is reproducible and repartition-stable.

    α is fixed at 0.5 (√) rather than a general ``pow(n, α)``: sqrt is
    IEEE-correctly-rounded in every engine, so the oracle reproduces
    the thresholds bit-for-bit; libm ``pow`` is not, and a 1-ulp
    threshold difference flips bucket-boundary rows.

    100 TB shape: the per-domain count is one tiny-cardinality partial
    agg; rates broadcast back; the selection itself is a narrow map —
    no data-sized shuffle anywhere.
    """
    from pyspark.sql import Window

    counts = df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("__n_d"))
    # corpus-wide totals as a global window over the tiny per-domain
    # counts frame (cardinality = #domains): a crossJoin with a 1-row
    # aggregate would plan a nested-loop product, which the plan-
    # hygiene suite rightly forbids even when it is harmless
    everything = Window.partitionBy()
    rates = (
        counts.withColumn("__z", F.sum(F.sqrt(F.col("__n_d"))).over(everything))
        .withColumn("__n_total", F.sum("__n_d").over(everything))
        .withColumn(
            "__p_d",
            F.least(
                F.lit(1.0),
                F.lit(float(sample_frac)) * F.col("__n_total")
                * F.sqrt(F.col("__n_d")) / F.col("__z") / F.col("__n_d"),
            ),
        )
        .select(
            domain_col,
            F.floor(F.col("__p_d") * buckets).cast("long").alias("__thresh"),
        )
    )
    return (
        df.join(F.broadcast(rates), domain_col)
        .filter(hash_bucket(key_col, buckets) < F.col("__thresh"))
        .drop("__thresh")
    )


def group_split(df: DataFrame, group_col: str,
                weights: dict[str, int] | None = None) -> DataFrame:
    """Assign every row a split label by hashing its *group* key, so a
    group's rows never straddle splits (no train/test leakage).

    ``weights`` maps label → bucket count out of their total (default
    80/10/10 train/val/test).
    """
    weights = weights or {"train": 80, "val": 10, "test": 10}
    total = sum(weights.values())
    b = hash_bucket(group_col, total)
    expr: Column | None = None
    lo = 0
    for label, w in weights.items():
        cond = b < lo + w
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
        lo += w
    return df.withColumn("split", expr)


def hash_uniform(col: Column | str) -> Column:
    """Deterministic uniform in (0, 1]: (first-8-hex of md5 + 1) /
    (16^8 + 1).  The +1 keeps ln() finite; engine-agnostic like
    ``hash_bucket``."""
    c = F.col(col) if isinstance(col, str) else col
    raw = F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast(
        "double"
    )
    return (raw + 1.0) / float(16**8 + 1)


def weighted_sample_topk(df: DataFrame, key_col: str, weight_col: str,
                         k: int) -> DataFrame:
    """Weighted sampling WITHOUT replacement, deterministic: the
    Efraimidis–Spirakis exponential-keys scheme with the uniform drawn
    from a content hash instead of an RNG.

    Each row scores ``ln(u) / w`` (monotone in the classic
    ``u^(1/w)``); the k largest scores are the sample.  Inclusion
    probability scales with weight, every row decides its score
    locally (narrow map), and the selection is ONE TakeOrdered — no
    global sort, no multi-pass rejection loop, repartition-stable and
    reproducible across engines.  This is the 100 TB way to draw a
    fixed-size weighted subset: map + top-k, nothing else.

    Rows with non-positive weight are excluded (they have zero
    inclusion mass in the E-S scheme).
    """
    w = F.col(weight_col).cast("double")
    score = F.log(hash_uniform(key_col)) / w
    return (
        df.filter(w > 0)
        .withColumn("__score", score)
        .orderBy(F.col("__score").desc(), F.col(key_col))
        .limit(k)
        .drop("__score")
    )


def global_index(df: DataFrame, key_col: str,
                 out_col: str = "global_idx") -> DataFrame:
    """Contiguous global ordinal 0..N-1 in deterministic content-hash
    order WITHOUT a single-partition sort — the export step that needs
    an exact global position (striding a corpus into numbered training
    steps, resumable shard manifests) where ``row_number() OVER
    (ORDER BY ...)`` would funnel 100 TB through one task.

    Two-level prefix-sum shape (the ``events_concurrency_peak``
    pattern): rows bucket by the FIRST HEX DIGIT of their md5 order
    key — a monotone function of the global (md5, key) sort order, so
    bucket boundaries respect it — then each bucket ranks locally in
    parallel, and the only serial work is a window over the 16-row
    bucket-count table that turns counts into starting offsets
    (broadcast back).  ``global_idx = bucket_offset + local_rank - 1``
    is exactly the global ROW_NUMBER, provable from monotonicity, and
    a SQL oracle can assert it directly against the naive global
    window.  At real scale widen the bucket key to 2-3 hex digits
    (256-4096 buckets ≈ cluster parallelism); the offsets table stays
    driver-trivial.
    """
    from pyspark.sql import Window

    h = F.md5(F.col(key_col).cast("string"))
    bucket = F.conv(F.substring(h, 1, 1), 16, 10).cast("int")
    tagged = df.select(F.col(key_col), h.alias("_h"), bucket.alias("_b"))
    counts = tagged.groupBy("_b").agg(F.count(F.lit(1)).alias("_n"))
    # O(buckets) serial window — 16 rows, never fact-sized
    off_w = (
        Window.orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "_b", F.coalesce(F.sum("_n").over(off_w), F.lit(0)).alias("_off")
    )
    local_w = Window.partitionBy("_b").orderBy("_h", key_col)
    return (
        tagged.withColumn("_rk", F.row_number().over(local_w))
        .join(F.broadcast(offsets), "_b")
        .select(
            key_col,
            (F.col("_off") + F.col("_rk") - 1).alias(out_col),
        )
    )


def stratified_exact(df: DataFrame, strata_col: str, key_col: str,
                     frac_num: int = 1, frac_den: int = 10) -> DataFrame:
    """Exact proportional stratified sampling: from every stratum of
    size ``n_g`` keep exactly ``round(n_g · frac)`` rows (half-up in
    exact integer arithmetic: ``(2·n_g·num + den) DIV (2·den)`` — no
    float ever touches the allocation), selected as the stratum's
    lowest content-hash keys.  Hash-ranked selection makes the sample
    simultaneously deterministic, repartition-stable, and uniform
    within each stratum — rerunning on re-bucketed data returns the
    identical row set, which a train/eval split pipeline depends on.

    Plan: one window over ``partitionBy(strata_col)`` computing the
    stratum size and the hash rank together (single exchange).  The
    per-stratum rank sorts only within a stratum — at 100 TB a
    pathologically hot stratum serializes one reducer; for that shape
    switch the rank to the two-level prefix-sum construction of
    ``global_index`` applied per stratum, or accept the ~frac
    approximation of ``deterministic_sample`` which needs no rank at
    all.  The hash is the engine-agnostic md5 construction of
    ``hash_bucket``; ties cannot occur because (hash, key) embeds the
    unique key.
    """
    from pyspark.sql.window import Window

    h = (
        F.conv(
            F.substring(F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10
        ).cast("long")
    )
    by_stratum = Window.partitionBy(strata_col)
    ranked = (
        df.withColumn("__h", h)
        .withColumn("__n_g", F.count(F.lit(1)).over(by_stratum))
        .withColumn(
            "__rn",
            F.row_number().over(
                by_stratum.orderBy(F.col("__h"), F.col(key_col))
            ),
        )
    )
    # integral `div`, not `/` (which is double division in Spark and
    # would silently reintroduce the float the docstring rules out)
    n_take = F.expr(
        f"(cast({2 * frac_num} as bigint) * __n_g + {frac_den})"
        f" div {2 * frac_den}"
    )
    return ranked.filter(F.col("__rn") <= n_take).drop(
        "__h", "__n_g", "__rn"
    )


def weighted_sample_k_per_group(df: DataFrame, group_cols: list[str],
                                key_col: str, weight_col: str,
                                k: int) -> DataFrame:
    """Weighted sampling without replacement, k PER GROUP: the
    Efraimidis–Spirakis exponential-keys scheme of
    ``weighted_sample_topk`` composed with the map-side-truncating
    grouped top-k — every row scores ``ln(u)/w`` locally from its
    content hash, and ``grouped_topk_partial`` keeps each Arrow
    batch's per-group top-k before the shuffle, so a 100 TB group
    never shuffles whole.  Deterministic, repartition-stable, and
    engine-reproducible like its global sibling; rows with
    non-positive weight are excluded (zero inclusion mass)."""
    from .windows import grouped_topk_partial

    w = F.col(weight_col).cast("double")
    scored = df.filter(w > 0).withColumn(
        "score", F.log(hash_uniform(key_col)) / w
    )
    return grouped_topk_partial(
        scored, list(group_cols), "score", key_col, k=k, ascending=False
    )
