"""Scalar expression helpers (reference F1-F16, SURVEY.md §2.8).

All helpers return Column expressions built from built-in
``pyspark.sql.functions`` — they stay inside whole-stage codegen; none
drop to Python at row level. The reference needed zero UDFs for its
logic (SURVEY.md §2.9) and so does this engine.
"""

from __future__ import annotations

import re
from collections.abc import Mapping

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def materialize_barrier(c: Column) -> Column:
    """Pin an expensive projected expression to its projection: a
    constant-true non-deterministic guard (``monotonically_increasing_id
    () >= 0`` is always true) whose value is exactly *c*, evaluated
    exactly where declared.

    Why it exists (r13 optimization, guide §4.4's duplication problem
    for built-ins): the optimizer pushes filters below projections by
    SUBSTITUTING the projected expression into the predicate.  When the
    projection materializes an expensive expression that the filter
    references many times through conditional branches (CASE disables
    codegen subexpression elimination), the pushed predicate re-computes
    it per reference — curation's scoring filter inlined the document
    tokenization 12×/row into the scan predicate (39 ``split(`` nodes
    in the plan; 1.60 s → 0.92 s at sf0.1 with the barrier, 2 nodes).
    Non-deterministic expressions may not be duplicated, reordered, or
    substituted, so the filter stays above the projection and reads the
    materialized column.  Value-identical; the guard is one integer
    compare per row.  Apply ONLY where a filter above an expensive
    materialized column would otherwise be pushed through it — the same
    wrapper also blocks legitimate pushdown of other predicates."""
    return F.when(F.monotonically_increasing_id() >= 0, c)


def trim_chars(c: Column | str, chars: str = '"') -> Column:
    """Strip any of ``chars`` from both ends (reference F1).

    The reference data arrives with literal double-quotes embedded in
    string values (``'"M"'``, 2_data_importing_cleaning.R:67-69,192) and
    strips them with Snowflake ``TRIM(col, '"')``. Implemented as a
    regexp so the char-set semantics match SQL TRIM(BOTH ... FROM ...).
    """
    cls = re.escape(chars)
    return F.regexp_replace(_col(c), f"^[{cls}]+|[{cls}]+$", "")


def strip_ends(c: Column | str, n: int = 1) -> Column:
    """Drop the first and last ``n`` chars (reference F2, str_sub(x,2,-2)
    on quote-wrapped ZIP3, 2_data_importing_cleaning.R:655)."""
    col = _col(c)
    return F.substring(col, n + 1, F.length(col) - 2 * n)


def recode(c: Column | str, mapping: Mapping[str, str],
           default: Column | str | None = None) -> Column:
    """Value remap (reference F3: dplyr ``recode`` of RACE/SEX labels,
    2_data_importing_cleaning.R:644-653).

    Chained when/otherwise — Catalyst folds this into a CaseWhen that
    whole-stage-codegens; unmapped values keep their original value
    unless ``default`` is given.
    """
    col = _col(c)
    expr: Column | None = None
    for old, new in mapping.items():
        expr = F.when(col == old, F.lit(new)) if expr is None \
            else expr.when(col == old, F.lit(new))
    if expr is None:
        return col
    if default is None:
        return expr.otherwise(col)
    return expr.otherwise(_col(default) if isinstance(default, Column) else F.lit(default))


def flag(cond: Column) -> Column:
    """0/1 indicator (reference F4: ``ifelse(cond, 1, 0)``,
    3_blood_pressure.R:276).

    NOTE: R's ifelse propagates NA; Spark's otherwise() maps NULL
    conditions to 0. Use :func:`null_safe_flag` when inputs may be NULL
    and the R NA-propagating behavior must be made deterministic first
    (SURVEY.md §2.10-1).
    """
    return F.when(cond, F.lit(1)).otherwise(F.lit(0))


def null_safe_flag(cond: Column) -> Column:
    """Indicator that is deterministic 0/1 even when the condition is
    NULL: NULL is treated as not satisfying the condition.

    Mirrors the engine decision for the e-phenotype flags
    (4_hypertension_phenotype_main.R:150-160 + SURVEY.md §2.10-1): the
    reference NA-fills only two of three inputs; we normalize all.
    """
    return F.when(F.coalesce(cond, F.lit(False)), F.lit(1)).otherwise(F.lit(0))


def year_of(c: Column | str) -> Column:
    """Year extraction (reference F6: ``format(d,'%Y')`` / SQL YEAR)."""
    return F.year(_col(c))


def age_from_birth_year(c: Column | str, ref_year: int = 2023) -> Column:
    """Derived age column (reference F7: ``age = 2023 - YEAR_OF_BIRTH``,
    2_data_importing_cleaning.R:643)."""
    return F.lit(ref_year) - _col(c)


def round_half_even(c: Column | str, scale: int = 1) -> Column:
    """Round half-to-even, matching R's ``round`` (reference F8).

    R rounds half-to-even while Spark's ``F.round`` is HALF_UP;
    ``F.bround`` restores R semantics on .x5 boundary means
    (SURVEY.md §2.10-3).
    """
    return F.bround(_col(c), scale)


def dec_present(c: Column | str) -> Column:
    """Presentation cast: exact DECIMAL -> DOUBLE, engine-agnostic.

    Externally-compared outputs must never carry DecimalType: hashers /
    renderers canonicalize decimals differently per engine (the r4 gate
    failed three bit-exact queries purely on decimal canonicalization).
    A direct ``CAST(dec AS DOUBLE)`` is also unsafe — measured: Spark
    (correctly-rounded BigDecimal) and DuckDB (scaled-int arithmetic)
    disagree in the last ulp once the scaled integer exceeds 2^53
    (~186/12000 random DECIMAL(28,6) values at 1e11+ magnitudes).

    The STRING-mediated route is exact at any magnitude: decimal ->
    full-scale digit string is exact on both engines, and string ->
    double is correctly rounded on both (Java ``parseDouble`` /
    DuckDB fast_float) — verified bit-identical on 21000 random values
    up to 1e21.  DuckDB mirror: ``CAST(CAST(x AS VARCHAR) AS DOUBLE)``.
    Keep the exact DECIMAL internal (joins, sorts, re-aggregation);
    apply this only at the output boundary.
    """
    return _col(c).cast("string").cast("double")


def round_fixed(c: Column | str, digits: int = 4) -> Column:
    """Fixed-point rounding as pure IEEE arithmetic:
    ``floor(x * 10^d + 0.5) / 10^d``.

    NOT ``F.round``: Spark's round(double) goes through Java's
    shortest-repr ``Double.toString`` (38.3787499..9 renders as
    "38.37875" and rounds UP) while DuckDB rounds the binary value —
    they disagree exactly at representation boundaries.  The floor form
    is bit-identical on any engine given identical input doubles, and
    never emits -0.0 (a zero result always comes from ``floor -> +0``).
    Halves round toward +infinity (so negative halves differ from
    round-half-away-from-zero); oracles must use the same
    ``FLOOR(x * 10^d + 0.5) / 10^d`` form, which is what makes the
    convention engine-safe.

    The floor itself is computed in the DOUBLE domain as
    ``v - pmod(v, 1.0)`` (fmod is exact IEEE, pmod makes the remainder
    nonnegative so the identity is floor for both signs) — NOT
    ``F.floor``, whose LongType result silently clamps at Long.MAX for
    |v| > ~9.2e18 while DuckDB's FLOOR stays double (adversarial
    embeddings sweep: a 1e60 gram-matrix sum came back as
    922337203685477.6).  For |v| >= 2^53, v is integral, pmod is 0,
    and both engines return v unchanged — verified bit-identical on
    random values across 1e-3..1e80 magnitudes, both signs.

    Non-finite ``v`` passes through UNFLOORED: ``pmod(inf, 1.0)`` is
    NaN so the subtraction form alone would map ±Inf -> NaN, while
    DuckDB's ``FLOOR`` is the identity on ±Inf/NaN — zero-variance
    groups (a20 slope, anomaly z with sd=0) would diverge
    cross-engine.  The passthrough is ``nanvl(v - pmod(v,1), v)``:
    the floor form is NaN exactly when v is non-finite (finite v
    always floors to a finite value; ±Inf and NaN both produce NaN
    through pmod), and nanvl then returns v itself — NaN stays NaN,
    ±Inf stays ±Inf, and a finite x that OVERFLOWS to ±Inf at the
    multiply rides the same ±Inf DuckDB's FLOOR form produces.
    Branch-free deliberately: a ``when`` guard would repeat the input
    subexpression across conditionally-evaluated branches, which
    defeats codegen subexpression elimination (measured +37% on
    text_quality_score, whose input is the whole regex-heavy quality
    expression).
    """
    p = float(10**digits)
    v = _col(c) * F.lit(p) + F.lit(0.5)
    return F.nanvl(v - F.pmod(v, F.lit(1.0)), v) / F.lit(p)
