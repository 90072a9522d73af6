"""Vector expressions over array<float|double> embedding columns.

Dot products / norms / cosine as built-in higher-order functions
(zip_with + aggregate) — JVM-side, no Python boundary. The fold in
``F.aggregate`` is sequential over the array, so results are
bit-deterministic for a given row (unlike a parallel reduction), which
is what lets a DuckDB oracle reproduce them exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def as_double_array(c: Column | str) -> Column:
    """Cast array<float> → array<double> so arithmetic is double-precision
    end-to-end (float32 intermediates would diverge across engines)."""
    return _col(c).cast("array<double>")


def sql_double(v: float) -> str:
    """Exact SQL double literal for *v*: ``repr`` is the shortest string
    that round-trips to the identical double in both Python and the
    JVM (both parse correctly-rounded), so the parsed literal is
    bit-equal to ``F.lit(v)``."""
    if v != v:
        return "CAST('NaN' AS DOUBLE)"
    if v == float("inf"):
        return "CAST('Infinity' AS DOUBLE)"
    if v == float("-inf"):
        return "CAST('-Infinity' AS DOUBLE)"
    return repr(float(v)) + "D"


def lit_double_array(values) -> Column:
    """array<double> literal as ONE parsed expression.

    ``F.array(*[F.lit(float(x)) for x in values])`` costs one py4j
    round-trip per component — ~0.1 s of driver time per 64-dim query
    vector, per plan construction (r13 optimization; the bench timer
    includes construction).  The parsed tree is the identical
    ``array(<double literals>)``."""
    return F.expr("array(" + ", ".join(sql_double(v) for v in values) + ")")


def dot(a: Column | str, b: Column | str) -> Column:
    products = F.zip_with(as_double_array(a), as_double_array(b), lambda x, y: x * y)
    return F.aggregate(products, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine_guarded(a: Column | str, b: Column | str,
                   scale: int | None = None) -> Column:
    """Zero-norm-safe, NaN-safe cosine: NULL when either operand has
    zero norm (instead of an ANSI ``DIVIDE_BY_ZERO`` at runtime) or a
    non-finite self-dot (a NaN-component vector).

    The division lives INSIDE an ``F.when`` branch conditioned on both
    squared norms being positive.  A ``norm > 0`` pre-FILTER is not
    equivalent: Catalyst's CombineFilters merges it with any later
    filter on the cosine, and codegen's subexpression elimination then
    evaluates the division before the AND can short-circuit — the
    mechanism pinned down by ``sim_range_search``'s adversarial run
    (registry.py LATENT-BUG ROTATION).  A conditional branch stays
    lazy where a conjunct does not; callers drop the NULL rows with an
    explicit ``isNotNull`` filter (safe — the filter predicate only
    reaches the division through the lazy branch) or a threshold
    compare.

    The NaN leg matters because ``NaN > 0`` is TRUE in Spark
    comparisons (and in DuckDB CASE predicates): without the explicit
    ``~isnan`` conjuncts a garbage NaN-component vector passes the
    positivity guard, scores a NaN cosine, and — since NaN sorts HIGH
    — ranks FIRST under ``ORDER BY cos_sim DESC`` in both engines.
    Parity holds; semantics don't.  Excluding non-finite self-dots
    turns the row into a NULL that the callers' standing
    ``isNotNull`` / threshold filters already drop.

    For finite non-zero operands the value is bit-identical to
    ``cosine``: the branch body is the same dot/(sqrt·sqrt) expression
    (``norm`` is literally ``sqrt(dot(a, a))``), rounded by the same
    ``round_fixed`` floor form.  Oracles pair the exclusion with a
    ``WHERE <self-dot> > 0 AND NOT isnan(<self-dot>)`` guard on the
    scored rows.
    """
    from .expressions import round_fixed

    daa = dot(a, a)
    dbb = dot(b, b)
    sim = dot(a, b) / (F.sqrt(daa) * F.sqrt(dbb))
    return F.when(
        (daa > 0) & (dbb > 0) & ~F.isnan(daa) & ~F.isnan(dbb),
        round_fixed(sim, scale) if scale is not None else sim,
    )


def cosine(a: Column | str, b: Column | str, scale: int | None = None) -> Column:
    """Cosine similarity; optionally rounded for stable cross-engine
    comparison (recommended when the value feeds a threshold/rank).

    Rounding uses the package's engine-safe floor form
    (``functions.expressions.round_fixed``), not ``F.round``: Spark's
    round(double) rounds the SHORTEST-REPR decimal string while DuckDB
    ROUND rounds the binary value, and dot/norm ratios are exactly the
    kind of data-dependent doubles that can land on a representation
    boundary.  Oracles must pair with
    ``FLOOR(x * 10^scale + 0.5) / 10^scale``.
    """
    from .expressions import round_fixed

    sim = dot(a, b) / (norm(a) * norm(b))
    return round_fixed(sim, scale) if scale is not None else sim
