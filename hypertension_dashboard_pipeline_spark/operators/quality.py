"""Declarative data-quality expectations (the Deequ /
Great-Expectations shape, Spark-first).

The reference pipeline is essentially a hand-rolled QC program:
plausibility bands on BP values (`3_blood_pressure.R:132-143`),
mis-bridge detection via per-key distinct counts
(`2_data_importing_cleaning.R:93-126`), null screens, set-membership
recodes.  This operator generalizes those idioms into a rule list
evaluated against a table in AS FEW PASSES AS POSSIBLE:

* row-local rules (not_null / in_range / in_set / matches) compile to
  conditional-sum aggregates and share ONE scan — adding a rule adds
  an expression, not a pass;
* ``unique`` needs its own count-distinct aggregation (same scan
  feeds it);
* ``referential`` needs an anti-join probe per referenced table.

Output is one row per rule: ``rule_id, rule, col_name, n_checked,
n_violations, passed`` — exact integers, so the whole audit is
hash-stable and oracle-checkable.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """One expectation.  ``kind`` ∈ {not_null, in_range, in_set,
    matches, unique, referential}."""

    rule_id: str
    kind: str
    column: str
    lo: float | None = None
    hi: float | None = None
    values: tuple = field(default=())
    pattern: str | None = None

    def describe(self) -> str:
        if self.kind == "in_range":
            return f"in_range[{self.lo},{self.hi}]"
        if self.kind == "in_set":
            return f"in_set({','.join(str(v) for v in self.values)})"
        if self.kind == "matches":
            return f"matches({self.pattern})"
        return self.kind


def not_null(rule_id: str, column: str) -> Rule:
    return Rule(rule_id, "not_null", column)


def in_range(rule_id: str, column: str, lo: float, hi: float) -> Rule:
    return Rule(rule_id, "in_range", column, lo=lo, hi=hi)


def in_set(rule_id: str, column: str, values: list) -> Rule:
    return Rule(rule_id, "in_set", column, values=tuple(values))


def matches(rule_id: str, column: str, pattern: str) -> Rule:
    return Rule(rule_id, "matches", column, pattern=pattern)


def unique(rule_id: str, column: str) -> Rule:
    return Rule(rule_id, "unique", column)


def _violation(r: Rule) -> Column:
    c = F.col(r.column)
    if r.kind == "not_null":
        bad = c.isNull()
    elif r.kind == "in_range":
        # NULL is not a range violation — pair with not_null to forbid
        bad = c.isNotNull() & ~c.between(F.lit(r.lo), F.lit(r.hi))
    elif r.kind == "in_set":
        bad = c.isNotNull() & ~c.isin(list(r.values))
    elif r.kind == "matches":
        bad = c.isNotNull() & ~c.rlike(r.pattern)
    else:  # pragma: no cover - guarded by expectations()
        raise ValueError(f"not a row-local rule: {r.kind}")
    return F.sum(bad.cast("long")).alias(r.rule_id)


def expectations(
    df: DataFrame,
    rules: list[Rule],
    referential: list[tuple[str, str, DataFrame, str]] = (),
) -> DataFrame:
    """Evaluate *rules* against *df*; ``referential`` entries are
    ``(rule_id, fk_column, referenced_df, referenced_column)``.

    Plan shape: one scan computes every row-local violation count
    map-side (a single 1-row partial aggregate — adding rules is
    free); each ``unique`` rule adds a count-vs-distinct twin over the
    same scan; each referential rule is one left-anti probe against
    the (typically broadcastable) referenced keys.  The per-rule
    1-row results are unioned driver-free into the audit report.
    """
    _ROW_LOCAL_KINDS = ("not_null", "in_range", "in_set", "matches")
    unknown = [r for r in rules if r.kind not in _ROW_LOCAL_KINDS + ("unique",)]
    if unknown:
        # 'referential' rules need the referenced DataFrame — they go
        # in the ``referential`` parameter; silently dropping them
        # would make the audit LOOK complete while the FK check never
        # ran
        raise ValueError(
            f"unsupported rule kinds in `rules`: "
            f"{sorted({r.kind for r in unknown})} — referential checks go "
            f"in the `referential` parameter"
        )
    if not rules and not referential:
        raise ValueError("expectations: no rules given")
    row_local = [r for r in rules if r.kind in _ROW_LOCAL_KINDS]
    uniques = [r for r in rules if r.kind == "unique"]

    reports: list[DataFrame] = []
    total = F.count(F.lit(1)).alias("__n")
    if row_local:
        bad_ids = [r.rule_id for r in rules
                   if not re.fullmatch(r"[A-Za-z0-9_]+", r.rule_id)]
        if bad_ids:
            raise ValueError(f"rule_id must be [A-Za-z0-9_]+: {bad_ids}")

        def q(s: str) -> str:  # SQL string literal, quotes escaped
            return "'" + s.replace("'", "''") + "'"

        agg = df.agg(total, *[_violation(r) for r in row_local])
        stack = ", ".join(
            f"{q(r.rule_id)}, {q(r.describe())}, {q(r.column)}, `{r.rule_id}`"
            for r in row_local
        )
        reports.append(
            agg.select(
                F.expr(
                    f"stack({len(row_local)}, {stack}) AS "
                    "(rule_id, rule, col_name, n_violations)"
                ),
                F.col("__n").alias("n_checked"),
            ).select("rule_id", "rule", "col_name", "n_checked", "n_violations")
        )
    for r in uniques:
        rep = df.agg(
            F.count(F.lit(1)).alias("n_checked"),
            (F.count(r.column) - F.countDistinct(r.column)).alias("n_violations"),
        ).select(
            F.lit(r.rule_id).alias("rule_id"),
            F.lit("unique").alias("rule"),
            F.lit(r.column).alias("col_name"),
            "n_checked",
            "n_violations",
        )
        reports.append(rep)
    for rule_id, fk, ref_df, ref_col in referential:
        # ONE pass over the fact side: broadcast LEFT join against the
        # distinct referenced keys, then count rows and unmatched
        # non-null keys in the same 1-row aggregate — no anti-join +
        # count-join recombination (which would need a product of two
        # 1-row aggregates)
        hits = F.broadcast(
            ref_df.select(F.col(ref_col).alias(fk))
            .distinct()
            .withColumn("__hit", F.lit(1))
        )
        rep = (
            df.select(F.col(fk))
            .join(hits, fk, "left")
            .agg(
                F.count(F.lit(1)).alias("n_checked"),
                F.sum(
                    (F.col(fk).isNotNull() & F.col("__hit").isNull()).cast("long")
                ).alias("n_violations"),
            )
            .select(
                F.lit(rule_id).alias("rule_id"),
                F.lit(f"referential({ref_col})").alias("rule"),
                F.lit(fk).alias("col_name"),
                "n_checked",
                "n_violations",
            )
        )
        reports.append(rep)

    out = reports[0]
    for rep in reports[1:]:
        out = out.unionByName(rep)
    return out.withColumn("passed", (F.col("n_violations") == 0).cast("int"))


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rule_flags(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021, public
    literature — the rule-based filter family beside the continuous
    ``quality_score``): per-document named pass/fail flags plus the
    combined keep decision.

    Every rule is INTEGER arithmetic over token counts — ratio
    thresholds are cross-multiplied (e.g. mean word length in [3,10]
    becomes ``3·n_words ≤ n_chars ≤ 10·n_words``), so there is no
    float anywhere and no divide-by-zero case: an engine-independent
    contract by construction.  NULL text is treated as empty.

    Scale shape: a pure narrow map over the corpus — no shuffle, no
    UDF; predicates sit in one whole-stage-codegen projection, and a
    downstream ``filter(keep = 1)`` pushes into the scan.
    """
    from ..functions.text import tokens

    t = F.coalesce(F.col(text_col), F.lit(""))
    toks = tokens(F.lower(t))
    base = df.select(
        F.col(id_col),
        F.size(toks).alias("n_words"),
        F.length(F.regexp_replace(t, r"\s+", "")).alias("n_word_chars"),
        F.regexp_count(t, F.lit("#")).alias("n_hash"),
        F.regexp_count(t, F.lit(r"\.\.\.|…")).alias("n_ellipsis"),
        F.size(
            F.filter(toks, lambda x: x.rlike("[A-Za-z]"))
        ).alias("n_alpha_words"),
        sum(
            (
                F.array_contains(toks, F.lit(w)).cast("int")
                for w in GOPHER_STOPWORDS
            ),
            F.lit(0),
        ).alias("n_stopword_kinds"),
    )
    w = F.col("n_words")
    flags = base.select(
        id_col,
        "n_words",
        (w.between(50, 100_000)).cast("int").alias("word_count_ok"),
        (
            (F.lit(3) * w <= F.col("n_word_chars"))
            & (F.col("n_word_chars") <= F.lit(10) * w)
        ).cast("int").alias("mean_word_len_ok"),
        (F.lit(10) * F.col("n_hash") <= w).cast("int").alias("hash_ratio_ok"),
        (F.lit(10) * F.col("n_ellipsis") <= w)
        .cast("int")
        .alias("ellipsis_ratio_ok"),
        (F.lit(10) * F.col("n_alpha_words") >= F.lit(8) * w)
        .cast("int")
        .alias("alpha_ratio_ok"),
        (F.col("n_stopword_kinds") >= 2).cast("int").alias("stopword_ok"),
    )
    keep = (
        F.col("word_count_ok")
        * F.col("mean_word_len_ok")
        * F.col("hash_ratio_ok")
        * F.col("ellipsis_ratio_ok")
        * F.col("alpha_ratio_ok")
        * F.col("stopword_ok")
    )
    return flags.withColumn("keep", keep)
