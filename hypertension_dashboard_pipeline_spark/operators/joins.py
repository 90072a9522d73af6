"""Join operators (reference J1-J8 and U1, SURVEY.md §2.3/§2.7).

Every reference join is an equi-join on the patient key (one composite
case). On a cluster, the big patient-keyed joins are sort-merge joins
shuffled on the key; codelist-sized sides broadcast. AQE re-plans
strategy and splits skewed partitions at runtime, so nothing here picks
a physical join — we only make small sides explicit with
``F.broadcast`` where the engine knows the side is dimension-sized.
"""

from __future__ import annotations

from functools import reduce
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich(left: DataFrame, right: DataFrame,
           on: str | Sequence[str]) -> DataFrame:
    """Reference J1: left outer join attaching flags/BP back to the
    cohort (3_blood_pressure.R:293-295)."""
    return left.join(right, on=on, how="left")


def pair(a: DataFrame, b: DataFrame, on: Sequence[str]) -> DataFrame:
    """Reference J3: composite-key inner join — pair same-day SBP and
    DBP readings on (patient, date) (3_blood_pressure.R:203-205)."""
    return a.join(b, on=list(on), how="inner")


def has_evidence(cohort: DataFrame, evidence: DataFrame,
                 on: str | Sequence[str]) -> DataFrame:
    """Reference J6 (and the J2+distinct idiom): keep cohort rows with
    at least one matching evidence row (2_data_importing_cleaning.R:395-397).

    LEFT SEMI: never duplicates cohort rows, never carries evidence
    columns through the shuffle — strictly less data movement than the
    reference's inner-join-then-distinct.
    """
    return cohort.join(evidence, on=on, how="left_semi")


def exclude(cohort: DataFrame, exclusion: DataFrame,
            on: str | Sequence[str]) -> DataFrame:
    """Reference J5: anti-join cohort exclusion
    (2_data_importing_cleaning.R:399-400)."""
    return cohort.join(exclusion, on=on, how="left_anti")


def evidence_union(key: str, *domains: DataFrame) -> DataFrame:
    """Reference J4/U1: the union of patient keys flagged in any domain.

    The reference chains full outer joins to merge exclusion keys across
    condition/measurement/observation/procedure domains
    (2_data_importing_cleaning.R:389-392); since only the key survives
    downstream, the scalable formulation is a key-column union +
    distinct — one shuffle on the key, no wide rows.
    """
    keys = [d.select(F.col(key)) for d in domains]
    return reduce(DataFrame.unionByName, keys).distinct()


def broadcast_dim(fact: DataFrame, dim: DataFrame,
                  on: str | Sequence[str], how: str = "inner") -> DataFrame:
    """Reference J8: dimension-sized side joined broadcast-hash, the
    engine form of the reference's IN-literal splicing
    (2_data_importing_cleaning.R:209)."""
    return fact.join(F.broadcast(dim), on=on, how=how)


def salted_join(skewed: DataFrame, other: DataFrame, on: str,
                salt_buckets: int = 16) -> DataFrame:
    """Inner equi-join that survives extreme key skew: the skewed side
    gets a random-but-deterministic salt (hash of its whole row via
    monotonically increasing id is NOT deterministic — use xxhash64 of
    all columns), the other side is exploded across all salt values,
    and the join key becomes (key, salt) — a hot key's rows spread over
    ``salt_buckets`` reducers instead of one.

    AQE's skew-join split (on by default in session.py) handles most
    skew by splitting oversized partitions; this manual form remains
    for the pathological case AQE can't fix — a single join key larger
    than executor memory — at the cost of replicating the other side
    ``salt_buckets``×. Exact same result set as a plain inner join
    (oracle-checked).
    """
    skew_salted = skewed.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]),
               F.lit(salt_buckets)),
    )
    other_exploded = other.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    return skew_salted.join(other_exploded, on=[on, "__salt"]).drop("__salt")
