"""Sequence packing (extension surface).

LLM pretraining consumes fixed-size token windows, so corpora are
"packed": documents are assigned to chunks of ~budget tokens. The
truly-greedy sequential algorithm is inherently serial; the
distributed-friendly variant used here assigns chunk ids from a
running token total within each partition-parallel group:

    chunk_id = floor((cumsum(n_tokens) - n_tokens) / budget)

Chunks can overshoot the budget by at most one document — the standard
trade accepted at scale, because the cumulative sum is a single window
per group (one shuffle on the group key) instead of a global sequential
scan. Groups (``source`` here) bound window state; a global packing
order would serialize on one reducer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import token_count


def pack_by_token_budget(df: DataFrame, group_col: str, order_col: str,
                         text_col: str = "text",
                         budget: int = 512) -> DataFrame:
    """Assign each document a chunk id so consecutive docs (by
    ``order_col`` within ``group_col``) accumulate to ~``budget``
    tokens per chunk. Deterministic: the order column must be unique
    within the group."""
    w = (
        Window.partitionBy(group_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n_tok = token_count(F.col(text_col))
    return (
        df.withColumn("n_tokens", n_tok)
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .withColumn(
            "chunk_id",
            F.floor((F.col("cum_tokens") - F.col("n_tokens")) / budget)
            .cast("long"),
        )
        .select(group_col, order_col, "n_tokens", "cum_tokens", "chunk_id")
    )
