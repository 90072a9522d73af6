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

from ..functions.text import token_count, tokens


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


def chunk_documents(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", chunk_tokens: int = 64,
                    overlap: int = 8) -> DataFrame:
    """Split long documents into overlapping fixed-token-budget chunks
    — the complement of ``pack_by_token_budget`` (that merges short
    docs; this splits long ones). Standard LLM preprocessing: window
    ``chunk_tokens`` tokens with ``overlap`` tokens of context carried
    between consecutive chunks (stride = chunk_tokens - overlap).

    Entirely built-in expressions: tokenize once, ``explode(sequence)``
    the chunk indices (1→N fan-out, narrow), ``slice`` each token
    window back out. A document shorter than the budget yields exactly
    one chunk; empty text yields one empty chunk (the row is preserved
    — dropping rows is a filter's decision, not a formatter's).
    Output: (id, chunk_idx, n_chunk_tokens, chunk_text).
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    # ceil(max(n - overlap, 0) / stride), at least 1
    n_chunks = F.greatest(
        F.lit(1),
        F.floor(
            (F.greatest(n - overlap, F.lit(0)) + (stride - 1)) / stride
        ).cast("int"),
    )
    return (
        df.select(
            F.col(id_col),
            toks.alias("__toks"),
            F.explode(
                F.sequence(F.lit(0), n_chunks - 1)
            ).alias("chunk_idx"),
        )
        .select(
            id_col,
            "chunk_idx",
            F.slice(
                F.col("__toks"),
                F.col("chunk_idx") * stride + 1,
                F.lit(chunk_tokens),
            ).alias("__chunk"),
        )
        .select(
            id_col,
            "chunk_idx",
            F.size("__chunk").alias("n_chunk_tokens"),
            F.array_join("__chunk", " ").alias("chunk_text"),
        )
    )
