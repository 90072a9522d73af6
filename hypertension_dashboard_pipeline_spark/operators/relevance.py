"""Lexical relevance scoring (BM25) over the documents table.

The retrieval-side text op every training-data pipeline eventually
needs (mining domain-relevant documents, dedup-aware sampling,
eval-set construction): score documents against a term query with
Okapi BM25 and keep the top-k.

Spark-first shape: corpus statistics (N, total token length, per-term
document frequencies) are ONE small aggregate job whose results are
spliced into the scoring expression as literals — so the scoring scan
itself is a single pass of built-in higher-order functions
(``filter``/``size``), no shuffle, no UDF, and trivially parallel at
100 TB. On a cluster the stats job is the cheap pass (sum/count +
k boolean sums with map-side combine); per-query scoring reads each
row once.

Every arithmetic step is written with the same shape the DuckDB oracle
uses (divide-then-multiply order, explicit 1-b constants), so scores
round-trip exactly at 6 dp.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.expressions import round_fixed
from ..functions.text import tokens


def bm25_topk(docs: DataFrame, query_terms: Sequence[str], k: int = 20,
              k1: float = 1.2, b: float = 0.75, id_col: str = "doc_id",
              text_col: str = "text", scale: int = 6) -> DataFrame:
    """Okapi BM25 top-k for a bag-of-terms query.

    idf uses the standard +1 smoothing, ``ln((N - df + 0.5)/(df + 0.5)
    + 1)`` — always positive, so common terms rank instead of being
    zeroed.  Ties break on ``id_col``; scores are rounded to ``scale``
    before ranking so the rank order is reproducible across engines.
    """
    terms = list(dict.fromkeys(query_terms))  # dedup, keep order
    toks = tokens(F.lower(F.col(text_col)))

    stats = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.size(toks)).alias("total_dl"),
        *[
            F.sum(F.array_contains(toks, t).cast("int")).alias(f"df_{i}")
            for i, t in enumerate(terms)
        ],
    ).first()
    n_docs = stats["n"]
    if not n_docs:
        # Empty corpus: avgdl (and every idf) is 0/0-undefined, so the
        # stats splice has nothing to splice — return the TYPED empty
        # result instead of crashing (the mergeable_quantile_profile
        # empty-input contract, operators/aggregates.py).
        return docs.select(
            F.col(id_col), F.lit(0.0).alias("bm25")
        ).limit(0)
    avgdl = stats["total_dl"] / n_docs
    dfs = [stats[f"df_{i}"] for i in range(len(terms))]

    dl_ratio = F.size(toks) / F.lit(avgdl)
    score = F.lit(0.0)
    for t, df_t in zip(terms, dfs):
        idf = math.log((n_docs - df_t + 0.5) / (df_t + 0.5) + 1.0)
        tf = F.size(F.filter(toks, lambda x: x == F.lit(t)))
        score = score + F.lit(idf) * (
            (tf * F.lit(k1 + 1.0))
            / (tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl_ratio))
        )
    scored = docs.select(
        F.col(id_col), round_fixed(score, scale).alias("bm25")
    )
    return scored.orderBy(F.col("bm25").desc(), F.col(id_col)).limit(k)


def vocab_encode(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text",
                 vocab_size: int = 16) -> DataFrame:
    """Frequency-ranked vocabulary build + integer token encoding —
    the id-ification step in front of any token-based model:
    vocabulary = top ``vocab_size`` tokens by corpus frequency (ties
    by token string), ids 1..vocab_size by rank, everything else the
    UNK id 0.  Output is the exploded (doc, 1-based position, token
    id) form — the shape sequence packing (operators/packing.py)
    consumes.

    Scale shape: the vocabulary is one hash aggregation (map-side
    combined, ≤ |distinct tokens| rows) ranked by a window that runs
    AFTER the orderBy+limit cut — the window sees ``vocab_size`` rows,
    never the corpus, so its single-partition stage is bounded by the
    vocabulary budget, not the data.  Encoding is a broadcast LEFT
    join of that ≤vocab_size-row table against the exploded corpus:
    the corpus never shuffles, the join is map-side, and OOV handling
    is a coalesce — no UDF, no driver loop.
    """
    from pyspark.sql.window import Window

    toks = df.select(
        F.col(id_col),
        F.posexplode(tokens(F.col(text_col))).alias("p", "tok"),
    ).select(id_col, (F.col("p") + 1).alias("pos"), "tok")
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    top = counts.orderBy(F.col("cnt").desc(), "tok").limit(vocab_size)
    vocab = top.select(
        "tok",
        F.row_number()
        .over(Window.orderBy(F.col("cnt").desc(), "tok"))
        .alias("token_id"),
    )
    return toks.join(F.broadcast(vocab), "tok", "left").select(
        id_col,
        "pos",
        F.coalesce(F.col("token_id"), F.lit(0)).alias("token_id"),
    )


def token_entropy(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", scale: int = 6) -> DataFrame:
    """Per-document Shannon entropy of the token distribution (bits):
    ``H = log2(n) − Σ c·log2(c) / n`` over per-token counts ``c`` —
    the numerically stable rearrangement of ``−Σ p·log2(p)`` that
    keeps every aggregated term an integer-weighted ``c·log2(c)``
    (no per-term division before the sum).  Low entropy flags looping
    or template-generated text (complementary to
    ``text_repetition_ratio``, which only sees the single most
    frequent shingle); H = 0 for single-token-vocabulary docs.

    Two map-side-combinable hash aggregations ((id, token) counts,
    then per-id moments) — no arrays through the shuffle, no window.
    Empty documents yield no rows.
    """
    from ..functions.expressions import round_fixed
    from ..functions.text import tokens

    toks = df.select(
        F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("toks")
    ).filter(F.size("toks") > 0)
    cnt = (
        toks.select("id", F.explode("toks").alias("token"))
        .groupBy("id", "token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        cnt.groupBy("id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.sum(F.col("c").cast("double") * F.log2("c")).alias("slc"),
        )
        .select(
            F.col("id").alias(id_col),
            "n_tokens",
            round_fixed(
                F.log2(F.col("n_tokens").cast("double"))
                - F.col("slc") / F.col("n_tokens"),
                scale,
            ).alias("token_entropy"),
        )
    )


def rrf_fuse(lex: DataFrame, sem: DataFrame, lex_score: str = "bm25",
             sem_score: str = "cos_sim", lex_id: str = "doc_id",
             sem_id: str = "vec_id", c: int = 60, k: int = 20,
             scale: int = 6, w_lex: float = 1.0,
             w_sem: float = 1.0) -> DataFrame:
    """Reciprocal-rank fusion of a lexical and a semantic top-N list
    (Cormack et al., SIGIR'09): rrf = w_lex/(c + rank_lex) + w_sem/(c +
    rank_sem) over documents present in BOTH lists, top-k by fused
    score.  The unweighted defaults (w=1) are classic RRF; unequal
    weights tilt the fusion toward the more-trusted leg (the standard
    production knob when one index is known stronger for the query
    class).

    The hybrid-retrieval shape every RAG pipeline runs: each input is
    an already-bounded ranking (top-N from its own index), so the
    row_number windows and the fusion join operate on <= N rows — the
    unpartitioned window is over a bounded relation, never the corpus.
    Ranks are assigned over (ROUNDED score desc, id), the established
    cross-engine-stable order; the fused score is derived purely from
    integer ranks and constant weights (one IEEE divide + multiply +
    add per leg), so it is bit-identical in any engine."""
    from pyspark.sql import Window

    wl = Window.orderBy(F.col(lex_score).desc(), F.col(lex_id))
    ws = Window.orderBy(F.col(sem_score).desc(), F.col(sem_id))
    lr = lex.select(
        F.col(lex_id).alias("doc_id"),
        F.row_number().over(wl).alias("rank_lex"),
    )
    sr = sem.select(
        F.col(sem_id).alias("doc_id"),
        F.row_number().over(ws).alias("rank_sem"),
    )
    fused = lr.join(sr, "doc_id").select(
        "doc_id",
        "rank_lex",
        "rank_sem",
        round_fixed(
            F.lit(float(w_lex)) / (F.lit(c) + F.col("rank_lex"))
            + F.lit(float(w_sem)) / (F.lit(c) + F.col("rank_sem")),
            scale,
        ).alias("rrf"),
    )
    return fused.orderBy(F.col("rrf").desc(), "doc_id").limit(k)
