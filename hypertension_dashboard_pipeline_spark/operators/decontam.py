"""Benchmark decontamination: n-gram overlap between a training corpus
and an evaluation/benchmark set (extension surface; no reference
analogue — the LLM-training-data operation of flagging documents that
leak eval content, per the n-gram-overlap protocols published with
GPT-3 (Brown et al. 2020, appendix C) and PaLM).

Shape of the problem at 100 TB: the corpus is huge, the benchmark is
tiny (eval suites are 10^3-10^5 documents). So the scalable plan is
NOT a corpus self-join — it is:

1. build the benchmark's distinct k-gram set (small, typically
   <10^7 rows → broadcast);
2. one narrow pass over corpus (id, shingle) rows with a broadcast
   LEFT SEMI join to count per-document hits;
3. per-document overlap ratio from the hit count and the document's
   own distinct-shingle count.

No corpus-side pair expansion ever exists; the corpus is read once,
shuffled once (the per-doc groupBy), and everything upstream of the
groupBy is a WholeStageCodegen projection. The benchmark side is
re-used across corpora, so callers can persist it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.expressions import round_fixed
from .dedup import exploded_shingles


def benchmark_shingles(benchmark: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", k: int = 3) -> DataFrame:
    """The benchmark's distinct k-gram set — a single ``shingle``
    column, ready to broadcast against any corpus."""
    return (
        exploded_shingles(benchmark, id_col, text_col, k)
        .select("shingle")
        .distinct()
    )


def contamination_scores(corpus: DataFrame, benchmark: DataFrame,
                         id_col: str = "doc_id", text_col: str = "text",
                         k: int = 3, threshold: float = 0.5,
                         scale: int = 6) -> DataFrame:
    """Per-corpus-document contamination against a benchmark set.

    Returns ``(id, n_sh, n_hit, overlap_ratio, contaminated)``: the
    document's distinct k-gram count, how many of those k-grams appear
    anywhere in the benchmark, their ratio, and a 0/1 flag at
    ``threshold``. Documents with fewer than ``k`` tokens have no
    shingles and are absent (nothing to match on — the standard
    protocol skips them).

    The benchmark shingle set is broadcast: eval suites are orders of
    magnitude smaller than training corpora, and a broadcast semi-join
    keeps the corpus scan shuffle-free until the per-doc count.
    """
    bench = benchmark_shingles(benchmark, id_col, text_col, k)
    ex = exploded_shingles(corpus, id_col, text_col, k)
    sizes = ex.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    hits = (
        ex.join(F.broadcast(bench), "shingle", "left_semi")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    return (
        sizes.join(hits, "id", "left")
        .withColumn("n_hit", F.coalesce(F.col("n_hit"), F.lit(0)))
        .withColumn(
            "overlap_ratio",
            round_fixed(F.col("n_hit").cast("double") / F.col("n_sh"), scale),
        )
        .withColumn(
            "contaminated",
            (F.col("overlap_ratio") >= threshold).cast("int"),
        )
    )


def decontaminate(corpus: DataFrame, benchmark: DataFrame,
                  id_col: str = "doc_id", text_col: str = "text",
                  k: int = 3, threshold: float = 0.5) -> DataFrame:
    """Drop corpus documents whose k-gram overlap with the benchmark
    reaches ``threshold`` (plus shingle-less documents are KEPT — they
    cannot be contaminated). Anti-join on the flagged id set, so the
    corpus rows themselves never widen."""
    flagged = (
        contamination_scores(corpus, benchmark, id_col, text_col, k,
                             threshold)
        .filter(F.col("contaminated") == 1)
        .select(F.col("id").alias(id_col))
    )
    return corpus.join(flagged, id_col, "left_anti")
