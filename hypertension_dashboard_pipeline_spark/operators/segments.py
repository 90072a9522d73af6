"""Sub-document (segment-level) boilerplate removal — C4/RefinedWeb-style
"line dedup" adapted to unstructured text.

Web-scale curation removes *repeated spans* (nav bars, cookie banners,
license blocks) from otherwise-unique documents — dedup at a finer
grain than the whole document.  C4 keys on lines; this corpus has no
line structure (documents are single-line), so the unit is a
fixed-width word segment: position ``i`` covers words
``[i*width, (i+1)*width)`` of the whitespace token stream.  Exact
duplicate documents (and aligned near-duplicates) produce identical
segments at identical positions, so boilerplate shared across >=
``min_df`` documents is caught without any fuzzy matching.

Scale shape (the reason this beats pairwise approaches at 100 TB):

1. segmentize — narrow per-row generator (``sequence`` + ``posexplode``
   over a slice), no shuffle;
2. document-frequency per distinct segment text — ONE shuffle keyed on
   the segment hash, map-side partial-agged (the same inverted-index
   move as dedup_ngram_jaccard); segments with df >= min_df form the
   boilerplate set, typically tiny relative to the corpus;
3. removal — broadcast-anti-join of the boilerplate set against the
   segment stream, then one groupBy(doc_id) to reassemble in position
   order.  No document ever compares against another document.

All expressions are built-in (WholeStageCodegen); Python touches
nothing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import text as tx


def segmentize(docs: DataFrame, text_col: str = "text",
               id_col: str = "doc_id", width: int = 10) -> DataFrame:
    """Explode each document into fixed-width word segments:
    (id, seg_i, seg) with seg = words[seg_i*width : (seg_i+1)*width]
    joined by single spaces.  The final segment may be short."""
    ws = docs.select(id_col, tx.tokens(text_col).alias("_ws"))
    n_segs = F.ceil(F.size("_ws") / F.lit(float(width))).cast("int")
    # sequence(0, -1) would generate a DESCENDING ramp for empty docs;
    # guard so blank text yields no segments (the doc drops out, as the
    # oracle's range(0, 0) does).
    idx = F.when(n_segs > 0, F.sequence(F.lit(0), n_segs - 1)).otherwise(
        F.array().cast("array<int>")
    )
    return (
        ws.select(
            id_col,
            F.posexplode(idx).alias("seg_i", "_i"),
            F.col("_ws"),
        )
        .select(
            id_col,
            "seg_i",
            F.array_join(
                F.slice("_ws", F.col("seg_i") * width + 1, width), " "
            ).alias("seg"),
        )
    )


def boilerplate_segments(segs: DataFrame, id_col: str = "doc_id",
                         min_df: int = 3) -> DataFrame:
    """Distinct segment texts appearing in >= min_df distinct documents.
    One shuffle on seg; the distinct-doc count is exact (segment texts
    repeat within a doc rarely, but correctness shouldn't assume)."""
    return (
        segs.groupBy("seg")
        .agg(F.countDistinct(id_col).alias("seg_df"))
        .filter(F.col("seg_df") >= min_df)
        .select("seg")
    )


def remove_boilerplate(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", width: int = 10,
                       min_df: int = 3) -> DataFrame:
    """Per-document segment accounting after cross-corpus boilerplate
    removal: (id, n_segs, n_boiler, clean_md5) where clean_md5 hashes
    the surviving segments rejoined in original order ('' when every
    segment was boilerplate — md5 of the empty string, never null)."""
    segs = segmentize(docs, text_col, id_col, width)
    boiler = boilerplate_segments(segs, id_col, min_df)
    # no forced broadcast: the boilerplate set is usually tiny, but a
    # template-heavy corpus (10^6 families x >= min_df copies) makes it
    # corpus-sized — AQE picks broadcast-vs-shuffle from the ACTUAL
    # post-aggregation size at runtime, which is the safe call at 100 TB.
    flagged = segs.join(
        boiler.withColumn("_is_boiler", F.lit(True)), "seg", "left"
    )
    kept_in_order: Column = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.when(
                        F.col("_is_boiler").isNull(),
                        F.struct(F.col("seg_i"), F.col("seg")),
                    )
                )
            ),
            lambda s: s.getField("seg"),
        ),
        " ",
    )
    return (
        flagged.groupBy(id_col)
        .agg(
            F.count("*").alias("n_segs"),
            F.count(F.when(F.col("_is_boiler"), 1)).alias("n_boiler"),
            F.md5(kept_in_order).alias("clean_md5"),
        )
    )
