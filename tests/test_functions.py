"""Unit tests for the expression helpers (reference F1-F16 semantics,
including the documented R/Spark divergences in SURVEY.md §2.10)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hypertension_dashboard_pipeline_spark.functions.expressions import (
    flag,
    null_safe_flag,
    recode,
    round_half_even,
    strip_ends,
    trim_chars,
)
from hypertension_dashboard_pipeline_spark.functions import text as tx


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).first()["v"]


def _vals(spark, data, make):
    df = spark.createDataFrame([(x,) for x in data], "x string")
    return [r["v"] for r in df.select(make(F.col("x")).alias("v")).collect()]


def test_trim_chars_strips_embedded_quotes(spark):
    # the reference's '"M"' problem (2_data_importing_cleaning.R:192)
    assert _vals(spark, ['"M"', '""F""', "M", ""], trim_chars) == [
        "M", "F", "M", "",
    ]


def test_strip_ends(spark):
    assert _vals(spark, ['"303"', "ab"], strip_ends) == ["303", ""]


def test_recode_keeps_unmapped(spark):
    out = _vals(spark, ["F", "M", "X"], lambda c: recode(c, {"F": "Female", "M": "Male"}))
    assert out == ["Female", "Male", "X"]


def test_flag_and_null_safe_flag(spark):
    df = spark.createDataFrame([(1.0,), (None,)], "x double")
    rows = df.select(
        flag(F.col("x") > 0).alias("plain"),
        null_safe_flag(F.col("x") > 0).alias("safe"),
    ).collect()
    assert (rows[0]["plain"], rows[0]["safe"]) == (1, 1)
    # NULL condition: both map to 0 in Spark (otherwise-branch), but
    # null_safe_flag documents/guarantees it (SURVEY.md §2.10-1)
    assert (rows[1]["plain"], rows[1]["safe"]) == (0, 0)


def test_round_half_even_matches_r(spark):
    # R round(): half-to-even (SURVEY.md §2.10-3)
    df = spark.createDataFrame([(12.25,), (12.75,), (12.5,)], "x double")
    out = [r["v"] for r in df.select(round_half_even("x", 1).alias("v")).collect()]
    assert out == [12.2, 12.8, 12.5]


def test_tokens_and_counts(spark):
    assert _vals(spark, ["a b  c", "  ", ""], tx.token_count) == [3, 0, 0]


def test_word_shingles_short_doc(spark):
    out = _vals(spark, ["a b", "a b c d"], lambda c: tx.word_shingles(c, 3))
    assert out[0] == []
    assert out[1] == ["a b c", "b c d"]


def test_lang_id_markers(spark):
    out = _vals(
        spark,
        ["the cat and the dog", "el gato y la casa de que", "xyzzy plugh"],
        tx.lang_id,
    )
    assert out == ["en", "es", "und"]


def test_fingerprint_normalizes(spark):
    a, b = _vals(spark, ["Hello,  World!", "hello world"], tx.fingerprint)
    assert a == b


def test_chunk_documents_windows_and_overlap(spark):
    """Chunk boundaries: stride = chunk-overlap, last chunk may be
    short, consecutive chunks share exactly `overlap` tokens, short
    and empty docs yield one chunk."""
    from hypertension_dashboard_pipeline_spark.operators.packing import (
        chunk_documents,
    )

    toks = " ".join(f"t{i}" for i in range(25))  # 25 tokens
    df = spark.createDataFrame(
        [(1, toks), (2, "a b c"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    rows = chunk_documents(
        df, chunk_tokens=10, overlap=2
    ).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for chunks in by_doc.values():
        chunks.sort(key=lambda r: r["chunk_idx"])

    # doc 1: stride 8 → ceil((25-2)/8)=3 chunks: [0..9],[8..17],[16..24]
    c1 = by_doc[1]
    assert [r["n_chunk_tokens"] for r in c1] == [10, 10, 9]
    words = toks.split()
    assert c1[0]["chunk_text"] == " ".join(words[0:10])
    assert c1[1]["chunk_text"] == " ".join(words[8:18])
    assert c1[2]["chunk_text"] == " ".join(words[16:25])
    # consecutive chunks share exactly `overlap` tokens
    assert c1[0]["chunk_text"].split()[-2:] == c1[1]["chunk_text"].split()[:2]

    assert len(by_doc[2]) == 1 and by_doc[2][0]["chunk_text"] == "a b c"
    assert len(by_doc[3]) == 1 and by_doc[3][0]["n_chunk_tokens"] == 0
    # null text: the row is preserved as ONE chunk with null content
    # (null propagates through tokenize/slice/join — same as the SQL
    # oracle's NULL semantics); dropping it is a filter's decision
    assert len(by_doc[4]) == 1
    assert by_doc[4][0]["n_chunk_tokens"] is None
    assert by_doc[4][0]["chunk_text"] is None


def test_chunk_documents_rejects_bad_overlap(spark):
    import pytest

    from hypertension_dashboard_pipeline_spark.operators.packing import (
        chunk_documents,
    )

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, chunk_tokens=8, overlap=8)


def test_bm25_ranking_behavior(spark):
    """BM25 sanity on a hand-built corpus: term-dense short docs rank
    above term-sparse long ones; docs without any query term score 0;
    rarer terms contribute more than common ones."""
    from hypertension_dashboard_pipeline_spark.operators.relevance import (
        bm25_topk,
    )

    docs = spark.createDataFrame(
        [
            (1, "apple apple apple"),            # dense in 'apple'
            (2, "apple banana " + "pad " * 50),  # sparse, long
            (3, "banana banana"),                # only common term
            (4, "cherry pad pad"),               # no query terms
            (5, "apple banana"),                 # both terms, short
        ],
        "doc_id long, text string",
    )
    rows = bm25_topk(docs, ["apple", "banana"], k=5).collect()
    scores = {r["doc_id"]: r["bm25"] for r in rows}
    assert scores[4] == 0.0
    # doc 5 (both terms, short) must beat doc 2 (both terms, diluted)
    assert scores[5] > scores[2]
    # dense-in-term beats single occurrence of the same term
    assert scores[1] > scores[2]
    # ranking is by score desc then id
    ordered = [r["doc_id"] for r in rows]
    assert ordered == sorted(
        scores, key=lambda d: (-scores[d], d)
    )
