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
