"""Unicode text normalization (operators/normalize_text.py)."""

from __future__ import annotations

import unicodedata

from pyspark.sql import functions as F

from proyecto_final_de_big_data_spark.operators.normalize_text import (
    collapse_whitespace,
    normalize_text,
    strip_control_chars,
)


def _norm(spark, values, **kwargs):
    df = spark.createDataFrame([(v,) for v in values], "text string")
    return [r["text"] for r in normalize_text(df, "text", **kwargs).collect()]


def test_control_and_zero_width_stripped(spark):
    assert _norm(spark, ["a\x00b\x07c\x7fd"]) == ["abcd"]
    assert _norm(spark, ["a\u200bb\u200cc\u200dd\ufeffe"]) == ["abcde"]
    # tab/newline/CR survive stripping and collapse to single spaces
    assert _norm(spark, ["a\tb\nc\rd"]) == ["a b c d"]


def test_whitespace_collapsed_and_trimmed(spark):
    assert _norm(spark, ["  hello   world \n"]) == ["hello world"]


def test_nfc_composes_combining_sequences(spark):
    decomposed = "cafe\u0301"
    assert _norm(spark, [decomposed]) == [unicodedata.normalize("NFC", decomposed)]
    assert _norm(spark, [decomposed])[0] == "caf\u00e9"


def test_nfc_skipped_when_disabled(spark):
    decomposed = "cafe\u0301"
    assert _norm(spark, [decomposed], nfc=False) == [decomposed]


def test_ascii_fast_path_is_identity_on_clean_text(spark):
    clean = ["plain ascii text", "another line"]
    assert _norm(spark, clean) == clean


def test_null_text_stays_null(spark):
    assert _norm(spark, [None, "x"]) == [None, "x"]


def test_normalize_is_idempotent(spark):
    messy = ["  a\x07  b\u200b  cafe\u0301  ", "x \t y"]
    once = _norm(spark, messy)
    assert _norm(spark, once) == once


def test_out_col_appends_instead_of_replacing(spark):
    df = spark.createDataFrame([("  a  ",)], "text string")
    out = normalize_text(df, "text", out_col="text_norm").collect()[0]
    assert out["text"] == "  a  "
    assert out["text_norm"] == "a"
