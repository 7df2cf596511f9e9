"""Repetition / quality signals for training-data curation
(Gopher-style "repetitious text" heuristics).

All signals are higher-order-function projections over the token array
— ``array_distinct`` / ``transform`` / ``size`` — so NO shuffle and no
Python is involved: at 100 TB each document is scored inside the scan
stage. This is the scale-correct alternative to the common
explode→groupBy(doc_id) formulation, which shuffles every token of the
corpus just to count duplicates per document.

Extension surface (the reference has no text-quality stage); signal
definitions follow the published Gopher data-quality rules
(duplicate-word and duplicate-n-gram fractions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def words(col: str | Column) -> Column:
    """Whitespace tokens with empties removed (mirrors DuckDB's
    ``list_filter(string_split_regex(text, '\\s+'), w -> len(w) > 0)``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, r"\s+"), lambda t: F.length(t) > 0)


def distinct_word_ratio(words_col: Column) -> Column:
    """|distinct words| / |words|; NULL for an empty token list."""
    return F.when(
        F.size(words_col) > 0,
        F.size(F.array_distinct(words_col)) / F.size(words_col),
    )


def bigrams(words_col: Column) -> Column:
    """Adjacent word pairs as space-joined strings; empty array below 2
    tokens.

    PERF: built as ``zip_with`` of the two shifted slices, NOT as
    ``transform(sequence(...), i -> element_at(words, i))`` — a lambda
    that captures the words expression re-evaluates it PER ELEMENT in
    the interpreted higher-order-function path (the O(words²) hazard
    documented at ``dedup.with_word_shingles``). With a redaction/regex
    chain feeding the words array, the capture formulation measured
    ~90× slower at 5k docs. Here the words expression appears only in
    top-level ``slice``/``size`` arguments; the lambda touches just its
    own element pair.
    """
    n = F.size(words_col)
    return F.when(
        n >= 2,
        F.zip_with(
            F.slice(words_col, 1, n - 1),
            F.slice(words_col, 2, n - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))


def distinct_bigram_ratio(words_col: Column) -> Column:
    """|distinct bigrams| / |bigrams|; 1.0 when there are <2 tokens
    (a one-word doc is trivially non-repetitive at the bigram level)."""
    bi = bigrams(words_col)
    return F.when(
        F.size(bi) > 0, F.size(F.array_distinct(bi)) / F.size(bi)
    ).otherwise(F.lit(1.0))


def with_repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    word_ratio_flag: float = 0.4,
    bigram_ratio_flag: float = 0.6,
) -> DataFrame:
    """Append repetition signals + a boolean ``repetitive`` flag.

    Flag thresholds follow the Gopher paper's shape (a doc dominated by
    repeated words or repeated bigrams is low-quality boilerplate);
    exact values are configurable per corpus.
    """
    w = words(text_col)
    d1 = distinct_word_ratio(w)
    d2 = distinct_bigram_ratio(w)
    return (
        df.withColumn("distinct_word_ratio", d1)
        .withColumn("distinct_bigram_ratio", d2)
        .withColumn(
            "repetitive",
            F.coalesce(
                (F.col("distinct_word_ratio") < word_ratio_flag)
                | (F.col("distinct_bigram_ratio") < bigram_ratio_flag),
                F.lit(False),
            ),
        )
    )
