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


GOPHER_STOP_WORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_flags(
    df: DataFrame,
    text_col: str,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_frac: float = 0.8,
    min_stop_words: int = 2,
    decimals: int = 6,
) -> DataFrame:
    """Per-document Gopher quality-rule signals + pass flags (Rae et
    al. 2021, "Scaling Language Models: ... Gopher", Appendix A —
    public literature): the document-level filters MassiveWeb applied
    before training, each as a measured signal column plus an ``_ok``
    boolean at the paper's default threshold, and ``gopher_pass`` =
    AND of the seven document-shape rules below. (The eighth
    MassiveWeb family — repetition ratios — is covered separately by
    :func:`~.text.with_repetition_stats`; compose both for the full
    Appendix-A filter.)

    Signals: ``n_words`` (whitespace tokens), ``mean_word_len``,
    ``symbol_ratio`` (# and ``...`` occurrences per word),
    ``bullet_line_frac`` / ``ellipsis_line_frac`` (fraction of
    non-blank lines starting with a bullet / ending with an ellipsis),
    ``alpha_word_frac`` (fraction of words containing at least one
    ASCII letter), ``n_stop_words`` (how many of the paper's 8 stop
    words appear). Ratios are NULL on an empty document and every
    ``_ok`` coalesces NULL to False, so ``gopher_pass`` is total.

    Everything is a higher-order-function projection over the token /
    line arrays — NO shuffle, no Python, no explode→groupBy: at 100 TB
    each document is scored inside the scan stage (this module's
    standing scale posture). Counts are integers and each ratio is one
    division, so a SQL oracle restating the same arithmetic matches
    bit-for-bit.

    Extension surface — the reference has no text-quality stage;
    extension per SURVEY §8 alongside this module's repetition rules.
    """
    text = F.col(text_col)
    ws = words(text)
    n_words = F.size(ws)
    sum_len = F.aggregate(
        F.transform(ws, lambda w: F.length(w).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    mean_len = F.when(n_words > 0, sum_len.cast("double") / n_words)
    n_hash = F.length(text) - F.length(F.replace(text, F.lit("#"), F.lit("")))
    # Both ellipsis forms count as symbols — the Unicode '…' too, so
    # the symbol-ratio rule and the ellipsis-line rule (which already
    # matched both) use ONE definition of 'ellipsis'.
    n_ellipsis = F.floor(
        (F.length(text) - F.length(F.replace(text, F.lit("..."), F.lit(""))))
        / F.lit(3)
    ) + (F.length(text) - F.length(F.replace(text, F.lit("…"), F.lit(""))))
    symbol_ratio = F.when(
        n_words > 0, (n_hash + n_ellipsis).cast("double") / n_words
    )
    lines = F.filter(
        F.split(text, "\n"), lambda l: F.length(F.trim(l)) > 0
    )
    n_lines = F.size(lines)
    bullet_frac = F.when(
        n_lines > 0,
        F.size(
            F.filter(
                lines,
                lambda l: F.substring(F.trim(l), 1, 1).isin("-", "*", "•"),
            )
        ).cast("double")
        / n_lines,
    )
    ellipsis_frac = F.when(
        n_lines > 0,
        F.size(
            F.filter(
                lines,
                lambda l: F.trim(l).endswith("...")
                | F.trim(l).endswith("…"),
            )
        ).cast("double")
        / n_lines,
    )
    alpha_frac = F.when(
        n_words > 0,
        F.size(F.filter(ws, lambda w: w.rlike("[A-Za-z]"))).cast("double")
        / n_words,
    )
    n_stop = F.size(
        F.array_intersect(
            F.array_distinct(F.transform(ws, F.lower)),
            F.array(*[F.lit(s) for s in GOPHER_STOP_WORDS]),
        )
    )

    def _ok(cond) -> Column:
        return F.coalesce(cond, F.lit(False))

    out = df.select(
        "*",
        n_words.alias("n_words"),
        F.round(mean_len, decimals).alias("mean_word_len"),
        F.round(symbol_ratio, decimals).alias("symbol_ratio"),
        F.round(bullet_frac, decimals).alias("bullet_line_frac"),
        F.round(ellipsis_frac, decimals).alias("ellipsis_line_frac"),
        F.round(alpha_frac, decimals).alias("alpha_word_frac"),
        n_stop.alias("n_stop_words"),
        _ok(
            (n_words >= min_words) & (n_words <= max_words)
        ).alias("word_count_ok"),
        _ok(
            (mean_len >= min_mean_word_len) & (mean_len <= max_mean_word_len)
        ).alias("mean_word_len_ok"),
        _ok(symbol_ratio <= max_symbol_ratio).alias("symbol_ratio_ok"),
        _ok(bullet_frac <= max_bullet_frac).alias("bullet_ok"),
        _ok(ellipsis_frac <= max_ellipsis_frac).alias("ellipsis_ok"),
        _ok(alpha_frac >= min_alpha_frac).alias("alpha_ok"),
        # _ok here too: size(NULL array) is NULL under ANSI, so a
        # NULL-text row would otherwise carry stop_words_ok = NULL and
        # silently escape a ~stop_words_ok failure count.
        _ok(n_stop >= min_stop_words).alias("stop_words_ok"),
    )
    return out.withColumn(
        "gopher_pass",
        F.col("word_count_ok")
        & F.col("mean_word_len_ok")
        & F.col("symbol_ratio_ok")
        & F.col("bullet_ok")
        & F.col("ellipsis_ok")
        & F.col("alpha_ok")
        & F.col("stop_words_ok"),
    )
