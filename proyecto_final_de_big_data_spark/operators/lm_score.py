"""Corpus-fit unigram language-model scoring — the CCNet-style quality
signal (Wenzek et al., "CCNet: Extracting high quality monolingual
datasets from web crawl data", 2020 — public literature): score each
document by its negative log-likelihood under a language model fit on
the corpus itself. Documents whose token distribution diverges from the
corpus (gibberish, encoding noise, machine-generated repetition) score
high; fluent in-distribution text scores low. CCNet uses a KenLM 5-gram;
the distribution-friendly, oracle-restatable equivalent here is an
add-one-smoothed unigram model with an explicit OOV bucket:

    p(w) = (c_w + 1) / (N + V + 1)   for w in the top-``vocab_size`` vocab
    p(OOV) = 1 / (N + V + 1)         (i.e. c_w = 0 — one formula covers both)

where N = total occurrences of vocab words and V = |vocab|. The model is
fully determined by the corpus and the single ``vocab_size`` knob, so an
external SQL engine can restate it verbatim (no RNG, no iterative fit).

Scale shape (100 TB corpus):
- FIT: one explode + groupBy(word) — partial (map-side) aggregation
  combines counts before the shuffle, so shuffle volume is bounded by
  vocab × partitions, not token count;
- VOCAB: ``orderBy(count desc, word).limit(K)`` compiles to
  TakeOrderedAndProject — a per-partition top-K plus one K-row merge,
  never a global sort. Ties at the boundary break on the word itself, so
  the vocab is deterministic under any partitioning;
- CONSTANTS (N, V): a 1-row aggregate of the K-row vocab, attached via
  broadcast crossJoin — nothing collects to the driver;
- SCORE: explode + broadcast join on the vocab + groupBy(doc). The join
  never shuffles the corpus; the groupBy's partial aggregation reduces
  each partition to one row per document before the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .quality import words


def unigram_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus-wide token counts ``(word, c)`` over the whitespace
    tokenizer shared with the quality/boilerplate operators."""
    return (
        df.select(F.explode(words(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def unigram_vocab(counts: DataFrame, vocab_size: int) -> DataFrame:
    """The ``vocab_size`` most frequent words (ties broken by the word
    ascending — deterministic under any partitioning). Compiles to
    TakeOrderedAndProject, not a global sort."""
    return counts.orderBy(F.desc("c"), F.asc("word")).limit(vocab_size)


def score_documents(
    df: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """Per-document LM score under the add-one unigram model defined by
    ``vocab`` (a ``(word, c)`` frame, normally ``unigram_vocab``'s
    output). Output: ``id_col``, any ``carry_cols``, ``n_tokens``,
    ``n_oov`` and ``doc_nll`` (mean negative log-likelihood per token,
    natural log). Documents tokenizing to zero words produce no row —
    there is nothing to score (both the Spark and any SQL restatement
    drop them at the explode/unnest).
    """
    carry = list(carry_cols or [])
    consts = vocab.agg(
        F.sum("c").alias("__n_in"), F.count(F.lit(1)).alias("__v")
    )
    toks = df.select(
        F.col(id_col), *[F.col(c) for c in carry], F.explode(words(text_col)).alias("word")
    )
    scored = (
        toks.join(F.broadcast(vocab), "word", "left")
        .crossJoin(F.broadcast(consts))
        # coalesce(c, 0) folds the OOV bucket into the same formula:
        # (0 + 1) / (N + V + 1) is exactly the reserved OOV mass.
        .withColumn(
            "__logp",
            F.log(
                (F.coalesce(F.col("c"), F.lit(0)) + F.lit(1))
                / (F.col("__n_in") + F.col("__v") + F.lit(1))
            ),
        )
    )
    return scored.groupBy(id_col, *carry).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.col("c").isNull().cast("int")).alias("n_oov"),
        (-F.avg("__logp")).alias("doc_nll"),
    )
