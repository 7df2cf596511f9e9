"""CCNet-style perplexity partitioning — head/middle/tail corpus
splits (Wenzek et al., "CCNet: Extracting high quality monolingual
datasets from web crawl data", LREC 2020 — public literature): score
every document with a language-model NLL, then split EACH LANGUAGE
into equal-frequency buckets of model fit — "head" (lowest
perplexity, most fluent), "middle", "tail". Downstream pipelines keep
head+middle, or sample tail at a reduced rate.

Model: the corpus-fit add-one unigram LM from :mod:`.lm_score`
(CCNet's KenLM 5-gram is not oracle-restatable; the unigram NLL is,
and its ordering is what the bucketing consumes). The FIT is global
(one vocabulary over the corpus — a documented simplification of
CCNet's per-language models; swap in per-language vocab frames if the
corpus mixes scripts so heavily that one vocab drowns minority
languages), the BUCKETING is per language, which is the part CCNet's
head/middle/tail semantics actually require.

NLLs are rounded to 6 decimals BEFORE the quantile fit and the bucket
compare, so bucket membership is ULP-stable across engines (the
house selection-stability posture, cf. :mod:`.dsir`).

Scale shape (100 TB): scoring is :func:`.lm_score.score_documents`'s
explode + broadcast-vocab join + per-doc reduce (no corpus shuffle);
the per-language bucket bounds are ONE exact-percentile aggregation
at language cardinality (answer-scale — languages × 2 doubles),
broadcast back onto the scored frame; bucketing is a map-only
when-chain. ``exact percentile`` matches DuckDB's ``quantile_cont``
definition (the :mod:`.binning` precedent); flip large deployments to
``approx_percentile`` the same way ``equal_frequency_bins`` does.

Extension surface — the reference has no corpus-curation stage;
extension per SURVEY §8 (the bucketed-selection sibling of the DSIR
importance scores and the Gopher rule filters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .lm_score import score_documents, unigram_counts, unigram_vocab

BUCKET_LABELS = ("head", "middle", "tail")


def perplexity_partition(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    vocab_size: int = 500,
    decimals: int = 6,
) -> DataFrame:
    """``(id_col, lang_col, n_tokens, n_oov, nll, bucket)`` per
    document that tokenizes to at least one word (zero-token documents
    produce no row — nothing to score, the :mod:`.lm_score` contract).

    ``bucket`` splits each language at its own NLL terciles:
    ``nll <= q(1/3)`` → head, ``<= q(2/3)`` → middle, else tail —
    left-open/right-closed like :func:`.binning.bin_expr`, ties to the
    better bucket. Languages with fewer than 3 documents still bucket
    consistently (the percentile of a tiny group is defined; most rows
    land in head/middle by the tie rule)."""
    vocab = unigram_vocab(unigram_counts(df, text_col), vocab_size)
    scored = score_documents(
        df, vocab, id_col=id_col, text_col=text_col, carry_cols=[lang_col]
    ).withColumn("nll", F.round(F.col("doc_nll"), decimals))
    third = 1.0 / 3.0
    # NULL-language documents group as their OWN level (the anonymity
    # module's posture): groupBy keeps the NULL key, and the join back
    # is null-safe — a plain equi-join would silently drop every
    # NULL-lang document from the output, violating the every-scored-
    # doc-gets-a-row contract.
    bounds = scored.groupBy(F.col(lang_col).alias("__blang")).agg(
        F.percentile(F.col("nll"), F.lit(third)).alias("__b1"),
        F.percentile(F.col("nll"), F.lit(2.0 * third)).alias("__b2"),
    )
    return (
        scored.join(
            F.broadcast(bounds),
            F.col(lang_col).eqNullSafe(F.col("__blang")),
        )
        .select(
            id_col,
            lang_col,
            "n_tokens",
            "n_oov",
            "nll",
            F.when(F.col("nll") <= F.col("__b1"), F.lit(BUCKET_LABELS[0]))
            .when(F.col("nll") <= F.col("__b2"), F.lit(BUCKET_LABELS[1]))
            .otherwise(F.lit(BUCKET_LABELS[2]))
            .alias("bucket"),
        )
    )
