"""Benchmark decontamination: flag training documents that share word
n-grams with an evaluation/benchmark set — the standard guard against
test-set leakage into a pretraining corpus.

Shape at 100 TB: the BENCHMARK side is small by construction (eval sets
are KBs–MBs), so its distinct shingle set broadcasts; the corpus side is
a map-only shingle explode joined against that broadcast — the corpus
never shuffles. Only the (tiny) set of overlapping shingle hits moves in
the one groupBy, keyed on doc id. Same inverted-index philosophy as
``operators/dedup.jaccard_pairs_index``, but one side is a constant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import with_word_shingles


def contamination_flags(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    bench_text_col: str | None = None,
    shingle_n: int = 3,
) -> DataFrame:
    """``docs`` plus ``n_contaminated_ngrams`` (distinct word n-grams of
    the doc that appear anywhere in the benchmark) and
    ``is_contaminated`` (any overlap). Documents shorter than
    ``shingle_n`` words shingle to their whole text (exact-match check),
    mirroring the dedup operators' short-doc convention.
    """
    bench_text_col = bench_text_col or text_col
    doc_sh = with_word_shingles(
        docs.select(id_col, text_col), text_col, "__sh", shingle_n
    ).select(F.col(id_col), F.explode("__sh").alias("__shingle"))
    bench_sh = (
        with_word_shingles(
            benchmark.select(bench_text_col), bench_text_col, "__sh", shingle_n
        )
        .select(F.explode("__sh").alias("__shingle"))
        .distinct()
    )
    # Per-doc shingles are already distinct (with_word_shingles), so the
    # post-join count IS the distinct-overlap count.
    overlap = (
        doc_sh.join(F.broadcast(bench_sh), "__shingle")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_contaminated_ngrams"))
    )
    return (
        docs.join(overlap, id_col, "left")
        .withColumn(
            "n_contaminated_ngrams", F.coalesce("n_contaminated_ngrams", F.lit(0))
        )
        .withColumn("is_contaminated", F.col("n_contaminated_ngrams") > 0)
    )
