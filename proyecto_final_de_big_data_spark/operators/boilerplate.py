"""Sub-document boilerplate removal (C4-style repeated-line pruning).

Web-scale corpora repeat navigation chrome, disclaimers, and cookie
banners across thousands of pages; document-level dedup never sees
them. The C4 recipe drops any LINE occurring in three or more
documents. This corpus has no line structure, so the unit is a
fixed-width word segment: documents are cut into ``seg_words``-word
segments, a segment occurring in ``>= max_doc_freq`` distinct documents
is boilerplate, and surviving segments are reassembled in order.

Scale shape: inherently a shuffling operator (global segment frequency
IS a corpus-wide aggregation) — posexplode → two partial+final
aggregations keyed on (doc, segment) and on segment text → one
segment-keyed join back → ordered reassembly via
``array_sort(collect_list(struct(pos, text)))`` (deterministic without
relying on ``collect_list`` order). Everything is built-in expressions;
the shuffled rows carry segments and counts, never whole documents.
The frequency table is filtered BEFORE the join-back, so boilerplate
segments — by definition the hottest join keys — never enter the
shuffle join; surviving keys are bounded at ``max_doc_freq`` rows.

The segment frame feeds two branches (frequency aggregation + the
join-back) and Spark does not unify the duplicate subplans, so
segmentation runs twice per call. At 100 TB the production form
stage-writes the segment table once and reads it for both branches
(the same stance as ``pipelines/curation.py``'s write path);
persisting a corpus-sized intermediate inside a library operator would
pin executor storage the caller never asked for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .quality import words


def _segments(
    df: DataFrame, id_col: str, text_col: str, seg_words: int
) -> tuple[DataFrame, DataFrame]:
    """Shared segmentation core: (segs, dfreq) where ``segs`` is one row
    per (doc, seg_id) with the reassembled ``seg_text`` and ``dfreq`` is
    each distinct segment's corpus-wide document frequency. Both public
    entry points build on this, so the inspection API
    (:func:`segment_frequencies`) always describes exactly what
    :func:`remove_boilerplate` removes."""
    tok = df.select(
        F.col(id_col),
        F.posexplode(words(text_col)).alias("pos", "word"),
    ).withColumn("seg_id", (F.col("pos") / seg_words).cast("int"))
    segs = tok.groupBy(id_col, "seg_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "word"))),
                lambda s: s["word"],
            ),
        ).alias("seg_text")
    )
    dfreq = segs.groupBy("seg_text").agg(
        F.count_distinct(F.col(id_col)).alias("seg_df")
    )
    return segs, dfreq


def segment_frequencies(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seg_words: int = 5,
) -> DataFrame:
    """(doc, segment) rows with each segment's corpus-wide document
    frequency attached. Columns: ``id_col``, ``seg_id``, ``seg_text``,
    ``seg_df``."""
    segs, dfreq = _segments(df, id_col, text_col, seg_words)
    return segs.join(dfreq, "seg_text")


def remove_boilerplate(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seg_words: int = 5,
    max_doc_freq: int = 3,
) -> DataFrame:
    """Documents with boilerplate segments (document frequency >=
    ``max_doc_freq``) removed and the remaining segments rejoined in
    order as ``clean_text``. Documents whose every segment is
    boilerplate survive with an empty ``clean_text`` (visible to
    downstream length filters, rather than silently vanishing).
    """
    segs, dfreq = _segments(df, id_col, text_col, seg_words)
    # Filter the frequency table BEFORE the join-back: boilerplate
    # segments are by definition the hottest join keys (a disclaimer in
    # 10^9 documents is 10^9 rows behind one key) — and they are exactly
    # the rows being discarded. Dropping them on the 1-row-per-segment
    # side first means the hot keys never enter the shuffle join at all;
    # the surviving keys are bounded at max_doc_freq rows each.
    kept = segs.join(
        dfreq.filter(F.col("seg_df") < max_doc_freq).select("seg_text"), "seg_text"
    )
    clean = kept.groupBy(id_col).agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("seg_id", "seg_text"))),
                lambda s: s["seg_text"],
            ),
        ).alias("clean_text")
    )
    return df.join(clean, id_col, "left").withColumn(
        "clean_text", F.coalesce(F.col("clean_text"), F.lit(""))
    )
