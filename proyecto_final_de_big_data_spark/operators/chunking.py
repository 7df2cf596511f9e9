"""Fixed-size document chunking with overlap — the context-window
splitter feeding embedding/indexing/RAG stages (and the retrieval-side
sibling of ``operators/packing.py``, which solves the opposite problem:
concatenating short docs UP to a training context).

Each document becomes ``ceil((n - size) / (size - overlap)) + 1``
chunks of at most ``chunk_size`` whitespace tokens, consecutive chunks
sharing ``overlap`` tokens so no semantic boundary is lost to a hard
cut. Tokenization is the corpus-wide whitespace idiom
(``dedup._split_words`` / the ``string_split_regex`` oracle form), so
chunk token counts agree with every other token-counting operator.

Scale shape (100 TB): map-only — one regex split per document, then a
``sequence``-generate + per-row ``slice``; no shuffle, no window, no
Python. The per-element-recompute hazard documented at
``dedup.with_word_shingles`` (a captured expression re-evaluated per
array element) is avoided the same way: the words array is
materialized into a column, chunk INDICES are exploded first, and the
``slice`` runs once per OUTPUT ROW in a plain projection — work is
O(total output tokens), not O(n_chunks × n_tokens).

Output is exploded (one row per chunk) rather than nested: chunk rows
flow straight into embedding/dedup stages, and parquet row-group
pruning on ``doc_id`` stays effective for point lookups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = 64,
    overlap: int = 8,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Explode ``text_col`` into overlapping fixed-token chunks.

    Returns one row per chunk: ``id_col``, ``chunk_id`` (0-based,
    contiguous per doc), ``chunk_start`` (0-based token offset),
    ``n_tokens`` (≤ chunk_size; the final chunk may be shorter),
    ``chunk_text``, plus any ``keep_cols`` carried through verbatim.

    A document with ≤ ``chunk_size`` tokens (including an empty one)
    yields exactly one chunk — emitting zero rows would silently drop
    the document from every downstream stage.
    """
    if overlap >= chunk_size:
        raise ValueError(
            f"overlap ({overlap}) must be < chunk_size ({chunk_size}); "
            "equal or larger overlap never advances the window"
        )
    stride = chunk_size - overlap
    carried = list(keep_cols or [])

    words = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda w: F.length(w) > 0
    )
    staged = df.select(
        F.col(id_col), *[F.col(c) for c in carried], words.alias("__words")
    ).withColumn("__n", F.size("__words"))
    n_chunks = (
        F.when(F.col("__n") <= chunk_size, F.lit(1))
        .otherwise(
            F.ceil((F.col("__n") - chunk_size) / F.lit(float(stride))) + 1
        )
        .cast("int")
    )
    exploded = staged.withColumn("__nc", n_chunks).select(
        id_col,
        *carried,
        "__words",
        F.explode(F.sequence(F.lit(0), F.col("__nc") - 1)).alias("chunk_id"),
    )
    chunk = F.slice(
        F.col("__words"), F.col("chunk_id") * stride + 1, chunk_size
    )
    return exploded.select(
        id_col,
        *carried,
        "chunk_id",
        (F.col("chunk_id") * stride).cast("int").alias("chunk_start"),
        F.size(chunk).alias("n_tokens"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
    )
