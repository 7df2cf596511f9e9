"""Sequence packing: assign documents to fixed-token-budget training
chunks the way pretraining data prep actually does it — concatenate the
shard's token stream in a deterministic document order and cut it every
``budget`` tokens, letting documents straddle chunk boundaries.

The assignment is a pure window computation: each document's start
offset is the running token sum before it, its chunk is
``floor(start_offset / budget)``. No iteration, no RNG, engine-portable
(the DuckDB oracle states the same cumulative sum).

Scale notes: the window partitions by a SHARD column (required, not
optional) — a global unpartitioned order would funnel 100 TB through
one task. Shards are independent token streams (per-language, per-file,
or per-hash-band), which is also how a multi-host tokenizer job would
consume them; one shuffle on the shard key, sort within partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def with_pack_chunks(
    df: DataFrame,
    token_col: str | Column,
    budget: int,
    shard_col: str,
    order_col: str,
) -> DataFrame:
    """Adds ``chunk_id`` (the chunk where the doc STARTS), ``chunk_offset``
    (token position within that chunk) and ``n_chunks_spanned`` (how many
    chunks the doc straddles; zero-token docs span 1 by convention).

    ``order_col`` must be unique per shard (a document id) so the
    packing is deterministic under any partitioning.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    tok = F.col(token_col) if isinstance(token_col, str) else token_col
    w = Window.partitionBy(shard_col).orderBy(order_col)
    start = (F.sum(tok).over(w) - tok).alias("__start")
    out = df.withColumn("__start", start)
    end_chunk = F.floor((F.col("__start") + F.greatest(tok, F.lit(1)) - 1) / budget)
    return (
        out.withColumn("chunk_id", F.floor(F.col("__start") / budget))
        .withColumn("chunk_offset", F.col("__start") % budget)
        .withColumn("n_chunks_spanned", end_chunk - F.col("chunk_id") + 1)
        .drop("__start")
    )
