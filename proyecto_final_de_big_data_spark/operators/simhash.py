"""SimHash near-duplicate detection — 64-bit sign-aggregated token
hashes + banded Hamming candidate search, entirely in built-in
expressions (explode → per-bit sign sums → bit reassembly → 16-bit-chunk
banding → ``bit_count`` Hamming verification).

Scale shape: one explode + one combine-heavy groupBy per corpus for
signatures (shuffle carries 64 ints per doc), then the same
bucket-join pattern as MinHash-LSH for candidates. A pair within
Hamming distance d differs in at most d of the 4 chunks, so any pair
with d < 4 shares ≥1 exact chunk — banding is lossless for d ≤ 3.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_BITS = 64
CHUNKS = 4
CHUNK_BITS = N_BITS // CHUNKS


def simhash_signatures(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, simhash long): majority vote of token-hash bits."""
    tokens = df.select(
        F.col(id_col),
        F.explode(F.filter(F.split(F.col(text_col), r"\s+"), lambda w: F.length(w) > 0)).alias("__tok"),
    ).withColumn("__h", F.xxhash64("__tok"))
    # Per-bit ±1 sums in one aggregation (64 agg exprs, map-side combined).
    bit_sums = tokens.groupBy(id_col).agg(
        *[
            F.sum(F.when(F.shiftright("__h", b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)).alias(f"__b{b}")
            for b in range(N_BITS)
        ]
    )
    sim = None
    for b in range(N_BITS):
        # shiftleft keeps bit 63 JVM-side ((1<<63) overflows a py4j long literal)
        term = F.shiftleft(
            F.when(F.col(f"__b{b}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long")), b
        )
        sim = term if sim is None else sim + term
    return bit_sums.select(F.col(id_col), sim.alias("simhash"))


def simhash_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    signatures: DataFrame | None = None,
) -> DataFrame:
    """Pairs (id_a, id_b, hamming) with Hamming(simhash) <= max_hamming.

    Exact for max_hamming <= 3 via pigeonhole 16-bit chunk banding.
    Pass precomputed (persisted) ``signatures`` to share the signature
    scan with other consumers — signature computation is the dominant
    cost (explode + 64 aggregates), the banding itself is cheap.
    """
    if max_hamming >= CHUNKS:
        raise ValueError(f"banding is lossless only for max_hamming < {CHUNKS}")
    sigs = signatures if signatures is not None else simhash_signatures(df, id_col, text_col)
    banded = sigs.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftrightunsigned("simhash", c * CHUNK_BITS)
                        .bitwiseAND(F.lit((1 << CHUNK_BITS) - 1))
                        .alias("chunk_val"),
                    )
                    for c in range(CHUNKS)
                ]
            )
        ).alias("cb"),
    ).select(id_col, "simhash", "cb.chunk", "cb.chunk_val")

    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.simhash").alias("__sa"),
            F.col("b.simhash").alias("__sb"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", F.bit_count(F.col("__sa").bitwiseXOR(F.col("__sb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
    return pairs
