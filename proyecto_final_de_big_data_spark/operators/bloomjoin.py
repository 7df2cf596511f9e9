"""Bloom-filter join pruning — cut the big side's shuffled bytes
BEFORE a selective join ever shuffles them.

The classic distributed-join waste: ``big ⋈ small`` where only a small
fraction of ``big``'s rows have a partner. A plain sort-merge join
shuffles ALL of ``big`` on the key first and discards the misses after
the exchange — at 100 TB that is the dominant cost of the query. The
standard engine answer (Spark's own runtime row-level filters, Trino's
dynamic filtering, the semi-join reduction literature) is to build a
tiny Bloom filter over the small side's keys, broadcast it, and filter
``big`` with a map-only predicate BEFORE the exchange: true matches
always survive (a Bloom filter has NO false negatives), false
positives merely ride along to the join, which eliminates them anyway
— the join's OUTPUT is provably identical, only the shuffled volume
changes.

This module is the explicit, composable variant of that pattern (the
declarative sibling of ``spark.sql.optimizer.runtime.bloomFilter``,
which only fires inside a single query's plan): the bitmap is a plain
``list[int]`` of 64-bit words, so it can be built once and reused
across stages, queries, or even persisted next to a snapshot — the
"pre-computed dynamic filter" posture.

Mechanics, all JVM-side builtins (no UDFs anywhere):

- **Positions** use Kirsch–Mitzenmacher double hashing: two ``xxhash64``
  evaluations per key (``h1 = xxhash64(key)``, ``h2 = xxhash64(key,
  1)``) expand to ``k`` positions ``(h1 + i·h2) mod m`` — provably the
  same asymptotic false-positive rate as k independent hashes, at 2
  hash evaluations instead of k. Both hashes are reduced mod m BEFORE
  the linear combination so the arithmetic never overflows a long
  (ANSI mode would raise); ``h2`` maps to ``1 + (h2 mod (m-1))`` so the
  stride is never 0 (a 0 stride collapses all k probes onto one bit).
- **Build** is ONE aggregation at word cardinality: explode each key
  into its k ``(word, bit-mask)`` pairs, ``groupBy(word)`` +
  ``bit_or(mask)`` — map-side combined, at most ``m/64`` groups. The
  dense bitmap is collected driver-side: ``m/64`` longs (m = 2^20 bits
  → 16 K words → 128 KB), the same bounded-collect discipline as the
  IVF quantizer (similarity_ivf.py) — answer-scale, never data-scale.
- **Prune** is a map-only filter: the bitmap rides into the plan as an
  array literal (broadcast with the task binary), membership is a
  conjunction of k ``element_at(words, pos >> 6) & (1 << (pos & 63))``
  tests — whole-stage-codegen arithmetic, no join, no shuffle, no
  Python.

False-positive rate ≈ ``(1 − e^{−k·n/m})^k`` with n the DISTINCT key
count; the auto-sizer picks ``m = next_pow2(16·n)`` (≈ 0.14% at
k = 5) so the pruned stream is within a whisker of the true semi-join
size.

Scale shape (100 TB): one pass over the SMALL side to build (word-
cardinality shuffle, KB-scale result), one map-only pass over the BIG
side fused into its scan (the predicate sits right behind the parquet
reader, AFTER pushed-down column pruning), and the join that follows
shuffles only survivors. The bitmap is O(small-side keys) bits
regardless of big-side size — the asymmetry that makes the pattern
work at any scale ratio.

**Hashing is TYPE-sensitive** — ``xxhash64(42 :: int)`` differs from
``xxhash64(42 :: bigint)`` — so join-coercible key types must hash
identically or true matches silently vanish. Every key is therefore
cast to a CANONICAL hash type before any probe (integrals → bigint,
float → double), the built filter carries that type
(:class:`BloomBits.key_type`), and :func:`bloom_pruned_join` raises
when the two sides canonicalize differently rather than return an
empty superset.

Extension surface — the reference performs no Spark-layer joins at
all (SURVEY §2.5: its enrichment is driver-side column maps), so this
has no reference analog; extension per SURVEY §8.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Single-bit masks for bit index 0..63 as SIGNED 64-bit longs (bit 63
# is the sign bit). A literal lookup table because Spark's shiftleft()
# only takes a LITERAL shift amount — element_at(_MASKS, bit+1) is the
# codegen-friendly variable shift.
_MASK_WORDS = [1 << i for i in range(63)] + [-(1 << 63)]


def _bit_mask(p: Column) -> Column:
    """``1L << (p & 63)`` via the mask lookup table."""
    return F.element_at(
        F.lit(_MASK_WORDS), p.bitwiseAND(F.lit(63)).cast("int") + F.lit(1)
    )


_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)


def _canonical_hash_type(dtype: T.DataType) -> str:
    """The type a key is cast to before hashing. ``xxhash64`` hashes
    the PHYSICAL representation, so the members of each join-coercible
    numeric family must collapse to one hash type (integrals → bigint,
    float → double) or an int-keyed probe against a bigint-built
    filter would test negative on every true match. Non-numeric types
    hash as themselves."""
    if isinstance(dtype, _INTEGRAL):
        return "bigint"
    if isinstance(dtype, (T.FloatType, T.DoubleType)):
        return "double"
    return dtype.simpleString()


def _validate_params(num_bits: int, num_hashes: int) -> None:
    if num_bits < 64 or (num_bits & (num_bits - 1)) != 0:
        raise ValueError(
            f"num_bits must be a power of two >= 64, got {num_bits}"
        )
    if not (1 <= num_hashes <= 16):
        raise ValueError(f"num_hashes must be in 1..16, got {num_hashes}")


def _positions(key: Column, num_bits: int, num_hashes: int) -> list[Column]:
    """The k probe positions for ``key`` (Kirsch–Mitzenmacher).

    Reduced-mod-first so ``a + i*b`` stays < m·(1 + k) « 2^63 (no ANSI
    long overflow); stride b is in 1..m-1 so probes never collapse.
    """
    m = F.lit(num_bits).cast("long")
    a = F.pmod(F.xxhash64(key), m)
    b = F.pmod(F.xxhash64(key, F.lit(1)), m - F.lit(1)) + F.lit(1)
    return [F.pmod(a + F.lit(i) * b, m) for i in range(num_hashes)]


class BloomBits(NamedTuple):
    """A built Bloom filter: the dense word bitmap PLUS the hash count
    it was built with. Carrying ``num_hashes`` inside the value makes a
    build/probe k mismatch impossible — probing with fewer or more
    hashes than the build silently FORFEITS the no-false-negative
    guarantee, so the probe side must never guess k. ``key_type`` is
    the canonical type the build keys were cast to before hashing
    (see :func:`_canonical_hash_type`); every probe casts to it, so a
    type-coercible build/probe mismatch (int vs bigint) cannot break
    the guarantee either."""

    words: list[int]
    num_hashes: int
    key_type: str = "bigint"


def bloom_build(
    df: DataFrame,
    key_col: str,
    num_bits: int = 1 << 17,
    num_hashes: int = 5,
) -> BloomBits:
    """Dense Bloom bitmap over ``df[key_col]``'s non-NULL keys:
    ``num_bits / 64`` little-endian 64-bit words plus the build's
    ``num_hashes`` (see :class:`BloomBits`).

    ONE word-cardinality aggregation + an answer-scale collect
    (``num_bits/64`` rows). NULL keys are excluded — NULL never equals
    a join key, so pruning them is exactly what the join would do.
    """
    _validate_params(num_bits, num_hashes)
    key_type = _canonical_hash_type(df.schema[key_col].dataType)
    key = F.col(key_col).cast(key_type)
    probes = F.array(
        *[
            F.struct(
                F.shiftright(p, 6).cast("int").alias("word"),
                _bit_mask(p).alias("mask"),
            )
            for p in _positions(key, num_bits, num_hashes)
        ]
    )
    words = (
        df.filter(key.isNotNull())
        .select(F.explode(probes).alias("p"))
        .groupBy(F.col("p.word").alias("word"))
        .agg(F.bit_or("p.mask").alias("bits"))
        .collect()
    )
    dense = [0] * (num_bits // 64)
    for row in words:
        dense[row["word"]] = row["bits"]
    return BloomBits(words=dense, num_hashes=num_hashes, key_type=key_type)


def bloom_might_contain(key: Column, bits: BloomBits) -> Column:
    """Boolean membership test column — a conjunction of the build's k
    codegen bit probes against the ``bits.words`` array literal. The
    probe key is first cast to the build's canonical ``key_type`` so
    an int probe matches a bigint build (xxhash64 is type-sensitive).
    NULL keys — including values the cast cannot represent — test
    False (a NULL key cannot match any join partner)."""
    num_bits = len(bits.words) * 64
    _validate_params(num_bits, bits.num_hashes)
    key = key.cast(bits.key_type)
    arr = F.lit(bits.words)
    test = F.lit(True)
    for p in _positions(key, num_bits, bits.num_hashes):
        word = F.element_at(arr, F.shiftright(p, 6).cast("int") + F.lit(1))
        test = test & (word.bitwiseAND(_bit_mask(p)) != 0)
    return key.isNotNull() & test


def bloom_prune(df: DataFrame, key_col: str, bits: BloomBits) -> DataFrame:
    """``df`` filtered to rows whose ``key_col`` MIGHT be in the
    filter — a map-only superset of the true semi-join (never drops a
    true match; false positives pass through)."""
    return df.filter(bloom_might_contain(F.col(key_col), bits))


def _next_pow2(n: int) -> int:
    return 1 << max(6, (n - 1).bit_length())


def bloom_pruned_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    how: str = "inner",
    num_bits: int | None = None,
    num_hashes: int = 5,
) -> DataFrame:
    """``big ⋈ small`` with the big side Bloom-pruned first — result
    rows are IDENTICAL to the plain join (the join removes the Bloom's
    false positives; true matches always survive the filter), but the
    exchange only carries the survivors.

    ``num_bits=None`` auto-sizes to ``next_pow2(16 · n)`` where n is
    the SMALL side's DISTINCT key count (one count-distinct action;
    the FP formula is in terms of distinct keys, so a duplicate-heavy
    small side must not inflate the bitmap) — ≈0.14% false positives
    at k = 5. ``how`` admits the match-preserving joins (inner /
    left_semi); outer joins would need the big side's non-matches,
    which pruning deliberately drops.
    """
    if how not in ("inner", "left_semi", "leftsemi", "semi"):
        raise ValueError(
            f"bloom_pruned_join supports inner/left_semi, got {how!r} — "
            "outer joins need the big side's non-matching rows, which "
            "pruning drops by design"
        )
    big_t = _canonical_hash_type(big.schema[big_key].dataType)
    small_t = _canonical_hash_type(small.schema[small_key].dataType)
    if big_t != small_t:
        raise ValueError(
            f"bloom_pruned_join key types are not hash-compatible: "
            f"{big_key} canonicalizes to {big_t}, {small_key} to "
            f"{small_t} — cast one side explicitly (xxhash64 is "
            "type-sensitive; a silent mismatch would prune every true "
            "match)"
        )
    if num_bits is None:
        n = small.select(F.countDistinct(small_key)).first()[0]
        num_bits = _next_pow2(16 * max(1, n))
    bits = bloom_build(small, small_key, num_bits, num_hashes)
    pruned = bloom_prune(big, big_key, bits)
    return pruned.join(small, pruned[big_key] == small[small_key], how)
