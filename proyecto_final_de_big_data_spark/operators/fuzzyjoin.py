"""Blocked fuzzy (edit-distance) join — the entity-resolution /
record-linkage primitive: find pairs of strings within a Levenshtein
distance budget WITHOUT forming all pairs.

Blocking IS part of the operator's contract (the standard ER posture:
Fellegi-Sunter style pipelines declare a blocking key, then compare
within blocks). Candidates form only inside a block, so the cost is
``Σ |block|²`` — the same bounded-quadratic shape as the SemDeDup
cell-pair formation (``operators/semdedup.py``) — and the result is
DETERMINISTIC given the blocking expression: an engine replaying the
same blocking + the same distance predicate produces the identical
pair set, which is what lets the gate hash-match instead of checking
recall.

Scale shape (100 TB of entities): one shuffle of each side on the
block key, per-block equi-join, and the distance filter runs with
Spark's thresholded ``levenshtein(l, r, k)`` (early-exit at k+1 —
O(k·min(len)) per comparison instead of O(len²)). Choose the blocking
expression so blocks stay answer-scale (prefixes, soundex-like codes,
length bands); skewed blocks are AQE skew-join territory.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def edit_distance_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    block_left: Column,
    block_right: Column,
    max_distance: int = 1,
) -> DataFrame:
    """Pairs ``(left_value, right_value, distance)`` with
    ``levenshtein(left_value, right_value) <= max_distance``, formed
    ONLY within matching blocks. Exact self-pairs are the caller's
    concern (filter ``left_value != right_value`` or use
    :func:`edit_distance_self_join`).
    """
    if max_distance < 0:
        raise ValueError(f"max_distance must be >= 0, got {max_distance}")
    l = left.select(
        F.col(left_col).alias("left_value"), block_left.alias("__block")
    )
    r = right.select(
        F.col(right_col).alias("right_value"), block_right.alias("__block")
    )
    # Thresholded levenshtein: returns -1 when the distance exceeds the
    # threshold, after an early-exit scan — never computes the full DP
    # table for far-apart strings.
    dist = F.levenshtein(
        F.col("left_value"), F.col("right_value"), max_distance
    )
    return (
        l.join(r, "__block")
        .withColumn("distance", dist)
        .filter(F.col("distance") >= 0)
        .select("left_value", "right_value", "distance")
    )


def edit_distance_self_join(
    df: DataFrame,
    col: str,
    block: Column,
    max_distance: int = 1,
) -> DataFrame:
    """Within-dataset near-match pairs, each unordered pair once
    (``left_value < right_value``, so exact duplicates and self-pairs
    never appear). The dedup/ER workhorse form."""
    pairs = edit_distance_join(df, df, col, col, block, block, max_distance)
    return pairs.filter(F.col("left_value") < F.col("right_value"))


def multipass_edit_distance_self_join(
    df: DataFrame,
    col: str,
    blocks: list[Column],
    max_distance: int = 1,
) -> DataFrame:
    """PassJoin-style multi-pass blocking: run one blocked self-join per
    blocking expression and take the DISTINCT union of the pairs.

    This is how blocking recovers COMPLETENESS: by the pigeonhole
    principle, a pair within substitution distance k agrees exactly on
    any blocking key whose excluded character zone contains every
    differing position — so k+1 "all characters EXCEPT zone i" passes
    (zones covering the varying region) find every such pair, while
    each pass's blocks stay tiny (names agreeing on everything outside
    a narrow zone). Cost is ``passes × Σ|block|²`` with far smaller
    blocks than any single coarse key; pairs caught by several passes
    dedup in the final ``distinct``.

    For general edit distance (insertions shift positions) the same
    union-of-passes shape applies with segment-slack keys; callers own
    choosing zones that cover where their strings actually vary.
    """
    if not blocks:
        raise ValueError("multipass blocking needs at least one blocking expression")
    out = None
    for b in blocks:
        pairs = edit_distance_self_join(df, col, b, max_distance)
        out = pairs if out is None else out.unionAll(pairs)
    return out.distinct()
