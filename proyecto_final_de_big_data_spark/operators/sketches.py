"""Mergeable sketches (Apache DataSketches HLL / KLL / Theta).

``approx_count_distinct`` answers one distinct-count question per scan.
What a mart layer actually needs is RE-AGGREGATABLE distinct counts:
build per-partition (per-day, per-source) sketches ONCE, persist them
as ordinary binary columns, and answer any coarser rollup — distinct
users per month, per region, globally — by merging sketches, never
re-scanning the corpus. Plain distinct counts can't do this (distinct
is not summable across partitions); HLL sketches are closed under
union, which is the entire point.

Spark ships the DataSketches HLL family as built-ins (SQL functions
``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``,
JVM-side, codegen-friendly):

- :func:`hll_partials` — ONE corpus scan, one partial+final aggregation
  per fine-grained group, emitting a compact binary sketch per group
  (at lgConfigK=12 each sketch is <= ~2.5 KB regardless of input size).
- :func:`hll_rollup` — any coarser grouping over the PARTIALS frame:
  shuffles sketch rows (group-cardinality, not corpus-cardinality) and
  unions them. 100 TB of events becomes a few thousand KB-sized rows
  the moment partials exist.

Estimates carry the standard HLL error (~1.04/sqrt(2^lgConfigK), about
1.6% at lgConfigK=12); the external gate pins estimate-vs-exact within
a tolerance band, the same stance as ``approx_distinct_contract``.

The same partial/merge shape extends to the other two sketch families
Spark 4.1 ships as JVM built-ins:

- **KLL quantile sketches** (:func:`kll_partials` /
  :func:`kll_rollup`): re-aggregatable PERCENTILES. ``percentile`` /
  ``percentile_approx`` answer one question per corpus scan and their
  outputs cannot be combined across persisted marts (a median of
  medians is not the median); KLL sketches merge losslessly, so
  per-partition partials answer any coarser quantile question at
  sketch-row scale. Normalized rank error at the default k=200 is
  ~1.65% single-level, so a merged p50 lands within a few rank points
  of exact — the gate asserts exactly that, by ranking the estimate
  against the exact CDF.
- **Theta sketches** (:func:`theta_partials` / :func:`theta_rollup` /
  :func:`theta_overlap`): distinct counts under full SET ALGEBRA. HLL
  unions but cannot intersect; Theta supports union, intersection, and
  A-NOT-B, which is what cohort-overlap and retention questions need
  (users active in BOTH periods, customers ordering in 1995 but not
  1996). Below the nominal-entries threshold (default 2^12) the sketch
  is in exact mode and so are all three set operations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_LG_K = 12


def hll_partials(
    df: DataFrame,
    group_cols: list[str] | str,
    value_col: str,
    lg_k: int = DEFAULT_LG_K,
    sketch_col: str = "hll_sketch",
) -> DataFrame:
    """One binary HLL sketch of ``value_col``'s distinct values per
    group — the persistable partial. NULL values are ignored by the
    sketch (matching ``count(DISTINCT x)`` semantics)."""
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    return df.groupBy(*groups).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias(sketch_col)
    )


def hll_rollup(
    partials: DataFrame,
    rollup_cols: list[str] | None,
    sketch_col: str = "hll_sketch",
    estimate_col: str = "distinct_est",
) -> DataFrame:
    """Merge partial sketches up to a coarser grouping (or globally when
    ``rollup_cols`` is None/empty) and return the distinct-count
    estimate per rollup group. Runs entirely at sketch-row scale."""
    merged = F.hll_union_agg(sketch_col, F.lit(True)).alias("__merged")
    if rollup_cols:
        agg = partials.groupBy(*rollup_cols).agg(merged)
        keep = list(rollup_cols)
    else:
        agg = partials.agg(merged)
        keep = []
    return agg.select(
        *keep, F.hll_sketch_estimate("__merged").alias(estimate_col)
    )


def kll_partials(
    df: DataFrame,
    group_cols: list[str] | str,
    value_col: str,
    k: int = 200,
    sketch_col: str = "kll_sketch",
) -> DataFrame:
    """One binary KllDoublesSketch of ``value_col`` per group — the
    persistable quantile partial. ``value_col`` is cast to double (the
    widest KLL variant; bigint/float inputs lose nothing that matters
    for rank queries). ``k`` trades size for accuracy: normalized rank
    error ~1.65% at the default 200, sketch size a few KB regardless of
    input rows."""
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    return df.groupBy(*groups).agg(
        F.kll_sketch_agg_double(
            F.col(value_col).cast("double"), F.lit(k)
        ).alias(sketch_col)
    )


def kll_rollup(
    partials: DataFrame,
    rollup_cols: list[str] | None,
    ranks: list[float],
    sketch_col: str = "kll_sketch",
) -> DataFrame:
    """Merge KLL partials up to a coarser grouping (or globally when
    ``rollup_cols`` is None/empty) and extract the quantile VALUE at
    each requested rank. Output: rollup columns + one ``q_<rank>``
    double per rank (``q_0_5`` for the median — dots can't live in
    column names). Runs entirely at sketch-row scale; merging is
    lossless (the merged sketch answers rank queries with the same
    error bound as a directly-built one)."""
    for r in ranks:
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"ranks must be in [0, 1], got {r}")
    merged = F.kll_merge_agg_double(sketch_col).alias("__merged")
    if rollup_cols:
        agg = partials.groupBy(*rollup_cols).agg(merged)
        keep = list(rollup_cols)
    else:
        agg = partials.agg(merged)
        keep = []
    return agg.select(
        *keep,
        *[
            F.kll_sketch_get_quantile_double("__merged", F.lit(r)).alias(
                "q_" + str(r).replace(".", "_")
            )
            for r in ranks
        ],
    )


def theta_partials(
    df: DataFrame,
    group_cols: list[str] | str,
    value_col: str,
    lg_nom_entries: int = DEFAULT_LG_K,
    sketch_col: str = "theta_sketch",
) -> DataFrame:
    """One binary ThetaSketch of ``value_col``'s distinct values per
    group. Costs ~4× HLL's bytes at the same lg parameter — the price
    of intersect/A-NOT-B support; below 2^lg_nom_entries distinct
    values the sketch (and every set op on it) is exact."""
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    return df.groupBy(*groups).agg(
        F.theta_sketch_agg(value_col, F.lit(lg_nom_entries)).alias(sketch_col)
    )


def theta_rollup(
    partials: DataFrame,
    rollup_cols: list[str] | None,
    sketch_col: str = "theta_sketch",
    estimate_col: str = "distinct_est",
) -> DataFrame:
    """Union-merge Theta partials to a coarser grouping (or globally)
    and return the distinct-count estimate — the Theta twin of
    :func:`hll_rollup`, for partials that also need set algebra."""
    merged = F.theta_union_agg(sketch_col).alias("__merged")
    if rollup_cols:
        agg = partials.groupBy(*rollup_cols).agg(merged)
        keep = list(rollup_cols)
    else:
        agg = partials.agg(merged)
        keep = []
    return agg.select(
        *keep, F.theta_sketch_estimate("__merged").alias(estimate_col)
    )


def theta_overlap(
    partials: DataFrame,
    left: "F.Column",
    right: "F.Column",
    sketch_col: str = "theta_sketch",
) -> DataFrame:
    """Set algebra between two cohorts defined over the PARTIALS frame:
    rows where ``left`` holds form cohort A, rows where ``right`` holds
    form cohort B (a partial row may belong to both, either, or
    neither). Returns ONE row: ``union_est`` / ``intersection_est`` /
    ``left_only_est`` / ``right_only_est``.

    One aggregation over sketch rows: each side union-merges via a
    ``when``-guarded ``theta_union_agg`` (aggregates skip the NULLs the
    guard produces), then the scalar set ops run on the two merged
    sketches. The corpus is never touched — cohort questions cost
    group-cardinality work once partials exist."""
    agg = partials.agg(
        F.theta_union_agg(F.when(left, F.col(sketch_col))).alias("__l"),
        F.theta_union_agg(F.when(right, F.col(sketch_col))).alias("__r"),
    )
    return agg.select(
        F.theta_sketch_estimate(F.theta_union("__l", "__r")).alias("union_est"),
        F.theta_sketch_estimate(
            F.theta_intersection("__l", "__r")
        ).alias("intersection_est"),
        F.theta_sketch_estimate(
            F.theta_difference("__l", "__r")
        ).alias("left_only_est"),
        F.theta_sketch_estimate(
            F.theta_difference("__r", "__l")
        ).alias("right_only_est"),
    )


# ---------------------------------------------------------------------------
# Count-min sketch — re-aggregatable FREQUENCY estimates, as a table.
# ---------------------------------------------------------------------------

CM_DEPTH = 4
CM_WIDTH = 1024


def _cm_bucket(key, d: int, width: int):
    """Row-d bucket of ``key``: 60 bits of md5('<d>:<key>') mod width.
    md5-hex → integer is portable (Spark ``conv(x,16,10)``, DuckDB
    ``CAST('0x'||x AS BIGINT)``), so an external engine rebuilds the
    IDENTICAL table — the gate is an exact hash match, not a bound."""
    salted = F.concat(F.lit(f"{d}:"), key.cast("string"))
    return (
        F.conv(F.substring(F.md5(salted), 1, 15), 16, 10).cast("long")
        % F.lit(width)
    )


def cm_build(
    df: DataFrame,
    key_col: str,
    group_cols: list[str] | None = None,
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
) -> DataFrame:
    """Count-min sketch of ``key_col`` frequencies (optionally one
    sketch per group), materialized as a TABLE of (group…, d, bucket,
    cnt) rows — depth × width rows per group regardless of input size.

    HLL answers distinct-count rollups; count-min answers FREQUENCY
    rollups ("how often does key x appear per month?") with bounded
    memory and no key-cardinality shuffle: the depth-row expansion is
    map-side (Generate), the aggregation is partial+final on (d,
    bucket) — the shuffle carries at most depth·width pre-combined
    rows per task, never one row per distinct key. Point estimates
    read ``min`` over the depth rows (one-sided error: est ≥ true,
    est ≤ true + 2N/width with prob ≥ 1 − 2^−depth per row).

    Merge sketches (months → year) with :func:`cm_merge` — union +
    sum, exactly like the HLL/KLL/Theta partial/rollup pairs."""
    groups = list(group_cols or [])
    rows = df.select(
        *groups,
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(d).alias("d"),
                    _cm_bucket(F.col(key_col), d, width).alias("bucket"),
                )
                for d in range(depth)
            ])
        ).alias("__db"),
    )
    return rows.groupBy(
        *groups, F.col("__db.d").alias("d"), F.col("__db.bucket").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("cnt"))


def cm_merge(cm: DataFrame, group_cols: list[str] | None = None) -> DataFrame:
    """Roll sketches up to coarser groups (or one global sketch):
    group-cardinality × depth × width rows in, sum per (d, bucket)."""
    groups = list(group_cols or [])
    return cm.groupBy(*groups, "d", "bucket").agg(F.sum("cnt").alias("cnt"))


def cm_estimate(
    cm: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
) -> DataFrame:
    """Frequency estimate per key in ``keys``: min over the depth rows.
    The sketch side is depth × width rows — broadcast it; the probe is
    a broadcast join + per-key min, never a corpus scan."""
    probes = keys.select(F.col(key_col)).distinct()
    probe_rows = probes.select(
        key_col,
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(d).alias("d"),
                    _cm_bucket(F.col(key_col), d, width).alias("bucket"),
                )
                for d in range(depth)
            ])
        ).alias("__db"),
    ).select(key_col, F.col("__db.d").alias("d"), F.col("__db.bucket").alias("bucket"))
    joined = probe_rows.join(F.broadcast(cm), ["d", "bucket"], "left")
    return joined.groupBy(key_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cm_est")
    )
