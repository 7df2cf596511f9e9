"""Distribution drift detection between dataset snapshots (PSI).

When a training corpus is rebuilt (new crawl, new filters, new month),
the question before shipping is "did the feature distributions move?"
The population stability index is the standard answer:

    PSI = Σ_bins (p_cur − p_ref) · ln(p_cur / p_ref)

with the conventional reading ≤0.1 stable, 0.1–0.25 drifting, >0.25
action required. Two operators:

- :func:`psi_numeric` — bins fitted on the REFERENCE snapshot
  (``equal_frequency_bins``: one quantile-bounds pass), both snapshots
  binned with those SAME bounds (map-only ``bin_by_bounds`` — fitting
  bins per snapshot would hide exactly the drift being measured), one
  count aggregation per side, and the PSI terms computed on the joined
  bin-count frame — answer-scale (n_bins rows) from the first join on.
- :func:`psi_categorical` — same formula over the category domain
  (full-outer join so categories appearing in only one snapshot are
  counted against the epsilon floor, the standard PSI treatment of
  new/vanished categories).

Scale shape (100 TB per snapshot): each snapshot is scanned once for
its count aggregation (map-side combined); everything after is
bin/category-cardinality. Determinism: counts are exact integers and
the PSI arithmetic is the same double expression in any engine, so the
gate hash-matches rounded values rather than asserting a band.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .binning import bin_by_bounds, equal_frequency_bins

#: probability floor for empty bins — the conventional PSI guard that
#: keeps ln() finite when a bin/category is empty on one side.
PSI_EPSILON = 1e-6


def _psi_terms(joined: DataFrame, n_ref: int, cur: DataFrame) -> DataFrame:
    """PSI terms with the CURRENT snapshot's total riding IN-PLAN
    (r12, the kappa/abtest posture): the pre-r12 version ran an eager
    ``cur.count()`` at construction — a serialized driver round trip
    over a corpus-scale snapshot before the caller's action could
    start. The total now rides a broadcast 1-row count frame with a
    raising FILTER (empty current snapshot still fails loudly, at
    action time; the guard row provably evaluates because the caller
    eagerly validated ``ref`` non-empty, so ``joined`` always has at
    least one row). ``cast("double")`` equals the old
    ``float(n_cur)`` exactly for any count below 2^53, and the
    division is the same IEEE expression, so values are
    bit-identical. The reference total stays a Python literal — its
    eager count is the caller's validation and costs nothing extra."""
    cnt_cur = cur.agg(F.count(F.lit(1)).alias("__n_cur"))
    gate = F.when(
        F.col("__n_cur") == 0,
        F.raise_error(
            F.lit("PSI needs non-empty snapshots on both sides")
        ).cast("boolean"),
    ).otherwise(F.lit(True))
    p_ref = F.greatest(
        F.col("n_ref") / F.lit(float(n_ref)), F.lit(PSI_EPSILON)
    )
    p_cur = F.greatest(
        F.col("n_cur") / F.col("__n_cur").cast("double"), F.lit(PSI_EPSILON)
    )
    return (
        joined.crossJoin(F.broadcast(cnt_cur))
        .filter(gate)
        .withColumn("psi_term", (p_cur - p_ref) * F.log(p_cur / p_ref))
        .drop("__n_cur")
    )


def _side_counts(df: DataFrame, key: str, alias: str) -> DataFrame:
    return df.groupBy(key).agg(F.count(F.lit(1)).alias(alias))


def psi_numeric(
    ref: DataFrame,
    cur: DataFrame,
    col: str,
    n_bins: int = 10,
    exact: bool = True,
) -> tuple[DataFrame, list[float]]:
    """Per-bin PSI profile of ``col`` between snapshots. Returns
    (frame(bin, n_ref, n_cur, psi_term), reference_bounds); total PSI
    is ``sum(psi_term)``. Bin bounds come from the REFERENCE only."""
    # Validate the REFERENCE eagerly, BEFORE fitting bins: an empty
    # reference would otherwise die inside equal_frequency_bins with a
    # less specific error, and its count is the PSI denominator anyway.
    # The CURRENT side's count rides in-plan (see _psi_terms) — the
    # eager cur.count() the pre-r12 version ran here was a serialized
    # corpus-scale round trip at construction.
    n_ref = ref.count()
    if n_ref == 0:
        raise ValueError("PSI needs non-empty snapshots on both sides")
    binned_ref, bounds = equal_frequency_bins(ref, col, n_bins, exact=exact)
    binned_cur = bin_by_bounds(cur, col, bounds)
    joined = (
        _side_counts(binned_ref, "bin", "n_ref")
        .join(_side_counts(binned_cur, "bin", "n_cur"), "bin", "full_outer")
        .select(
            "bin",
            F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
        )
    )
    return _psi_terms(joined, n_ref, cur), bounds


def psi_categorical(
    ref: DataFrame, cur: DataFrame, col: str
) -> DataFrame:
    """Per-category PSI profile — full-outer on the category domain so
    one-sided categories hit the epsilon floor instead of vanishing.
    The reference count validates eagerly (and guarantees the in-plan
    cur-side guard a row to evaluate on — see _psi_terms); the current
    snapshot's count rides in-plan."""
    n_ref = ref.count()
    if n_ref == 0:
        raise ValueError("PSI needs non-empty snapshots on both sides")
    joined = (
        _side_counts(ref, col, "n_ref")
        .join(_side_counts(cur, col, "n_cur"), col, "full_outer")
        .select(
            col,
            F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
        )
    )
    return _psi_terms(joined, n_ref, cur)
