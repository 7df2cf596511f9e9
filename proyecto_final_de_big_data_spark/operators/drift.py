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


def _psi_terms(joined: DataFrame, n_ref: int, n_cur: int) -> DataFrame:
    p_ref = F.greatest(
        F.col("n_ref") / F.lit(float(n_ref)), F.lit(PSI_EPSILON)
    )
    p_cur = F.greatest(
        F.col("n_cur") / F.lit(float(n_cur)), F.lit(PSI_EPSILON)
    )
    return joined.withColumn(
        "psi_term", (p_cur - p_ref) * F.log(p_cur / p_ref)
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
    # Validate BEFORE fitting bins: an empty reference would otherwise
    # die inside equal_frequency_bins with a less specific error. The
    # counts are needed for the PSI terms anyway, so this is no extra
    # work — just reordered.
    n_ref = ref.count()
    n_cur = cur.count()
    if n_ref == 0 or n_cur == 0:
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
    return _psi_terms(joined, n_ref, n_cur), bounds


def psi_categorical(
    ref: DataFrame, cur: DataFrame, col: str
) -> DataFrame:
    """Per-category PSI profile — full-outer on the category domain so
    one-sided categories hit the epsilon floor instead of vanishing."""
    n_ref = ref.count()
    n_cur = cur.count()
    if n_ref == 0 or n_cur == 0:
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
    return _psi_terms(joined, n_ref, n_cur)
