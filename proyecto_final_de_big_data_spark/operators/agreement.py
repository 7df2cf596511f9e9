"""Inter-rater agreement: Cohen's kappa (two raters, optional ordinal
weighting) and Fleiss' kappa (fixed panel of n raters) — the QA readout
for labeling pipelines, human or LLM-as-judge: raw percent agreement
flatters imbalanced label sets, kappa subtracts the agreement two
independent raters would reach by chance.

Scale shape: both statistics are closed-form arithmetic over a label
CONTINGENCY, never over row pairs —

- Cohen: ONE groupBy on the (rater_a, rater_b) label pair gives the
  k×k table; marginals, expected agreement and the kappa all reduce at
  cell cardinality (k² rows, k ≤ label alphabet).
- Fleiss: ONE groupBy on (item, label) gives per-item category counts;
  per-item agreement P_i and the chance term are sums over those
  counts, so the whole statistic is two aggregations at
  items×labels cardinality.

Everything is exactly restatable in ANSI SQL; gates hash-match the
kappa itself at 6 decimals. Textbook fixtures (Cohen 1960 / the Fleiss
1971 worked example shape) are pinned in tests/test_agreement.py
independent of the oracle.

Extension surface — the reference has no labeling/evaluation stage
(`/root/reference` computes only descriptive marts, README.md:60-90).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_WEIGHTINGS = {"linear", "quadratic"}


def cohens_kappa(
    df: DataFrame,
    rater_a: str,
    rater_b: str,
    weighting: str | None = None,
) -> DataFrame:
    """One-row Cohen's kappa between two label columns:

    ``(statistic, n_items, n_categories, po, pe, kappa)``

    ``po`` is the (weight-)observed agreement over the contingency
    cells, ``pe`` the chance term summed over the FULL k_a x k_b cross
    product of the marginals — not just observed cells, so a diagonal
    combination the raters never hit still contributes its marginal
    product (the classical definition). ``kappa = (po - pe) /
    (1 - pe)``. With ``weighting`` ("linear" | "quadratic") labels
    must cast to numeric and cell (i, j) carries weight
    ``1 - |i-j|/span`` (squared for quadratic) — Cohen 1968; a
    non-numeric label under weighting raises in-plan. Rows where
    either label is NULL are excluded. ``n_categories`` counts the
    UNION alphabet. Perfect chance agreement (pe = 1) yields NULL
    kappa rather than 0/0.
    """
    if weighting is not None and weighting not in _WEIGHTINGS:
        raise ValueError(
            f"cohens_kappa weighting must be one of {sorted(_WEIGHTINGS)}; "
            f"got {weighting!r}"
        )
    from pyspark.sql.window import Window

    a, b = F.col(rater_a).cast("string"), F.col(rater_b).cast("string")
    ct = (
        df.filter(a.isNotNull() & b.isNotNull())
        .groupBy(a.alias("la"), b.alias("lb"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # Everything below runs at contingency-cell cardinality (k_a*k_b).
    w_all = Window.partitionBy()

    def _weight() -> F.Column:
        """Cell weight over (la, lb); span via whole-frame windows —
        both frames carry the full A alphabet on la and B on lb, so
        least/greatest of the per-column extrema is the union span."""
        if weighting is None:
            return F.when(F.col("la") == F.col("lb"), 1.0).otherwise(0.0)
        # try_cast: under ANSI mode a plain cast on a non-numeric label
        # throws CAST_INVALID_INPUT deep in codegen before the named
        # validation below could fire; NULL propagates instead.
        va = F.col("la").try_cast("double")
        vb = F.col("lb").try_cast("double")
        bad = va.isNull() | vb.isNull()
        lo = F.least(F.min(va).over(w_all), F.min(vb).over(w_all))
        hi = F.greatest(F.max(va).over(w_all), F.max(vb).over(w_all))
        span = F.when(hi > lo, hi - lo)
        dist = F.abs(va - vb) / span
        w = 1.0 - (dist * dist if weighting == "quadratic" else dist)
        return (
            F.when(
                bad,
                F.raise_error(
                    F.lit(
                        "cohens_kappa: weighted kappa needs "
                        "numeric-castable labels"
                    )
                ).cast("double"),
            )
            # diagonal weight is 1 by definition, independent of span —
            # without this branch a single-value alphabet (span NULL)
            # silently NULLs po/pe where the unweighted path returns
            # the documented 1.0/1.0.
            .when(va == vb, F.lit(1.0))
            .otherwise(w)
        )

    po_df = ct.select(
        "la", "lb", "c", _weight().alias("w")
    ).agg(
        F.sum("c").alias("n_items"),
        (F.sum(F.col("w") * F.col("c")) / F.sum("c")).alias("po_raw"),
    )
    rows = ct.groupBy("la").agg(F.sum("c").alias("ra"))
    # nn (the grand total) attaches to the row marginals BEFORE the
    # cross join, where summing ra once per la is exactly n.
    rows = rows.withColumn("nn", F.sum("ra").over(w_all))
    cols = ct.groupBy("lb").agg(F.sum("c").alias("cb"))
    exp_cells = rows.crossJoin(cols)  # k_a x k_b, answer scale
    pe_df = exp_cells.select(
        "la",
        "lb",
        (F.col("ra") * F.col("cb")).alias("rc"),
        _weight().alias("w"),
        "nn",
    ).agg(
        F.size(
            F.array_union(F.collect_set("la"), F.collect_set("lb"))
        ).alias("n_categories"),
        (F.sum(F.col("w") * F.col("rc")) / (F.max("nn") * F.max("nn"))).alias(
            "pe_raw"
        ),
    )
    out = po_df.crossJoin(pe_df)
    po, pe = F.round(F.col("po_raw"), 6), F.round(F.col("pe_raw"), 6)
    kappa = F.when(
        F.col("pe_raw") < 1.0,
        (F.col("po_raw") - F.col("pe_raw")) / (1.0 - F.col("pe_raw")),
    )
    label = "cohen" if weighting is None else f"cohen_{weighting}"
    # Degenerate-input validation stays IN-PLAN (the raise_error posture
    # of modularity/series.py): an empty or all-NULL frame fails loudly
    # at action time instead of silently returning a row of NULLs. The
    # plan stays lazy — the r11 pre-optimization collect+rehydrate here
    # forced a driver round trip per kappa during query CONSTRUCTION
    # (rater_agreement builds two), serializing work the final action
    # now runs concurrently in one job. The guard passes n_items through
    # untouched on the healthy path, so values are bit-identical.
    n_guard = F.when(
        F.col("n_items").isNull() | (F.col("n_items") == 0),
        F.raise_error(
            F.lit(
                f"cohens_kappa: no usable ({rater_a!r}, {rater_b!r}) "
                "label pairs — every row had a NULL label or the frame "
                "is empty"
            )
        ).cast("long"),
    ).otherwise(F.col("n_items"))
    return out.select(
        F.lit(label).alias("statistic"),
        n_guard.alias("n_items"),
        "n_categories",
        po.alias("po"),
        pe.alias("pe"),
        F.round(kappa, 6).alias("kappa"),
    )


def fleiss_kappa(df: DataFrame, item_col: str, label_col: str) -> DataFrame:
    """One-row Fleiss' kappa over a LONG frame (one row per rating):

    ``(statistic, n_items, n_categories, po, pe, kappa)``

    Requires the classical fixed-panel design — every item rated by
    the same number n >= 2 of raters — and raises if rating counts
    differ (a ragged panel silently biases P_i, so it is a caller bug,
    not a degenerate value). NULL labels are excluded BEFORE the
    fixed-panel check: a NULL is a missing rating, and dropping it
    makes the panel ragged loudly rather than skewing the chance term
    silently.
    """
    lab = F.col(label_col).cast("string")
    cnt = (
        df.filter(lab.isNotNull())
        .groupBy(F.col(item_col).alias("it"), lab.alias("lb"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    per_item = cnt.groupBy("it").agg(
        F.sum("c").alias("n_i"), F.sum(F.col("c") * F.col("c")).alias("c2")
    )
    # Answer-scale validation, IN-PLAN (raise_error at action time, the
    # cohens_kappa posture above): one distinct rating count and n >= 2,
    # checked on a 1-row shape frame broadcast onto the P_i reduction —
    # no construction-time collect, the whole statistic stays one lazy
    # plan. n_raters rides the same shape frame; (c2 - n) / (n (n - 1))
    # promotes to double exactly as the old Python-literal arithmetic
    # (both operands are exact small integers), so values are identical.
    shape = per_item.agg(
        F.count_distinct("n_i").alias("__k"),
        F.min("n_i").alias("__lo"),
        F.max("n_i").alias("__hi"),
    )
    n_r = F.when(
        (F.col("__k") != 1) | (F.col("__lo") < 2),
        F.raise_error(
            F.concat(
                F.lit(
                    "fleiss_kappa needs the fixed-panel design: every "
                    "item rated by the same n >= 2 raters; got rating "
                    "counts in ["
                ),
                F.coalesce(F.col("__lo").cast("string"), F.lit("null")),
                F.lit(", "),
                F.coalesce(F.col("__hi").cast("string"), F.lit("null")),
                F.lit("] across items"),
            )
        ).cast("long"),
    ).otherwise(F.col("__lo"))
    # P_i = (sum_j c_ij^2 - n) / (n (n - 1)); Pbar = mean over items.
    p_i = (F.col("c2") - F.col("__n")) / (F.col("__n") * (F.col("__n") - 1))
    pbar = (
        per_item.crossJoin(F.broadcast(shape.select(n_r.alias("__n"))))
        .agg(F.count(F.lit(1)).alias("n_items"), F.avg(p_i).alias("po_raw"))
    )
    # p_j = share of ALL ratings in category j; Pe = sum p_j^2.
    pj = cnt.groupBy("lb").agg(F.sum("c").alias("cj"))
    from pyspark.sql.window import Window

    tot = F.sum("cj").over(Window.partitionBy())
    pe_df = pj.select((F.col("cj") / tot).alias("pj")).agg(
        F.count(F.lit(1)).alias("n_categories"),
        F.sum(F.col("pj") * F.col("pj")).alias("pe_raw"),
    )
    out = pbar.crossJoin(pe_df)
    po, pe = F.col("po_raw"), F.col("pe_raw")
    kappa = F.when(pe < 1.0, (po - pe) / (1.0 - pe))
    return out.select(
        F.lit("fleiss").alias("statistic"),
        "n_items",
        "n_categories",
        F.round(po, 6).alias("po"),
        F.round(pe, 6).alias("pe"),
        F.round(kappa, 6).alias("kappa"),
    )
