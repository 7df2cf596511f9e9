"""Weight-of-evidence / information value — the credit-scorecard
feature screen: for a categorical feature vs a binary outcome,
``WOE(c) = ln(P(c|pos) / P(c|neg))`` says how strongly level ``c``
separates the classes, and ``IV = Σ_c (P(c|pos) − P(c|neg))·WOE(c)``
ranks whole features (rule of thumb: <0.02 useless, >0.5 suspicious).
The supervised complement of :func:`.stats.categorical_association`'s
symmetric chi²/MI measures.

Scale shape (100 TB): ONE map-side-combined ``groupBy(category)``
whose output is category-cardinality; class totals ride an
unpartitioned window over that post-aggregation frame (never a totals
cross-join re-planning the corpus scan). All inputs to the WOE/IV
arithmetic are exact integer counts, so the only float ops are the
final per-category ratios — a SQL oracle restates them exactly.

Zero cells make WOE ±∞; ``laplace`` > 0 applies the standard additive
smoothing ((n + laplace) / (total + laplace·n_categories)) instead,
and with ``laplace=0`` zero-cell categories yield NULL woe and are
excluded from the feature's IV sum (both choices explicit, never a
silent clamp).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def woe_iv(
    df: DataFrame,
    cat_col: str,
    label_col: Column | str,
    laplace: float = 0.0,
    decimals: int = 6,
) -> DataFrame:
    """``(category, n, n_pos, n_neg, pos_share, neg_share, woe,
    iv_part)`` per level — NULL categories group as their own level
    (they usually carry signal); NULL-label rows are excluded up front
    (they belong to neither class, and keeping them would break
    ``n == n_pos + n_neg``).

    ``iv_part`` is the level's contribution; the feature's IV is
    ``sum(iv_part)`` over the frame (answer-scale).
    """
    if laplace < 0:
        raise ValueError(f"laplace must be >= 0, got {laplace}")
    y = (F.col(label_col) if isinstance(label_col, str) else label_col).cast(
        "boolean"
    )
    per = (
        df.select(F.col(cat_col).alias("category"), y.alias("__y"))
        .filter(F.col("__y").isNotNull())
        .groupBy("category")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("__y").cast("long")).alias("n_pos"),
            F.sum((~F.col("__y")).cast("long")).alias("n_neg"),
        )
    )
    w = Window.partitionBy()
    lap = float(laplace)
    t_pos = F.sum("n_pos").over(w)
    t_neg = F.sum("n_neg").over(w)
    n_cat = F.count(F.lit(1)).over(w)
    pos_share = (F.col("n_pos") + F.lit(lap)) / (
        t_pos + F.lit(lap) * n_cat
    ).cast("double")
    neg_share = (F.col("n_neg") + F.lit(lap)) / (
        t_neg + F.lit(lap) * n_cat
    ).cast("double")
    defined = (pos_share > 0) & (neg_share > 0)
    woe = F.when(defined, F.log(pos_share / neg_share))
    return per.select(
        "category",
        "n",
        "n_pos",
        "n_neg",
        F.round(pos_share, decimals).alias("pos_share"),
        F.round(neg_share, decimals).alias("neg_share"),
        F.round(woe, decimals).alias("woe"),
        F.round(F.when(defined, (pos_share - neg_share) * woe), decimals).alias(
            "iv_part"
        ),
    )
