"""Leave-one-out target encoding — replace a high-cardinality
categorical feature with the mean target of its OTHER members:
``enc_i = (Σ_cat y − y_i) / (n_cat − 1)``, optionally blended toward
the global mean with strength ``prior_weight`` (the standard
empirical-Bayes shrink for thin categories). Excluding the row's own
target is what keeps the encoding out of the leakage trap that plain
mean-encoding falls into.

Scale shape (100 TB): ONE ``groupBy(category)`` producing
category-cardinality statistics, broadcast-joined back onto the rows
(categories ≪ rows by assumption — that is why you target-encode
instead of one-hot). The global prior rides an unpartitioned window
over the category frame, never a second corpus scan. No per-category
windows over raw rows (a window partitioned by a hot category is a
skew bomb; the join ships 3 numbers per category instead).

Exactness: pass an integer or DECIMAL target and the per-category
sums are exact and order-independent, so the encoding is bit-stable
across partitionings and restatable by a SQL oracle. A double target
works but its sums are partition-order floats (document the rounding
you can tolerate); the gate uses the decimal path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def target_encode_loo(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    out_col: str = "enc",
    prior_weight: float = 0.0,
    decimals: int = 6,
) -> DataFrame:
    """Input rows + ``out_col``. With ``prior_weight = m``:

        enc_i = (Σ_cat y − y_i + m·μ_global) / (n_cat − 1 + m)

    With ``m = 0``, singleton categories (n_cat = 1) yield NULL — the
    honest answer; give them the prior by setting ``m > 0``. NULL and
    NaN targets contribute to neither sums nor counts, and their rows
    get NULL encodings.
    """
    if prior_weight < 0:
        raise ValueError(f"prior_weight must be >= 0, got {prior_weight}")
    t = F.col(target_col)
    # NaN targets are excluded like NULL ones (ADVICE r7): one NaN in a
    # double target would otherwise poison the category's sum, so EVERY
    # row of that category encodes to NaN. isnan only accepts
    # float/double, so the check rides a double cast (exact for the
    # int/decimal targets the gate uses; NaN only exists for floats).
    t_valid = F.when(t.isNotNull() & ~F.isnan(t.cast("double")), t)
    per = df.groupBy(F.col(cat_col).alias("__cat")).agg(
        F.count(t_valid).alias("__nc"),
        F.sum(t_valid).alias("__sc"),
    )
    w = Window.partitionBy()
    per = per.withColumn(
        "__mu",
        F.sum("__sc").over(w).cast("double") / F.sum("__nc").over(w),
    )
    m = float(prior_weight)
    joined = df.join(
        F.broadcast(per),
        df[cat_col].eqNullSafe(per["__cat"]),
        "left",
    ).drop("__cat")
    denom = F.col("__nc") - 1 + F.lit(m)
    # A NaN-target row gets NULL like a NULL-target row (its own target
    # can't be subtracted out), and since it never entered the sums the
    # LOO denominator for its siblings is already right.
    enc = F.when(
        t.isNotNull() & ~F.isnan(t.cast("double")) & (denom > 0),
        (
            F.col("__sc").cast("double")
            - t.cast("double")
            + F.lit(m) * F.col("__mu")
        )
        / denom,
    )
    return joined.withColumn(out_col, F.round(enc, decimals)).drop(
        "__nc", "__sc", "__mu"
    )
