"""K-fold cross-validated linear regression in TWO data passes.

The CV trick that matters at 100 TB: training k fold-models does NOT
require k passes over the data. One ``groupBy(fold)`` collects each
fold's sufficient statistics (n, Σx, Σxx, Σxy, ... — 10 doubles per
fold); the train-side statistics for fold f are then just
``total − fold_f`` (sums are additive), and each fold's OLS solution
falls out of Cramer's rule on its 3×3 normal equations at
k-cardinality — pure arithmetic on an answer-scale frame. A second
pass joins the k coefficient rows back (broadcast) to score every row
against ITS OWN fold's held-out model and aggregates RMSE/MAE per
fold. Two shuffles total, independent of k; the naive loop is k full
train/score cycles.

Fold assignment must be a DETERMINISTIC row expression (e.g.
``pmod(key, k)``) — randomSplit is partitioning-dependent and can
never be hash-verified (see queries/ml_queries.py SURVEY §7 notes).

Cites reference scripts/04_train_sparkml.py:114-151 (the train/eval
loop this generalizes to k folds); the closed-form restatement mirrors
queries/ml_queries.py's ``_OLS_CTE``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def kfold_linear_cv(
    df: DataFrame,
    x1: str,
    x2: str,
    y: str,
    fold: Column,
    k: int,
    decimals: int = 6,
) -> DataFrame:
    """``(fold, n_train, n_test, intercept, b1, b2, rmse, mae)`` — one
    row per fold; the model for fold f is fit on all OTHER folds and
    scored on fold f. Two features + intercept (the 3×3 closed form);
    NULL coefficients/metrics for a singular system (degenerate fold).
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    base = df.select(
        fold.cast("long").alias("fold"),
        F.col(x1).cast("double").alias("x1"),
        F.col(x2).cast("double").alias("x2"),
        F.col(y).cast("double").alias("y"),
    )
    # Complete rows only: count(lit(1)) alongside NULL-skipping sums
    # would feed Cramer's rule an inconsistent system (wrong
    # coefficients, not NULL ones) and over-report fold sizes.
    complete = (
        F.col("x1").isNotNull() & ~F.isnan("x1")
        & F.col("x2").isNotNull() & ~F.isnan("x2")
        & F.col("y").isNotNull() & ~F.isnan("y")
    )
    base = base.filter(complete)
    per_fold = base.groupBy("fold").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x1").alias("sx1"),
        F.sum("x2").alias("sx2"),
        F.sum(F.col("x1") * F.col("x1")).alias("sx11"),
        F.sum(F.col("x1") * F.col("x2")).alias("sx12"),
        F.sum(F.col("x2") * F.col("x2")).alias("sx22"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x1") * F.col("y")).alias("sx1y"),
        F.sum(F.col("x2") * F.col("y")).alias("sx2y"),
    )
    stats = ["n", "sx1", "sx2", "sx11", "sx12", "sx22", "sy", "sx1y", "sx2y"]
    totals = per_fold.agg(
        F.count(F.lit(1)).alias("t_kfolds"),
        *[F.sum(s).alias(f"t_{s}") for s in stats],
    )
    # Fold-expression reconciliation (ADVICE r7): per_fold has one row
    # per DISTINCT fold value, so totals carries the realized fold
    # count for free — a fold expression yielding values outside
    # 0..k-1 or fewer distinct folds than requested would silently run
    # a different CV than asked for. Hard-fail in-plan instead (the
    # lorenz_gini raise_error pattern; no extra action, no extra scan).
    fold_domain_ok = (F.col("fold") >= 0) & (F.col("fold") < k)
    checked_n = F.when(
        (F.col("t_kfolds") == k) & fold_domain_ok, F.col("n")
    ).otherwise(
        F.raise_error(
            F.format_string(
                "kfold_linear_cv: fold expression produced %d distinct "
                "fold(s) (saw fold=%d) but k=%d was requested — use a "
                "deterministic expression covering exactly 0..k-1, e.g. "
                "pmod(key, k)",
                F.col("t_kfolds"),
                F.col("fold"),
                F.lit(k),
            )
        ).cast("double")
    )
    # Train-side statistics for fold f = totals − fold f's partials.
    tr = per_fold.crossJoin(F.broadcast(totals)).select(
        "fold",
        checked_n.alias("n_test_d"),
        *[(F.col(f"t_{s}") - F.col(s)).alias(s) for s in stats],
    )
    n, sx1, sx2 = F.col("n"), F.col("sx1"), F.col("sx2")
    sx11, sx12, sx22 = F.col("sx11"), F.col("sx12"), F.col("sx22")
    sy, sx1y, sx2y = F.col("sy"), F.col("sx1y"), F.col("sx2y")
    # Cramer's rule — written EXACTLY like queries/ml_queries.py's
    # _OLS_CTE so a SQL oracle restates it term for term.
    det = (
        n * (sx11 * sx22 - sx12 * sx12)
        - sx1 * (sx1 * sx22 - sx12 * sx2)
        + sx2 * (sx1 * sx12 - sx11 * sx2)
    )
    det_a = (
        sy * (sx11 * sx22 - sx12 * sx12)
        - sx1 * (sx1y * sx22 - sx12 * sx2y)
        + sx2 * (sx1y * sx12 - sx11 * sx2y)
    )
    det_b1 = (
        n * (sx1y * sx22 - sx2y * sx12)
        - sy * (sx1 * sx22 - sx12 * sx2)
        + sx2 * (sx1 * sx2y - sx1y * sx2)
    )
    det_b2 = (
        n * (sx11 * sx2y - sx12 * sx1y)
        - sx1 * (sx1 * sx2y - sx1y * sx2)
        + sy * (sx1 * sx12 - sx11 * sx2)
    )
    ok = det != 0
    coefs = tr.select(
        "fold",
        n.cast("long").alias("n_train"),
        F.col("n_test_d").cast("long").alias("n_test"),
        F.when(ok, det_a / det).alias("intercept"),
        F.when(ok, det_b1 / det).alias("b1"),
        F.when(ok, det_b2 / det).alias("b2"),
    )
    scored = base.join(F.broadcast(coefs), "fold").withColumn(
        "__resid",
        F.col("y")
        - (
            F.col("intercept")
            + F.col("b1") * F.col("x1")
            + F.col("b2") * F.col("x2")
        ),
    )
    out = scored.groupBy("fold").agg(
        F.first("n_train").alias("n_train"),
        F.first("n_test").alias("n_test"),
        F.first("intercept").alias("__i"),
        F.first("b1").alias("__b1"),
        F.first("b2").alias("__b2"),
        F.sqrt(F.avg(F.col("__resid") * F.col("__resid"))).alias("__rmse"),
        F.avg(F.abs("__resid")).alias("__mae"),
    )
    return out.select(
        "fold",
        "n_train",
        "n_test",
        F.round("__i", decimals).alias("intercept"),
        F.round("__b1", decimals).alias("b1"),
        F.round("__b2", decimals).alias("b2"),
        F.round("__rmse", decimals).alias("rmse"),
        F.round("__mae", decimals).alias("mae"),
    )


def learning_curve_linear(
    df: DataFrame,
    x1: str,
    x2: str,
    y: str,
    slice_col: Column,
    n_slices: int,
    decimals: int = 6,
) -> DataFrame:
    """Learning curve from ONE statistics pass — ``(fraction, n_train,
    n_test, intercept, b1, b2, rmse, mae)``, one row per nested
    training fraction ``(j+1)/n_slices``.

    ``slice_col`` must be a deterministic expression over
    ``0..n_slices`` (inclusive): values ``< n_slices`` are the ordered
    training slices, value ``== n_slices`` is the FIXED held-out test
    set every curve point is scored on (nested-subset design: fraction
    j trains on slices ``0..j``, so each point's training set contains
    the previous one — the textbook learning-curve construction).

    The 100-TB trick mirrors :func:`kfold_linear_cv`: one
    ``groupBy(slice)`` collects per-slice sufficient statistics
    (answer-scale: n_slices+1 rows); nested training statistics are a
    CUMULATIVE window over that tiny frame (sums are additive); every
    curve point solves closed-form (Cramer 3×3) at slice cardinality;
    one scoring pass broadcasts the curve models onto the test rows.
    Two shuffles total, independent of how many curve points you ask
    for — the naive loop refits and rescans per fraction. Degenerate
    (singular) points yield NULL coefficients/metrics.
    """
    if n_slices < 1:
        raise ValueError(f"n_slices must be >= 1, got {n_slices}")
    base = df.select(
        slice_col.cast("long").alias("slc"),
        F.col(x1).cast("double").alias("x1"),
        F.col(x2).cast("double").alias("x2"),
        F.col(y).cast("double").alias("y"),
    )
    complete = (
        F.col("x1").isNotNull() & ~F.isnan("x1")
        & F.col("x2").isNotNull() & ~F.isnan("x2")
        & F.col("y").isNotNull() & ~F.isnan("y")
    )
    base = base.filter(complete)
    per_slice = base.groupBy("slc").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x1").alias("sx1"),
        F.sum("x2").alias("sx2"),
        F.sum(F.col("x1") * F.col("x1")).alias("sx11"),
        F.sum(F.col("x1") * F.col("x2")).alias("sx12"),
        F.sum(F.col("x2") * F.col("x2")).alias("sx22"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x1") * F.col("y")).alias("sx1y"),
        F.sum(F.col("x2") * F.col("y")).alias("sx2y"),
    )
    # In-plan domain check (the kfold reconciliation discipline): the
    # slice expression must cover exactly 0..n_slices, nothing else.
    domain = per_slice.agg(
        F.count(F.lit(1)).alias("t_k"),
        F.min("slc").alias("t_lo"),
        F.max("slc").alias("t_hi"),
    )
    stats = ["n", "sx1", "sx2", "sx11", "sx12", "sx22", "sy", "sx1y", "sx2y"]
    from pyspark.sql import Window

    # Cumulative training statistics over the ordered train slices —
    # a single-partition window over an (n_slices+1)-row frame
    # (answer-scale by construction, the survival/Lorenz grid
    # discipline).
    w_cum = Window.orderBy("slc").rowsBetween(Window.unboundedPreceding, 0)
    train = per_slice.filter(F.col("slc") < n_slices).select(
        "slc", *[F.sum(s).over(w_cum).alias(s) for s in stats]
    )
    test = per_slice.filter(F.col("slc") == n_slices).select(
        F.col("n").alias("n_test_d")
    )
    # The guard must flow through a CONSUMED column (Catalyst prunes a
    # dangling check column away and the raise never fires) — thread
    # it through n, which every Cramer term reads (the kfold
    # checked_n discipline).
    domain_ok = (
        (F.col("t_k") == n_slices + 1)
        & (F.col("t_lo") == 0)
        & (F.col("t_hi") == n_slices)
    )
    checked_n = F.when(domain_ok, F.col("n")).otherwise(
        F.raise_error(
            F.format_string(
                "learning_curve_linear: slice expression produced %d "
                "distinct value(s) spanning [%d, %d] but 0..%d was "
                "required — use a deterministic expression, e.g. "
                "pmod(key, n_slices+1)",
                F.col("t_k"),
                F.col("t_lo"),
                F.col("t_hi"),
                F.lit(n_slices),
            )
        ).cast("double")
    )
    checked = train.crossJoin(F.broadcast(domain)).select(
        "slc",
        checked_n.alias("n"),
        *[F.col(s) for s in stats if s != "n"],
    )
    n, sx1, sx2 = F.col("n"), F.col("sx1"), F.col("sx2")
    sx11, sx12, sx22 = F.col("sx11"), F.col("sx12"), F.col("sx22")
    sy, sx1y, sx2y = F.col("sy"), F.col("sx1y"), F.col("sx2y")
    det = (
        n * (sx11 * sx22 - sx12 * sx12)
        - sx1 * (sx1 * sx22 - sx12 * sx2)
        + sx2 * (sx1 * sx12 - sx11 * sx2)
    )
    det_a = (
        sy * (sx11 * sx22 - sx12 * sx12)
        - sx1 * (sx1y * sx22 - sx12 * sx2y)
        + sx2 * (sx1y * sx12 - sx11 * sx2y)
    )
    det_b1 = (
        n * (sx1y * sx22 - sx2y * sx12)
        - sy * (sx1 * sx22 - sx12 * sx2)
        + sx2 * (sx1 * sx2y - sx1y * sx2)
    )
    det_b2 = (
        n * (sx11 * sx2y - sx12 * sx1y)
        - sx1 * (sx1 * sx2y - sx1y * sx2)
        + sy * (sx1 * sx12 - sx11 * sx2)
    )
    ok = det != 0
    models = checked.select(
        ((F.col("slc") + 1) / F.lit(float(n_slices))).alias("fraction"),
        n.cast("long").alias("n_train"),
        F.when(ok, det_a / det).alias("intercept"),
        F.when(ok, det_b1 / det).alias("b1"),
        F.when(ok, det_b2 / det).alias("b2"),
    )
    test_rows = base.filter(F.col("slc") == n_slices)
    scored = test_rows.crossJoin(F.broadcast(models)).withColumn(
        "__resid",
        F.col("y")
        - (
            F.col("intercept")
            + F.col("b1") * F.col("x1")
            + F.col("b2") * F.col("x2")
        ),
    )
    out = scored.groupBy("fraction").agg(
        F.first("n_train").alias("n_train"),
        F.count(F.lit(1)).alias("n_test"),
        F.first("intercept").alias("__i"),
        F.first("b1").alias("__b1"),
        F.first("b2").alias("__b2"),
        F.sqrt(F.avg(F.col("__resid") * F.col("__resid"))).alias("__rmse"),
        F.avg(F.abs("__resid")).alias("__mae"),
    )
    return out.select(
        F.round("fraction", 6).alias("fraction"),
        "n_train",
        "n_test",
        F.round("__i", decimals).alias("intercept"),
        F.round("__b1", decimals).alias("b1"),
        F.round("__b2", decimals).alias("b2"),
        F.round("__rmse", decimals).alias("rmse"),
        F.round("__mae", decimals).alias("mae"),
    )
