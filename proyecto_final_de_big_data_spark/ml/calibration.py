"""Isotonic calibration — fit a monotone step function mapping raw
classifier scores to calibrated probabilities (pool-adjacent-violators
on the empirical per-bucket positive rates), then apply it as a
map-only projection. Completes the :mod:`.evaluation` family: AUC says
how well scores RANK, the lift table says where the volume is, and
calibration makes the scores mean what they say (score 0.8 ⇒ ~80%
positive), which thresholded decisions and expected-value ranking both
need.

Scale shape (100 TB): scores quantize into ``n_buckets`` fixed-width
cells (the :func:`..operators.binning.fixed_width_bucket` primitive —
ONE map-side-combined shuffle). PAV itself is inherently sequential,
but it runs over the ≤n_buckets (count, positives) pairs — an
answer-scale driver computation, the same bounded-collect discipline
as quantile bounds and IVF centroids. The fitted step function ships
back as a literal array indexed by bucket id: applying calibration is
a pure projection, no join, no second shuffle.

Verification stance: pytest-gated (monotonicity, pooling algebra,
weighted-mean exactness, application parity) — PAV's merge loop is a
while-loop over pools, not SQL-expressible for the DuckDB oracle
without a recursive restatement that would just re-implement it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pav_fit(pairs: list[tuple[float, float]]) -> list[float]:
    """Pool-adjacent-violators over ``(weight, mean)`` pairs in
    ascending-score order. Returns the calibrated value per input slot
    (monotone non-decreasing, weighted-mean-exact per pool). Pure
    Python over an answer-scale input."""
    # each pool: [weight, weighted_sum, n_slots]
    pools: list[list[float]] = []
    for w, m in pairs:
        if w <= 0:
            raise ValueError(f"pav_fit needs positive weights, got {w}")
        pools.append([float(w), float(w) * float(m), 1])
        # merge backwards while monotonicity is violated
        while (
            len(pools) >= 2
            and pools[-2][1] / pools[-2][0] > pools[-1][1] / pools[-1][0]
        ):
            cw, cs, cn = pools.pop()
            pools[-1][0] += cw
            pools[-1][1] += cs
            pools[-1][2] += cn
    out: list[float] = []
    for w, s, n in pools:
        out.extend([s / w] * int(n))
    return out


def isotonic_calibrate(
    df: DataFrame,
    score_col: Column | str,
    label_col: Column | str,
    lo: float,
    hi: float,
    n_buckets: int = 256,
    out_col: str = "calibrated",
    decimals: int = 6,
) -> DataFrame:
    """Input rows + ``out_col`` = the PAV-calibrated probability for the
    row's score cell. Rows whose score is NULL/NaN get NULL; empty
    cells between occupied ones inherit the calibration of the nearest
    occupied cell to their LEFT (the step function is right-continuous
    over the score axis), and cells left of the first occupied one take
    the first pool's value.
    """
    from ..operators.binning import fixed_width_bucket

    s = (F.col(score_col) if isinstance(score_col, str) else score_col).cast(
        "double"
    )
    y = (F.col(label_col) if isinstance(label_col, str) else label_col).cast(
        "boolean"
    )
    scored = df.filter(s.isNotNull() & ~F.isnan(s) & y.isNotNull())
    cells = (
        scored.select(fixed_width_bucket(s, lo, hi, n_buckets).alias("b"), y.alias("y"))
        .groupBy("b")
        .agg(
            F.count(F.lit(1)).cast("double").alias("w"),
            F.avg(F.col("y").cast("double")).alias("m"),
        )
        .orderBy("b")
        .collect()
    )
    if not cells:
        raise ValueError(
            "isotonic_calibrate: no scored, labeled rows to fit on"
        )
    fitted = pav_fit([(r["w"], r["m"]) for r in cells])
    # Dense per-bucket lookup: fill gaps from the left, seed from the
    # first occupied cell.
    lookup = [None] * n_buckets
    for r, v in zip(cells, fitted):
        lookup[r["b"]] = round(float(v), decimals)
    first = next(v for v in lookup if v is not None)
    dense: list[float] = []
    prev = first
    for v in lookup:
        prev = v if v is not None else prev
        dense.append(prev)
    cal = F.element_at(
        F.array(*[F.lit(v) for v in dense]),
        fixed_width_bucket(s, lo, hi, n_buckets).cast("int") + 1,
    )
    return df.withColumn(
        out_col,
        F.when(s.isNotNull() & ~F.isnan(s), cal),
    )
