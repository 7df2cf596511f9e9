"""CUSUM change-point detection over per-key series — the
level-shift sibling of :mod:`.anomaly`'s EWMA spike detector: EWMA
flags single outlier points; the two-sided CUSUM accumulates small
persistent drifts until the evidence crosses ``h`` sigmas, which is
what catches a feed whose mean quietly moved 0.5 sigma three weeks ago.

Recursions (Page 1954, standardized form; z_t = (x_t − μ)/σ):

    pos_t = max(0, pos_{t−1} + z_t − k)
    neg_t = min(0, neg_{t−1} + z_t + k)

flag when ``pos_t > h`` or ``neg_t < −h``. μ/σ come from the key's own
series, evaluated as LEFT FOLDS over the sorted array (not
``avg``/``stddev``: aggregate-order-dependent float sums would make
the z-scores — and through the recursion every subsequent state —
irreproducible; the sequential fold has ONE defined operation order a
SQL oracle replays bit-for-bit via ``list_reduce``). σ = 0 degenerates
every z to 0 (a constant series has no change-points).

``baseline_points`` is the SPC Phase-I/Phase-II split: with it set,
μ/σ are fitted on each key's first N sorted points (the in-control
reference window) and the statistic monitors every point against that
baseline — the standard deployment. Without it, μ/σ use the whole
series (retrospective mode): the statistic then measures departure
from series-wide homogeneity, so a mid-series level shift makes BOTH
halves drift away from the pooled mean — alarms before the true
change-point are expected there, not a bug.

Scale shape (100 TB): input is a SERIES frame (key, t, value) — the
caller aggregates raw events onto a grid first, so cardinality is
keys × grid points. One groupBy collects each key's bounded, sorted
array (``max_points`` hard-fail, the :mod:`.sessionize` discipline),
the inherently-sequential recursion is one in-memory fold per key,
embarrassingly parallel across keys; posexplode restores series
cardinality. No window over raw data, no driver state. Honest cost
note (shared with :mod:`.anomaly`): the fold grows an immutable array,
so n points cost O(n²) element copies — fine on monitoring grids,
which is why ``max_points`` defaults to 10_000; aggregate longer
series to a coarser grid first.

Extension surface — the reference has no monitoring stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cusum_changepoints(
    df: DataFrame,
    key_cols: list[str],
    t_col: str,
    value_col: str,
    k: float = 0.5,
    h: float = 5.0,
    baseline_points: int | None = None,
    max_points: int = 10_000,
    decimals: int = 6,
) -> DataFrame:
    """``(*key_cols, t, value, cusum_pos, cusum_neg, is_change)`` per
    input row; ``is_change`` is true while either side's statistic sits
    beyond ``h`` (the alarm condition, not just its first crossing —
    downstream can take the first flagged t per key for the
    change-point estimate)."""
    if not key_cols:
        raise ValueError("cusum_changepoints needs at least one key column")
    if k < 0 or h <= 0:
        raise ValueError(f"need k >= 0 and h > 0, got k={k}, h={h}")
    if baseline_points is not None and baseline_points < 2:
        raise ValueError(
            f"baseline_points must be >= 2, got {baseline_points}"
        )

    from .series import collect_sorted_series

    # NULL/NaN exclusion + the max_points hard-fail live in the shared
    # collector (one poisoned cell would otherwise collapse every
    # z-score, since NaN > 0 holds in Spark's ordering).
    arr = collect_sorted_series(
        df, key_cols, t_col, value_col, max_points, "cusum_changepoints"
    )
    xs = F.transform(F.col("__pts"), lambda e: e["x"])
    # Reference window: the first N sorted points (Phase I), or the
    # whole series in retrospective mode.
    if baseline_points is not None:
        xs = F.slice(xs, 1, int(baseline_points))
    # Moments as sequential folds over the SORTED values: one defined
    # operation order, replayable bit-for-bit by the oracle.
    sx = F.aggregate(xs, F.lit(0.0), lambda acc, x: acc + x)
    sxx = F.aggregate(xs, F.lit(0.0), lambda acc, x: acc + x * x)
    nd = F.size(xs).cast("double")
    mu = sx / nd
    sigma = F.sqrt(F.greatest(sxx / nd - (sx / nd) * (sx / nd), F.lit(0.0)))
    arr = arr.withColumn("__mu", mu).withColumn("__sigma", sigma)

    def z(x):
        return F.when(
            F.col("__sigma") > 0, (x - F.col("__mu")) / F.col("__sigma")
        ).otherwise(F.lit(0.0))
    # One fold carrying both tracks: append struct(pos, neg) per point.
    fold = F.aggregate(
        F.col("__pts"),
        F.expr(
            "CAST(array() AS ARRAY<STRUCT<pos: DOUBLE, neg: DOUBLE>>)"
        ),
        # The empty-accumulator seed rides a lazy CASE (the ewma
        # discipline): element_at(-1) on an empty array is an ANSI
        # runtime error, so it must sit behind the size guard.
        lambda acc, e: F.concat(
            acc,
            F.array(
                F.struct(
                    F.greatest(
                        F.lit(0.0),
                        F.when(F.size(acc) == 0, F.lit(0.0)).otherwise(
                            F.element_at(acc, -1)["pos"]
                        )
                        + z(e["x"])
                        - F.lit(float(k)),
                    ).alias("pos"),
                    F.least(
                        F.lit(0.0),
                        F.when(F.size(acc) == 0, F.lit(0.0)).otherwise(
                            F.element_at(acc, -1)["neg"]
                        )
                        + z(e["x"])
                        + F.lit(float(k)),
                    ).alias("neg"),
                )
            ),
        ),
    )
    return (
        arr.withColumn("__cs", fold)
        .select(
            *key_cols,
            F.posexplode("__pts").alias("__i", "__pt"),
            F.col("__cs"),
        )
        .select(
            *key_cols,
            F.col("__pt.t").alias(t_col),
            F.col("__pt.x").alias(value_col),
            F.round(
                F.element_at("__cs", F.col("__i") + 1)["pos"], decimals
            ).alias("cusum_pos"),
            F.round(
                F.element_at("__cs", F.col("__i") + 1)["neg"], decimals
            ).alias("cusum_neg"),
            (
                (F.element_at("__cs", F.col("__i") + 1)["pos"] > F.lit(float(h)))
                | (
                    F.element_at("__cs", F.col("__i") + 1)["neg"]
                    < F.lit(-float(h))
                )
            ).alias("is_change"),
        )
    )
