"""Temperature-scaled domain/language mixing for training corpora.

The standard multilingual-corpus recipe (e.g. the mBERT/XLM exponential
smoothing): sampling probability per stratum ∝ n_s^alpha with
alpha < 1, which up-weights rare strata relative to their natural
frequency. Normalized so the rarest stratum keeps 100%, the per-row
keep rate for stratum s is (n_s / n_min)^(alpha-1).

Determinism: the keep decision is an exact-integer hash band —
``(key * 2654435761) mod 1_000_000`` (Knuth's multiplicative hash)
compared against ``round(rate * 1e6)`` — so every engine, run, and
partitioning keeps exactly the same rows, and a SQL oracle can restate
the predicate with plain BIGINT arithmetic (no float comparisons on
the row path; the only float op is the one pow() per STRATUM, rounded
to 1e-6 resolution before it ever meets a row).

Scale shape: stratum rates come from one aggregation over the corpus
(map-side combined) and broadcast back; the keep filter is then a pure
projection. One aggregation pass + one broadcast join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_KNUTH = 2654435761
_RESOLUTION = 1_000_000


def hash_band(key_col) -> F.Column:
    """Exact-integer pseudo-uniform band in [0, 1e6) from an integer key."""
    c = F.col(key_col) if isinstance(key_col, str) else key_col
    return (c.cast("long") * F.lit(_KNUTH)) % F.lit(_RESOLUTION)


def temperature_rates(
    df: DataFrame, stratum_col: str, alpha: float = 0.5
) -> DataFrame:
    """Per-stratum keep rates: columns ``(stratum_col, n_docs,
    scaled_rate)`` where scaled_rate = round(1e6 * (n/n_min)^(alpha-1))."""
    counts = df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("n_docs"))
    nmin = counts.agg(F.min("n_docs").alias("n_min"))
    return (
        counts.crossJoin(F.broadcast(nmin))
        .withColumn(
            "scaled_rate",
            F.round(
                F.lit(float(_RESOLUTION))
                * F.pow(F.col("n_docs") / F.col("n_min"), F.lit(alpha - 1.0)),
                0,
            ).cast("long"),
        )
        .drop("n_min")
    )


def temperature_mix(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    alpha: float = 0.5,
) -> DataFrame:
    """Rows of ``df`` surviving temperature-``alpha`` resampling, with
    the stratum's ``n_docs``/``scaled_rate`` columns attached."""
    rates = temperature_rates(df, stratum_col, alpha)
    return df.join(F.broadcast(rates), stratum_col).filter(
        hash_band(key_col) < F.col("scaled_rate")
    )
