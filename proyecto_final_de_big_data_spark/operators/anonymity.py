"""k-anonymity risk profiling — "how many rows are re-identifiable
through their quasi-identifier combination?" The compliance companion
to :mod:`.pii`'s content redaction: PII scrubbing removes direct
identifiers, but a (zip, birth_year, gender)-style quasi-identifier
tuple that only one row carries still pins a person. A release is
k-anonymous when every quasi-identifier equivalence class holds ≥ k
rows.

Scale shape (100 TB): ONE map-side-combined ``groupBy`` over the
quasi-identifier columns (equivalence classes), then the risk rollup
reduces the class-cardinality frame — no self-joins, no windows over
raw rows. NULLs group as their own level (two rows that both lack a
zip code are indistinguishable on it, which is exactly what the
k-anonymity question asks).

Extension surface — the reference has no privacy stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_anonymity_profile(
    df: DataFrame, quasi_cols: list[str], k: int = 5, decimals: int = 6
) -> DataFrame:
    """One row: ``(n_rows, n_classes, min_class_size, k, n_rows_at_risk,
    at_risk_frac, is_k_anonymous)`` — ``n_rows_at_risk`` counts rows in
    equivalence classes smaller than ``k``; ``min_class_size`` IS the
    dataset's k-anonymity level."""
    if not quasi_cols:
        raise ValueError("k_anonymity_profile needs quasi-identifier columns")
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    classes = df.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("__c"))
    risky = F.when(F.col("__c") < k, F.col("__c")).otherwise(F.lit(0))
    return classes.agg(
        F.sum("__c").alias("n_rows"),
        F.count(F.lit(1)).alias("n_classes"),
        F.min("__c").alias("min_class_size"),
        F.lit(int(k)).alias("k"),
        F.sum(risky).alias("n_rows_at_risk"),
        F.round(
            F.sum(risky) / F.sum("__c").cast("double"), decimals
        ).alias("at_risk_frac"),
        (F.min("__c") >= k).alias("is_k_anonymous"),
    )


def suppress_small_classes(
    df: DataFrame, quasi_cols: list[str], k: int = 5
) -> DataFrame:
    """The blunt-but-sound enforcement: drop every row whose
    quasi-identifier class holds fewer than ``k`` rows (suppression —
    generalization hierarchies are a caller-side modeling choice).
    Class sizes broadcast back onto the rows (class count ≪ rows), so
    enforcement is one aggregation + one broadcast join."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    from functools import reduce

    # Distinct join-side names: the class frame derives from df, so
    # joining on same-named columns trips the ambiguous-self-join check.
    big = (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).alias("__c"))
        .filter(F.col("__c") >= k)
        .select(
            *[
                F.col(c).alias(f"__q_{i}")
                for i, c in enumerate(quasi_cols)
            ]
        )
    )
    cond = reduce(
        lambda a, b: a & b,
        [
            F.col(c).eqNullSafe(F.col(f"__q_{i}"))
            for i, c in enumerate(quasi_cols)
        ],
    )
    return df.join(F.broadcast(big), on=cond, how="inner").select(*df.columns)
