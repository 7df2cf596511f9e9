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
    # Empty-input verdicts are explicit: an empty release is vacuously
    # k-anonymous (a NULL verdict would read falsy in a compliance
    # gate and block it), counts are 0 not NULL; min_class_size and
    # at_risk_frac stay NULL (genuinely undefined on no classes).
    return classes.agg(
        F.coalesce(F.sum("__c"), F.lit(0)).alias("n_rows"),
        F.count(F.lit(1)).alias("n_classes"),
        F.min("__c").alias("min_class_size"),
        F.lit(int(k)).alias("k"),
        F.coalesce(F.sum(risky), F.lit(0)).alias("n_rows_at_risk"),
        F.round(
            F.sum(risky) / F.sum("__c").cast("double"), decimals
        ).alias("at_risk_frac"),
        F.coalesce(F.min("__c") >= k, F.lit(True)).alias("is_k_anonymous"),
    )


def suppress_small_classes(
    df: DataFrame, quasi_cols: list[str], k: int = 5
) -> DataFrame:
    """The blunt-but-sound enforcement: drop every row whose
    quasi-identifier class holds fewer than ``k`` rows (suppression —
    generalization hierarchies are a caller-side modeling choice).
    Enforcement is one aggregation + one join back onto the rows. The
    surviving-class frame is usually far smaller than the rows, but its
    size is data-dependent (up to n_rows/k classes for near-unique
    quasi-identifiers) — so the join is left UN-hinted and AQE picks
    broadcast only when the frame actually fits, instead of a forced
    broadcast OOMing the driver on a high-cardinality release."""
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
    return df.join(big, on=cond, how="inner").select(*df.columns)


def l_diversity_profile(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    l: int = 2,
    decimals: int = 6,
) -> DataFrame:
    """l-diversity risk profile (Machanavajjhala et al., "l-Diversity:
    Privacy Beyond k-Anonymity", ICDE 2006 / TKDD 2007 — public
    literature): k-anonymity bounds CLASS SIZE, but a class of 50 rows
    that all share one disease still discloses it — l-diversity demands
    every quasi-identifier class carry at least ``l`` DISTINCT
    well-represented sensitive values.

    One row: ``(n_rows, n_classes, min_distinct_sensitive, l,
    n_classes_below, n_rows_at_risk, at_risk_frac, is_l_diverse,
    min_entropy, entropy_l)``

    - ``min_distinct_sensitive`` is the dataset's distinct-l-diversity
      level (min over classes of the count of distinct sensitive
      values); ``is_l_diverse`` checks it against ``l``;
    - ``n_classes_below`` / ``n_rows_at_risk`` count the violating
      classes and the rows inside them;
    - ``min_entropy`` is the minimum over classes of the sensitive
      distribution's Shannon entropy ``−Σ p·ln p`` and ``entropy_l =
      exp(min_entropy)`` — the dataset satisfies ENTROPY l-diversity
      for every l ≤ entropy_l (the paper's stronger variant; a
      49/1 split has 2 distinct values but entropy_l ≈ 1.1).

    Rows with a NULL sensitive value are EXCLUDED up front (they
    disclose nothing and would otherwise deflate per-class entropy);
    quasi-identifier NULLs group as their own level, exactly as in
    :func:`k_anonymity_profile`. Empty input profiles as vacuously
    diverse with explicit zero counts (the k-anonymity posture).

    Scale shape (100 TB): one map-side-combined groupBy at
    (class × sensitive) cell cardinality, one rollup to class
    cardinality, one rollup to the answer row — no joins, no windows
    over raw rows.
    """
    if not quasi_cols:
        raise ValueError("l_diversity_profile needs quasi-identifier columns")
    if sensitive_col in quasi_cols:
        raise ValueError(
            f"sensitive column {sensitive_col!r} cannot also be a "
            "quasi-identifier"
        )
    if l < 2:
        raise ValueError(f"l must be >= 2, got {l}")
    cells = (
        df.filter(F.col(sensitive_col).isNotNull())
        .groupBy(*quasi_cols, sensitive_col)
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    classes = cells.groupBy(*quasi_cols).agg(
        F.sum("__c").alias("__n"),
        F.count(F.lit(1)).alias("__d"),
        # −Σ p ln p expanded as ln(n) − Σ c·ln(c)/n so it folds from
        # the cell counts in one pass without materializing p.
        (
            F.log(F.sum("__c").cast("double"))
            - F.sum(F.col("__c").cast("double") * F.log(F.col("__c").cast("double")))
            / F.sum("__c").cast("double")
        ).alias("__h"),
    )
    below = F.when(F.col("__d") < l, F.col("__n")).otherwise(F.lit(0))
    return classes.agg(
        F.coalesce(F.sum("__n"), F.lit(0)).alias("n_rows"),
        F.count(F.lit(1)).alias("n_classes"),
        F.min("__d").alias("min_distinct_sensitive"),
        F.lit(int(l)).alias("l"),
        F.coalesce(
            F.sum(F.when(F.col("__d") < l, 1).otherwise(0)), F.lit(0)
        ).alias("n_classes_below"),
        F.coalesce(F.sum(below), F.lit(0)).alias("n_rows_at_risk"),
        F.round(F.sum(below) / F.sum("__n").cast("double"), decimals).alias(
            "at_risk_frac"
        ),
        F.coalesce(F.min("__d") >= l, F.lit(True)).alias("is_l_diverse"),
        F.round(F.min("__h"), decimals).alias("min_entropy"),
        F.round(F.exp(F.min("__h")), decimals).alias("entropy_l"),
    )
