"""Market-basket item-pair affinity — "customers who take item A also
take item B", the co-occurrence statistic behind recommendations,
substitution analysis and bundle design. Counts baskets containing
BOTH items of a pair and scores each pair with support, lift and
cosine affinity.

Scale shape (100 TB): pair enumeration is the quadratic hazard — a
basket of b items emits C(b, 2) pairs, so one pathological 100k-item
basket would emit 5e9 rows. The ``max_basket`` cap bounds that
structurally: basket sizes are measured with ONE aggregation and
over-cap baskets are dropped. The drop is observable, not silent —
:func:`basket_size_profile` reports how many baskets a given cap
excludes (run it when choosing the cap; the affinity output itself
carries only the capped population). After the cap, pair counts are a self-join
co-located on the basket key (one shuffle each side) followed by a
pair-keyed aggregation whose output is at most C(max_basket, 2) per
basket. Per-item basket counts ride the same capped frame, and the
scoring join brings them in keyed by item — broadcast-sized whenever
the item dimension is (items, not baskets, drive that dimension).
The grand basket total is a 1-row aggregate crossJoin, the repo's
standard scalar pattern.

Ordering ``item_a < item_b`` canonicalizes pairs so (A,B) and (B,A)
never double-count, and duplicate lines of the same item in one
basket collapse first (distinct) so a basket contributes each pair at
most once — support semantics, not line-count semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def item_pair_affinity(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    max_basket: int = 64,
    min_pair_count: int = 1,
    decimals: int = 6,
) -> DataFrame:
    """``(item_a, item_b, n_both, n_a, n_b, support, lift, cosine)``
    for every canonical item pair co-occurring in at least
    ``min_pair_count`` baskets of size ≤ ``max_basket``. ``support`` =
    n_both / n_baskets, ``lift`` = P(a,b) / (P(a)·P(b)), ``cosine`` =
    n_both / sqrt(n_a·n_b); all over the capped basket population."""
    if max_basket < 2:
        raise ValueError("max_basket must be at least 2")
    items = (
        df.select(
            F.col(basket_col).alias("__basket"), F.col(item_col).alias("__item")
        )
        .distinct()
    )
    sizes = items.groupBy("__basket").agg(F.count(F.lit(1)).alias("__bsize"))
    kept = (
        items.join(sizes, "__basket")
        .where(F.col("__bsize") <= max_basket)
        .select("__basket", "__item")
    )
    n_baskets = kept.select(
        F.count_distinct("__basket").cast("double").alias("__n_baskets")
    )
    item_counts = kept.groupBy(F.col("__item")).agg(
        F.count(F.lit(1)).alias("__n_item")
    )
    left = kept.select("__basket", F.col("__item").alias("item_a"))
    right = kept.select("__basket", F.col("__item").alias("item_b"))
    pairs = (
        left.join(right, "__basket")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
        .where(F.col("n_both") >= min_pair_count)
    )
    scored = (
        pairs.join(
            item_counts.select(
                F.col("__item").alias("item_a"), F.col("__n_item").alias("n_a")
            ),
            "item_a",
        )
        .join(
            item_counts.select(
                F.col("__item").alias("item_b"), F.col("__n_item").alias("n_b")
            ),
            "item_b",
        )
        .crossJoin(n_baskets)
    )
    nb = F.col("n_both").cast("double")
    na = F.col("n_a").cast("double")
    nbb = F.col("n_b").cast("double")
    tot = F.col("__n_baskets")
    return scored.select(
        "item_a",
        "item_b",
        "n_both",
        "n_a",
        "n_b",
        F.round(nb / tot, decimals).alias("support"),
        F.round((nb * tot) / (na * nbb), decimals).alias("lift"),
        F.round(nb / F.sqrt(na * nbb), decimals).alias("cosine"),
    )


def basket_size_profile(
    df: DataFrame, basket_col: str, item_col: str, max_basket: int = 64
) -> DataFrame:
    """Cap-pressure report for :func:`item_pair_affinity`: one row
    ``(n_baskets, n_over_cap, over_cap_frac, max_size, p99_size)`` —
    how much of the population a ``max_basket`` cap would drop. ONE
    distinct + ONE aggregation; run it before choosing the cap."""
    sizes = (
        df.select(
            F.col(basket_col).alias("__basket"),
            F.col(item_col).alias("__item"),
        )
        .distinct()
        .groupBy("__basket")
        .agg(F.count(F.lit(1)).alias("__bsize"))
    )
    return sizes.agg(
        F.count(F.lit(1)).alias("n_baskets"),
        F.sum((F.col("__bsize") > max_basket).cast("long")).alias(
            "n_over_cap"
        ),
        F.round(
            F.avg((F.col("__bsize") > max_basket).cast("double")), 6
        ).alias("over_cap_frac"),
        F.max("__bsize").alias("max_size"),
        F.percentile_approx("__bsize", F.lit(0.99), F.lit(10000)).alias(
            "p99_size"
        ),
    )
