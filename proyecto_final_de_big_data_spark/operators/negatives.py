"""Deterministic negative sampling for contrastive / implicit-feedback
training data — "for every user, k items they did NOT interact with"
(the BPR / word2vec negative-sampling data-prep step, public
literature). The naive formulation anti-joins the full user × item
cross product; the RNG formulation (``rand()`` per candidate) is
partitioning-dependent and can never be hash-verified or reproduced
across engines.

Mechanism here: pseudo-random DRAWS, not a cross product. Each user
makes ``k · oversample`` indexed draws; draw ``j`` maps to item index
``md5int(user:salt:j) mod n_items`` (the house portable md5 band —
Spark ``conv(hex,16,10)``, DuckDB ``('0x'||hex)::BIGINT`` — so any
engine replays the exact same draws); draws that hit a positive or a
repeat are discarded and the first ``k`` survivors (by draw order)
win. Work is O(users · k · oversample) + one anti-join against the
positives — the item universe is touched only through its
(dimension-sized) index.

Degenerate coverage is honest: a user whose positives blanket the
item universe gets FEWER than k negatives (there aren't k to give);
raise ``oversample`` when positives cover a large fraction of items.

Scale shape (100 TB): positives anti-join is the only data-scale
shuffle; the item index is a dimension frame (broadcast-sized by the
usual star-schema assumption — it rides one answer-scale window for
the dense index); draws are a map-side explode of the user dimension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _md5_int(col) -> F.Column:
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def hash_negative_samples(
    positives: DataFrame,
    user_col: str,
    item_col: str,
    items: DataFrame,
    k: int = 5,
    oversample: int = 4,
    salt: str = "neg",
) -> DataFrame:
    """``(user, item, draw_rank)`` with ``draw_rank`` 1..≤k per user:
    the first ``k`` distinct non-positive items hit by the user's
    deterministic draw sequence. ``items`` must carry the item
    universe in ``item_col`` (duplicates fine — it is distinct'd)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if oversample < 1:
        raise ValueError(f"oversample must be >= 1, got {oversample}")
    dim = items.select(F.col(item_col).alias("item")).distinct()
    w_idx = Window.orderBy("item")
    idx = dim.select(
        "item", (F.row_number().over(w_idx) - 1).cast("long").alias("__i")
    )
    n_frame = idx.agg(F.count(F.lit(1)).alias("__n"))

    users = positives.select(F.col(user_col).alias("user")).distinct()
    draws = (
        users.crossJoin(F.broadcast(n_frame))
        .select(
            "user",
            "__n",
            F.explode(
                F.sequence(F.lit(1), F.lit(int(k * oversample)))
            ).alias("__j"),
        )
        .select(
            "user",
            "__j",
            F.pmod(
                _md5_int(
                    F.concat_ws(
                        ":", F.col("user").cast("string"),
                        F.lit(salt), F.col("__j").cast("string")
                    )
                ),
                F.col("__n"),
            ).alias("__i"),
        )
    )
    cand = draws.join(idx, "__i").select("user", "item", "__j")
    pos = positives.select(
        F.col(user_col).alias("user"), F.col(item_col).alias("item")
    ).distinct()
    neg = cand.join(pos, ["user", "item"], "left_anti")
    first_hit = neg.groupBy("user", "item").agg(F.min("__j").alias("__mj"))
    w_rank = Window.partitionBy("user").orderBy("__mj")
    return (
        first_hit.withColumn("draw_rank", F.row_number().over(w_rank))
        .filter(F.col("draw_rank") <= k)
        .select("user", "item", "draw_rank")
    )
