"""Fellegi–Sunter probabilistic record linkage — scoring blocked
candidate pairs with field-agreement log-likelihood weights (Fellegi &
Sunter, JASA 1969; the frequency-based u estimate follows Winkler's
survey practice — public literature). The decision-theoretic upgrade
of :mod:`.fuzzyjoin`'s distance joins: instead of one string distance,
every compared field contributes evidence —

    agree on field i     ->  w_i  = log2(m_i / u_i)
    disagree on field i  ->  w'_i = log2((1 − m_i) / (1 − u_i))
    missing either side  ->  0      (no comparison, no evidence)

where ``m_i`` = P(agree | true match) (domain knowledge or EM; supplied
here) and ``u_i`` = P(agree | non-match), estimated from value
frequencies: two random records agree on a field with probability
``Σ_v f_v² / N²``. The pair's score is the sum; thresholds split
match / possible (clerical review) / non-match.

Scale shape (100 TB): this module never forms pairs — it SCORES a
candidate frame the caller produced with bounded blocking
(:func:`.fuzzyjoin.multipass_candidates`, :mod:`.setsim`, …), so cost
is Σ|block|², not N². The u estimate is one groupBy per field at
value cardinality reduced to ONE row (answer-scale), broadcast onto
the candidates; scoring is a pure projection (a when-chain per field,
one addition chain) — no shuffle beyond the caller's blocking join.

Extension surface — the reference has no entity-resolution stage;
extension per SURVEY §8, the probabilistic sibling of the
edit-distance and Jaro-Winkler ER joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def estimate_u_probabilities(
    df: DataFrame, field_cols: list[str]
) -> DataFrame:
    """ONE-row frame ``(u_0, …, u_{k-1})`` with the frequency-based
    non-match agreement probability per field: ``u = Σ_v f_v² / N²``
    over the field's non-NULL values. Integer sums — the division is
    the only float op, so a SQL restatement matches bit-for-bit."""
    if not field_cols:
        raise ValueError("estimate_u_probabilities needs field columns")
    parts = []
    for i, c in enumerate(field_cols):
        freq = (
            df.filter(F.col(c).isNotNull())
            .groupBy(c)
            .agg(F.count(F.lit(1)).alias("__f"))
        )
        parts.append(
            freq.agg(
                (
                    F.sum(F.col("__f").cast("double") * F.col("__f"))
                    / (
                        F.sum("__f").cast("double")
                        * F.sum("__f").cast("double")
                    )
                ).alias(f"u_{i}")
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.crossJoin(F.broadcast(p))
    return out


def fellegi_sunter_scores(
    pairs: DataFrame,
    comparisons: list[tuple[str, str]],
    m: list[float],
    u: DataFrame,
    upper: float,
    lower: float,
    decimals: int = 6,
) -> DataFrame:
    """Score every candidate pair: input ``pairs`` plus per-field
    ``gamma_i`` (1 agree / 0 disagree / NULL missing), ``score`` (the
    summed log2 weights, rounded to ``decimals``) and ``match_class``
    ('match' when score >= ``upper``, 'non_match' when <= ``lower``,
    else 'possible').

    ``comparisons`` pairs the left/right column names; ``m`` supplies
    P(agree | match) per field; ``u`` is the one-row frame from
    :func:`estimate_u_probabilities`. Constructing the scorer reads
    that frame ONCE via a bounded eager collect (1 row of K doubles —
    answer scale by construction) both to validate u_i ∈ (0, 1) and to
    inline the values as plan literals, so the scoring projection
    itself carries no join and the u plan never executes twice.
    Weight arithmetic is a fixed-order addition chain so an SQL
    oracle restates it bit-for-bit."""
    if len(comparisons) != len(m):
        raise ValueError(
            f"{len(comparisons)} comparisons but {len(m)} m-probabilities"
        )
    if not comparisons:
        raise ValueError("fellegi_sunter_scores needs at least one comparison")
    for mi in m:
        if not (0.0 < mi < 1.0):
            raise ValueError(f"m probabilities must be in (0, 1); got {mi}")
    if upper < lower:
        raise ValueError(f"upper ({upper}) must be >= lower ({lower})")
    # Degenerate-input guard (the abtest.cuped_mean_ztest constant-
    # covariate posture): a constant comparison field estimates u_i = 1
    # and the disagreement weight log2((1-m)/(1-u)) divides by zero —
    # raise the friendly error here instead of a raw ANSI
    # DIVIDE_BY_ZERO mid-job. The u frame is one row (answer scale),
    # so the readout collect is bounded by construction; the collected
    # doubles are then inlined as literals below, so u's plan runs
    # exactly once (no second evaluation via a crossJoin).
    u_rows = u.collect()
    if len(u_rows) != 1:
        raise ValueError(
            f"fellegi_sunter_scores: u frame must have exactly 1 row, "
            f"got {len(u_rows)}"
        )
    for i, (lc, rc) in enumerate(comparisons):
        ui_val = u_rows[0][f"u_{i}"]
        if ui_val is None or not (0.0 < ui_val < 1.0):
            raise ValueError(
                f"fellegi_sunter_scores: u_{i} ({lc}~{rc}) = {ui_val} is "
                f"outside (0, 1); a constant (or all-NULL) comparison "
                f"field carries no linkage signal — drop it from "
                f"`comparisons`"
            )

    scored = pairs
    score: Column | None = None
    gammas = []
    for i, ((lc, rc), mi) in enumerate(zip(comparisons, m)):
        li, ri = F.col(lc), F.col(rc)
        # The validated double from the 1-row readout, as a plan
        # literal — bit-identical to the broadcast-column form (same
        # IEEE value feeding the same expression tree).
        ui = F.lit(float(u_rows[0][f"u_{i}"]))
        w_agree = F.log2(F.lit(float(mi)) / ui)
        w_dis = F.log2(F.lit(1.0 - float(mi)) / (F.lit(1.0) - ui))
        gamma = F.when(li.isNull() | ri.isNull(), F.lit(None).cast("int")) \
            .when(li == ri, F.lit(1)).otherwise(F.lit(0))
        gammas.append(gamma.alias(f"gamma_{i}"))
        term = (
            F.when(li.isNull() | ri.isNull(), F.lit(0.0))
            .when(li == ri, w_agree)
            .otherwise(w_dis)
        )
        score = term if score is None else score + term
    out = scored.select(
        *pairs.columns,
        *gammas,
        F.round(score, decimals).alias("score"),
    )
    return out.withColumn(
        "match_class",
        F.when(F.col("score") >= F.lit(float(upper)), F.lit("match"))
        .when(F.col("score") <= F.lit(float(lower)), F.lit("non_match"))
        .otherwise(F.lit("possible")),
    )


def blocking_profile(
    df: DataFrame,
    block_cols: list[str],
    max_block: int = 1000,
    decimals: int = 6,
) -> DataFrame:
    """Blocking-quality sizing report for an ER/linkage candidate join
    (Christen, "Data Matching", 2012, ch. 4 — public literature): the
    readout you run BEFORE :func:`fellegi_sunter_scores` or any
    blocked fuzzy join, because the candidate cost is Σ C(|b|, 2) and
    one runaway block turns a bounded-quadratic plan into an O(N²)
    one.

    One row: ``(n_records, n_null_key, n_blocks, max_block_size,
    p99_block_size, candidate_pairs, reduction_ratio, n_over_cap)``.

    - records with NULL in any block column are EXCLUDED and counted
      (an equi-join drops NULL keys silently — surfacing the excluded
      volume is the point);
    - ``candidate_pairs`` = Σ_b |b|·(|b|−1)/2 (exact long);
    - ``reduction_ratio`` = 1 − candidate_pairs / C(n_records, 2) —
      the standard blocking-efficiency metric (≈1: blocking prunes
      nearly everything; ≈0: you are about to run all-pairs). The
      ratio divides in double (C(N,2) overflows long around N≈4.3e9 —
      exactly the corpus sizes this report exists for);
    - ``n_over_cap`` counts blocks larger than ``max_block`` — the
      blocks to split with a second blocking key (the
      basket_size_profile cap-pressure posture).

    Scale shape: ONE block-cardinality count aggregation (map-side
    combined) + ONE answer-scale reduce; p99 rides percentile_approx
    at accuracy 10000 — exact over the integer block-size domain
    ONLY while ``n_blocks`` ≤ the 10k accuracy (the KLL bound);
    corpora with more distinct blocks get the documented
    approximate-rank guarantee instead and may diverge from an exact
    quantile restatement (the contract's fixture stays well under
    the bound; raise the accuracy or sort the answer-scale size
    frame if you need exactness beyond it).

    Extension surface — the reference has no linkage stage; extension
    per SURVEY §8, the sizing sibling of the FS scorer above.
    """
    if not block_cols:
        raise ValueError("blocking_profile needs at least one block column")
    if max_block < 1:
        raise ValueError(f"max_block must be >= 1, got {max_block}")
    any_null = None
    for c in block_cols:
        cond = F.col(c).isNull()
        any_null = cond if any_null is None else (any_null | cond)
    null_frame = df.agg(
        F.count(F.lit(1)).alias("__n_all"),
        F.sum(any_null.cast("long")).alias("__n_null"),
    )
    sizes = (
        df.filter(~any_null)
        .groupBy(*block_cols)
        .agg(F.count(F.lit(1)).alias("__b"))
    )
    prof = sizes.agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.max("__b").alias("max_block_size"),
        F.percentile_approx("__b", 0.99, 10000).alias("p99_block_size"),
        # Integer division (b*(b-1) is even) — Spark's `/` is FLOAT
        # division and a double accumulator loses exactness past 2^53,
        # i.e. at exactly the runaway-block scales this report exists
        # for. Per-block b*(b-1) itself overflows long only at
        # b ≈ 3e9 records in ONE block (document-level impossibility).
        F.sum(F.expr("(__b * (__b - 1)) div 2")).alias("candidate_pairs"),
        F.sum((F.col("__b") > max_block).cast("long")).alias("n_over_cap"),
    )
    n_kept = F.col("__n_all") - F.coalesce("__n_null", F.lit(0))
    all_pairs = n_kept.cast("double") * (n_kept - 1).cast("double") / F.lit(2.0)
    return prof.crossJoin(F.broadcast(null_frame)).select(
        n_kept.alias("n_records"),
        F.coalesce("__n_null", F.lit(0)).alias("n_null_key"),
        F.coalesce("n_blocks", F.lit(0)).alias("n_blocks"),
        "max_block_size",
        "p99_block_size",
        F.coalesce("candidate_pairs", F.lit(0)).alias("candidate_pairs"),
        F.round(
            F.when(
                n_kept >= 2,
                F.lit(1.0)
                - F.coalesce("candidate_pairs", F.lit(0)).cast("double")
                / all_pairs,
            ),
            decimals,
        ).alias("reduction_ratio"),
        F.coalesce("n_over_cap", F.lit(0)).alias("n_over_cap"),
    )
