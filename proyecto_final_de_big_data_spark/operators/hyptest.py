"""Classical k-sample hypothesis tests — one-way ANOVA (parametric)
and the rank tests Kruskal–Wallis / Mann–Whitney U (non-parametric) —
as closed-form distributed aggregations. No SciPy: the statistics are
exact sqrt/ratio arithmetic over sufficient statistics, the same
"no p-value lookup, report the statistic and its dfs" posture as
``abtest.two_proportion_ztest``.

**ANOVA** is pure sufficient statistics: one pass collects per-group
``(n, Σx, Σx²)`` (map-side combined), a second group-cardinality
reduce forms SS_between / SS_within via the computational identities
``SSB = Σ sᵢ²/nᵢ − S²/N`` and ``SSW = Σ q − Σ sᵢ²/nᵢ`` — no second
data scan for deviations-from-mean, no window anywhere.

**Rank tests** need average ranks of the POOLED sample with midrank
tie handling. The trick that keeps them distributed: ranks only enter
the statistics through per-group rank SUMS and the tie-count
correction, and both are computable from the DISTINCT-VALUE frame —
``avg_rank(v) = (#values < v) + (t_v + 1)/2`` where ``t_v`` is v's tie
count. So the plan is: one ``(group, value)`` aggregation at
contingency cardinality, one distinct-value cumulative window (a
single-partition window at DISTINCT-VALUE cardinality — the survival/
Lorenz "answer-scale grid window" discipline, NOT a data-scale sort),
then a broadcast-sized join back. The scale bound is therefore the
number of DISTINCT metric values: exact for discrete/integer metrics
(counts, quantities, star ratings — the usual rank-test inputs); for a
continuous metric, pass ``round_decimals`` to pre-round first — that
makes the tie policy an explicit caller decision instead of a
float-equality accident, and midrank tie correction handles the
collisions exactly. The bound is ENFORCED, not advisory: both rank
tests carry an IN-PLAN grid-count guard (``_apply_grid_guard`` — a raising
filter over a 1-row broadcast the window stage depends on, so an oversized grid raises at
action time BEFORE the single-partition sort can run) when the grid
would exceed ``max_distinct`` (default 100,000 — a window that size is
still answer-scale; a continuous double metric at data scale is not),
naming ``round_decimals`` as the fix.

Statistics (Conover, Practical Nonparametric Statistics):

- Kruskal–Wallis ``H = 12/(N(N+1)) · Σ Rⱼ²/nⱼ − 3(N+1)``, tie
  correction ``C = 1 − Σ(t³−t)/(N³−N)``, ``H_adj = H/C`` (NULL when
  every value is identical — C = 0, the test is undefined).
- Mann–Whitney ``U_a = R_a − n_a(n_a+1)/2`` (so ``U_a + U_b =
  n_a·n_b``), normal approximation ``z = (U_a − n_a n_b/2) / σ`` with
  the tie-corrected ``σ² = (n_a n_b/12)·((N+1) − Σ(t³−t)/(N(N−1)))``;
  no continuity correction (documented; the oracle restates the same
  formula).

NULL/NaN values and NULL groups are excluded up front (the
collect_sorted_series discipline — a NULL metric carries no rank).

Extension surface — the reference's EDA profiles per-group mean/stddev
differences (scripts/03_spark_eda_agg.py's grouped aggregations) but
has no significance-testing surface; extension per SURVEY §8.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DEFAULT_MAX_DISTINCT = 100_000


def _clean(
    df: DataFrame,
    value_col: str,
    group_col: str,
    round_decimals: int | None = None,
) -> DataFrame:
    v = F.col(value_col).cast("double")
    if round_decimals is not None:
        v = F.round(v, round_decimals)
    return (
        df.select(F.col(group_col).alias("grp"), v.alias("x"))
        .filter(F.col("grp").isNotNull() & F.col("x").isNotNull() & ~F.isnan("x"))
    )


def _apply_grid_guard(
    frame: DataFrame,
    grid_count: DataFrame,
    max_distinct: int,
    test: str,
    what: str = "midrank grid",
) -> DataFrame:
    """Enforce the rank tests' scale bound BEFORE the distinct-value
    window runs: the cumulative midrank window is single-partition by
    design (answer-scale grid), so a continuous metric whose distinct
    count approaches N must be rounded first, not silently sorted on
    one task.

    ``grid_count`` is a 1-row ``(__d,)`` frame counting the grid;
    ``frame`` (the window input) gets it crossJoined BROADCAST plus a
    raising FILTER (raise_error IN-PLAN, the cohens_kappa posture) that
    trips when the count exceeds ``max_distinct``. The guard must be a
    filter, not a projection on the guard frame alone: an unreferenced
    guard column would be column-pruned out of the plan and never
    evaluate. The filter references ``__d``, so it survives pruning,
    and it sits BELOW the window: it evaluates in the join stage (or,
    predicate-pushed, while the broadcast materializes) — either way
    before the single-partition sort's stage can be scheduled, so an
    oversized grid still dies before the dangerous sort ever runs.
    That is the protection the pre-r11 eager approx-count action
    provided, now without a serialized driver round trip per test (the
    count is exact, reusing the grid aggregation's own exchange, where
    the old action was a separate ±5%-rsd approx scan). All rows pass
    the healthy-path filter and ``__d`` is dropped, so values and row
    sets are bit-identical."""
    gate = F.when(
        F.col("__d") > max_distinct,
        F.raise_error(
            F.concat(
                F.lit(f"{test}: "),
                F.col("__d").cast("string"),
                F.lit(
                    " distinct metric values exceeds "
                    f"max_distinct={max_distinct:,} — the {what} "
                    "window would become a data-scale single-partition "
                    "sort. Pass round_decimals to discretize the metric "
                    "(explicit tie policy), or raise max_distinct if "
                    "the grid is genuinely answer-scale."
                ),
            )
        ).cast("boolean"),
    ).otherwise(F.lit(True))
    return (
        frame.crossJoin(F.broadcast(grid_count)).filter(gate).drop("__d")
    )


def oneway_anova(
    df: DataFrame,
    value_col: str,
    group_col: str,
    decimals: int = 6,
) -> DataFrame:
    """One-row readout ``(k, n, df_between, df_within, ss_between,
    ss_within, f_stat, eta_sq)`` — the one-way fixed-effects ANOVA
    F statistic for ``value_col`` across ``group_col``'s levels.

    F is NULL when it is undefined: fewer than 2 groups, no residual
    dfs (every group a singleton), or zero within-group variance.
    """
    per_group = _clean(df, value_col, group_col).groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_j"),
        F.sum("x").alias("s_j"),
        F.sum(F.col("x") * F.col("x")).alias("q_j"),
    )
    tot = per_group.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n_j").alias("n"),
        F.sum("s_j").alias("s"),
        F.sum("q_j").alias("q"),
        F.sum(F.col("s_j") * F.col("s_j") / F.col("n_j")).alias("between_raw"),
    )
    ssb = F.col("between_raw") - F.col("s") * F.col("s") / F.col("n")
    ssw = F.col("q") - F.col("between_raw")
    dfb = (F.col("k") - 1).cast("long")
    dfw = (F.col("n") - F.col("k")).cast("long")
    f_stat = F.when(
        (dfb > 0) & (dfw > 0) & (ssw > 0), (ssb / dfb) / (ssw / dfw)
    )
    sst = ssb + ssw
    return tot.select(
        F.col("k").cast("long").alias("k"),
        F.col("n").cast("long").alias("n"),
        dfb.alias("df_between"),
        dfw.alias("df_within"),
        F.round(ssb, decimals).alias("ss_between"),
        F.round(ssw, decimals).alias("ss_within"),
        F.round(f_stat, decimals).alias("f_stat"),
        F.round(F.when(sst > 0, ssb / sst), decimals).alias("eta_sq"),
    )


def _rank_frame(clean: DataFrame, max_distinct: int, test: str):
    """``(ranked_cells, tie_sum)`` — the ``(grp, x, cnt)`` contingency
    frame joined with each distinct value's midrank ``avg_rank``, plus
    the one-row ``Σ(t³−t)`` tie-correction frame, the shared machinery
    of both rank tests. The cumulative window runs over the
    DISTINCT-VALUE frame only, gated by the in-plan ``_apply_grid_guard``
    raising filter (evaluated before the window's stage can run).
    Tie counts are DOUBLES before cubing: ``t³`` on a long overflows at
    t ≈ 2.1M — exactly the large-N/small-grid regime this module
    targets — and ANSI mode would raise (the oracle casts before
    cubing too)."""
    cells = clean.groupBy("grp", "x").agg(F.count(F.lit(1)).alias("cnt"))
    vals = cells.groupBy("x").agg(F.sum("cnt").cast("double").alias("t"))
    gated = _apply_grid_guard(
        vals, vals.agg(F.count(F.lit(1)).alias("__d")), max_distinct, test
    )
    w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, -1)
    ranked = gated.select(
        "x",
        "t",
        (
            F.coalesce(F.sum("t").over(w), F.lit(0.0))
            + (F.col("t") + 1) / 2
        ).alias("avg_rank"),
    )
    tie_sum = vals.agg(
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")).alias("tie_sum")
    )
    return cells.join(ranked, "x"), tie_sum


def kruskal_wallis(
    df: DataFrame,
    value_col: str,
    group_col: str,
    decimals: int = 6,
    round_decimals: int | None = None,
    max_distinct: int = _DEFAULT_MAX_DISTINCT,
) -> DataFrame:
    """One-row readout ``(k, n, h, tie_correction, h_adj)`` — the
    Kruskal–Wallis rank test of ``value_col`` across ``group_col``,
    midrank ties, with the standard tie-corrected ``h_adj = h / C``
    (NULL when C = 0, i.e. all values identical).

    ``round_decimals`` discretizes the metric before ranking (the
    explicit tie policy for continuous metrics); the distinct-value
    grid is guarded at ``max_distinct`` (raises, never silently sorts
    a data-scale grid on one task)."""
    clean = _clean(df, value_col, group_col, round_decimals)
    rf, ties = _rank_frame(clean, max_distinct, "kruskal_wallis")
    per_group = rf.groupBy("grp").agg(
        F.sum("cnt").alias("n_j"),
        F.sum(F.col("cnt") * F.col("avg_rank")).alias("r_j"),
    )
    tot = per_group.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n_j").alias("n"),
        F.sum(F.col("r_j") * F.col("r_j") / F.col("n_j")).alias("rr"),
    ).crossJoin(ties)
    n = F.col("n").cast("double")
    h = 12.0 / (n * (n + 1)) * F.col("rr") - 3.0 * (n + 1)
    # n = 1 makes n³ − n = 0: guard the 0/0 (ANSI raises on double
    # division by zero) — the one-observation test is undefined anyway.
    c = F.when(
        n * n * n - n > 0, 1.0 - F.col("tie_sum") / (n * n * n - n)
    )
    return tot.select(
        F.col("k").cast("long").alias("k"),
        F.col("n").cast("long").alias("n"),
        F.round(h, decimals).alias("h"),
        F.round(c, decimals).alias("tie_correction"),
        F.round(F.when(c > 0, h / c), decimals).alias("h_adj"),
    )


def mann_whitney_u(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
    decimals: int = 6,
    round_decimals: int | None = None,
    max_distinct: int = _DEFAULT_MAX_DISTINCT,
) -> DataFrame:
    """One-row readout ``(n_a, n_b, u_a, u_b, z)`` — the Mann–Whitney
    U test of ``value_col`` between the two named groups (rows in
    other groups are ignored), midrank ties, tie-corrected normal
    z WITHOUT continuity correction. z is NULL when either group is
    empty or σ = 0 (all pooled values identical). ``group_a ==
    group_b`` raises — comparing a group against itself is undefined,
    not a well-formed readout. ``round_decimals`` / ``max_distinct``
    as in :func:`kruskal_wallis`."""
    if group_a == group_b:
        raise ValueError(
            f"mann_whitney_u: group_a and group_b are both {group_a!r} — "
            "the two-sample test against the same group is undefined"
        )
    clean = _clean(df, value_col, group_col, round_decimals).filter(
        F.col("grp").isin(group_a, group_b)
    )
    rf, ties = _rank_frame(clean, max_distinct, "mann_whitney_u")
    per_group = rf.groupBy("grp").agg(
        F.sum("cnt").alias("n_j"),
        F.sum(F.col("cnt") * F.col("avg_rank")).alias("r_j"),
    )
    picked = per_group.agg(
        F.sum(F.when(F.col("grp") == group_a, F.col("n_j"))).alias("n_a"),
        F.sum(F.when(F.col("grp") == group_a, F.col("r_j"))).alias("r_a"),
        F.sum(F.when(F.col("grp") == group_b, F.col("n_j"))).alias("n_b"),
    ).crossJoin(ties)
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    n = na + nb
    u_a = F.col("r_a") - na * (na + 1) / 2
    u_b = na * nb - u_a
    var = na * nb / 12 * ((n + 1) - F.col("tie_sum") / (n * (n - 1)))
    z = F.when(
        na.isNotNull() & nb.isNotNull() & (var > 0),
        (u_a - na * nb / 2) / F.sqrt(var),
    )
    return picked.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.round(u_a, decimals).alias("u_a"),
        F.round(u_b, decimals).alias("u_b"),
        F.round(z, decimals).alias("z"),
    )


def bh_fdr(
    df: DataFrame,
    p_col: str,
    key_cols: list[str],
    alpha: float = 0.05,
    decimals: int = 6,
) -> DataFrame:
    """Benjamini–Hochberg step-up FDR correction (Benjamini & Hochberg,
    JRSS-B 1995 — public literature) over a frame of test results: the
    multiple-comparisons control every metrics platform needs once a
    dashboard runs one test per segment.

    Output: the input keys and p-value plus ``rank`` (ascending p,
    deterministic ``key_cols`` tie-break), ``m`` (number of tests),
    ``q_value`` (the BH-adjusted p: reverse running minimum of
    p·m/rank, clipped at 1) and ``reject`` (q <= ``alpha`` — exactly
    the classic step-up decision: reject all p up to the largest i
    with p_(i) <= i·alpha/m).

    Scale shape: the input is a TEST frame — one row per hypothesis,
    answer-scale by construction (segments × metrics, not raw events) —
    so the two single-partition windows here sort tests, never data;
    the raw-data reduction to p-values happens upstream in the
    anova/rank-test/z-test operators. NULL/NaN or out-of-[0,1]
    p-values hard-fail (a silently dropped test changes m and thus
    every q).

    Extension surface — the reference has no statistics stage;
    extension per SURVEY §8, completing the testing family (ANOVA /
    rank tests / z-tests produce the p-values this corrects).
    """
    if not key_cols:
        raise ValueError("bh_fdr needs key columns for a deterministic order")
    if not (0.0 < alpha < 1.0):
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    p = F.col(p_col).cast("double")
    checked = df.withColumn(
        "__p",
        F.when(
            p.isNull() | F.isnan(p) | (p < 0.0) | (p > 1.0),
            F.raise_error(
                F.format_string(
                    "bh_fdr: %s must be a p-value in [0, 1]; got %s",
                    F.lit(p_col),
                    p.cast("string"),
                )
            ),
        ).otherwise(p),
    )
    w_rank = Window.orderBy(F.col("__p").asc(), *[F.col(c) for c in key_cols])
    w_rev = (
        Window.orderBy(F.col("__p").desc(), *[F.col(c).desc() for c in key_cols])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ranked = (
        checked.withColumn("__rank", F.row_number().over(w_rank))
        .withColumn("__m", F.count(F.lit(1)).over(Window.partitionBy()))
        .withColumn(
            "__raw", F.col("__p") * F.col("__m") / F.col("__rank")
        )
    )
    q = F.least(F.lit(1.0), F.min("__raw").over(w_rev))
    return ranked.select(
        *key_cols,
        F.round(F.col("__p"), decimals).alias(p_col),
        F.col("__rank").alias("rank"),
        F.col("__m").cast("long").alias("m"),
        F.round(q, decimals).alias("q_value"),
        (q <= F.lit(float(alpha))).alias("reject"),
    )


def ks_two_sample(
    df: DataFrame,
    value_col: str,
    side_col: str,
    ref_label: str,
    cur_label: str,
    key_cols: list[str] | None = None,
    alpha: float = 0.05,
    decimals: int = 6,
    round_decimals: int | None = None,
    max_distinct: int = _DEFAULT_MAX_DISTINCT,
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov drift test per key: one row
    ``(*key_cols, n_ref, n_cur, ks_stat, d_crit, drifted)`` comparing
    the ``value_col`` distribution of the ``ref_label`` rows against
    the ``cur_label`` rows of ``side_col`` (Smirnov 1939 / Massey,
    JASA 1951 — public literature). The distribution-shape sibling of
    :func:`~..drift.psi_numeric`: PSI reads binned mass shift, KS
    reads the exact maximum ECDF gap ``D = sup_x |F_ref(x) −
    F_cur(x)|`` — the standard "did this feature drift between
    training and serving" readout.

    ``d_crit`` is the asymptotic two-sided critical value at
    ``alpha``: ``c(α)·√((n₁+n₂)/(n₁·n₂))`` with ``c(α) =
    √(−ln(α/2)/2)`` — evaluated in exactly that literal IEEE order
    with c(α) precomputed driver-side to one double literal (ln is
    libm-implementation-dependent; sqrt and the division are IEEE
    exact-rounded, so embedding the constant keeps a SQL oracle
    bit-comparable). ``drifted = D > d_crit`` compares the UNROUNDED
    values. Both are NULL for a key where either sample is empty
    (a one-sided key has no two-sample statistic — surfaced, not
    dropped). Rows whose side is neither label, and NULL/NaN values
    or NULL keys, are excluded up front (the _clean discipline).

    D is exact: both ECDFs are step functions that only change at
    observed values, so evaluating ``|F_ref − F_cur|`` on the distinct
    ``(key, value)`` grid attains the supremum. All inputs to D are
    integer cumulative counts divided by integer totals — no
    accumulation-order float sums anywhere, which is what makes the
    statistic bit-reproducible across partitionings.

    Scale shape (100 TB): ONE ``(key, value)`` contingency aggregation
    (map-side combined) reduces data scale to grid scale; the
    cumulative ECDF window partitions BY KEY over that grid — per-key
    grid cardinality is guarded at ``max_distinct`` (in-plan
    ``_apply_grid_guard`` raising filter, raises at action time naming
    ``round_decimals`` as the fix, the rank-test posture; with no keys
    the window is a single answer-scale partition and the same guard
    applies); the
    final reduce is key-cardinality. No data-scale window, no
    collect, no crossJoin.

    Extension surface — the reference has no statistics stage;
    extension per SURVEY §8, completing the drift family (PSI reads
    binned mass shift; KS reads exact ECDF distance).
    """
    import math

    if not (0.0 < alpha < 1.0):
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    if ref_label == cur_label:
        raise ValueError("ks_two_sample needs two distinct side labels")
    keys = list(key_cols or [])
    v = F.col(value_col).cast("double")
    if round_decimals is not None:
        v = F.round(v, round_decimals)
    clean = (
        df.select(
            *[F.col(c) for c in keys],
            F.col(side_col).alias("__side"),
            v.alias("x"),
        )
        .filter(
            F.col("__side").isin(ref_label, cur_label)
            & F.col("x").isNotNull()
            & ~F.isnan("x")
        )
    )
    for c in keys:
        clean = clean.filter(F.col(c).isNotNull())

    cells = clean.groupBy(*keys, "x").agg(
        F.sum(F.when(F.col("__side") == ref_label, 1).otherwise(0)).alias(
            "c_ref"
        ),
        F.sum(F.when(F.col("__side") == cur_label, 1).otherwise(0)).alias(
            "c_cur"
        ),
    )
    # Grid guard IN-PLAN (the _apply_grid_guard posture — see its docstring):
    # the 1-row guard counts the largest per-key grid off the cells
    # aggregation itself (exchange reused, exact where the old eager
    # action was a separate ±5% approx scan) and rides a broadcast the
    # ECDF window's stage depends on, so an oversized grid still dies
    # before the per-key sort runs — without a serialized driver round
    # trip during query construction.
    if keys:
        grid_count = (
            cells.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("__d"))
            .agg(F.max("__d").alias("__d"))
        )
        what = "per-key ECDF grid"
    else:
        grid_count = cells.agg(F.count(F.lit(1)).alias("__d"))
        what = "ECDF grid"
    gated = _apply_grid_guard(
        cells, grid_count, max_distinct, "ks_two_sample", what
    )
    w_cum = (
        Window.partitionBy(*[F.col(c) for c in keys])
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy(*[F.col(c) for c in keys])
    stepped = gated.select(
        *keys,
        F.sum("c_ref").over(w_cum).alias("cum_ref"),
        F.sum("c_cur").over(w_cum).alias("cum_cur"),
        F.sum("c_ref").over(w_all).alias("n_ref"),
        F.sum("c_cur").over(w_all).alias("n_cur"),
    )
    both = (F.col("n_ref") > 0) & (F.col("n_cur") > 0)
    gap = F.when(
        both,
        F.abs(
            F.col("cum_ref").cast("double") / F.col("n_ref").cast("double")
            - F.col("cum_cur").cast("double") / F.col("n_cur").cast("double")
        ),
    )
    per_key = stepped.groupBy(*keys).agg(
        F.max("n_ref").cast("long").alias("n_ref"),
        F.max("n_cur").cast("long").alias("n_cur"),
        F.max(gap).alias("__d_raw"),
    )
    c_alpha = math.sqrt(-math.log(alpha / 2.0) * 0.5)
    n1d = F.col("n_ref").cast("double")
    n2d = F.col("n_cur").cast("double")
    d_crit_raw = F.when(
        (F.col("n_ref") > 0) & (F.col("n_cur") > 0),
        F.lit(c_alpha) * F.sqrt((n1d + n2d) / (n1d * n2d)),
    )
    return per_key.select(
        *keys,
        "n_ref",
        "n_cur",
        F.round(F.col("__d_raw"), decimals).alias("ks_stat"),
        F.round(d_crit_raw, decimals).alias("d_crit"),
        (F.col("__d_raw") > d_crit_raw).alias("drifted"),
    )


def effect_size(
    units: DataFrame,
    value_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
    key_cols: list[str] | None = None,
    decimals: int = 6,
) -> DataFrame:
    """Standardized mean-difference effect size per key: ``(*key_cols,
    n_a, n_b, mean_a, mean_b, mean_diff, pooled_sd, cohens_d,
    hedges_g)`` comparing ``group_a`` against ``group_b`` (Cohen,
    "Statistical Power Analysis", 1988; Hedges, J. Educ. Stat. 1981 —
    public literature). The HOW-BIG readout that belongs next to every
    significance test in this module: a z-test at 100 TB flags a
    0.001σ difference as significant — d says whether anyone should
    care, in units comparable across metrics and experiments.

        d = (x̄_a − x̄_b) / s_p,   s_p² = (SSD_a + SSD_b)/(n_a+n_b−2)
        g = d · J,                J = 1 − 3/(4(n_a+n_b) − 9)

    with ``SSD = Σx² − (Σx)²/n`` (the computational identity, one
    conditional-aggregation pass — the CUPED posture) and J the
    standard small-sample bias correction. Sign convention: positive
    d means ``group_a``'s mean is larger. ``cohens_d``/``hedges_g``
    are NULL when either arm has n < 2 or the pooled variance is 0
    (undefined, surfaced not hidden); means are still reported.
    NULL/NaN values and NULL keys are excluded up front; rows in
    neither group are ignored.

    Scale shape (100 TB): ONE (key)-cardinality conditional agg over
    six sufficient sums (map-side combined), closed-form projection,
    nothing else — no join, no window, no collect. ``key_cols`` empty
    gives the classic one-row experiment readout.

    Extension surface — the reference has no experimentation stage;
    extension per SURVEY §8, the magnitude sibling of
    :func:`oneway_anova` / :func:`mann_whitney_u` and the abtest
    z-tests (a test says IF the arms differ; d says BY HOW MUCH in
    comparable units).
    """
    if group_a == group_b:
        raise ValueError("effect_size needs two distinct group labels")
    keys = list(key_cols or [])
    v = F.col(value_col).cast("double")
    clean = units.select(
        *[F.col(c) for c in keys],
        F.col(group_col).alias("__g"),
        v.alias("__x"),
    ).filter(
        F.col("__g").isin(group_a, group_b)
        & F.col("__x").isNotNull()
        & ~F.isnan("__x")
    )
    for c in keys:
        clean = clean.filter(F.col(c).isNotNull())
    in_a = F.col("__g") == group_a
    in_b = F.col("__g") == group_b
    agg = clean.groupBy(*keys).agg(
        F.sum(F.when(in_a, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(in_b, 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(in_a, F.col("__x")).otherwise(0.0)).alias("__sa"),
        F.sum(F.when(in_b, F.col("__x")).otherwise(0.0)).alias("__sb"),
        F.sum(F.when(in_a, F.col("__x") * F.col("__x")).otherwise(0.0)).alias(
            "__qa"
        ),
        F.sum(F.when(in_b, F.col("__x") * F.col("__x")).otherwise(0.0)).alias(
            "__qb"
        ),
    )
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    mean_a = F.col("__sa") / na
    mean_b = F.col("__sb") / nb
    ssd_a = F.col("__qa") - F.col("__sa") * F.col("__sa") / na
    ssd_b = F.col("__qb") - F.col("__sb") * F.col("__sb") / nb
    both = (F.col("n_a") >= 2) & (F.col("n_b") >= 2)
    sp2 = F.when(both, (ssd_a + ssd_b) / (na + nb - 2.0))
    d = F.when(sp2 > 0, (mean_a - mean_b) / F.sqrt(sp2))
    j = 1.0 - 3.0 / (4.0 * (na + nb) - 9.0)
    return agg.select(
        *keys,
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.round(F.when(F.col("n_a") > 0, mean_a), decimals).alias("mean_a"),
        F.round(F.when(F.col("n_b") > 0, mean_b), decimals).alias("mean_b"),
        F.round(
            F.when((F.col("n_a") > 0) & (F.col("n_b") > 0), mean_a - mean_b),
            decimals,
        ).alias("mean_diff"),
        F.round(F.sqrt(sp2), decimals).alias("pooled_sd"),
        F.round(d, decimals).alias("cohens_d"),
        F.round(d * j, decimals).alias("hedges_g"),
    )
