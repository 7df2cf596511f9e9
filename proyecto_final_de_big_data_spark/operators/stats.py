"""Pairwise Pearson correlation matrix — every column pair in ONE
aggregation pass, long-form output. The first page of any EDA /
feature-selection report ("which of these signals move together?"),
and the multi-column generalization of :mod:`.trend`'s sufficient-
statistics trick.

Scale shape (100 TB): no `df.stat.corr` loop (that is one full pass
PER PAIR), no window, no sample-to-driver. A single ``groupBy``
collects the 6 sufficient statistics (n, Σx, Σy, Σxx, Σyy, Σxy) for
every pair at once with map-side partial aggregation — one shuffle of
6·C(k,2) doubles per group regardless of row count — and the
closed-form corr arithmetic runs at group cardinality. The long-form
explode happens AFTER the aggregation, on answer-scale rows.

NULL policy is pairwise deletion (the `pandas.DataFrame.corr`
convention): a row contributes to a pair's statistics only when BOTH
columns are non-null, so each pair sees its own n. Degenerate pairs
(< 2 complete rows, zero variance on either side) yield NULL, never
NaN or a divide-by-zero — ANSI-safe by construction.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def correlation_matrix(
    df: DataFrame,
    cols: list[str],
    by: list[str] | None = None,
    decimals: int = 6,
) -> DataFrame:
    """``(*by, col_x, col_y, n_rows, corr)`` — Pearson r for every
    unordered column pair (col_x < col_y in ``cols`` order), optionally
    per ``by`` group. ``n_rows`` counts rows where both columns are
    non-null (pairwise deletion); ``corr`` is NULL for degenerate
    pairs."""
    if len(cols) < 2:
        raise ValueError("correlation_matrix needs at least 2 columns")
    by = by or []
    pairs = list(combinations(cols, 2))
    aggs = []
    for i, (cx, cy) in enumerate(pairs):
        x = F.col(cx).cast("double")
        y = F.col(cy).cast("double")
        both = x.isNotNull() & y.isNotNull()
        xv = F.when(both, x)
        yv = F.when(both, y)
        aggs += [
            F.count(xv).cast("double").alias(f"__n_{i}"),
            F.sum(xv).alias(f"__sx_{i}"),
            F.sum(yv).alias(f"__sy_{i}"),
            F.sum(xv * xv).alias(f"__sxx_{i}"),
            F.sum(yv * yv).alias(f"__syy_{i}"),
            F.sum(xv * yv).alias(f"__sxy_{i}"),
        ]
    agg = df.groupBy(*by).agg(*aggs)
    structs = []
    for i, (cx, cy) in enumerate(pairs):
        n = F.col(f"__n_{i}")
        sx, sy = F.col(f"__sx_{i}"), F.col(f"__sy_{i}")
        sxx, syy, sxy = (
            F.col(f"__sxx_{i}"),
            F.col(f"__syy_{i}"),
            F.col(f"__sxy_{i}"),
        )
        var_x = n * sxx - sx * sx
        var_y = n * syy - sy * sy
        cov = n * sxy - sx * sy
        corr = F.when(
            (n >= 2) & (var_x > 0) & (var_y > 0),
            cov / F.sqrt(var_x * var_y),
        )
        structs.append(
            F.struct(
                F.lit(cx).alias("col_x"),
                F.lit(cy).alias("col_y"),
                n.cast("long").alias("n_rows"),
                F.round(corr, decimals).alias("corr"),
            )
        )
    return agg.select(
        *by, F.explode(F.array(*structs)).alias("__pair")
    ).select(*by, "__pair.col_x", "__pair.col_y", "__pair.n_rows", "__pair.corr")


def categorical_association(
    df: DataFrame,
    col_a: str,
    col_b: str,
    by: list[str] | None = None,
    decimals: int = 6,
) -> DataFrame:
    """Chi-square independence test + Cramér's V + mutual information
    between two categorical columns, optionally per ``by`` group.

    Output: ``(*by, n, levels_a, levels_b, dof, chi2, cramers_v,
    mutual_info)`` — one row per group. ``mutual_info`` is in nats over
    the empirical joint; ``cramers_v = sqrt(chi2 / (n * min(ra-1,
    rb-1)))``. Degenerate groups (a single level on either side) yield
    NULL statistics, never NaN — ANSI-safe guards throughout.

    Scale shape (100 TB): ONE full-data shuffle (the contingency-cell
    ``groupBy`` with map-side partial counts); marginals, totals, and
    every statistic are aggregations/joins over CELL-cardinality frames
    (≤ |A|·|B| rows per group). The missing-cell chi-square mass is
    folded in algebraically — ``Σ_missing e = n − Σ_observed e`` because
    expected counts over the full cross sum to n — so no |A|×|B| cross
    join is ever materialized. NULL category values are first-class
    levels? No: rows with a NULL in either column are dropped (the
    standard contingency convention); count them upstream if needed.
    """
    by = by or []
    a = F.col(col_a)
    bcol = F.col(col_b)
    cells = (
        df.filter(a.isNotNull() & bcol.isNotNull())
        .groupBy(*by, col_a, col_b)
        .agg(F.count(F.lit(1)).cast("double").alias("__o"))
    )
    row_m = cells.groupBy(*by, col_a).agg(F.sum("__o").alias("__r"))
    col_m = cells.groupBy(*by, col_b).agg(F.sum("__o").alias("__c"))
    tot = cells.groupBy(*by).agg(
        F.sum("__o").alias("__n"),
        F.count_distinct(a).cast("double").alias("__ra"),
        F.count_distinct(bcol).cast("double").alias("__rb"),
    )
    if by:
        j = (
            cells.join(row_m, [*by, col_a])
            .join(col_m, [*by, col_b])
            .join(tot, by)
        )
    else:
        j = (
            cells.join(row_m, [col_a])
            .join(col_m, [col_b])
            .crossJoin(F.broadcast(tot))
        )
    e = F.col("__r") * F.col("__c") / F.col("__n")
    o = F.col("__o")
    n = F.col("__n")
    # chi2 over the FULL cross = Σ_obs (o-e)²/e + Σ_missing e, and the
    # missing-cell expected mass is n − Σ_obs e.
    chi2_obs = F.sum((o - e) * (o - e) / e - e)
    mi_term = (o / n) * F.log(o * n / (F.col("__r") * F.col("__c")))
    out = j.groupBy(*by).agg(
        F.first(n).cast("long").alias("n"),
        F.first("__ra").cast("long").alias("levels_a"),
        F.first("__rb").cast("long").alias("levels_b"),
        ((F.first("__ra") - 1) * (F.first("__rb") - 1))
        .cast("long")
        .alias("dof"),
        (chi2_obs + F.first(n)).alias("__chi2"),
        F.sum(mi_term).alias("__mi"),
        F.first(n).alias("__nd"),
        F.least(F.first("__ra") - 1, F.first("__rb") - 1).alias("__mindim"),
    )
    valid = F.col("dof") > 0
    return out.select(
        *by,
        "n",
        "levels_a",
        "levels_b",
        "dof",
        F.round(F.when(valid, F.col("__chi2")), decimals).alias("chi2"),
        F.round(
            F.when(
                valid,
                F.sqrt(F.col("__chi2") / (F.col("__nd") * F.col("__mindim"))),
            ),
            decimals,
        ).alias("cramers_v"),
        F.round(F.when(valid, F.col("__mi")), decimals).alias("mutual_info"),
    )


def autocorrelation(
    series: DataFrame,
    key_cols: list[str],
    t_col: str,
    value_col: str,
    max_lag: int = 7,
    decimals: int = 6,
) -> DataFrame:
    """Sample autocorrelation function per key: ``(*key_cols, lag,
    n_pairs, acf)`` for lags 1..``max_lag``.

    The standard estimator r_ℓ = Σ_{t≤n−ℓ}(x_t−x̄)(x_{t+ℓ}−x̄) /
    Σ(x_t−x̄)² — numerator over the ℓ-shifted pairs, denominator the
    full-series centered sum of squares, both expanded to raw moments
    (num = Σx·y − x̄Σx − x̄Σy + n_p·x̄²; den = Σx² − (Σx)²/n) so the
    whole computation is joins + aggregations with no per-row mean
    subtraction. NULL acf where the denominator is 0 (constant
    series); a lag longer than the key's grid has no pairs and emits
    no row at all. NULL/NaN grid values are excluded up front — an
    inner pair join would otherwise count them in n_pairs while every
    sum skipped them, silently biasing the estimator.

    ``t_col`` must be a numeric grid index (day number, hour number —
    the caller's aggregation grid) so the ℓ-shift is an equi-join on
    ``t + ℓ``. Scale shape (100 TB): the input is a pre-aggregated
    series frame; the self-join is keyed on (key, t) — co-partitioned
    both sides — and fans out ×max_lag via a broadcast lag spine; all
    statistics are single keyed aggregations with map-side partials.
    """
    if not key_cols:
        raise ValueError("autocorrelation needs at least one key column")
    if max_lag < 1:
        raise ValueError(f"max_lag must be >= 1, got {max_lag}")
    spark = series.sparkSession
    x = F.col(value_col).cast("double")
    s = series.select(
        *key_cols, F.col(t_col).cast("long").alias("__t"), x.alias("__x")
    ).filter(F.col("__x").isNotNull() & ~F.isnan("__x"))
    stats = s.groupBy(*key_cols).agg(
        F.count("__x").cast("double").alias("__n"),
        F.sum("__x").alias("__sx_all"),
        F.sum(F.col("__x") * F.col("__x")).alias("__sxx_all"),
    )
    lags = F.broadcast(
        spark.range(1, max_lag + 1).select(F.col("id").alias("lag"))
    )
    left = s.crossJoin(lags).withColumn("__t2", F.col("__t") + F.col("lag"))
    right = s.select(
        *key_cols,
        F.col("__t").alias("__t2"),
        F.col("__x").alias("__y"),
    )
    pairs = left.join(right, [*key_cols, "__t2"]).groupBy(*key_cols, "lag").agg(
        F.count(F.lit(1)).cast("double").alias("__np"),
        F.sum(F.col("__x") * F.col("__y")).alias("__sxy"),
        F.sum("__x").alias("__sx"),
        F.sum("__y").alias("__sy"),
    )
    out = pairs.join(stats, key_cols)
    mean = F.col("__sx_all") / F.col("__n")
    den = F.col("__sxx_all") - F.col("__sx_all") * F.col("__sx_all") / F.col("__n")
    num = (
        F.col("__sxy")
        - mean * F.col("__sx")
        - mean * F.col("__sy")
        + F.col("__np") * mean * mean
    )
    return out.select(
        *key_cols,
        F.col("lag").cast("long").alias("lag"),
        F.col("__np").cast("long").alias("n_pairs"),
        F.round(F.when(den > 0, num / den), decimals).alias("acf"),
    )


def jackknife_ratio(
    df: DataFrame,
    num_col,
    den_col,
    stratum,
    decimals: int = 6,
) -> DataFrame:
    """Delete-one-stratum jackknife for a ratio metric — the standard
    survey-statistics answer to "what is the uncertainty on
    sum(num)/sum(den)?" when rows are clustered (a ratio of sums has
    no per-row variance formula, and bootstrap resampling at corpus
    scale means re-shuffling 100 TB per replicate).

    One row: ``(theta, se_jack, ci_lo, ci_hi, n_strata)`` where
    ``theta = Σnum/Σden``, each replicate drops ONE stratum
    (``r_s = (Σnum − num_s)/(Σden − den_s)`` — train-side stats by
    subtraction, the :mod:`.crossval` trick), and
    ``se² = (S−1)/S · Σ_s (r_s − r̄)²`` with a normal-approximation
    95% CI.

    Scale shape (100 TB): ONE data-scale ``groupBy(stratum)`` with
    map-side partial sums; the S replicate ratios, their mean, and the
    variance all run at stratum cardinality (answer-scale) — the S
    leave-one-out "re-computations" are pure algebra on the per-stratum
    sufficient statistics, never S passes over the data. Degenerate
    replicates (a dropped stratum leaving Σden = 0) yield NULL.
    """
    num = (F.col(num_col) if isinstance(num_col, str) else num_col).cast(
        "double"
    )
    den = (F.col(den_col) if isinstance(den_col, str) else den_col).cast(
        "double"
    )
    strat = F.col(stratum) if isinstance(stratum, str) else stratum
    from pyspark.sql import Window

    per = df.groupBy(strat.alias("__s")).agg(
        F.sum(num).alias("__num"), F.sum(den).alias("__den")
    )
    # Totals as unpartitioned window aggregates over the S-row
    # post-aggregation frame (the with_share_of_total idiom) — NOT a
    # self-join/cross-join against a totals frame, which would plan a
    # second scan of the base facts through the shared `per` lineage.
    w = Window.partitionBy()
    loo = per.select(
        F.count(F.lit(1)).over(w).alias("__nstrata"),
        F.sum("__num").over(w).alias("__tn"),
        F.sum("__den").over(w).alias("__td"),
        F.when(
            F.sum("__den").over(w) - F.col("__den") != 0,
            (F.sum("__num").over(w) - F.col("__num"))
            / (F.sum("__den").over(w) - F.col("__den")),
        ).alias("__r"),
    )
    agg = loo.agg(
        F.first("__nstrata").alias("S"),
        F.first("__tn").alias("tn"),
        F.first("__td").alias("td"),
        F.avg("__r").alias("rbar"),
        F.sum(F.pow(F.col("__r"), 2)).alias("sum_r2"),
        F.count("__r").alias("n_ok"),
    )
    theta = F.when(F.col("td") != 0, F.col("tn") / F.col("td"))
    # (S-1)/S * Σ(r_s - r̄)² via the moment form Σr² − S·r̄²; requires
    # every replicate to be well-defined, else the variance is NULL.
    var = F.when(
        (F.col("n_ok") == F.col("S")) & (F.col("S") > 1),
        (F.col("S") - 1)
        / F.col("S").cast("double")
        * (F.col("sum_r2") - F.col("n_ok") * F.col("rbar") * F.col("rbar")),
    )
    # Clamp cancellation noise at 0 but PROPAGATE a degenerate-replicate
    # NULL (Spark's greatest skips NULLs, which would fake an se of 0).
    se = F.when(var.isNotNull(), F.sqrt(F.greatest(var, F.lit(0.0))))
    return agg.select(
        F.round(theta, decimals).alias("theta"),
        F.round(se, decimals).alias("se_jack"),
        F.round(theta - F.lit(1.96) * se, decimals).alias("ci_lo"),
        F.round(theta + F.lit(1.96) * se, decimals).alias("ci_hi"),
        F.col("S").cast("long").alias("n_strata"),
    )


def cross_correlation(
    series: DataFrame,
    key_cols: list[str],
    t_col: str,
    x_col: str,
    y_col: str,
    max_lag: int = 7,
    decimals: int = 6,
) -> DataFrame:
    """Sample cross-correlation function (CCF) between two metrics on
    a shared grid, per key: ``(*key_cols, lag, n_pairs, ccf)`` for
    lags −``max_lag``..+``max_lag`` (Box & Jenkins, "Time Series
    Analysis", 1970 — public literature). Positive lag correlates
    ``x_t`` with ``y_{t+lag}`` — a peak at lag +2 reads "x LEADS y by
    2 grid steps" (do clicks today predict purchases in two days?);
    lag 0 is plain full-series Pearson r, the sanity anchor. The
    two-series sibling of :func:`autocorrelation`, and — unlike it —
    ASYMMETRIC in the lag sign, which is exactly the lead/lag
    information.

    Estimator (Box–Jenkins convention): ``r_xy(ℓ) = Σ_t (x_t − x̄)
    (y_{t+ℓ} − ȳ) / √(Σ(x−x̄)² · Σ(y−ȳ)²)`` with FULL-series means
    and sums of squares in the denominator (fixed across lags, so the
    lag profile is comparable), expanded to raw moments — ``num =
    Σxy − ȳ·Σx_t − x̄·Σy_{t+ℓ} + n_p·x̄·ȳ``, denominators ``Σx² −
    (Σx)²/n`` — so the whole computation is joins + keyed
    aggregations with no per-row mean subtraction (the
    :func:`autocorrelation` machinery). √ is IEEE exact-rounded.
    NULL ccf when either variance is 0; a lag with no overlapping
    grid points emits no row. Rows where EITHER metric is NULL/NaN
    are excluded up front (complete-case — a half-NULL grid point
    would bias the means against the pair sums).

    ``key_cols`` may be empty: the global two-metric CCF (stats
    become a 1-row broadcast frame — the scalar-crossJoin house
    pattern). ``t_col`` must be a numeric grid index (day number,
    hour number) so the shift is an equi-join on ``t + ℓ``.

    Scale shape (100 TB): input is a pre-aggregated series frame; one
    sufficient-statistics aggregation, a ×(2·max_lag+1) broadcast lag
    spine, ONE (key, t)-keyed self-join, one (key, lag) aggregation.
    No window, no collect, no data-scale crossJoin.

    Extension surface — the reference has no time-series stage;
    extension per SURVEY §8, the lead/lag discovery sibling of
    :func:`autocorrelation`.
    """
    if max_lag < 1:
        raise ValueError(f"max_lag must be >= 1, got {max_lag}")
    keys = list(key_cols or [])
    spark = series.sparkSession
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    s = (
        series.select(
            *keys,
            F.col(t_col).cast("long").alias("__t"),
            x.alias("__x"),
            y.alias("__y"),
        )
        .filter(
            F.col("__x").isNotNull()
            & ~F.isnan("__x")
            & F.col("__y").isNotNull()
            & ~F.isnan("__y")
        )
    )
    stats = s.groupBy(*keys).agg(
        F.count("__x").cast("double").alias("__n"),
        F.sum("__x").alias("__sx_all"),
        F.sum(F.col("__x") * F.col("__x")).alias("__sxx_all"),
        F.sum("__y").alias("__sy_all"),
        F.sum(F.col("__y") * F.col("__y")).alias("__syy_all"),
    )
    lags = F.broadcast(
        spark.range(-max_lag, max_lag + 1).select(F.col("id").alias("lag"))
    )
    left = s.crossJoin(lags).withColumn("__t2", F.col("__t") + F.col("lag"))
    right = s.select(
        *keys, F.col("__t").alias("__t2"), F.col("__y").alias("__y2")
    )
    pairs = (
        left.join(right, [*keys, "__t2"])
        .groupBy(*keys, "lag")
        .agg(
            F.count(F.lit(1)).cast("double").alias("__np"),
            F.sum(F.col("__x") * F.col("__y2")).alias("__sxy"),
            F.sum("__x").alias("__sx"),
            F.sum("__y2").alias("__sy"),
        )
    )
    if keys:
        out = pairs.join(stats, keys)
    else:
        out = pairs.crossJoin(F.broadcast(stats))
    mx = F.col("__sx_all") / F.col("__n")
    my = F.col("__sy_all") / F.col("__n")
    den_x = F.col("__sxx_all") - F.col("__sx_all") * F.col("__sx_all") / F.col("__n")
    den_y = F.col("__syy_all") - F.col("__sy_all") * F.col("__sy_all") / F.col("__n")
    num = (
        F.col("__sxy")
        - my * F.col("__sx")
        - mx * F.col("__sy")
        + F.col("__np") * mx * my
    )
    return out.select(
        *keys,
        F.col("lag").cast("long").alias("lag"),
        F.col("__np").cast("long").alias("n_pairs"),
        F.round(
            F.when(
                (den_x > 0) & (den_y > 0), num / F.sqrt(den_x * den_y)
            ),
            decimals,
        ).alias("ccf"),
    )


def pacf_by_key(
    series: DataFrame,
    key_cols: list[str],
    t_col: str,
    value_col: str,
    max_lag: int = 4,
    decimals: int = 6,
) -> DataFrame:
    """Partial autocorrelation function per key at lags
    1..``max_lag`` (≤ 4): ``(*key_cols, lag, pacf)`` via the
    Durbin–Levinson recursion UNROLLED into closed-form column
    arithmetic (Durbin, Biometrika 1960; Box & Jenkins 1970 — public
    literature). The AR-order selector that completes the lag
    diagnostics: ACF says which lags CORRELATE, PACF says which lags
    carry NEW information once shorter lags are regressed out — an
    AR(p) series shows PACF cutting off after lag p while its ACF
    decays forever, so "how many AR terms does this KPI need" reads
    directly off this frame.

        φ₁₁ = r₁
        φ_kk = (r_k − Σⱼ φ_{k−1,j} r_{k−j}) / (1 − Σⱼ φ_{k−1,j} r_j)
        φ_kj = φ_{k−1,j} − φ_kk·φ_{k−1,k−j}

    computed from :func:`autocorrelation`'s estimates (taken at 12
    decimals internally — the D–L algebra then runs in identical
    literal order in both engines, so a SQL oracle replays it exactly;
    the recursion is unrolled, which is why ``max_lag`` is capped at
    4 — deeper orders belong to a fitted AR model, not a screening
    diagnostic). A lag whose ACF is missing (no pairs / zero
    variance) or whose D–L denominator is exactly 0 yields NULL pacf
    — NULL propagates through later lags (no information, surfaced).

    Scale shape (100 TB): :func:`autocorrelation`'s join shape (one
    sufficient-stats agg + broadcast lag spine + one keyed self-join),
    then ONE key-cardinality conditional-agg pivot of the ≤ 4 ACF
    values and a map-only projection + 4-literal posexplode — the
    recursion itself touches no data rows at all.

    Extension surface — the reference has no time-series stage;
    extension per SURVEY §8, completing the lag-diagnostic family
    (ACF / CCF / PACF).
    """
    if not key_cols:
        raise ValueError("pacf_by_key needs at least one key column")
    if not 1 <= max_lag <= 4:
        raise ValueError(
            f"pacf_by_key unrolls Durbin-Levinson to lag 4; got "
            f"max_lag={max_lag} (fit an AR model for deeper orders)"
        )
    acf = autocorrelation(
        series, key_cols, t_col, value_col, max_lag=max_lag, decimals=12
    )
    r = {
        k: F.max(F.when(F.col("lag") == k, F.col("acf")))
        for k in range(1, max_lag + 1)
    }
    piv = acf.groupBy(*key_cols).agg(
        *[r[k].alias(f"__r{k}") for k in range(1, max_lag + 1)]
    )
    r1 = F.col("__r1")
    cols = [r1]
    if max_lag >= 2:
        r2 = F.col("__r2")
        den2 = 1.0 - r1 * r1
        p2 = F.when(den2 != 0, (r2 - r1 * r1) / den2)
        phi21 = r1 - p2 * r1
        cols.append(p2)
    if max_lag >= 3:
        r3 = F.col("__r3")
        num3 = r3 - phi21 * r2 - p2 * r1
        den3 = 1.0 - phi21 * r1 - p2 * r2
        p3 = F.when(den3 != 0, num3 / den3)
        phi31 = phi21 - p3 * p2
        phi32 = p2 - p3 * phi21
        cols.append(p3)
    if max_lag >= 4:
        r4 = F.col("__r4")
        num4 = r4 - phi31 * r3 - phi32 * r2 - p3 * r1
        den4 = 1.0 - phi31 * r1 - phi32 * r2 - p3 * r3
        cols.append(F.when(den4 != 0, num4 / den4))
    stacked = piv.select(
        *key_cols,
        F.posexplode(
            F.array(*[F.round(c, decimals) for c in cols])
        ).alias("__pos", "pacf"),
    )
    return stacked.select(
        *key_cols,
        (F.col("__pos") + 1).cast("long").alias("lag"),
        "pacf",
    )
