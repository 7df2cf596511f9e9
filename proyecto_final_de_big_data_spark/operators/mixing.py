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
_KNUTH_HI = 1999999973
_RESOLUTION = 1_000_000
# Keys are first folded into [0, 1e12) so every later product stays
# far below 2^63: a raw key * KNUTH would overflow int64 for keys
# >= ~3.47e9 (job failure under Spark's ANSI default, silent negative
# band — row always kept — with ANSI off).
_KEY_SPAN = 1_000_000_000_000


def hash_band(key_col) -> F.Column:
    """Exact-integer pseudo-uniform band in [0, 1e6) from an integer key.

    Overflow- and sign-safe by construction: ``pmod`` folds the key
    into [0, 1e12), the two 10^6 limbs are mixed with independent odd
    constants (so ids differing only above the low limb still spread),
    and the largest intermediate is < 5e15 — no int64 wrap, identical
    BIGINT arithmetic in any engine (``hash_band_sql`` states the same
    expression for oracles). Keys >= 1e12 alias onto the folded span —
    acceptable for a sampling band, documented here.

    NULL keys band to 0 (coalesce before the arithmetic): a NULL would
    otherwise propagate through the whole expression and the downstream
    ``band < rate`` filter would drop the row SILENTLY — sampling must
    be deterministic, not key-hygiene-dependent. Integer-castable keys
    only; for string/binary keys use :func:`key_band`, which folds them
    through md5 first (a bare ``cast('long')`` on a non-numeric string
    is NULL, which would send every row to band 0).
    """
    c = F.col(key_col) if isinstance(key_col, str) else key_col
    k = F.pmod(F.coalesce(c.cast("long"), F.lit(0)), F.lit(_KEY_SPAN))
    lo = k % F.lit(_RESOLUTION)
    # (k - lo) is an exact multiple of RESOLUTION and < 2^40, so the
    # double division is exact and the cast loses nothing.
    hi = ((k - lo) / F.lit(_RESOLUTION)).cast("long")
    return F.pmod(lo * F.lit(_KNUTH) + hi * F.lit(_KNUTH_HI), F.lit(_RESOLUTION))


def hash_band_sql(key_sql: str) -> str:
    """The equivalent ANSI/DuckDB expression — oracles state the SAME
    band arithmetic (pure BIGINT; `//` floor-division on the
    already-non-negative folded key)."""
    k = f"(((coalesce({key_sql}, 0)) % {_KEY_SPAN} + {_KEY_SPAN}) % {_KEY_SPAN})"
    return (
        f"((({k} % {_RESOLUTION}) * {_KNUTH}"
        f" + ({k} // {_RESOLUTION}) * {_KNUTH_HI}) % {_RESOLUTION})"
    )


_INTEGRAL_TYPES = {"byte", "short", "int", "integer", "bigint", "long"}


def _md5_fold(c: F.Column) -> F.Column:
    """Portable string-key → BIGINT fold: the first 15 md5 hex chars as
    an integer (< 2^60, no int64 wrap). NULL keys fold as the empty
    string — deterministic, never a silent drop."""
    h = F.md5(F.coalesce(c.cast("string"), F.lit("")))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long")


def md5_fold_sql(key_sql: str) -> str:
    """DuckDB twin of the md5 fold (hex-literal cast)."""
    return (
        f"(('0x' || substr(md5(coalesce(CAST({key_sql} AS VARCHAR), ''))"
        f", 1, 15))::BIGINT)"
    )


def key_band(df: DataFrame, key_col: str) -> F.Column:
    """Schema-aware band: integer-typed keys go straight to
    :func:`hash_band`; everything else (string/uuid/binary ids) folds
    through md5 first. The naive alternative — ``cast('long')`` on a
    string id — is NULL, which under the old code silently dropped
    EVERY row of a string-keyed corpus (or failed the job under ANSI
    mode). Restate with :func:`key_band_sql` on the same type test.
    """
    dtype = df.schema[key_col].dataType.simpleString()
    if dtype in _INTEGRAL_TYPES:
        return hash_band(key_col)
    return hash_band(_md5_fold(F.col(key_col)))


def key_band_sql(key_sql: str, integral: bool = True) -> str:
    """SQL twin of :func:`key_band`; pass ``integral=False`` for
    string-keyed corpora."""
    return hash_band_sql(key_sql if integral else md5_fold_sql(key_sql))


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
    the stratum's ``n_docs``/``scaled_rate`` columns attached.

    NULL strata are a stratum: the rate join is null-safe (``<=>``), so
    rows with a NULL stratum get their own group's rate instead of the
    old behavior — counted by ``temperature_rates`` (where a tiny NULL
    group could become ``n_min`` and deflate every real stratum) but
    then silently DROPPED by the equi-join. If NULL strata are garbage,
    filter them out before mixing; this operator won't eat them for
    you. String/uuid keys are supported via the schema-aware
    :func:`key_band` (an integer cast on them would be NULL).
    """
    rates = temperature_rates(df, stratum_col, alpha).withColumnRenamed(
        stratum_col, "__stratum"
    )
    return (
        df.join(
            F.broadcast(rates),
            F.col(stratum_col).eqNullSafe(F.col("__stratum")),
        )
        .drop("__stratum")
        .filter(key_band(df, key_col) < F.col("scaled_rate"))
    )


def epoch_weights(df: DataFrame, stratum_col: str, alpha: float = 0.5) -> DataFrame:
    """Per-stratum REPEAT factors for temperature-``alpha`` upsampling:
    ``(stratum_col, n_docs, w_scaled)`` with
    ``w_scaled = round(1e6 * (n_s / n_max)^(alpha-1))``.

    Normalized so the LARGEST stratum trains exactly one epoch and every
    rarer stratum repeats ``>= 1`` times — the mirror image of
    :func:`temperature_rates` (which keeps the rarest at 100% and throws
    data away). Upsampling preserves every document; the cost moves from
    discarded data to corpus volume, which is the trade training
    pipelines usually want for low-resource strata.
    """
    counts = df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("n_docs"))
    nmax = counts.agg(F.max("n_docs").alias("n_max"))
    return (
        counts.crossJoin(F.broadcast(nmax))
        .withColumn(
            "w_scaled",
            F.round(
                F.lit(float(_RESOLUTION))
                * F.pow(F.col("n_docs") / F.col("n_max"), F.lit(alpha - 1.0)),
                0,
            ).cast("long"),
        )
        .drop("n_max")
    )


def epoch_upsample(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    alpha: float | None = None,
    weights: dict[str, float] | None = None,
    out: str = "epoch",
) -> DataFrame:
    """Deterministic fractional-epoch resampling: each row of stratum
    ``s`` with repeat factor ``w_s`` is emitted ``floor(w_s)`` times,
    plus one more for the hash-band fraction ``frac(w_s)`` of rows —
    so the stratum's expected volume is exactly ``w_s × n_s`` and the
    realized copy count per ROW is a pure function of its key. The
    ``out`` column numbers the copies 1..n (the "epoch" index) so
    downstream packing/shuffling can interleave epochs.

    Two modes (mutually exclusive; no argument at all means
    ``alpha=0.5``): ``alpha`` derives ``w_s = (n_s/n_max)^(alpha-1) >= 1``
    from the corpus (one aggregation + broadcast — see
    :func:`epoch_weights`); an explicit ``weights`` dict maps strata to
    arbitrary factors with absent strata defaulting to 1.0, and factors
    BELOW 1 degrade gracefully to deterministic downsampling (0 full
    copies + fractional keep) — one operator expresses the whole
    up/down mixing plan.

    Scale shape: the explode multiplies row COUNT before any wide op,
    but adds no shuffle — weights arrive by broadcast (or a literal
    when-chain in dict mode), the copy decision is the same exact-integer
    band as :func:`temperature_mix`, and ``sequence(1, n)`` is only
    evaluated after an ``n >= 1`` filter (``sequence`` infers a NEGATIVE
    step when start > stop, so an unguarded ``sequence(1, 0)`` would
    emit [1, 0] — two phantom copies — instead of zero rows).
    Materializing epochs at curation time is deliberate: the written
    corpus is exactly what the trainer reads, with no sampling state
    smuggled into the training loop.
    """
    if weights is not None and alpha is not None:
        raise ValueError("pass at most one of alpha= or weights=")
    if weights is None and alpha is None:
        alpha = 0.5  # documented default: temperature-0.5 weights
    if weights is None:
        rates = epoch_weights(df, stratum_col, alpha).select(
            F.col(stratum_col).alias("__stratum"), "w_scaled"
        )
        joined = df.join(
            F.broadcast(rates),
            F.col(stratum_col).eqNullSafe(F.col("__stratum")),
        ).drop("__stratum")
    else:
        if any(w < 0 for w in weights.values()):
            raise ValueError("repeat factors must be >= 0")
        w_col = None
        for s, w in weights.items():
            scaled = F.lit(int(round(w * _RESOLUTION)))
            cond = F.col(stratum_col) == F.lit(s)
            w_col = F.when(cond, scaled) if w_col is None else w_col.when(cond, scaled)
        w_col = F.lit(_RESOLUTION) if w_col is None else w_col.otherwise(F.lit(_RESOLUTION))
        joined = df.withColumn("w_scaled", w_col)
    frac = F.col("w_scaled") % F.lit(_RESOLUTION)
    # (w - frac) is an exact multiple of RESOLUTION, so the double
    # division is exact and the cast loses nothing (same limb split as
    # hash_band above).
    full = ((F.col("w_scaled") - frac) / F.lit(_RESOLUTION)).cast("long")
    n = full + (key_band(df, key_col) < frac).cast("long")
    return (
        joined.withColumn("__n", n)
        .filter(F.col("__n") >= 1)
        .withColumn(out, F.explode(F.sequence(F.lit(1).cast("long"), F.col("__n"))))
        .drop("__n", "w_scaled")
    )


def cap_per_group(
    df: DataFrame,
    group_cols: list[str] | str,
    id_col: str,
    cap: int,
    score_col: str | None = None,
    prune_min_rows: int = 5_000_000,
    prune_accuracy: int = 10_000,
) -> DataFrame:
    """Per-group contribution cap (the Gopher/RefinedWeb per-domain
    cap): keep at most ``cap`` rows per group — the ``cap`` best by
    ``score_col`` (ties, or no score at all, broken by ascending
    ``id_col``, so the kept set is deterministic across engines, runs,
    and partitionings).

    Temperature mixing (:func:`temperature_mix`) rescales strata
    multiplicatively; a cap is the complementary HARD bound — one
    megadomain (or one spammy source) cannot contribute more than
    ``cap`` documents no matter how large it is.

    Scale shape — the point of this implementation is what it does NOT
    sort. A naive ``row_number`` over every group sorts the whole
    corpus. Here one map-side-combined aggregation finds the groups
    actually over the cap; with a long-tail group distribution that set
    is small, so it broadcasts, and the corpus splits into:

    - under-cap rows → kept verbatim, no sort, no shuffle beyond the
      broadcast-hash probe;
    - over-cap rows (only those groups' rows) → ``row_number`` window
      partitioned by group, ``<= cap`` filter.

    NULL group keys are a group (null-safe grouping is ``groupBy``'s
    native behavior, and the split predicates below use a null-safe
    probe), matching :func:`temperature_mix`'s stance: this operator
    never silently eats rows.

    MEGAGROUP PRE-PRUNE (the SCALE.md refinement, wired): a single
    over-cap group with billions of rows would still land its
    ``row_number`` sort on one window partition. When ``score_col`` is
    given, groups with at least ``prune_min_rows`` rows get a per-group
    score-threshold pre-filter BEFORE the window: one map-side-combined
    ``percentile_approx`` pass (partials merge across partitions — the
    megagroup's rows never co-locate for it) picks a threshold
    GUARANTEED at-or-below the true cap-th score, so filtering
    ``score >= threshold`` keeps every possible top-``cap`` row and the
    window then sorts ~``cap + 2·rows/accuracy`` survivors instead of
    the whole group. Exactness argument: ``percentile_approx`` at
    accuracy A returns a value whose true rank is within m/A of the
    requested rank (m = non-null scores); requesting the ascending
    fraction ``1 − (cap + 2m/A)/m`` — floored further down to a fixed
    ladder, since the fraction argument must be foldable — lands a
    value whose DESCENDING rank is ≥ cap, i.e. a lower bound on the
    cut. Ties at the threshold are all kept; the top-``cap`` rows all
    carry non-NULL scores ≥ threshold whenever a threshold exists at
    all (NULL threshold ⇒ no prune). Groups ordered by ``id_col`` only
    (no score) skip the prune — at megagroup scale give the operator a
    score, even a hash of the id.
    """
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    sized = (
        df.groupBy(*groups)
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") > cap)
    )
    over = sized.select(*groups)

    def _probe(left: DataFrame, right: DataFrame, how: str) -> DataFrame:
        cond = None
        for g in groups:
            c = left[g].eqNullSafe(right[g])
            cond = c if cond is None else (cond & c)
        return left.join(F.broadcast(right), cond, how)

    under_rows = _probe(df, over, "left_anti")
    over_rows = _probe(df, over, "left_semi")

    from pyspark.sql import Window

    if score_col is not None:
        # The prune costs ONE extra (mega-semi-filtered) aggregation
        # pass, and the window input is over_rows LEFT-joined to the
        # mega-group thresholds: non-mega groups (and all-NULL-score
        # mega groups) simply have no/NULL threshold and pass through.
        # No plain/mega split of over_rows — the r8 first cut split it
        # with an extra anti+semi pass, which cost +0.4 s even on
        # prune-free fixtures; with this shape, an empty mega set lets
        # AQE empty-relation propagation collapse the threshold
        # subtree entirely.
        mega = sized.where(F.col("__n") >= prune_min_rows).select(*groups)
        mega_rows = _probe(over_rows, mega, "left_semi")
        # One ladder of foldable fractions evaluated in ONE pass; each
        # group then reads the largest ladder level <= its own safe
        # fraction (flooring only lowers the threshold — still exact).
        ladder = [0.5, 0.9, 0.99, 0.999, 0.9999, 0.99999]
        sc = F.col(score_col)
        thr_stats = mega_rows.groupBy(*groups).agg(
            F.count(sc).cast("double").alias("__m"),
            F.percentile_approx(
                sc, F.lit(ladder), F.lit(prune_accuracy)
            ).alias("__qs"),
        )
        m = F.col("__m")
        # m == 0 (all scores NULL) must not divide: NULL fraction ->
        # NULL level -> NULL threshold -> no prune for that group.
        safe_frac = F.when(
            m > 0,
            F.lit(1.0)
            - ((F.lit(float(cap)) + F.lit(2.0) * m / prune_accuracy) / m),
        )
        level = sum(
            (F.lit(step) <= safe_frac).cast("int") for step in ladder
        )
        thr = thr_stats.select(
            *[F.col(g).alias(f"__tg_{i}") for i, g in enumerate(groups)],
            F.when(level >= 1, F.element_at("__qs", level)).alias("__thr"),
        )
        tcond = None
        for i, g in enumerate(groups):
            c = over_rows[g].eqNullSafe(thr[f"__tg_{i}"])
            tcond = c if tcond is None else (tcond & c)
        window_input = (
            over_rows.join(F.broadcast(thr), tcond, "left")
            .where(F.col("__thr").isNull() | (sc >= F.col("__thr")))
            .drop(*[f"__tg_{i}" for i in range(len(groups))], "__thr")
        )
    else:
        window_input = over_rows

    order = (
        [F.col(score_col).desc()] if score_col is not None else []
    ) + [F.col(id_col).asc()]
    w = Window.partitionBy(*groups).orderBy(*order)
    capped = (
        window_input.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= cap)
        .drop("__rn")
    )
    return under_rows.unionByName(capped)
