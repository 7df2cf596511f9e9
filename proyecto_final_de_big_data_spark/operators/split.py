"""Deterministic hash-based dataset splitting.

``randomSplit`` (reference L3) is seed-stable only for a fixed
partitioning — at 100 TB, re-partitioning the input silently reshuffles
examples between train and test. Large-scale training pipelines instead
split on a CONTENT hash of a stable key: every engine, run, and
partitioning assigns the same row to the same split, and splitting by a
GROUP key (user, document, session) keeps whole groups together — the
standard guard against train/test leakage through near-identical
group members.

Mechanism: ``md5(key)`` is uniform on hex strings, so hex-prefix
thresholds carve [0, 1) into split bands — e.g. 0.8 → rows whose first
8 md5 hex chars sort below ``"cccccccc"``. A pure projection: no
shuffle, no RNG state, pushdown-friendly, and exactly reproducible in
any engine with md5 (the DuckDB oracle states the same CASE expression
verbatim).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX_DIGITS = 8  # 32 bits of resolution: band error < 2.4e-10


def _hex_threshold(cum_fraction: float) -> str:
    """Hex string h such that P(md5-prefix < h) == round(f * 16^8) / 16^8."""
    scaled = round(cum_fraction * (16**_HEX_DIGITS))
    return format(min(scaled, 16**_HEX_DIGITS - 1), f"0{_HEX_DIGITS}x")


def split_column(key: Column | str, fractions: dict[str, float]) -> Column:
    """A split-label column assigning each distinct key value to one
    split with probability ~fractions[label] (error < 2.4e-10 per band).

    ``fractions`` must sum to 1 (within fp tolerance); insertion order
    defines the bands, so the same dict always produces the same
    assignment.
    """
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    key_col = F.col(key) if isinstance(key, str) else key
    prefix = F.substring(F.md5(key_col.cast("string")), 1, _HEX_DIGITS)
    out = None
    cum = 0.0
    labels = list(fractions.items())
    for label, frac in labels[:-1]:
        cum += frac
        cond = prefix < F.lit(_hex_threshold(cum))
        out = F.when(cond, F.lit(label)) if out is None else out.when(cond, F.lit(label))
    last_label = labels[-1][0]
    return (F.lit(last_label) if out is None else out.otherwise(F.lit(last_label))).alias("split")


def hash_split(df: DataFrame, key: str, fractions: dict[str, float], out: str = "split") -> DataFrame:
    """``df`` plus a deterministic split-label column keyed on ``key``.

    Rows sharing a key always land in the same split (group-leakage
    guard); the assignment is stable across runs, partitionings, and
    engines.
    """
    return df.withColumn(out, split_column(key, fractions))


def split_case_sql(key_sql: str, fractions: dict[str, float], out: str = "split") -> str:
    """The equivalent ANSI/DuckDB CASE expression — used by oracle
    queries so engine and oracle state the SAME assignment."""
    parts = []
    cum = 0.0
    labels = list(fractions.items())
    for label, frac in labels[:-1]:
        cum += frac
        parts.append(
            f"WHEN substring(md5(CAST({key_sql} AS VARCHAR)), 1, {_HEX_DIGITS})"
            f" < '{_hex_threshold(cum)}' THEN '{label}'"
        )
    return "CASE " + " ".join(parts) + f" ELSE '{labels[-1][0]}' END AS {out}"


def cluster_safe_split(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    fractions: dict[str, float],
    out: str = "split",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Leakage-safe split at near-duplicate-CLUSTER granularity.

    ``hash_split`` keyed on the document id still lets two NEAR-duplicate
    documents land in different splits — the classic train/eval leak that
    inflates held-out metrics (an eval doc whose 95%-identical twin was
    trained on). Here the split key is the connected component of the
    near-dup pair graph: every member of a dup cluster receives the split
    of its component label (the cluster's minimum id), so a cluster is
    atomically train OR eval; docs with no near-dup split by their own id
    as before.

    ``pairs`` is any near-dup edge list — exact n-gram Jaccard,
    MinHash-LSH, SimHash, or embedding-cosine pairs all produce the
    ``(id_a, id_b)`` shape this consumes.

    Scale shape: components run on the EDGE LIST only (dedup-pair scale,
    orders of magnitude below corpus scale); the one corpus-side cost is
    a single equi-join of the component map onto ``df``, which AQE
    broadcasts whenever the dup set is small. The split itself stays a
    pure projection of the joined key — deterministic across runs,
    partitionings, and engines (same md5 banding as ``hash_split``).
    """
    from .graph import connected_components

    comp = connected_components(pairs, src, dst).select(
        F.col("node").alias(id_col), F.col("component").alias("__cs_component")
    )
    joined = df.join(comp, id_col, "left")
    key = F.coalesce(F.col("__cs_component"), F.col(id_col))
    return joined.withColumn(out, split_column(key, fractions)).drop("__cs_component")


def stratified_hash_sample(
    df: DataFrame,
    key: str,
    fractions: dict[str, float],
    stratum_col: str,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum sampling: keep each row with
    probability ``fractions[stratum]`` decided by the md5 band of its
    ``key`` — the quota-sampling step of corpus curation (e.g. keep 10%
    of English, 100% of low-resource languages) made reproducible.

    ``sampleBy`` (the RNG equivalent) draws per-partition random
    numbers: resuming a pipeline, changing partitioning, or re-running
    on another cluster yields a DIFFERENT sample. Hash banding keys the
    decision to row content, so every engine and run keeps exactly the
    same rows (the DuckDB oracle re-states the same predicate), rows
    sharing a key stay together, and the filter is a pure projection —
    no shuffle, no RNG state, pushdown-friendly.

    Strata absent from ``fractions`` — including NULL strata — fall
    back to ``default_fraction`` (0.0 = drop, the curation default for
    unexpected strata: failing open would silently flood the sample).
    A fraction >= 1.0 keeps EVERY row of its stratum (explicit
    short-circuit: the hex band ``prefix < 'ffffffff'`` alone would
    silently drop the ~2^-32 of rows whose md5 prefix is exactly
    'ffffffff' — ~25 rows per 100 billion in a keep-everything
    stratum).
    """
    key_col = F.col(key).cast("string")
    prefix = F.substring(F.md5(key_col), 1, _HEX_DIGITS)

    def band(frac: float):
        if frac >= 1.0:
            return F.lit(True)
        if frac <= 0.0:
            return F.lit(False)
        return prefix < F.lit(_hex_threshold(frac))

    cond = None
    for stratum, frac in fractions.items():
        this = (F.col(stratum_col) == F.lit(stratum)) & band(frac)
        cond = this if cond is None else cond | this
    # coalesce: `col NOT IN (...)` is NULL (not True) for a NULL
    # stratum, which would silently drop NULL-stratum rows regardless
    # of default_fraction.
    others = F.coalesce(
        ~F.col(stratum_col).isin(list(fractions)), F.lit(True)
    ) & band(default_fraction)
    cond = others if cond is None else cond | others
    return df.where(cond)


def stratified_sample_predicate_sql(
    key_sql: str, fractions: dict[str, float], stratum_sql: str, default_fraction: float = 0.0
) -> str:
    """The equivalent ANSI/DuckDB WHERE predicate — oracle queries state
    the SAME keep-decision verbatim (including the frac>=1.0
    short-circuit and NULL-stratum default handling above)."""
    prefix = f"substring(md5(CAST({key_sql} AS VARCHAR)), 1, {_HEX_DIGITS})"

    def band_sql(frac: float) -> str:
        if frac >= 1.0:
            return "TRUE"
        if frac <= 0.0:
            return "FALSE"
        return f"{prefix} < '{_hex_threshold(frac)}'"

    clauses = [
        f"({stratum_sql} = '{s}' AND {band_sql(f)})" for s, f in fractions.items()
    ]
    strata = ", ".join(f"'{s}'" for s in fractions)
    clauses.append(
        f"(({stratum_sql} IS NULL OR {stratum_sql} NOT IN ({strata}))"
        f" AND {band_sql(default_fraction)})"
    )
    return "(" + " OR ".join(clauses) + ")"


def systematic_weighted_sample(
    df: DataFrame,
    weight_col: str,
    stride: int,
    order_col: str,
    by: list[str] | None = None,
) -> DataFrame:
    """Weight-proportional systematic sample: walking rows in the
    deterministic ``order_col`` order, a row is selected iff its
    cumulative-weight interval crosses a multiple of ``stride`` — so
    every run of ``stride`` weight units contributes exactly one row,
    a row's selection odds are ``weight/stride`` (weights above the
    stride are always taken), and the expected sample size is
    ``total_weight/stride``. The importance-sampling workhorse for
    token-budgeted corpus selection when you need ROWS (not the
    aggregate threshold of ``operators/selection.py``).

    Everything is INTEGER arithmetic (integral weights, integer
    ``div``), so the selected set is bit-identical on any engine — no
    float cumsum boundary cases — and fully restatable in SQL.

    ``by`` names stratum columns: the cumulative window runs PER
    STRATUM, which is both the leakage-safe formulation (per-source /
    per-language budgets) and the scale-safe one — a global cumulative
    sum would order the whole corpus through one window (same funnel
    the module docstring of ``operators/packing.py`` bans); with
    ``by=None`` a single global window is used and only acceptable for
    answer-scale inputs (a WARNING is logged).
    """
    from ..utils.logging import get_logger

    if stride <= 0:
        raise ValueError(f"stride must be positive, got {stride}")
    from pyspark.sql import Window

    if by:
        w = Window.partitionBy(*by).orderBy(order_col)
    else:
        get_logger("split").warning(
            "systematic_weighted_sample without strata uses ONE global "
            "window — fine for answer-scale frames, a funnel at corpus "
            "scale; pass by=[...] for per-stratum budgets"
        )
        w = Window.orderBy(order_col)
    # The integer-exact contract requires an INTEGRAL weight column —
    # a float weight would silently make the crossing arithmetic
    # inconsistent with the long cumsum, so reject it loudly.
    wtype = dict(df.dtypes).get(weight_col)
    if wtype not in ("tinyint", "smallint", "int", "bigint"):
        raise ValueError(
            f"systematic_weighted_sample needs an integral weight "
            f"column; {weight_col!r} is {wtype!r} — cast explicitly "
            "(and decide the rounding) before sampling"
        )
    w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cast_w = F.col(weight_col).cast("long")
    cum = F.sum(cast_w).over(w)
    # Both the cumsum and the crossing predicate use the SAME cast
    # weight, staged under internal names so no user identifier is ever
    # interpolated into SQL text (backtick/injection hazard).
    staged = df.withColumn("__cum", cum).withColumn("__w", cast_w)
    crossed = F.expr(
        f"(__cum div {int(stride)}) > ((__cum - __w) div {int(stride)})"
    )
    return staged.filter(crossed).drop("__cum", "__w")


def weighted_sample_k(
    df: DataFrame,
    key: str,
    weight_col: str,
    k: int,
    by: list[str] | None = None,
    salt: str = "wsk",
) -> DataFrame:
    """EXACTLY-k weighted sampling WITHOUT replacement per group — the
    Efraimidis–Spirakis A-ES scheme (IPL 2006, public literature) made
    deterministic: each row draws u ∈ (0,1) from the portable md5 band
    of ``(salt, key)`` and wins on the largest ``u^(1/w)``, computed in
    the numerically-stable monotone-equivalent form ``ln(u)/w`` (the
    literal ``u^(1/w)`` underflows for tiny weights). The top-k rows by
    that sort key ARE a weight-proportional without-replacement sample
    — and because u is content-keyed, the selected set is identical
    across runs, partitionings, and engines (the ``hash_split``
    determinism contract; an RNG-based A-ES can never be
    hash-verified).

    Complements :func:`systematic_weighted_sample`: that one selects a
    weight-proportional FRACTION via cumulative strides (rows with
    weight above the stride are certain picks); this one yields an
    EXACT per-group k. Non-positive or NULL weights are excluded (a
    zero-weight row can never win; a negative weight has no A-ES
    meaning) — documented, not an error, matching weighted-sampling
    practice.

    Scale shape: the sort key is a pure projection; per-group top-k is
    a k-bounded window on the group key (global top-k compiles to
    TakeOrderedAndProject when ``by`` is empty). One shuffle.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    by = by or []
    from pyspark.sql import Window

    w = F.col(weight_col).cast("double")
    # u in (0, 1]: (band + 1) / 16^15 over 15 md5 hex chars — never 0,
    # so ln(u) is finite; u == 1 gives ln 0 = sort key 0, the maximum.
    # The +1 happens in INTEGER space before the double cast: band is
    # 60 bits, beyond double granularity, so double(band) + 1.0 would
    # be absorbed for ~1/128 of keys while the oracle's
    # (bigint+1)::DOUBLE rounds band+1 — a 1-ulp divergent draw and a
    # cross-engine selection flip. Integer-first matches the oracle
    # bit for bit.
    band1 = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(":", F.lit(salt), F.col(key).cast("string"))
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        + F.lit(1).cast("long")
    )
    u = band1.cast("double") / F.lit(float(16**15))
    es_key = F.log(u) / w
    # Internal columns are rename-guarded (a caller's own `rank` or
    # `__es` column must survive), so the window runs on private names
    # and the output restores exactly the input column set.
    staged = df.filter(w.isNotNull() & (w > 0)).withColumn(
        "__es_wsk", es_key
    )
    w_rank = Window.partitionBy(*by).orderBy(
        F.desc("__es_wsk"), F.asc(key)
    )
    top = staged.withColumn("__rn_wsk", F.row_number().over(w_rank)).filter(
        F.col("__rn_wsk") <= k
    )
    return top.select(*df.columns)


def neyman_allocation(
    df: DataFrame,
    stratum_cols: list[str],
    value_col: str,
    total_n: int,
    decimals: int = 6,
) -> DataFrame:
    """Optimal (Neyman) stratified-sample allocation under a total
    budget (Neyman, JRSS 1934 / Cochran, "Sampling Techniques" §5.5 —
    public literature): how many units to sample from each stratum so
    a stratified mean estimator has minimum variance — ``n_h ∝
    N_h·S_h`` — the design readout you run before sampling a 100 TB
    corpus for eval or labeling (big AND volatile strata earn samples;
    big-but-uniform strata don't).

    One row per stratum: ``(*stratum_cols, n_records, stddev,
    n_alloc)`` with ``Σ n_alloc == total_n`` exactly. Integer-exact
    largest-remainder (Hamilton) apportionment: per-stratum weights
    ``w_h = N_h · round(S_h, 6)`` are scaled to integers ``wi =
    round(1000·w_h)``, each stratum gets ``floor(total_n·wi/W)``, and
    the leftover seats go to the largest remainders ``(total_n·wi)
    mod W`` (ties to the first stratum in column order) — every
    comparison is BIGINT arithmetic, so the allocation is reproducible
    across engines/partitionings bit-for-bit (the mixing.py
    integer-limb posture). The bit-exactness claim holds while
    ``total_n · W`` (W = Σ wi, wi ≈ 1000·N_h·S_h — so e.g. N_h ≈ 1e12
    with S_h ≈ 1e4 already exceeds 2⁶³ under a 1000-unit budget) fits
    in a signed 64-bit long; the plan hard-fails with a friendly
    in-plan error past that bound instead of wrapping silently (W is
    summed in DECIMAL(38,0) on the way to the check, so the guard
    itself cannot wrap; wi ≤ W makes the one W-level check cover every
    per-stratum product too) — rescale ``value_col`` (S_h is
    scale-covariant, the allocation is scale-invariant) if you
    genuinely hold such strata. (Independently, wi itself rides a
    double rounding and is integer-exact only below 2⁵³ — same
    rescaling remedy.) ``S_h`` is the population stddev from
    moment sums (clamped at 0); NULL/NaN values are excluded. When
    every weight is 0 (all strata constant) the allocation is
    undefined and ``n_alloc`` is NULL (reported honestly). Note the
    allocation may exceed a small stratum's population — classic
    Neyman behavior; cap and re-normalize downstream if sampling
    without replacement from tiny strata.

    Scale shape: ONE stratum-cardinality moment aggregation (map-side
    combined), a 1-row scalar crossJoin for W, and one answer-scale
    window over the STRATUM frame for the remainder ranking — never
    over rows.

    Extension surface — the reference has no sampling-design stage;
    extension per SURVEY §8, the design sibling of the deterministic
    samplers above.
    """
    if not stratum_cols:
        raise ValueError("neyman_allocation needs at least one stratum column")
    if total_n < 1:
        raise ValueError(f"total_n must be >= 1, got {total_n}")
    from pyspark.sql import Window

    v = F.col(value_col).cast("double")
    clean = df.filter(v.isNotNull() & ~F.isnan(v))
    mom = clean.groupBy(*stratum_cols).agg(
        F.count(F.lit(1)).alias("n_records"),
        F.sum(v).alias("__sx"),
        F.sum(v * v).alias("__sxx"),
    )
    nf = F.col("n_records").cast("double")
    sd = F.round(
        F.sqrt(
            F.greatest(
                (nf * F.col("__sxx") - F.col("__sx") * F.col("__sx"))
                / (nf * nf),
                F.lit(0.0),
            )
        ),
        decimals,
    )
    weighted = mom.select(
        *stratum_cols,
        "n_records",
        sd.alias("stddev"),
        F.round(F.col("n_records") * sd * F.lit(1000.0), 0)
        .cast("long")
        .alias("__wi"),
    )
    # Overflow guard IN-PLAN (raise_error, keeps construction lazy):
    # the seat arithmetic below multiplies total_n * __wi in BIGINT and
    # divides/mods by W = Σwi, so BOTH every product and W itself must
    # fit a signed long. One guard covers both: wi <= W (weights are
    # non-negative), so W <= (2^63-1) div total_n bounds every
    # total_n*wi too — and W is summed in DECIMAL(38,0), which cannot
    # itself wrap on the way to the check (a plain long sum would
    # overflow silently under Spark's non-ANSI default, which is
    # exactly the failure this guard exists to surface).
    wi_cap = (2**63 - 1) // int(total_n)
    w_dec = F.sum(F.col("__wi").cast("decimal(38,0)"))
    w_checked = F.when(
        F.coalesce(w_dec, F.lit(0).cast("decimal(38,0)"))
        <= F.lit(wi_cap).cast("decimal(38,0)"),
        w_dec.cast("long"),
    ).otherwise(
        F.raise_error(
            F.format_string(
                "neyman_allocation: weight sum %s exceeds "
                f"(2^63-1) div total_n = {wi_cap} — total_n * wi "
                "would overflow BIGINT; rescale value_col (the "
                "allocation is scale-invariant) or shrink the budget",
                w_dec.cast("string"),
            )
        ).cast("long")
    )
    w_frame = weighted.agg(w_checked.alias("__W"))
    quota = weighted.crossJoin(F.broadcast(w_frame)).select(
        *stratum_cols,
        "n_records",
        "stddev",
        F.when(
            F.col("__W") > 0,
            F.expr(f"({total_n} * __wi) div __W"),
        ).alias("__base"),
        F.when(
            F.col("__W") > 0,
            (F.lit(total_n) * F.col("__wi")) % F.col("__W"),
        ).alias("__rem"),
        F.col("__W"),
    )
    seat_rank = Window.orderBy(
        F.desc("__rem"), *[F.asc(c) for c in stratum_cols]
    )
    leftover = F.lit(total_n) - F.sum("__base").over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    ranked = quota.withColumn("__seat", F.row_number().over(seat_rank)).withColumn(
        "__left", leftover
    )
    return ranked.select(
        *stratum_cols,
        "n_records",
        "stddev",
        F.when(
            F.col("__W") > 0,
            F.col("__base")
            + F.when(F.col("__seat") <= F.col("__left"), 1).otherwise(0),
        )
        .cast("long")
        .alias("n_alloc"),
    )
