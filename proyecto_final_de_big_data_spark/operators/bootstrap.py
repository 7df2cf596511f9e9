"""Poisson-bootstrap confidence intervals — distribution-free
uncertainty for per-group means in ONE pass over the data.

The classical bootstrap resamples the frame R times (R full scans, and
an exact n-row multinomial draw needs global coordination). The Poisson
bootstrap (Chamandy et al., "Estimating Uncertainty for Massive Data
Streams", Google 2012) replaces the multinomial with independent
per-row Poisson(1) replicate weights: replicate r's mean is
``Σ w_r·x / Σ w_r``. Each weight depends only on the row's own key and
the replicate index, so ALL R replicates compute in a single scan with
map-side partial aggregation, and the result is embarrassingly
mergeable — the shape that survives 100 TB.

Determinism: the draw is the house portable md5 band — ``u = md5_fold
(key:salt:r) / 2^60`` — pushed through the inverse CDF of Poisson(1)
(literal cumulative thresholds, truncated at w=6 where the omitted tail
mass is 8.3e-6; the truncation is part of the operator's documented
semantics and the oracle restates it identically). Same rows, same
salt ⇒ bit-identical replicates on every engine, run, and
partitioning — a DuckDB oracle can hash-match the CI itself, not just
the point estimate.

Scale shape: ``posexplode(sequence(0, R))`` inflates rows R+1× BEFORE
a groupBy on (group, replicate) — CPU O(R·N) is the irreducible
bootstrap cost, but partial aggregation collapses each task's output
to (groups × R+1) rows before the shuffle, and the quantile step runs
at answer scale (R values per group). Replicate 0 is pinned to weight
1, so the exact sample mean rides the same single pass.

Extension surface — the reference has no uncertainty machinery
(`/root/reference` computes only point-estimate marts, README.md:60-90).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .mixing import _md5_fold

# Cumulative Poisson(1) probabilities P(X <= k), k = 0..5; u beyond the
# last threshold draws the truncation cap w = 6.
_POISSON1_CDF = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286055,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
)
_CAP = 6
_BAND = float(1 << 60)  # md5 fold is 15 hex chars < 2^60


def _poisson1_weight(u: Column) -> Column:
    """Inverse-CDF Poisson(1) draw from a uniform ``u`` in [0, 1)."""
    expr = None
    for k, t in enumerate(_POISSON1_CDF):
        branch = F.when(u < F.lit(t), F.lit(k))
        expr = branch if expr is None else expr.when(u < F.lit(t), F.lit(k))
    assert expr is not None
    return expr.otherwise(F.lit(_CAP))


def poisson_bootstrap_mean(
    df: DataFrame,
    key_col: str,
    value_col: str,
    group_cols: list[str] | None = None,
    n_replicates: int = 100,
    alpha: float = 0.05,
    salt: str = "boot",
) -> DataFrame:
    """Per-group mean with a percentile-bootstrap CI, one scan total:

    ``(group..., n_units, mean, se_boot, ci_low, ci_high, n_replicates)``

    - ``mean`` is the EXACT sample mean (replicate 0, weight pinned 1);
    - ``se_boot`` is the sample standard deviation of the R replicate
      means — the bootstrap standard error;
    - ``ci_low/ci_high`` are the alpha/2 and 1-alpha/2 interpolated
      percentiles of the replicate means (the percentile bootstrap);
    - a replicate whose weights all drew 0 (probability ~e^-n) has a
      NULL mean and drops out of the percentile/stddev in both engines
      identically.

    Rows with NULL/NaN values are excluded up front. Statistics round
    to 6 decimals so engines agree to the hash.
    """
    if n_replicates < 2:
        raise ValueError(
            f"poisson_bootstrap_mean needs n_replicates >= 2; got {n_replicates}"
        )
    groups = list(group_cols or [])
    x = F.col(value_col).cast("double")
    clean = df.filter(x.isNotNull() & ~F.isnan(x)).select(
        *groups, F.col(key_col).alias("__bk"), x.alias("__bx")
    )
    r = F.col("__br")
    # NULL keys fold as the empty string (the _md5_fold convention) —
    # concat_ws would silently SKIP a NULL element, dropping its
    # separator and diverging from the oracle's coalesce-to-'' form.
    u = _md5_fold(
        F.concat_ws(
            ":",
            F.coalesce(F.col("__bk").cast("string"), F.lit("")),
            F.lit(salt),
            r,
        )
    ) / F.lit(_BAND)
    w = F.when(r == 0, F.lit(1)).otherwise(_poisson1_weight(u)).cast("double")
    exploded = clean.select(
        *groups,
        "__bk",
        "__bx",
        F.explode(F.sequence(F.lit(0), F.lit(n_replicates))).alias("__br"),
    ).select(*groups, r.alias("__br"), w.alias("__bw"), F.col("__bx"))
    per_rep = exploded.groupBy(*groups, "__br").agg(
        F.sum(F.col("__bw") * F.col("__bx")).alias("__swx"),
        F.sum("__bw").alias("__sw"),
        F.count(F.lit(1)).alias("__n"),
    )
    rep_mean = F.when(F.col("__sw") > 0, F.col("__swx") / F.col("__sw"))
    shaped = per_rep.select(
        *groups,
        "__br",
        "__n",
        rep_mean.alias("__m"),
    )
    boot = F.when(F.col("__br") > 0, F.col("__m"))
    out = shaped.groupBy(*groups).agg(
        F.max(F.when(F.col("__br") == 0, F.col("__n"))).alias("n_units"),
        F.round(F.max(F.when(F.col("__br") == 0, F.col("__m"))), 6).alias(
            "mean"
        ),
        F.round(F.stddev_samp(boot), 6).alias("se_boot"),
        F.round(
            F.percentile(boot, F.lit(alpha / 2.0)), 6
        ).alias("ci_low"),
        F.round(
            F.percentile(boot, F.lit(1.0 - alpha / 2.0)), 6
        ).alias("ci_high"),
        F.sum(F.when(F.col("__br") > 0, 1).otherwise(0)).alias(
            "n_replicates"
        ),
    )
    return out
