"""Binary-classifier evaluation at corpus scale — the offline metrics
the reference's training loop (scripts/04_train_sparkml.py:114-129)
stops short of: ROC AUC, thresholded confusion/PRF reports, and a
score-decile lift table for ranking quality.

Why bucketed AUC and not the rank-sum formula: the Mann-Whitney
statistic needs a GLOBAL rank over every scored row — a full sort of
the corpus. The ROC curve itself only needs the score axis quantized:
group scores into ``n_buckets`` fixed-width cells (ONE map-side-combined
shuffle at bucket cardinality), then walk the ≤n_buckets ROC points on
a single answer-scale partition. At 1024 buckets the trapezoidal AUC
is exact for any classifier whose decisions are constant within a
cell, and within 1/n_buckets of the exact rank AUC otherwise — the
standard distributed-AUC trade (Spark's own
BinaryClassificationMetrics downsamples the curve the same way).

Scale shape (100 TB): every operator here is one data-scale
aggregation (conditional sums / bucket counts, all map-side partial)
followed by answer-scale algebra; nothing sorts, windows, or collects
at row cardinality. The only window runs over ≤n_buckets (or
``n_bins``) rows.

Determinism: bucket assignment is pure IEEE arithmetic (no
transcendentals), so a DuckDB oracle replays it bit-for-bit; curve
sums are rounded at the gate's decimals.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _bucket(score: Column, lo: float, hi: float, n_buckets: int) -> Column:
    """Fixed-width score cell; out-of-range scores clamp into the edge
    cells (they are still maximal/minimal scores). Shared primitive —
    one definition owns the clamp semantics."""
    from ..operators.binning import fixed_width_bucket

    return fixed_width_bucket(score, lo, hi, n_buckets)


def roc_auc(
    df: DataFrame,
    score_col: Column | str,
    label_col: Column | str,
    lo: float,
    hi: float,
    n_buckets: int = 1024,
    decimals: int = 6,
) -> DataFrame:
    """One row ``(n, n_pos, n_neg, auc)`` — trapezoidal tie-corrected
    AUC over the bucketed ROC curve (ties within a cell contribute the
    half-credit rectangle, exactly the rank-AUC convention).

    ``score_col`` must already be a double in roughly [lo, hi];
    ``label_col`` is any boolean-castable column. NULL/NaN scores and
    NULL labels are excluded (a NULL bucket would otherwise ride the
    curve at an engine-dependent sort position).
    """
    if hi <= lo:
        raise ValueError(f"roc_auc needs hi > lo, got lo={lo}, hi={hi}")
    s = (F.col(score_col) if isinstance(score_col, str) else score_col).cast(
        "double"
    )
    y = (F.col(label_col) if isinstance(label_col, str) else label_col).cast(
        "boolean"
    )
    cells = (
        df.filter(s.isNotNull() & ~F.isnan(s) & y.isNotNull())
        .select(_bucket(s, lo, hi, n_buckets).alias("b"), y.alias("y"))
        .groupBy("b")
        .agg(
            F.sum(F.col("y").cast("long")).alias("tp"),
            F.sum((~F.col("y")).cast("long")).alias("fp"),
        )
    )
    # Descending score order; cum_tp is an exact long prefix sum over
    # <=n_buckets rows (single-partition window is answer-scale here).
    w = Window.orderBy(F.col("b").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    curve = cells.withColumn("cum_tp", F.sum("tp").over(w))
    return curve.agg(
        (F.sum("tp") + F.sum("fp")).alias("n"),
        F.sum("tp").alias("n_pos"),
        F.sum("fp").alias("n_neg"),
        F.round(
            F.when(
                (F.sum("tp") > 0) & (F.sum("fp") > 0),
                F.sum(
                    F.col("fp").cast("double")
                    * (F.col("cum_tp") - F.col("tp") / F.lit(2.0))
                )
                / (
                    F.sum("tp").cast("double") * F.sum("fp").cast("double")
                ),
            ),
            decimals,
        ).alias("auc"),
    )


def classification_report(
    df: DataFrame,
    score_col: Column | str,
    label_col: Column | str,
    thresholds: list[float],
    decimals: int = 6,
) -> DataFrame:
    """One row per threshold: ``(threshold, tp, fp, tn, fn, accuracy,
    precision, recall, f1)`` — ALL thresholds from ONE conditional-sum
    aggregation pass (k thresholds cost k extra sum columns, never k
    scans), reshaped to rows with ``inline`` at answer scale.

    Degenerate denominators (no predicted / no actual positives) yield
    NULL metrics rather than a fake 0.0. NULL/NaN scores and NULL
    labels are excluded up front (the same policy as :func:`roc_auc` —
    counting unscored rows in ``n`` while the conditional sums skip
    them would silently inflate tn/fn and accuracy).
    """
    if not thresholds:
        raise ValueError("classification_report needs >=1 threshold")
    s = (F.col(score_col) if isinstance(score_col, str) else score_col).cast(
        "double"
    )
    y = (F.col(label_col) if isinstance(label_col, str) else label_col).cast(
        "boolean"
    )
    df = df.filter(s.isNotNull() & ~F.isnan(s) & y.isNotNull())
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum(y.cast("long")).alias("p"),
    ]
    for i, t in enumerate(thresholds):
        pred = s >= F.lit(float(t))
        aggs.append(F.sum((pred & y).cast("long")).alias(f"tp_{i}"))
        aggs.append(F.sum((pred & ~y).cast("long")).alias(f"fp_{i}"))
    wide = df.agg(*aggs)
    rows = F.inline(
        F.array(
            *[
                F.struct(
                    F.lit(float(t)).alias("threshold"),
                    F.col(f"tp_{i}").alias("tp"),
                    F.col(f"fp_{i}").alias("fp"),
                )
                for i, t in enumerate(thresholds)
            ]
        )
    )
    base = wide.select("n", "p", rows)
    tp, fp = F.col("tp"), F.col("fp")
    fn = F.col("p") - tp
    tn = F.col("n") - F.col("p") - fp
    prec = F.when(tp + fp > 0, tp / (tp + fp).cast("double"))
    rec = F.when(F.col("p") > 0, tp / F.col("p").cast("double"))
    return base.select(
        "threshold",
        tp.alias("tp"),
        fp.alias("fp"),
        tn.alias("tn"),
        fn.alias("fn"),
        F.round((tp + tn) / F.col("n").cast("double"), decimals).alias(
            "accuracy"
        ),
        F.round(prec, decimals).alias("precision"),
        F.round(rec, decimals).alias("recall"),
        F.round(
            F.when(
                prec.isNotNull() & rec.isNotNull() & (prec + rec > 0),
                2 * prec * rec / (prec + rec),
            ),
            decimals,
        ).alias("f1"),
    )


def lift_table(
    df: DataFrame,
    score_col: str,
    label_col: Column | str,
    n_bins: int = 10,
    decimals: int = 6,
) -> DataFrame:
    """Score-decile lift/gains table: ``(bin, n, n_pos, pos_rate, lift,
    cum_capture)`` with bin ``n_bins-1`` = highest scores; ``lift`` is
    the bin's positive rate over the base rate and ``cum_capture`` the
    fraction of all positives captured from the top bin down — the
    ranking-quality numbers every targeting dashboard plots.

    Bins come from :func:`..operators.binning.equal_frequency_bins`
    (exact interpolated percentile bounds + map-only assignment — no
    ntile global sort), so the whole table is two aggregations.
    NULL/NaN scores and NULL labels are excluded — the roc_auc policy,
    so one `evaluate` run reports every metric over the SAME population
    (a NULL score would otherwise ride the table as a NULL bin and
    NULL labels would deflate every rate).
    """
    from ..operators.binning import equal_frequency_bins

    sc = F.col(score_col).cast("double")
    y = (F.col(label_col) if isinstance(label_col, str) else label_col).cast(
        "boolean"
    )
    df = df.filter(sc.isNotNull() & ~F.isnan(sc) & y.isNotNull())
    binned, _bounds = equal_frequency_bins(
        df.withColumn("__y", y), score_col, n_bins=n_bins, exact=True
    )
    per_bin = binned.groupBy(F.col("bin").cast("long").alias("bin")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("__y").cast("long")).alias("n_pos"),
    )
    # Answer-scale: n_bins rows from here on. Totals as unpartitioned
    # window aggregates — a totals cross-join would re-plan per_bin's
    # lineage and scan the scored corpus twice.
    w_all = Window.partitionBy()
    w = Window.orderBy(F.col("bin").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    rate = F.col("n_pos") / F.col("n").cast("double")
    base_rate = F.col("__tp") / F.col("__tn").cast("double")
    return (
        per_bin.withColumn("__tn", F.sum("n").over(w_all))
        .withColumn("__tp", F.sum("n_pos").over(w_all))
        .withColumn("cum_pos", F.sum("n_pos").over(w))
        .select(
            "bin",
            "n",
            "n_pos",
            F.round(rate, decimals).alias("pos_rate"),
            F.round(
                F.when(F.col("__tp") > 0, rate / base_rate), decimals
            ).alias("lift"),
            F.round(
                F.when(
                    F.col("__tp") > 0,
                    F.col("cum_pos") / F.col("__tp").cast("double"),
                ),
                decimals,
            ).alias("cum_capture"),
        )
    )


def brier_and_ece(
    df: DataFrame,
    prob_col: Column | str,
    label_col: Column | str,
    n_buckets: int = 10,
    decimals: int = 6,
) -> DataFrame:
    """One row ``(n, brier, ece)`` for a PROBABILITY column in [0, 1]:
    ``brier`` = mean squared error of the probability against the 0/1
    outcome (strictly proper — rewards calibration AND sharpness);
    ``ece`` = expected calibration error over ``n_buckets`` fixed-width
    probability cells, Σ (n_b/n)·|avg_prob_b − pos_rate_b| — the number
    :mod:`.calibration` exists to drive toward zero.

    One pass: the squared error aggregates globally while the same scan
    feeds the bucket counts; both statistics reduce from the
    ≤n_buckets-row cell frame (brier via the cell-level sum of squared
    errors, which is exact — (p−y)² partitions cleanly by cell).
    NULL/NaN probabilities and NULL labels are excluded.
    """
    p = (F.col(prob_col) if isinstance(prob_col, str) else prob_col).cast(
        "double"
    )
    # Probability-domain guard (ADVICE r7): a p outside [0, 1] (e.g. a
    # raw margin column passed by mistake) would be silently clamped
    # into the edge buckets while its raw value still feeds the sums,
    # yielding plausible-looking-but-meaningless Brier/ECE. Hard-fail
    # in-plan instead (the lorenz_gini raise_error pattern).
    # (NaN compares greater than everything under Spark ordering, so it
    # must be excused here — it stays excluded by the filter below,
    # matching the documented NULL/NaN policy.)
    p = F.when(
        ~F.isnan(p) & ((p < 0.0) | (p > 1.0)),
        F.raise_error(
            F.format_string(
                "brier_and_ece: probability %.6f outside [0, 1] — pass "
                "calibrated probabilities, not raw scores/margins",
                p,
            )
        ).cast("double"),
    ).otherwise(p)
    y = (F.col(label_col) if isinstance(label_col, str) else label_col).cast(
        "boolean"
    )
    yd = y.cast("double")
    cells = (
        df.filter(p.isNotNull() & ~F.isnan(p) & y.isNotNull())
        .select(
            _bucket(p, 0.0, 1.0, n_buckets).alias("b"),
            p.alias("p"),
            yd.alias("y"),
        )
        .groupBy("b")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("p").alias("sp"),
            F.sum("y").alias("sy"),
            F.sum((F.col("p") - F.col("y")) * (F.col("p") - F.col("y"))).alias(
                "sq"
            ),
        )
    )
    nd = F.sum("n").cast("double")
    return cells.agg(
        F.sum("n").alias("n"),
        F.round(F.sum("sq") / nd, decimals).alias("brier"),
        F.round(
            F.sum(
                F.abs(F.col("sp") - F.col("sy"))
            )
            / nd,
            decimals,
        ).alias("ece"),
    )


def ranking_metrics(
    ranked: DataFrame,
    truth: DataFrame,
    query_cols: list[str],
    item_cols: list[str],
    ks: list[int],
    rank_col: str = "rank",
    rel_col: str | None = None,
    decimals: int = 6,
) -> DataFrame:
    """Graded ranking-quality readout for the retrieval family —
    NDCG@k / MRR@k / hit@k per query (Järvelin & Kekäläinen, TOIS
    2002 for DCG; Voorhees, TREC-8 1999 for MRR — public literature):
    the first question a search/RAG user asks of the BM25 / RRF / ANN
    rankings this engine produces, one level up from the recall gates
    the ANN family already carries.

    ``ranked`` is a system top-N frame ``(*query_cols, *item_cols,
    rank)`` with 1-based positive ranks (the :func:`~proyecto_final_de_
    big_data_spark.operators.rrf.rrf_fuse` output shape; NULL or
    non-positive ranks hard-fail in-plan — a scored-but-unranked frame
    is a caller bug). ``truth`` holds the judged-relevant items
    ``(*query_cols, *item_cols[, rel])``; with ``rel_col`` the gain is
    graded ``2^rel − 1`` (rel must be >= 0; NULL rel hard-fails), else
    binary (every judged item gains 1). Duplicate truth judgements
    collapse to max(rel); duplicate ranked (query, item) rows
    hard-fail upstream semantics, but are tolerated here by gain
    riding a left join (each ranked row scores independently — pass
    deduped rankings).

    One row per ``(query, k)`` for every k in ``ks`` and every query
    in the TRUTH universe (a query the system never answered scores
    0s — missing, not NULL):

    - ``n_rel``: judged-relevant count (rel > 0 under grading);
    - ``n_ranked``: system rows at rank <= k;
    - ``ndcg``: DCG@k / IDCG@k, where DCG@k = Σ_{rank<=k} gain /
      log2(rank+1) over system rows and IDCG@k is the same sum over
      the ideal ordering of the query's judgements (rel desc, items
      asc — the deterministic tie-break; ties share identical gain so
      the sum is order-stable). NULL when the query has no positive
      judgement (0/0 is not a quality score — the msprt warm-up
      posture);
    - ``mrr``: 1/rank of the first relevant system row within k, 0.0
      when none (NULL when n_rel = 0, as for ndcg);
    - ``hit``: boolean, any relevant system row within k (NULL when
      n_rel = 0);
    - ``precision`` / ``recall``: (#relevant system rows at rank <= k)
      over k and over n_rel respectively — BINARY relevance (rel > 0
      counts as relevant; grading enters ndcg only, the TREC
      convention). NULL when n_rel = 0, like ndcg;
    - ``ap``: average precision at k (the MAP summand; Buckley &
      Voorhees, SIGIR 2000 convention): Σ over relevant system rows
      at rank i <= k of (cum_rel@i / i), divided by min(n_rel, k) —
      so a perfect head ranking scores 1.0 regardless of tail
      truncation. 0.0 when nothing relevant retrieved, NULL when
      n_rel = 0.

    Scale shape (100 TB): both inputs are answer-scale by construction
    (top-N per query; human judgements) — the corpus appears nowhere.
    One broadcast-sized k-frame explode, one (query,item) equi-join,
    two (query,k)-keyed aggregations and two answer-scale per-query
    windows (the TRUTH-frame ideal ordering and the SYSTEM-frame
    cumulative-relevance count for AP — both partitioned per query,
    never data-scale). Everything stays JVM-side; gains/logs are
    closed-form IEEE arithmetic a DuckDB oracle restates bit-for-bit
    before the ``decimals`` rounding.

    Extension surface — the reference has no retrieval stage;
    extension per SURVEY §8, the ranking-quality sibling of
    :func:`roc_auc` for the BM25/RRF/ANN rankings.
    """
    if not query_cols or not item_cols:
        raise ValueError("ranking_metrics needs query_cols and item_cols")
    # Coerce BEFORE the distinctness check: float ks that collide after
    # truncation (e.g. [1, 1.5]) would otherwise double-count every
    # (query, k) aggregate through the k-frame explode.
    ks = sorted(int(k) for k in ks)
    if not ks or any(k < 1 for k in ks) or len(set(ks)) != len(ks):
        raise ValueError(f"ks must be distinct positive ints; got {ks}")

    rk = F.col(rank_col)
    checked_rank = F.when(
        rk.isNull() | (rk < 1),
        F.raise_error(
            F.lit(
                "ranking_metrics: NULL or non-positive rank — pass a "
                "1-based ranked frame (the rrf_fuse output shape)"
            )
        ).cast("long"),
    ).otherwise(rk.cast("long"))

    if rel_col is not None:
        rr = F.col(rel_col).cast("double")
        checked_rel = F.when(
            rr.isNull() | (rr < 0),
            F.raise_error(
                F.lit(
                    "ranking_metrics: NULL or negative relevance — "
                    "grade judgements with rel >= 0"
                )
            ),
        ).otherwise(rr)
    else:
        checked_rel = F.lit(1.0)

    judged = truth.groupBy(*query_cols, *item_cols).agg(
        F.max(checked_rel).alias("__rel")
    )
    kf = F.explode(F.array(*[F.lit(k) for k in ks])).alias("k")

    # Ideal ordering per query (rel desc, items asc) -> IDCG@k + n_rel.
    w_ideal = Window.partitionBy(*query_cols).orderBy(
        F.desc("__rel"), *[F.asc(c) for c in item_cols]
    )
    ideal = judged.withColumn("__pos", F.row_number().over(w_ideal))
    gain_ideal = F.pow(F.lit(2.0), F.col("__rel")) - F.lit(1.0)
    idcg = (
        ideal.select(*query_cols, "__pos", "__rel", kf)
        .groupBy(*query_cols, "k")
        .agg(
            F.sum(
                F.when(
                    (F.col("__pos") <= F.col("k")) & (F.col("__rel") > 0),
                    gain_ideal / F.log2(F.col("__pos") + F.lit(1.0)),
                )
            ).alias("__idcg"),
            F.sum((F.col("__rel") > 0).cast("long")).alias("n_rel"),
        )
    )

    # System side: rank-gated DCG / first-relevant reciprocal rank /
    # cumulative-relevance precision terms for AP. The cumulative count
    # windows per query in rank order (item tie-break so duplicate
    # caller ranks stay deterministic) — answer-scale, over the top-N.
    sys = ranked.select(
        *query_cols, *item_cols, checked_rank.alias("__rank")
    ).join(judged, [*query_cols, *item_cols], "left")
    sys_rel = F.coalesce(F.col("__rel"), F.lit(0.0))
    w_cum = (
        Window.partitionBy(*query_cols)
        .orderBy(F.asc("__rank"), *[F.asc(c) for c in item_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sys = sys.select(
        *query_cols,
        "__rank",
        sys_rel.alias("__rel"),
        F.sum((sys_rel > 0).cast("long")).over(w_cum).alias("__cum_rel"),
    )
    gain_sys = F.pow(F.lit(2.0), F.col("__rel")) - F.lit(1.0)
    at_k = F.col("__rank") <= F.col("k")
    sysk = (
        sys.select(*query_cols, "__rank", "__rel", "__cum_rel", kf)
        .groupBy(*query_cols, "k")
        .agg(
            F.sum(
                F.when(
                    at_k & (F.col("__rel") > 0),
                    gain_sys / F.log2(F.col("__rank") + F.lit(1.0)),
                )
            ).alias("__dcg"),
            F.max(
                F.when(
                    at_k & (F.col("__rel") > 0),
                    F.lit(1.0) / F.col("__rank"),
                )
            ).alias("__rr"),
            F.sum(at_k.cast("long")).alias("n_ranked"),
            F.sum(
                (at_k & (F.col("__rel") > 0)).cast("long")
            ).alias("__n_hit"),
            F.sum(
                F.when(
                    at_k & (F.col("__rel") > 0),
                    F.col("__cum_rel").cast("double") / F.col("__rank"),
                )
            ).alias("__ap_num"),
        )
    )

    out = idcg.join(sysk, [*query_cols, "k"], "left")
    has_rel = F.col("n_rel") > 0
    return out.select(
        *query_cols,
        F.col("k").cast("int").alias("k"),
        "n_rel",
        F.coalesce("n_ranked", F.lit(0)).alias("n_ranked"),
        F.round(
            F.when(
                has_rel,
                F.coalesce(F.col("__dcg") / F.col("__idcg"), F.lit(0.0)),
            ),
            decimals,
        ).alias("ndcg"),
        F.round(
            F.when(has_rel, F.coalesce("__rr", F.lit(0.0))), decimals
        ).alias("mrr"),
        F.when(has_rel, F.coalesce(F.col("__rr") > 0, F.lit(False))).alias(
            "hit"
        ),
        F.round(
            F.when(
                has_rel,
                F.coalesce(
                    F.col("__n_hit").cast("double") / F.col("k"), F.lit(0.0)
                ),
            ),
            decimals,
        ).alias("precision"),
        F.round(
            F.when(
                has_rel,
                F.coalesce(
                    F.col("__n_hit").cast("double")
                    / F.col("n_rel").cast("double"),
                    F.lit(0.0),
                ),
            ),
            decimals,
        ).alias("recall"),
        F.round(
            F.when(
                has_rel,
                F.coalesce(
                    F.col("__ap_num")
                    / F.least(F.col("n_rel"), F.col("k")).cast("double"),
                    F.lit(0.0),
                ),
            ),
            decimals,
        ).alias("ap"),
    )
