"""ML-loop queries (reference entry points 04/05).

Verification stances, strongest applicable per surface:
- EXACT hash gates where training is deterministic: the closed-form LR
  twin (`ml_train_linear_contract`) and the save/load/score round trip
  (`ml_score_contract`) restate coefficients and metrics in DuckDB via
  the 3x3 normal equations.
- STRUCTURAL hash gates where training is parallelism-dependent by
  nature: `ml_tree_ensemble_contract` pins GBT/RF holdout counts,
  importance layout, finite predictions and learn bands on a synthetic
  learnable label (exact prediction hashes are impossible — SURVEY §7).
- Rows-only remains ONLY for the sampling-based twins
  (`ml_train_metrics`, `ml_score_profile`), whose Bernoulli sample is
  nondeterministic by design; unit tests range-pin their metrics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..ml.pipeline import TrainConfig, build_pipeline, metrics_frame, train_and_evaluate
from .registry import register


@register(
    "ml_train_metrics",
    oracle=None,  # training metrics: rows-only (range-asserted in unit tests)
    description="LR feature/train/evaluate loop on lineitem; one-row metrics record",
)
def q_ml_train_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Training-cost cap via Bernoulli sample (the reference's
    # --sample-frac/--max-rows knob, scripts/04_train_sparkml.py:80-83) —
    # sampling, unlike limit(), keeps the partition-uniform distribution.
    li = load_table(spark, sf_dir, "lineitem").sample(0.2, seed=42)
    cfg = TrainConfig(
        label="l_extendedprice",
        numeric_features=["l_quantity", "l_discount", "l_tax"],
        categorical_features=["l_returnflag", "l_linestatus"],
        algorithm="lr",
        max_iter=20,
    )
    _, metrics, _ = train_and_evaluate(li, cfg)
    return metrics_frame(spark, metrics, algorithm="lr", label="l_extendedprice")


@register(
    "ml_score_profile",
    oracle=None,  # model predictions: rows-only
    description="Batch scoring + per-group error profile (reference 05 + A12 shape)",
)
def q_ml_score_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    train_sample = li.sample(0.2, seed=42)
    cfg = TrainConfig(
        label="l_extendedprice",
        numeric_features=["l_quantity", "l_discount"],
        categorical_features=["l_returnflag"],
        algorithm="lr",
        max_iter=10,
    )
    model, _, _ = train_and_evaluate(train_sample, cfg)
    scored = model.transform(li)
    err = F.col("prediction") - F.col("l_extendedprice")
    return scored.groupBy(F.col("l_returnflag").alias("returnflag")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.avg(F.abs(err)).alias("mae"),
        F.sqrt(F.avg(F.pow(err, F.lit(2)))).alias("rmse"),
    )


_OLS_CTE = """
    WITH train AS (
        SELECT l_quantity AS x1, l_discount AS x2, l_extendedprice AS y,
               l_returnflag
        FROM lineitem WHERE l_orderkey % 5 != 0
    ),
    s AS (
        SELECT CAST(count(*) AS DOUBLE) AS n, sum(x1) AS sx1, sum(x2) AS sx2,
               sum(x1*x1) AS sx11, sum(x1*x2) AS sx12, sum(x2*x2) AS sx22,
               sum(y) AS sy, sum(x1*y) AS sx1y, sum(x2*y) AS sx2y
        FROM train
    ),
    solved AS (
        SELECT
            (det_a / det) AS intercept,
            (det_b1 / det) AS b1,
            (det_b2 / det) AS b2
        FROM (
            SELECT
                (n*(sx11*sx22 - sx12*sx12) - sx1*(sx1*sx22 - sx12*sx2)
                   + sx2*(sx1*sx12 - sx11*sx2)) AS det,
                (sy*(sx11*sx22 - sx12*sx12) - sx1*(sx1y*sx22 - sx12*sx2y)
                   + sx2*(sx1y*sx12 - sx11*sx2y)) AS det_a,
                (n*(sx1y*sx22 - sx2y*sx12) - sy*(sx1*sx22 - sx12*sx2)
                   + sx2*(sx1*sx2y - sx1y*sx2)) AS det_b1,
                (n*(sx11*sx2y - sx12*sx1y) - sx1*(sx1*sx2y - sx1y*sx2)
                   + sy*(sx1*sx12 - sx11*sx2)) AS det_b2
            FROM s
        )
    )
"""


@register(
    "ml_train_linear_contract",
    oracle=_OLS_CTE
    + """
    , test AS (
        SELECT l_quantity AS x1, l_discount AS x2, l_extendedprice AS y
        FROM lineitem WHERE l_orderkey % 5 = 0
    ),
    scored AS (
        SELECT y, (solved.intercept + solved.b1*x1 + solved.b2*x2) AS pred
        FROM test, solved
    )
    SELECT round((SELECT intercept FROM solved), 2) AS intercept,
           round((SELECT b1 FROM solved), 2) AS coef_quantity,
           round((SELECT b2 FROM solved), 2) AS coef_discount,
           round(sqrt(avg((y - pred)*(y - pred))), 2) AS rmse,
           round(avg(abs(y - pred)), 2) AS mae,
           round(1 - sum((y - pred)*(y - pred))
                     / (sum(y*y) - count(*)*avg(y)*avg(y)), 4) AS r2,
           (SELECT count(*) FROM train) AS rows_train,
           count(*) AS rows_test
    FROM scored
    """,
    description="M4/M6/M7 through the hash gate (reference "
    "scripts/04_train_sparkml.py:114-151): the SAME build_pipeline/"
    "evaluate code path the GBT loop uses, with algorithm='lr' and "
    "solver='normal' — a closed-form OLS fit whose coefficients DuckDB "
    "restates exactly via the 3x3 normal equations (Cramer's rule over "
    "plain SUM aggregates). The split is a deterministic modulo on "
    "l_orderkey (randomSplit is partitioning-dependent, SURVEY §7), so "
    "coefficients, RMSE/MAE/R² and both split sizes are all exact-hash "
    "comparable. Verified to ~1e-12 relative agreement; rounded at 2 "
    "decimals (4 for the near-zero R²) to absorb summation-order noise.",
)
def q_ml_train_linear_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ml.pipeline import evaluate

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_discount", "l_extendedprice"
    )
    cfg = TrainConfig(
        label="l_extendedprice",
        numeric_features=["l_quantity", "l_discount"],
        algorithm="lr",
    )
    pipeline, _, _ = build_pipeline(li, cfg)
    train = li.filter(F.col("l_orderkey") % 5 != 0)
    test = li.filter(F.col("l_orderkey") % 5 == 0)
    model = pipeline.fit(train)
    lr_model = model.stages[-1]
    predictions = model.transform(test).persist()
    try:
        metrics = evaluate(predictions, "l_extendedprice")
        rows_test = predictions.count()
    finally:
        predictions.unpersist()
    rows_train = train.count()
    coef = list(lr_model.coefficients)
    return spark.createDataFrame(
        [
            (
                round(float(lr_model.intercept), 2),
                round(float(coef[0]), 2),
                round(float(coef[1]), 2),
                round(metrics["rmse"], 2),
                round(metrics["mae"], 2),
                round(metrics["r2"], 4),
                rows_train,
                rows_test,
            )
        ],
        "intercept double, coef_quantity double, coef_discount double, "
        "rmse double, mae double, r2 double, rows_train long, rows_test long",
    )


@register(
    "ml_tree_ensemble_contract",
    oracle="""
    SELECT 'gbt' AS algorithm, count(*) AS n_test, 3 AS n_importances,
           1 AS importances_sum_ok, 1 AS top_feature_is_quantity,
           1 AS preds_ok, 1 AS fit_ok
    FROM lineitem WHERE l_orderkey % 5 = 0
    UNION ALL
    SELECT 'rf', count(*), 3, 1, 1, 1, 1
    FROM lineitem WHERE l_orderkey % 5 = 0
    """,
    description="M4/M5 (GBT + RandomForest) under a driver gate stronger "
    "than rows-only (VERDICT r6 item 4). Exact prediction hashes are off "
    "the table — tree-ensemble training is parallelism-dependent — so "
    "this is a checked structural profile in the "
    "text_quality_classifier_contract stance: the label is a synthetic "
    "noise-free function of the features (100*quantity + 1000*discount "
    "+ 500*tax), the split is a deterministic l_orderkey modulo (no "
    "randomSplit), and the gate pins per algorithm: exact holdout "
    "count, feature-importance vector length (3) summing to 1, "
    "quantity as the dominant importance (>= 0.5; it carries ~99% of "
    "the label variance), every holdout row scored finite, and the "
    "learn bands r2 >= 0.9 (GBT, measured 0.987-0.990 across sf0.001-"
    "0.1) / r2 >= 0.6 (RF, measured 0.80-0.82 — depth-3 piecewise "
    "constants without boosting). A wrong importances layout, a scoring "
    "NaN, or an ensemble that stops learning all break the hash.",
)
def q_ml_tree_ensemble_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ml.pipeline import evaluate

    li = load_table(spark, sf_dir, "lineitem").select(
        (
            F.col("l_quantity") * 100
            + F.col("l_discount") * 1000
            + F.col("l_tax") * 500
        ).alias("y"),
        "l_quantity",
        "l_discount",
        "l_tax",
        "l_orderkey",
    )
    train = li.filter(F.col("l_orderkey") % 5 == 1).drop("l_orderkey").persist()
    test = li.filter(F.col("l_orderkey") % 5 == 0).drop("l_orderkey")
    frames = []
    try:
        for algo, r2_band in (("gbt", 0.9), ("rf", 0.6)):
            cfg = TrainConfig(
                label="y",
                numeric_features=["l_quantity", "l_discount", "l_tax"],
                algorithm=algo,
                max_iter=6,
                max_depth=3,
                num_trees=8,
            )
            pipeline, _, _ = build_pipeline(train, cfg)
            model = pipeline.fit(train)
            preds = model.transform(test).persist()
            try:
                metrics = evaluate(preds, "y")
                checked = preds.agg(
                    F.count(F.lit(1)).alias("n_test"),
                    F.sum(
                        (
                            F.col("prediction").isNull()
                            | F.isnan("prediction")
                        ).cast("int")
                    ).alias("n_bad"),
                ).collect()[0]
            finally:
                preds.unpersist()
            imps = model.stages[-1].featureImportances.toArray().tolist()
            frames.append(
                (
                    algo,
                    int(checked["n_test"]),
                    len(imps),
                    int(abs(sum(imps) - 1.0) < 1e-6),
                    int(imps[0] >= 0.5),
                    int(checked["n_bad"] == 0),
                    int(metrics["r2"] >= r2_band),
                )
            )
    finally:
        train.unpersist()
    return spark.createDataFrame(
        frames,
        "algorithm string, n_test long, n_importances int, "
        "importances_sum_ok int, top_feature_is_quantity int, "
        "preds_ok int, fit_ok int",
    )


@register(
    "ml_score_contract",
    oracle=_OLS_CTE
    + """
    , scored AS (
        SELECT l_returnflag,
               l_extendedprice AS y,
               (solved.intercept + solved.b1*l_quantity
                  + solved.b2*l_discount) AS pred
        FROM lineitem, solved
    )
    SELECT l_returnflag AS returnflag,
           count(*) AS n_rows,
           round(avg(abs(y - pred)), 2) AS mae,
           round(sqrt(avg((y - pred)*(y - pred))), 2) AS rmse
    FROM scored
    GROUP BY 1
    """,
    description="Batch scoring through the hash gate (reference "
    "scripts/05_batch_scoring.py:85-105 + A12 error profile): fit the "
    "deterministic closed-form LR on the modulo train split, round-trip "
    "the PipelineModel through save_model/load_model (S12 — the model "
    "sink/source, previously rows-only), score the FULL table with "
    "batch_score, and profile MAE/RMSE per returnflag. DuckDB restates "
    "the predictions from the Cramer-solved coefficients, so a wrong "
    "persisted coefficient, a scoring drift, or a broken model reload "
    "all break the hash.",
)
def q_ml_score_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from ..ml.pipeline import batch_score, load_model, save_model

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_discount", "l_extendedprice", "l_returnflag"
    )
    cfg = TrainConfig(
        label="l_extendedprice",
        numeric_features=["l_quantity", "l_discount"],
        algorithm="lr",
    )
    pipeline, _, _ = build_pipeline(li, cfg)
    model = pipeline.fit(li.filter(F.col("l_orderkey") % 5 != 0))
    tmp = tempfile.mkdtemp(prefix="ml_score_contract_")
    try:
        save_model(model, f"{tmp}/model")
        model = load_model(f"{tmp}/model")  # scoring uses the RELOADED model
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    err = F.col("prediction") - F.col("l_extendedprice")
    return (
        batch_score(model, li)
        .groupBy(F.col("l_returnflag").alias("returnflag"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.avg(F.abs(err)), 2).alias("mae"),
            F.round(F.sqrt(F.avg(F.pow(err, F.lit(2)))), 2).alias("rmse"),
        )
    )


@register(
    "ml_feature_matrix_contract",
    oracle="""
    SELECT returnflag,
           CAST(row_number() OVER (ORDER BY returnflag) - 1 AS DOUBLE) AS flag_idx,
           n_rows,
           CAST(3 + (SELECT count(DISTINCT l_returnflag) - 1 FROM lineitem) AS INT)
               AS feature_dim,
           sum_quantity, sum_discount, sum_tax
    FROM (
        SELECT l_returnflag AS returnflag,
               count(*) AS n_rows,
               round(sum(l_quantity), 2) AS sum_quantity,
               round(sum(l_discount), 2) AS sum_discount,
               round(sum(l_tax), 2) AS sum_tax
        FROM lineitem
        GROUP BY 1
    )
    """,
    description="M1-M3 through the hash gate: the SAME build_pipeline the "
    "training loop uses (minus the regressor stage) fits StringIndexer -> "
    "OneHotEncoder -> VectorAssembler over lineitem with deterministic "
    "knobs (alphabetAsc ordering, handleInvalid=error), then the assembled "
    "vector is torn back apart with vector_to_array and its numeric slots "
    "summed per label. The oracle recomputes the index as a dense rank over "
    "the sorted label set and the one-hot width as distinct-1 (dropLast), "
    "so a wrong index order, a dropped assembler input, or a mis-sized "
    "encoding all break the hash. Fit metrics stay range-pinned in pytest "
    "(parallelism-dependent, SURVEY §7).",
)
def q_ml_feature_matrix_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.ml import Pipeline
    from pyspark.ml.functions import vector_to_array

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_quantity", "l_discount", "l_tax", "l_returnflag", "l_extendedprice"
    )
    cfg = TrainConfig(
        label="l_extendedprice",
        numeric_features=["l_quantity", "l_discount", "l_tax"],
        categorical_features=["l_returnflag"],
        string_order_type="alphabetAsc",
        handle_invalid="error",
    )
    pipeline, _, _ = build_pipeline(li, cfg)
    feature_stages = Pipeline(stages=pipeline.getStages()[:-1])  # drop the regressor
    assembled = feature_stages.fit(li).transform(li)
    f = vector_to_array("features")
    return (
        assembled.select(
            F.col("l_returnflag").alias("returnflag"),
            F.col("l_returnflag__idx").alias("flag_idx"),
            f.alias("f"),
        )
        .groupBy("returnflag", "flag_idx")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.max(F.size("f")).cast("int").alias("feature_dim"),
            F.round(F.sum(F.col("f")[0]), 2).alias("sum_quantity"),
            F.round(F.sum(F.col("f")[1]), 2).alias("sum_discount"),
            F.round(F.sum(F.col("f")[2]), 2).alias("sum_tax"),
        )
        .select(
            "returnflag", "flag_idx", "n_rows", "feature_dim",
            "sum_quantity", "sum_discount", "sum_tax",
        )
    )


@register(
    "embedding_kmeans_contract",
    oracle="""
    SELECT count(*) AS n_vecs, 1 AS clusters_ok, 1 AS assignment_ok
    FROM embeddings
    """,
    description="MLlib KMeans over the embedding column (k=10, pinned seed): "
    "structural contract — every vector gets a non-null cluster and the "
    "cluster count lands in [2, k]. Centroid quality is parallelism-dependent "
    "(labels in the fixture are NOT cluster-structured, measured purity "
    "~0.17), so value assertions live in unit tests; the gate pins the "
    "distributed plumbing: array->vector, Lloyd's map-reduce fit, map-only "
    "assignment.",
)
def q_embedding_kmeans_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ml.clustering import kmeans_assign

    emb = load_table(spark, sf_dir, "embeddings")
    assigned = kmeans_assign(emb, "embedding", k=10, seed=7, max_iter=10)
    agg = assigned.agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.count_distinct(F.col("cluster")).alias("n_clusters"),
        F.sum(F.col("cluster").isNull().cast("int")).alias("n_null"),
    )
    return agg.select(
        "n_vecs",
        ((F.col("n_clusters") >= 2) & (F.col("n_clusters") <= 10))
        .cast("int")
        .alias("clusters_ok"),
        (F.col("n_null") == 0).cast("int").alias("assignment_ok"),
    )


@register(
    "text_quality_classifier_contract",
    oracle="""
    SELECT count(*) FILTER (WHERE doc_id % 2 = 1) AS n_scored,
           1 AS probs_ok, 1 AS acc_ok
    FROM documents
    """,
    description="Model-based quality filtering (ml/text_classifier.py): "
    "RegexTokenizer -> HashingTF (stateless feature hashing, no vocab fit) "
    "-> IDF -> LogisticRegression, the fastText-classifier role of public "
    "LLM pipelines. Every 5th document is degraded to a synthetic spam "
    "token and labeled 0; the model trains on even doc_ids and scores odd "
    "ones. The gate pins the plumbing: every held-out doc scored, all "
    "probabilities valid, and >= 90% holdout accuracy on the separable "
    "synthetic labels (measured ~1.0; coefficient values are partitioning-"
    "dependent, so exact-value assertions live nowhere — same stance as "
    "the M1-M7 gates).",
)
def q_text_quality_classifier_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ml.text_classifier import (
        TextClassifierConfig,
        score_quality,
        train_quality_classifier,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    degraded = F.col("doc_id") % 5 == 0
    labeled = docs.select(
        "doc_id",
        F.when(degraded, F.lit("zzqx zzqx zzqx zzqx zzqx"))
        .otherwise(F.col("text"))
        .alias("text"),
        F.when(degraded, F.lit(0.0)).otherwise(F.lit(1.0)).alias("label"),
    )
    train = labeled.filter(F.col("doc_id") % 2 == 0)
    test = labeled.filter(F.col("doc_id") % 2 == 1)
    cfg = TextClassifierConfig(n_features=1024, max_iter=20)
    model = train_quality_classifier(train, cfg)
    scored = score_quality(model, test)
    agg = scored.agg(
        F.count(F.lit(1)).alias("n_scored"),
        F.sum(
            (
                F.col("quality_prob").isNull()
                | (F.col("quality_prob") < 0)
                | (F.col("quality_prob") > 1)
            ).cast("int")
        ).alias("n_bad_prob"),
        F.avg(
            (F.col("keep") == (F.col("label") == 1.0)).cast("double")
        ).alias("acc"),
    )
    return agg.select(
        "n_scored",
        (F.col("n_bad_prob") == 0).cast("int").alias("probs_ok"),
        (F.col("acc") >= 0.9).cast("int").alias("acc_ok"),
    )


@register(
    "ml_cv_contract",
    oracle="""
    WITH base AS (
        SELECT l_orderkey % 4 AS fold,
               l_quantity AS x1, l_discount AS x2, l_extendedprice AS y
        FROM lineitem
    ),
    per_fold AS (
        SELECT fold, CAST(count(*) AS DOUBLE) AS n,
               sum(x1) AS sx1, sum(x2) AS sx2,
               sum(x1*x1) AS sx11, sum(x1*x2) AS sx12, sum(x2*x2) AS sx22,
               sum(y) AS sy, sum(x1*y) AS sx1y, sum(x2*y) AS sx2y
        FROM base GROUP BY 1
    ),
    tot AS (
        SELECT sum(n) AS t_n, sum(sx1) AS t_sx1, sum(sx2) AS t_sx2,
               sum(sx11) AS t_sx11, sum(sx12) AS t_sx12,
               sum(sx22) AS t_sx22, sum(sy) AS t_sy,
               sum(sx1y) AS t_sx1y, sum(sx2y) AS t_sx2y
        FROM per_fold
    ),
    tr AS (
        SELECT fold, per_fold.n AS n_test_d,
               t_n - per_fold.n AS n, t_sx1 - sx1 AS sx1,
               t_sx2 - sx2 AS sx2, t_sx11 - sx11 AS sx11,
               t_sx12 - sx12 AS sx12, t_sx22 - sx22 AS sx22,
               t_sy - sy AS sy, t_sx1y - sx1y AS sx1y,
               t_sx2y - sx2y AS sx2y
        FROM per_fold, tot
    ),
    solved AS (
        SELECT fold, n_test_d, n AS n_train_d,
               CASE WHEN det != 0 THEN det_a / det END AS intercept,
               CASE WHEN det != 0 THEN det_b1 / det END AS b1,
               CASE WHEN det != 0 THEN det_b2 / det END AS b2
        FROM (
            SELECT fold, n_test_d, n,
                   (n*(sx11*sx22 - sx12*sx12) - sx1*(sx1*sx22 - sx12*sx2)
                      + sx2*(sx1*sx12 - sx11*sx2)) AS det,
                   (sy*(sx11*sx22 - sx12*sx12) - sx1*(sx1y*sx22 - sx12*sx2y)
                      + sx2*(sx1y*sx12 - sx11*sx2y)) AS det_a,
                   (n*(sx1y*sx22 - sx2y*sx12) - sy*(sx1*sx22 - sx12*sx2)
                      + sx2*(sx1*sx2y - sx1y*sx2)) AS det_b1,
                   (n*(sx11*sx2y - sx12*sx1y) - sx1*(sx1*sx2y - sx1y*sx2)
                      + sy*(sx1*sx12 - sx11*sx2)) AS det_b2
            FROM tr
        )
    ),
    scored AS (
        SELECT b.fold, s.n_train_d, s.n_test_d, s.intercept, s.b1, s.b2,
               y - (s.intercept + s.b1*b.x1 + s.b2*b.x2) AS resid
        FROM base b JOIN solved s USING (fold)
    )
    SELECT fold,
           CAST(any_value(n_train_d) AS BIGINT) AS n_train,
           CAST(any_value(n_test_d) AS BIGINT) AS n_test,
           round(any_value(intercept), 2) AS intercept,
           round(any_value(b1), 2) AS b1,
           round(any_value(b2), 2) AS b2,
           round(sqrt(avg(resid*resid)), 2) AS rmse,
           round(avg(abs(resid)), 2) AS mae
    FROM scored GROUP BY 1
    """,
    description="K-fold cross-validated OLS (operators/crossval.py:"
    "kfold_linear_cv; generalizes reference scripts/"
    "04_train_sparkml.py:114-151's single train/eval split to k=4): "
    "the 100-TB CV trick — ONE groupBy(fold) collects every fold's "
    "sufficient statistics, train-side stats for fold f are just "
    "total - fold_f (sums are additive), and all four fold models "
    "solve closed-form (Cramer's 3x3, term-for-term the "
    "ml_train_linear_contract arithmetic) at k-cardinality; a second "
    "pass broadcasts the k coefficient rows back and aggregates "
    "held-out RMSE/MAE per fold. Two shuffles total regardless of k "
    "(the naive loop is k full train/score cycles). Deterministic "
    "modulo folds on l_orderkey; coefficients/metrics at 2 decimals "
    "(the proven ml_train_linear rounding — determinant cancellation "
    "amplifies summation-order noise).",
)
def q_ml_cv_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.crossval import kfold_linear_cv

    li = load_table(spark, sf_dir, "lineitem")
    return kfold_linear_cv(
        li,
        "l_quantity",
        "l_discount",
        "l_extendedprice",
        F.col("l_orderkey") % 4,
        k=4,
        decimals=2,
    )


def _eval_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared scored-corpus fixture for the classifier-evaluation
    gates: a deterministic 'score' (sum of the first two embedding
    components — pure IEEE arithmetic, no transcendentals, so DuckDB
    restates it bit-for-bit) and a binary label (odd class id)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        (
            F.element_at("embedding", 1).cast("double")
            + F.element_at("embedding", 2).cast("double")
        ).alias("s"),
        (F.col("label") % 2 == 1).alias("y"),
    )


_EVAL_BASE_SQL = """
        SELECT CAST(embedding[1] AS DOUBLE) + CAST(embedding[2] AS DOUBLE) AS s,
               (label % 2) = 1 AS y
        FROM embeddings
"""


@register(
    "ml_auc_contract",
    oracle=f"""
    WITH base AS ({_EVAL_BASE_SQL}),
    cells AS (
        SELECT LEAST(GREATEST(CAST(floor((s - (-1.0)) / 2.0 * 512)
                                   AS BIGINT), 0), 511) AS b,
               sum(CASE WHEN y THEN 1 ELSE 0 END) AS tp,
               sum(CASE WHEN y THEN 0 ELSE 1 END) AS fp
        FROM base GROUP BY 1
    ),
    curve AS (
        SELECT tp, fp,
               sum(tp) OVER (ORDER BY b DESC
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS cum_tp
        FROM cells
    )
    SELECT CAST(sum(tp) + sum(fp) AS BIGINT) AS n,
           CAST(sum(tp) AS BIGINT) AS n_pos,
           CAST(sum(fp) AS BIGINT) AS n_neg,
           round(CASE WHEN sum(tp) > 0 AND sum(fp) > 0 THEN
                 sum(fp * (cum_tp - tp / 2.0))
                     / (CAST(sum(tp) AS DOUBLE) * CAST(sum(fp) AS DOUBLE))
                 END, 6) AS auc
    FROM curve
    """,
    description="Bucketed trapezoidal ROC AUC (ml/evaluation.py:"
    "roc_auc) over a deterministic embedding-derived score: scores "
    "quantize into 512 fixed-width cells (ONE map-side-combined "
    "shuffle at bucket cardinality — never the rank-sum global sort), "
    "the <=512-point ROC walk runs on one answer-scale partition, and "
    "ties inside a cell earn the half-credit rectangle exactly as the "
    "rank-AUC convention. The oracle replays the identical bucket "
    "arithmetic (pure IEEE ops, no transcendentals) and curve algebra.",
)
def q_ml_auc_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ml.evaluation import roc_auc

    return roc_auc(
        _eval_base(spark, sf_dir), "s", "y", lo=-1.0, hi=1.0, n_buckets=512
    )


@register(
    "ml_classification_report_contract",
    oracle=f"""
    WITH base AS ({_EVAL_BASE_SQL}),
    t(threshold) AS (VALUES (-0.2), (0.0), (0.2)),
    agg AS (
        SELECT t.threshold,
               count(*) AS n,
               sum(CASE WHEN y THEN 1 ELSE 0 END) AS p,
               sum(CASE WHEN s >= t.threshold AND y THEN 1 ELSE 0 END) AS tp,
               sum(CASE WHEN s >= t.threshold AND NOT y THEN 1 ELSE 0 END) AS fp
        FROM base, t GROUP BY 1
    )
    SELECT CAST(threshold AS DOUBLE) AS threshold,
           CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
           CAST(n - p - fp AS BIGINT) AS tn, CAST(p - tp AS BIGINT) AS fn,
           round((tp + (n - p - fp)) / CAST(n AS DOUBLE), 6) AS accuracy,
           round(CASE WHEN tp + fp > 0
                      THEN tp / CAST(tp + fp AS DOUBLE) END, 6) AS precision,
           round(CASE WHEN p > 0 THEN tp / CAST(p AS DOUBLE) END, 6) AS recall,
           round(CASE WHEN tp + fp > 0 AND p > 0
                      AND tp / CAST(tp + fp AS DOUBLE)
                          + tp / CAST(p AS DOUBLE) > 0
                 THEN 2 * (tp / CAST(tp + fp AS DOUBLE))
                        * (tp / CAST(p AS DOUBLE))
                      / (tp / CAST(tp + fp AS DOUBLE)
                         + tp / CAST(p AS DOUBLE)) END, 6) AS f1
    FROM agg
    """,
    description="Thresholded confusion/PRF report (ml/evaluation.py:"
    "classification_report): ALL thresholds from ONE conditional-sum "
    "aggregation pass (k thresholds = k extra sum columns, never k "
    "scans), reshaped to rows with inline() at answer scale; "
    "degenerate denominators yield NULL, not a fake 0.0. The oracle "
    "restates the pass as a threshold-spine cross join over the same "
    "deterministic score.",
)
def q_ml_classification_report_contract(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..ml.evaluation import classification_report

    return classification_report(
        _eval_base(spark, sf_dir), "s", "y", thresholds=[-0.2, 0.0, 0.2]
    )


@register(
    "ml_lift_table_contract",
    oracle=f"""
    WITH base AS ({_EVAL_BASE_SQL}),
    b AS (
        SELECT quantile_cont(s, [0.2, 0.4, 0.6, 0.8]) AS q FROM base
    ),
    binned AS (
        SELECT (CASE WHEN s > q[1] THEN 1 ELSE 0 END
              + CASE WHEN s > q[2] THEN 1 ELSE 0 END
              + CASE WHEN s > q[3] THEN 1 ELSE 0 END
              + CASE WHEN s > q[4] THEN 1 ELSE 0 END) AS bin, y
        FROM base, b
    ),
    per_bin AS (
        SELECT bin, count(*) AS n,
               sum(CASE WHEN y THEN 1 ELSE 0 END) AS n_pos
        FROM binned GROUP BY 1
    ),
    tot AS (SELECT sum(n) AS tn, sum(n_pos) AS tp FROM per_bin)
    SELECT CAST(bin AS BIGINT) AS bin, CAST(n AS BIGINT) AS n,
           CAST(n_pos AS BIGINT) AS n_pos,
           round(n_pos / CAST(n AS DOUBLE), 6) AS pos_rate,
           round(CASE WHEN tp > 0 THEN (n_pos / CAST(n AS DOUBLE))
                          / (tp / CAST(tn AS DOUBLE)) END, 6) AS lift,
           round(CASE WHEN tp > 0 THEN
                 sum(n_pos) OVER (ORDER BY bin DESC
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND CURRENT ROW)
                     / CAST(tp AS DOUBLE) END, 6) AS cum_capture
    FROM per_bin, tot
    """,
    description="Score-quintile lift/gains table (ml/evaluation.py:"
    "lift_table): equal-frequency score bins via interpolated quantile "
    "BOUNDS + map-only assignment (the decile_profile_contract "
    "machinery — no ntile global sort), per-bin positive rate, lift "
    "over base rate, and top-down cumulative capture on an answer-"
    "scale window. The ranking-quality table every targeting "
    "dashboard plots.",
)
def q_ml_lift_table_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ml.evaluation import lift_table

    return lift_table(_eval_base(spark, sf_dir), "s", "y", n_bins=5)


@register(
    "woe_iv_contract",
    oracle="""
    WITH per AS (
        SELECT o_orderpriority AS category,
               count(*) AS n,
               sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS n_pos,
               sum(CASE WHEN o_orderstatus = 'F' THEN 0 ELSE 1 END) AS n_neg
        FROM orders GROUP BY 1
    ),
    tot AS (SELECT sum(n_pos) AS tp, sum(n_neg) AS tn FROM per),
    shares AS (
        SELECT category, n, n_pos, n_neg,
               (n_pos + 0.0) / CAST(tp AS DOUBLE) AS ps,
               (n_neg + 0.0) / CAST(tn AS DOUBLE) AS ns2
        FROM per, tot
    )
    SELECT category, CAST(n AS BIGINT) AS n,
           CAST(n_pos AS BIGINT) AS n_pos, CAST(n_neg AS BIGINT) AS n_neg,
           round(ps, 6) AS pos_share,
           round(ns2, 6) AS neg_share,
           round(CASE WHEN ps > 0 AND ns2 > 0 THEN ln(ps / ns2) END, 6)
               AS woe,
           round(CASE WHEN ps > 0 AND ns2 > 0
                      THEN (ps - ns2) * ln(ps / ns2) END, 6) AS iv_part
    FROM shares
    """,
    description="Weight-of-evidence / information value (operators/"
    "woe.py:woe_iv): the credit-scorecard screen for order priority vs "
    "fulfilled status — WOE(c) = ln(P(c|pos)/P(c|neg)) per level plus "
    "its IV contribution. ONE map-side-combined groupBy at category "
    "cardinality; class totals ride an unpartitioned window over the "
    "post-agg frame (no totals cross-join, no second scan — asserted "
    "in plan tests); every input to the arithmetic is an exact integer "
    "count. Zero cells yield NULL (laplace smoothing available), never "
    "a silent clamp.",
)
def q_woe_iv_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.woe import woe_iv

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_orderstatus"
    )
    return woe_iv(
        orders, "o_orderpriority", F.col("o_orderstatus") == "F"
    )


@register(
    "target_encoding_contract",
    oracle="""
    WITH base AS (
        SELECT o_orderkey, o_orderpriority,
               CAST(o_totalprice AS DECIMAL(18,2)) AS y
        FROM orders
    ),
    enc AS (
        SELECT o_orderkey, o_orderpriority,
               count(y) OVER (PARTITION BY o_orderpriority) AS nc,
               sum(y) OVER (PARTITION BY o_orderpriority) AS sc,
               y
        FROM base
    )
    SELECT o_orderkey, o_orderpriority,
           round(CASE WHEN y IS NOT NULL AND nc - 1 + 0.0 > 0 THEN
                 (CAST(sc AS DOUBLE) - CAST(y AS DOUBLE) + 0.0 * 0.0)
                     / (nc - 1 + 0.0) END, 6) AS enc
    FROM enc
    """,
    description="Leave-one-out target encoding (operators/encode.py:"
    "target_encode_loo): each order's priority level encoded as the "
    "mean total price of the OTHER orders at that level — the "
    "leakage-safe mean encoding for high-cardinality categoricals. "
    "ONE groupBy(category) broadcast-joined back onto rows (3 numbers "
    "per category ship, never a per-category window over raw rows — a "
    "hot category would be a window skew bomb); the target rides as "
    "DECIMAL(18,2) so per-category sums are EXACT and order-"
    "independent, making 15k row-level encodings bit-stable across "
    "partitionings (the float-sum alternative is not hash-gateable at "
    "row cardinality). The oracle restates it with partition windows "
    "over the same decimal.",
)
def q_target_encoding_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.encode import target_encode_loo

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.col("o_totalprice").cast("decimal(18,2)").alias("y"),
    )
    out = target_encode_loo(orders, "o_orderpriority", "y")
    return out.select("o_orderkey", "o_orderpriority", "enc")


@register(
    "brier_ece_contract",
    oracle="""
    WITH base AS (
        SELECT abs(CAST(embedding[1] AS DOUBLE))
                 / (abs(CAST(embedding[1] AS DOUBLE))
                    + abs(CAST(embedding[2] AS DOUBLE)) + 1.0) AS p,
               (label % 2) = 1 AS y
        FROM embeddings
    ),
    cells AS (
        SELECT LEAST(GREATEST(CAST(floor(p * 10) AS BIGINT), 0), 9) AS b,
               count(*) AS n,
               sum(p) AS sp,
               sum(CASE WHEN y THEN 1.0 ELSE 0.0 END) AS sy,
               sum((p - CASE WHEN y THEN 1.0 ELSE 0.0 END)
                   * (p - CASE WHEN y THEN 1.0 ELSE 0.0 END)) AS sq
        FROM base GROUP BY 1
    )
    SELECT CAST(sum(n) AS BIGINT) AS n,
           round(sum(sq) / sum(n), 6) AS brier,
           round(sum(abs(sp - sy)) / sum(n), 6) AS ece
    FROM cells
    """,
    description="Brier score + expected calibration error "
    "(ml/evaluation.py:brier_and_ece) of a deterministic "
    "probability — abs(e1)/(abs(e1)+abs(e2)+1), pure IEEE arithmetic "
    "in [0,1) that DuckDB restates bit-for-bit — against the odd-class "
    "label. ONE scan feeds the 10 fixed-width probability cells "
    "(map-side-combined groupBy at bucket cardinality); Brier reduces "
    "exactly from per-cell squared-error sums ((p-y)^2 partitions "
    "cleanly by cell) and ECE is the bucket-count-weighted "
    "|avg_prob - pos_rate| sum, both on the <=10-row cell frame. "
    "Probabilities outside [0,1] hard-fail in-plan (ADVICE r7) rather "
    "than clamping raw margins into the edge buckets.",
)
def q_brier_ece_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ml.evaluation import brier_and_ece

    emb = load_table(spark, sf_dir, "embeddings")
    e1 = F.abs(F.element_at("embedding", 1).cast("double"))
    e2 = F.abs(F.element_at("embedding", 2).cast("double"))
    base = emb.select(
        (e1 / (e1 + e2 + F.lit(1.0))).alias("p"),
        (F.col("label") % 2 == 1).alias("y"),
    )
    return brier_and_ece(base, "p", "y", n_buckets=10)


@register(
    "conformal_interval_contract",
    oracle="""
    WITH base AS (
        SELECT (l_orderkey % 5) = 0 AS cal,
               abs(l_extendedprice - 1000.0 * l_quantity) AS r
        FROM lineitem
        WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
    ),
    calset AS (SELECT r FROM base WHERE cal),
    nk AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(ceil((count(*) + 1) * 0.9) AS BIGINT) AS k
        FROM calset
    ),
    q AS (
        SELECT ranked.r AS q
        FROM (SELECT r, row_number() OVER (ORDER BY r) AS rn
              FROM calset) ranked, nk
        WHERE ranked.rn = nk.k
    )
    SELECT nk.n AS n_cal,
           CAST(nk.k AS INTEGER) AS k_order,
           round(q.q, 6) AS q_hat,
           CAST(count(*) AS BIGINT) AS n_test,
           CAST(sum(CASE WHEN t.r <= q.q THEN 1 ELSE 0 END) AS BIGINT)
               AS n_covered,
           round(avg(CASE WHEN t.r <= q.q THEN 1.0 ELSE 0.0 END), 6)
               AS coverage,
           round(2.0 * q.q, 6) AS interval_width
    FROM base t, nk, q
    WHERE NOT t.cal
    GROUP BY 1, 2, 3, 7
    """,
    description="Split-conformal prediction interval "
    "(ml/conformal.py:split_conformal_profile): the k-th smallest "
    "calibration residual with k = ceil((n+1)(1-alpha)) gives "
    "distribution-free >=90% coverage for ANY point predictor; "
    "fitted on the pmod-5 calibration split of a deterministic "
    "quantity-based price predictor and verified on the disjoint "
    "test split in the same one-row readout (empirical coverage "
    "0.90-0.91 on the fixtures — the guarantee, observed). Residuals "
    "reduce in ONE map-side pass; the exact path takes the order "
    "statistic via percentile_disc at the foldable fraction k/n "
    "(bit-safe: cume_dist and the fraction are the same IEEE "
    "division); exact=False keeps the guarantee under KLL sketching "
    "by asking for rank k + 2n/accuracy (intervals only widen — the "
    "cap_per_group rank-margin argument, pinned conservative in "
    "pytest). The oracle uses DIFFERENT algebra: a row_number order "
    "statistic, no percentile function at all.",
)
def q_conformal_interval_contract(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..ml.conformal import split_conformal_profile

    li = load_table(spark, sf_dir, "lineitem")
    base = li.select(
        (F.lit(1000.0) * F.col("l_quantity")).alias("pred"),
        F.col("l_extendedprice").alias("y"),
        (F.col("l_orderkey") % 5 == 0).alias("cal"),
    )
    return split_conformal_profile(base, "pred", "y", F.col("cal"), alpha=0.1)


@register(
    "learning_curve_contract",
    oracle="""
    WITH base AS (
        SELECT l_orderkey % 5 AS slc,
               l_quantity AS x1, l_discount AS x2, l_extendedprice AS y
        FROM lineitem
    ),
    per_slice AS (
        SELECT slc, CAST(count(*) AS DOUBLE) AS n,
               sum(x1) AS sx1, sum(x2) AS sx2,
               sum(x1*x1) AS sx11, sum(x1*x2) AS sx12, sum(x2*x2) AS sx22,
               sum(y) AS sy, sum(x1*y) AS sx1y, sum(x2*y) AS sx2y
        FROM base GROUP BY 1
    ),
    train AS (
        SELECT slc,
               sum(n)    OVER w AS n,    sum(sx1)  OVER w AS sx1,
               sum(sx2)  OVER w AS sx2,  sum(sx11) OVER w AS sx11,
               sum(sx12) OVER w AS sx12, sum(sx22) OVER w AS sx22,
               sum(sy)   OVER w AS sy,   sum(sx1y) OVER w AS sx1y,
               sum(sx2y) OVER w AS sx2y
        FROM per_slice WHERE slc < 4
        WINDOW w AS (ORDER BY slc ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW)
    ),
    solved AS (
        SELECT round((slc + 1) / 4.0, 6) AS fraction,
               CAST(n AS BIGINT) AS n_train,
               CASE WHEN det != 0 THEN det_a / det END AS intercept,
               CASE WHEN det != 0 THEN det_b1 / det END AS b1,
               CASE WHEN det != 0 THEN det_b2 / det END AS b2
        FROM (
            SELECT slc, n,
                   (n*(sx11*sx22 - sx12*sx12) - sx1*(sx1*sx22 - sx12*sx2)
                      + sx2*(sx1*sx12 - sx11*sx2)) AS det,
                   (sy*(sx11*sx22 - sx12*sx12) - sx1*(sx1y*sx22 - sx12*sx2y)
                      + sx2*(sx1y*sx12 - sx11*sx2y)) AS det_a,
                   (n*(sx1y*sx22 - sx2y*sx12) - sy*(sx1*sx22 - sx12*sx2)
                      + sx2*(sx1*sx2y - sx1y*sx2)) AS det_b1,
                   (n*(sx11*sx2y - sx12*sx1y) - sx1*(sx1*sx2y - sx1y*sx2)
                      + sy*(sx1*sx12 - sx11*sx2)) AS det_b2
            FROM train
        )
    ),
    scored AS (
        SELECT s.fraction, s.n_train, s.intercept, s.b1, s.b2,
               b.y - (s.intercept + s.b1*b.x1 + s.b2*b.x2) AS resid
        FROM base b CROSS JOIN solved s
        WHERE b.slc = 4
    )
    SELECT fraction,
           any_value(n_train) AS n_train,
           CAST(count(*) AS BIGINT) AS n_test,
           round(any_value(intercept), 2) AS intercept,
           round(any_value(b1), 2) AS b1,
           round(any_value(b2), 2) AS b2,
           round(sqrt(avg(resid*resid)), 2) AS rmse,
           round(avg(abs(resid)), 2) AS mae
    FROM scored GROUP BY 1
    """,
    description="Learning curve from one statistics pass (operators/"
    "crossval.py:learning_curve_linear; generalizes reference "
    "scripts/04_train_sparkml.py:114-151's single train/eval fit to a "
    "sample-efficiency readout): deterministic modulo slices on "
    "l_orderkey (slices 0-3 = nested 25/50/75/100% training sets, "
    "slice 4 = the FIXED held-out test set every point scores on). "
    "The kfold sufficient-statistics trick runs in the other "
    "direction — nested training stats are a CUMULATIVE window over "
    "the answer-scale per-slice frame (sums are additive), all four "
    "models solve closed-form (Cramer 3x3, term-for-term the "
    "ml_cv/ml_train_linear arithmetic), one scoring pass broadcasts "
    "the 4 model rows onto the test slice. Two shuffles total "
    "regardless of curve resolution; slice-domain drift hard-fails "
    "in-plan through the consumed n column (Catalyst prunes dangling "
    "check columns — pytest-pinned). Metrics at 2 decimals (the "
    "determinant-cancellation rounding precedent); numpy-lstsq "
    "refit twin + exact-recovery hand fixture in tests/test_crossval.py.",
)
def q_learning_curve_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.crossval import learning_curve_linear

    li = load_table(spark, sf_dir, "lineitem")
    return learning_curve_linear(
        li,
        "l_quantity",
        "l_discount",
        "l_extendedprice",
        F.pmod(F.col("l_orderkey"), F.lit(5)),
        n_slices=4,
        decimals=2,
    )


@register(
    "ranking_metrics_contract",
    oracle="""
    WITH j AS (
        SELECT CAST(o.o_custkey AS BIGINT) AS custkey,
               CAST(l.l_partkey AS BIGINT) AS partkey,
               l.l_quantity AS qty, l.l_returnflag AS rf
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_custkey < 100
    ),
    spend AS (
        SELECT custkey, partkey, CAST(sum(qty) AS BIGINT) AS q
        FROM j GROUP BY 1, 2
    ),
    ranked AS (
        SELECT custkey, partkey,
               row_number() OVER (PARTITION BY custkey
                                  ORDER BY q DESC, partkey ASC) AS rnk
        FROM spend QUALIFY rnk <= 10
    ),
    truth AS (
        SELECT custkey, partkey, CAST(count(*) AS DOUBLE) AS rel
        FROM j WHERE rf = 'R' GROUP BY 1, 2
    ),
    ks AS (SELECT unnest([3, 10]) AS k),
    ideal AS (
        SELECT custkey, rel,
               row_number() OVER (PARTITION BY custkey
                                  ORDER BY rel DESC, partkey ASC) AS pos
        FROM truth
    ),
    idcg AS (
        SELECT custkey, k,
               sum(CASE WHEN pos <= k AND rel > 0
                   THEN (pow(2.0::DOUBLE, rel) - 1.0::DOUBLE)
                        / log2(pos + 1.0::DOUBLE) END) AS idcg_v,
               CAST(sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_rel
        FROM ideal, ks GROUP BY 1, 2
    ),
    sysj AS (
        SELECT r.custkey, r.rnk, coalesce(t.rel, 0.0::DOUBLE) AS rel,
               sum(CASE WHEN coalesce(t.rel, 0.0::DOUBLE) > 0
                   THEN 1 ELSE 0 END)
                   OVER (PARTITION BY r.custkey
                         ORDER BY r.rnk ASC, r.partkey ASC
                         ROWS UNBOUNDED PRECEDING) AS cum_rel
        FROM ranked r LEFT JOIN truth t USING (custkey, partkey)
    ),
    sysk AS (
        SELECT custkey, k,
               sum(CASE WHEN rnk <= k AND rel > 0
                   THEN (pow(2.0::DOUBLE, rel) - 1.0::DOUBLE)
                        / log2(rnk + 1.0::DOUBLE) END) AS dcg_v,
               max(CASE WHEN rnk <= k AND rel > 0
                   THEN 1.0::DOUBLE / rnk END) AS rr,
               CAST(sum(CASE WHEN rnk <= k THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_ranked,
               CAST(sum(CASE WHEN rnk <= k AND rel > 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_hit,
               sum(CASE WHEN rnk <= k AND rel > 0
                   THEN CAST(cum_rel AS DOUBLE) / rnk END) AS ap_num
        FROM sysj, ks GROUP BY 1, 2
    )
    SELECT i.custkey, CAST(i.k AS INT) AS k, i.n_rel,
           coalesce(s.n_ranked, 0) AS n_ranked,
           round(CASE WHEN i.n_rel > 0
                 THEN coalesce(s.dcg_v / i.idcg_v, 0.0::DOUBLE) END,
                 6) AS ndcg,
           round(CASE WHEN i.n_rel > 0
                 THEN coalesce(s.rr, 0.0::DOUBLE) END, 6) AS mrr,
           CASE WHEN i.n_rel > 0
                THEN coalesce(s.rr > 0, FALSE) END AS hit,
           round(CASE WHEN i.n_rel > 0
                 THEN coalesce(CAST(s.n_hit AS DOUBLE) / i.k,
                               0.0::DOUBLE) END, 6) AS precision,
           round(CASE WHEN i.n_rel > 0
                 THEN coalesce(CAST(s.n_hit AS DOUBLE)
                               / CAST(i.n_rel AS DOUBLE),
                               0.0::DOUBLE) END, 6) AS recall,
           round(CASE WHEN i.n_rel > 0
                 THEN coalesce(s.ap_num
                               / CAST(LEAST(i.n_rel, CAST(i.k AS BIGINT))
                                      AS DOUBLE),
                               0.0::DOUBLE) END, 6) AS ap
    FROM idcg i LEFT JOIN sysk s ON i.custkey = s.custkey AND i.k = s.k
    """,
    description="Graded ranking-quality evaluation — NDCG@k / MRR@k / "
    "hit@k / precision@k / recall@k / AP@k (ml/evaluation.py:"
    "ranking_metrics, Järvelin & Kekäläinen TOIS'02 / Voorhees TREC-8 "
    "/ Buckley & Voorhees SIGIR'00 for the min(n_rel,k) AP "
    "denominator; AP's cumulative-precision terms ride ONE "
    "answer-scale per-query window over the system frame) over a "
    "deterministic retrieval scenario on customers < 100: the 'system' ranks each customer's "
    "top-10 parts by exact BIGINT quantity (integer-valued doubles "
    "summed then cast — order-independent, ties to partkey asc), the "
    "'judgements' grade every returned part (l_returnflag = 'R') by "
    "its return count, and the metric frame reads NDCG/MRR/hit at "
    "k in {3, 10} per judged customer — the graded 2^rel-1 gain "
    "path, the first-relevant reciprocal rank, the 0-vs-NULL "
    "(answered-badly vs nothing-judged) split, and the "
    "truth-universe join semantics all exercised on real data. The "
    "ranking-quality readout the BM25/RRF/ANN stack was missing: "
    "recall gates say the candidate was FOUND, this gate grades "
    "WHERE it landed. Both sides are answer-scale by construction "
    "(top-10 frames, judgement lists); the only windows partition "
    "per customer over <=10-ish rows; gains/log2 discounts are "
    "closed-form IEEE doubles the oracle restates term-for-term "
    "before 6-decimal rounding. Hand-worked binary k=3 + graded "
    "k=2 fixtures (DCG sums traced by hand) in "
    "tests/test_ranking_metrics.py.",
)
def q_ranking_metrics_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..ml.evaluation import ranking_metrics

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.col("l_partkey").cast("long").alias("partkey"),
        "l_quantity",
        "l_returnflag",
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", F.col("o_custkey").cast("long").alias("custkey"))
        .filter(F.col("custkey") < 100)
    )
    j = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        "custkey", "partkey", "l_quantity", "l_returnflag"
    )
    spend = j.groupBy("custkey", "partkey").agg(
        F.sum("l_quantity").cast("long").alias("__q")
    )
    w = Window.partitionBy("custkey").orderBy(
        F.desc("__q"), F.asc("partkey")
    )
    ranked = (
        spend.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("custkey", "partkey", "rank")
    )
    truth = (
        j.filter(F.col("l_returnflag") == "R")
        .groupBy("custkey", "partkey")
        .agg(F.count(F.lit(1)).cast("double").alias("rel"))
    )
    return ranking_metrics(
        ranked, truth, ["custkey"], ["partkey"], [3, 10], rel_col="rel"
    )
