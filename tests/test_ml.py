"""ML loop: train/evaluate/save/load/score on the sf0.001 fixtures
(reference M1–M7). Metric values are range-asserted, not pinned
(seeded but parallelism-dependent — SURVEY §7 risks)."""

from __future__ import annotations

from proyecto_final_de_big_data_spark.catalog import load_table
from proyecto_final_de_big_data_spark.ml.pipeline import (
    TrainConfig,
    batch_score,
    load_model,
    metrics_frame,
    save_model,
    train_and_evaluate,
)


def test_lr_train_evaluate_score_roundtrip(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem")
    cfg = TrainConfig(
        label="l_extendedprice",
        numeric_features=["l_quantity", "l_discount"],
        categorical_features=["l_returnflag"],
        algorithm="lr",
        max_iter=10,
    )
    model, metrics, _ = train_and_evaluate(li, cfg)
    assert metrics["rows_train"] + metrics["rows_test"] == li.count()
    # synthetic fixture columns are mutually independent → r2 ≈ 0 is the
    # correct outcome; this test checks the loop's plumbing
    assert -0.5 < metrics["r2"] <= 1.0
    assert metrics["rmse"] > 0 and metrics["mae"] > 0

    path = str(tmp_path / "model")
    save_model(model, path)
    scored = batch_score(load_model(path), li)
    assert scored.count() == li.count()
    assert "prediction" in scored.columns


def test_lr_learns_synthetic_relationship(spark):
    # y = 3x + 2 + tiny noise — the model must actually learn (r2 ≈ 1),
    # proving the loop trains rather than predicting the mean.
    rows = [(float(i), 3.0 * i + 2.0 + (i % 7) * 0.01) for i in range(200)]
    df = spark.createDataFrame(rows, ["x", "y"])
    cfg = TrainConfig(label="y", numeric_features=["x"], algorithm="lr", max_iter=20)
    _, metrics, _ = train_and_evaluate(df, cfg)
    assert metrics["r2"] > 0.99


def test_gbt_and_rf_train(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").limit(500)
    for algo, extra in (("gbt", {"max_iter": 5}), ("rf", {"num_trees": 5})):
        cfg = TrainConfig(
            label="l_extendedprice",
            numeric_features=["l_quantity"],
            categorical_features=[],
            algorithm=algo,
            max_depth=3,
            **extra,
        )
        _, metrics, _ = train_and_evaluate(li, cfg)
        assert metrics["rmse"] > 0


def test_metrics_frame_single_row(spark):
    mf = metrics_frame(spark, {"rmse": 1.0, "mae": 0.5}, algorithm="lr")
    rows = mf.collect()
    assert len(rows) == 1
    assert rows[0]["algorithm"] == "lr"


# ---------------------------------------------------------------------------
# Text quality classifier (ml/text_classifier.py)
# ---------------------------------------------------------------------------


def test_text_classifier_separates_planted_spam(spark):
    from pyspark.sql import functions as F

    from proyecto_final_de_big_data_spark.ml.text_classifier import (
        TextClassifierConfig,
        score_quality,
        train_quality_classifier,
    )

    good = [(i, f"alpha beta gamma delta {i % 7}", 1.0) for i in range(60)]
    spam = [(1000 + i, "zzqx zzqx zzqx zzqx", 0.0) for i in range(60)]
    df = spark.createDataFrame(good + spam, "doc_id long, text string, label double")
    train = df.filter(F.col("doc_id") % 2 == 0)
    test = df.filter(F.col("doc_id") % 2 == 1)
    model = train_quality_classifier(
        train, TextClassifierConfig(n_features=256, max_iter=20)
    )
    scored = score_quality(model, test)
    # output schema: original columns + quality_prob + keep, no ML residue
    assert set(scored.columns) == {"doc_id", "text", "label", "quality_prob", "keep"}
    rows = scored.collect()
    acc = sum(1 for r in rows if r["keep"] == (r["label"] == 1.0)) / len(rows)
    assert acc >= 0.95  # trivially separable by the spam token feature
    assert all(0.0 <= r["quality_prob"] <= 1.0 for r in rows)


def test_text_classifier_scoring_is_map_only(spark):
    import contextlib
    import io

    from proyecto_final_de_big_data_spark.ml.text_classifier import (
        TextClassifierConfig,
        score_quality,
        train_quality_classifier,
    )

    df = spark.createDataFrame(
        [(i, "alpha beta", float(i % 2)) for i in range(40)],
        "doc_id long, text string, label double",
    )
    model = train_quality_classifier(
        df, TextClassifierConfig(n_features=64, max_iter=5)
    )
    scored = score_quality(model, df)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        scored.explain("formatted")
    # the 100-TB scoring path must be a pure projection over the scan
    assert "Exchange" not in buf.getvalue()


def test_evaluate_matches_regression_evaluator(spark):
    """The single-pass closed-form evaluate() (r11 optimization: one
    aggregation instead of three RegressionEvaluator jobs) must agree
    with MLlib's evaluator on every metric to float tolerance."""
    from pyspark.ml.evaluation import RegressionEvaluator

    from proyecto_final_de_big_data_spark.ml.pipeline import evaluate

    rows = [
        (1.0, 1.5), (2.0, 1.8), (3.0, 3.3), (4.5, 4.4),
        (5.0, 4.0), (0.5, 0.9), (2.5, 2.5), (7.0, 6.1),
    ]
    preds = spark.createDataFrame(rows, ["y", "prediction"])
    got = evaluate(preds, "y")
    for metric in ("rmse", "mae", "r2"):
        ev = RegressionEvaluator(
            labelCol="y", predictionCol="prediction", metricName=metric
        )
        want = ev.evaluate(preds)
        assert abs(got[metric] - want) < 1e-9, (metric, got[metric], want)


def test_evaluate_empty_frame_nan(spark):
    import math

    from proyecto_final_de_big_data_spark.ml.pipeline import evaluate

    preds = spark.createDataFrame([], "y double, prediction double")
    got = evaluate(preds, "y")
    assert all(math.isnan(got[m]) for m in ("rmse", "mae", "r2"))
