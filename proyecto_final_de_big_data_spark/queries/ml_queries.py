"""ML-loop queries (reference entry points 04/05). Rows-only checks:
training metrics are seed-pinned but parallelism-dependent (SURVEY §7
risks), so the driver verifies row count + schema, and unit tests
assert metric ranges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..ml.pipeline import TrainConfig, metrics_frame, train_and_evaluate
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
