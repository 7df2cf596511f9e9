"""Binning operators (operators/binning.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F



# -- equal-frequency (quantile-bound) binning --------------------------

from proyecto_final_de_big_data_spark.operators.binning import (  # noqa: E402
    equal_frequency_bins,
)


def test_equal_frequency_counts_balance(spark):
    df = spark.range(0, 1000).select(F.col("id").cast("double").alias("v"))
    binned, bounds = equal_frequency_bins(df, "v", n_bins=4)
    counts = {r["bin"]: r["n"] for r in binned.groupBy("bin").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert len(bounds) == 3
    assert set(counts) == {0, 1, 2, 3}
    assert all(240 <= c <= 260 for c in counts.values())


def test_ties_go_to_lower_bin(spark):
    # 8 copies of two values: the 0.5 bound IS the lower value, and
    # every row equal to it must land in bin 0 (strict >).
    df = spark.createDataFrame([(1.0,)] * 4 + [(2.0,)] * 4, "v double")
    binned, bounds = equal_frequency_bins(df, "v", n_bins=2)
    got = {r["v"]: r["bin"] for r in binned.distinct().collect()}
    assert got[1.0] == 0 and got[2.0] == 1


def test_approx_mode_bins_everything(spark):
    df = spark.range(0, 5000).select((F.col("id") % 997).cast("double").alias("v"))
    binned, bounds = equal_frequency_bins(df, "v", n_bins=10, exact=False)
    assert len(bounds) == 9 and bounds == sorted(bounds)
    n_bins_seen = binned.select("bin").distinct().count()
    assert 8 <= n_bins_seen <= 10
    assert binned.filter((F.col("bin") < 0) | (F.col("bin") > 9)).count() == 0


def test_n_bins_validation(spark):
    df = spark.range(2).select(F.col("id").cast("double").alias("v"))
    with pytest.raises(ValueError, match="n_bins"):
        equal_frequency_bins(df, "v", n_bins=1)


def test_binning_stage_is_exchange_free(spark):
    """After the bounds pass, assigning bins must be map-only."""
    df = spark.range(0, 100).select(F.col("id").cast("double").alias("v"))
    binned, _ = equal_frequency_bins(df, "v", n_bins=5)
    plan = binned._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_equal_frequency_empty_frame_raises(spark):
    # ADVICE r6: percentile over zero non-NULL values returns NULL —
    # must surface as a named ValueError, not a NoneType iteration.
    df = spark.createDataFrame([(1.0,)], "v double").filter(F.lit(False))
    with pytest.raises(ValueError, match="no non-NULL"):
        equal_frequency_bins(df, "v")


def test_equal_frequency_all_null_raises(spark):
    df = spark.createDataFrame([(None,), (None,)], "v double")
    with pytest.raises(ValueError, match="no non-NULL"):
        equal_frequency_bins(df, "v")
