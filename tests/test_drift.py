"""PSI drift detection (operators/drift.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from proyecto_final_de_big_data_spark.operators.drift import (
    psi_categorical,
    psi_numeric,
)


def _vals(spark, xs):
    return spark.createDataFrame([(float(x),) for x in xs], "v double")


def _total_psi(profile):
    return sum(r["psi_term"] for r in profile.collect())


def test_identical_snapshots_score_zero(spark):
    xs = [i * 0.1 for i in range(1000)]
    ref, cur = _vals(spark, xs), _vals(spark, xs)
    profile, bounds = psi_numeric(ref, cur, "v", n_bins=10)
    assert len(bounds) == 9
    assert abs(_total_psi(profile)) < 1e-9


def test_shifted_distribution_scores_high(spark):
    ref = _vals(spark, [i * 0.1 for i in range(1000)])
    cur = _vals(spark, [50 + i * 0.1 for i in range(1000)])  # half out of range
    profile, _ = psi_numeric(ref, cur, "v", n_bins=10)
    assert _total_psi(profile) > 0.25  # "action required" band


def test_current_binned_with_reference_bounds(spark):
    # All current mass above the reference max lands in the TOP bin
    # (bounds come from ref only), visible as n_cur concentration.
    ref = _vals(spark, range(100))
    cur = _vals(spark, [1000.0] * 50)
    profile, _ = psi_numeric(ref, cur, "v", n_bins=4)
    rows = {r["bin"]: r for r in profile.collect()}
    assert rows[3]["n_cur"] == 50
    assert all(rows[b]["n_cur"] == 0 for b in rows if b != 3)


def test_categorical_one_sided_categories_hit_epsilon(spark):
    ref = spark.createDataFrame([("a",)] * 50 + [("b",)] * 50, "c string")
    cur = spark.createDataFrame([("a",)] * 50 + [("z",)] * 50, "c string")
    rows = {r["c"]: r for r in psi_categorical(ref, cur, "c").collect()}
    assert set(rows) == {"a", "b", "z"}
    assert rows["b"]["n_cur"] == 0 and rows["b"]["psi_term"] > 0
    assert rows["z"]["n_ref"] == 0 and rows["z"]["psi_term"] > 0
    assert abs(rows["a"]["psi_term"]) < 1e-12


def test_empty_side_raises(spark):
    # The CURRENT-side guard is in-plan since r12 (raising filter over
    # a broadcast 1-row count — no construction-time corpus scan), so
    # it fires at ACTION time, wrapped by Spark.
    ref = _vals(spark, range(10))
    empty = _vals(spark, []).filter(F.lit(False))
    profile, _bounds = psi_numeric(ref, empty, "v")
    with pytest.raises(Exception, match="non-empty"):
        profile.collect()


def test_empty_reference_side_raises_friendly(spark):
    # ADVICE r6: validation must run BEFORE bin fitting, so an empty
    # REFERENCE side gets the same named error (previously the bin
    # fitter died first with an opaque TypeError).
    cur = _vals(spark, range(10))
    empty = _vals(spark, []).filter(F.lit(False))
    with pytest.raises(ValueError, match="non-empty"):
        psi_numeric(empty, cur, "v")
