"""Property-based tests for the late-r8 operators (SURVEY §5):
invariants that must hold for arbitrary inputs, not just the pinned
fixtures — CUPED translation invariance, bootstrap replicate-0
exactness and CI ordering, power monotonicity and the CUPED dominance,
kappa relabeling invariance and its <= 1 bound, seasonal decomposition
shift equivariance.
"""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.errors.exceptions.captured import SparkRuntimeException

from proyecto_final_de_big_data_spark.operators.abtest import (
    cuped_mean_ztest,
    experiment_power,
)
from proyecto_final_de_big_data_spark.operators.agreement import cohens_kappa
from proyecto_final_de_big_data_spark.operators.bootstrap import (
    poisson_bootstrap_mean,
)
from proyecto_final_de_big_data_spark.operators.seasonal import (
    seasonal_decompose,
)

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

metric = st.floats(min_value=-1e4, max_value=1e4, allow_nan=False, allow_infinity=False)


@given(
    rows=st.lists(st.tuples(metric, metric), min_size=6, max_size=40),
    shift=st.floats(min_value=-1e3, max_value=1e3, allow_nan=False, allow_infinity=False),
)
@settings(**_SETTINGS)
def test_cuped_covariate_translation_invariance(spark, rows, shift):
    # theta and every CUPED statistic depend on the covariate only
    # through centered moments -> adding a constant to X changes
    # nothing (up to the 6-decimal output rounding).
    def _df(delta):
        data = [
            ("control" if i % 2 == 0 else "treatment", y, x + delta)
            for i, (y, x) in enumerate(rows)
        ]
        return spark.createDataFrame(data, "g string, y double, x double")

    try:
        base = cuped_mean_ztest(_df(0.0), "g", "y", "x", "control", "treatment").collect()[0]
    except (ValueError, SparkRuntimeException):
        # degenerate arms/covariate for this draw — skip (validation is
        # in-plan raise_error since r11, so it surfaces at collect time)
        return
    shifted = cuped_mean_ztest(_df(shift), "g", "y", "x", "control", "treatment").collect()[0]
    for field in ("theta", "lift_cuped", "se_cuped", "z_cuped", "var_reduction_pct"):
        if base[field] is None:
            assert shifted[field] is None, field
        else:
            assert shifted[field] == pytest.approx(base[field], abs=2e-4), field


@given(vals=st.lists(metric, min_size=2, max_size=50))
@settings(**_SETTINGS)
def test_bootstrap_replicate_zero_exact_and_ci_ordered(spark, vals):
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)], "k long, x double"
    )
    row = poisson_bootstrap_mean(df, "k", "x", n_replicates=25).collect()[0]
    exact = sum(vals) / len(vals)
    assert row["mean"] == pytest.approx(exact, abs=1e-5)
    assert row["ci_low"] <= row["ci_high"]
    assert row["se_boot"] is None or row["se_boot"] >= 0.0


@given(
    rows=st.lists(st.tuples(metric, metric), min_size=4, max_size=40),
    t1=st.floats(min_value=0.01, max_value=0.2, allow_nan=False),
)
@settings(**_SETTINGS)
def test_power_monotone_in_target_and_cuped_dominates(spark, rows, t1):
    df = spark.createDataFrame(
        [(x, y) for x, y in rows], "x double, y double"
    )
    try:
        a = experiment_power(df, "y", covariate_col="x", target_rel_mde=t1).collect()[0]
        b = experiment_power(
            df, "y", covariate_col="x", target_rel_mde=t1 * 2
        ).collect()[0]
    except (ValueError, SparkRuntimeException):
        # constant metric/covariate or tiny frame — skip (validation is
        # in-plan raise_error since r11, so it surfaces at collect time)
        return
    # halving the target effect must never SHRINK the required n
    if a["n_per_arm_target"] is not None and b["n_per_arm_target"] is not None:
        assert a["n_per_arm_target"] >= b["n_per_arm_target"]
    # variance reduction can only help (up to output rounding)
    if a["mde_abs_cuped"] is not None:
        assert a["mde_abs_cuped"] <= a["mde_abs"] + 1e-6
        assert a["rho2"] <= 1.0 + 1e-9


@given(
    pairs=st.lists(
        st.tuples(st.sampled_from("abc"), st.sampled_from("abc")),
        min_size=2,
        max_size=60,
    )
)
@settings(**_SETTINGS)
def test_kappa_relabeling_invariance_and_bound(spark, pairs):
    # A consistent bijective relabeling of BOTH raters leaves kappa
    # unchanged; kappa never exceeds 1.
    relabel = {"a": "z", "b": "q", "c": "m"}
    df1 = spark.createDataFrame(pairs, "a string, b string")
    df2 = spark.createDataFrame(
        [(relabel[x], relabel[y]) for x, y in pairs], "a string, b string"
    )
    r1 = cohens_kappa(df1, "a", "b").collect()[0]
    r2 = cohens_kappa(df2, "a", "b").collect()[0]
    assert (r1["kappa"] is None) == (r2["kappa"] is None)
    if r1["kappa"] is not None:
        assert r1["kappa"] == pytest.approx(r2["kappa"], abs=1e-6)
        assert r1["kappa"] <= 1.0 + 1e-9


@given(
    ys=st.lists(metric, min_size=10, max_size=28),
    shift=st.floats(min_value=-1e3, max_value=1e3, allow_nan=False),
)
@settings(**_SETTINGS)
def test_seasonal_shift_equivariance(spark, ys, shift):
    # y -> y + c shifts the intercept by c and leaves slope, seasonal
    # indices and strength untouched (all depend on centered residuals).
    epoch = dt.datetime(1970, 1, 1)

    def _df(delta):
        rows = [
            ("k", epoch + dt.timedelta(days=i, hours=12), float(v) + delta)
            for i, v in enumerate(ys)
        ]
        return spark.createDataFrame(rows, "key string, ts timestamp, y double")

    base = {r["slot"]: r for r in seasonal_decompose(_df(0.0), ["key"], "ts", "y").collect()}
    shifted = {r["slot"]: r for r in seasonal_decompose(_df(shift), ["key"], "ts", "y").collect()}
    assert base.keys() == shifted.keys()
    for slot, r in base.items():
        s = shifted[slot]
        assert s["slope"] == pytest.approx(r["slope"], abs=1e-4)
        assert s["intercept"] == pytest.approx(r["intercept"] + shift, abs=1e-4)
        assert s["seasonal_index"] == pytest.approx(r["seasonal_index"], abs=1e-4)
        assert s["seasonal_strength"] == pytest.approx(
            r["seasonal_strength"], abs=1e-4
        )
