"""EWMA smoothing + anomaly flags (operators/anomaly.py)."""

from __future__ import annotations

import pytest

from proyecto_final_de_big_data_spark.operators.anomaly import ewma_anomaly


def _ewma_reference(xs, alpha):
    out = [xs[0]]
    for x in xs[1:]:
        out.append(alpha * x + (1 - alpha) * out[-1])
    return out


def test_ewma_matches_reference_fold(spark):
    xs = [10.0, 12.0, 11.0, 13.0, 50.0, 12.0]
    df = spark.createDataFrame(
        [("k", i, v) for i, v in enumerate(xs)], "k string, t long, x double"
    )
    out = sorted(
        ewma_anomaly(df, ["k"], "t", "x", alpha=0.3).collect(),
        key=lambda r: r["t"],
    )
    ref = _ewma_reference(xs, 0.3)
    for row, expected in zip(out, ref):
        assert row["ewma"] == pytest.approx(round(expected, 6), abs=1e-9)
    # resid_t = x_t - ewma_{t-1}; first point has no forecast.
    assert out[0]["resid"] is None
    assert out[1]["resid"] == pytest.approx(xs[1] - ref[0], abs=1e-6)
    assert out[4]["resid"] == pytest.approx(xs[4] - ref[3], abs=1e-6)


def test_spike_is_flagged_others_not(spark):
    xs = [10.0, 10.5, 9.8, 10.2, 10.1, 9.9, 10.3, 60.0, 10.0, 10.2]
    df = spark.createDataFrame(
        [("k", i, v) for i, v in enumerate(xs)], "k string, t long, x double"
    )
    # k=2: the spike's own residual inflates sigma (population stddev
    # over ALL residuals, spike included), so 3 sigma would just miss it.
    out = {r["t"]: r["is_anomaly"] for r in
           ewma_anomaly(df, ["k"], "t", "x", alpha=0.3, k=2.0).collect()}
    assert out[7] is True
    assert out[0] is None  # no residual on the seed point
    assert not any(out[t] for t in (1, 2, 3, 4, 5, 6))


def test_keys_are_independent(spark):
    rows = [("a", i, float(i)) for i in range(4)] + [("b", i, 100.0) for i in range(4)]
    df = spark.createDataFrame(rows, "k string, t long, x double")
    out = ewma_anomaly(df, ["k"], "t", "x", alpha=0.5)
    got = {(r["k"], r["t"]): r["ewma"] for r in out.collect()}
    assert got[("b", 3)] == 100.0
    assert got[("a", 1)] == 0.5  # 0.5*1 + 0.5*0


def test_constant_series_sigma_zero_flag_null(spark):
    df = spark.createDataFrame(
        [("k", i, 5.0) for i in range(5)], "k string, t long, x double"
    )
    out = ewma_anomaly(df, ["k"], "t", "x").collect()
    assert all(r["is_anomaly"] is None for r in out)


def test_validates_args(spark):
    df = spark.createDataFrame([("k", 0, 1.0)], "k string, t long, x double")
    with pytest.raises(ValueError):
        ewma_anomaly(df, [], "t", "x")
    with pytest.raises(ValueError):
        ewma_anomaly(df, ["k"], "t", "x", alpha=0.0)


def test_max_points_guard_raises(spark):
    df = spark.createDataFrame(
        [("k", i, 1.0) for i in range(10)], "k string, t long, x double"
    )
    with pytest.raises(Exception, match="max_points"):
        ewma_anomaly(df, ["k"], "t", "x", max_points=5).collect()


def test_null_values_excluded_not_poisoning(spark):
    # One NULL grid cell must not NULL every subsequent EWMA state.
    from proyecto_final_de_big_data_spark.operators.anomaly import ewma_anomaly

    rows = [("k", 0, 10.0), ("k", 1, None), ("k", 2, 12.0), ("k", 3, 11.0)]
    df = spark.createDataFrame(rows, "k string, t long, x double")
    out = sorted(
        ewma_anomaly(df, ["k"], "t", "x").collect(), key=lambda r: r["t"]
    )
    assert [r["t"] for r in out] == [0, 2, 3]  # NULL row excluded
    assert all(r["ewma"] is not None for r in out)
