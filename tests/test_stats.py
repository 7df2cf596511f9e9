"""Pairwise correlation matrix (operators/stats.py)."""

from __future__ import annotations

import math

import pytest

from proyecto_final_de_big_data_spark.operators.stats import correlation_matrix


def _rows(df):
    return {
        (r["col_x"], r["col_y"], r.get("g")): (r["n_rows"], r["corr"])
        for r in (row.asDict() for row in df.collect())
    }


def test_perfect_and_known_correlations(spark):
    # y = 2x + 1 exactly; z anti-correlates with x perfectly.
    df = spark.createDataFrame(
        [(float(i), 2.0 * i + 1.0, -float(i)) for i in range(5)],
        "x double, y double, z double",
    )
    out = correlation_matrix(df, ["x", "y", "z"])
    got = {(r["col_x"], r["col_y"]): (r["n_rows"], r["corr"]) for r in
           (row.asDict() for row in out.collect())}
    assert got[("x", "y")] == (5, 1.0)
    assert got[("x", "z")] == (5, -1.0)
    assert got[("y", "z")] == (5, -1.0)


def test_matches_python_reference(spark):
    xs = [1.0, 2.0, 4.0, 7.0, 11.0]
    ys = [3.0, 1.0, 4.0, 1.0, 5.0]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(v * v for v in xs)
    syy = sum(v * v for v in ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    expected = round(
        (n * sxy - sx * sy)
        / math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
        6,
    )
    df = spark.createDataFrame(list(zip(xs, ys)), "x double, y double")
    out = correlation_matrix(df, ["x", "y"]).collect()[0]
    assert out["corr"] == pytest.approx(expected, abs=1e-9)


def test_pairwise_null_deletion(spark):
    # The (x, y) pair must ignore the row where y is NULL but still use
    # that row for (x, z) — pairwise deletion, each pair its own n.
    df = spark.createDataFrame(
        [
            (1.0, 2.0, 1.0),
            (2.0, None, 2.0),
            (3.0, 6.0, 3.0),
            (4.0, 8.0, 5.0),
        ],
        "x double, y double, z double",
    )
    got = {(r["col_x"], r["col_y"]): (r["n_rows"], r["corr"]) for r in
           (row.asDict() for row in correlation_matrix(df, ["x", "y", "z"]).collect())}
    assert got[("x", "y")][0] == 3
    assert got[("x", "y")][1] == 1.0  # remaining rows are exactly linear
    assert got[("x", "z")][0] == 4


def test_degenerate_pairs_are_null_not_nan(spark):
    # constant column -> zero variance -> NULL; single row -> NULL.
    df = spark.createDataFrame(
        [(1.0, 5.0), (2.0, 5.0), (3.0, 5.0)], "x double, c double"
    )
    out = correlation_matrix(df, ["x", "c"]).collect()[0]
    assert out["corr"] is None
    one = spark.createDataFrame([(1.0, 2.0)], "x double, y double")
    assert correlation_matrix(one, ["x", "y"]).collect()[0]["corr"] is None


def test_grouped_output_shape(spark):
    df = spark.createDataFrame(
        [("a", 1.0, 2.0), ("a", 2.0, 4.0), ("b", 1.0, 9.0), ("b", 3.0, 1.0)],
        "g string, x double, y double",
    )
    out = correlation_matrix(df, ["x", "y"], by=["g"])
    assert out.columns == ["g", "col_x", "col_y", "n_rows", "corr"]
    got = {r["g"]: r["corr"] for r in (row.asDict() for row in out.collect())}
    assert got["a"] == 1.0 and got["b"] == -1.0


def test_requires_two_columns(spark):
    df = spark.createDataFrame([(1.0,)], "x double")
    with pytest.raises(ValueError):
        correlation_matrix(df, ["x"])


# ---------------------------------------------------------------- jackknife


def _jk_frame(spark, rows):
    return spark.createDataFrame(rows, "num double, den double, s int")


def test_jackknife_constant_ratio_zero_se(spark):
    from proyecto_final_de_big_data_spark.operators.stats import jackknife_ratio

    # num = 0.5*den in every stratum -> every replicate ratio is 0.5
    rows = [(0.5 * d, float(d), s) for s, d in [(0, 10), (1, 20), (2, 40)]]
    out = jackknife_ratio(_jk_frame(spark, rows), "num", "den", "s").first()
    assert out["theta"] == 0.5
    assert out["se_jack"] == 0.0
    assert out["ci_lo"] == 0.5 and out["ci_hi"] == 0.5
    assert out["n_strata"] == 3


def test_jackknife_matches_hand_computation(spark):
    import math

    from proyecto_final_de_big_data_spark.operators.stats import jackknife_ratio

    per = {0: (1.0, 10.0), 1: (4.0, 10.0), 2: (7.0, 10.0)}
    rows = [(n, d, s) for s, (n, d) in per.items()]
    out = jackknife_ratio(_jk_frame(spark, rows), "num", "den", "s").first()
    tn, td = 12.0, 30.0
    r = [(tn - n) / (td - d) for n, d in per.values()]
    rbar = sum(r) / 3
    var = (2 / 3) * sum((x - rbar) ** 2 for x in r)
    assert out["theta"] == round(tn / td, 6)
    assert out["se_jack"] == round(math.sqrt(var), 6)
    assert out["ci_lo"] == round(tn / td - 1.96 * math.sqrt(var), 6)


def test_jackknife_degenerate_replicate_null_se(spark):
    from proyecto_final_de_big_data_spark.operators.stats import jackknife_ratio

    # Dropping stratum 0 leaves a zero denominator -> that replicate is
    # undefined, so the variance (and CI) must be NULL, never a fake 0.
    rows = [(1.0, 5.0, 0), (1.0, -5.0, 1), (1.0, 5.0, 2)]
    out = jackknife_ratio(_jk_frame(spark, rows), "num", "den", "s").first()
    assert out["se_jack"] is None and out["ci_lo"] is None


def test_jackknife_single_stratum_null_se(spark):
    from proyecto_final_de_big_data_spark.operators.stats import jackknife_ratio

    out = jackknife_ratio(
        _jk_frame(spark, [(1.0, 2.0, 0)]), "num", "den", "s"
    ).first()
    assert out["theta"] == 0.5 and out["se_jack"] is None


def test_acf_null_values_excluded_consistently(spark):
    from proyecto_final_de_big_data_spark.operators.stats import autocorrelation

    rows = [("k", 0, 1.0), ("k", 1, None), ("k", 2, 3.0), ("k", 3, 1.0),
            ("k", 4, 3.0), ("k", 5, 1.0)]
    df = spark.createDataFrame(rows, "k string, t long, x double")
    out = {r["lag"]: r for r in autocorrelation(
        df, ["k"], "t", "x", max_lag=2
    ).collect()}
    # pairs at lag 2 among non-null ts {0,2,3,4,5}: (0,2),(2,4),(3,5)
    assert out[2]["n_pairs"] == 3
    # lag-1 pairs among non-null ts: (2,3),(3,4),(4,5) — t=1 is gone
    assert out[1]["n_pairs"] == 3
