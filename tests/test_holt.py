"""Holt linear-trend smoothing + forecast anomalies (operators/holt.py).

Hand-computed fixture (the mandatory hand-fixture discipline): xs =
[10, 12, 8, 14] with alpha = beta = 0.5 — every intermediate is an
exact binary fraction, worked by hand below, so assertions are exact:

    t1: l=10,      b=0        (seed)
    t2: f=10;      l=0.5*12+0.5*10    = 11;      b=0.5*(11-10)+0.5*0      = 0.5
    t3: f=11.5;    l=0.5*8+0.5*11.5   = 9.75;    b=0.5*(9.75-11)+0.5*0.5  = -0.375
    t4: f=9.375;   l=0.5*14+0.5*9.375 = 11.6875; b=0.5*(11.6875-9.75)+0.5*(-0.375)
                                                                          = 0.78125
"""

from __future__ import annotations

import pytest

from proyecto_final_de_big_data_spark.operators.holt import holt_forecast_anomaly


def _holt_reference(xs, alpha, beta):
    lvl, trd = [xs[0]], [0.0]
    for x in xs[1:]:
        f = lvl[-1] + trd[-1]
        l_new = alpha * x + (1 - alpha) * f
        trd.append(beta * (l_new - lvl[-1]) + (1 - beta) * trd[-1])
        lvl.append(l_new)
    return lvl, trd


def test_hand_worked_fixture_exact(spark):
    df = spark.createDataFrame(
        [("k", i, v) for i, v in enumerate([10.0, 12.0, 8.0, 14.0])],
        "k string, t long, x double",
    )
    out = {
        r["t"]: r
        for r in holt_forecast_anomaly(
            df, ["k"], "t", "x", alpha=0.5, beta=0.5
        ).collect()
    }
    assert (out[0]["level"], out[0]["trend"]) == (10.0, 0.0)
    assert out[0]["forecast"] is None and out[0]["resid"] is None
    assert (out[1]["level"], out[1]["trend"], out[1]["forecast"]) == (11.0, 0.5, 10.0)
    assert out[1]["resid"] == 2.0
    assert (out[2]["level"], out[2]["trend"], out[2]["forecast"]) == (
        9.75,
        -0.375,
        11.5,
    )
    assert out[2]["resid"] == -3.5
    assert (out[3]["level"], out[3]["trend"], out[3]["forecast"]) == (
        11.6875,
        0.78125,
        9.375,
    )
    assert out[3]["resid"] == 4.625


def test_matches_python_reference_fold(spark):
    xs = [10.0, 12.0, 11.0, 13.0, 15.0, 18.0, 16.0, 21.0]
    df = spark.createDataFrame(
        [("k", i, v) for i, v in enumerate(xs)], "k string, t long, x double"
    )
    out = sorted(
        holt_forecast_anomaly(df, ["k"], "t", "x", alpha=0.3, beta=0.1).collect(),
        key=lambda r: r["t"],
    )
    lvl, trd = _holt_reference(xs, 0.3, 0.1)
    for row, l_exp, b_exp in zip(out, lvl, trd):
        assert row["level"] == pytest.approx(round(l_exp, 6), abs=1e-9)
        assert row["trend"] == pytest.approx(round(b_exp, 6), abs=1e-9)
    assert out[3]["forecast"] == pytest.approx(round(lvl[2] + trd[2], 6), abs=1e-9)


def test_absorbs_linear_trend_flags_level_break(spark):
    # A perfect ramp, then a level break: the EWMA would flag the ramp
    # itself (constant lag); Holt's trend state absorbs it so only the
    # break point trips.
    xs = [float(10 + 2 * i) for i in range(12)] + [80.0, 36.0, 38.0]
    df = spark.createDataFrame(
        [("k", i, v) for i, v in enumerate(xs)], "k string, t long, x double"
    )
    # k=2.5: the break's own residual plus the two post-break
    # corrections inflate sigma (population stddev over ALL residuals),
    # so k=3 would just miss it — the same calibration note as the
    # EWMA spike test.
    out = {
        r["t"]: r["is_anomaly"]
        for r in holt_forecast_anomaly(
            df, ["k"], "t", "x", alpha=0.5, beta=0.5, k=2.5
        ).collect()
    }
    assert out[12] is True
    assert not any(out[t] for t in range(4, 12))


def test_keys_independent_and_validation(spark):
    rows = [("a", i, float(i)) for i in range(3)] + [("b", i, 7.0) for i in range(3)]
    df = spark.createDataFrame(rows, "k string, t long, x double")
    got = {
        (r["k"], r["t"]): r["level"]
        for r in holt_forecast_anomaly(df, ["k"], "t", "x", 0.5, 0.5).collect()
    }
    assert got[("b", 2)] == 7.0
    with pytest.raises(ValueError):
        holt_forecast_anomaly(df, [], "t", "x")
    with pytest.raises(ValueError):
        holt_forecast_anomaly(df, ["k"], "t", "x", alpha=0.0)
    with pytest.raises(ValueError):
        holt_forecast_anomaly(df, ["k"], "t", "x", beta=1.5)


def test_duckdb_fold_parity(spark):
    """The oracle-shape replay: DuckDB list_reduce over struct states
    reproduces level/trend/forecast bit-for-bit (same IEEE op order) —
    the structurally-identical-fold guarantee the gate relies on."""
    import duckdb

    xs = [3.0, 7.0, 2.0, 9.0, 4.0, 11.0]
    df = spark.createDataFrame(
        [("k", i, v) for i, v in enumerate(xs)], "k string, t long, x double"
    )
    got = sorted(
        holt_forecast_anomaly(df, ["k"], "t", "x", alpha=0.3, beta=0.1).collect(),
        key=lambda r: r["t"],
    )
    con = duckdb.connect()
    ora = con.execute(
        """
        WITH arr AS (SELECT [3.0, 7.0, 2.0, 9.0, 4.0, 11.0]::DOUBLE[] AS vs),
        -- [l, b] list accumulator, NOT a struct: DuckDB v1.0 evaluates
        -- struct_pack fields sequentially inside list_reduce lambdas
        -- (the accumulator's first field is already rebound when the
        -- second field's expression reads it), which silently corrupts
        -- any two-state fold. Lists are built as one expression.
        st AS (
            SELECT list_transform(
                generate_series(1, len(vs)),
                i -> list_reduce(
                    list_transform(vs[1:i], x -> [x, 0.0::DOUBLE]),
                    (s, e) -> [
                        0.3::DOUBLE * e[1] + 0.7::DOUBLE * (s[1] + s[2]),
                        0.1::DOUBLE * ((0.3::DOUBLE * e[1]
                                        + 0.7::DOUBLE * (s[1] + s[2])) - s[1])
                        + 0.9::DOUBLE * s[2]
                    ])
            ) AS sts, vs
            FROM arr
        )
        SELECT i - 1 AS t,
               round(sts[i][1], 6) AS level,
               round(sts[i][2], 6) AS trend,
               CASE WHEN i > 1
                    THEN round(sts[i - 1][1] + sts[i - 1][2], 6) END AS forecast
        FROM st, unnest(generate_series(1, len(vs))) AS u(i)
        ORDER BY 1
        """
    ).fetchall()
    for row, (t, lvl, trd, fc) in zip(got, ora):
        assert row["t"] == t
        assert row["level"] == lvl
        assert row["trend"] == trd
        assert row["forecast"] == fc


# ---------------------------------------------------------------------------
# Holt-Winters additive seasonal (triple) smoothing
# ---------------------------------------------------------------------------
#
# Hand-computed fixture (mandatory discipline): xs = [10, 14, 11, 15, 12],
# season m = 2, alpha = beta = gamma = 0.5 — every intermediate is an
# exact binary fraction, worked by hand:
#
#   seed (t1,t2): mean = 12 -> l=12, b=0; s1 = -2, s2 = 2
#   t3 (x=11, s_old=s1=-2): f = 12+0-2            = 10
#       l = .5*(11+2)+.5*12                       = 12.5
#       b = .5*(12.5-12)+.5*0                     = 0.25
#       s3 = .5*(11-12-0)+.5*(-2)                 = -1.5
#       resid = 1
#   t4 (x=15, s_old=s2=2): f = 12.5+0.25+2        = 14.75
#       l = .5*(15-2)+.5*12.75                    = 12.875
#       b = .5*(12.875-12.5)+.5*0.25              = 0.3125
#       s4 = .5*(15-12.5-0.25)+.5*2               = 2.125
#       resid = 0.25
#   t5 (x=12, s_old=s3=-1.5): f = 12.875+0.3125-1.5 = 11.6875
#       l = .5*(12+1.5)+.5*13.1875                = 13.34375
#       b = .5*(13.34375-12.875)+.5*0.3125        = 0.390625
#       s5 = .5*(12-12.875-0.3125)+.5*(-1.5)      = -1.34375
#       resid = 0.3125
#   sigma (population, residuals {1, 0.25, 0.3125}) ~= 0.33978;
#   k=1 -> only t3 flags (1 > 0.33978).


def _hw_reference(xs, m, alpha, beta, gamma):
    """Pure-Python twin (different implementation: explicit seasonal
    dict keyed by time, not an array fold)."""
    mean = sum(xs[:m]) / m
    lvl = {m: mean}
    trd = {m: 0.0}
    sea = {i + 1: xs[i] - mean for i in range(m)}
    fc = {}
    for t in range(m + 1, len(xs) + 1):
        x = xs[t - 1]
        so = sea[t - m]
        fc[t] = lvl[t - 1] + trd[t - 1] + so
        l_new = alpha * (x - so) + (1 - alpha) * (lvl[t - 1] + trd[t - 1])
        trd[t] = beta * (l_new - lvl[t - 1]) + (1 - beta) * trd[t - 1]
        sea[t] = gamma * (x - lvl[t - 1] - trd[t - 1]) + (1 - gamma) * so
        lvl[t] = l_new
    return lvl, trd, sea, fc


def test_hw_hand_worked_fixture_exact(spark):
    from proyecto_final_de_big_data_spark.operators.holt import (
        holt_winters_forecast_anomaly,
    )

    df = spark.createDataFrame(
        [("k", i, v) for i, v in enumerate([10.0, 14.0, 11.0, 15.0, 12.0])],
        "k string, t long, x double",
    )
    out = {
        r["t"]: r
        for r in holt_winters_forecast_anomaly(
            df, ["k"], "t", "x", season=2, alpha=0.5, beta=0.5, gamma=0.5, k=1.0
        ).collect()
    }
    assert (out[0]["level"], out[0]["trend"], out[0]["seasonal"]) == (12.0, 0.0, -2.0)
    assert out[0]["forecast"] is None and out[0]["resid"] is None
    assert out[0]["is_anomaly"] is None
    assert (out[1]["level"], out[1]["trend"], out[1]["seasonal"]) == (12.0, 0.0, 2.0)
    assert (out[2]["level"], out[2]["trend"], out[2]["seasonal"]) == (12.5, 0.25, -1.5)
    assert (out[2]["forecast"], out[2]["resid"]) == (10.0, 1.0)
    assert out[2]["is_anomaly"] is True
    assert (out[3]["level"], out[3]["trend"], out[3]["seasonal"]) == (
        12.875, 0.3125, 2.125,
    )
    assert (out[3]["forecast"], out[3]["resid"]) == (14.75, 0.25)
    assert out[3]["is_anomaly"] is False
    assert (out[4]["level"], out[4]["trend"], out[4]["seasonal"]) == (
        13.34375, 0.390625, -1.34375,
    )
    assert (out[4]["forecast"], out[4]["resid"]) == (11.6875, 0.3125)
    assert out[4]["is_anomaly"] is False


def test_hw_matches_python_twin(spark):
    import random

    from proyecto_final_de_big_data_spark.operators.holt import (
        holt_winters_forecast_anomaly,
    )

    rng = random.Random(31)
    m = 4
    xs = [
        50.0 + 3.0 * t + [5.0, -2.0, 1.0, -4.0][t % m] + rng.random()
        for t in range(25)
    ]
    df = spark.createDataFrame(
        [("k", t, x) for t, x in enumerate(xs)], "k string, t long, x double"
    )
    got = {
        r["t"]: r
        for r in holt_winters_forecast_anomaly(
            df, ["k"], "t", "x", season=m, alpha=0.3, beta=0.1, gamma=0.2
        ).collect()
    }
    lvl, trd, sea, fc = _hw_reference(xs, m, 0.3, 0.1, 0.2)
    for t in range(m, len(xs)):  # 0-based row t == 1-based index t+1
        i = t + 1
        assert got[t]["level"] == pytest.approx(round(lvl[i], 6), abs=1e-9)
        assert got[t]["trend"] == pytest.approx(round(trd[i], 6), abs=1e-9)
        assert got[t]["seasonal"] == pytest.approx(round(sea[i], 6), abs=1e-9)
        assert got[t]["forecast"] == pytest.approx(round(fc[i], 6), abs=1e-9)


def test_hw_short_series_and_validation(spark):
    from proyecto_final_de_big_data_spark.operators.holt import (
        holt_winters_forecast_anomaly,
    )

    # Fewer points than one season: no defined seed -> NULL readouts,
    # reported honestly (not raised).
    df = spark.createDataFrame(
        [("k", 0, 5.0), ("k", 1, 6.0)], "k string, t long, x double"
    )
    rows = holt_winters_forecast_anomaly(
        df, ["k"], "t", "x", season=3
    ).collect()
    assert len(rows) == 2
    for r in rows:
        assert r["level"] is None and r["seasonal"] is None
        assert r["forecast"] is None and r["is_anomaly"] is None
    with pytest.raises(ValueError, match="season"):
        holt_winters_forecast_anomaly(df, ["k"], "t", "x", season=1)
    with pytest.raises(ValueError, match="alpha"):
        holt_winters_forecast_anomaly(df, ["k"], "t", "x", season=2, alpha=0.0)
    with pytest.raises(ValueError, match="gamma"):
        holt_winters_forecast_anomaly(df, ["k"], "t", "x", season=2, gamma=1.5)
