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
