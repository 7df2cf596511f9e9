"""Classical k-sample tests (operators/hyptest.py).

Every statistic is pinned against HAND-COMPUTED textbook arithmetic
(worked in the comments), independent of any DuckDB restatement —
the VERDICT r7 item 7 discipline."""

import math

import pytest
from pyspark.sql import functions as F

from proyecto_final_de_big_data_spark.operators.hyptest import (
    kruskal_wallis,
    mann_whitney_u,
    oneway_anova,
)


def _df(spark, rows):
    rows = [(g, float(x) if x is not None else None) for g, x in rows]
    return spark.createDataFrame(rows, "grp string, x double")


def test_anova_hand_checked(spark):
    # Classic 3x6 fixture: a=[6,8,4,5,3,4] mean 5; b=[8,12,9,11,6,8]
    # mean 9; c=[13,9,11,8,7,12] mean 10. N=18, grand mean 8.
    # SSB = 6*((5-8)^2 + (9-8)^2 + (10-8)^2) = 6*14 = 84
    # SSW = 16 + 24 + 28 = 68
    # F = (84/2) / (68/15) = 42 / 4.533333 = 9.264706
    # eta^2 = 84 / 152 = 0.552632
    rows = (
        [("a", v) for v in [6.0, 8, 4, 5, 3, 4]]
        + [("b", v) for v in [8.0, 12, 9, 11, 6, 8]]
        + [("c", v) for v in [13.0, 9, 11, 8, 7, 12]]
    )
    out = oneway_anova(_df(spark, rows), "x", "grp").first()
    assert out["k"] == 3 and out["n"] == 18
    assert out["df_between"] == 2 and out["df_within"] == 15
    assert out["ss_between"] == pytest.approx(84.0)
    assert out["ss_within"] == pytest.approx(68.0)
    assert out["f_stat"] == pytest.approx(9.264706, abs=1e-6)
    assert out["eta_sq"] == pytest.approx(84 / 152, abs=1e-6)


def test_anova_zero_within_variance_is_null_f(spark):
    rows = [("a", 1.0), ("a", 1.0), ("b", 2.0), ("b", 2.0)]
    out = oneway_anova(_df(spark, rows), "x", "grp").first()
    assert out["f_stat"] is None
    assert out["ss_within"] == pytest.approx(0.0)


def test_anova_single_group_is_null_f(spark):
    rows = [("a", 1.0), ("a", 2.0), ("a", 3.0)]
    out = oneway_anova(_df(spark, rows), "x", "grp").first()
    assert out["k"] == 1
    assert out["f_stat"] is None


def test_anova_nulls_and_nans_excluded(spark):
    rows = (
        [("a", v) for v in [6.0, 8, 4, 5, 3, 4]]
        + [("b", v) for v in [8.0, 12, 9, 11, 6, 8]]
        + [("c", v) for v in [13.0, 9, 11, 8, 7, 12]]
        + [("a", None), ("b", float("nan")), (None, 99.0)]
    )
    out = oneway_anova(_df(spark, rows), "x", "grp").first()
    assert out["n"] == 18
    assert out["f_stat"] == pytest.approx(9.264706, abs=1e-6)


def test_kruskal_wallis_no_ties_hand_checked(spark):
    # [1,2,3] vs [4,5,6] vs [7,8,9]: ranks 1..9, R = 6, 15, 24.
    # H = 12/(9*10) * (36/3 + 225/3 + 576/3) - 3*10
    #   = 0.133333 * 279 - 30 = 7.2 ; no ties -> C = 1.
    rows = [("a", 1.0), ("a", 2.0), ("a", 3.0),
            ("b", 4.0), ("b", 5.0), ("b", 6.0),
            ("c", 7.0), ("c", 8.0), ("c", 9.0)]
    out = kruskal_wallis(_df(spark, rows), "x", "grp").first()
    assert out["k"] == 3 and out["n"] == 9
    assert out["h"] == pytest.approx(7.2, abs=1e-6)
    assert out["tie_correction"] == pytest.approx(1.0)
    assert out["h_adj"] == pytest.approx(7.2, abs=1e-6)


def test_kruskal_wallis_ties_hand_checked(spark):
    # a=[1,1,2], b=[2,3,3]: pooled sorted 1,1,2,2,3,3 with midranks
    # 1.5,1.5,3.5,3.5,5.5,5.5 -> R_a = 6.5, R_b = 14.5.
    # H = 12/42 * (6.5^2/3 + 14.5^2/3) - 21 = 3.047619
    # ties: three pairs, sum(t^3-t) = 18, C = 1 - 18/210 = 0.914286
    # H_adj = 3.047619 / 0.914286 = 3.333333
    rows = [("a", 1.0), ("a", 1.0), ("a", 2.0),
            ("b", 2.0), ("b", 3.0), ("b", 3.0)]
    out = kruskal_wallis(_df(spark, rows), "x", "grp").first()
    assert out["h"] == pytest.approx(3.047619, abs=1e-6)
    assert out["tie_correction"] == pytest.approx(0.914286, abs=1e-6)
    assert out["h_adj"] == pytest.approx(3.333333, abs=1e-6)


def test_kruskal_wallis_all_identical_is_null(spark):
    rows = [("a", 5.0), ("a", 5.0), ("b", 5.0)]
    out = kruskal_wallis(_df(spark, rows), "x", "grp").first()
    # C = 1 - (27-3)/(27-3) = 0 -> H_adj undefined
    assert out["tie_correction"] == pytest.approx(0.0)
    assert out["h_adj"] is None


def test_mann_whitney_hand_checked(spark):
    # a=[1,2,3], b=[4,5,6]: R_a = 6, U_a = 6 - 6 = 0, U_b = 9.
    # z = (0 - 4.5)/sqrt(9/12 * 7) = -4.5/sqrt(5.25) = -1.963961
    rows = [("a", 1.0), ("a", 2.0), ("a", 3.0),
            ("b", 4.0), ("b", 5.0), ("b", 6.0)]
    out = mann_whitney_u(_df(spark, rows), "x", "grp", "a", "b").first()
    assert out["n_a"] == 3 and out["n_b"] == 3
    assert out["u_a"] == pytest.approx(0.0)
    assert out["u_b"] == pytest.approx(9.0)
    assert out["z"] == pytest.approx(-4.5 / math.sqrt(5.25), abs=1e-6)


def test_mann_whitney_u_sum_identity_and_tie_correction(spark):
    # a=[1,1,2], b=[2,3,3]: midranks as in the KW fixture.
    # R_a = 6.5 -> U_a = 6.5 - 6 = 0.5, U_b = 9 - 0.5 = 8.5.
    # var = 9/12 * (7 - 18/30) = 0.75 * 6.4 = 4.8
    # z = (0.5 - 4.5)/sqrt(4.8) = -1.825742
    rows = [("a", 1.0), ("a", 1.0), ("a", 2.0),
            ("b", 2.0), ("b", 3.0), ("b", 3.0)]
    out = mann_whitney_u(_df(spark, rows), "x", "grp", "a", "b").first()
    assert out["u_a"] + out["u_b"] == pytest.approx(9.0)  # = n_a*n_b
    assert out["u_a"] == pytest.approx(0.5)
    assert out["z"] == pytest.approx(-4.0 / math.sqrt(4.8), abs=1e-6)


def test_mann_whitney_other_groups_ignored(spark):
    rows = [("a", 1.0), ("a", 2.0), ("a", 3.0),
            ("b", 4.0), ("b", 5.0), ("b", 6.0),
            ("c", 100.0), ("c", -100.0)]
    out = mann_whitney_u(_df(spark, rows), "x", "grp", "a", "b").first()
    assert out["n_a"] == 3 and out["n_b"] == 3
    assert out["u_a"] == pytest.approx(0.0)


def test_mann_whitney_empty_group_is_null_z(spark):
    rows = [("a", 1.0), ("a", 2.0)]
    out = mann_whitney_u(_df(spark, rows), "x", "grp", "a", "b").first()
    assert out["n_b"] is None
    assert out["z"] is None


def test_kw_two_groups_equals_mwu_z_squared(spark):
    # With k=2 the tie-adjusted KW statistic equals z^2 of the MWU
    # normal approximation — a cross-operator identity neither oracle
    # restates (algebra-independence check).
    rows = [("a", 3.0), ("a", 7.0), ("a", 7.0), ("a", 10.0),
            ("b", 1.0), ("b", 5.0), ("b", 7.0), ("b", 2.0), ("b", 2.0)]
    df = _df(spark, rows)
    h = kruskal_wallis(df, "x", "grp").first()["h_adj"]
    z = mann_whitney_u(df, "x", "grp", "a", "b").first()["z"]
    assert h == pytest.approx(z * z, abs=1e-4)


def test_kruskal_wallis_single_observation_no_ansi_crash(spark):
    # n = 1 makes the tie-correction denominator n^3 - n = 0; the 0/0
    # must surface as NULL, not an ANSI DIVIDE_BY_ZERO.
    out = kruskal_wallis(_df(spark, [("a", 5.0)]), "x", "grp").first()
    assert out["n"] == 1
    assert out["tie_correction"] is None
    assert out["h_adj"] is None


def test_tie_cubes_computed_in_double_not_long(spark):
    # A tie group of 3,000,000 rows: t^3 = 2.7e19 overflows a 64-bit
    # long (ANSI would raise); doubles carry it exactly enough.
    # sum(t^3 - t) for t=3e6 on one value ~ 2.7e19.
    df = spark.range(0, 3_000_000).select(
        F.lit("a").alias("grp"), F.lit(1.0).alias("x")
    ).union(
        spark.range(0, 10).select(
            F.lit("b").alias("grp"), F.lit(2.0).alias("x")
        )
    )
    out = kruskal_wallis(df, "x", "grp").first()
    assert out["n"] == 3_000_010
    assert out["tie_correction"] is not None


def test_rank_test_distinct_grid_guard_raises(spark):
    # VERDICT r8 item 3: a continuous metric (distinct ~ N) must fail
    # LOUDLY instead of silently running a data-scale single-partition
    # window. max_distinct shrunk so the guard trips at test scale.
    df = spark.range(0, 5_000).select(
        (F.col("id") % 2).cast("string").alias("grp"),
        (F.col("id") * 0.001).alias("x"),
    )
    # the guard is in-plan (raise_error broadcast) since r11: it fires
    # at action time, before the window's single-partition sort runs
    with pytest.raises(Exception, match="round_decimals"):
        kruskal_wallis(df, "x", "grp", max_distinct=1_000).collect()
    with pytest.raises(Exception, match="round_decimals"):
        mann_whitney_u(df, "x", "grp", "0", "1", max_distinct=1_000).collect()


def test_rank_test_round_decimals_discretizes(spark):
    # The documented fix: round_decimals collapses the grid under the
    # bound and the test runs; rounding to 0 decimals here leaves 5
    # distinct values (0..4 from id*0.001 over 0..4999).
    df = spark.range(0, 5_000).select(
        (F.col("id") % 2).cast("string").alias("grp"),
        (F.col("id") * 0.001).alias("x"),
    )
    out = kruskal_wallis(
        df, "x", "grp", round_decimals=0, max_distinct=1_000
    ).first()
    assert out["n"] == 5_000
    assert out["h_adj"] is not None
    # Hand check of the discretization itself: round(x, 0) over
    # 0.000..4.999 yields the 6-value grid {0,1,2,3,4,5} (banker's-free
    # double rounding on .5 boundaries aside, the grid is tiny).
    grid = (
        df.select(F.round("x", 0).alias("r")).distinct().count()
    )
    assert grid <= 6


def test_mann_whitney_same_group_raises(spark):
    df = _df(spark, [("a", 1.0), ("b", 2.0)])
    with pytest.raises(ValueError, match="same group"):
        mann_whitney_u(df, "x", "grp", "a", "a")
