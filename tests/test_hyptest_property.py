"""Algebra-independence property tests for operators/hyptest.py.

Two evidence sources beyond the DuckDB oracle restatement:
(1) a pure-Python reference implementation (plain loops over sorted
lists — shares NO algebra with the Spark sufficient-stats/grid-window
formulation) compared on seeded random fixtures, and
(2) invariance laws the statistics must satisfy by construction —
rank tests depend only on the ORDER of values (invariant under any
strictly increasing transform), ANOVA's F is invariant under affine
maps, MWU's z is antisymmetric in the group labels."""

import math
import random
from collections import Counter

import pytest
from pyspark.sql import functions as F

from proyecto_final_de_big_data_spark.operators.hyptest import (
    kruskal_wallis,
    mann_whitney_u,
    oneway_anova,
)


def _df(spark, rows):
    rows = [(g, float(x)) for g, x in rows]
    return spark.createDataFrame(rows, "grp string, x double")


def _py_anova(groups):
    k = len(groups)
    n = sum(len(g) for g in groups)
    grand = sum(sum(g) for g in groups) / n
    ssb = sum(len(g) * (sum(g) / len(g) - grand) ** 2 for g in groups)
    ssw = sum(sum((x - sum(g) / len(g)) ** 2 for x in g) for g in groups)
    f = (ssb / (k - 1)) / (ssw / (n - k)) if ssw > 0 and n > k else None
    return ssb, ssw, f


def _py_midranks(pooled):
    cnt = Counter(pooled)
    ranks, cum = {}, 0
    for v in sorted(cnt):
        t = cnt[v]
        ranks[v] = cum + (t + 1) / 2
        cum += t
    return ranks, cnt


def _py_kw(groups):
    pooled = [x for g in groups for x in g]
    n = len(pooled)
    ranks, cnt = _py_midranks(pooled)
    h = 12 / (n * (n + 1)) * sum(
        sum(ranks[x] for x in g) ** 2 / len(g) for g in groups
    ) - 3 * (n + 1)
    ts = sum(t**3 - t for t in cnt.values())
    c = 1 - ts / (n**3 - n)
    return h / c if c > 0 else None


def _py_mwu_z(a, b):
    pooled = a + b
    n = len(pooled)
    ranks, cnt = _py_midranks(pooled)
    ra = sum(ranks[x] for x in a)
    na, nb = len(a), len(b)
    u_a = ra - na * (na + 1) / 2
    ts = sum(t**3 - t for t in cnt.values())
    var = na * nb / 12 * ((n + 1) - ts / (n * (n - 1)))
    return (u_a - na * nb / 2) / math.sqrt(var) if var > 0 else None


def _random_groups(rng, k, lo=3, hi=12, domain=8):
    # small integer domain forces heavy ties — the hard case
    return [
        [float(rng.randint(0, domain)) for _ in range(rng.randint(lo, hi))]
        for _ in range(k)
    ]


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_anova_matches_pure_python_reference(spark, seed):
    rng = random.Random(seed)
    groups = _random_groups(rng, 3)
    rows = [(f"g{i}", x) for i, g in enumerate(groups) for x in g]
    out = oneway_anova(_df(spark, rows), "x", "grp").first()
    ssb, ssw, f = _py_anova(groups)
    assert out["ss_between"] == pytest.approx(ssb, abs=1e-4)
    assert out["ss_within"] == pytest.approx(ssw, abs=1e-4)
    if f is None:
        assert out["f_stat"] is None
    else:
        assert out["f_stat"] == pytest.approx(f, abs=1e-4)


@pytest.mark.parametrize("seed", [5, 17, 31])
def test_kw_and_mwu_match_pure_python_reference(spark, seed):
    rng = random.Random(seed)
    groups = _random_groups(rng, 2)
    rows = [(f"g{i}", x) for i, g in enumerate(groups) for x in g]
    df = _df(spark, rows)
    h = kruskal_wallis(df, "x", "grp").first()["h_adj"]
    z = mann_whitney_u(df, "x", "grp", "g0", "g1").first()["z"]
    h_ref = _py_kw(groups)
    z_ref = _py_mwu_z(groups[0], groups[1])
    if h_ref is None:
        assert h is None
    else:
        assert h == pytest.approx(h_ref, abs=1e-4)
    if z_ref is None:
        assert z is None
    else:
        assert z == pytest.approx(z_ref, abs=1e-4)


def test_anova_f_invariant_under_affine_map(spark):
    rng = random.Random(3)
    groups = _random_groups(rng, 3, domain=20)
    rows = [(f"g{i}", x) for i, g in enumerate(groups) for x in g]
    base = oneway_anova(_df(spark, rows), "x", "grp").first()
    mapped = [(g, 2.5 * x - 7.0) for g, x in rows]
    out = oneway_anova(_df(spark, mapped), "x", "grp").first()
    # SS scale by a^2; F and eta^2 are ratios -> invariant.
    assert out["f_stat"] == pytest.approx(base["f_stat"], abs=1e-4)
    assert out["eta_sq"] == pytest.approx(base["eta_sq"], abs=1e-4)
    assert out["ss_between"] == pytest.approx(
        base["ss_between"] * 2.5**2, rel=1e-6
    )


def test_rank_tests_invariant_under_monotone_transform(spark):
    # Rank statistics depend ONLY on the order of values: x -> exp(x)
    # preserves order (and tie structure), so H and z are unchanged —
    # a law the sufficient-stats ANOVA does NOT satisfy, and one no
    # identical-algebra oracle restatement can fake.
    rng = random.Random(13)
    groups = _random_groups(rng, 3)
    rows = [(f"g{i}", x) for i, g in enumerate(groups) for x in g]
    df1 = _df(spark, rows)
    df2 = _df(spark, rows).withColumn("x", F.exp("x"))
    kw1 = kruskal_wallis(df1, "x", "grp").first()
    kw2 = kruskal_wallis(df2, "x", "grp").first()
    assert kw1["h_adj"] == pytest.approx(kw2["h_adj"], abs=1e-6)
    z1 = mann_whitney_u(df1, "x", "grp", "g0", "g1").first()["z"]
    z2 = mann_whitney_u(df2, "x", "grp", "g0", "g1").first()["z"]
    assert z1 == pytest.approx(z2, abs=1e-6)


def test_mwu_z_antisymmetric_in_group_order(spark):
    rng = random.Random(29)
    groups = _random_groups(rng, 2)
    rows = [(f"g{i}", x) for i, g in enumerate(groups) for x in g]
    df = _df(spark, rows)
    z_ab = mann_whitney_u(df, "x", "grp", "g0", "g1").first()["z"]
    z_ba = mann_whitney_u(df, "x", "grp", "g1", "g0").first()["z"]
    assert z_ab == pytest.approx(-z_ba, abs=1e-6)
