"""Neyman stratified-allocation design readout (operators/split.py).

Hand-worked fixture (mandatory discipline), total_n = 10:

  stratum a: [0, 10]        N=2, pop stddev 5          -> wi = 10000
  stratum b: [0, 0, 0, 12]  N=4, var = 27, S=5.196152  -> wi = 20785
  stratum c: [7, 7, 7]      constant, S=0              -> wi = 0

  W = 30785; quotas: a = 100000/W = 3 rem 7645,
  b = 207850/W = 6 rem 23140, c = 0.
  Base sum 9 -> 1 leftover seat -> b (largest remainder).
  Allocation: a=3, b=7, c=0; sums to exactly 10.
"""

from __future__ import annotations

import math

import pytest

from proyecto_final_de_big_data_spark.operators.split import neyman_allocation


def _df(spark):
    rows = (
        [("a", 0.0), ("a", 10.0)]
        + [("b", 0.0)] * 3
        + [("b", 12.0)]
        + [("c", 7.0)] * 3
    )
    return spark.createDataFrame(rows, "stratum string, x double")


def test_hand_worked_allocation(spark):
    out = {
        r["stratum"]: r
        for r in neyman_allocation(_df(spark), ["stratum"], "x", 10).collect()
    }
    assert out["a"]["n_records"] == 2 and out["a"]["stddev"] == 5.0
    assert out["b"]["stddev"] == round(math.sqrt(27), 6)
    assert out["c"]["stddev"] == 0.0
    assert (out["a"]["n_alloc"], out["b"]["n_alloc"], out["c"]["n_alloc"]) == (
        3,
        7,
        0,
    )
    assert sum(r["n_alloc"] for r in out.values()) == 10


def test_allocation_sums_exactly_across_budgets(spark):
    df = _df(spark)
    for n in (1, 7, 97, 1000):
        rows = neyman_allocation(df, ["stratum"], "x", n).collect()
        assert sum(r["n_alloc"] for r in rows) == n


def test_all_constant_strata_null_allocation(spark):
    df = _df(spark).filter("stratum = 'c'")
    rows = neyman_allocation(df, ["stratum"], "x", 10).collect()
    assert rows[0]["n_alloc"] is None  # undefined design, honest NULL


def test_validation_and_null_exclusion(spark):
    df = _df(spark)
    with pytest.raises(ValueError, match="stratum column"):
        neyman_allocation(df, [], "x", 10)
    with pytest.raises(ValueError, match="total_n"):
        neyman_allocation(df, ["stratum"], "x", 0)
    import pyspark.sql.functions as F

    with_null = df.union(
        df.sparkSession.createDataFrame(
            [("a", None)], "stratum string, x double"
        )
    )
    out = {
        r["stratum"]: r["n_records"]
        for r in neyman_allocation(with_null, ["stratum"], "x", 10).collect()
    }
    assert out["a"] == 2  # NULL excluded from the moments


def test_overflow_guard_fires_in_plan(spark):
    # cap = (2^63-1) div total_n; with total_n = 2^60 the cap is 7, so
    # stratum a's wi = 10000 must hard-fail with the rescaling remedy
    # (and only on action — construction stays lazy).
    df = neyman_allocation(_df(spark), ["stratum"], "x", 2**60)
    with pytest.raises(Exception, match="overflow BIGINT"):
        df.collect()
