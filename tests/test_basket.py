"""Market-basket item-pair affinity (operators/basket.py)."""

from __future__ import annotations

import pytest

from proyecto_final_de_big_data_spark.operators.basket import item_pair_affinity


def _affinity(spark, rows, **kw):
    df = spark.createDataFrame(rows, "basket long, item string")
    out = item_pair_affinity(df, "basket", "item", **kw)
    return {(r["item_a"], r["item_b"]): r for r in
            (row.asDict() for row in out.collect())}


def test_counts_and_scores(spark):
    # baskets: 1={a,b}, 2={a,b,c}, 3={a}, 4={c}
    rows = [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (2, "c"), (3, "a"), (4, "c")]
    got = _affinity(spark, rows)
    ab = got[("a", "b")]
    assert ab["n_both"] == 2 and ab["n_a"] == 3 and ab["n_b"] == 2
    # 4 baskets total: support 2/4, lift (2*4)/(3*2), cosine 2/sqrt(6)
    assert ab["support"] == 0.5
    assert ab["lift"] == pytest.approx(8 / 6, abs=1e-6)
    assert ab["cosine"] == pytest.approx(2 / 6**0.5, abs=1e-6)
    # pairs are canonical: no (b, a) row
    assert ("b", "a") not in got
    # a and c co-occur only in basket 2
    assert got[("a", "c")]["n_both"] == 1


def test_duplicate_lines_collapse(spark):
    # the same item twice in one basket is still ONE co-occurrence
    rows = [(1, "a"), (1, "a"), (1, "b"), (1, "b")]
    got = _affinity(spark, rows)
    assert got[("a", "b")]["n_both"] == 1
    assert got[("a", "b")]["n_a"] == 1


def test_max_basket_cap_drops_oversized(spark):
    rows = [(1, "a"), (1, "b"), (1, "c"), (2, "a"), (2, "b")]
    got = _affinity(spark, rows, max_basket=2)
    # basket 1 (3 items) is dropped entirely: counts come from basket 2
    assert got[("a", "b")]["n_both"] == 1
    assert got[("a", "b")]["n_a"] == 1
    assert ("a", "c") not in got
    # and the basket total reflects the capped population (1 basket)
    assert got[("a", "b")]["support"] == 1.0


def test_min_pair_count_filters(spark):
    rows = [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (3, "c")]
    got = _affinity(spark, rows, min_pair_count=2)
    assert ("a", "b") in got and ("a", "c") not in got


def test_max_basket_validation(spark):
    df = spark.createDataFrame([(1, "a")], "basket long, item string")
    with pytest.raises(ValueError):
        item_pair_affinity(df, "basket", "item", max_basket=1)


def test_basket_size_profile_reports_cap_pressure(spark):
    from proyecto_final_de_big_data_spark.operators.basket import (
        basket_size_profile,
    )

    rows = [("b1", f"i{k}") for k in range(5)] + [("b2", "x"), ("b2", "y")]
    df = spark.createDataFrame(rows, "b string, i string")
    out = basket_size_profile(df, "b", "i", max_basket=3).first()
    assert out["n_baskets"] == 2 and out["n_over_cap"] == 1
    assert out["over_cap_frac"] == 0.5 and out["max_size"] == 5
