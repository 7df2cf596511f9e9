"""Per-group quantile clipping (operators/clean.py grouped variants)."""

from __future__ import annotations

from pyspark.sql import functions as F

from proyecto_final_de_big_data_spark.operators.clean import (
    clip_to_group_quantiles,
    grouped_quantile_bounds,
)


def _df(spark):
    rows = [("a", float(v)) for v in range(1, 11)] + [("b", float(v)) for v in (100, 200, 300, 400, 1000)]
    return spark.createDataFrame(rows, "g string, x double")


def test_groups_get_their_own_bands(spark):
    out = clip_to_group_quantiles(_df(spark), ["g"], ["x"], 0.0, 0.8, exact=True)
    kept = {(r["g"], r["x"]) for r in out.collect()}
    # group a: p80 of 1..10 = 8.2 -> keeps 1..8; group b: p80 of the five
    # values = 520 -> keeps 100..400. A GLOBAL band could never do both.
    assert {x for g, x in kept if g == "a"} == {float(v) for v in range(1, 9)}
    assert {x for g, x in kept if g == "b"} == {100.0, 200.0, 300.0, 400.0}


def test_null_group_rows_are_fenced_not_dropped(spark):
    rows = [(None, 1.0), (None, 2.0), (None, 50.0), ("a", 5.0)]
    df = spark.createDataFrame(rows, "g string, x double")
    out = clip_to_group_quantiles(df, ["g"], ["x"], 0.0, 0.6, exact=True)
    kept = [(r["g"], r["x"]) for r in out.collect()]
    # The NULL group has its own band (p60 of 1,2,50 = 2.x) — its inliers
    # survive the null-safe join instead of vanishing.
    assert (None, 1.0) in kept and (None, 2.0) in kept
    assert (None, 50.0) not in kept
    assert ("a", 5.0) in kept


def test_bounds_one_row_per_group(spark):
    b = grouped_quantile_bounds(_df(spark), ["g"], ["x"], 0.1, 0.9, exact=True)
    assert b.count() == 2
    assert set(b.columns) == {"g", "x__lo", "x__hi"}


# ------------------------------------------------- weighted percentiles


def test_weighted_median_counts_each_row_weight_times(spark):
    from proyecto_final_de_big_data_spark.operators.clean import (
        weighted_percentiles,
    )

    # multiset {1, 2,2,2, 10} -> median 2; unweighted median would be 2
    # anyway, so also check p80 where they diverge: expanded sorted
    # [1,2,2,2,10], p80 interpolates between index 3.2 -> 2 + .2*(10-2)
    df = spark.createDataFrame(
        [(1.0, 1), (2.0, 3), (10.0, 1)], "x double, w long"
    )
    out = weighted_percentiles(df, "x", "w", [0.5, 0.8]).first()
    assert out["p50"] == 2.0
    assert out["p80"] == 3.6


def test_weighted_percentiles_per_group_and_naming(spark):
    from proyecto_final_de_big_data_spark.operators.clean import (
        weighted_percentiles,
    )

    df = spark.createDataFrame(
        [("a", 1.0, 1), ("a", 3.0, 1), ("b", 5.0, 2)],
        "k string, x double, w long",
    )
    out = {r["k"]: r for r in weighted_percentiles(
        df, "x", "w", [0.5, 0.999], by=["k"]
    ).collect()}
    assert out["a"]["p50"] == 2.0 and out["b"]["p50"] == 5.0
    assert "p99_9" in out["a"].asDict()


def test_weighted_percentiles_rejects_float_weight_and_bad_fracs(spark):
    import pytest as _pytest

    from proyecto_final_de_big_data_spark.operators.clean import (
        weighted_percentiles,
    )

    intdf = spark.createDataFrame([(1.0, 1)], "x double, w long")
    fdf = spark.createDataFrame([(1.0, 1.5)], "x double, w double")
    with _pytest.raises(ValueError):
        weighted_percentiles(fdf, "x", "w", [0.5])
    with _pytest.raises(ValueError):
        weighted_percentiles(intdf, "x", "w", [])
    with _pytest.raises(ValueError):
        weighted_percentiles(intdf, "x", "w", [1.5])


def test_weighted_percentile_names_survive_binary_fractions(spark):
    from proyecto_final_de_big_data_spark.operators.clean import (
        weighted_percentiles,
    )

    df = spark.createDataFrame([(1.0, 1), (2.0, 1)], "x double, w long")
    out = weighted_percentiles(df, "x", "w", [0.29, 0.07, 0.999])
    assert set(out.columns) == {"p29", "p7", "p99_9"}


def test_weighted_percentiles_negative_weight_raises_named_error(spark):
    # ADVICE r7: a negative weight fails with the operator's own named
    # validation, not an opaque error from inside Spark's percentile.
    import pytest

    from proyecto_final_de_big_data_spark.operators.clean import (
        weighted_percentiles,
    )

    df = spark.createDataFrame(
        [(1.0, 2), (2.0, -1)], "x double, w long"
    )
    with pytest.raises(Exception, match="weighted_percentiles: negative"):
        weighted_percentiles(df, "x", "w", [0.5]).collect()
