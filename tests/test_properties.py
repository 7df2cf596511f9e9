"""Property-based tests (SURVEY §5 "Property tests"): invariants that
must hold for arbitrary inputs, not just the fixtures — the outlier
filter's subset/bounds contract, the D2 weighted-rollup identity, the
salted-aggregation result identity, and canonicalization's
case-insensitivity.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from proyecto_final_de_big_data_spark.operators.canonicalize import canonicalize
from proyecto_final_de_big_data_spark.operators.clean import clip_to_quantiles, quantile_bounds
from proyecto_final_de_big_data_spark.operators.rollup import weighted_mean
from proyecto_final_de_big_data_spark.operators.skew import salted_aggregate

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

finite = st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False)


@given(vals=st.lists(finite, min_size=5, max_size=60))
@settings(**_SETTINGS)
def test_clip_keeps_subset_within_bounds(spark, vals):
    df = spark.createDataFrame([(float(v),) for v in vals], ["x"])
    lo, hi = quantile_bounds(df, ["x"], 0.1, 0.9, exact=True).collect()[0]
    kept = [r["x"] for r in clip_to_quantiles(df, ["x"], 0.1, 0.9, exact=True).collect()]
    # subset of the input as a multiset
    from collections import Counter

    assert not Counter(kept) - Counter(float(v) for v in vals)
    # every kept value respects the quantile band
    assert all(lo <= k <= hi for k in kept)


@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["a", "b", "c"]), finite), min_size=1, max_size=80
    )
)
@settings(**_SETTINGS)
def test_weighted_rollup_recovers_direct_mean(spark, rows):
    """D2 invariant: recombining per-group means weighted by group counts
    equals the direct mean over all rows."""
    df = spark.createDataFrame([(k, float(v)) for k, v in rows], ["k", "v"])
    per_group = df.groupBy("k").agg(
        F.avg("v").alias("avg_v"), F.count(F.lit(1)).alias("n")
    )
    # single output group: weighted mean over all per-group partials
    got = weighted_mean(per_group.withColumn("__all", F.lit(1)), ["__all"], "avg_v", "n", "m")
    m = got.collect()[0]["m"]
    direct = sum(v for _, v in rows) / len(rows)
    assert math.isclose(m, direct, rel_tol=1e-9, abs_tol=1e-9)


@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["x", "y", "z", "hot"]), finite), min_size=1, max_size=80
    ),
    n_salts=st.integers(min_value=1, max_value=32),
)
@settings(**_SETTINGS)
def test_salted_aggregate_matches_plain_groupby(spark, rows, n_salts):
    df = spark.createDataFrame([(k, float(v)) for k, v in rows], ["k", "v"])
    salted = {
        r["k"]: (r["n"], r["s"])
        for r in salted_aggregate(
            df, ["k"], sums={"s": F.col("v")}, count_alias="n", n_salts=n_salts
        ).collect()
    }
    plain = {
        r["k"]: (r["n"], r["s"])
        for r in df.groupBy("k").agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")).collect()
    }
    assert salted.keys() == plain.keys()
    for k in plain:
        assert salted[k][0] == plain[k][0]
        assert math.isclose(salted[k][1], plain[k][1], rel_tol=1e-9, abs_tol=1e-6)


@given(case_seed=st.integers(min_value=0, max_value=2**16))
@settings(**_SETTINGS)
def test_canonicalize_is_case_insensitive(spark, case_seed):
    """Any per-character casing of a synonym column name canonicalizes to
    the same schema and values."""
    name = "totalprice"
    cased = "".join(
        c.upper() if (case_seed >> (i % 16)) & 1 else c for i, c in enumerate(name)
    )
    df = spark.createDataFrame([(1, 10.0), (2, 20.0)], ["order_key", cased])
    out = canonicalize(
        df,
        synonyms={
            "order_key": ["order_key", "orderkey"],
            "total_price": ["totalprice", "total_price"],
        },
        required=["order_key", "total_price"],
        defaults={},
    )
    assert set(out.columns) == {"order_key", "total_price"}
    assert sorted(r["total_price"] for r in out.collect()) == [10.0, 20.0]
