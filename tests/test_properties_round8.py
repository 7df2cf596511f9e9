"""Property-based tests for the round-8 operators: invariants over
arbitrary inputs (SURVEY §5 "Property tests"), complementing the
fixture-pinned unit tests. Each property states something the
fixtures cannot: it must hold for EVERY input the strategy can draw.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_word = st.text(alphabet="abcde", min_size=1, max_size=3)
_doc = st.lists(_word, min_size=1, max_size=10).map(" ".join)


@given(
    docs=st.lists(_doc, min_size=2, max_size=10, unique=True),
    tau=st.sampled_from([0.3, 0.6, 0.9]),
)
@settings(**_SETTINGS)
def test_prefix_filter_lossless_for_any_corpus(spark, docs, tau):
    # The prefix-filter theorem, exercised adversarially: tiny vocab
    # ("abcde"^<=3) forces heavy shingle sharing — exactly the regime
    # where a broken prefix would lose pairs.
    from proyecto_final_de_big_data_spark.operators.dedup import (
        jaccard_pairs_index,
    )
    from proyecto_final_de_big_data_spark.operators.setsim import (
        jaccard_prefix_pairs,
    )

    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string"
    )
    full = sorted(
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in jaccard_pairs_index(df, "doc_id", "text", 2, tau).collect()
    )
    pref = sorted(
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in jaccard_prefix_pairs(df, "doc_id", "text", 2, tau).collect()
    )
    assert pref == full


@given(
    weights=st.lists(
        st.integers(min_value=1, max_value=9), min_size=3, max_size=12
    ),
    k=st.integers(min_value=1, max_value=4),
)
@settings(**_SETTINGS)
def test_weighted_sample_k_set_properties(spark, weights, k):
    from proyecto_final_de_big_data_spark.operators.split import (
        weighted_sample_k,
    )

    df = spark.createDataFrame(
        [(i, float(w)) for i, w in enumerate(weights)], "id long, w double"
    )
    got = [r["id"] for r in weighted_sample_k(df, "id", "w", k).collect()]
    assert len(got) == min(k, len(weights))      # exactly k (or all)
    assert len(set(got)) == len(got)             # without replacement
    again = [r["id"] for r in weighted_sample_k(df, "id", "w", k).collect()]
    assert sorted(got) == sorted(again)          # deterministic


@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=7),
            st.integers(min_value=0, max_value=7),
        ),
        min_size=1,
        max_size=20,
    )
)
@settings(**_SETTINGS)
def test_triangle_count_invariants(spark, edges):
    # Sum of per-vertex triangle counts is divisible by 3 (each
    # triangle counted at all three corners), and clustering stays in
    # [0, 1] — for ANY multigraph with loops and repeats.
    from proyecto_final_de_big_data_spark.operators.graph import triangle_stats

    df = spark.createDataFrame(edges, "src long, dst long")
    rows = triangle_stats(df).collect()
    total = sum(r["n_triangles"] for r in rows)
    assert total % 3 == 0
    for r in rows:
        assert 0.0 <= r["clustering"] <= 1.0
        assert r["n_triangles"] >= 0 and r["degree"] >= 1


@given(
    resids=st.lists(
        st.floats(min_value=0.0, max_value=100.0, allow_nan=False),
        min_size=20,
        max_size=60,
    )
)
@settings(**_SETTINGS)
def test_conformal_quantile_is_a_calibration_residual(spark, resids):
    # q_hat must be an actual calibration residual (order statistic,
    # not an interpolation) and at least the 1-alpha share of
    # calibration residuals must sit at or below it.
    from proyecto_final_de_big_data_spark.ml.conformal import (
        split_conformal_profile,
    )

    rows = [(1, 0.0, float(r)) for r in resids] + [(0, 0.0, 1.0)]
    df = spark.createDataFrame(rows, "is_cal int, pred double, y double")
    out = split_conformal_profile(
        df, "pred", "y", F.col("is_cal") == 1, alpha=0.2
    ).first()
    q = out["q_hat"]
    assert any(abs(q - round(r, 6)) < 1e-9 for r in resids)
    # compare at the operator's 6-decimal output precision: q_hat is
    # the rounded order statistic, so a raw residual with >6 decimals
    # can sit a hair above it (hypothesis found 0.33203125 -> 0.332031)
    # while its rounded value is exactly q — the coverage guarantee
    # holds at output precision.
    share = sum(1 for r in resids if round(r, 6) <= q + 1e-9) / len(resids)
    assert share >= 0.8 - 1e-9


@given(
    ranks_a=st.permutations(list(range(1, 7))),
    ranks_b=st.permutations(list(range(1, 7))),
)
@settings(**_SETTINGS)
def test_rrf_is_rank_only(spark, ranks_a, ranks_b):
    # RRF must depend on RANKS alone: feeding the same rankings with
    # any doc-id relabeling permutes the output identically (scores
    # multiset invariant).
    from proyecto_final_de_big_data_spark.operators.rrf import rrf_fuse

    a = spark.createDataFrame(
        [(i, r) for i, r in enumerate(ranks_a)], "doc_id long, rank int"
    )
    b = spark.createDataFrame(
        [(i, r) for i, r in enumerate(ranks_b)], "doc_id long, rank int"
    )
    out = rrf_fuse([a, b], ["doc_id"]).collect()
    scores = sorted(r["rrf_score"] for r in out)
    want = sorted(
        round(1 / (60 + ra) + 1 / (60 + rb), 6)
        for ra, rb in zip(ranks_a, ranks_b)
    )
    import pytest

    assert scores == pytest.approx(want, abs=2e-6)


@given(
    pos=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),
            st.integers(min_value=0, max_value=9),
        ),
        min_size=1,
        max_size=25,
    ),
    k=st.integers(min_value=1, max_value=3),
)
@settings(**_SETTINGS)
def test_negative_sampling_never_emits_positives(spark, pos, k):
    from proyecto_final_de_big_data_spark.operators.negatives import (
        hash_negative_samples,
    )

    pdf = spark.createDataFrame(list(set(pos)), "u long, it long")
    items = spark.createDataFrame([(i,) for i in range(10)], "it long")
    out = hash_negative_samples(pdf, "u", "it", items, k=k, oversample=6)
    pos_set = set(pos)
    for r in out.collect():
        assert (r["user"], r["item"]) not in pos_set
        assert 1 <= r["draw_rank"] <= k
