"""Token-budget selection (operators/selection.py): threshold algebra,
boundary-bin handling, NULL semantics, and plan shape."""

from __future__ import annotations

import pytest

from proyecto_final_de_big_data_spark.operators.selection import (
    select_within_token_budget,
    token_budget_thresholds,
)


def _corpus(spark):
    # scale=10 -> bins: 0.95->9, 0.85->8, 0.72->7, 0.61->6.
    # Per-stratum bin token sums (stratum 'a'):
    #   bin 9: 100, bin 8: 200, bin 7: 400, bin 6: 100
    rows = [
        ("a", 0.95, 100, 1),
        ("a", 0.85, 120, 2),
        ("a", 0.85, 80, 3),
        ("a", 0.72, 400, 4),
        ("a", 0.61, 100, 5),
        ("b", 0.95, 50, 6),
        ("b", 0.85, 10, 7),
    ]
    return spark.createDataFrame(
        rows, "stratum string, score double, tok long, doc_id long"
    )


def test_thresholds_keep_whole_bins_within_budget(spark):
    t = {
        r["stratum"]: (r["min_keep_bin"], r["kept_tokens"], r["n_kept_bins"])
        for r in token_budget_thresholds(
            _corpus(spark), "stratum", "score", "tok", budget=320, scale=10.0
        ).collect()
    }
    # a: 100 (bin 9) + 200 (bin 8) = 300 <= 320; bin 7 would cross.
    assert t["a"] == (8, 300, 2)
    # b: both bins fit (60 total).
    assert t["b"] == (8, 60, 2)


def test_include_boundary_keeps_the_crossing_bin_only(spark):
    t = {
        r["stratum"]: (r["min_keep_bin"], r["kept_tokens"])
        for r in token_budget_thresholds(
            _corpus(spark), "stratum", "score", "tok",
            budget=320, scale=10.0, include_boundary=True,
        ).collect()
    }
    # a gains bin 7 (the crossing bin) but NOT bin 6 beyond it.
    assert t["a"] == (7, 700)


def test_stratum_over_budget_at_top_bin_keeps_nothing(spark):
    df = _corpus(spark)
    strict = select_within_token_budget(
        df, "stratum", "score", "tok", budget=60, scale=10.0
    )
    # a's top bin (100 tokens) exceeds 60 -> whole stratum dropped;
    # b keeps both bins (50 + 10 lands exactly on the budget).
    got = sorted(r["doc_id"] for r in strict.collect())
    assert got == [6, 7]
    # include_boundary resurrects a's top bin.
    lenient = select_within_token_budget(
        df, "stratum", "score", "tok", budget=60, scale=10.0,
        include_boundary=True,
    )
    assert sorted(r["doc_id"] for r in lenient.collect()) == [1, 6, 7]


def test_null_semantics(spark):
    rows = [
        (None, 0.95, 100, 1),   # NULL stratum is a legitimate group
        (None, 0.15, 999, 2),   # ...low bin in it is cut
        ("a", None, 100, 3),    # NULL score: never selected, no budget
        ("a", 0.95, None, 4),   # NULL tok: free to keep, selected by bin
        ("a", 0.95, 100, 5),
    ]
    df = spark.createDataFrame(
        rows, "stratum string, score double, tok long, doc_id long"
    )
    kept = select_within_token_budget(
        df, "stratum", "score", "tok", budget=150, scale=10.0
    )
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 4, 5]


def test_selection_preserves_columns_and_rejects_bad_budget(spark):
    df = _corpus(spark)
    kept = select_within_token_budget(
        df, "stratum", "score", "tok", budget=320, scale=10.0
    )
    assert kept.columns == df.columns
    with pytest.raises(ValueError, match="budget must be positive"):
        token_budget_thresholds(df, "stratum", "score", "tok", budget=0)


def test_corpus_side_is_broadcast_joined(spark):
    plan = select_within_token_budget(
        _corpus(spark), "stratum", "score", "tok", budget=320, scale=10.0
    )._jdf.queryExecution().executedPlan().toString()
    # The threshold frame broadcasts; the corpus must never be the build
    # side of a shuffled join.
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


# ---------------------------------------------------------------------
# Property: the bin-aggregated engine implementation matches a direct
# Python reference model of the same semantics on arbitrary inputs.
# ---------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_row = st.tuples(
    st.sampled_from(["a", "b", None]),                    # stratum
    st.one_of(st.none(), st.floats(0.0, 1.0, width=32)),  # score
    st.one_of(st.none(), st.integers(0, 50)),             # tok
)


def _reference(rows, budget, scale, include_boundary):
    """Python model: per stratum, bins best-first; keep while the
    running (non-NULL) token total stays within budget, optionally plus
    the crossing bin."""
    import math
    from collections import defaultdict

    bins = defaultdict(lambda: defaultdict(int))
    for stratum, score, tok in rows:
        if score is not None and tok is not None:
            bins[stratum][math.floor(score * scale)] += tok
    keep_bin = {}
    for stratum, per_bin in bins.items():
        run = 0
        for b in sorted(per_bin, reverse=True):
            crosses = run + per_bin[b] > budget
            if not crosses or (include_boundary and run <= budget):
                keep_bin[stratum] = b
            if crosses:
                break
            run += per_bin[b]
    kept = []
    for i, (stratum, score, tok) in enumerate(rows):
        if score is None or stratum not in keep_bin:
            continue
        if math.floor(score * scale) >= keep_bin[stratum]:
            kept.append(i)
    return kept


@given(
    rows=st.lists(_row, min_size=1, max_size=25),
    budget=st.integers(1, 120),
    include_boundary=st.booleans(),
)
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_selection_matches_python_reference(spark, rows, budget, include_boundary):
    df = spark.createDataFrame(
        [(s, q, t, i) for i, (s, q, t) in enumerate(rows)],
        "stratum string, score double, tok long, doc_id long",
    )
    got = sorted(
        r["doc_id"]
        for r in select_within_token_budget(
            df, "stratum", "score", "tok", budget=budget, scale=10.0,
            include_boundary=include_boundary,
        ).collect()
    )
    assert got == _reference(rows, budget, 10.0, include_boundary)
