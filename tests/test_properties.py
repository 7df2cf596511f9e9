"""Property-based tests (hypothesis) for the pure-algebra cores that
don't need a SparkSession: PAV calibration, Benford expected masses,
and the driver-side helpers. Spark-side invariants get one
representative randomized case each (a full hypothesis loop per Spark
job would be minutes per example)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from proyecto_final_de_big_data_spark.ml.calibration import pav_fit

pairs = st.lists(
    st.tuples(
        st.floats(min_value=0.1, max_value=100.0, allow_nan=False),
        st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
    ),
    min_size=1,
    max_size=50,
)


@given(pairs)
@settings(max_examples=200, deadline=None)
def test_pav_output_is_monotone(ps):
    out = pav_fit(ps)
    assert all(a <= b + 1e-12 for a, b in zip(out, out[1:]))


@given(pairs)
@settings(max_examples=200, deadline=None)
def test_pav_preserves_weighted_mass(ps):
    out = pav_fit(ps)
    got = sum(w * v for (w, _), v in zip(ps, out))
    want = sum(w * m for w, m in ps)
    assert got == pytest.approx(want, rel=1e-9, abs=1e-9)


@given(pairs)
@settings(max_examples=200, deadline=None)
def test_pav_is_idempotent(ps):
    once = pav_fit(ps)
    again = pav_fit([(w, v) for (w, _), v in zip(ps, once)])
    assert all(a == pytest.approx(b, abs=1e-12) for a, b in zip(once, again))


@given(pairs)
@settings(max_examples=200, deadline=None)
def test_pav_stays_within_input_range(ps):
    out = pav_fit(ps)
    lo = min(m for _, m in ps)
    hi = max(m for _, m in ps)
    assert all(lo - 1e-12 <= v <= hi + 1e-12 for v in out)


@given(st.lists(st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
                min_size=1, max_size=50))
@settings(max_examples=200, deadline=None)
def test_pav_monotone_input_is_fixed_point(ms):
    ms = sorted(ms)
    out = pav_fit([(1.0, m) for m in ms])
    assert all(a == pytest.approx(b, abs=1e-12) for a, b in zip(out, ms))


def test_benford_masses_sum_to_one():
    from proyecto_final_de_big_data_spark.operators.benford import BENFORD_P

    assert sum(BENFORD_P.values()) == pytest.approx(1.0)
    assert all(BENFORD_P[d] > BENFORD_P[d + 1] for d in range(1, 9))
