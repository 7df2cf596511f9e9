"""Property-based tests for the late-r8 additions (SURVEY §5):
the Bloom no-false-negative theorem over ARBITRARY key sets and
filter geometries, Bloom prune-set monotonicity in num_bits is NOT
required (different m = different hash layout) but subset-of-build
always is; Jaro-Winkler bounds/symmetry/identity over arbitrary
strings.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from proyecto_final_de_big_data_spark.operators.bloomjoin import (
    bloom_build,
    bloom_prune,
)
from proyecto_final_de_big_data_spark.operators.fuzzyjoin import (
    jaro_winkler_py,
)

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_keys = st.lists(
    st.integers(min_value=-(2**40), max_value=2**40),
    min_size=1,
    max_size=120,
    unique=True,
)


@given(keys=_keys, num_bits_pow=st.integers(min_value=6, max_value=13))
@settings(**_SETTINGS)
def test_bloom_never_drops_an_inserted_key(spark, keys, num_bits_pow):
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    bits = bloom_build(df, "k", 1 << num_bits_pow)
    # The Bloom theorem for arbitrary key sets and any bitmap size —
    # even a saturated 64-bit filter keeps every inserted key.
    assert bloom_prune(df, "k", bits).count() == len(keys)


@given(keys=_keys)
@settings(**_SETTINGS)
def test_bloom_probe_superset_of_small_side(spark, keys):
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    probe = spark.createDataFrame(
        [(k,) for k in keys] + [(k + 1, ) for k in keys], "k long"
    ).distinct()
    bits = bloom_build(df, "k", 1 << 12)
    got = {r["k"] for r in bloom_prune(probe, "k", bits).collect()}
    assert set(keys) <= got  # false positives allowed, negatives never


_name = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF),
    min_size=0,
    max_size=24,
)


@given(a=_name, b=_name)
@settings(max_examples=60, deadline=None)
def test_jaro_winkler_bounds_symmetry_identity(a, b):
    s = jaro_winkler_py(a, b)
    assert 0.0 <= s <= 1.0
    # symmetric: matching is defined over the pooled window both ways
    assert s == pytest.approx(jaro_winkler_py(b, a), abs=1e-12)
    # identity: equal non-empty strings score exactly 1
    if a and a == b:
        assert s == 1.0
    # empty-side convention (DuckDB/RapidFuzz): 0.0
    if not a or not b:
        assert s == 0.0
