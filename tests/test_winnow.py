"""Winnowing fingerprint tests: a pure-Python (hashlib) twin plus the
paper's structural guarantees (Schleimer et al. 2003), independent of
the DuckDB oracle restatement."""

from __future__ import annotations

import hashlib
import re

import pytest

from proyecto_final_de_big_data_spark.operators.winnow import (
    shared_fingerprint_pairs,
    winnowing_fingerprints,
)

K, W = 5, 4


def _norm(t: str) -> str:
    return re.sub(r"[^a-z0-9]", "", t.lower())


def _h(g: str) -> int:
    return int(hashlib.md5(g.encode()).hexdigest()[:15], 16)


def _py_fps(text: str, k: int = K, w: int = W) -> set[int]:
    t = _norm(text)
    if len(t) < k:
        return set()
    hashes = [_h(t[i : i + k]) for i in range(len(t) - k + 1)]
    if len(hashes) < w:
        return {min(hashes)}
    return {min(hashes[i : i + w]) for i in range(len(hashes) - w + 1)}


DOCS = [
    ("d1", "A do run run run, a do run run!"),
    ("d2", "the quick brown fox jumps over the lazy dog"),
    ("d3", "pack my box with five dozen liquor jugs, said the fox"),
    ("d4", "tiny"),
    ("d5", ""),
]


@pytest.fixture(scope="module")
def fps_df(spark):
    df = spark.createDataFrame(DOCS, "doc_id string, text string")
    return winnowing_fingerprints(df, "doc_id", "text", k=K, w=W)


def test_matches_pure_python_twin(fps_df):
    got = {}
    for r in fps_df.collect():
        got.setdefault(r["id"], set()).add(r["fingerprint"])
    for doc_id, text in DOCS:
        want = _py_fps(text)
        assert got.get(doc_id, set()) == want, doc_id


def test_short_doc_single_fingerprint_and_empty_doc_dropped(fps_df):
    rows = [r for r in fps_df.collect() if r["id"] == "d4"]
    # 'tiny' has 4 chars < k=5 -> no k-grams at all -> dropped
    assert rows == []
    assert not [r for r in fps_df.collect() if r["id"] == "d5"]


def test_short_but_fingerprintable_doc_gets_global_min(spark):
    # normalized length 6 -> 2 k-grams < w -> exactly one fp: the min.
    df = spark.createDataFrame([("s", "abcdef")], "doc_id string, text string")
    rows = winnowing_fingerprints(df, "doc_id", "text", k=K, w=W).collect()
    assert len(rows) == 1
    assert rows[0]["fingerprint"] == min(_h("abcde"), _h("bcdef"))


def test_every_window_contains_a_selected_fingerprint(fps_df):
    # The winnowing guarantee's mechanical form: every w-window of the
    # k-gram hash sequence contains at least one selected fingerprint.
    got = {}
    for r in fps_df.collect():
        got.setdefault(r["id"], set()).add(r["fingerprint"])
    for doc_id, text in DOCS:
        t = _norm(text)
        if len(t) < K:
            continue
        hashes = [_h(t[i : i + K]) for i in range(len(t) - K + 1)]
        sel = got[doc_id]
        if len(hashes) < W:
            assert min(hashes) in sel
            continue
        for i in range(len(hashes) - W + 1):
            assert sel & set(hashes[i : i + W]), (doc_id, i)


def test_shared_substring_guarantees_shared_fingerprint(spark):
    # Two documents sharing a normalized substring of length
    # >= w + k - 1 = 8 MUST share a fingerprint (paper theorem); the
    # pair join must surface exactly the overlapping pair.
    shared = "commonpassageofsufficientlength"
    docs = [
        ("a", "left padding here " + shared + " and a tail"),
        ("b", "totally different preamble " + shared),
        ("c", "no overlap with anything else at all zzz"),
    ]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    fps = winnowing_fingerprints(df, "doc_id", "text", k=K, w=W)
    pairs = shared_fingerprint_pairs(fps).collect()
    keys = {(r["id_a"], r["id_b"]) for r in pairs}
    assert ("a", "b") in keys
    assert all("c" not in pair for pair in keys)


def test_fingerprints_are_subset_of_kgram_hashes(fps_df):
    for r in fps_df.collect():
        doc = dict(DOCS)[r["id"]]
        t = _norm(doc)
        all_hashes = {_h(t[i : i + K]) for i in range(len(t) - K + 1)}
        assert r["fingerprint"] in all_hashes


def test_invalid_params_rejected(spark):
    df = spark.createDataFrame([("d", "x")], "doc_id string, text string")
    with pytest.raises(ValueError, match="k >= 1"):
        winnowing_fingerprints(df, "doc_id", "text", k=0)
    with pytest.raises(ValueError, match="w >= 1"):
        winnowing_fingerprints(df, "doc_id", "text", w=0)


def test_spread_for_fanout_default_never_shrinks_wide_input(spark):
    """r11 verdict item 7: the parts=None default must be WIDENING-ONLY.
    An input already wider than the session's default parallelism keeps
    (at least) its width; a too-narrow input still spreads up to the
    core count; parts=0 stays the no-shuffle escape hatch."""
    from proyecto_final_de_big_data_spark.operators.winnow import spread_for_fanout

    cores = spark.sparkContext.defaultParallelism
    wide_n = max(64, cores * 2)
    wide = spark.range(10_000).withColumnRenamed("id", "k").repartition(wide_n)
    assert (
        spread_for_fanout(wide, "k").rdd.getNumPartitions() >= wide_n
    ), "default shrank a wide input"
    narrow = spark.range(100).withColumnRenamed("id", "k").coalesce(1)
    assert spread_for_fanout(narrow, "k").rdd.getNumPartitions() == cores
    assert spread_for_fanout(narrow, "k", parts=0) is narrow
    assert spread_for_fanout(wide, "k", parts=8).rdd.getNumPartitions() == 8
