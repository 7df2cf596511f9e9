"""Gopher document-quality rules (operators/quality.py:
gopher_quality_flags).

Hand-crafted fixture docs, one per rule (the mandatory hand-fixture
discipline) — each doc is built so exactly one rule fails and the
signal value is hand-checkable:

    good      50 words incl. 'the'/'and', 4-letter words
    short     3 words                       -> word_count_ok False
    longword  50 copies of a 12-char word   -> mean_word_len_ok False
    symbols   50 words, 10 '#'              -> symbol_ratio 0.2 > 0.1
    bullets   10 lines, all '- ...'         -> bullet_line_frac 1.0
    ellipses  10 lines, 5 end '...'         -> ellipsis_line_frac 0.5
    digits    50 numeric words              -> alpha_word_frac small
    nostop    50 words, no stop words       -> stop_words_ok False
"""

from __future__ import annotations

from proyecto_final_de_big_data_spark.operators.quality import (
    gopher_quality_flags,
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def _flags(spark, rows):
    out = gopher_quality_flags(_mk(spark, rows), "text")
    return {r["doc_id"]: r for r in out.collect()}


def test_good_doc_passes_every_rule(spark):
    good = " ".join(["the", "and"] + ["word"] * 48)
    r = _flags(spark, [("good", good)])["good"]
    assert r["n_words"] == 50
    assert r["n_stop_words"] == 2
    assert r["gopher_pass"] is True


def test_each_rule_fails_its_doc(spark):
    rows = [
        ("short", "the and word"),
        ("longword", " ".join(["the", "and"] + ["abcdefghijkl"] * 48)),
        ("symbols", " ".join(["the", "and"] + ["word"] * 48) + " " + "#" * 10),
        (
            "bullets",
            "\n".join("- the and word item line" for _ in range(10)),
        ),
        (
            "ellipses",
            "\n".join(
                ("the and word line..." if i < 5 else "the and word line")
                for i in range(10)
            ),
        ),
        ("digits", " ".join(["the", "and"] + ["12345"] * 48)),
        ("nostop", " ".join(["word"] * 50)),
    ]
    got = _flags(spark, rows)
    assert got["short"]["word_count_ok"] is False
    assert got["short"]["n_words"] == 3
    lw = got["longword"]
    assert lw["mean_word_len_ok"] is False
    # (2*3 + 48*12) / 50 = 11.64 by hand
    assert lw["mean_word_len"] == 11.64
    sy = got["symbols"]
    assert sy["symbol_ratio_ok"] is False
    # 10 '#' over 51 words (the '##########' token counts as a word)
    assert sy["symbol_ratio"] == round(10 / 51, 6)
    bu = got["bullets"]
    assert bu["bullet_ok"] is False and bu["bullet_line_frac"] == 1.0
    el = got["ellipses"]
    assert el["ellipsis_ok"] is False and el["ellipsis_line_frac"] == 0.5
    dg = got["digits"]
    assert dg["alpha_ok"] is False
    assert dg["alpha_word_frac"] == round(2 / 50, 6)
    ns = got["nostop"]
    assert ns["stop_words_ok"] is False and ns["n_stop_words"] == 0
    # every failing doc fails gopher_pass
    assert not any(got[k]["gopher_pass"] for k in got)


def test_empty_doc_fails_totally_not_null(spark):
    r = _flags(spark, [("empty", ""), ("blank", "   ")])
    for k in ("empty", "blank"):
        assert r[k]["gopher_pass"] is False
        assert r[k]["word_count_ok"] is False
        assert r[k]["mean_word_len"] is None


def test_stop_word_count_is_distinct_containment(spark):
    # 'the' repeated 30 times still counts once; need >=2 distinct.
    r = _flags(spark, [("onlythe", " ".join(["the"] * 30 + ["word"] * 30))])
    assert r["onlythe"]["n_stop_words"] == 1
    assert r["onlythe"]["stop_words_ok"] is False


def test_null_text_fails_every_rule_including_stop_words(spark):
    # size(NULL array) is NULL under ANSI; stop_words_ok must coalesce
    # to False like every other flag (review finding).
    r = _flags(spark, [("nulldoc", None)])["nulldoc"]
    assert r["stop_words_ok"] is False
    assert r["gopher_pass"] is False


def test_unicode_ellipsis_counts_in_symbol_ratio(spark):
    # '…' and '...' are ONE definition of ellipsis across both rules
    # (review finding): 10 '…' over 60 words (each '…' is also a
    # whitespace token) trips the 0.1 ratio.
    text = " ".join(["the", "and"] + ["word"] * 48) + " " + "… " * 10
    r = _flags(spark, [("uni", text)])["uni"]
    assert r["symbol_ratio_ok"] is False
    assert r["symbol_ratio"] == round(10 / 60, 6)
