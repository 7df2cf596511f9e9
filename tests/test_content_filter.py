"""Blocklist content filter (operators/content_filter.py)."""

from __future__ import annotations

import pytest

from proyecto_final_de_big_data_spark.operators.content_filter import (
    blocked,
    blocklist_pattern,
    drop_blocked,
)


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "a perfectly clean document"),
            (2, "contains the BADWORD here"),          # case-insensitive hit
            (3, "badwordish is NOT a whole-word hit"),
            (4, "regex specials like c++ must match literally"),
            (5, None),                                  # NULL text never matches
        ],
        ["doc_id", "text"],
    )


def test_blocklist_whole_word_case_insensitive(spark):
    kept = drop_blocked(_docs(spark), "text", ["badword"])
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 3, 4, 5]


def test_blocklist_literal_escaping_of_regex_specials(spark):
    # 'c++' as a literal: the '+' must not become a regex quantifier.
    # Word boundaries don't sit after '+', so match as substring terms.
    kept = drop_blocked(_docs(spark), "text", ["c++"], whole_words=False)
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 2, 3, 5]


def test_blocklist_substring_mode_and_flag_column(spark):
    flags = {
        r["doc_id"]: r["hit"]
        for r in _docs(spark)
        .select("doc_id", blocked("text", ["badword"], whole_words=False).alias("hit"))
        .collect()
    }
    assert flags == {1: False, 2: True, 3: True, 4: False, 5: False}


def test_blocklist_pattern_validation_and_shape():
    with pytest.raises(ValueError, match="at least one"):
        blocklist_pattern([])
    pat = blocklist_pattern(["ab", "abc"])
    # longest-first alternation, escaped, bounded, case-insensitive
    assert pat == r"(?i)\b(?:abc|ab)\b"


def test_curation_pipeline_blocklist_stage(spark):
    from proyecto_final_de_big_data_spark.pipelines.curation import (
        CurationConfig,
        curate_documents,
    )

    df = spark.createDataFrame(
        [(1, "good text only here"), (2, "this mentions forbidden things")],
        ["doc_id", "text"],
    )
    cfg = CurationConfig(
        redact_pii=False,
        dedup="none",
        blocklist_terms=["forbidden"],
        split_fractions=None,
    )
    out = curate_documents(df, cfg).collect()
    assert [r["doc_id"] for r in out] == [1]
