"""Property-based tests for the round-5 operators: invariants over
arbitrary inputs (SURVEY §5 "Property tests"), complementing the
fixture-pinned unit tests.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from proyecto_final_de_big_data_spark.operators.dedup import exact_dedup, incremental_dedup
from proyecto_final_de_big_data_spark.operators.pii import PII_PATTERNS, redact_pii
from proyecto_final_de_big_data_spark.operators.quality import (
    distinct_bigram_ratio,
    distinct_word_ratio,
    words,
)
from proyecto_final_de_big_data_spark.operators.timegrid import gap_filled_counts

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_word = st.text(alphabet="abcdefg", min_size=1, max_size=4)
_pii_bits = st.sampled_from(
    ["bob@mail.example.com", "10.0.0.99", "555-123-4567", "x.y+z@sub.domain.org"]
)


@given(
    docs=st.lists(
        st.lists(_word | _pii_bits, min_size=1, max_size=12).map(" ".join),
        min_size=1,
        max_size=8,
    )
)
@settings(**_SETTINGS)
def test_pii_redaction_idempotent_and_exhaustive(spark, docs):
    """After one redaction pass no pattern matches remain, so a second
    pass is the identity."""
    df = spark.createDataFrame([(i, d) for i, d in enumerate(docs)], ["id", "text"])
    once = df.select("id", redact_pii("text").alias("t"))
    counts = once.select(
        *[
            F.size(F.regexp_extract_all("t", F.lit(p), F.lit(0))).alias(k)
            for k, (p, _) in PII_PATTERNS.items()
        ]
    ).collect()
    assert all(r[k] == 0 for r in counts for k in PII_PATTERNS)
    twice = once.select("id", redact_pii(F.col("t")).alias("t"))
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


@given(docs=st.lists(st.lists(_word, min_size=1, max_size=15).map(" ".join), min_size=1, max_size=8))
@settings(**_SETTINGS)
def test_repetition_ratios_bounded_and_exact_on_distinct(spark, docs):
    df = spark.createDataFrame([(i, d) for i, d in enumerate(docs)], ["id", "text"])
    out = df.select(
        "id",
        "text",
        distinct_word_ratio(words("text")).alias("d1"),
        distinct_bigram_ratio(words("text")).alias("d2"),
    ).collect()
    for r in out:
        toks = r["text"].split()
        assert 0 < r["d1"] <= 1 and 0 < r["d2"] <= 1
        assert (r["d1"] == 1.0) == (len(set(toks)) == len(toks))


@given(
    offsets=st.lists(st.integers(min_value=0, max_value=72 * 3600), min_size=1, max_size=30)
)
@settings(**_SETTINGS)
def test_gap_fill_dense_axis_and_count_conservation(spark, offsets):
    t0 = dt.datetime(2024, 3, 1)
    rows = [(i, t0 + dt.timedelta(seconds=s)) for i, s in enumerate(offsets)]
    df = spark.createDataFrame(rows, ["id", "ts"])
    got = sorted(gap_filled_counts(df, ts_col="ts").collect(), key=lambda r: r["bucket"])
    assert sum(r["n_events"] for r in got) == len(offsets)
    # dense axis: consecutive hour buckets, min..max inclusive
    buckets = [r["bucket"] for r in got]
    assert all(
        (b2 - b1) == dt.timedelta(hours=1) for b1, b2 in zip(buckets, buckets[1:])
    )


@given(
    hist=st.lists(_word, min_size=0, max_size=10),
    batch=st.lists(_word, min_size=1, max_size=12),
)
@settings(**_SETTINGS)
def test_incremental_dedup_set_identity(spark, hist, batch):
    """kept texts == batch texts minus historical texts, one row each —
    and equals exact_dedup(batch) with historical contents filtered out."""
    hdf = spark.createDataFrame([(i, t) for i, t in enumerate(hist)], "id INT, text STRING")
    bdf = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(batch)], "id INT, text STRING"
    )
    kept = incremental_dedup(bdf, hdf, ["text"], "id").collect()
    assert sorted(r["text"] for r in kept) == sorted(set(batch) - set(hist))
    baseline = {
        r["text"]: r["id"]
        for r in exact_dedup(bdf, ["text"], "id").collect()
        if r["text"] not in set(hist)
    }
    assert {r["text"]: r["id"] for r in kept} == baseline


@given(
    docs=st.lists(
        st.lists(st.sampled_from("abc"), min_size=1, max_size=12).map(" ".join),
        min_size=1,
        max_size=6,
    )
)
@settings(**_SETTINGS)
def test_boilerplate_identity_when_threshold_above_corpus(spark, docs):
    """With max_doc_freq > n_docs nothing is boilerplate: clean_text must
    be the single-space rejoin of the original tokens, in order."""
    from proyecto_final_de_big_data_spark.operators.boilerplate import (
        remove_boilerplate,
    )

    df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
    out = {r["doc_id"]: r["clean_text"] for r in remove_boilerplate(
        df, seg_words=3, max_doc_freq=len(docs) + 1
    ).collect()}
    for i, d in enumerate(docs):
        assert out[i] == " ".join(d.split())


@given(
    weights=st.dictionaries(
        st.sampled_from(["a", "b", "c"]),
        st.floats(min_value=0.0, max_value=4.0, allow_nan=False),
        min_size=1,
        max_size=3,
    ),
    n=st.integers(min_value=1, max_value=40),
)
@settings(**_SETTINGS)
def test_epoch_upsample_copy_count_invariants(spark, weights, n):
    """Every surviving row has floor(w) or ceil(w) copies numbered 1..k,
    and rows of weight-1.0 (or absent) strata are exactly preserved."""
    from proyecto_final_de_big_data_spark.operators.mixing import epoch_upsample

    strata = ["a", "b", "c", "d"]  # 'd' is never in weights -> 1.0
    df = spark.createDataFrame(
        [(i, strata[i % 4]) for i in range(n)], "doc_id long, lang string"
    )
    out = epoch_upsample(df, "lang", "doc_id", alpha=None, weights=weights).collect()
    by_doc: dict[int, list[int]] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r["epoch"])
    import math

    for i in range(n):
        w = weights.get(strata[i % 4], 1.0)
        k = len(by_doc.get(i, []))
        lo, hi = math.floor(round(w * 1e6) / 1e6), math.ceil(round(w * 1e6) / 1e6)
        assert lo <= k <= hi, (i, w, k)
        if k:
            assert sorted(by_doc[i]) == list(range(1, k + 1))
        if strata[i % 4] == "d":
            assert k == 1  # absent stratum: untouched


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 25), st.integers(0, 25)).filter(lambda p: p[0] != p[1]),
        max_size=30,
    )
)
@settings(**_SETTINGS)
def test_cluster_safe_split_never_splits_a_component(spark, edges):
    """For ANY pair graph, two docs connected by any path land in the
    same split, and every doc appears exactly once."""
    from proyecto_final_de_big_data_spark.operators.split import cluster_safe_split

    docs = spark.createDataFrame([(i,) for i in range(26)], "doc_id long")
    pairs = spark.createDataFrame(edges or [], "id_a long, id_b long")
    out = cluster_safe_split(docs, pairs, "doc_id", {"train": 0.7, "eval": 0.3}).collect()
    splits = {r["doc_id"]: r["split"] for r in out}
    assert len(out) == 26 and set(splits) == set(range(26))

    # driver-side union-find as the reference component labeling
    parent = list(range(26))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    for a, b in edges:
        assert splits[a] == splits[b] or find(a) != find(b)
    for x in range(26):
        assert splits[x] == splits[find(x)]


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 50), st.text(alphabet="xyz ", max_size=8),
                  st.sampled_from(["g1", "g2"])),
        min_size=1,
        max_size=20,
    )
)
@settings(**_SETTINGS)
def test_release_manifest_permutation_invariant_checksum(spark, rows):
    """The manifest is a pure function of the row multiset per group:
    shuffling row order and partitioning never changes any column."""
    from proyecto_final_de_big_data_spark.operators.snapshot import release_manifest

    schema = "doc_id long, text string, grp string"
    a = spark.createDataFrame(rows, schema)
    b = spark.createDataFrame(list(reversed(rows)), schema).repartition(5)
    ka = sorted(map(tuple, release_manifest(a, "grp", "doc_id", ["text"]).collect()))
    kb = sorted(map(tuple, release_manifest(b, "grp", "doc_id", ["text"]).collect()))
    assert ka == kb


@given(
    rows=st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(0, 8)),
            st.one_of(st.none(), st.floats(-50, 150, allow_nan=False)),
        ),
        min_size=1,
        max_size=25,
    )
)
@settings(**_SETTINGS)
def test_expectations_counts_match_python_reference(spark, rows):
    """validate()'s counts equal a driver-side recomputation for any
    mix of NULLs, duplicates, and out-of-range values."""
    from proyecto_final_de_big_data_spark.operators.expectations import (
        in_range,
        not_null,
        unique,
        validate,
    )

    df = spark.createDataFrame(rows, "id long, v double")
    got = {
        r["check"]: r["n_violations"]
        for r in validate(
            df, [not_null("id"), unique("id"), in_range("v", 0.0, 100.0)]
        ).collect()
    }
    ids = [a for a, _ in rows]
    want_null = sum(1 for a in ids if a is None)
    # unique() ignores NULL keys (SQL count(DISTINCT) semantics): only
    # extra copies among NON-NULL ids are violations.
    non_null = [a for a in ids if a is not None]
    want_dups = len(non_null) - len(set(non_null))
    want_range = sum(1 for _, b in rows if b is not None and (b < 0.0 or b > 100.0))
    assert got["not_null(id)"] == want_null
    assert got["unique(id)"] == want_dups
    assert got["in_range(v,0.0,100.0)"] == want_range
