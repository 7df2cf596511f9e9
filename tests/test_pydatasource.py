"""Python Data Source API: synthetic_corpus (io/pydatasource.py).

The pushdown/planning logic is pure Python, so partition pruning is
pinned WITHOUT Spark; the Spark tests cover registration, schema, full
reads, pruned reads, and retry-determinism.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    EqualTo,
    GreaterThanOrEqual,
    In,
    IsNotNull,
    LessThan,
)

from proyecto_final_de_big_data_spark.io.pydatasource import (
    SyntheticCorpusReader,
    load_synthetic_corpus,
    register_synthetic_corpus,
)


def _reader(**opts):
    defaults = {"shards": "4", "rows_per_shard": "10", "seed": "0"}
    defaults.update({k: str(v) for k, v in opts.items()})
    return SyntheticCorpusReader(defaults)


def _planned(reader):
    return sorted(p.value for p in reader.partitions())


# -- pure-Python pushdown/planning ------------------------------------


def test_no_filters_plans_all_shards():
    assert _planned(_reader()) == [0, 1, 2, 3]


def test_equal_to_prunes_to_one_partition():
    r = _reader()
    rest = list(r.pushFilters([EqualTo(("shard",), 2)]))
    assert rest == []
    assert _planned(r) == [2]


def test_in_and_range_filters_compose():
    r = _reader()
    rest = list(
        r.pushFilters([In(("shard",), (0, 1, 3)), GreaterThanOrEqual(("shard",), 1)])
    )
    assert rest == []
    assert _planned(r) == [1, 3]


def test_contradictory_filters_prune_everything():
    r = _reader()
    r.pushFilters([EqualTo(("shard",), 1), LessThan(("shard",), 1)])
    assert _planned(r) == []


def test_non_shard_filters_returned_to_spark():
    r = _reader()
    unsupported = list(
        r.pushFilters([EqualTo(("lang",), "en"), IsNotNull(("shard",)), EqualTo(("shard",), 3)])
    )
    # lang equality and IsNotNull go back to Spark; shard equality is consumed
    assert len(unsupported) == 2
    assert _planned(r) == [3]


def test_read_is_deterministic_and_disjoint_across_partitions():
    r = _reader(rows_per_shard=25)
    seen = set()
    for p in r.partitions():
        rows = list(r.read(p))
        assert rows == list(r.read(p))  # retry reproduces exactly
        ids = {row[0] for row in rows}
        assert len(ids) == 25
        assert not ids & seen
        seen |= ids
    assert seen == set(range(100))


# -- Spark integration -------------------------------------------------


def test_spark_read_full_and_pruned(spark):
    register_synthetic_corpus(spark)
    corpus = (
        spark.read.format("synthetic_corpus")
        .option("shards", 4)
        .option("rows_per_shard", 500)
        .option("seed", 7)
        .load()
    )
    assert corpus.columns == ["doc_id", "shard", "lang", "n_tokens", "score_milli"]
    assert corpus.count() == 2000
    pruned = corpus.filter(F.col("shard") == 2)
    assert pruned.count() == 500
    assert pruned.agg(F.min("doc_id"), F.max("doc_id")).collect()[0][0:2] == (
        1000,
        1499,
    )


def test_spark_read_same_rows_regardless_of_options_order(spark):
    register_synthetic_corpus(spark)

    def digest(df):
        # Sum the 64-bit hashes in decimal(38,0): a plain long sum of
        # xxhash64 values overflows under Spark 4's ANSI default (same
        # idiom as operators/graph.py:_checksum).
        return df.agg(
            F.sum(
                F.xxhash64("doc_id", "lang", "n_tokens", "score_milli").cast(
                    "decimal(38,0)"
                )
            ).alias("d")
        ).collect()[0]["d"]

    a = (
        spark.read.format("synthetic_corpus")
        .options(shards=4, rows_per_shard=250, seed=3)
        .load()
    )
    b = (
        spark.read.format("synthetic_corpus")
        .options(seed=3, rows_per_shard=250, shards=4)
        .load()
    )
    assert digest(a) == digest(b)

def test_mixed_filtered_and_full_branches_in_one_plan(spark):
    """Regression for the r5 pushed-filter sharing bug: a full-read
    branch and a shard-pruned branch in ONE plan must not share a
    pruned scan. Spark plans a Python data source relation once and
    reuses the planned scan for every reference to the same .load()
    DataFrame, so the correct pattern (encoded in
    load_synthetic_corpus) is a fresh relation per branch — this test
    pins that the pattern yields the right answer with both branches
    collected by a single action."""
    full_rel = load_synthetic_corpus(spark, shards=4, rows_per_shard=500, seed=7)
    pruned_rel = load_synthetic_corpus(spark, shards=4, rows_per_shard=500, seed=7)
    full = full_rel.agg(
        F.count(F.lit(1)).alias("n"), F.sum("doc_id").alias("s")
    )
    pruned = pruned_rel.filter(F.col("shard").isin(1, 3)).agg(
        F.count(F.lit(1)).alias("pn"), F.sum("doc_id").alias("ps")
    )
    row = full.crossJoin(F.broadcast(pruned)).collect()[0]
    assert (row.n, row.s) == (2000, 1999000)
    assert (row.pn, row.ps) == (1000, 1249500)
