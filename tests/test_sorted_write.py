"""Sorted writes (io/sorted_write.py): the row-group statistics the
layout exists to produce are asserted directly from the parquet
footers."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest

from proyecto_final_de_big_data_spark.io.sorted_write import write_sorted


def _row_group_ranges(root: str, col: str) -> list[tuple[int, int]]:
    ranges = []
    for f in glob.glob(f"{root}/*.parquet"):
        meta = pq.ParquetFile(f).metadata
        idx = meta.schema.names.index(col)
        for g in range(meta.num_row_groups):
            stats = meta.row_group(g).column(idx).statistics
            ranges.append((stats.min, stats.max))
    return ranges


def test_write_sorted_produces_narrow_disjoint_row_groups(spark, tmp_path):
    # Keys arrive maximally interleaved (reversed bit-ish order); an
    # arrival-order write would give every row group the full span.
    df = spark.range(40_000).selectExpr("(id * 7919) % 40000 AS k", "id AS payload")
    plain, sorted_root = str(tmp_path / "plain"), str(tmp_path / "sorted")
    df.coalesce(4).write.parquet(plain)
    write_sorted(df, sorted_root, "k", n_files=4)

    full_span = 40_000 - 1
    plain_spans = [hi - lo for lo, hi in _row_group_ranges(plain, "k")]
    sorted_ranges = sorted(_row_group_ranges(sorted_root, "k"))
    sorted_spans = [hi - lo for lo, hi in sorted_ranges]
    # arrival order: every group spans ~everything; sorted: narrow slices
    assert min(plain_spans) > full_span * 0.9
    assert max(sorted_spans) < full_span * 0.5
    assert sum(sorted_spans) <= full_span  # disjoint (no overlap between groups)
    for (_, hi_prev), (lo_next, _) in zip(sorted_ranges, sorted_ranges[1:]):
        assert lo_next > hi_prev

    # content survives the layout rewrite
    back = spark.read.parquet(sorted_root)
    assert back.count() == 40_000
    assert back.agg({"payload": "sum"}).collect()[0][0] == sum(range(40_000))


def test_write_sorted_validates_and_defaults(spark, tmp_path):
    df = spark.range(100).selectExpr("id AS k")
    with pytest.raises(ValueError, match="sort_cols"):
        write_sorted(df, str(tmp_path / "x"), [])
    root = str(tmp_path / "default_parts")
    write_sorted(df, root, ["k"])  # shuffle.partitions decides file count
    assert spark.read.parquet(root).count() == 100
