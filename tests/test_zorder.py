"""Z-order layout (operators/zorder.py): Morton key correctness and
ACTUAL file-skipping effectiveness measured from parquet footers."""

from __future__ import annotations

import os
import shutil
import tempfile

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from proyecto_final_de_big_data_spark.operators.zorder import (
    minmax_bucketize,
    morton_key,
    zorder_layout,
)


def test_morton_interleave_known_values(spark):
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (1, 1), (3, 5)], "x long, y long"
    )
    out = df.select("x", "y", morton_key(["x", "y"], bits=4))
    got = {(r["x"], r["y"]): r["zkey"] for r in out.collect()}
    # bit i of x -> position 2i; bit i of y -> position 2i+1
    assert got[(0, 0)] == 0
    assert got[(1, 0)] == 1
    assert got[(0, 1)] == 2
    assert got[(1, 1)] == 3
    # x=3 (011), y=5 (101): z = y2 x2 y1 x1 y0 x0 = 1 0 0 1 1 1 = 39
    assert got[(3, 5)] == 0b100111


def test_bucketize_bounds_and_range(spark):
    df = spark.range(0, 101).select(F.col("id").cast("double").alias("v"))
    out, bounds = minmax_bucketize(df, ["v"], bits=8)
    assert bounds["v"] == (0.0, 100.0)
    stats = out.agg(F.min("__zb_v"), F.max("__zb_v")).collect()[0]
    assert (stats[0], stats[1]) == (0, 255)


def test_constant_column_buckets_to_zero(spark):
    df = spark.range(0, 10).select(F.lit(7.0).alias("v"))
    out, _ = minmax_bucketize(df, ["v"], bits=8)
    assert out.agg(F.max("__zb_v")).collect()[0][0] == 0


def _file_widths(path, col_index):
    """Per-file (max - min) width of a column from parquet footers."""
    widths = []
    for root, _dirs, files in os.walk(path):
        for name in files:
            if not name.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(root, name)).metadata
            lo = min(
                md.row_group(g).column(col_index).statistics.min
                for g in range(md.num_row_groups)
            )
            hi = max(
                md.row_group(g).column(col_index).statistics.max
                for g in range(md.num_row_groups)
            )
            widths.append(hi - lo)
    return widths


def test_zorder_tightens_both_dimensions(spark):
    """The point of the layout: per-file min/max width must shrink on
    BOTH dimensions vs a layout sorted by only the first column (where
    the second column's stats are useless for skipping)."""
    n = 20_000
    df = (
        spark.range(0, n)
        .select(
            (F.col("id") % 141).cast("double").alias("x"),
            ((F.col("id") * 7919) % 141).cast("double").alias("y"),
        )
    )
    base = tempfile.mkdtemp(prefix="zorder_test_")
    z_path, s_path = os.path.join(base, "z"), os.path.join(base, "single")
    try:
        zorder_layout(df, ["x", "y"], bits=8, n_files=8).drop("zkey").write.parquet(z_path)
        df.repartitionByRange(8, "x").sortWithinPartitions("x").write.parquet(s_path)

        # x stays prunable either way; y only under z-order.
        z_y = sum(_file_widths(z_path, 1)) / len(_file_widths(z_path, 1))
        s_y = sum(_file_widths(s_path, 1)) / len(_file_widths(s_path, 1))
        assert z_y < 0.75 * s_y, (z_y, s_y)

        z_x = sum(_file_widths(z_path, 0)) / len(_file_widths(z_path, 0))
        full_x = 140.0
        assert z_x < 0.75 * full_x, z_x
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_layout_preserves_rows(spark):
    df = spark.range(0, 1000).select(
        (F.col("id") % 37).cast("double").alias("x"),
        (F.col("id") % 11).cast("double").alias("y"),
    )
    out = zorder_layout(df, ["x", "y"], bits=6, n_files=4)
    assert out.count() == 1000
    assert out.filter(F.col("zkey").isNull()).count() == 0
