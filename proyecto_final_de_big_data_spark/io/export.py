"""Export operators (reference S8–S10,
``scripts/03_spark_eda_agg.py:220-240``, ``scripts/06_export_for_dashboard.py:111-187``):
multi-format mart export parameterized by format.

``single_file=True`` reproduces the reference's ``coalesce(1)``
CSV-with-header contract — allowed only for post-aggregation marts
(tiny); data-path exports always stay partitioned (100-TB rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def export_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    single_file: bool = False,
    mode: str = "overwrite",
    partition_by: tuple[str, ...] = (),
) -> None:
    if single_file:
        df = df.coalesce(1)
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "parquet":
        writer.parquet(path)
    elif fmt == "orc":
        writer.orc(path)
    elif fmt == "csv":
        writer.option("header", "true").csv(path)
    elif fmt == "json":
        writer.json(path)
    else:
        raise ValueError(f"unsupported export format: {fmt!r}")


def read_exported(spark: SparkSession, path: str, fmt: str) -> DataFrame:
    """Round-trip reader (reference S6/S11): header CSV / JSON / parquet / ORC."""
    if fmt == "parquet":
        return spark.read.parquet(path)
    if fmt == "orc":
        return spark.read.orc(path)
    if fmt == "csv":
        return spark.read.option("header", "true").option("inferSchema", "true").csv(path)
    if fmt == "json":
        return spark.read.json(path)
    raise ValueError(f"unsupported format: {fmt!r}")
