"""Temporal / derived-feature operators (SURVEY §2.9 F1–F3; reference
``src/etl/features.py:3-16``): duration-minutes between two timestamps,
hour / day-of-week extraction (Spark convention 1=Sunday), weekend flag,
and string partition columns.

All built-in column expressions — whole-stage-codegen'd, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_duration_minutes(df: DataFrame, start: str, end: str, out: str = "duration_min") -> DataFrame:
    """(unix(end) - unix(start)) / 60.0 as double."""
    return df.withColumn(out, (F.unix_timestamp(end) - F.unix_timestamp(start)) / F.lit(60.0))


def with_temporal_features(
    df: DataFrame, ts: str, hour_col: str = "event_hour", dow_col: str = "event_dow", weekend_col: str = "is_weekend"
) -> DataFrame:
    """hour ∈ 0–23, dow ∈ 1–7 (1=Sunday), is_weekend ∈ {0,1} (dow ∈ {1,7})."""
    df = df.withColumn(hour_col, F.hour(ts))
    df = df.withColumn(dow_col, F.dayofweek(ts))
    return df.withColumn(weekend_col, F.col(dow_col).isin(1, 7).cast("int"))


def with_partition_columns(df: DataFrame, ts: str, year_col: str = "year", month_col: str = "month") -> DataFrame:
    """String year / zero-padded month partition columns (reference contract)."""
    df = df.withColumn(year_col, F.year(ts).cast("string"))
    return df.withColumn(month_col, F.lpad(F.month(ts).cast("string"), 2, "0"))
