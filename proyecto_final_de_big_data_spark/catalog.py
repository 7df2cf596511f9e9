"""Table catalog over the synthetic star-schema lake.

The reference addresses its lake by constructing partition paths by hand
(``scripts/02_spark_etl.py:75-77``), which hides partition columns from
the engine. Here every table is read from its root and predicates are
left to Catalyst (partition pruning / filter pushdown), the idiomatic
equivalent at 100 TB.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if name == "events":
        # events.parquet carries TIMESTAMP(NANOS); a vanilla SparkSession
        # (e.g. an external verification harness) rejects it with
        # PARQUET_TYPE_ILLEGAL unless nanosAsLong is on. It is a
        # runtime-settable SQL conf, so set it here rather than relying on
        # the session factory having been used.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # TIMESTAMP(NANOS) read as long (nanosAsLong); truncate to µs —
        # integer div (not /) to avoid double-precision loss on int64,
        # matching DuckDB's ns→µs truncation.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so queries can use spark.sql."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
