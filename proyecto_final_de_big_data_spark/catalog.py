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
        # events.parquet may carry TIMESTAMP(NANOS) or TIMESTAMP(MICROS)
        # depending on fixture vintage; a vanilla SparkSession (e.g. an
        # external verification harness) rejects NANOS with
        # PARQUET_TYPE_ILLEGAL unless nanosAsLong is on (harmless for
        # MICROS). It is a runtime-settable SQL conf, so set it here
        # rather than relying on the session factory having been used.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # hour()/dayofweek() over ts are session-timezone-dependent; the
        # oracle (DuckDB over naive timestamps) is timezone-free. Pin UTC
        # at runtime so results don't depend on the host machine's TZ.
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # TIMESTAMP(NANOS) read as long (nanosAsLong — MICROS fixtures
        # arrive as timestamp and skip this branch); truncate to µs —
        # integer div (not /) to avoid double-precision loss on int64,
        # matching DuckDB's ns→µs truncation.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def read_months(
    spark: SparkSession,
    root: str,
    year: int | str,
    months: list[str],
    skip_missing: bool = False,
    logger=None,
) -> DataFrame | None:
    """Union of per-month partition reads with catch-and-continue
    (reference C4, ``scripts/02_spark_etl.py:80-86``): a missing month is
    a warn-and-skip when ``skip_missing``, an error otherwise. Returns
    None when every month was skipped.

    At scale, prefer ``spark.read.parquet(root).where(...)`` (partition
    pruning, one scan node) — this per-month loop exists for the
    reference's explicit present/absent semantics, which a root read
    cannot distinguish from an empty partition.
    """
    from pyspark.errors.exceptions.captured import AnalysisException

    from .utils.logging import get_logger

    log = logger or get_logger("lake")
    out: DataFrame | None = None
    for month in months:
        path = f"{root}/year={year}/month={month}"
        try:
            df = spark.read.parquet(path)
        except AnalysisException as err:
            if skip_missing:
                log.warning("skipping missing partition %s: %s", path, err)
                continue
            raise
        # Partition-dir addressing strips the partition columns; restore
        # them so downstream sees the same schema as a root read.
        df = df.withColumn("year", F.lit(str(year))).withColumn("month", F.lit(str(month)))
        out = df if out is None else out.unionByName(df, allowMissingColumns=True)
    return out


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so queries can use spark.sql."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
