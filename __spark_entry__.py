"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (TPC-H-Q1-style pricing
summary) at sf0.001. ``queries()`` / ``oracle_sql()`` expose the full
registered catalog (proyecto_final_de_big_data_spark.queries) — one
entry per implemented operator from SURVEY.md §2, each with a DuckDB
oracle when SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from proyecto_final_de_big_data_spark.queries import QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["pricing_summary"].spark_fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.spark_fn for name, q in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted for non-SQL-expressible ops)."""
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle is not None}
