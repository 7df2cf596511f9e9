"""Query registry: name -> (spark callable, optional DuckDB oracle SQL)."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    spark_fn: SparkQuery
    oracle: str | None
    description: str


QUERIES: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, description: str = ""):
    """Decorator: register a query under ``name`` with its oracle SQL."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = Query(name=name, spark_fn=fn, oracle=oracle, description=description or (fn.__doc__ or "").strip())
        return fn

    return deco
