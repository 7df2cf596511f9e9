"""Declarative query catalog.

Each query is registered with a Spark callable ``(spark, sf_dir) ->
DataFrame`` and (when SQL-expressible) an ANSI-SQL oracle string that
DuckDB can run over the same parquet tables. The driver's t2 gate
compares both sides (row count + schema + order-insensitive value hash),
so every computed column is aliased identically in both.
"""

from __future__ import annotations

from .registry import QUERIES, Query, register  # noqa: F401

# Importing the modules populates the registry.
from . import marts  # noqa: E402,F401
from . import analytics  # noqa: E402,F401
from . import relational  # noqa: E402,F401
from . import llm_pipeline  # noqa: E402,F401
from . import streaming_batch  # noqa: E402,F401
from . import ml_queries  # noqa: E402,F401
from . import contracts  # noqa: E402,F401
