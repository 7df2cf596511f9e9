"""t2-style correctness: every registered query with an oracle must
hash-match DuckDB on the same parquet (run at sf0.001 for speed; the
driver reruns at sf0.01)."""

from __future__ import annotations

import pytest

from proyecto_final_de_big_data_spark.oracle import compare, run_oracle
from proyecto_final_de_big_data_spark.queries import QUERIES

WITH_ORACLE = sorted(name for name, q in QUERIES.items() if q.oracle is not None)
ROWS_ONLY = sorted(name for name, q in QUERIES.items() if q.oracle is None)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(spark, sf_dir, name):
    q = QUERIES[name]
    spark_df = q.spark_fn(spark, sf_dir)
    oracle_df = run_oracle(q.oracle, sf_dir)
    ok, msg = compare(spark_df, oracle_df)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, sf_dir, name):
    q = QUERIES[name]
    df = q.spark_fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
