"""Regression grep enforcing ORACLE_PORTABILITY.md over every registered
oracle — the r10 lesson (`holt_winters_contract` driver hash-red on
DuckDB-build-fragile ring-state machinery that was hash-exact locally)
generalized: the banned constructs below may pass the local DuckDB 1.0.0
and still diverge on the driver's build, so they must never re-enter a
registered oracle. Pure-source checks, no Spark session."""

from __future__ import annotations

import re

import pytest

import __spark_entry__ as entry

def _strip_comments(sql: str) -> str:
    return "\n".join(line.split("--", 1)[0] for line in sql.splitlines())


ORACLES = {k: _strip_comments(v) for k, v in entry.oracle_sql().items()}

# holt_forecast_contract indexes a list_transform-BUILT list-of-lists
# (sts[i][1]); driver-green since r10 and explicitly allowed by
# ORACLE_PORTABILITY.md (the nested structure never passes through
# reduce-lambda type unification).
ALLOWED_NESTED_INDEX = {"holt_forecast_contract"}


def test_no_accumulator_slicing_in_lambdas() -> None:
    """`(s, e) -> ... s[a:b]` ring shifts are banned (r10 failure #1)."""
    pat = re.compile(r"\bs\[\d+\s*:\s*\d+\]")
    offenders = [k for k, sql in ORACLES.items() if pat.search(sql)]
    assert not offenders, f"accumulator slicing in oracle(s): {offenders}"


def test_no_list_of_list_seeding() -> None:
    """`[[seed]] || list_transform(...)` fold seeds are banned (r10 #2)."""
    offenders = [k for k, sql in ORACLES.items() if "[[" in sql]
    assert not offenders, f"list-of-list literal in oracle(s): {offenders}"


def test_no_nested_indexing_outside_allowlist() -> None:
    """`...][j]` nested list indexing only where driver-proven (r10 #3)."""
    pat = re.compile(r"\]\[")
    offenders = [
        k
        for k, sql in ORACLES.items()
        if pat.search(sql) and k not in ALLOWED_NESTED_INDEX
    ]
    assert not offenders, f"nested list indexing in oracle(s): {offenders}"


def test_no_struct_accumulators_in_folds() -> None:
    """struct_pack + list_reduce in one oracle is the v1.0 sequential
    field-rebinding trap (pinned in tests/test_holt.py)."""
    offenders = [
        k
        for k, sql in ORACLES.items()
        if "list_reduce" in sql and "struct_pack" in sql
    ]
    assert not offenders, f"struct accumulator risk in oracle(s): {offenders}"


def _lambda_bodies(sql: str) -> list[str]:
    """Every `-> <body>` region of the SQL, where the body runs until
    the parenthesis depth drops below the arrow's depth (i.e. the
    wrapping list_reduce/list_transform/list_filter call closes) or a
    top-level argument comma at that depth ends it. Multi-line bodies
    are captured whole — the r11 review found the old single-line grep
    never scanned the holt_winters fold's continuation lines."""
    bodies = []
    i = 0
    while True:
        j = sql.find("->", i)
        if j < 0:
            break
        depth = 0
        body = []
        for ch in sql[j + 2 :]:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth < 0:
                    break
            body.append(ch)
        bodies.append("".join(body))
        i = j + 2
    return bodies


def test_uncast_decimal_literals_in_lambdas() -> None:
    """Every decimal literal inside a reduce/transform lambda must be
    ::DOUBLE-cast or CAST(... AS DOUBLE)-wrapped (decimal lambda
    poisoning — DuckDB evaluates bare `0.3 * x` in truncating DECIMAL
    math inside lambdas). Scans FULL lambda bodies, not single lines."""
    lit = re.compile(r"(CAST\(\s*)?(\d+\.\d+)(::DOUBLE)?")
    offenders = []
    for k, sql in ORACLES.items():
        for body in _lambda_bodies(sql):
            for m in lit.finditer(body):
                if m.group(3):  # 0.3::DOUBLE
                    continue
                if m.group(1) and re.match(
                    r"\s*AS\s+DOUBLE", body[m.end(2) :]
                ):  # CAST(0.3 AS DOUBLE)
                    continue
                offenders.append((k, m.group(2), body.strip()[:60]))
    assert not offenders, f"uncast decimal literal in lambda: {offenders}"


@pytest.mark.parametrize("name", ["holt_winters_contract"])
def test_holt_winters_oracle_is_lambda_free(name: str) -> None:
    """The r12 HW restatement must stay LAMBDA-FREE: both list_reduce
    restatements (r10 ring-state, r11 flat grow-state) hash-diverged
    on the driver's DuckDB build while hash-exact on local 1.0.0 —
    every known divergence lives in reduce-lambda semantics, so the
    recursion is replayed as a recursive CTE over scalar DOUBLE
    columns instead (r11 verdict item 1)."""
    sql = ORACLES[name]
    assert "list_reduce" not in sql
    assert "list_transform" not in sql
    assert "->" not in sql  # no lambdas of any kind
    assert "WITH RECURSIVE" in sql
    assert "UNION ALL" in sql
