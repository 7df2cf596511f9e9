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


def test_uncast_decimal_literals_in_lambdas() -> None:
    """Every numeric literal inside a reduce/transform lambda must be
    ::DOUBLE-cast (decimal lambda poisoning). Heuristic: a `-> ` lambda
    body line containing a bare `0.N *` multiply without a cast."""
    pat = re.compile(r"->[^\n]*\b\d+\.\d+\s*\*")
    cast = re.compile(r"(\d+\.\d+::DOUBLE|CAST\(\s*\d+\.\d+\s+AS\s+DOUBLE\))")
    offenders = []
    for k, sql in ORACLES.items():
        for line in sql.splitlines():
            m = pat.search(line)
            if m and not cast.search(line):
                offenders.append((k, line.strip()[:80]))
    assert not offenders, f"uncast decimal literal in lambda: {offenders}"


@pytest.mark.parametrize("name", ["holt_winters_contract"])
def test_fold_oracles_stay_flat(name: str) -> None:
    """The restated HW oracle must keep the flat grow-state shape: one
    list_reduce, append-only `s || [`, len(s)-offset reads."""
    sql = ORACLES[name]
    assert sql.count("list_reduce") == 2  # the mu seed-sum fold + the state fold
    assert "s || [" in sql
    assert "len(s) - 18" in sql
    assert "s[3:8]" not in sql
