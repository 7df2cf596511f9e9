"""Declarative data-quality expectations over a frame.

The validation gate a lakehouse pipeline runs before publishing a
table: not-null, domain, range, format (regex), key-uniqueness, and
referential checks,
evaluated together and reported as one violations table — the engine's
generalization of the reference's ad-hoc validity filters
(``src/etl/clean.py``: hand-written predicates dropped rows silently;
an expectations report says WHICH contract failed and by how much, and
lets the caller decide drop vs fail vs quarantine).

Scale shape: every ROW-level rule (not_null / range / in_set /
matches_regex) compiles
to one ``sum(CASE...)`` aggregate, so all of them together cost a
single map-side-combined pass over the scan. ``unique`` adds a
``count(DISTINCT struct(...))`` in the SAME aggregation (Spark expands
the input once per distinct set — one extra replica, still one job).
``foreign_key`` rules are inherently joins: each runs one left-anti
probe against the referenced keys' distinct projection, broadcast when
the dimension is small. Nothing collects to the driver but the final
one-row-per-rule report.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """One expectation; ``kind`` drives evaluation, ``name`` labels the
    report row."""

    name: str
    kind: str  # not_null | range | in_set | regex | unique | foreign_key
    col: str | None = None
    cols: tuple[str, ...] = ()
    lo: float | None = None
    hi: float | None = None
    values: tuple = ()
    pattern: str | None = None
    ref: DataFrame | None = field(default=None, compare=False)
    ref_cols: tuple[str, ...] = ()


def not_null(col: str) -> Rule:
    return Rule(name=f"not_null({col})", kind="not_null", col=col)


def in_range(col: str, lo: float, hi: float) -> Rule:
    """Violated by non-NULL values outside [lo, hi] — NULLs are
    ``not_null``'s job, so the two rules compose without double-counting."""
    return Rule(name=f"in_range({col},{lo},{hi})", kind="range", col=col, lo=lo, hi=hi)


def in_set(col: str, values) -> Rule:
    # Parameters belong in the name: two in_set rules on one column with
    # different domains must not collide, and the report row must say
    # WHICH domain failed.
    vals = tuple(values)
    shown = ",".join(map(str, vals))
    return Rule(name=f"in_set({col},{{{shown}}})", kind="in_set", col=col, values=vals)


def matches_regex(col: str, pattern: str) -> Rule:
    """Violated by non-NULL values that do not FULLY match ``pattern``
    (anchored at both ends here — callers pass the bare pattern).
    Keep patterns inside the Java-regex ∩ RE2 subset (the
    ``operators/pii.py`` stance) so a DuckDB ``regexp_full_match`` twin
    replays them verbatim."""
    return Rule(
        name=f"matches_regex({col},{pattern})", kind="regex", col=col, pattern=pattern
    )


def unique(*cols: str) -> Rule:
    """Violated by extra copies among rows whose key columns are all
    non-NULL. NULL keys are not uniqueness violations (matching SQL
    ``count(DISTINCT)`` semantics and the ``in_range`` stance) — pair
    with :func:`not_null` to forbid them."""
    return Rule(name=f"unique({','.join(cols)})", kind="unique", cols=tuple(cols))


def foreign_key(cols, ref: DataFrame, ref_cols) -> Rule:
    cols = (cols,) if isinstance(cols, str) else tuple(cols)
    ref_cols = (ref_cols,) if isinstance(ref_cols, str) else tuple(ref_cols)
    if len(cols) != len(ref_cols):
        raise ValueError("foreign_key needs matching column counts")
    return Rule(
        name=f"foreign_key({','.join(cols)}->{','.join(ref_cols)})",
        kind="foreign_key",
        cols=cols,
        ref=ref,
        ref_cols=ref_cols,
    )


def _violation(rule: Rule):
    c = F.col(rule.col)
    if rule.kind == "not_null":
        return c.isNull()
    if rule.kind == "range":
        return c.isNotNull() & ((c < F.lit(rule.lo)) | (c > F.lit(rule.hi)))
    if rule.kind == "in_set":
        return c.isNotNull() & ~c.isin(list(rule.values))
    if rule.kind == "regex":
        return c.isNotNull() & ~c.rlike(f"^(?:{rule.pattern})$")
    raise AssertionError(rule.kind)


def validate(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """``(check, n_violations, passed)`` — one row per rule.

    Row-level rules and uniqueness evaluate in ONE aggregation (its
    single answer row exploded into one report row per rule); each
    foreign-key rule unions in one anti-join count frame. Report rows
    come back in the CALLER'S ``rules`` order (each part carries its
    rule's index and the union is ordered by it — answer-scale, so the
    sort is free; r12, restoring the pre-r11 literal frame's order
    contract for the persisted ``_quality`` artifact when fk rules
    interleave with row-level rules). The whole
    report is ONE lazy plan — LAZINESS IS AN API CHANGE vs pre-r11,
    which returned an eagerly-collected literal frame: the pre-r11
    version collected the aggregate and each fk count as serialized
    driver round trips during CONSTRUCTION and rehydrated the result;
    the branches now run concurrently inside the caller's single
    action, with values and types identical (counts coalesce to the
    same 0s the old ``int(row or 0)`` produced). The report is tiny
    (one row per rule), so a caller that needs it twice (gate a write
    + persist the report) must ``collect()`` once and reuse the rows —
    the pipelines/release.py pattern; the old write-then-collect
    pattern now re-runs the corpus aggregation twice.
    """
    if not rules:
        raise ValueError("no rules to validate")
    names = [r.name for r in rules]
    if len(set(names)) != len(names):
        raise ValueError("duplicate rule names")

    aggs, agg_rules = [], []
    fk_rules = []
    for pos, r in enumerate(rules):
        if r.kind == "foreign_key":
            fk_rules.append((pos, r))
        elif r.kind == "unique":
            # NULL-keyed rows are excluded from BOTH counts so they are
            # never violations here (count_distinct skips NULL inputs;
            # the keyed struct is nulled when any key col is) — matching
            # SQL count(col)-count(DISTINCT col) for the one-column case.
            all_non_null = None
            for c in r.cols:
                nn = F.col(c).isNotNull()
                all_non_null = nn if all_non_null is None else (all_non_null & nn)
            keyed = F.when(all_non_null, F.struct(*[F.col(c) for c in r.cols]))
            aggs.append(
                (F.sum(all_non_null.cast("long")) - F.count_distinct(keyed)).alias(
                    f"__v_{len(aggs)}"
                )
            )
            agg_rules.append((pos, r))
        else:
            aggs.append(F.sum(_violation(r).cast("long")).alias(f"__v_{len(aggs)}"))
            agg_rules.append((pos, r))

    parts: list[DataFrame] = []
    if aggs:
        # One answer row carrying every agg-rule count, exploded into
        # one (check, n_violations) row per rule. coalesce(…, 0) covers
        # the empty-frame NULL sums exactly as the old int(row or 0).
        parts.append(
            df.agg(*aggs)
            .select(
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(pos).alias("idx"),
                                F.lit(r.name).alias("check"),
                                F.coalesce(F.col(f"__v_{i}"), F.lit(0))
                                .cast("long")
                                .alias("n_violations"),
                            )
                            for i, (pos, r) in enumerate(agg_rules)
                        ]
                    )
                ).alias("__s")
            )
            .select(
                F.col("__s.idx").alias("__idx"),
                F.col("__s.check").alias("check"),
                F.col("__s.n_violations").alias("n_violations"),
            )
        )
    for pos, r in fk_rules:
        ref_keys = r.ref.select(
            *[F.col(rc).alias(c) for c, rc in zip(r.cols, r.ref_cols)]
        ).dropDuplicates()
        # NULL fk values never match an equi-join and would all count as
        # orphans; referential integrity is about NON-NULL dangling keys
        # (null-ness is not_null's contract), so they're excluded here.
        probe = df.select(*r.cols).na.drop(subset=list(r.cols))
        parts.append(
            probe.join(ref_keys, list(r.cols), "left_anti")
            .agg(F.count(F.lit(1)).alias("n_violations"))
            .select(
                F.lit(pos).alias("__idx"),
                F.lit(r.name).alias("check"),
                "n_violations",
            )
        )

    report = parts[0]
    for p in parts[1:]:
        report = report.unionByName(p)
    # Caller-order contract: the union emits agg rows first and fk rows
    # last; the per-rule index restores the ``rules`` order. The report
    # is answer-scale (one row per rule), so the sort costs nothing.
    return report.orderBy("__idx").select(
        "check",
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    )
