"""Sequential-pattern mining over per-key ordered event sequences —
"users who do A tend to do B later", the ORDER-aware upgrade of
:mod:`.itemsets`' co-occurrence mining, backed by MLlib's PrefixSpan
(Pei et al., ICDE 2001 — public literature).

Support semantics: a pattern ``a -> b`` is supported by a sequence iff
items a and b appear at positions i < j (subsequence containment, each
event usable once per pattern position); ``freq`` counts SEQUENCES,
not occurrences — one user matching five times counts once.

Scale shape (100 TB): sequences build with ONE groupBy per key
(array_sort on (order, item) structs — the :mod:`.sessionize`
bounded-series discipline; ``max_seq_len`` truncates runaway keys to
a prefix instead of feeding PrefixSpan unbounded projections, and the
truncation is part of the operator contract, not a silent cap).
PrefixSpan itself distributes by prefix-projected databases
(``maxLocalProjDBSize`` guards per-executor projections); minCount =
ceil(min_support * n_sequences) — exact counts, no sampling, so a
brute-force SQL enumeration of short patterns restates the output
verbatim.

Extension surface — the reference has no sequence-mining stage;
extension per SURVEY §8 next to the Markov transition matrix and
funnel gates (transition = ADJACENT steps; funnel = ONE fixed
pattern; this mines ALL frequent patterns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sequence_frames(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    item_col: str,
    max_seq_len: int | None = None,
) -> DataFrame:
    """``(key, sequence array<array<string>>)`` — each key's items in
    (order_cols) order, wrapped as single-item itemsets (PrefixSpan's
    input shape). ``max_seq_len`` keeps only each sequence's PREFIX —
    a documented truncation, deterministic because the sort key
    includes every order column the caller supplies (supply a
    tie-breaker column for non-unique timestamps)."""
    if not order_cols:
        raise ValueError("sequence_frames needs at least one order column")
    # NULL items are excluded up front: array_join would render a NULL
    # element as the empty string inside a pattern key ('a -> ' and
    # '' colliding with genuine patterns), and no subsequence-
    # containment oracle can restate that. A NULL event carries no
    # sequence information.
    ordered = (
        df.filter(F.col(item_col).isNotNull())
        .groupBy(F.col(key_col).alias("key"))
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        *[F.col(c).alias(f"o{i}") for i, c in enumerate(order_cols)],
                        F.col(item_col).cast("string").alias("it"),
                    )
                )
            ).alias("__seq")
        )
    )
    items = F.transform(F.col("__seq"), lambda s: s["it"])
    if max_seq_len is not None:
        if max_seq_len < 1:
            raise ValueError(f"max_seq_len must be >= 1, got {max_seq_len}")
        items = F.slice(items, 1, max_seq_len)
    return ordered.select(
        "key", F.transform(items, lambda it: F.array(it)).alias("sequence")
    )


def sequential_patterns(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    item_col: str,
    min_support: float,
    max_pattern_length: int = 2,
    max_seq_len: int | None = None,
    decimals: int = 6,
) -> DataFrame:
    """All sequential patterns with support >= ``min_support``:
    ``(pattern, size, freq, support)`` — ``pattern`` joins the items
    with ' -> ' (input itemsets are single items, so every mined
    itemset is too), ``freq`` the exact sequence count, ``support =
    freq / n_sequences`` rounded to ``decimals``."""
    if not (0.0 < min_support <= 1.0):
        raise ValueError(f"min_support must be in (0, 1], got {min_support}")
    if max_pattern_length < 1:
        raise ValueError(
            f"max_pattern_length must be >= 1, got {max_pattern_length}"
        )
    from pyspark.ml.fpm import PrefixSpan

    seqs = sequence_frames(df, key_col, order_cols, item_col, max_seq_len)
    ns = seqs.agg(F.count(F.lit(1)).cast("double").alias("__ns"))
    found = PrefixSpan(
        minSupport=min_support,
        maxPatternLength=max_pattern_length,
        sequenceCol="sequence",
    ).findFrequentSequentialPatterns(seqs)
    return (
        found.crossJoin(F.broadcast(ns))
        .select(
            F.array_join(
                F.transform(F.col("sequence"), lambda s: F.element_at(s, 1)),
                " -> ",
            ).alias("pattern"),
            F.size("sequence").alias("size"),
            F.col("freq"),
            F.round(F.col("freq") / F.col("__ns"), decimals).alias("support"),
        )
    )
