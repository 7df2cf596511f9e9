"""Blocklist content filtering for corpus curation.

The standard safety/quality stage between PII redaction and dedup:
drop (or just flag) documents matching a term blocklist — NSFW lists,
spam markers, boilerplate phrases, license strings. The C4 pipeline's
"bad words" filter is the canonical instance.

Spark-first shape: the whole term list compiles into ONE alternation
regex evaluated by a single JVM-side ``rlike`` projection — fully
codegen'd, no UDF, no join, scales as a pure scan filter no matter how
many terms (RE2/Java NFA cost grows with pattern size, not corpus
shape). For blocklists beyond a few thousand terms the right tool
changes shape (token-set membership via an inverted join) — this
operator targets the curated-list regime every published pipeline uses.

The identical pattern string is restated by ``blocklist_pattern`` for
the DuckDB oracle, so engine and gate agree on exactly which documents
match (both are RE2-compatible: escaped literals, word boundaries,
case-insensitive flag).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def blocklist_pattern(
    terms: list[str],
    whole_words: bool = True,
    case_insensitive: bool = True,
) -> str:
    """The single alternation regex for ``terms`` (literals, escaped).

    Longest-first alternation so an earlier short term can't shadow a
    longer one under ``whole_words=False``; with word boundaries the
    order is irrelevant but the determinism costs nothing.
    """
    if not terms:
        raise ValueError("blocklist needs at least one term")
    body = "|".join(re.escape(t) for t in sorted(terms, key=len, reverse=True))
    if whole_words:
        body = rf"\b(?:{body})\b"
    else:
        body = f"(?:{body})"
    return ("(?i)" if case_insensitive else "") + body


def blocked(
    text_col: Column | str,
    terms: list[str],
    whole_words: bool = True,
    case_insensitive: bool = True,
) -> Column:
    """Boolean column: does the text match any blocklist term? NULL
    text never matches (a missing document is a validity problem for
    the validity filter, not a content hit)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    pat = blocklist_pattern(terms, whole_words, case_insensitive)
    return F.coalesce(c.rlike(pat), F.lit(False))


def drop_blocked(
    df: DataFrame,
    text_col: str,
    terms: list[str],
    whole_words: bool = True,
    case_insensitive: bool = True,
) -> DataFrame:
    """Rows of ``df`` whose text matches NO blocklist term."""
    return df.where(~blocked(text_col, terms, whole_words, case_insensitive))
