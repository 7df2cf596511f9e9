"""PII detection and redaction for training-data curation.

Everything is built-in regex column expressions (JVM-side, codegen'd —
no UDFs): detection is ``regexp_extract_all`` + ``size``, redaction a
chain of ``regexp_replace``. At 100 TB these are ordinary projections
over the parquet scan — no shuffle, no Python.

Patterns are deliberately restricted to syntax shared by Java regex
(Spark) and RE2 (DuckDB) — character classes, bounded repetition,
``\\b`` word boundaries — so the correctness oracle can mirror them
verbatim. Extension surface: the reference pipeline has no PII stage;
this is part of the LLM-curation extension (SURVEY §2 extension rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Ordered: email first (its domain grammar requires an alphabetic TLD,
# so it can never eat an IPv4; but an address like u@host.com must be
# consumed before the phone/ip passes see the digits inside it).
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    "phone": (r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
}


def pii_count(col: str | Column, kind: str) -> Column:
    """Number of matches of one PII category in the column."""
    c = F.col(col) if isinstance(col, str) else col
    pattern, _ = PII_PATTERNS[kind]
    return F.size(F.regexp_extract_all(c, F.lit(pattern), F.lit(0)))


def redact_pii(col: str | Column) -> Column:
    """Replace every PII match with its category token, in the fixed
    category order of ``PII_PATTERNS``."""
    c = F.col(col) if isinstance(col, str) else col
    for pattern, token in PII_PATTERNS.values():
        c = F.regexp_replace(c, pattern, token)
    return c


def with_pii_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append per-category match counts and a redacted copy of the text.

    One projection; the regex passes fuse into the same whole-stage
    codegen span as the scan.
    """
    out = df
    for kind in PII_PATTERNS:
        out = out.withColumn(f"n_{kind}", pii_count(text_col, kind))
    return out.withColumn("redacted_text", redact_pii(text_col))
