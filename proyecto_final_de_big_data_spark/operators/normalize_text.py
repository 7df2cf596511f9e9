"""Text normalization: the canonicalization pass that runs BEFORE any
hashing, dedup, or tokenization stage — two byte sequences that render
identically must compare identically, or exact dedup silently under-
counts (``café`` composed vs decomposed are different md5s) and
fingerprints drift across crawls.

Canonical order, identical in the SQL twin the gate restates:

1. strip control characters (C0 minus ``\\t`` ``\\n`` ``\\r``, DEL) and
   zero-width code points — JVM ``regexp_replace``, codegen'd;
2. Unicode NFC composition — the one step expressions can't do.
   Implemented as an Arrow ``pandas_udf`` over ``pandas``'
   ``str.normalize`` (ICU-equivalent table lookup per batch). This is
   the module's only Python, it's a pure projection (map-only, no
   shuffle anywhere in normalization), and it short-circuits: ASCII
   text is returned untouched without a table walk, so the common case
   costs one vectorized ``str.isascii`` scan;
3. whitespace collapse + trim with an EXPLICIT class ``[ \\t\\n\\r]+``
   — not ``\\s``, whose membership differs between Java regex (includes
   ``\\x0B``) and RE2/DuckDB (does not). Step 1 already removed the
   disputed characters, but the class keeps both engines honest by
   construction rather than by prior state.

Scale shape: steps 1 and 3 are whole-stage-codegen expressions; step 2
is Arrow-batched with an ASCII fast path. Nothing here moves a row
between executors.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# C0 controls minus tab/newline/carriage-return, plus DEL.
_CONTROL_CLASS = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"
# Zero-width space/non-joiner/joiner and the BOM-as-ZWNBSP.
_ZERO_WIDTH_CLASS = "[\u200b\u200c\u200d\ufeff]"


def strip_control_chars(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(
        F.regexp_replace(c, _CONTROL_CLASS, ""), _ZERO_WIDTH_CLASS, ""
    )


def collapse_whitespace(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(c, "[ \t\n\r]+", " "))


def ws_lower_tokens(col: str | Column) -> Column:
    """Lowercase whitespace tokens — THE house tokenization (one
    definition; dsir/apss/keyness all build their term frames from
    this expression, and their DuckDB oracles restate it as
    ``list_filter(string_split_regex(lower(text), '\\s+'),
    w -> len(w) > 0)``). A pure higher-order-function projection —
    no UDF, runs inside the scan stage."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), r"\s+"), lambda t: F.length(t) > 0)


def _nfc_udf():
    # Defined lazily: pandas_udf parses its DDL return type against the
    # active session, so a module-level definition would fail at import
    # time (same pattern as operators/vecmath.py).
    @pandas_udf("string")
    def nfc(series: pd.Series) -> pd.Series:
        ascii_mask = series.notna() & series.map(
            lambda v: isinstance(v, str) and v.isascii()
        )
        out = series.copy()
        todo = ~ascii_mask & series.notna()
        if todo.any():
            out[todo] = series[todo].str.normalize("NFC")
        return out

    return nfc


def normalize_text(
    df: DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
    nfc: bool = True,
) -> DataFrame:
    """Append the normalized text as ``out_col`` (default: replace
    ``text_col`` in place). ``nfc=False`` skips the composition step for
    corpora already guaranteed composed (keeps the pass pure-JVM)."""
    stripped = strip_control_chars(text_col)
    composed = _nfc_udf()(stripped) if nfc else stripped
    return df.withColumn(out_col or text_col, collapse_whitespace(composed))
