"""Text canonicalization kernel — the engine's "unparse to canonical form".

Reference precedent: the DFDL escape scheme canonicalizes CRLF -> LF on
round-trip (csv.dfdl.xsd:38 outputNewLine="%LF;", asserted in
TestDaffodilProcessor.java:150,220). The engine's frozen contract
(SURVEY.md §7 "hard part 3" — golden-pinned, do not drift):

    1. CRLF -> LF, then lone CR -> LF
    2. Unicode NFC normalization
    3. strip trailing whitespace (str.rstrip)
    4. None stays None

Implemented twice on purpose:
  * `normalize_text_udf` — Arrow-vectorized pandas UDF (the hot path; the
    north rule mandates vectorized pandas/Arrow, no per-row Python)
  * `normalize_text_py`  — pure-Python scalar, used by the independent
    pandas oracle in tests
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T


def normalize_text_py(s: str | None) -> str | None:
    if s is None:
        return None
    s = s.replace("\r\n", "\n").replace("\r", "\n")
    s = unicodedata.normalize("NFC", s)
    return s.rstrip()


def _normalize_series(s: pd.Series) -> pd.Series:
    # vectorized pandas string kernel; NaN/None pass through untouched
    out = s.str.replace("\r\n", "\n", regex=False).str.replace("\r", "\n", regex=False)
    out = out.str.normalize("NFC")
    return out.str.rstrip()


@F.pandas_udf(T.StringType())
def normalize_text_udf(s: pd.Series) -> pd.Series:
    return _normalize_series(s)


def render_turn_udf():
    """Canonical per-turn rendering (the "unparse" role): a deterministic
    single-line projection used for text-equality verification.

    Kept JVM-side — built-in functions only, no Python — since it is pure
    string concat: `conv_id \\x1f turn_idx \\x1f role \\x1f text`.
    """
    return F.concat_ws(
        "\x1f",
        F.col("conv_id"),
        F.col("turn_idx").cast("string"),
        F.coalesce(F.col("role"), F.lit("")),
        F.coalesce(F.col("text"), F.lit("")),
    )
