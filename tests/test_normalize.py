"""Frozen golden cases for the canonicalization kernel (SURVEY.md §7 hard-part 3).

Reference precedent: CRLF -> LF asserted in TestDaffodilProcessor.java:150,220.
These literals are the contract — do not regenerate from the implementation.
"""

import pandas as pd
import pytest

from nifi_daffodil_spark.functions.normalize import (
    _normalize_series,
    normalize_text_py,
    normalize_text_udf,
)

GOLDEN = [
    ("line one\r\nline two\r\n", "line one\nline two"),
    ("carriage\rreturn", "carriage\nreturn"),
    ("cafe\u0301 latte", "caf\u00e9 latte"),  # NFD -> NFC
    ("trailing spaces   ", "trailing spaces"),
    ('a,"quoted,comma",b', 'a,"quoted,comma",b'),  # quotes survive verbatim
    ("", ""),
    (None, None),
    ("tabs\t\t", "tabs"),
    ("mixed\r\n\r ending \r\n", "mixed\n\n ending"),
    ("internal  spaces kept", "internal  spaces kept"),
]


@pytest.mark.parametrize("raw,want", GOLDEN)
def test_py_kernel(raw, want):
    assert normalize_text_py(raw) == want


def test_pandas_kernel_matches_py():
    s = pd.Series([g[0] for g in GOLDEN], dtype=object)
    out = _normalize_series(s)
    out = out.where(pd.notna(out), None)
    assert list(out) == [g[1] for g in GOLDEN]


def test_udf_matches_py(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(g[0],) for g in GOLDEN], "text string")
    got = [r["n"] for r in df.select(normalize_text_udf(F.col("text")).alias("n")).collect()]
    assert got == [g[1] for g in GOLDEN]
