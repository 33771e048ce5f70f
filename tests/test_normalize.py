"""Frozen golden cases for the canonicalization kernel (SURVEY.md §7 hard-part 3).

Reference precedent: CRLF -> LF asserted in TestDaffodilProcessor.java:150,220.
These literals are the contract — do not regenerate from the implementation.
"""

import pandas as pd
import pytest

from nifi_daffodil_spark.functions.normalize import (
    NormalizeOptions,
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
    out = _normalize_series(s, NormalizeOptions())
    out = out.where(pd.notna(out), None)
    assert list(out) == [g[1] for g in GOLDEN]


def test_udf_matches_py(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(g[0],) for g in GOLDEN], "text string")
    got = [r["n"] for r in df.select(normalize_text_udf(F.col("text")).alias("n")).collect()]
    assert got == [g[1] for g in GOLDEN]


# ---------------------------------------------------------------------------
# external variables (reference inventory #11: dynamic properties bound as
# Daffodil external variables — AbstractDaffodilProcessor.java:359-371,459-477;
# test family TestDaffodilProcessor.java:370-449)
# ---------------------------------------------------------------------------

from nifi_daffodil_spark.functions.normalize import (  # noqa: E402
    ExternalVariableError,
    make_normalize_udf,
    resolve_external_variables,
)


def test_external_variable_bound_changes_output():
    """A bound variable is actually consumed (round-1 gap: stored, unread)."""
    opts = resolve_external_variables({"output_newline": "crlf"})
    assert normalize_text_py("a\r\nb\nc  ", opts) == "a\r\nb\r\nc"
    # and via the compiled pandas kernel
    s = pd.Series(["a\r\nb\nc  "], dtype=object)
    assert list(_normalize_series(s, opts)) == ["a\r\nb\r\nc"]


def test_external_variable_empty_string_skipped():
    """Empty-string bindings keep the default (ref: empty dynamic property
    is skipped, TestDaffodilProcessor.java:402-414)."""
    opts = resolve_external_variables({"output_newline": "", "strip_trailing": ""})
    assert opts == NormalizeOptions()


def test_external_variable_unknown_name_fails():
    with pytest.raises(ExternalVariableError, match="unknown external variable"):
        resolve_external_variables({"no_such_var": "1"})


def test_external_variable_invalid_value_fails():
    with pytest.raises(ExternalVariableError, match="invalid value"):
        resolve_external_variables({"output_newline": "cr"})


def test_engine_consumes_external_variables(spark):
    """End-to-end: an engine configured with output_newline=crlf emits CRLF
    in the merge-ready batch (the binding reaches the hot path)."""
    from nifi_daffodil_spark.config import EngineConfig
    from nifi_daffodil_spark.engine import CdcEngine

    ev = spark.createDataFrame(
        [(1, "I", "c", 0, "user", "l1\nl2 ", None, None)],
        "lsn long, op string, conv_id string, turn_idx long, role string, "
        "text string, tool string, ts timestamp",
    )
    eng = CdcEngine(
        spark, None,
        EngineConfig(validation_mode="off",
                     external_variables={"output_newline": "crlf"}),
    )
    batch, _ = eng.prepare_batch(ev)
    assert batch.collect()[0]["text"] == "l1\r\nl2"
    # a bad binding fails at engine construction, not silently
    with pytest.raises(ExternalVariableError):
        CdcEngine(spark, None, EngineConfig(external_variables={"bogus": "x"}))


def test_strip_trailing_false_keeps_whitespace():
    opts = resolve_external_variables({"strip_trailing": "false"})
    assert normalize_text_py("keep  ", opts) == "keep  "
