"""Per-record attribute-expression resolution (inventory #12: NiFi EL,
AbstractDaffodilProcessor.java:93,407-408,462)."""

import pytest
from pyspark.sql import functions as F

from nifi_daffodil_spark.operators.el_resolve import (
    UnknownAttributeError,
    compile_template,
    resolve_attribute_expressions,
)


@pytest.fixture(scope="module")
def recs(spark):
    return spark.createDataFrame(
        [(1, "user", "hello"), (2, "agent", None)],
        "lsn long, role string, text string",
    )


def test_template_resolves_per_record(spark, recs):
    out = {
        r["lsn"]: r["resolved"]
        for r in resolve_attribute_expressions(recs, "k/${role}/${lsn}").collect()
    }
    assert out == {1: "k/user/1", 2: "k/agent/2"}


def test_null_attribute_renders_empty(spark, recs):
    """NiFi EL coerces a null attribute to empty string."""
    out = {
        r["lsn"]: r["resolved"]
        for r in resolve_attribute_expressions(recs, "v=${text}!").collect()
    }
    assert out == {1: "v=hello!", 2: "v=!"}


def test_unknown_attribute_fails_at_compile_time(spark, recs):
    """Bad templates fail when the plan is built (the analog of EL failing
    the record), never silently per row."""
    with pytest.raises(UnknownAttributeError, match="no_such"):
        resolve_attribute_expressions(recs, "${no_such}")


def test_literal_only_and_empty_templates(spark, recs):
    assert recs.select(compile_template("plain", recs.columns).alias("x")).first()["x"] == "plain"
    assert recs.select(compile_template("", recs.columns).alias("x")).first()["x"] == ""


def test_resolution_stays_in_codegen(spark, recs):
    """The compiled template is one concat projection — whole-stage codegen,
    no Python in the hot path."""
    df = resolve_attribute_expressions(recs, "k/${role}/${lsn}").select("resolved")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
