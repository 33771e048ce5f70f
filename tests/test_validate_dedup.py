import datetime as dt

from pyspark.sql import functions as F

from nifi_daffodil_spark.operators.dedup import lww_dedup
from nifi_daffodil_spark.operators.validate import split_valid, with_validation

TS = dt.datetime(2024, 1, 1)


def _events(spark, rows):
    return spark.createDataFrame(
        rows,
        "lsn long, op string, conv_id string, turn_idx long, role string, "
        "text string, tool string, ts timestamp",
    )


def test_validation_tiers(spark):
    rows = [
        (1, "I", "c1", 0, "user", "hi", None, TS),          # valid
        (2, "I", None, 0, "user", "hi", None, TS),          # NULL_CONV_ID (all tiers)
        (3, "I", "c1", -1, "user", "hi", None, TS),         # NEGATIVE (limited+)
        (4, "I", "c1", 1, "robot", "hi", None, TS),         # BAD_ROLE (full only)
        (5, "X", "c1", 2, "user", "hi", None, TS),          # BAD_OP (limited+)
        (6, "I", "c1", 3, "user", "x" * 20, None, TS),      # TEXT_TOO_LONG at max=10
    ]
    df = _events(spark, rows)
    for mode, expect_bad in [("off", {2}), ("limited", {2, 3, 5}), ("full", {2, 3, 4, 5, 6})]:
        valid, quar = split_valid(with_validation(df, mode, max_text_len=10))
        bad_lsns = {r["lsn"] for r in quar.collect()}
        assert bad_lsns == expect_bad, f"mode={mode}"
        assert valid.count() + quar.count() == len(rows)


def test_quarantine_preserves_original(spark):
    rows = [(7, "I", None, 5, "user", "keep me \r\n verbatim", None, TS)]
    df = _events(spark, rows)
    _, quar = split_valid(with_validation(df, "full", 100))
    raw = quar.collect()[0]["raw"]
    assert "keep me \\r\\n verbatim" in raw  # JSON-escaped but byte-faithful
    assert quar.collect()[0]["error"] == "NULL_CONV_ID"


def test_lww_dedup(spark):
    rows = [
        (1, "I", "c1", 0, "user", "v1", None, TS),
        (5, "U", "c1", 0, "user", "v5", None, TS),  # winner
        (3, "U", "c1", 0, "user", "v3", None, TS),
        (2, "I", "c1", 1, "user", "a", None, TS),
        (4, "D", "c1", 1, None, None, None, TS),    # tombstone wins
    ]
    out = {(r["conv_id"], r["turn_idx"]): r for r in lww_dedup(_events(spark, rows)).collect()}
    assert out[("c1", 0)]["text"] == "v5" and out[("c1", 0)]["lsn"] == 5
    assert out[("c1", 1)]["op"] == "D"


def test_dedup_plan_single_shuffle(spark):
    df = _events(spark, [(1, "I", "c1", 0, "user", "x", None, TS)])
    plan = lww_dedup(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1
