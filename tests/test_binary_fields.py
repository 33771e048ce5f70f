"""Fixed-width binary field extraction (reference bitlength.dfdl.xsd:
bit-length unsignedInt fields + byte order from an external variable;
BE/LE flip pair noleftover.bin.xml 57297 vs noleftover_le.bin.xml 53727)."""

import pytest
from pyspark.sql import functions as F

from nifi_daffodil_spark.operators.binary_fields import (
    BinaryField,
    decode_field,
    parse_fixed_binary,
)


@pytest.fixture(scope="module")
def payloads(spark):
    # 0xDFD1 leading u16: BE=57297, LE(bytes swapped)=53727 — the exact
    # value pair the reference's byte-order tests assert
    rows = [(1, bytes.fromhex("dfd1abc012345678")), (2, bytes.fromhex("0000ffff00000000"))]
    return spark.createDataFrame(rows, "lsn long, payload binary")


def test_big_vs_little_endian_reference_pair(spark, payloads):
    be = {
        r["lsn"]: r["u16"]
        for r in parse_fixed_binary(
            payloads, [BinaryField("u16", 0, 4)], byte_order="big"
        ).collect()
    }
    le = {
        r["lsn"]: r["u16"]
        for r in parse_fixed_binary(
            payloads, [BinaryField("u16", 0, 4)], byte_order="little"
        ).collect()
    }
    assert be[1] == 57297  # 0xDFD1
    assert le[1] == 53727  # 0xD1DF — the reference's flipped value
    assert be[2] == 0 and le[2] == 0


def test_sub_byte_and_wide_fields(spark, payloads):
    out = parse_fixed_binary(
        payloads,
        [BinaryField("u12", 4, 3), BinaryField("u32", 8, 8)],
        byte_order="big",
    ).collect()
    got = {r["lsn"]: (r["u12"], r["u32"]) for r in out}
    assert got[1] == (0xABC, 0x12345678)
    assert got[2] == (0xFFF, 0)


def test_exactly_consumed_guard(spark, payloads):
    out = parse_fixed_binary(
        payloads.withColumn("payload_len", F.lit(8).cast("long")),
        [BinaryField("u16", 0, 4)],
        expected_len_col="payload_len",
    )
    assert out.filter(F.col("_error").isNotNull()).count() == 0
    bad = parse_fixed_binary(
        payloads.withColumn("payload_len", F.lit(7).cast("long")),
        [BinaryField("u16", 0, 4)],
        expected_len_col="payload_len",
    )
    assert bad.filter(F.col("_error") == "LEFTOVER_DATA").count() == 2


def test_short_payload_flagged_not_silent_zero(spark):
    # A payload shorter than the declared extents must NOT silently decode
    # missing nibbles as 0: substring past end yields '' and instr(hex,'')
    # is 1, so without the guard a 1-byte payload "reads" a u32 as garbage.
    rows = [(1, bytes.fromhex("df")), (2, bytes.fromhex("dfd1abc012345678"))]
    df = spark.createDataFrame(rows, "lsn long, payload binary")
    out = {
        r["lsn"]: r["_error"]
        for r in parse_fixed_binary(df, [BinaryField("u32", 0, 8)]).collect()
    }
    assert out[1] == "SHORT_PAYLOAD"
    assert out[2] is None


def test_invalid_specs_fail_fast(spark):
    with pytest.raises(ValueError, match="whole-byte"):
        decode_field(F.lit("00"), BinaryField("x", 1, 2), byte_order="little")
    with pytest.raises(ValueError, match="overflow"):
        BinaryField("too_wide", 0, 16)
    with pytest.raises(ValueError, match="byte_order"):
        decode_field(F.lit("00"), BinaryField("x", 0, 2), byte_order="middle")


def test_stays_in_codegen(spark, payloads):
    plan = (
        parse_fixed_binary(payloads, [BinaryField("u16", 0, 4)])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_null_payload_flagged(spark):
    # octet_length(NULL)*2 < n is NULL -> F.when(NULL) passes the row as
    # valid unless isNull is explicit (code-review regression test)
    rows = [(1, None), (2, bytes.fromhex("dfd1"))]
    df = spark.createDataFrame(rows, "lsn long, payload binary")
    out = {
        r["lsn"]: r["_error"]
        for r in parse_fixed_binary(df, [BinaryField("u16", 0, 4)]).collect()
    }
    assert out[1] == "SHORT_PAYLOAD"
    assert out[2] is None
