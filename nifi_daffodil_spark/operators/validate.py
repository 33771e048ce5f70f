"""Validation tiers + success/failure routing.

Reference: DaffodilParse's Validation Mode property — off / limited / full
(AbstractDaffodilProcessor.java:142-153,322-331); any validation error routes
the ORIGINAL record to the failure relationship with content intact
(AbstractDaffodilProcessor.java:498-501; tests TestDaffodilProcessor.java:319-342).

Engine mapping (SURVEY.md §2.a #10, #15, #21):
  * off     — only structural nullability of the merge key (a row without a
              key cannot be applied at all)
  * limited — + type/domain bounds: turn_idx in [0, INT32_MAX], ts not null,
              op in (I,U,D)   (≈ Daffodil built-in limited validation)
  * full    — + facet checks: role in domain, length(text) <= max_text_len
              (≈ Xerces full validation of maxLength facets, csv.dfdl.xsd:59-62)

All checks are Catalyst expressions (whole-stage codegen, no Python).
The error column concatenates every failed check, quarantined rows keep the
original payload verbatim (raw = to_json of the unmodified input row).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nifi_daffodil_spark.schemas import INT32_MAX, VALID_OPS, VALID_ROLES


def _checks(mode: str, max_text_len: int) -> list[tuple[str, Column]]:
    c: list[tuple[str, Column]] = [
        ("NULL_CONV_ID", F.col("conv_id").isNull()),
        ("NULL_TURN_IDX", F.col("turn_idx").isNull()),
    ]
    if mode in ("limited", "full"):
        c += [
            ("NEGATIVE_TURN_IDX", F.col("turn_idx") < 0),
            ("TURN_IDX_OVERFLOW", F.col("turn_idx") > INT32_MAX),
            ("NULL_TS", F.col("ts").isNull()),
            ("BAD_OP", ~F.col("op").isin(*VALID_OPS)),
        ]
    if mode == "full":
        c += [
            ("BAD_ROLE", F.col("role").isNotNull() & ~F.col("role").isin(*VALID_ROLES)),
            ("TEXT_TOO_LONG", F.length(F.col("text")) > max_text_len),
        ]
    return c


def with_validation(df: DataFrame, mode: str = "full", max_text_len: int = 65536) -> DataFrame:
    """Adds `_error` (null = valid). Pure column expressions."""
    checks = _checks(mode, max_text_len)
    err = F.concat_ws(
        ",", *[F.when(cond, F.lit(name)).otherwise(F.lit(None)) for name, cond in checks]
    )
    # concat_ws of all-null yields '' -> map to null (valid)
    return df.withColumn("_error", F.when(err == "", F.lit(None)).otherwise(err))


def split_valid(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """success/failure routing (AbstractDaffodilProcessor.java:164-172).

    Returns (valid, quarantine). Quarantine rows preserve the original
    payload verbatim as a JSON rendering of the untouched input columns
    (failure-atomicity, TestDaffodilProcessor.java:55-57).
    """
    validated = df if "_error" in df.columns else with_validation(df)
    valid = validated.filter(F.col("_error").isNull()).drop("_error")
    source_cols = [c for c in df.columns if c != "_error"]
    quarantine = validated.filter(F.col("_error").isNotNull()).select(
        F.col("lsn"),
        F.to_json(F.struct(*[F.col(c) for c in source_cols])).alias("raw"),
        F.col("_error").alias("error"),
    )
    return valid, quarantine
