"""Schema-driven parse of enveloped payloads + exactly-consumed check.

Reference: DaffodilParse.processWithDaffodil (DaffodilParse.java:83-100) —
parse bytes into a typed infoset, fail on error, and fail if ANY input is
left over (bits consumed != content length, DaffodilParse.java:92-98;
leftover.bin test TestDaffodilProcessor.java:295-304).

Engine mapping: `from_json(payload, PAYLOAD_SCHEMA)` is the schema-driven
parse (JVM-side, codegen); the exactly-consumed guard is
`length(payload) == payload_len`. Parse failures (from_json -> null struct)
and leftover violations route to quarantine with the original payload
verbatim. The inverse — `unparse_infoset` — renders the typed struct back
with to_json (DaffodilUnparse.java:83-92 analog).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nifi_daffodil_spark.schemas import PAYLOAD_SCHEMA


def parse_envelope(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(parsed_events, quarantine) from an enveloped WAL frame.

    parsed_events has the typed EVENT shape (role/text/tool lifted from the
    payload struct); quarantine carries PARSE_ERROR / LEFTOVER_DATA rows with
    the raw payload untouched.
    """
    p = df.withColumn("_infoset", F.from_json(F.col("payload"), PAYLOAD_SCHEMA))
    p = p.withColumn(
        "_error",
        F.when(F.length("payload") != F.col("payload_len"), F.lit("LEFTOVER_DATA"))
        .when(F.col("payload").isNotNull() & F.col("_infoset").isNull(), F.lit("PARSE_ERROR"))
        # from_json returns a struct of all-nulls (not null) for some bad JSON:
        .when(
            F.col("_infoset.role").isNull()
            & F.col("_infoset.text").isNull()
            & F.col("_infoset.tool").isNull(),
            F.lit("PARSE_ERROR"),
        )
        .otherwise(F.lit(None)),
    )
    ok = p.filter(F.col("_error").isNull()).select(
        "lsn",
        "op",
        "conv_id",
        "turn_idx",
        F.col("_infoset.role").alias("role"),
        F.col("_infoset.text").alias("text"),
        F.col("_infoset.tool").alias("tool"),
        "ts",
    )
    bad = p.filter(F.col("_error").isNotNull()).select(
        "lsn", F.col("payload").alias("raw"), F.col("_error").alias("error")
    )
    return ok, bad


#: mime values the dispatcher understands — the reference's "use mime.type
#: attribute" unparse mode accepts exactly application/json and
#: application/xml and fails anything else
#: (AbstractDaffodilProcessor.java:176-190,422-433).
MIME_TO_FMT = {"application/json": "json", "application/xml": "xml"}


def parse_dispatch(
    df: DataFrame,
    schemas: dict[str, "T.StructType"],
    schema_col: str = "schema_id",
    payload_col: str = "payload",
) -> tuple[DataFrame, DataFrame]:
    """Per-RECORD schema selection for parse.

    Reference: the schema-path property is an EL template evaluated against
    EACH record's attributes (AbstractDaffodilProcessor.java:93,407-408), so
    one processor parses records of different schemas in the same stream;
    an unresolvable schema is a hard failure (schema-missing test,
    TestDaffodilProcessor.java:48-58). Engine mapping: one `when` chain over
    the schema-id column, each branch a `from_json` with ITS declared
    StructType widened to the union-of-fields shape (null for fields a
    schema lacks) so the chain has a single result type; unknown/missing
    schema ids route to quarantine with the payload verbatim.

    Returns (ok, failed): ok = input columns + `_infoset` struct + `used_schema`;
    failed = (route, raw).
    """
    from pyspark.sql import types as T  # noqa: F811 — hinted name above

    # union-of-fields result shape: same name+type everywhere, order fixed
    all_fields: dict[str, T.DataType] = {}
    for s in schemas.values():
        for f in s.fields:
            prev = all_fields.get(f.name)
            if prev is not None and prev != f.dataType:
                raise ValueError(
                    f"conflicting types for field {f.name!r} across schemas"
                )
            all_fields.setdefault(f.name, f.dataType)
    wide = T.StructType([T.StructField(n, t, True) for n, t in all_fields.items()])

    def as_wide(schema: T.StructType):
        parsed = F.from_json(F.col(payload_col), schema)
        names = {f.name for f in schema.fields}
        return F.struct(
            *[
                (parsed[n] if n in names else F.lit(None).cast(t)).alias(n)
                for n, t in all_fields.items()
            ]
        ).cast(wide)

    infoset = None
    for sid in sorted(schemas):
        branch = F.when(F.col(schema_col) == sid, as_wide(schemas[sid]))
        infoset = branch if infoset is None else infoset.when(
            F.col(schema_col) == sid, as_wide(schemas[sid])
        )
    route = (
        F.when(F.col(schema_col).isNull(), F.lit("FAIL_MISSING_SCHEMA"))
        .when(~F.col(schema_col).isin(*sorted(schemas)), F.lit("FAIL_UNKNOWN_SCHEMA"))
        .otherwise(F.lit("ok"))
    )
    tagged = df.withColumn("_route", route)
    ok = (
        tagged.filter(F.col("_route") == "ok")
        .withColumn("_infoset", infoset)
        .withColumn("used_schema", F.col(schema_col))
        .drop("_route")
    )
    failed = tagged.filter(F.col("_route") != "ok").select(
        F.col("_route").alias("route"),
        F.col(payload_col).alias("raw"),
    )
    return ok, failed


def unparse_dispatch(df: DataFrame, mime_col: str = "mime_type") -> tuple[DataFrame, DataFrame]:
    """Per-RECORD infoset format selection driven by a record attribute.

    Reference: DaffodilUnparse with INFOSET_TYPE = "use mime.type attribute"
    selects XML vs JSON from each flowfile's mime.type and routes
    unknown/missing values to failure with the content untouched
    (AbstractDaffodilProcessor.java:176-190,422-433; tests
    TestDaffodilProcessor.java:233-292). Engine mapping: a single `when`
    chain on the mime column — one codegen'd projection, no per-row Python,
    no job per format.

    Returns (ok, failed):
      ok     — input columns + `route` ('json'|'xml') + `rendered`
      failed — `route` ('FAIL_MISSING_MIME'|'FAIL_UNKNOWN_MIME'), `raw`
               (original row as JSON, verbatim — failure-atomicity), and
               the original lsn for provenance.
    """
    route = (
        F.when(F.col(mime_col).isNull(), F.lit("FAIL_MISSING_MIME"))
        .when(F.col(mime_col) == "application/json", F.lit("json"))
        .when(F.col(mime_col) == "application/xml", F.lit("xml"))
        .otherwise(F.lit("FAIL_UNKNOWN_MIME"))
    )
    rendered = (
        F.when(F.col(mime_col) == "application/json", unparse_infoset(df, "json"))
        .when(F.col(mime_col) == "application/xml", unparse_infoset(df, "xml"))
    )
    tagged = df.withColumn("route", route)
    ok = tagged.filter(~F.col("route").startswith("FAIL_")).withColumn(
        "rendered", rendered
    )
    failed = tagged.filter(F.col("route").startswith("FAIL_")).select(
        "lsn",
        "route",
        F.to_json(F.struct(*[F.col(c) for c in df.columns])).alias("raw"),
    )
    return ok, failed


def unparse_infoset(df: DataFrame, fmt: str = "json"):
    """Inverse serialization of the typed turn (DaffodilUnparse analog).

    json -> to_json struct; xml -> deterministic tagged rendering via
    concat (Spark has no to_xml builtin; the layout is fixed by tests).
    """
    s = F.struct(F.col("role"), F.col("text"), F.col("tool"))
    if fmt == "json":
        return F.to_json(s)
    if fmt == "xml":
        return F.concat(
            F.lit("<turn><role>"),
            F.coalesce(F.col("role"), F.lit("")),
            F.lit("</role><text>"),
            F.coalesce(F.col("text"), F.lit("")),
            F.lit("</text><tool>"),
            F.coalesce(F.col("tool"), F.lit("")),
            F.lit("</tool></turn>"),
        )
    raise ValueError(f"unknown infoset format: {fmt!r}")
