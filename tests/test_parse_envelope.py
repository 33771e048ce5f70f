"""Schema-driven parse + exactly-consumed checks (DaffodilParse analogs)."""

import json

from pyspark.sql import functions as F

from nifi_daffodil_spark.fixtures.walgen import WalSpec, generate_enveloped_wal
from nifi_daffodil_spark.operators.parse import parse_envelope, unparse_infoset
from nifi_daffodil_spark.schemas import EVENT_ENVELOPE_SCHEMA


def _load(spark, tmp_path):
    man = generate_enveloped_wal(str(tmp_path / "env"), WalSpec(n_events=2000, seed=7))
    return spark.read.schema(EVENT_ENVELOPE_SCHEMA).parquet(man["path"]), man


def test_parse_routes_leftover_and_malformed(spark, tmp_path):
    df, man = _load(spark, tmp_path)
    ok, bad = parse_envelope(df)
    errors = {r["error"] for r in bad.select("error").distinct().collect()}
    assert errors == {"LEFTOVER_DATA", "PARSE_ERROR"}
    assert ok.count() + bad.count() == man["n_events"]
    assert ok.count() > 0.9 * man["n_events"]
    # parsed rows carry the typed infoset fields
    row = ok.orderBy("lsn").first()
    assert row["role"] in ("user", "assistant", "system", "tool")
    assert row["text"].startswith("turn ")


def test_quarantined_payload_verbatim(spark, tmp_path):
    df, _ = _load(spark, tmp_path)
    _, bad = parse_envelope(df)
    r = bad.filter(F.col("error") == "LEFTOVER_DATA").first()
    assert r["raw"].endswith("GARBAGE")  # original bytes untouched


def test_unparse_roundtrip_json(spark, tmp_path):
    df, _ = _load(spark, tmp_path)
    ok, _ = parse_envelope(df)
    rendered = ok.withColumn("out", unparse_infoset(ok, "json")).select("lsn", "out")
    row = rendered.orderBy("lsn").first()
    parsed = json.loads(row["out"])
    assert set(parsed) <= {"role", "text", "tool"}
    # parse(unparse(x)) == x for the typed fields
    back = parse_envelope(
        ok.withColumn("payload", unparse_infoset(ok, "json"))
        .withColumn("payload_len", F.length("payload").cast("long"))
        .select("lsn", "op", "conv_id", "turn_idx", "ts", "payload", "payload_len")
    )[0]
    a = {r["lsn"]: (r["role"], r["text"], r["tool"]) for r in ok.collect()}
    b = {r["lsn"]: (r["role"], r["text"], r["tool"]) for r in back.collect()}
    assert a == b


def test_unparse_xml_layout(spark, tmp_path):
    df, _ = _load(spark, tmp_path)
    ok, _ = parse_envelope(df)
    row = ok.withColumn("x", unparse_infoset(ok, "xml")).orderBy("lsn").first()
    assert row["x"].startswith("<turn><role>") and row["x"].endswith("</tool></turn>")


def test_unparse_dispatch_per_record_mime(spark):
    """Per-record format selection on mime_type; unknown/missing -> failure
    with the original content verbatim (AbstractDaffodilProcessor.java:
    176-190,422-433; tests TestDaffodilProcessor.java:233-292)."""
    from nifi_daffodil_spark.operators.parse import unparse_dispatch

    df = spark.createDataFrame(
        [
            (1, "user", "hi", "t1", "application/json"),
            (2, "agent", "yo", None, "application/xml"),
            (3, "user", "x", "t3", "text/plain"),
            (4, "user", "y", "t4", None),
        ],
        "lsn long, role string, text string, tool string, mime_type string",
    )
    ok, failed = unparse_dispatch(df)
    got = {r["lsn"]: (r["route"], r["rendered"]) for r in ok.collect()}
    assert got[1] == ("json", '{"role":"user","text":"hi","tool":"t1"}')
    assert got[2] == (
        "xml",
        "<turn><role>agent</role><text>yo</text><tool></tool></turn>",
    )
    bad = {r["lsn"]: r for r in failed.collect()}
    assert set(bad) == {3, 4}
    assert bad[3]["route"] == "FAIL_UNKNOWN_MIME"
    assert bad[4]["route"] == "FAIL_MISSING_MIME"
    # failure-atomicity: original record content is carried verbatim
    assert '"text":"x"' in bad[3]["raw"] and '"mime_type":"text/plain"' in bad[3]["raw"]


def test_parse_dispatch_per_record_schema(spark):
    """Per-record schema selection (the reference evaluates the schema path
    per record via EL, AbstractDaffodilProcessor.java:93,407-408; unresolved
    schema = hard failure, TestDaffodilProcessor.java:48-58): one stream
    carries v0 and v1 payloads; unknown/missing schema ids quarantine."""
    from pyspark.sql import types as T

    from nifi_daffodil_spark.operators.parse import parse_dispatch

    v0 = T.StructType(
        [T.StructField("role", T.StringType()), T.StructField("text", T.StringType())]
    )
    v1 = T.StructType(
        [
            T.StructField("role", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("tool", T.StringType()),
        ]
    )
    df = spark.createDataFrame(
        [
            (1, "v0", '{"role":"user","text":"a"}'),
            (2, "v1", '{"role":"agent","text":"b","tool":"search"}'),
            (3, "v9", '{"role":"x","text":"y"}'),
            (4, None, '{"role":"x","text":"y"}'),
        ],
        "lsn long, schema_id string, payload string",
    )
    ok, failed = parse_dispatch(df, {"v0": v0, "v1": v1})
    got = {r["lsn"]: (r["_infoset"], r["used_schema"]) for r in ok.collect()}
    assert got[1][0].asDict() == {"role": "user", "text": "a", "tool": None}
    assert got[1][1] == "v0"
    assert got[2][0].asDict() == {"role": "agent", "text": "b", "tool": "search"}
    bad = {r["route"] for r in failed.collect()}
    assert bad == {"FAIL_UNKNOWN_SCHEMA", "FAIL_MISSING_SCHEMA"}
    # the raw payload rides to quarantine verbatim
    raws = {r["raw"] for r in failed.collect()}
    assert '{"role":"x","text":"y"}' in raws
