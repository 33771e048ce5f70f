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
