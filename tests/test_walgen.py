import pyarrow.parquet as pq

from nifi_daffodil_spark.fixtures.oracle import load_segments
from nifi_daffodil_spark.fixtures.walgen import WalSpec, generate_wal


def test_manifest_counts(wal):
    total = sum(
        pq.read_table(p).num_rows for p in wal["v0"] + wal["v1"]
    )
    assert total == wal["spec"].n_events
    assert len(wal["v0"]) == wal["n_v0_segments"]


def test_deterministic(tmp_path, wal):
    spec = wal["spec"]
    m2 = generate_wal(str(tmp_path / "w2"), spec)
    a = load_segments(wal["v0"] + wal["v1"]).sort_values("lsn").reset_index(drop=True)
    b = load_segments(m2["v0"] + m2["v1"]).sort_values("lsn").reset_index(drop=True)
    assert a.equals(b)


def test_edge_cases_present(wal):
    df = load_segments(wal["v0"] + wal["v1"])
    assert df["conv_id"].isna().any(), "null conv_id fixture missing"
    assert (df["turn_idx"].dropna() < 0).any(), "negative turn_idx fixture missing"
    assert (df["role"] == "robot").any(), "bad role fixture missing"
    assert df["text"].str.contains("\r", regex=False).any(), "CR fixture missing"
    assert (df["op"] == "D").any()
    # hot key takes a large share
    share = (df["conv_id"] == "conv-00000").mean()
    assert share > 0.1
    # duplicate keys at different lsn exist (LWW exercise)
    dups = df.dropna(subset=["conv_id"]).groupby(["conv_id", "turn_idx"]).size()
    assert (dups > 1).any()


def test_v0_schema_lacks_tool(wal):
    t = pq.read_table(wal["v0"][0])
    assert "tool" not in t.schema.names
    assert str(t.schema.field("turn_idx").type) == "int32"
    t1 = pq.read_table(wal["v1"][0])
    assert "tool" in t1.schema.names
    assert str(t1.schema.field("turn_idx").type) == "int64"


def test_late_rows_exist(wal):
    """Some segment s+1 contains an lsn smaller than segment s's max."""
    import pyarrow.parquet as pq

    paths = wal["v0"] + wal["v1"]
    maxes = []
    late = False
    for p in paths:
        lsns = pq.read_table(p, columns=["lsn"]).column("lsn").to_pylist()
        if maxes and lsns and min(lsns) < max(maxes):
            late = True
        maxes.extend([max(lsns)] if lsns else [])
    assert late
