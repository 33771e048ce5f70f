"""Full-replay golden test: engine final state == independent pandas oracle,
including per-turn text equality under stable (conv_id, turn_idx) ordering
(the BASELINE.json correctness gate)."""

from conftest import assert_frames_equal

from nifi_daffodil_spark.config import EngineConfig
from nifi_daffodil_spark.engine import CdcEngine
from nifi_daffodil_spark.fixtures.oracle import replay_oracle
from nifi_daffodil_spark.sinks.parquet_state import ParquetStateSink


def _replay(spark, tmp_path, wal, mode="full"):
    sink = ParquetStateSink(spark, str(tmp_path / "table"), n_buckets=16)
    eng = CdcEngine(spark, sink, EngineConfig(validation_mode=mode, n_buckets=16))
    groups = [([p], "v0") for p in wal["v0"]] + [([p], "v1") for p in wal["v1"]]
    eng.replay_segments(groups)
    return eng


def test_full_replay_matches_oracle(spark, tmp_path, wal):
    eng = _replay(spark, tmp_path, wal)
    expected, n_quar = replay_oracle(wal["v0"] + wal["v1"])
    got = eng.sink.read_transcripts().orderBy("conv_id", "turn_idx")
    assert_frames_equal(got, expected)
    assert eng.sink.read_quarantine().count() == n_quar


def test_per_turn_text_equality(spark, tmp_path, wal):
    eng = _replay(spark, tmp_path, wal)
    expected, _ = replay_oracle(wal["v0"] + wal["v1"])
    got = (
        eng.sink.read_transcripts()
        .orderBy("conv_id", "turn_idx")
        .select("conv_id", "turn_idx", "text")
        .collect()
    )
    exp = expected[["conv_id", "turn_idx", "text"]].itertuples(index=False)
    for g, e in zip(got, exp, strict=True):
        assert (g["conv_id"], g["turn_idx"]) == (e.conv_id, e.turn_idx)
        etext = None if e.text is None or e.text != e.text else e.text
        assert g["text"] == etext, f"text mismatch at {g['conv_id']}/{g['turn_idx']}"


def test_replay_in_one_epoch_same_state(spark, tmp_path, wal):
    """Epoch granularity must not change the final state (LWW is associative)."""
    eng_multi = _replay(spark, tmp_path / "m", wal)
    sink1 = ParquetStateSink(spark, str(tmp_path / "one" / "table"), n_buckets=16)
    eng_one = CdcEngine(spark, sink1, EngineConfig(n_buckets=16))
    from nifi_daffodil_spark.sources.wal import read_wal_dir

    eng_one.process_batch(read_wal_dir(spark, wal["dir"]), 0)
    a = eng_multi.sink.read_transcripts().orderBy("conv_id", "turn_idx").toPandas()
    b = eng_one.sink.read_transcripts().orderBy("conv_id", "turn_idx").toPandas()
    assert a.equals(b)


def test_schema_evolution_v0_era_rows_have_null_tool(spark, tmp_path, wal):
    eng = _replay(spark, tmp_path, wal)
    expected, _ = replay_oracle(wal["v0"] + wal["v1"])
    # v0-era winners (keys whose winning lsn came from a v0 segment) have tool NULL
    got = eng.sink.read_transcripts().toPandas()
    exp_tool = expected.set_index(["conv_id", "turn_idx"])["tool"]
    got_tool = got.set_index(["conv_id", "turn_idx"])["tool"]
    import pandas as pd

    assert got_tool.sort_index().where(pd.notna(got_tool.sort_index()), None).equals(
        exp_tool.sort_index().where(pd.notna(exp_tool.sort_index()), None)
    )
    assert expected["tool"].notna().any()  # evolution actually exercised
