"""CSV fixture loader (reference csv.dfdl.xsd + tokens.csv family) and the
event-time watermark / bounded-state streaming demo (SURVEY.md §2.b rows
that round 1 left uncovered)."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nifi_daffodil_spark.sources.csv_fixture import read_csv_fixture, write_csv_fixture

#: the reference's tricky-CSV surface: quoted commas (tokens.csv analog),
#: doubled quotes, embedded newlines, unicode, empties
SPECIAL_ROWS = [
    (1, "plain text"),
    (2, 'a,"quoted,comma",b'),
    (3, 'she said ""hi"" twice'),
    (4, "line one\nline two"),
    (5, "café ☕ naïve"),
    (6, ""),
    (8, None),  # NULL round-trips as \\N, distinct from empty string
    (7, "trailing spaces   "),
]

CSV_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
    ]
)


def test_csv_roundtrip_preserves_special_texts(spark, tmp_path):
    path = str(tmp_path / "fixtures" / "tokens.csv")
    write_csv_fixture(path, ["doc_id", "text"], SPECIAL_ROWS)
    got = {
        r["doc_id"]: r["text"]
        for r in read_csv_fixture(spark, path, CSV_SCHEMA).collect()
    }
    for doc_id, text in SPECIAL_ROWS:
        assert got[doc_id] == text, f"doc {doc_id} mangled: {got[doc_id]!r}"


def test_csv_declared_schema_types(spark, tmp_path):
    path = str(tmp_path / "fixtures" / "typed.csv")
    write_csv_fixture(path, ["doc_id", "text"], [(10, "x")])
    df = read_csv_fixture(spark, path, CSV_SCHEMA)
    assert [f.dataType.simpleString() for f in df.schema.fields] == ["bigint", "string"]


def test_csv_failfast_on_malformed(spark, tmp_path):
    path = str(tmp_path / "fixtures" / "bad.csv")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write('doc_id,text\n"not_a_number","x"\n')
    with pytest.raises(Exception, match="FAILFAST|Malformed|cannot be parsed"):
        read_csv_fixture(spark, path, CSV_SCHEMA).collect()


# ---------------------------------------------------------------------------
# watermark / bounded-state streaming (SURVEY.md §2.b: withWatermark)
# ---------------------------------------------------------------------------

_STREAM_SCHEMA = "lsn long, op string, ts timestamp"


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2026, 1, 1, 10, minute, 0)


def test_watermark_closes_windows_and_drops_late_rows(spark, tmp_path):
    """Three deterministic micro-batches (maxFilesPerTrigger=1,
    mtime-ordered). Batch 0 fills window W1=[10:00,10:05) and pushes the
    max event time to 10:30; the watermark (10:20) takes effect one batch
    later, so batch 1 is where W1 is emitted (append mode) and its state
    EVICTED — bounded state. Batch 2 then brings a LATE 10:01 row: W1 is
    already closed, so the row is dropped and W1 is never re-emitted
    (append's exactly-once-per-window contract)."""
    from nifi_daffodil_spark.streaming.watermark import windowed_turn_counts

    src = tmp_path / "stream_src"
    src.mkdir()
    files = [
        # batch 0: W1 rows + the watermark pusher (event time 10:30)
        ("a.parquet", [(1, "I", _ts(0)), (2, "I", _ts(1)), (3, "I", _ts(2)), (4, "U", _ts(30))]),
        # batch 1: watermark now 10:20 -> W1 emitted + evicted this batch
        ("b.parquet", [(5, "U", _ts(31))]),
        # batch 2: LATE row for W1 (10:01 << watermark) -> dropped
        ("c.parquet", [(6, "I", _ts(1))]),
    ]
    now = 1_700_000_000
    for i, (name, rows) in enumerate(files):
        d = src / name
        spark.createDataFrame(rows, _STREAM_SCHEMA).coalesce(1).write.parquet(str(d))
        t = now - 100 + i * 10
        os.utime(str(d), (t, t))
        for f in os.listdir(d):
            os.utime(str(d / f), (t, t))

    stream = (
        spark.readStream.schema(_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*.parquet")
    )
    q = (
        windowed_turn_counts(stream, watermark="10 minutes", window_dur="5 minutes")
        .writeStream.format("memory")
        .queryName("wm_demo")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = [
        (r["win_start"], r["win_end"], r["op"], r["n"], r["max_lsn"])
        for r in spark.table("wm_demo").collect()
    ]
    # W1 emitted exactly once with the on-time rows only (late lsn=6
    # dropped, never re-emitted); the 10:30+ window never closed -> absent
    assert got == [(_ts(0), _ts(5), "I", 3, 3)], got


# ---------------------------------------------------------------------------
# custom stateful operator (applyInPandasWithState)
# ---------------------------------------------------------------------------


def test_stateful_conv_progress_carries_state_across_batches(spark, tmp_path):
    """Per-conversation progress state survives micro-batch boundaries:
    batch 0 sees turns {0,1} of conv A (not contiguous to max? yes 0..1),
    batch 1 adds turn 3 (gap -> contiguous=0) and a new conv B."""
    from nifi_daffodil_spark.streaming.stateful import track_conv_progress

    src = tmp_path / "st_src"
    src.mkdir()
    files = [
        ("a.parquet", [("A", 0), ("A", 1)]),
        ("b.parquet", [("A", 3), ("B", 0)]),
    ]
    now = 1_700_000_000
    for i, (name, rows) in enumerate(files):
        d = src / name
        spark.createDataFrame(rows, "conv_id string, turn_idx int").coalesce(
            1
        ).write.parquet(str(d))
        t = now - 100 + i * 10
        os.utime(str(d), (t, t))
        for f in os.listdir(d):
            os.utime(str(d / f), (t, t))

    stream = (
        spark.readStream.schema("conv_id string, turn_idx int")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*.parquet")
    )
    q = (
        # evict_idle=False under availableNow: an armed processing-time
        # timeout makes the trigger spin empty micro-batches until the 1 h
        # timeout fires (the query "passes" awaitTermination(180) but keeps
        # burning cores for the rest of the session)
        track_conv_progress(stream, evict_idle=False)
        .writeStream.format("memory")
        .queryName("conv_progress")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "st_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "availableNow replay must terminate"
    rows = [
        (r["conv_id"], r["max_turn"], r["n_events"], r["contiguous"])
        for r in spark.table("conv_progress").collect()
    ]
    # update mode appends one row per updated key per batch (memory sink):
    # batch 0: A(max 1, n 2, contiguous); batch 1: A(max 3, n 3, gap at 2), B
    assert ("A", 1, 2, 1) in rows
    assert ("A", 3, 3, 0) in rows  # state carried: n_events 2 -> 3
    assert ("B", 0, 1, 1) in rows


def test_stateful_timeout_evicts_state():
    """The ProcessingTimeTimeout path (continuous-tail mode) evicts the
    key's state instead of re-arming forever (round-2 advice item #1).
    Driven directly with a stub GroupState — firing a real 1 h timeout in a
    test is not practical."""
    from nifi_daffodil_spark.streaming.stateful import _track

    class _Stub:
        def __init__(self, timed_out):
            self.hasTimedOut = timed_out
            self.exists = False
            self.removed = False
            self.updated = None
            self.armed = False

        def remove(self):
            self.removed = True

        def update(self, v):
            self.updated = v

        def setTimeoutDuration(self, ms):
            self.armed = True

    # timeout fired: state removed, nothing emitted, timer NOT re-armed
    st = _Stub(timed_out=True)
    out = list(_track(("conv",), iter([]), st))
    assert out == [] and st.removed and not st.armed and st.updated is None

    # normal batch: state updated and the eviction timer armed
    import pandas as pd

    st2 = _Stub(timed_out=False)
    out2 = list(_track(("conv",), iter([pd.DataFrame({"turn_idx": [0, 1]})]), st2))
    assert len(out2) == 1 and st2.updated is not None and st2.armed
    # arm_timeout=False (availableNow mode) must not arm the timer
    st3 = _Stub(timed_out=False)
    list(_track(("conv",), iter([pd.DataFrame({"turn_idx": [0]})]), st3, arm_timeout=False))
    assert not st3.armed


def test_stateful_timeout_real_store_eviction(spark, tmp_path):
    """Eviction through the REAL state store (round-3 verdict item #8): a
    continuous processing-time-trigger run with a short idle timeout. Conv
    A's state must be evicted after it sits idle past the timeout, proven
    by its counters RESTARTING (n_events back to 1) when A reappears —
    without eviction the carried state would read n_events=3."""
    import time

    from nifi_daffodil_spark.streaming.stateful import track_conv_progress

    src = tmp_path / "ev_src"
    src.mkdir()

    def _write(name, rows):
        spark.createDataFrame(rows, "conv_id string, turn_idx int").coalesce(
            1
        ).write.parquet(str(src / name))

    def _rows():
        return [
            (r["conv_id"], r["max_turn"], r["n_events"])
            for r in spark.table("evict_probe").collect()
        ]

    def _wait(cond, timeout=120):
        t0 = time.monotonic()
        while time.monotonic() - t0 < timeout:
            if cond(_rows()):
                return True
            time.sleep(0.5)
        return False

    _write("a.parquet", [("A", 0), ("A", 1)])
    q = (
        track_conv_progress(
            spark.readStream.schema("conv_id string, turn_idx int")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src) + "/*.parquet"),
            evict_idle=True,
            idle_timeout_ms=2000,
        )
        .writeStream.format("memory")
        .queryName("evict_probe")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ev_ckpt"))
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        assert _wait(lambda rs: ("A", 1, 2) in rs), "initial A batch missing"
        # A goes idle past the 2 s timeout; conv B keeps batches flowing
        # (processing-time timeouts are checked every trigger regardless)
        time.sleep(3.0)
        _write("b.parquet", [("B", 0)])
        assert _wait(lambda rs: ("B", 0, 1) in rs), "B batch missing"
        time.sleep(3.0)  # ensure A's timeout batch has fired
        _write("c.parquet", [("A", 5)])
        assert _wait(
            lambda rs: ("A", 5, 1) in rs
        ), f"A state not evicted (expected restart at n_events=1): {_rows()}"
        assert ("A", 5, 3) not in _rows(), "state survived the timeout"
    finally:
        q.stop()
        q.awaitTermination(60)


def test_stateful_null_turn_idx_does_not_crash():
    """Raw pre-validation WAL rows can carry NULL turn_idx (NaN after
    Arrow->pandas); astype('int64') on NaN raises and would kill the whole
    metrics query (code-review regression test)."""
    import numpy as np
    import pandas as pd

    from nifi_daffodil_spark.streaming.stateful import _track

    class _Stub:
        hasTimedOut = False
        exists = False

        def update(self, v):
            self.updated = v

        def setTimeoutDuration(self, ms):
            pass

    st = _Stub()
    pdf = pd.DataFrame({"turn_idx": [0.0, np.nan, 2.0]})
    (row,) = list(_track(("conv",), iter([pdf]), st))
    assert row["n_events"].iloc[0] == 3   # null-turn row still counted
    assert row["max_turn"].iloc[0] == 2
    assert row["contiguous"].iloc[0] == 0  # turn 1 genuinely missing
