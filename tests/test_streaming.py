"""Structured Streaming: WAL tail, checkpoint resume, exactly-once epochs."""

import shutil

from conftest import SPEC, assert_frames_equal

from nifi_daffodil_spark.config import EngineConfig
from nifi_daffodil_spark.engine import CdcEngine
from nifi_daffodil_spark.fixtures.oracle import replay_oracle
from nifi_daffodil_spark.fixtures.walgen import generate_wal
from nifi_daffodil_spark.sinks.parquet_state import ParquetStateSink


def _engine(spark, root):
    sink = ParquetStateSink(spark, str(root / "table"), n_buckets=16)
    return CdcEngine(spark, sink, EngineConfig(n_buckets=16))


def test_stream_full_replay_matches_oracle(spark, tmp_path, wal):
    eng = _engine(spark, tmp_path)
    q = eng.run_stream(wal["dir"], str(tmp_path / "ckpt"), available_now=True,
                       max_files_per_trigger=2)
    q.awaitTermination(300)
    expected, n_quar = replay_oracle(wal["v0"] + wal["v1"])
    assert_frames_equal(
        eng.sink.read_transcripts().orderBy("conv_id", "turn_idx"), expected
    )
    assert eng.sink.read_quarantine().count() == n_quar
    # multiple micro-batch epochs actually happened + lineage emitted for them
    epochs = set(eng.sink._read_manifest()["epochs"])
    assert len(epochs) >= 2
    lin_epochs = {r["epoch"] for r in eng.sink.read_lineage().select("epoch").distinct().collect()}
    assert lin_epochs == {int(e) for e in epochs}


def test_resume_from_checkpoint_after_kill(spark, tmp_path):
    """Process half the WAL, 'kill', add the rest, restart same checkpoint."""
    wal_dir = tmp_path / "wal2"
    man = generate_wal(str(wal_dir), SPEC)
    # stash the v1 segments outside the watched dirs
    stash = tmp_path / "stash"
    stash.mkdir()
    moved = []
    for p in man["v1"]:
        dest = stash / p.split("/")[-1]
        shutil.move(p, dest)
        moved.append((dest, p))

    eng = _engine(spark, tmp_path)
    ckpt = str(tmp_path / "ckpt2")
    q = eng.run_stream(str(wal_dir), ckpt, available_now=True)
    q.awaitTermination(300)
    epochs_before = set(eng.sink._read_manifest()["epochs"])
    assert eng.sink.read_transcripts().count() > 0

    # segments arrive while the job is down; restart from the same checkpoint
    for dest, orig in moved:
        shutil.move(str(dest), orig)
    q2 = eng.run_stream(str(wal_dir), ckpt, available_now=True)
    q2.awaitTermination(300)

    expected, _ = replay_oracle(man["v0"] + man["v1"])
    assert_frames_equal(
        eng.sink.read_transcripts().orderBy("conv_id", "turn_idx"), expected
    )
    # old epochs were not re-applied (exactly-once), new epochs appended
    epochs_after = set(eng.sink._read_manifest()["epochs"])
    assert epochs_before < epochs_after

    # a third run with nothing new must be a complete no-op
    manifest = eng.sink._read_manifest()
    q3 = eng.run_stream(str(wal_dir), ckpt, available_now=True)
    q3.awaitTermination(300)
    assert eng.sink._read_manifest() == manifest


def test_skewed_hot_key_correct_and_spread(spark, tmp_path):
    """50% of events on one conv_id: result still exact, and the merge-ready
    batch is spread across partitions (no single-partition pileup)."""
    from nifi_daffodil_spark.fixtures.walgen import WalSpec
    from nifi_daffodil_spark.sources.wal import read_wal_dir

    spec = WalSpec(n_events=6000, n_convs=50, n_segments=2, seed=9, hot_frac=0.5)
    wal_dir = tmp_path / "walskew"
    man = generate_wal(str(wal_dir), spec)
    eng = _engine(spark, tmp_path)
    events = read_wal_dir(spark, str(wal_dir))
    # AQE rightly coalesces this tiny shuffle to one partition; disable it to
    # observe the partitioning the same plan produces at scale
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        batch, _ = eng.prepare_batch(events)
        sizes = batch.rdd.glom().map(len).collect()
        total = sum(sizes)
        assert total > 0
        assert max(sizes) < 0.5 * total, f"hot key piled up: {sizes}"
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    eng.process_batch(events, 0)
    expected, _ = replay_oracle(man["v0"] + man["v1"])
    assert_frames_equal(
        eng.sink.read_transcripts().orderBy("conv_id", "turn_idx"), expected
    )


def test_metrics_stream_side_channel(spark, tmp_path, wal):
    """--metrics-stream wiring (round-2 verdict item #8): the watermarked
    windowed counts and the stateful per-conv progress run against the real
    WAL stream and land as parquet; total windowed counts reconcile with the
    WAL's event count."""
    import os

    eng = _engine(spark, tmp_path)
    metrics = str(tmp_path / "metrics")
    qs = eng.run_metrics_stream(
        wal["dir"], metrics, str(tmp_path / "mckpt"), available_now=True,
        max_files_per_trigger=4,
    )
    for q in qs:
        assert q.awaitTermination(300), "metrics availableNow replay must terminate"

    tc = spark.read.parquet(os.path.join(metrics, "turn_counts"))
    prog = spark.read.parquet(os.path.join(metrics, "conv_progress"))
    assert tc.count() > 0 and prog.count() > 0
    assert set(tc.columns) == {"win_start", "win_end", "op", "n", "max_lsn"}
    # append-mode windows each emit once; the WAL fixture has no rows later
    # than its watermark horizon relative to max ts, so every closed window
    # is present and ops partition the events they cover
    assert {r["op"] for r in tc.select("op").distinct().collect()} <= {"I", "U", "D"}
    # stateful progress: update mode emits per batch; the LAST row per conv
    # carries the final n_events — reconcile a sample conversation
    from pyspark.sql import functions as F

    last = (
        prog.groupBy("conv_id").agg(F.max("n_events").alias("n_events"))
    )
    wal_counts = (
        spark.read.parquet(*wal["v0"]).select("conv_id")
        .unionByName(spark.read.parquet(*wal["v1"]).select("conv_id"))
        .groupBy("conv_id").count()
    )
    joined = last.join(wal_counts, "conv_id")
    bad = joined.filter(F.col("n_events") != F.col("count")).count()
    assert bad == 0


# ---------------------------------------------------------------------------
# crash INSIDE an epoch's commit sequence (round-4 verdict #7): the existing
# kill/resume test above kills BETWEEN epochs; these kill between the delta
# data write and (a) the lineage append, (b) the manifest swap — the atomic
# commit — then "restart" with fresh objects over the same root and assert
# the epoch converges to fully-present with data and lineage in agreement.
# ---------------------------------------------------------------------------


class _FaultySink(ParquetStateSink):
    """Fault injection: raise ONCE at a chosen point inside apply_batch's
    commit sequence (delta write -> quarantine -> lineage -> layout ->
    manifest), simulating a driver crash mid-commit."""

    def __init__(self, *a, fail_at: str, **kw):
        # set BEFORE super().__init__: the base ctor writes the bootstrap
        # manifest through our _write_manifest override
        self.fail_at = fail_at
        self.tripped = False
        super().__init__(*a, **kw)

    def _write_lineage(self, rows, snapshot_id, epoch_id):
        if self.fail_at == "lineage" and not self.tripped:
            self.tripped = True
            raise RuntimeError("injected crash before lineage append")
        return super()._write_lineage(rows, snapshot_id, epoch_id)

    def _write_manifest(self, m):
        # trip only on a COMMIT write (an epochs entry present), never the
        # bootstrap manifest written by __init__
        if self.fail_at == "manifest" and not self.tripped and m.get("epochs"):
            self.tripped = True
            raise RuntimeError("injected crash before manifest swap")
        return super()._write_manifest(m)


import pytest  # noqa: E402


@pytest.mark.parametrize("fail_at", ["lineage", "manifest"])
def test_crash_inside_epoch_commit_recovers(spark, tmp_path, wal, fail_at):
    from nifi_daffodil_spark.sources.wal import read_wal_batch

    root = str(tmp_path / "table")
    sink = _FaultySink(spark, root, n_buckets=16, fail_at=fail_at)
    eng = CdcEngine(spark, sink, EngineConfig(n_buckets=16))
    with pytest.raises(RuntimeError, match="injected crash"):
        eng.process_batch(read_wal_batch(spark, wal["v0"], "v0"), 7)

    # fresh objects over the same root = post-crash restart. The failed
    # epoch must be INVISIBLE: not applied, no state rows, no lineage —
    # even in the fail_at="manifest" case where the lineage file and the
    # layout file both exist on disk (orphans of the aborted commit).
    fresh = ParquetStateSink(spark, root, n_buckets=16)
    assert not fresh.epoch_applied(7)
    assert "7" not in fresh._read_manifest()["epochs"]
    assert fresh.read_transcripts().count() == 0
    assert fresh.read_lineage().count() == 0

    # checkpoint redelivery: the SAME batch re-applies under the same epoch
    eng2 = CdcEngine(spark, fresh, EngineConfig(n_buckets=16))
    st = eng2.process_batch(read_wal_batch(spark, wal["v0"], "v0"), 7)
    assert not st.skipped

    expected, n_quar = replay_oracle(wal["v0"])
    assert_frames_equal(
        fresh.read_transcripts().orderBy("conv_id", "turn_idx"), expected
    )
    # data + lineage agree: the lineage rows for the epoch carry exactly the
    # snapshot_id the committed manifest records, and the quarantine
    # partition was replaced, not double-appended
    snap = fresh._read_manifest()["epochs"]["7"]["snapshot_id"]
    lin = fresh.read_lineage().filter("epoch = 7")
    assert lin.count() > 0
    assert [r["snapshot_id"] for r in lin.select("snapshot_id").distinct().collect()] == [snap]
    assert fresh.read_quarantine().count() == n_quar

    # idempotence survives the whole episode: a second delivery no-ops
    assert eng2.process_batch(read_wal_batch(spark, wal["v0"], "v0"), 7).skipped


def test_stream_sessionization_matches_batch(spark, tmp_path, wal):
    """Round-4 verdict #5: event-time gap sessionization (F.session_window)
    over the watermarked WAL tail. The availableNow replay's emitted
    sessions must equal the BATCH session_window query on the same
    segments, restricted to sessions the final watermark closed; the batch
    result is itself cross-checked against the lag/running-sum
    sessionization (the q_sessionize shape), so the built-in and the
    hand-rolled semantics agree. The fixture's WAL spans ~70 minutes of
    event time, so the test uses a 2-minute gap / 1-minute watermark —
    the production default (30 min) would leave every session open."""
    import os
    from datetime import timedelta

    from pyspark.sql import functions as F

    from nifi_daffodil_spark.sources.wal import read_wal_batch

    gap, delay = "2 minutes", "1 minutes"
    eng = _engine(spark, tmp_path)
    metrics = str(tmp_path / "smetrics")
    qs = eng.run_metrics_stream(
        wal["dir"], metrics, str(tmp_path / "sckpt"), available_now=True,
        max_files_per_trigger=3, session_gap=gap, session_watermark=delay,
    )
    for q in qs:
        assert q.awaitTermination(300)

    got = spark.read.parquet(os.path.join(metrics, "sessions"))
    assert got.count() > 0

    ev = (
        read_wal_batch(spark, wal["v0"], "v0").select("conv_id", "ts", "lsn")
        .unionByName(
            read_wal_batch(spark, wal["v1"], "v1").select("conv_id", "ts", "lsn")
        )
    )
    batch = (
        ev.groupBy(F.session_window("ts", gap).alias("win"), "conv_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.max("lsn").alias("max_lsn"))
        .select(
            F.col("win.start").alias("start_ts"),
            F.col("win.end").alias("end_ts"),
            "conv_id", "n_events", "max_lsn",
        )
    )

    cols = ["conv_id", "start_ts", "end_ts", "n_events", "max_lsn"]
    got_rows = {tuple(r) for r in got.select(*cols).collect()}
    batch_rows = {tuple(r) for r in batch.select(*cols).collect()}
    # every streamed session is exactly a batch session (values included)
    assert got_rows <= batch_rows, got_rows - batch_rows
    # every batch session the final watermark SAFELY closed was streamed
    # (10 s margin keeps the assertion off the emit-threshold edge)
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    horizon = max_ts - timedelta(minutes=1, seconds=10)
    must_emit = {t for t in batch_rows if t[2] <= horizon}
    assert must_emit, "fixture produced no safely-closed sessions"
    missing = must_emit - got_rows
    assert not missing, sorted(missing)[:5]

    # built-in session_window == lag/running-sum sessionization (the
    # q_sessionize shape): same (conv, start=min ts, end=max ts + gap, n)
    from pyspark.sql import Window as W

    w = W.partitionBy("conv_id").orderBy("ts", "lsn")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap_us = 120_000_000
    flagged = ev.withColumn(
        "is_new",
        F.when((us - F.lag(us).over(w)).isNull()
               | ((us - F.lag(us).over(w)) > gap_us), 1).otherwise(0),
    )
    run = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    sess = flagged.withColumn("seq", F.sum("is_new").over(run))
    lag_based = (
        sess.groupBy("conv_id", "seq")
        .agg(
            F.min("ts").alias("start_ts"),
            (F.max("ts") + F.expr("INTERVAL 2 MINUTES")).alias("end_ts"),
            F.count(F.lit(1)).alias("n_events"),
            F.max("lsn").alias("max_lsn"),
        )
        .select(*cols)
    )
    assert {tuple(r) for r in lag_based.collect()} == batch_rows
