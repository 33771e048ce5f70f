"""Bucket-versioned parquet last-state sink — a minimal snapshot table.

Design (scale rationale):
  * The table is hash-bucketed by conv_id: bucket = pmod(xxhash64(conv_id), N)
    — same layout Iceberg `bucket(N, conv_id)` would give (SURVEY.md §4 item 5).
  * Each epoch rewrites ONLY the buckets its batch touches. Per-epoch work is
    proportional to touched data, never to table size — the property that
    keeps a 100 TB table mergeable.
  * A snapshot = a directory `data/snap-NNNNNN/bucket=K/...`; the manifest
    maps every bucket to the snapshot that last wrote it. Commits are an
    atomic manifest swap (os.replace), so a crash mid-write leaves only
    orphan files, never a torn table (reference analog: copy-on-write
    session commit, AbstractDaffodilProcessor.java:479-486).
  * Exactly-once: the manifest records applied epoch ids; re-applying an
    epoch is a no-op (idempotent replay, BASELINE.json:6).

MERGE itself is pure Spark: (current rows of touched buckets) UNION
(batch rows) -> row_number LWW by (conv_id, turn_idx) over lsn -> drop
tombstone winners. State rows carry their commit lsn, so a late batch row
with a smaller lsn can never overwrite newer state (the `s.lsn > t.lsn`
MERGE guard).
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nifi_daffodil_spark.schemas import (
    LINEAGE_SCHEMA,
    QUARANTINE_SCHEMA,
    STATE_SCHEMA,
    TRANSCRIPT_SCHEMA,
)
from nifi_daffodil_spark.sinks.base import TranscriptSink

_STATE_COLS = [f.name for f in STATE_SCHEMA.fields]  # transcript cols + lsn

#: on-disk state keeps the op column: a delete is persisted as a TOMBSTONE
#: row (op='D') so its lsn keeps guarding against late, smaller-lsn events
#: for the same key. Without this, a late row arriving after a delete would
#: resurrect the key. Tombstones are reclaimed by compact_tombstones().
_FILE_SCHEMA = T.StructType(
    list(STATE_SCHEMA.fields) + [T.StructField("op", T.StringType(), False)]
)


class ParquetStateSink(TranscriptSink):
    def __init__(self, spark: SparkSession, root: str, n_buckets: int = 32):
        self.spark = spark
        self.root = root
        self.n_buckets = n_buckets
        os.makedirs(os.path.join(root, "data"), exist_ok=True)
        os.makedirs(os.path.join(root, "quarantine"), exist_ok=True)
        os.makedirs(os.path.join(root, "lineage"), exist_ok=True)
        if not os.path.exists(self._manifest_path()):
            self._write_manifest({"counter": 0, "buckets": {}, "epochs": {}})

    # ---- manifest ---------------------------------------------------------

    def _manifest_path(self) -> str:
        return os.path.join(self.root, "manifest.json")

    def _read_manifest(self) -> dict:
        with open(self._manifest_path()) as f:
            return json.load(f)

    def _write_manifest(self, m: dict) -> None:
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f, indent=1, sort_keys=True)
        os.replace(tmp, self._manifest_path())  # atomic commit point

    # ---- sink API ---------------------------------------------------------

    def epoch_applied(self, epoch_id: int) -> bool:
        return str(epoch_id) in self._read_manifest()["epochs"]

    def _bucket_paths(self, manifest: dict, buckets: list[int]) -> list[str]:
        paths = []
        for b in buckets:
            snap = manifest["buckets"].get(str(b))
            if snap is not None:
                paths.append(os.path.join(self.root, "data", snap, f"bucket={b}"))
        return paths

    def _read_buckets(self, manifest: dict, buckets: list[int]) -> DataFrame | None:
        """State rows of the given buckets. Bucket dirs may live in different
        snapshots; group by snapshot so each read keeps partition discovery."""
        by_snap: dict[str, list[int]] = {}
        for b in buckets:
            snap = manifest["buckets"].get(str(b))
            if snap is not None:
                by_snap.setdefault(snap, []).append(b)
        if not by_snap:
            return None
        parts = []
        for snap, bs in by_snap.items():
            base = os.path.join(self.root, "data", snap)
            paths = [os.path.join(base, f"bucket={b}") for b in bs]
            parts.append(
                self.spark.read.option("basePath", base).schema(
                    _FILE_SCHEMA
                ).parquet(*paths).withColumn(
                    "bucket", F.pmod(F.xxhash64("conv_id"), F.lit(self.n_buckets)).cast("int")
                )
            )
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        return df

    def apply_batch(
        self,
        batch: DataFrame,
        epoch_id: int,
        quarantine: DataFrame | None = None,
        lineage: list[tuple] | None = None,
        touched: list[int] | None = None,
    ) -> dict:
        """batch columns: conv_id, turn_idx, role, text, tool, ts, lsn, op,
        bucket — already deduped to one row per (conv_id, turn_idx).
        `lineage` is a driver-side list of LINEAGE_SCHEMA tuples (already
        aggregated) — written with pyarrow, zero Spark jobs."""
        import os as _os

        _timing = _os.environ.get("NDS_TIMING") == "1"

        def _tl(label: str, tprev: float) -> float:
            if _timing:
                print(f"[sink] {label}: {time.monotonic() - tprev:.2f}s", flush=True)
            return time.monotonic()

        t0 = time.monotonic()
        manifest = self._read_manifest()
        if str(epoch_id) in manifest["epochs"]:
            return {"skipped": True, "epoch": epoch_id,
                    "snapshot_id": manifest["epochs"][str(epoch_id)]["snapshot_id"]}

        tprev = time.monotonic()
        try:
            if touched is None:
                batch = batch.persist()
                touched = sorted(
                    r["bucket"] for r in batch.select("bucket").distinct().collect()
                )
            current = self._read_buckets(manifest, touched)

            src = batch.select(*_STATE_COLS, "op", "bucket")
            if current is not None:
                merged = current.select(*_STATE_COLS, "op", "bucket").unionByName(src)
            else:
                merged = src
            w = Window.partitionBy("conv_id", "turn_idx").orderBy(F.col("lsn").desc())
            # winners INCLUDING tombstones — a winning D persists so its lsn
            # keeps fencing out late smaller-lsn rows for the same key
            new_state = (
                merged.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .select(*_STATE_COLS, "op", "bucket")
            )

            tprev = _tl("plan merge", tprev)
            counter = manifest["counter"] + 1
            snap = f"snap-{counter:06d}"
            snap_dir = os.path.join(self.root, "data", snap)
            (
                new_state.repartition("bucket")
                .write.mode("overwrite")
                .partitionBy("bucket")
                .parquet(snap_dir)
            )
            tprev = _tl("merge write", tprev)
            # buckets that were touched but ended empty (all rows deleted)
            # may not materialize a dir; they must still repoint (to nothing)
            written = {
                int(d.split("=", 1)[1])
                for d in os.listdir(snap_dir)
                if d.startswith("bucket=")
            }

            snapshot_id = f"{snap}-{uuid.uuid5(uuid.NAMESPACE_URL, f'{self.root}/{epoch_id}')}"
            if quarantine is not None:
                quarantine.withColumn("epoch", F.lit(int(epoch_id))).select(
                    [f.name for f in QUARANTINE_SCHEMA.fields]
                ).write.mode("append").parquet(os.path.join(self.root, "quarantine"))
            tprev = _tl("quarantine write", tprev)
            if lineage:
                self._write_lineage(lineage, snapshot_id, epoch_id)

            for b in touched:
                if b in written:
                    manifest["buckets"][str(b)] = snap
                else:
                    manifest["buckets"].pop(str(b), None)
            manifest["counter"] = counter
            manifest["epochs"][str(epoch_id)] = {
                "snapshot_id": snapshot_id,
                "buckets": touched,
                "wall_ms": int((time.monotonic() - t0) * 1000),
            }
            self._write_manifest(manifest)  # the atomic commit
            return {"skipped": False, "epoch": epoch_id, "snapshot_id": snapshot_id,
                    "buckets": touched}
        finally:
            batch.unpersist()

    def _write_lineage(self, rows: list[tuple], snapshot_id: str, epoch_id: int) -> None:
        """Per-partition lineage append — pure pyarrow on the driver (the
        rows are already aggregated); no Spark job for a <=n_buckets-row write."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        cols = list(zip(*rows, strict=True))
        names = [f.name for f in LINEAGE_SCHEMA.fields]
        snap_idx = names.index("snapshot_id")
        arrays = []
        for i, f in enumerate(LINEAGE_SCHEMA.fields):
            if i == snap_idx:
                arrays.append(pa.array([snapshot_id] * len(rows), pa.string()))
            elif f.dataType.simpleString() == "int":
                arrays.append(pa.array(cols[i], pa.int32()))
            else:
                arrays.append(pa.array(cols[i], pa.int64()))
        pq.write_table(
            pa.table(dict(zip(names, arrays, strict=True))),
            os.path.join(self.root, "lineage", f"epoch-{int(epoch_id):08d}.parquet"),
        )

    def read_transcripts(self) -> DataFrame:
        m = self._read_manifest()
        df = self._read_buckets(m, [int(b) for b in m["buckets"]])
        if df is None:
            return self.spark.createDataFrame([], TRANSCRIPT_SCHEMA)
        return df.filter(F.col("op") != "D").select(
            [f.name for f in TRANSCRIPT_SCHEMA.fields]
        )

    def read_state(self) -> DataFrame | None:
        m = self._read_manifest()
        return self._read_buckets(m, [int(b) for b in m["buckets"]])

    def read_quarantine(self) -> DataFrame:
        qdir = os.path.join(self.root, "quarantine")
        if not any(n.endswith(".parquet") for _, _, fs in os.walk(qdir) for n in fs):
            return self.spark.createDataFrame([], QUARANTINE_SCHEMA)
        return self.spark.read.schema(QUARANTINE_SCHEMA).parquet(qdir)

    def read_lineage(self) -> DataFrame:
        ldir = os.path.join(self.root, "lineage")
        if not any(n.endswith(".parquet") for _, _, fs in os.walk(ldir) for n in fs):
            return self.spark.createDataFrame([], LINEAGE_SCHEMA)
        return self.spark.read.schema(LINEAGE_SCHEMA).parquet(ldir)

    def compact_tombstones(self, lsn_horizon: int) -> None:
        """Reclaim delete tombstones whose lsn is older than the replay
        horizon (no event with a smaller lsn can still arrive). Rewrites
        every bucket once — run this as an offline maintenance pass, like
        Iceberg's rewrite_data_files."""
        m = self._read_manifest()
        buckets = [int(b) for b in m["buckets"]]
        df = self._read_buckets(m, buckets)
        if df is None:
            return
        kept = df.filter(~((F.col("op") == "D") & (F.col("lsn") < lsn_horizon)))
        counter = m["counter"] + 1
        snap = f"snap-{counter:06d}"
        snap_dir = os.path.join(self.root, "data", snap)
        kept.select(*_STATE_COLS, "op", "bucket").repartition("bucket").write.mode(
            "overwrite"
        ).partitionBy("bucket").parquet(snap_dir)
        written = {
            int(d.split("=", 1)[1])
            for d in os.listdir(snap_dir)
            if d.startswith("bucket=")
        }
        m["buckets"] = {str(b): snap for b in written}
        m["counter"] = counter
        self._write_manifest(m)

    def vacuum(self, keep_last: int = 4) -> list[str]:
        """Remove snapshot dirs no bucket references, older than counter-keep_last."""
        m = self._read_manifest()
        referenced = set(m["buckets"].values())
        removed = []
        data_dir = os.path.join(self.root, "data")
        for d in sorted(os.listdir(data_dir)):
            if not d.startswith("snap-"):
                continue
            num = int(d.split("-")[1])
            if d not in referenced and num <= m["counter"] - keep_last:
                shutil.rmtree(os.path.join(data_dir, d))
                removed.append(d)
        return removed
