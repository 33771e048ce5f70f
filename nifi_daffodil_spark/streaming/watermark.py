"""Event-time watermarked aggregation — the bounded-state streaming demo.

The engine's core LWW-by-lsn MERGE does not need a watermark: a late row
with a smaller lsn is fenced by the `s.lsn > t.lsn` guard, so state is the
table itself (SURVEY.md §2.b). But any STREAMING AGGREGATION over event
time (per-window turn counts, epoch dashboards) must bound its state or it
grows with the key space forever at 10^10-event scale. `withWatermark`
declares how late data may arrive; Spark then (a) drops aggregation state
for windows older than the watermark and (b) discards later-than-watermark
rows — exactly the bounded-state contract SURVEY.md §2.b promises.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_turn_counts(
    events: DataFrame,
    watermark: str = "10 minutes",
    window_dur: str = "5 minutes",
) -> DataFrame:
    """Per-(event-time window, op) counts with bounded state.

    In append output mode a window emits once, when the watermark passes its
    end; rows arriving after that are dropped (late-data policy), and the
    window's state is freed — memory is proportional to the watermark
    horizon, never to stream length.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_dur).alias("win"), F.col("op"))
        .agg(F.count(F.lit(1)).alias("n"), F.max("lsn").alias("max_lsn"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "op",
            "n",
            "max_lsn",
        )
    )


def sessionized_turn_counts(
    events: DataFrame,
    watermark: str = "10 minutes",
    gap: str = "30 minutes",
) -> DataFrame:
    """Event-time gap sessionization over the WAL tail — the STREAMING
    analog of `plans.driver_queries.q_sessionize` (same
    inactivity-gap-closes-session semantics, 30-minute default), built on
    `F.session_window` so Spark merges windows that an event bridges
    across micro-batches via the state store.

    In append output mode a session emits exactly once, when the
    watermark passes its end (last event ts + gap); its state is then
    freed, so memory is proportional to the number of OPEN sessions
    inside the watermark horizon, never to stream length — the bounded-
    state contract windowed_turn_counts documents, applied to the
    training-pipeline sessionization primitive. Sessions whose last
    event lies within (watermark + gap) of the stream head are still
    open and intentionally unemitted; a later micro-batch (or the next
    availableNow replay) closes them.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("win"), F.col("conv_id"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.max("lsn").alias("max_lsn"))
        .select(
            F.col("win.start").alias("start_ts"),
            F.col("win.end").alias("end_ts"),
            "conv_id",
            "n_events",
            "max_lsn",
        )
    )
