"""Within-batch last-writer-wins dedup (the engine's core reducer).

No reference analog — nifi-daffodil processes one record at a time and never
dedups (SURVEY.md §2.b "Distinct / dedup"). The north rule mandates exactly
this shape (BASELINE.json:6): window/row_number LWW by (conv_id, turn_idx)
ordered by lsn descending.

Scale notes:
  * The window partition key includes turn_idx, so a hot conv_id (Zipf skew)
    spreads across partitions — the skew unit is a single (conv, turn), which
    is bounded by the update rate of one turn, not conversation size.
  * row_number (not max+join): one shuffle, one sort, no self-join.
  * WAL lsns are a total order, so ties between genuine events are
    impossible by construction; `op` is carried through so D survives as
    the winning tombstone. SYNTHETIC tombstones (retention expiry fences at
    max(state lsn)+1, which the producer's next genuine lsn may equal) are
    the one tie source — the secondary sort key makes a genuine event beat
    a tombstone at equal lsn deterministically, everywhere the fold runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def lww_tiebreak_order(order_col: str = "lsn") -> list:
    """The LWW sort key: lsn descending, then non-tombstones before
    tombstones — a genuine event at the same lsn beats a synthetic D.
    Shared by the batch reducer and the sink's merge-on-read fold so the
    two can never disagree on a winner."""
    return [F.col(order_col).desc(), (F.col("op") == "D").asc()]


def lww_dedup(
    df: DataFrame,
    keys: tuple[str, ...] = ("conv_id", "turn_idx"),
    order_col: str = "lsn",
) -> DataFrame:
    w = Window.partitionBy(*keys).orderBy(*lww_tiebreak_order(order_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
