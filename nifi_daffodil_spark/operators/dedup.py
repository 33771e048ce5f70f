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
  * lsn is a total order, so ties are impossible by construction; `op` is
    carried through so D survives as the winning tombstone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def lww_dedup(
    df: DataFrame,
    keys: tuple[str, ...] = ("conv_id", "turn_idx"),
    order_col: str = "lsn",
) -> DataFrame:
    w = Window.partitionBy(*keys).orderBy(F.col(order_col).desc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
