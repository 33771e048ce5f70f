"""Small shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_scan(df: DataFrame) -> DataFrame:
    """Adaptive scan-parallelism floor for MAP-HEAVY plans (guide §2.5
    input skew): single-file/single-row-group parquet inputs scan as ONE
    task no matter the core count, so a round-robin repartition to the
    session's parallelism spreads expensive per-row work for the price of
    one cheap exchange of the raw rows. No-op when the scan already has
    enough splits — well-laid-out inputs at scale skip the exchange
    entirely. Only worth it when per-row compute clearly exceeds exchange
    cost; aggregation-first or window-first plans should keep their own
    exchange as the parallelism point instead (A/B-measured in round 6:
    the same exchange HURTS those)."""
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        return df.repartition(sc.defaultParallelism)
    return df
