"""WAL/binlog-tail sources.

Reference analog: the FlowFile queue pull (AbstractDaffodilProcessor.java:400)
— an unbounded stream of records drained in framework-sized batches.

Batch:  `read_wal_batch` loads a set of segment files with their DECLARED
        schema version (never inferSchema — schema-missing is a hard error,
        like the reference's required schema property) and aligns all
        versions to the canonical event shape.
Stream: `read_wal_stream` tails the v0/ and v1/ segment dirs as two file
        streams (each with its own declared schema) unioned after alignment;
        `maxFilesPerTrigger` paces micro-batches (≈ NiFi @SupportsBatching).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from nifi_daffodil_spark.operators.evolution import align_events
from nifi_daffodil_spark.schemas import EVENT_SCHEMA_V0, EVENT_SCHEMA_V1

_VERSION_SCHEMAS = {"v0": EVENT_SCHEMA_V0, "v1": EVENT_SCHEMA_V1}


def read_wal_batch(spark: SparkSession, paths: list[str], version: str) -> DataFrame:
    schema = _VERSION_SCHEMAS[version]
    return align_events(spark.read.schema(schema).parquet(*paths))


def read_wal_dir(spark: SparkSession, wal_dir: str) -> DataFrame:
    """All segments of all versions, aligned and unioned (batch replay)."""
    parts = []
    for v in sorted(_VERSION_SCHEMAS):
        d = os.path.join(wal_dir, v)
        if os.path.isdir(d) and any(f.endswith(".parquet") for f in os.listdir(d)):
            parts.append(read_wal_batch(spark, [d], v))
    if not parts:
        raise FileNotFoundError(f"no WAL segments under {wal_dir}")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def read_wal_stream(
    spark: SparkSession, wal_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    parts = []
    for v, schema in sorted(_VERSION_SCHEMAS.items()):
        d = os.path.join(wal_dir, v)
        if os.path.isdir(d):
            parts.append(
                align_events(
                    spark.readStream.schema(schema)
                    .option("maxFilesPerTrigger", max_files_per_trigger)
                    .parquet(d)
                )
            )
    if not parts:
        raise FileNotFoundError(f"no WAL version dirs under {wal_dir}")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
