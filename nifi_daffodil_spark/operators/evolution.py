"""In-flight schema evolution (BASELINE.json north_star).

The reference selects schemas per record (EL on the schema-path property,
AbstractDaffodilProcessor.java:93,407) but never evolves them; the engine
must: WAL segments written before the `tool` column existed, and with
turn_idx as int32, replay into the evolved table transparently.

`align_events` lifts any event frame (V0 or V1) to the canonical wide shape
EVENT_SCHEMA (tool present, turn_idx int64) — additive columns filled with
NULL, narrower ints widened by cast. Pure projections: no shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nifi_daffodil_spark.schemas import EVENT_SCHEMA

_CANON = [(f.name, f.dataType.simpleString()) for f in EVENT_SCHEMA.fields]


def align_events(df: DataFrame) -> DataFrame:
    cols = []
    have = {c.lower() for c in df.columns}
    for name, dt in _CANON:
        if name.lower() in have:
            cols.append(F.col(name).cast(dt).alias(name))
        else:
            cols.append(F.lit(None).cast(dt).alias(name))
    return df.select(*cols)
