"""Declared StructTypes — the engine's "compiled DFDL schemas".

The reference never infers schemas: the DFDL schema file is a required
property and compilation fails fast on an invalid one
(AbstractDaffodilProcessor.java:88-95,307-317). We mirror that: every
read passes an explicit StructType, never inferSchema.

Schema versions model in-flight evolution (BASELINE.json north_star):
  * V0 — early WAL segments: no `tool` column, turn_idx int32
  * V1 — later segments: added `tool`, turn_idx widened to int64
Target table is the input_hint shape (BASELINE.json:15).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---- change-event WAL (source) ------------------------------------------

EVENT_SCHEMA_V0 = T.StructType(
    [
        T.StructField("lsn", T.LongType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("conv_id", T.StringType(), True),
        T.StructField("turn_idx", T.IntegerType(), True),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

EVENT_SCHEMA_V1 = T.StructType(
    [
        T.StructField("lsn", T.LongType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("conv_id", T.StringType(), True),
        T.StructField("turn_idx", T.LongType(), True),  # widened int32 -> int64
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),  # added column
        T.StructField("ts", T.TimestampType(), True),
    ]
)

#: normalized in-flight event shape every pipeline stage agrees on
#: (turn_idx kept wide until validation bounds it back to int32)
EVENT_SCHEMA = EVENT_SCHEMA_V1

#: enveloped variant: raw JSON payload + declared length for the
#: exactly-consumed check (DaffodilParse.java:92-98 analog)
EVENT_ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("lsn", T.LongType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("conv_id", T.StringType(), True),
        T.StructField("turn_idx", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("payload", T.StringType(), True),
        T.StructField("payload_len", T.LongType(), True),
    ]
)

#: the typed tree produced by the parse stage (the "infoset")
PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
    ]
)

# ---- target table (input_hint: BASELINE.json:15) -------------------------

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

#: internal state = transcript + LWW bookkeeping (lsn guard for MERGE)
STATE_SCHEMA = T.StructType(
    list(TRANSCRIPT_SCHEMA.fields) + [T.StructField("lsn", T.LongType(), False)]
)

# ---- quarantine (failure route; FIXTURES.md §3) ---------------------------

QUARANTINE_SCHEMA = T.StructType(
    [
        T.StructField("lsn", T.LongType(), True),
        T.StructField("raw", T.StringType(), True),  # original payload verbatim
        T.StructField("error", T.StringType(), True),
        T.StructField("epoch", T.LongType(), True),
    ]
)

# ---- lineage (provenance analog; FIXTURES.md §4, per-partition) -----------

LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("epoch", T.LongType(), False),
        T.StructField("bucket", T.IntegerType(), False),  # -1 = whole-epoch row
        T.StructField("lsn_min", T.LongType(), True),
        T.StructField("lsn_max", T.LongType(), True),
        T.StructField("rows_in", T.LongType(), True),
        T.StructField("rows_applied", T.LongType(), True),
        T.StructField("rows_quarantined", T.LongType(), True),
        T.StructField("snapshot_id", T.StringType(), True),
        T.StructField("wall_ms", T.LongType(), True),
    ]
)

VALID_ROLES = ("user", "assistant", "system", "tool")
VALID_OPS = ("I", "U", "D")
INT32_MAX = 2**31 - 1
