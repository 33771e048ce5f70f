"""Custom stateful streaming operator via applyInPandasWithState.

The engine's core cross-batch state is the lake table itself (LWW MERGE by
lsn — no state store, deliberate at 10^10-event scale, SURVEY.md §2.b). But
some per-key STREAMING metrics genuinely need incremental state that isn't a
table: here, per-conversation progress tracking — highest turn seen, event
count, and contiguity (are turns 0..max all present?) — maintained across
micro-batches with Arrow-batched state (no per-row Python), state evicted by
processing-time timeout so the store stays bounded by the active-key set.

This is the pattern for any custom stateful operator the built-in windowed
aggregations can't express (the task directive's applyInPandasWithState
slot).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: state carried per conv_id across micro-batches
_STATE_SCHEMA = StructType(
    [
        StructField("max_turn", IntegerType()),
        StructField("n_events", LongType()),
        StructField("turn_mask_lo", LongType()),  # bitmask of turns 0..62 seen
    ]
)

_OUT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("max_turn", IntegerType()),
        StructField("n_events", LongType()),
        StructField("contiguous", IntegerType()),  # 1 iff turns 0..max_turn all seen
    ]
)


def _track(key, pdf_iter, state: GroupState):
    (conv_id,) = key
    if state.exists:
        max_turn, n_events, mask = state.get
    else:
        max_turn, n_events, mask = -1, 0, 0
    for pdf in pdf_iter:
        turns = pdf["turn_idx"].astype("int64")
        n_events += len(pdf)
        if len(turns):
            max_turn = max(max_turn, int(turns.max()))
            # vectorized bitmask update for turns < 63 (pandas, not per-row python)
            small = turns[turns < 63]
            for b in set(small.tolist()):
                mask |= 1 << int(b)
    state.update((int(max_turn), int(n_events), int(mask)))
    state.setTimeoutDuration(3_600_000)  # evict idle conversations after 1 h
    want = (1 << (max_turn + 1)) - 1 if 0 <= max_turn < 63 else 0
    contiguous = 1 if (max_turn >= 0 and max_turn < 63 and mask == want) else 0
    yield pd.DataFrame(
        {
            "conv_id": [conv_id],
            "max_turn": [max_turn],
            "n_events": [n_events],
            "contiguous": [contiguous],
        }
    )


def track_conv_progress(events: DataFrame) -> DataFrame:
    """Streaming per-conversation progress: (conv_id, max_turn, n_events,
    contiguous) updated every micro-batch, state kept across batches.

    Input: a streaming DataFrame with (conv_id string, turn_idx int/long).
    Output mode must be `update`.
    """
    return (
        events.select("conv_id", "turn_idx")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _track,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
