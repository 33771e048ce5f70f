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
        StructField("turn_mask_hi", LongType()),  # bitmask of turns 63..125 seen
    ]
)

_OUT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("max_turn", IntegerType()),
        StructField("n_events", LongType()),
        # 1 iff turns 0..max_turn all seen; tracked exactly for max_turn<=125
        # (two 63-bit masks), reported 0 (= unknown) beyond that
        StructField("contiguous", IntegerType()),
    ]
)


def _track(
    key,
    pdf_iter,
    state: GroupState,
    arm_timeout: bool = True,
    idle_timeout_ms: int = 3_600_000,
):
    (conv_id,) = key
    if state.hasTimedOut:
        # ProcessingTimeTimeout fired with no new data for this key: evict so
        # the store stays bounded by the ACTIVE key set (re-arming here would
        # keep every key forever and emit a spurious row per key per hour).
        state.remove()
        return
    if state.exists:
        max_turn, n_events, mask_lo, mask_hi = state.get
    else:
        max_turn, n_events, mask_lo, mask_hi = -1, 0, 0, 0
    for pdf in pdf_iter:
        # raw pre-validation WAL rows may carry NULL turn_idx (Arrow->pandas
        # renders them NaN; astype would raise IntCastingNaNError and kill
        # the query) — they count as events but contribute no turn
        turns = pdf["turn_idx"].dropna().astype("int64")
        n_events += len(pdf)
        if len(turns):
            max_turn = max(max_turn, int(turns.max()))
            # bitmask update over the batch's DISTINCT turns (pandas set, not
            # per-row python); two 63-bit words cover turns 0..125. Negative
            # turn_idx (malformed rows, pre-validation) never sets a bit.
            for b in set(turns[(turns >= 0) & (turns < 126)].tolist()):
                if b < 63:
                    mask_lo |= 1 << int(b)
                else:
                    mask_hi |= 1 << (int(b) - 63)
    state.update((int(max_turn), int(n_events), int(mask_lo), int(mask_hi)))
    if arm_timeout:
        state.setTimeoutDuration(idle_timeout_ms)  # evict idle convs
    if 0 <= max_turn < 63:
        contiguous = 1 if mask_lo == (1 << (max_turn + 1)) - 1 else 0
    elif 63 <= max_turn < 126:
        full_lo = (1 << 63) - 1
        contiguous = (
            1
            if (mask_lo == full_lo and mask_hi == (1 << (max_turn - 62)) - 1)
            else 0
        )
    else:
        contiguous = 0  # >125 turns: unknown, documented in _OUT_SCHEMA
    yield pd.DataFrame(
        {
            "conv_id": [conv_id],
            "max_turn": [max_turn],
            "n_events": [n_events],
            "contiguous": [contiguous],
        }
    )


def track_conv_progress(
    events: DataFrame,
    evict_idle: bool = True,
    idle_timeout_ms: int = 3_600_000,
) -> DataFrame:
    """Streaming per-conversation progress: (conv_id, max_turn, n_events,
    contiguous) updated every micro-batch, state kept across batches.

    Input: a streaming DataFrame with (conv_id string, turn_idx int/long).
    Output mode must be `update`.

    evict_idle: arm the ProcessingTimeTimeout (default 1 h via
    idle_timeout_ms) that evicts idle conversations — the bounded-state
    mode for a continuous tail. MUST be
    False under Trigger.AvailableNow: a pending processing-time timeout
    makes AvailableNow keep scheduling empty micro-batches until the
    timeout fires (observed: 100+ empty commits for an 8-file replay), so
    bounded replays run with NoTimeout (their state dies with the query).
    """
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if evict_idle
        else GroupStateTimeout.NoTimeout
    )

    def fn(key, pdf_iter, state):
        return _track(key, pdf_iter, state, arm_timeout=evict_idle,
                      idle_timeout_ms=idle_timeout_ms)

    return (
        events.select("conv_id", "turn_idx")
        .groupBy("conv_id")
        .applyInPandasWithState(
            fn,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=timeout,
        )
    )
