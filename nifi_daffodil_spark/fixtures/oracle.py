"""Independent pandas replay oracle for golden final-state tests.

Implements the SAME contract as the engine (validation tiers, LWW by lsn,
delete tombstones, text canonicalization) in plain pandas — a different
execution engine, so agreement is evidence, not tautology. The
normalization kernel itself is pinned separately by literal golden cases in
tests/test_normalize.py (SURVEY.md §7 hard-part 3).
"""

from __future__ import annotations

import pandas as pd
import pyarrow.parquet as pq

from nifi_daffodil_spark.functions.normalize import normalize_text_py
from nifi_daffodil_spark.schemas import INT32_MAX, VALID_OPS, VALID_ROLES


def load_segments(paths: list[str]) -> pd.DataFrame:
    frames = []
    for p in paths:
        df = pq.read_table(p).to_pandas()
        if "tool" not in df.columns:
            df["tool"] = None
        df["turn_idx"] = df["turn_idx"].astype("Int64")
        frames.append(df)
    return pd.concat(frames, ignore_index=True)


def validity_mask(df: pd.DataFrame, mode: str, max_text_len: int) -> pd.Series:
    ok = df["conv_id"].notna() & df["turn_idx"].notna()
    if mode in ("limited", "full"):
        ok &= (df["turn_idx"] >= 0) & (df["turn_idx"] <= INT32_MAX)
        ok &= df["ts"].notna()
        ok &= df["op"].isin(VALID_OPS)
    if mode == "full":
        ok &= df["role"].isna() | df["role"].isin(VALID_ROLES)
        ok &= df["text"].isna() | (df["text"].str.len() <= max_text_len)
    return ok


def replay_oracle(
    segment_paths: list[str],
    mode: str = "full",
    max_text_len: int = 65536,
) -> tuple[pd.DataFrame, int]:
    """Returns (final transcripts sorted by (conv_id, turn_idx), n_quarantined)."""
    df = load_segments(segment_paths)
    ok = validity_mask(df, mode, max_text_len)
    n_quar = int((~ok).sum())
    valid = df[ok].sort_values("lsn", kind="mergesort")
    last = valid.drop_duplicates(["conv_id", "turn_idx"], keep="last")
    alive = last[last["op"] != "D"].copy()
    alive["text"] = alive["text"].map(normalize_text_py, na_action="ignore")
    alive["turn_idx"] = alive["turn_idx"].astype("int32")
    out = (
        alive[["conv_id", "turn_idx", "role", "text", "tool", "ts"]]
        .sort_values(["conv_id", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )
    return out, n_quar
