"""Deterministic synthetic change-event WAL generator (FIXTURES.md §1).

Pure numpy/pyarrow — no Spark, no wall-clock, fixed seed. Plays the role of
the reference's hand-crafted fixtures (tokens.csv, leftover.bin:
nifi-daffodil-processors/src/test/resources/TestDaffodilProcessor/) at
parametric scale.

Fixture guarantees (FIXTURES.md §1 edge-case list):
  * duplicate (conv_id, turn_idx) at different lsn      -> LWW exercise
  * late data: events landing in a LATER segment with a SMALLER lsn
  * D followed by re-I of the same key
  * malformed rows: null conv_id / negative turn_idx / bad role / overlong text
  * text needing canonicalization: CRLF, lone CR, NFD unicode, trailing ws,
    quoted commas, empty, null
  * hot key: one conv_id receives ~hot_frac of all events (skew)
  * schema evolution: segments < evolve_at are V0 (no tool, int32 turn_idx),
    later segments V1 (tool added, turn_idx widened to int64)
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

EPOCH_BASE_US = 1_700_000_000_000_000  # fixed base timestamp (us), no wall-clock

_SPECIAL_TEXTS = [
    "line one\r\nline two\r\n",          # CRLF -> LF
    "carriage\rreturn",                   # lone CR -> LF
    "cafe\u0301 latte",             # NFD e + combining acute -> NFC
    "trailing spaces   ",                 # strip trailing ws
    'a,"quoted,comma",b',                 # tokens.csv:2 quoted-comma analog
    "",                                   # empty string
    None,                                 # null text
]


@dataclass(frozen=True)
class WalSpec:
    n_events: int = 10_000
    n_convs: int = 200
    turns_per_conv: int = 40
    n_segments: int = 8
    seed: int = 42
    hot_frac: float = 0.2        # share of events on the single hot conv_id
    p_delete: float = 0.05
    p_bad: float = 0.02          # malformed rows -> quarantine
    p_late: float = 0.02         # events shipped one segment late (lsn < seen)
    p_overlong: float = 0.005    # text exceeding max_text_len (full validation)
    evolve_at: float = 0.5       # fraction of segments that are schema V0
    max_text_len: int = 65536
    text_len: int = 0            # pad turn text to ~this many bytes (0 = short);
                                 # realistic transcript turns are 0.3-2 KB


def _texts(
    rng: np.random.Generator,
    n: int,
    max_text_len: int,
    p_overlong: float,
    text_len: int = 0,
):
    """Deterministic text column with all canonicalization edge cases."""
    if text_len > 0:
        # realistic-size turns: deterministic filler, varied per row so
        # parquet can't collapse it to a dictionary of one value; only 512
        # distinct pads exist, selected per row — O(n) pointer work
        pad_pool = ["word%04d " % (j * 2654435761 % 9973) for j in range(64)]
        fill = "".join(pad_pool) * 4  # ~2.3 KB pool, sliced per row
        pads = [fill[s : s + text_len] for s in range(512)]
        base = np.fromiter(
            (
                "turn text %d payload %d | %s" % (i, i * 2654435761 % 997, pads[(i * 37) % 512])
                for i in range(n)
            ),
            dtype=object,
            count=n,
        )
    else:
        base = np.fromiter(
            ("turn text %d payload %d" % (i, i * 2654435761 % 997) for i in range(n)),
            dtype=object,
            count=n,
        )
    # sprinkle special texts over ~3% of rows
    idx = rng.choice(n, size=max(1, n // 32), replace=False)
    for j, i in enumerate(idx):
        base[i] = _SPECIAL_TEXTS[j % len(_SPECIAL_TEXTS)]
    # overlong rows
    n_over = int(n * p_overlong)
    if n_over:
        over_idx = rng.choice(n, size=n_over, replace=False)
        for i in over_idx:
            base[i] = "x" * (max_text_len + 17)
    return base


def generate_wal(out_dir: str, spec: WalSpec = WalSpec()) -> dict:
    """Write WAL segments under out_dir/{v0,v1}/seg-NNNN.parquet.

    Returns a manifest dict: segment paths per version, event counts.
    """
    rng = np.random.default_rng(spec.seed)
    n = spec.n_events

    lsn = np.arange(n, dtype=np.int64)

    # conv assignment: hot key takes hot_frac, rest uniform
    is_hot = rng.random(n) < spec.hot_frac
    conv_num = rng.integers(1, spec.n_convs, size=n)
    conv_num[is_hot] = 0  # conv-00000 is the hot key
    turn_idx = rng.integers(0, spec.turns_per_conv, size=n).astype(np.int64)

    roles = np.array(["user", "assistant", "system", "tool"], dtype=object)
    role = roles[rng.integers(0, 4, size=n)]

    op = np.full(n, "U", dtype=object)
    op[rng.random(n) < 0.5] = "I"  # I and U are both upserts; mix freely
    op[rng.random(n) < spec.p_delete] = "D"

    text = _texts(rng, n, spec.max_text_len, spec.p_overlong, spec.text_len)

    tools = np.array([None, "search", "python", "browser"], dtype=object)
    tool = tools[rng.integers(0, 4, size=n)]

    # event time: increasing with jitter -> duplicates + local disorder
    ts_us = EPOCH_BASE_US + lsn * 1_000_000 + rng.integers(-5, 5, size=n) * 1_000_000

    conv_id = np.array(["conv-%05d" % c for c in conv_num], dtype=object)

    # malformed rows (quarantine fixtures)
    bad = rng.random(n) < spec.p_bad
    bad_kind = rng.integers(0, 3, size=n)
    conv_id[bad & (bad_kind == 0)] = None
    turn_idx_obj = turn_idx.copy()
    turn_idx_obj[bad & (bad_kind == 1)] = -1
    role[bad & (bad_kind == 2)] = "robot"

    # segment assignment by lsn, then ship p_late of rows one segment late
    seg_size = (n + spec.n_segments - 1) // spec.n_segments
    seg = (lsn // seg_size).astype(np.int64)
    late = rng.random(n) < spec.p_late
    seg[late] = np.minimum(seg[late] + 1, spec.n_segments - 1)

    n_v0 = max(1, int(spec.n_segments * spec.evolve_at))
    manifest = {"v0": [], "v1": [], "n_events": n, "n_v0_segments": n_v0}

    os.makedirs(os.path.join(out_dir, "v0"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "v1"), exist_ok=True)

    for s in range(spec.n_segments):
        m = seg == s
        cols = {
            "lsn": pa.array(lsn[m], pa.int64()),
            "op": pa.array(op[m], pa.string()),
            "conv_id": pa.array(conv_id[m], pa.string()),
        }
        if s < n_v0:
            cols["turn_idx"] = pa.array(turn_idx_obj[m].astype(np.int32), pa.int32())
            cols["role"] = pa.array(role[m], pa.string())
            cols["text"] = pa.array(text[m], pa.string())
            cols["ts"] = pa.array(ts_us[m], pa.timestamp("us"))
            path = os.path.join(out_dir, "v0", "seg-%04d.parquet" % s)
            manifest["v0"].append(path)
        else:
            cols["turn_idx"] = pa.array(turn_idx_obj[m], pa.int64())
            cols["role"] = pa.array(role[m], pa.string())
            cols["text"] = pa.array(text[m], pa.string())
            cols["tool"] = pa.array(tool[m], pa.string())
            cols["ts"] = pa.array(ts_us[m], pa.timestamp("us"))
            path = os.path.join(out_dir, "v1", "seg-%04d.parquet" % s)
            manifest["v1"].append(path)
        pq.write_table(pa.table(cols), path)

    return manifest


def generate_enveloped_wal(out_dir: str, spec: WalSpec = WalSpec()) -> dict:
    """Enveloped variant: payload JSON + declared payload_len, including a
    trailing-garbage fixture (leftover.bin analog, TestDaffodilProcessor.java:295-304):
    ~1% of rows carry payload longer than payload_len (exactly-consumed violation)
    and ~1% malformed JSON (parse failure).
    """
    import json

    rng = np.random.default_rng(spec.seed + 1)
    n = spec.n_events
    lsn = np.arange(n, dtype=np.int64)
    conv_id = np.array(["conv-%05d" % c for c in rng.integers(0, spec.n_convs, n)], dtype=object)
    turn_idx = rng.integers(0, spec.turns_per_conv, n).astype(np.int64)
    roles = np.array(["user", "assistant", "system", "tool"], dtype=object)
    payloads = np.empty(n, dtype=object)
    plen = np.empty(n, dtype=np.int64)
    kind = rng.random(n)
    for i in range(n):
        body = json.dumps(
            {"role": roles[i % 4], "text": "turn %d" % i, "tool": None},
            separators=(",", ":"),
        )
        if kind[i] < 0.01:  # leftover garbage after declared length
            payloads[i] = body + "GARBAGE"
            plen[i] = len(body)
        elif kind[i] < 0.02:  # malformed JSON
            payloads[i] = body[: len(body) // 2]
            plen[i] = len(payloads[i])
        else:
            payloads[i] = body
            plen[i] = len(body)
    op = np.full(n, "I", dtype=object)
    ts_us = EPOCH_BASE_US + lsn * 1_000_000
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "enveloped.parquet")
    pq.write_table(
        pa.table(
            {
                "lsn": pa.array(lsn, pa.int64()),
                "op": pa.array(op, pa.string()),
                "conv_id": pa.array(conv_id, pa.string()),
                "turn_idx": pa.array(turn_idx, pa.int64()),
                "ts": pa.array(ts_us, pa.timestamp("us")),
                "payload": pa.array(payloads, pa.string()),
                "payload_len": pa.array(plen, pa.int64()),
            }
        ),
        path,
    )
    return {"path": path, "n_events": n}
