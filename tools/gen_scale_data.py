"""Measurement-only scale-up data generator (optimization round tooling).

Writes an sf1.0-SHAPED dataset (10x sf0.1 row counts, same schemas, same
distributions) under a target dir so optimizations can be measured at the
driver's escalated bench scale (BENCH_r05.json ran at sf=1.0) without the
driver's own generator. This data is for LOCAL PROFILING ONLY:

  * it is NOT used by any query, test, oracle, or bench path;
  * correctness is still proven against /root/testdata/sf* (driver data);
  * nothing here persists results — it only scales INPUTS.

Shapes preserved (inspected from /root/testdata/sf0.1):
  documents   50k rows, 10-100 words from the same 31-word vocab, ~2% of
              docs are near-dup perturbations (Jaccard >= 0.5) of a base doc
  embeddings  20k rows, 64-dim unit float vectors; ~5% sit in small
              near-dup clusters (cosine >= 0.45) around a shared base
  events      1M rows: 15k users x ~66 events, 5 uniform event types,
              30-day ts span, value ~ U(0, 560) 2dp, props='{"k": n}'
  lineitem/orders/customer/part/supplier/nation/region: 10x replication
              of sf0.1 with key offsets (joins keep the same fanout)

Usage: python tools/gen_scale_data.py [dest_dir] [scale]
       (default /tmp/ndspark_sf1 10)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"


def _write(dest: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(dest, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows", flush=True)


def gen_documents(dest: str, scale: int, rng: np.random.Generator) -> None:
    src = pq.read_table(f"{SRC}/documents.parquet")
    vocab = sorted({w for t in src.column("text").to_pylist() for w in t.split()})
    n = src.num_rows * scale
    lens = rng.integers(10, 101, size=n)
    texts: list[str] = []
    langs = ["en", "en", "en", "en", "zh", "es", "fr", "de"]
    out_lang, out_src, out_chars = [], [], []
    for i in range(n):
        if i > 0 and rng.random() < 0.02:
            # near-dup: perturb a recent doc by swapping ~10% of words
            base = texts[int(rng.integers(max(0, i - 50), i))].split()
            for _ in range(max(1, len(base) // 10)):
                base[int(rng.integers(0, len(base)))] = vocab[
                    int(rng.integers(0, len(vocab)))
                ]
            t = " ".join(base)
        else:
            t = " ".join(
                vocab[j] for j in rng.integers(0, len(vocab), size=lens[i])
            )
        texts.append(t)
        out_lang.append(langs[int(rng.integers(0, len(langs)))])
        out_src.append(f"src{int(rng.integers(0, 20))}")
        out_chars.append(len(t))
    _write(
        dest,
        "documents",
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(out_lang),
                "source": pa.array(out_src),
                "n_chars": pa.array(out_chars, pa.int64()),
            }
        ),
    )


def gen_embeddings(dest: str, scale: int, rng: np.random.Generator) -> None:
    n = 2000 * scale
    v = rng.standard_normal((n, 64))
    # implant near-dup clusters: ~5% of rows become a perturbed copy of a
    # nearby base row (cosine well above 0.45)
    for i in range(n):
        if i > 0 and rng.random() < 0.05:
            j = int(rng.integers(max(0, i - 20), i))
            v[i] = v[j] + 0.35 * rng.standard_normal(64)
    v = v / np.linalg.norm(v, axis=1, keepdims=True)
    v32 = v.astype(np.float32)
    _write(
        dest,
        "embeddings",
        pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array(list(v32), pa.list_(pa.float32())),
                "label": pa.array(rng.integers(0, 10, size=n), pa.int32()),
            }
        ),
    )


def gen_events(dest: str, scale: int, rng: np.random.Generator) -> None:
    n = 100_000 * scale
    n_users = 1500 * scale
    types = np.array(["click", "error", "purchase", "signup", "view"])
    ts0 = np.datetime64("2024-01-01T00:00:00", "us")
    span = np.timedelta64(30 * 86400 * 1_000_000, "us")
    ts = ts0 + (rng.random(n) * span.astype("int64")).astype("timedelta64[us]")
    ts = np.sort(ts)
    _write(
        dest,
        "events",
        pa.table(
            {
                "event_id": pa.array(range(n), pa.int64()),
                "ts": pa.array(ts),
                "user_id": pa.array(rng.integers(0, n_users, size=n), pa.int64()),
                "event_type": pa.array(types[rng.integers(0, 5, size=n)]),
                "value": pa.array(np.round(rng.random(n) * 560, 2)),
                "props": pa.array(
                    [f'{{"k": {int(k)}}}' for k in rng.integers(0, 100, size=n)]
                ),
            }
        ),
    )


def replicate(dest: str, name: str, scale: int, offsets: dict[str, int]) -> None:
    src = pq.read_table(f"{SRC}/{name}.parquet")
    parts = []
    for c in range(scale):
        t = src
        for col, base in offsets.items():
            idx = t.schema.get_field_index(col)
            arr = pa.compute.add(t.column(col), pa.scalar(base * c, pa.int64()))
            t = t.set_column(idx, col, arr)
        parts.append(t)
    _write(dest, name, pa.concat_tables(parts))


def main() -> None:
    dest = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ndspark_sf1"
    scale = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(dest, exist_ok=True)
    rng = np.random.default_rng(1234)
    print(f"generating {dest} (scale {scale}x sf0.1)", flush=True)
    gen_documents(dest, scale, rng)
    gen_embeddings(dest, scale, rng)
    gen_events(dest, scale, rng)
    replicate(dest, "orders", scale, {"o_orderkey": 1_000_000, "o_custkey": 15_000})
    replicate(
        dest,
        "lineitem",
        scale,
        {"l_orderkey": 1_000_000, "l_partkey": 100_000, "l_suppkey": 10_000},
    )
    replicate(dest, "customer", scale, {"c_custkey": 15_000})
    replicate(dest, "part", scale, {"p_partkey": 100_000})
    replicate(dest, "supplier", scale, {"s_suppkey": 10_000})
    replicate(dest, "nation", 1, {})
    replicate(dest, "region", 1, {})
    open(os.path.join(dest, "_DONE"), "w").write("ok")
    print("done", flush=True)


if __name__ == "__main__":
    main()
