"""Multimodal columns: opaque binary payloads + typed metadata.

Design (per task directive): image/audio/video travel as `binary` columns
with a metadata struct; decode / feature-extract / resize / frame-sample run
as Arrow-vectorized kernels over mapInPandas. The codec step itself is
STUBBED — this container has no image/audio libraries — behind a gated
import: with PIL/soundfile present `decode_image` would decode for real;
without, it raises NotImplementedError while `fake_decode_stats` provides a
deterministic, fully-testable stand-in (byte histograms), so all the Spark
plumbing — schema, batch shape, partitioning, UDF signatures — is real and
tested.

MEDIA_SCHEMA:
    media_id long, kind string (image|audio|video),
    payload binary, meta struct<width int, height int, sample_rate int,
    n_frames int>
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

try:  # pragma: no cover - not installed in this container
    import PIL.Image  # noqa: F401

    HAVE_PIL = True
except Exception:  # pragma: no cover
    HAVE_PIL = False

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 16


def decode_image(payload: bytes):  # pragma: no cover - gated on PIL
    """Real decode path; requires an image codec library."""
    if not HAVE_PIL:
        raise NotImplementedError(
            "image decode requires PIL/opencv — not present in this "
            "container; use fake_decode_stats for the deterministic stand-in"
        )
    import io

    import PIL.Image as Image

    return Image.open(io.BytesIO(payload))


def _byte_histogram(buf: bytes, bins: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic fake 'feature vector': normalized byte histogram."""
    if buf is None or len(buf) == 0:
        return np.zeros(bins)
    arr = np.frombuffer(buf, dtype=np.uint8)
    hist = np.bincount(arr >> 4, minlength=bins).astype(np.float64)
    return hist / hist.sum()


def extract_features(df: DataFrame) -> DataFrame:
    """media frame -> (media_id, kind, n_bytes, features array<double>).

    Arrow batches in/out; numpy per batch; no per-row Python dispatch
    beyond the payload loop (bytes objects are opaque to numpy)."""

    def part(it):
        for pdf in it:
            feats = [_byte_histogram(p).tolist() for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [0 if p is None else len(p) for p in pdf["payload"]],
                    "features": feats,
                }
            )

    return df.mapInPandas(
        part, schema="media_id long, kind string, n_bytes long, features array<double>"
    )


def frame_sample(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling: emits one row per sampled frame index based on
    meta.n_frames (the decode of the frame itself is the stubbed step).
    Demonstrates the explode/fan-out shape a real sampler would have."""
    from pyspark.sql import functions as F

    return (
        df.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.coalesce(F.col("meta.n_frames"), F.lit(1)) - 1, F.lit(0)),
                    F.lit(every_n),
                )
            ).alias("frame_idx"),
        )
    )


def make_fake_media(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table (payload = seeded bytes)."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes(rng.integers(0, 256, size=64 + (i % 5) * 32, dtype=np.uint8))
        meta = {
            "width": 64 if kind == "image" else None,
            "height": 48 if kind == "image" else None,
            "sample_rate": 16000 if kind == "audio" else None,
            "n_frames": 30 * (1 + i % 4) if kind == "video" else None,
        }
        rows.append((i, kind, payload, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
