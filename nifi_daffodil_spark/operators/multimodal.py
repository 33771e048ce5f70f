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


# ---- real decode tier: uncompressed BMP / PCM WAV, pure numpy --------------
# (round-2 verdict item #5: these container formats are public and fully
# parseable without codec libraries; PIL-gating remains only for COMPRESSED
# formats like JPEG/PNG/MP3.)

def bmp_bytes(width: int, height: int, pixel_bytes: bytes) -> bytes:
    """Minimal 24-bpp uncompressed BMP (BITMAPINFOHEADER). pixel_bytes must
    be width*3 per row, rows padded to 4 bytes by this function."""
    import struct

    stride = (width * 3 + 3) // 4 * 4
    rows = []
    for r in range(height):
        row = pixel_bytes[r * width * 3:(r + 1) * width * 3]
        rows.append(row + b"\x00" * (stride - len(row)))
    data = b"".join(rows)
    header = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                       len(data), 2835, 2835, 0, 0)
    return header + info + data


def wav_bytes(sample_rate: int, samples_le16: bytes) -> bytes:
    """Minimal mono 16-bit PCM WAV."""
    import struct

    n = len(samples_le16)
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (
        b"RIFF" + struct.pack("<I", 36 + n) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", n) + samples_le16
    )


def decode_bmp(buf: bytes) -> dict:
    """Parse an uncompressed 24-bpp BMP: width, height, mean pixel value
    (padding bytes excluded). Raises ValueError on anything else."""
    import struct

    if buf is None or len(buf) < 54 or buf[:2] != b"BM":
        raise ValueError("NOT_BMP")
    offset = struct.unpack_from("<I", buf, 10)[0]
    width, height = struct.unpack_from("<ii", buf, 18)
    bpp = struct.unpack_from("<H", buf, 28)[0]
    compression = struct.unpack_from("<I", buf, 30)[0]
    if compression != 0 or bpp != 24:
        raise ValueError("UNSUPPORTED_CODEC")
    h = abs(height)
    stride = (width * 3 + 3) // 4 * 4
    if len(buf) < offset + stride * h:
        raise ValueError("TRUNCATED")
    rows = np.frombuffer(buf, dtype=np.uint8, count=stride * h, offset=offset)
    pix = rows.reshape(h, stride)[:, : width * 3]  # drop row padding
    return {"width": width, "height": h, "mean_value": float(pix.mean())}


def decode_wav(buf: bytes) -> dict:
    """Parse a PCM WAV: sample_rate, n_samples, mean int16 sample value.
    Walks RIFF chunks properly (fmt /data in any order, extra chunks ok)."""
    import struct

    if buf is None or len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("NOT_WAV")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(buf):
        cid, sz = buf[pos:pos + 4], struct.unpack_from("<I", buf, pos + 4)[0]
        body = buf[pos + 8:pos + 8 + sz]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("TRUNCATED")
    audio_format, channels, rate, _, _, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError("UNSUPPORTED_CODEC")
    samples = np.frombuffer(data, dtype="<i2")
    n = len(samples) // channels
    return {
        "sample_rate": int(rate),
        "n_samples": int(n),
        "mean_value": float(samples.astype(np.float64).mean()) if n else 0.0,
    }


def decode_media(df: DataFrame) -> DataFrame:
    """Real decode over Arrow batches: BMP for kind=image, WAV for
    kind=audio; anything undecodable gets error set (quarantine-style, the
    payload is never lost). Compressed formats still require PIL — that
    gate now applies only to them.

    Output: media_id, kind, width, height, sample_rate, n_samples,
    mean_value, error.
    """

    def part(it):
        for pdf in it:
            out = {
                "media_id": pdf["media_id"], "kind": pdf["kind"],
                "width": [], "height": [], "sample_rate": [],
                "n_samples": [], "mean_value": [], "error": [],
            }
            for kind, payload in zip(pdf["kind"], pdf["payload"]):
                w = h = sr = ns = mv = err = None
                try:
                    if kind == "image":
                        d = decode_bmp(payload)
                        w, h, mv = d["width"], d["height"], d["mean_value"]
                    elif kind == "audio":
                        d = decode_wav(payload)
                        sr, ns, mv = d["sample_rate"], d["n_samples"], d["mean_value"]
                    else:
                        err = "UNSUPPORTED_KIND"
                except ValueError as e:
                    err = str(e)
                out["width"].append(w)
                out["height"].append(h)
                out["sample_rate"].append(sr)
                out["n_samples"].append(ns)
                out["mean_value"].append(mv)
                out["error"].append(err)
            yield pd.DataFrame(out)

    return df.mapInPandas(
        part,
        schema=(
            "media_id long, kind string, width int, height int, "
            "sample_rate int, n_samples int, mean_value double, error string"
        ),
    )
