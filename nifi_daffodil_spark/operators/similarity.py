"""Similarity search over embedding columns (array<float>).

Two tiers (per task directive):
  * brute_force_topk — exact baseline; JVM-side fold for small/medium, or
    the Arrow path (`brute_force_topk_arrow`) that does per-partition numpy
    matmul inside mapInPandas — the shape that scales: each partition
    multiplies its (rows x dim) block against the broadcast query matrix,
    emits local top-k, and a single small reduce merges them.
  * lsh_bucketed_topk — sign-random-projection LSH: vectors land in 2^n_bits
    buckets; queries only scan their own bucket (plus optional 1-bit flips).
    The scale path for 10^9+ vectors: candidate set per query is bucket-sized.

Projection matrices are seeded numpy (deterministic) and broadcast.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _norm_col(v: str = "v"):
    return F.sqrt(F.aggregate(F.col(v), F.lit(0.0), lambda a, x: a + x * x))


def as_double_vecs(df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    return df.select(F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("v"))


def brute_force_topk(df: DataFrame, query_vec: list[float], k: int = 10) -> DataFrame:
    """Exact cosine top-k against one query vector (built-in expressions)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = float(np.sqrt(np.dot(query_vec, query_vec)))
    dot = F.aggregate(
        F.zip_with(F.col("v"), q, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    return (
        df.withColumn("cos", dot / (_norm_col() * F.lit(qn)))
        .orderBy(F.col("cos").desc(), F.col("vec_id"))
        .limit(k)
        .select("vec_id", "cos")
    )


def brute_force_topk_arrow(df: DataFrame, query_vec: list[float], k: int = 10) -> DataFrame:
    """Arrow/numpy scale path: per-partition matmul + local top-k, then a
    tiny global merge. ~dim*rows FLOPs vectorized, no per-row Python."""
    q = np.asarray(query_vec, dtype=np.float64)
    q = q / np.linalg.norm(q)

    def part(it):
        for pdf in it:
            if not len(pdf):
                continue
            m = np.stack(pdf["v"].to_numpy())
            norms = np.linalg.norm(m, axis=1)
            cos = (m @ q) / np.where(norms == 0, 1.0, norms)
            idx = np.argsort(-cos)[:k]
            yield pd.DataFrame({"vec_id": pdf["vec_id"].to_numpy()[idx], "cos": cos[idx]})

    local = df.mapInPandas(part, schema="vec_id long, cos double")
    return local.orderBy(F.col("cos").desc(), F.col("vec_id")).limit(k)


def srp_bucket(df: DataFrame, dim: int, n_bits: int = 8, seed: int = 42) -> DataFrame:
    """Assign each vector a sign-random-projection bucket (0..2^n_bits-1).

    The projection is applied in a vectorized Arrow batch (numpy matmul);
    bucket ids are plain longs afterwards, so downstream joins/groupBys are
    pure Catalyst.
    """
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_bits))

    def part(it):
        for pdf in it:
            if not len(pdf):
                continue
            m = np.stack(pdf["v"].to_numpy())
            signs = (m @ planes) >= 0
            bucket = signs @ (1 << np.arange(n_bits))
            yield pd.DataFrame({"vec_id": pdf["vec_id"], "v": pdf["v"], "bucket": bucket.astype("int64")})

    return df.mapInPandas(part, schema="vec_id long, v array<double>, bucket long")


def lsh_bucketed_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_bits: int = 8,
    seed: int = 42,
    probe_bits: int = 1,
) -> DataFrame:
    """ANN: scan only the query's SRP bucket (+ multi-probe 1-bit flips)."""
    dim = len(query_vec)
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_bits))
    q = np.asarray(query_vec, dtype=np.float64)
    qsigns = (q @ planes) >= 0
    qbucket = int(qsigns @ (1 << np.arange(n_bits)))
    probes = [qbucket]
    if probe_bits >= 1:
        probes += [qbucket ^ (1 << j) for j in range(n_bits)]
    bucketed = srp_bucket(df, dim, n_bits, seed)
    cand = bucketed.filter(F.col("bucket").isin(probes))
    return brute_force_topk_arrow(cand.select("vec_id", "v"), query_vec, k)
