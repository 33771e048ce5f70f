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


def ivf_assign(df: DataFrame, centroids: "np.ndarray") -> DataFrame:
    """Assign each vector to its nearest centroid (IVF coarse quantizer).

    Vectorized Arrow batches: per-partition (rows x dim) @ (dim x k) matmul,
    argmax by cosine. Output adds a `cell` column; downstream joins/groupBys
    on cell are pure Catalyst. The centroid matrix is tiny (k x dim) and is
    shipped in the task closure — the standard IVF layout where a 10^9-row
    table is clustered by cell and a query probes only nprobe cells.
    """
    cn = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)

    def part(it):
        for pdf in it:
            if not len(pdf):
                continue
            m = np.stack(pdf["v"].to_numpy())
            norms = np.linalg.norm(m, axis=1, keepdims=True)
            sims = (m / np.where(norms == 0, 1.0, norms)) @ cn.T
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "v": pdf["v"],
                    "cell": sims.argmax(axis=1).astype("int64"),
                }
            )

    return df.mapInPandas(part, schema="vec_id long, v array<double>, cell long")


def ivf_train_centroids(
    df: DataFrame, n_cells: int = 16, n_iter: int = 5, sample: int = 2048, seed: int = 7
) -> "np.ndarray":
    """Tiny deterministic k-means on a driver-side sample (the coarse
    quantizer is always trained on a sample — even billion-row IVF indexes
    train on ~1M vectors). Sampling uses a seeded hash of vec_id (stable
    across partitionings), not RDD sampling."""
    rng = np.random.default_rng(seed)
    pdf = (
        df.withColumn("_h", F.pmod(F.xxhash64("vec_id"), F.lit(1_000_000)))
        .orderBy("_h", "vec_id")
        .limit(sample)
        .select("vec_id", "v")
        .toPandas()
    )
    m = np.stack(pdf["v"].to_numpy())
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    cents = m[rng.choice(len(m), size=min(n_cells, len(m)), replace=False)]
    for _ in range(n_iter):
        assign = (m @ cents.T).argmax(axis=1)
        for c in range(len(cents)):
            members = m[assign == c]
            if len(members):
                mu = members.mean(axis=0)
                cents[c] = mu / (np.linalg.norm(mu) or 1.0)
    return cents


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    centroids: "np.ndarray",
    k: int = 10,
    nprobe: int = 4,
) -> DataFrame:
    """ANN: exact cosine top-k over only the nprobe IVF cells nearest the
    query — candidate set is cell-sized, work ~ nprobe/n_cells of the data."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / np.linalg.norm(q)
    cn = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)
    probes = [int(c) for c in (cn @ qn).argsort()[::-1][:nprobe]]
    cells = ivf_assign(df, centroids)
    cand = cells.filter(F.col("cell").isin(probes))
    return brute_force_topk_arrow(cand.select("vec_id", "v"), query_vec, k)


def srp_coefficients(n_bits: int, dim: int) -> list[list[float]]:
    """Deterministic ±1 hyperplane coefficients derived from md5(bit:dim).

    md5 (not numpy RNG) on purpose: the coefficients are plain literals that
    can be embedded verbatim into any other engine's SQL (the DuckDB oracle
    replicates the exact same projections), making the LSH candidate set
    engine-independent and the whole pipeline oracle-checkable."""
    import hashlib

    return [
        [
            1.0 if int(hashlib.md5(f"{q}:{d}".encode()).hexdigest()[0], 16) < 8 else -1.0
            for d in range(dim)
        ]
        for q in range(n_bits)
    ]


def srp_lsh_pairs(
    df: DataFrame,
    dim: int,
    n_bands: int = 12,
    rows_per_band: int = 2,
    min_cos: float | None = None,
) -> DataFrame:
    """Near-dup candidate PAIRS via banded sign-random-projection LSH,
    exact-cosine verified — the scale-safe shape for all-pairs similarity.

    No cartesian product anywhere: vectors sharing any (band, key) bucket
    become candidates through an equality hash-join; exact cosine runs only
    on candidates. At corpus scale the candidate count is sum over buckets
    of |bucket|^2 — sublinear in n^2 whenever the target similarity is high
    enough that bands are selective (the standard LSH s-curve
    P(candidate) = 1-(1-p^r)^b with p = 1 - theta/pi). For harder, lower
    thresholds raise n_bands.

    min_cos=None (default): built-in Catalyst expressions — normalize once,
    one fold per bit (dim multiply-adds over array literals), band keys
    packed to ints, one shuffle on (band, key) — and EVERY candidate pair is
    returned with its exact cosine (caller thresholds / top-ks).

    min_cos given: the THRESHOLD-PUSHDOWN path (optimization round 6).
    Semantically identical up to the returned pair set being pre-filtered to
    cos >= min_cos; callers that filter at the same threshold get the exact
    same rows. The shape problem it fixes: with rows_per_band=2 each band
    has only 4 possible keys, so the Catalyst candidate join degenerates to
    ~all-pairs through a 64-key skewed shuffle, materializes O(n^2) distinct
    candidate rows, joins the vectors back twice, and folds the cosine
    per-pair in interpreted HigherOrderFunctions — measured 839 s at the
    driver's sf=1.0 (BENCH_r05). Instead, each (band, key) bucket is handled
    by one Arrow task: a numpy matmul screens the bucket's pair block
    against (min_cos - 1e-6), and ONLY screened survivors get the exact
    left-fold cosine (bit-identical to the Catalyst/DuckDB fold: the
    per-element accumulate runs in the same IEEE order, vectorized ACROSS
    pairs, not within) and the exact >= filter. Survivor counts are
    O(near-dups), so nothing quadratic is ever shuffled or distinct'd.
    Guard-band soundness: dgemm error for dim<=4096 unit vectors is < 1e-12,
    five orders below the 1e-6 guard, so the screen can only ADMIT extra
    pairs for the exact filter to reject, never drop a qualifying pair.

    Input df: (vec_id long, v array<double>). Returns (d1, d2, cos).
    """
    n_bits = n_bands * rows_per_band
    coefs = srp_coefficients(n_bits, dim)
    if min_cos is not None:
        return _srp_lsh_pairs_thresholded(
            df, dim, n_bands, rows_per_band, coefs, float(min_cos)
        )
    nrm = _norm_col()
    en = df.select(
        "vec_id", F.transform(F.col("v"), lambda x: x / nrm).alias("u")
    )

    def _bit(q: int):
        proj = F.aggregate(
            F.zip_with(
                F.col("u"),
                F.array(*[F.lit(c) for c in coefs[q]]),
                lambda x, y: x * y,
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        return F.when(proj >= 0, F.lit(1)).otherwise(F.lit(0))

    band_keys = [
        sum(
            (_bit(j * rows_per_band + i) * F.lit(1 << i) for i in range(rows_per_band)),
            F.lit(0),
        ).alias(f"k{j}")
        for j in range(n_bands)
    ]
    # Reused three times (band keys + two verification joins). Eager
    # localCheckpoint, not persist(): persist leaked cached blocks for the
    # session lifetime across repeated calls (bench warm+timed, tests);
    # checkpoint blocks are dropped by the ContextCleaner as soon as the
    # result DataFrame is garbage-collected. Lineage truncation is fine —
    # the input is a deterministic scan.
    en = en.localCheckpoint(eager=True)
    keyed = en.select("vec_id", *band_keys)
    # bands carry only (vec_id, band, key): the 64-double vector must NOT be
    # exploded x n_bands through the shuffle — it is joined back below, once,
    # after candidate dedup
    bands = keyed.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(j).alias("band"), F.col(f"k{j}").alias("key"))
                    for j in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("vec_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a = bands.select(F.col("vec_id").alias("d1"), "band", "key")
    b = bands.select(
        F.col("vec_id").alias("d2"),
        F.col("band").alias("band2"),
        F.col("key").alias("key2"),
    )
    cand = (
        a.join(
            b,
            (F.col("band") == F.col("band2"))
            & (F.col("key") == F.col("key2"))
            & (F.col("d1") < F.col("d2")),
        )
        .select("d1", "d2")
        .distinct()
    )
    u1 = en.select(F.col("vec_id").alias("d1"), F.col("u").alias("u1"))
    u2 = en.select(F.col("vec_id").alias("d2"), F.col("u").alias("u2"))
    cos = F.aggregate(
        F.zip_with(F.col("u1"), F.col("u2"), lambda x, y: x * y),
        F.lit(0.0),
        lambda a_, x: a_ + x,
    )
    return (
        cand.join(u1, "d1").join(u2, "d2").select("d1", "d2", cos.alias("cos"))
    )


def _fold_dot(a: "np.ndarray", b: "np.ndarray") -> "np.ndarray":
    """Row-wise dot product in EXACT left-fold order: acc starts at 0.0 and
    accumulates a[:, k] * b[:, k] element-index by element-index — the same
    IEEE operation sequence as Catalyst's aggregate(zip_with(u1, u2, *),
    0.0, +) and DuckDB's list_dot_product, vectorized across rows (which
    does not change any single row's op order). Bit-identical results."""
    acc = np.zeros(a.shape[0], dtype=np.float64)
    for k in range(a.shape[1]):
        acc += a[:, k] * b[:, k]
    return acc


def _srp_lsh_pairs_thresholded(
    df: DataFrame,
    dim: int,
    n_bands: int,
    rows_per_band: int,
    coefs: list[list[float]],
    min_cos: float,
) -> DataFrame:
    """Threshold-pushdown SRP-LSH (see srp_lsh_pairs docstring, min_cos arm).

    Stage 1 (mapInPandas): normalize + 32 sign bits + band keys, all in the
    exact left-fold order of the Catalyst path, emitted pre-exploded as
    (band, key, vec_id, u) rows.
    Stage 2 (groupBy(band, key).applyInPandas): per-bucket pair generation —
    matmul screen at min_cos - 1e-6 (admits, never drops), exact left-fold
    cosine + exact >= min_cos on screened survivors only.
    Then one distinct() over the (tiny) surviving pair set, mirroring the
    candidate distinct of the Catalyst path (same pair found via several
    bands carries the identical cosine).

    NaN handling mirrors Spark/DuckDB comparison semantics (NaN compares
    greater than any value, so a NaN cosine passes >= min_cos): screens and
    filters keep NaN rows. Only reachable with zero-norm input vectors.
    """
    import pyarrow as pa

    n_bits = n_bands * rows_per_band
    cmat = np.asarray(coefs, dtype=np.float64)  # (n_bits, dim)
    guard = min_cos - 1e-6

    def _vecs(col: "pa.ChunkedArray | pa.Array") -> "np.ndarray":
        """Arrow list<double> column -> (n, dim) float64 matrix without
        per-row Python objects (flatten reads the values buffer)."""
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        flat = arr.flatten().to_numpy(zero_copy_only=False)
        return flat.reshape(len(arr), -1)

    def _list_col(m: "np.ndarray") -> "pa.Array":
        offsets = pa.array(
            np.arange(0, (m.shape[0] + 1) * m.shape[1], m.shape[1], dtype=np.int32)
        )
        return pa.ListArray.from_arrays(offsets, pa.array(m.ravel()))

    def keys_part(it):
        for rb in it:
            if rb.num_rows == 0:
                continue
            m = _vecs(rb.column(1)).astype(np.float64, copy=False)
            nrm = np.sqrt(_fold_dot(m, m))
            with np.errstate(divide="ignore", invalid="ignore"):
                u = m / nrm[:, None]
            # sign bits, fold order per bit; NaN proj >= 0 is TRUE in Spark
            bits = np.empty((len(u), n_bits), dtype=np.int64)
            for q in range(n_bits):
                proj = _fold_dot(u, np.broadcast_to(cmat[q], u.shape))
                bits[:, q] = (proj >= 0) | np.isnan(proj)
            keys = []
            for j in range(n_bands):
                key = np.zeros(len(u), dtype=np.int64)
                for i in range(rows_per_band):
                    key += bits[:, j * rows_per_band + i] << i
                keys.append(pa.array(key))
            # ONE row per vector across the Python boundary (u once, not
            # x n_bands); the band explode happens JVM-side below, so the
            # Arrow transfer is ~n_bands x smaller than emitting exploded
            # rows here
            yield pa.RecordBatch.from_arrays(
                [rb.column(0), _list_col(u), *keys],
                names=["vec_id", "u", *[f"k{j}" for j in range(n_bands)]],
            )

    key_schema = ", ".join(f"k{j} long" for j in range(n_bands))
    with_keys = df.select("vec_id", "v").mapInArrow(
        keys_part, schema=f"vec_id long, u array<double>, {key_schema}"
    )
    keyed = with_keys.select(
        "vec_id",
        "u",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).cast("long").alias("band"),
                        F.col(f"k{j}").alias("key"),
                    )
                    for j in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select(
        F.col("bk.band").alias("band"), F.col("bk.key").alias("key"), "vec_id", "u"
    )

    _empty = pa.table(
        {
            "d1": pa.array([], pa.int64()),
            "d2": pa.array([], pa.int64()),
            "cos": pa.array([], pa.float64()),
        }
    )

    def bucket_pairs(tbl: "pa.Table") -> "pa.Table":
        n = tbl.num_rows
        if n < 2:
            return _empty
        u = _vecs(tbl.column("u"))
        ids = tbl.column("vec_id").to_numpy(zero_copy_only=False)
        d1o, d2o, coso = [], [], []
        block = max(1, 64_000_000 // (8 * n))  # ~64 MB per score block
        for lo in range(0, n, block):
            hi = min(lo + block, n)
            scores = u[lo:hi] @ u.T  # screen only; never emitted
            keep = (scores >= guard) | np.isnan(scores)
            # strict id ordering d1 < d2 (each unordered pair once)
            keep &= ids[lo:hi, None] < ids[None, :]
            bi, bj = np.nonzero(keep)
            if not len(bi):
                continue
            gi = bi + lo
            cos = _fold_dot(u[gi], u[bj])  # exact left-fold, survivors only
            ok = (cos >= min_cos) | np.isnan(cos)
            d1o.append(ids[gi][ok])
            d2o.append(ids[bj][ok])
            coso.append(cos[ok])
        if not d1o:
            return _empty
        return pa.table(
            {
                "d1": pa.array(np.concatenate(d1o)),
                "d2": pa.array(np.concatenate(d2o)),
                "cos": pa.array(np.concatenate(coso)),
            }
        )

    pairs = keyed.groupBy("band", "key").applyInArrow(
        bucket_pairs, schema="d1 long, d2 long, cos double"
    )
    return pairs.distinct()


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


class IvfIndex:
    """Persisted IVF index: build ONCE, serve many queries (round-2 verdict
    item #4 — ivf_topk retrained the quantizer and re-assigned every call).

    Layout (all parquet, self-describing):
      <path>/centroids/   (cell long, c array<double>)      — tiny, k rows
      <path>/vectors/     cell=K/... (vec_id long, v ...)   — partitioned by
                          cell, so probing nprobe cells is PARTITION-PRUNED
                          at the scan: a 10^9-row index reads only
                          nprobe/n_cells of its files per query batch.

    Serving reads the centroid table once into driver memory (k x dim —
    tiny by construction); candidate scans stay fully distributed.
    """

    def __init__(self, spark, path: str, centroids: "np.ndarray"):
        self.spark = spark
        self.path = path
        self.centroids = centroids
        self._cn = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)

    # ---- build / load -----------------------------------------------------

    @classmethod
    def build(
        cls,
        df: DataFrame,
        path: str,
        n_cells: int = 16,
        n_iter: int = 5,
        sample: int = 2048,
        seed: int = 7,
    ) -> "IvfIndex":
        """Train the coarse quantizer (driver-side bounded sample — standard
        even at 10^9 rows), assign every vector, persist both."""
        spark = df.sparkSession
        cents = ivf_train_centroids(df, n_cells, n_iter, sample, seed)
        cent_rows = [(int(i), [float(x) for x in c]) for i, c in enumerate(cents)]
        spark.createDataFrame(cent_rows, "cell long, c array<double>").coalesce(
            1
        ).write.mode("overwrite").parquet(f"{path}/centroids")
        (
            ivf_assign(df, cents)
            .repartition("cell")
            .write.mode("overwrite")
            .partitionBy("cell")
            .parquet(f"{path}/vectors")
        )
        return cls(spark, path, cents)

    @classmethod
    def load(cls, spark, path: str) -> "IvfIndex":
        rows = spark.read.parquet(f"{path}/centroids").orderBy("cell").collect()
        cents = np.array([r["c"] for r in rows], dtype=np.float64)
        return cls(spark, path, cents)

    # ---- incremental maintenance (round-3 verdict item #4) ----------------

    def add(self, df: DataFrame) -> None:
        """Append new vectors to the index WITHOUT retraining: assign with
        the EXISTING centroids and append files into the assigned cell
        partitions only (a dynamic-partition append touches no other cell's
        files). This is the serving-index fast path — O(new rows), one
        map-side assign + one shuffle on cell; probe results for the new
        vectors are identical to a full rebuild at the same centroids.

        The cost of never retraining is drift: newly added vectors may
        cluster poorly under stale centroids, skewing cell sizes — monitor
        with cell_stats()/needs_rebuild() and retrain via rebuild()."""
        (
            ivf_assign(df, self.centroids)
            .repartition("cell")
            .write.mode("append")
            .partitionBy("cell")
            .parquet(f"{self.path}/vectors")
        )

    def cell_stats(self) -> dict:
        """Cell-size distribution: {'counts': {cell: n}, 'imbalance':
        max/mean}. Imbalance ~1 = balanced; a hot cell makes every probe
        of it scan disproportionately many candidates (the probe cost is
        the cell size, not n/n_cells)."""
        rows = (
            self.spark.read.parquet(f"{self.path}/vectors")
            .groupBy("cell")
            .count()
            .collect()
        )
        counts = {int(r["cell"]): int(r["count"]) for r in rows}
        n_cells = len(self.centroids)
        mean = sum(counts.values()) / max(n_cells, 1)
        imbalance = (max(counts.values()) / mean) if counts and mean else 0.0
        return {"counts": counts, "n_cells": n_cells,
                "imbalance": round(imbalance, 3)}

    def needs_rebuild(self, max_imbalance: float = 4.0) -> bool:
        """Rebuild trigger: True when the hottest cell exceeds
        max_imbalance x the mean cell size (drifted quantizer)."""
        return self.cell_stats()["imbalance"] > max_imbalance

    def rebuild(
        self,
        dest_path: str | None = None,
        n_cells: int | None = None,
        n_iter: int = 5,
        sample: int = 2048,
        seed: int = 7,
    ) -> "IvfIndex":
        """Retrain the quantizer over the CURRENT vector set and rewrite.

        dest_path given (the at-scale pattern): build the new index beside
        the old one and atomically swap the serving pointer afterwards —
        the old index stays queryable during the rebuild and a failed
        rebuild leaves it untouched. dest_path=None rebuilds in place via
        an eager localCheckpoint of the vector set (convenient for small
        indexes; the checkpoint is required because the overwrite targets
        the same directory the rebuild reads from)."""
        vecs = self.spark.read.parquet(f"{self.path}/vectors").select(
            "vec_id", "v"
        )
        if dest_path is None:
            dest_path = self.path
            vecs = vecs.localCheckpoint(eager=True)
        return IvfIndex.build(
            vecs,
            dest_path,
            n_cells=n_cells if n_cells is not None else len(self.centroids),
            n_iter=n_iter,
            sample=sample,
            seed=seed,
        )

    # ---- serve ------------------------------------------------------------

    def _probe_cells(self, q: "np.ndarray", nprobe: int) -> list[int]:
        qn = q / (np.linalg.norm(q) or 1.0)
        return [int(c) for c in (self._cn @ qn).argsort()[::-1][:nprobe]]

    def _vectors(self, cells: list[int]) -> DataFrame:
        # .filter on the partition column prunes to the probed cell dirs
        return (
            self.spark.read.parquet(f"{self.path}/vectors")
            .filter(F.col("cell").isin(cells))
        )

    def topk(self, query_vec: list[float], k: int = 10, nprobe: int = 4) -> DataFrame:
        """Single-query ANN: exact cosine over the nprobe nearest cells."""
        probes = self._probe_cells(np.asarray(query_vec, dtype=np.float64), nprobe)
        return brute_force_topk_arrow(
            self._vectors(probes).select("vec_id", "v"), query_vec, k
        )

    def topk_batch(
        self, queries: list[tuple[int, list[float]]], k: int = 10, nprobe: int = 4
    ) -> DataFrame:
        """Batched multi-query ANN: ONE distributed job for all queries.

        Probe pairs (qid, cell) are computed on the driver (nq x n_cells —
        tiny), the probed cells are scanned once (partition-pruned union of
        all queries' cells), and each Arrow batch does a single
        (rows x dim) @ (dim x nq) matmul against the relevant query block.
        Per-query top-k via one window — returns (qid, vec_id, cos).
        """
        qmat = np.stack([np.asarray(v, dtype=np.float64) for _, v in queries])
        qn = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
        qids = np.array([int(qid) for qid, _ in queries], dtype=np.int64)
        probe_pairs = [
            (int(qid), c)
            for qid, (_, v) in zip(qids, queries)
            for c in self._probe_cells(np.asarray(v, dtype=np.float64), nprobe)
        ]
        cells_needed = sorted({c for _, c in probe_pairs})
        # cell -> positions of the queries probing it (shipped in closure —
        # bounded by nq * nprobe ints)
        cell_qpos: dict[int, list[int]] = {}
        qid_to_pos = {int(qid): i for i, qid in enumerate(qids)}
        for qid, c in probe_pairs:
            cell_qpos.setdefault(c, []).append(qid_to_pos[qid])

        def part(it):
            for pdf in it:
                if not len(pdf):
                    continue
                for cell, grp in pdf.groupby("cell"):
                    qpos = cell_qpos.get(int(cell))
                    if not qpos:
                        continue
                    m = np.stack(grp["v"].to_numpy())
                    norms = np.linalg.norm(m, axis=1)
                    mn = m / np.where(norms == 0, 1.0, norms)[:, None]
                    sims = mn @ qn[qpos].T  # (rows x nq_probing_this_cell)
                    nloc = min(k, sims.shape[0])
                    for j, pos in enumerate(qpos):
                        col = sims[:, j]
                        # keep the k best PLUS boundary ties: argpartition
                        # alone breaks exact-cosine ties (duplicate vectors)
                        # arbitrarily, which could drop the candidate the
                        # final deterministic (cos DESC, vec_id) window — and
                        # the oracle — would keep. Ties are BOUNDED to the
                        # nloc smallest vec_ids at the boundary value (the
                        # window picks ties by vec_id asc, so any globally
                        # selected tie from this batch is among them): a
                        # cell full of N identical vectors emits <= 2k rows
                        # per query, not N.
                        kth = np.partition(col, len(col) - nloc)[len(col) - nloc]
                        better = np.flatnonzero(col > kth)
                        ties = np.flatnonzero(col == kth)
                        if len(ties) > nloc:
                            tie_ids = grp["vec_id"].to_numpy()[ties]
                            ties = ties[np.argsort(tie_ids, kind="stable")[:nloc]]
                        idx = np.concatenate([better, ties])
                        yield pd.DataFrame(
                            {
                                "qid": np.full(len(idx), qids[pos]),
                                "vec_id": grp["vec_id"].to_numpy()[idx],
                                "cos": col[idx],
                            }
                        )

        local = self._vectors(cells_needed).mapInPandas(
            part, schema="qid long, vec_id long, cos double"
        )
        from pyspark.sql import Window

        w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("vec_id"))
        return (
            local.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .select("qid", "vec_id", "cos")
        )
