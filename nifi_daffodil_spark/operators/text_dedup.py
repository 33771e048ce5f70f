"""Reusable text-deduplication operators (training-data pipeline family).

All operators take any DataFrame with (id_col: long, text_col: string) and
return DataFrames; everything is built-in Catalyst expressions — no Python
in the hot path. md5 is used as the portable content hash (same hex in
Spark, DuckDB, Python hashlib).

Scale notes:
  * exact_dedup: one hash-shuffle on the 32-hex digest, map-side partial agg.
  * shingles: explode multiplies rows by ~doc_len; keep shingle length >= 3
    so the distinct() dedup per doc happens map-side first.
  * minhash_lsh_pairs: the candidate join shuffles (band, minhash) keys —
    band count b controls recall (r=1: P(cand) = 1-(1-s)^b) and join fanout.
    Verification joins shingles only for candidate pairs (never all pairs).
  * simhash: linear in total words; fingerprints then group by simhash
    bucket — O(n) near-dup blocking at 100 TB scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Groups by canonicalized content hash; keeps min id as keeper."""
    fp = F.md5(F.lower(F.trim(F.col(text_col))))
    return (
        df.withColumn("fp", fp)
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("keeper"),
            F.count(F.lit(1)).alias("n_copies"),
            F.sort_array(F.collect_list(id_col)).alias("members"),
        )
    )


def word_shingles(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3
) -> DataFrame:
    """Distinct word k-grams per document: (id, sh)."""
    return df.select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.expr(
                f"transform(sequence(0, size(split({text_col}, ' ')) - {k}), "
                f"i -> concat_ws(' ', slice(split({text_col}, ' '), i + 1, {k})))"
            )
        ).alias("sh"),
    ).distinct()


def jaccard_pairs(
    shingles: DataFrame, threshold: float, candidates: DataFrame | None = None
) -> DataFrame:
    """Exact Jaccard over pairs sharing >=1 shingle (or a candidate set).

    shingles: (_id, sh) distinct. candidates: optional (d1, d2) to restrict.
    Returns (d1, d2, jaccard) with jaccard >= threshold.
    """
    sizes = shingles.groupBy("_id").agg(F.count(F.lit(1)).alias("sz"))
    if candidates is None:
        a = shingles.select(F.col("_id").alias("d1"), "sh")
        b = shingles.select(F.col("_id").alias("d2"), F.col("sh").alias("sh2"))
        inter = (
            a.join(b, (F.col("sh") == F.col("sh2")) & (F.col("d1") < F.col("d2")))
            .groupBy("d1", "d2")
            .agg(F.count(F.lit(1)).alias("inter"))
        )
    else:
        a = shingles.select(F.col("_id").alias("d1"), "sh")
        b = shingles.select(F.col("_id").alias("bd2"), F.col("sh").alias("sh2"))
        inter = (
            candidates.join(a, "d1")
            .join(b, (F.col("d2") == F.col("bd2")) & (F.col("sh") == F.col("sh2")))
            .groupBy("d1", "d2")
            .agg(F.count(F.lit(1)).alias("inter"))
        )
    sa = sizes.select(F.col("_id").alias("d1"), F.col("sz").alias("sz1"))
    sb = sizes.select(F.col("_id").alias("d2"), F.col("sz").alias("sz2"))
    return (
        inter.join(sa, "d1")
        .join(sb, "d2")
        .withColumn("jaccard", F.col("inter") / (F.col("sz1") + F.col("sz2") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("d1", "d2", "jaccard")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 16,
    rows_per_band: int = 1,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash + banded LSH near-dup pairs, exact-verified.

    signature_i = min(md5(i || shingle)) — lexicographic min over hex
    strings, an order-preserving proxy for a random permutation and portable
    across engines. Bands of `rows_per_band` signatures are concatenated into
    a bucket key; docs sharing any bucket become candidates; candidates are
    verified with exact Jaccard >= threshold (no false positives; false
    negatives bounded by the LSH s-curve).
    """
    assert n_hashes % rows_per_band == 0
    n_bands = n_hashes // rows_per_band
    sh = word_shingles(df, id_col, text_col).persist()
    sig = sh.groupBy("_id").agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("sh")))).alias(f"h{i}")
            for i in range(n_hashes)
        ]
    )
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws(
                "|", *[F.col(f"h{b * rows_per_band + j}") for j in range(rows_per_band)]
            ).alias("key"),
        )
        for b in range(n_bands)
    ]
    bands = sig.select(
        F.col("_id"), F.explode(F.array(*band_cols)).alias("bk")
    ).select("_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a = bands.select(F.col("_id").alias("d1"), "band", "key")
    b = bands.select(F.col("_id").alias("d2"), F.col("band").alias("band2"), F.col("key").alias("key2"))
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
    out = jaccard_pairs(sh, threshold, candidates=cand)
    return out


def simhash16(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """16-bit SimHash over the word multiset (md5 nibble top-bits)."""
    words = df.select(F.col(id_col).alias("_id"), F.explode(F.split(text_col, " ")).alias("w"))
    hexed = words.withColumn("h", F.md5("w"))
    terms = [
        F.sum(
            F.when(
                F.instr(F.lit("0123456789abcdef"), F.substring("h", j + 1, 1)) - 1 >= 8, 1
            ).otherwise(-1)
        ).alias(f"s{j}")
        for j in range(16)
    ]
    agg = hexed.groupBy("_id").agg(*terms)
    bits = sum(
        (F.when(F.col(f"s{j}") >= 0, F.lit(1 << j)).otherwise(F.lit(0)) for j in range(16)),
        F.lit(0),
    )
    return agg.select(F.col("_id").alias(id_col), bits.cast("long").alias("simhash16"))


def simhash_near_pairs(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                       max_hamming: int = 2) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance, blocked on the fingerprint
    itself (exact-bucket pass) plus single-bit-flip buckets — O(n) blocking,
    no cross join."""
    fp = simhash16(df, id_col, text_col)
    # expand each doc into its fingerprint + all 16 one-bit-flip variants:
    # two fingerprints within hamming<=2 share at least one variant bucket
    variants = fp.select(
        id_col,
        "simhash16",
        F.explode(
            F.array(
                F.col("simhash16"),
                *[
                    F.col("simhash16").bitwiseXOR(F.lit(1 << j)).cast("long")
                    for j in range(16)
                ],
            )
        ).alias("bucket"),
    )
    a = variants.select(F.col(id_col).alias("d1"), F.col("simhash16").alias("f1"), "bucket")
    b = variants.select(F.col(id_col).alias("d2"), F.col("simhash16").alias("f2"),
                        F.col("bucket").alias("bucket2"))
    ham = sum(
        (
            F.shiftright(F.col("f1").bitwiseXOR(F.col("f2")), j).bitwiseAND(F.lit(1))
            for j in range(16)
        ),
        F.lit(0),
    )
    return (
        a.join(b, (F.col("bucket") == F.col("bucket2")) & (F.col("d1") < F.col("d2")))
        .select("d1", "d2", "f1", "f2")
        .distinct()
        .withColumn("hamming", ham.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("d1", "d2", "hamming")
    )
