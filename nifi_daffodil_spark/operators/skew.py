"""Two-path skew join: salt only detected hot keys, plain-join the rest.

The standard scale-out answer to key skew in shuffle joins (the same
problem the reference hits when one conversation dominates a FlowFile
batch — nifi-daffodil processes records serially per FlowFile, so skew
never surfaces there; on a 1000-executor shuffle it is THE bottleneck):

  * A plain equi-join shuffles both sides by the key; a hot key lands its
    entire row population on one reducer.
  * Salting everything fixes the pileup but replicates the ENTIRE build
    side x n_salt — wasted shuffle for the (vast) cold majority.
  * The two-path plan splits on a detected hot-key set: hot probe rows are
    salted and joined against (hot build rows x n_salt); cold rows take
    the plain join. Replication cost is bounded by (hot keys x n_salt),
    and hot keys are small BY CONSTRUCTION: count > factor x mean implies
    #hot < distinct_keys / factor.

Spark's AQE skew-join split (enabled in session.py) handles the same
problem reactively at runtime; this operator is the declarative form for
when the skew is known/recurring (the engine also exposes it so plans are
auditable — the AQE split does not appear in a static explain).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def two_path_skew_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    n_salt: int = 8,
    hot_factor: float = 4.0,
    how: str = "inner",
) -> DataFrame:
    """Join probe (large, possibly skewed) with build on key equality.

    Hot keys = probe-side keys whose row count exceeds hot_factor x the
    mean per-key count. The detection pass is one O(distinct keys)
    aggregation, localCheckpoint'ed so its three broadcast consumers
    (probe semi-split, probe anti-split, build hot filter) share it
    instead of re-running it. Only inner joins are supported: the hot/cold
    union would need null-extension bookkeeping for outer variants.

    Result is row-identical to `probe.join(build, key)` — the salt is an
    internal shuffle-spreading device and never escapes.
    """
    if how != "inner":
        raise ValueError("two_path_skew_join supports inner joins only")
    spark = probe.sparkSession
    counts = probe.groupBy(probe_key).agg(F.count(F.lit(1)).alias("_cnt"))
    mean = counts.agg(F.avg("_cnt").alias("_avg"))
    hot = (
        counts.crossJoin(F.broadcast(mean))
        .filter(F.col("_cnt") > hot_factor * F.col("_avg"))
        .select(F.col(probe_key).alias("_hk"))
        .localCheckpoint(eager=True)
    )
    p_hot = probe.join(F.broadcast(hot), probe[probe_key] == F.col("_hk"), "left_semi")
    p_cold = probe.join(F.broadcast(hot), probe[probe_key] == F.col("_hk"), "left_anti")
    b_hot = build.join(F.broadcast(hot), build[build_key] == F.col("_hk"), "left_semi")
    b_hot_rep = b_hot.crossJoin(
        spark.range(n_salt).select(F.col("id").cast("long").alias("_salt"))
    )
    # salt from a hash of the whole probe row's key + a row-unique column
    # would need caller knowledge; spreading by a hash of ALL probe columns
    # is deterministic and uniform enough for shuffle spreading
    p_hot_s = p_hot.withColumn(
        "_salt", F.pmod(F.xxhash64(*probe.columns), F.lit(n_salt))
    )
    j_hot = p_hot_s.join(
        b_hot_rep,
        (p_hot_s[probe_key] == b_hot_rep[build_key])
        & (p_hot_s["_salt"] == b_hot_rep["_salt"]),
    ).drop("_salt", "_hk")
    j_cold = p_cold.join(build, p_cold[probe_key] == build[build_key])
    return j_hot.select(j_cold.columns).unionByName(j_cold)
