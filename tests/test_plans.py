"""Physical-plan hygiene: pushdown, broadcast, codegen (the properties that
decide whether these plans survive a 100x scale-up)."""

from pyspark.sql import functions as F

from nifi_daffodil_spark.plans import driver_queries as dq

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_broadcast_join_chosen_for_dims(spark):
    plan = _plan(dq.q_join_broadcast_enrich(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_filter_pushed_to_parquet_scan(spark):
    df = dq.q_agg_pricing_summary(spark, SF)
    analyzed = df._jdf.queryExecution().toString()
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in analyzed


def test_column_pruning_reaches_scan(spark):
    """A two-column projection must not read all lineitem columns."""
    df = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select("l_orderkey", "l_quantity")
        .filter(F.col("l_quantity") > 10)
    )
    analyzed = df._jdf.queryExecution().toString()
    rs = analyzed.split("ReadSchema:")[-1]
    assert "l_orderkey" in rs and "l_quantity" in rs
    assert "l_extendedprice" not in rs and "l_shipdate" not in rs


def test_whole_stage_codegen_covers_validation(spark):
    from nifi_daffodil_spark.operators.validate import with_validation

    # range-backed (a LocalRelation would constant-fold the whole plan away)
    ev = spark.range(100).select(
        F.col("id").alias("lsn"),
        F.lit("I").alias("op"),
        F.col("id").cast("string").alias("conv_id"),
        (F.col("id") % 10).alias("turn_idx"),
        F.lit("user").alias("role"),
        F.col("id").cast("string").alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.current_timestamp().alias("ts"),
    )
    plan = _plan(with_validation(ev, "full", 100))
    assert "*(1)" in plan  # '*' marks whole-stage-codegen spans


def test_lww_dedup_no_extra_exchange_after_repartition(spark):
    """The engine's merge-ready batch has exactly ONE exchange — the dedup
    window shuffle. Redistribution for the MERGE/write is owned by the sink;
    a (bucket, salt) repartition here would be shuffled away downstream
    (round-1 verdict: the salt exchange was a pure extra shuffle)."""
    from nifi_daffodil_spark.config import EngineConfig
    from nifi_daffodil_spark.engine import CdcEngine

    eng = CdcEngine(spark, None, EngineConfig(n_buckets=8, n_salt=4))
    ev = spark.createDataFrame(
        [(1, "I", "c", 0, "user", "t", None, None)],
        "lsn long, op string, conv_id string, turn_idx long, role string, "
        "text string, tool string, ts timestamp",
    )
    plan = _plan(eng._finish_batch(ev))
    assert plan.count("Exchange") == 1, plan
