"""Golden tests for the Iceberg sink's generated SQL (no Iceberg runtime in
this sandbox, so the DDL/MERGE/evolution logic is factored into pure
functions and pinned here — round-1 verdict item #8).

The MERGE semantics these strings encode are the load-bearing ones:
LWW guard `s.lsn > t.lsn`, tombstone DELETE, insert-unless-tombstone —
the same contract the ParquetStateSink implements and the replay tests
verify against the pandas oracle.
"""

from pyspark.sql import types as T

from nifi_daffodil_spark.sinks.iceberg import (
    create_table_sql,
    evolve_schema_ddl,
    merge_sql,
)


def _norm(sql: str) -> str:
    return " ".join(sql.split())


def test_create_table_sql_golden():
    got = _norm(create_table_sql("lake.db.transcripts", 32))
    assert got == _norm("""
        CREATE TABLE IF NOT EXISTS lake.db.transcripts (
          conv_id string, turn_idx int, role string, text string,
          tool string, ts timestamp, lsn bigint
        ) USING iceberg
        PARTITIONED BY (bucket(32, conv_id))
        TBLPROPERTIES ('write.merge.mode'='merge-on-read',
                       'write.distribution-mode'='hash')
    """)


def test_merge_sql_golden():
    got = _norm(merge_sql("lake.db.transcripts"))
    assert got == _norm("""
        MERGE INTO lake.db.transcripts t
        USING _cdc_batch_src s
        ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx
        WHEN MATCHED AND s.op = 'D' AND s.lsn > t.lsn THEN DELETE
        WHEN MATCHED AND s.op <> 'D' AND s.lsn > t.lsn THEN UPDATE SET
          t.role = s.role, t.text = s.text, t.tool = s.tool,
          t.ts = s.ts, t.lsn = s.lsn
        WHEN NOT MATCHED AND s.op <> 'D' THEN INSERT
          (conv_id, turn_idx, role, text, tool, ts, lsn)
          VALUES (s.conv_id, s.turn_idx, s.role, s.text, s.tool, s.ts, s.lsn)
    """)


def test_merge_sql_lww_guards_present():
    """Every MATCHED clause must carry the lsn guard — without it a late
    replay with a smaller lsn would overwrite newer state."""
    sql = merge_sql("t")
    matched = [ln for ln in sql.splitlines() if "WHEN MATCHED" in ln]
    assert len(matched) == 2
    assert all("s.lsn > t.lsn" in ln for ln in matched)
    assert "WHEN NOT MATCHED AND s.op <> 'D'" in sql  # tombstones never insert


def test_evolve_schema_ddl_add_and_widen():
    table_cols = {"conv_id": "string", "turn_idx": "int", "ts": "timestamp"}
    batch = T.StructType(
        [
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.LongType()),     # int -> bigint widening
            T.StructField("tool", T.StringType()),       # new column
            T.StructField("ts", T.TimestampType()),      # unchanged
            T.StructField("op", T.StringType()),         # engine-internal: skipped
            T.StructField("bucket", T.IntegerType()),    # engine-internal: skipped
        ]
    )
    stmts = evolve_schema_ddl(table_cols, batch)
    assert stmts == [
        "ALTER TABLE <table> ALTER COLUMN turn_idx TYPE bigint",
        "ALTER TABLE <table> ADD COLUMN tool string",
    ]


def test_evolve_schema_ddl_noop_when_aligned():
    table_cols = {"conv_id": "string", "turn_idx": "bigint"}
    batch = T.StructType(
        [
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.LongType()),
        ]
    )
    assert evolve_schema_ddl(table_cols, batch) == []
