"""CSV fixture source — the reference's csv.dfdl.xsd + tokens.csv family.

Reference: the DFDL CSV schema fixture parses comma-separated records with a
quote/escape scheme (csv.dfdl.xsd:30-45) over test fixtures like tokens.csv
(TestDaffodilProcessor.java's parse tests). Engine mapping: `spark.read.csv`
with a DECLARED schema (never inferSchema — schema-missing is a hard error,
matching the reference's required schema property), RFC-4180 quoting
(embedded commas, doubled quotes, embedded newlines via multiLine), and
FAILFAST so a malformed record fails the batch rather than silently nulling.

`write_csv_fixture` is the deterministic driver-side writer used by tests
and the oracle-checked round-trip query: python csv.QUOTE_ALL output, rows
in caller order — byte-stable across runs.
"""

from __future__ import annotations

import csv
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

#: explicit null sentinel: Spark's CSV reader maps empty strings to null by
#: default, which would conflate "" with NULL; writing \N for None and
#: declaring it as nullValue keeps the round-trip lossless for both.
NULL_SENTINEL = "\\N"


def read_csv_fixture(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    multiline: bool = True,
) -> DataFrame:
    """Declared-schema CSV read with RFC-4180 quoting, fail-fast."""
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("quote", '"')
        .option("escape", '"')  # RFC-4180: quotes are doubled inside quotes
        .option("multiLine", str(multiline).lower())
        .option("nullValue", NULL_SENTINEL)
        .option("mode", "FAILFAST")
        .csv(path)
    )


def write_csv_fixture(path: str, header: list[str], rows: list[tuple]) -> str:
    """Deterministic QUOTE_ALL CSV writer (driver-side, tiny fixtures)."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w", newline="", encoding="utf-8") as f:
        w = csv.writer(f, quoting=csv.QUOTE_ALL, lineterminator="\n")
        w.writerow(header)
        w.writerows(
            tuple(NULL_SENTINEL if v is None else v for v in row) for row in rows
        )
    os.replace(tmp, path)
    return path
