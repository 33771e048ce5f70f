"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over nifi_daffodil_spark.plans.driver_queries — one queries()
entry per implemented operator from SURVEY.md §2 plus the training-data
pipeline set, each with a DuckDB oracle where ANSI-SQL-expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from nifi_daffodil_spark.plans import driver_queries as _dq  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the LWW change-event dedup (the engine's core reducer)
    over /root/testdata/sf0.001."""
    return _dq.q_cdc_lww_dedup(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _dq.queries()


def oracle_sql() -> dict[str, str]:
    return _dq.oracle_sql()
