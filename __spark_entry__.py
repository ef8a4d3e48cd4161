"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over the engine's declared-query registry
(``bd_delete_records_from_external_hive_table_spark.plans``). The driver's verify runs
``entry(spark)`` as a smoke check, runs each ``queries()[name]`` at sf=0.01
and compares it against ``oracle_sql()[name]`` via DuckDB (row-count +
schema + order-insensitive value-hash → CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bd_delete_records_from_external_hive_table_spark import plans  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: the affected-partition probe (C1) — the
    single-scan groupBy that replaces the reference's per-partition COUNT
    loop. Stable schema (d: date, c: bigint), rows > 0."""
    return plans.REGISTRY["q06_affected_partition_probe"].spark_fn(
        spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return plans.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for each oracle-checkable query."""
    return plans.oracle_sql()
