"""Declared-query registry.

Each entry pairs an idiomatic-PySpark DataFrame builder with the ANSI-SQL
oracle DuckDB runs on the same parquet tables (SURVEY §2o). The driver's
correctness gate compares them at sf=0.01 per round: row count + schema +
order-insensitive value hash. Column names are part of the contract — every
computed column is aliased identically on both sides.

Queries with no SQL equivalent (streaming, iterative) register with
``oracle=None`` and get the driver's weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

__all__ = ["QuerySpec", "REGISTRY", "register", "queries", "oracle_sql"]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, or None → rows-only check


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None):
    """Decorator: add a (spark, sf_dir) -> DataFrame builder to the registry."""
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            # silent overwrite would drop a query from the correctness
            # gate with no error (e.g. a copy-pasted name)
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name, fn, oracle)
        return fn
    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.spark_fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items()
            if spec.oracle is not None}
