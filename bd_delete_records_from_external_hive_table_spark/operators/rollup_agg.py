"""Continuous-aggregate (hypertable-rollup) pattern: a materialized
time-bucketed rollup for history plus an on-the-fly aggregation of the
recent tail, unioned into one view.

This is how 100 TB event stores answer "daily counts for the last two
years" interactively: the rollup table holds one row per (bucket, key) —
orders of magnitude smaller than raw — and only the tail beyond the last
materialization cutoff touches raw data. The combine step re-aggregates
the union, so a bucket split across rollup and tail (or a rollup refresh
raced by late data) still sums correctly.

Aggregates must be decomposable (count/sum/min/max — same set as
operators/skew.py); avg = sum/count at read time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["materialize_rollup", "rollup_with_tail"]


def _bucket(ts_col: str, width: str):
    return F.window(ts_col, width).getField("start")


def materialize_rollup(events: DataFrame, *, cutoff,
                       ts_col: str = "ts",
                       width: str = "1 day",
                       keys: list[str] | None = None,
                       value_col: str = "value") -> DataFrame:
    """Rollup rows: (bucket[, keys...], n, total, vmin, vmax) for events
    strictly before ``cutoff`` (exclusive — the tail starts there).

    ``cutoff`` is required: a rollup over *all* events would double-count
    every tail row once served through :func:`rollup_with_tail` with any
    later cutoff. The same cutoff value must be passed to both calls.
    """
    src = events.where(F.col(ts_col) < cutoff)
    return (src.groupBy(_bucket(ts_col, width).alias("bucket"),
                        *(keys or []))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(value_col).alias("total"),
                 F.min(value_col).alias("vmin"),
                 F.max(value_col).alias("vmax")))


def rollup_with_tail(rollup: DataFrame, events: DataFrame, cutoff,
                     ts_col: str = "ts", width: str = "1 day",
                     keys: list[str] | None = None,
                     value_col: str = "value") -> DataFrame:
    """Serve the full history: materialized ``rollup`` (< cutoff) unioned
    with the raw tail (>= cutoff), re-combined per bucket. The raw scan is
    partition-prunable on ``ts_col >= cutoff``."""
    tail = (events.where(F.col(ts_col) >= cutoff)
            .groupBy(_bucket(ts_col, width).alias("bucket"), *(keys or []))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(value_col).alias("total"),
                 F.min(value_col).alias("vmin"),
                 F.max(value_col).alias("vmax")))
    return (rollup.unionByName(tail)
            .groupBy("bucket", *(keys or []))
            .agg(F.sum("n").alias("n"),
                 F.sum("total").alias("total"),
                 F.min("vmin").alias("vmin"),
                 F.max("vmax").alias("vmax")))
