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

__all__ = ["materialize_rollup", "rollup_with_tail",
           "retract_from_rollup", "refresh_stale_buckets"]


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


def retract_from_rollup(rollup: DataFrame, deleted: DataFrame, *,
                        ts_col: str = "ts", width: str = "1 day",
                        keys: list[str] | None = None,
                        value_col: str = "value",
                        ) -> tuple[DataFrame, DataFrame]:
    """Incrementally maintain a materialized rollup under DELETE — the
    continuous-aggregate sibling of the engine's copy-on-write delete
    (DeletionExecutor.java:139-230 rewrites the raw table; this keeps
    the derived rollup consistent WITHOUT recomputing history).

    ``deleted`` is the set of removed raw rows (the deletion engine
    already has it in hand as the complement of the retention set).
    count/sum are subtractable, so they're corrected exactly from the
    deleted rows alone — cost O(deleted rows), not O(history). min/max
    are NOT subtractable: a bucket where some deleted value *ties* the
    recorded vmin/vmax may have lost its extreme, so those buckets are
    returned separately for a targeted recompute.

    Returns ``(maintained, stale)``:

    - ``maintained`` — the rollup with n/total corrected, fully-deleted
      buckets dropped, and vmin/vmax carried over (valid wherever the
      bucket is not stale).
    - ``stale`` — (bucket[, keys...]) rows whose vmin/vmax need
      :func:`refresh_stale_buckets`. Deletions that never touch a
      bucket extreme (the common case for business deletes) yield an
      empty ``stale`` and the whole maintenance costs one small join.

    At 100 TB the deleted-partials side is usually tiny relative to the
    rollup, and the join broadcasts under AQE; nothing here scans raw
    events.
    """
    grp = ["bucket", *(keys or [])]
    d = (deleted.groupBy(_bucket(ts_col, width).alias("bucket"),
                         *(keys or []))
         .agg(F.count(F.lit(1)).alias("_n_del"),
              F.sum(value_col).alias("_t_del"),
              F.min(value_col).alias("_dmin"),
              F.max(value_col).alias("_dmax")))
    joined = rollup.join(d, on=grp, how="left")
    maintained = (joined
                  .withColumn("n", F.col("n") - F.coalesce("_n_del", F.lit(0)))
                  .withColumn("total",
                              F.when(F.col("_t_del").isNull(), F.col("total"))
                              .otherwise(F.col("total") - F.col("_t_del")))
                  .where(F.col("n") > 0))
    stale = (maintained
             .where((F.col("_dmin") == F.col("vmin"))
                    | (F.col("_dmax") == F.col("vmax")))
             .select(*grp))
    return maintained.select(*rollup.columns), stale


def refresh_stale_buckets(maintained: DataFrame, stale: DataFrame,
                          events: DataFrame, *, cutoff,
                          ts_col: str = "ts", width: str = "1 day",
                          keys: list[str] | None = None,
                          value_col: str = "value") -> DataFrame:
    """Recompute the full aggregate rows for ``stale`` buckets from the
    surviving raw data and splice them into ``maintained``.

    The raw scan is restricted by a semi join on the stale bucket set —
    on a time-partitioned event store that predicate prunes to the
    stale buckets' partitions, so the recompute cost scales with the
    data *under the touched buckets*, not with history. ``events`` must
    be the post-delete table (the surviving rows)."""
    grp = ["bucket", *(keys or [])]
    src = (events.where(F.col(ts_col) < cutoff)
           .withColumn("bucket", _bucket(ts_col, width)))
    recomputed = (src.join(F.broadcast(stale), on=grp, how="left_semi")
                  .groupBy(*grp)
                  .agg(F.count(F.lit(1)).alias("n"),
                       F.sum(value_col).alias("total"),
                       F.min(value_col).alias("vmin"),
                       F.max(value_col).alias("vmax")))
    kept = maintained.join(stale, on=grp, how="left_anti")
    return kept.unionByName(recomputed)
