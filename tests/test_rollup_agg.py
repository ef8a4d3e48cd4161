"""Continuous-aggregate pattern: rollup + raw tail must equal a full
recompute, including a bucket split by the cutoff."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from bd_delete_records_from_external_hive_table_spark.operators.rollup_agg import (
    materialize_rollup,
    rollup_with_tail,
)
from bd_delete_records_from_external_hive_table_spark.sources.tables import load_table


def _full(events):
    return (events.groupBy(F.window("ts", "1 day").getField("start")
                           .alias("bucket"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("value").alias("total"),
                 F.min("value").alias("vmin"),
                 F.max("value").alias("vmax")))


def _as_dict(df):
    return {(r.bucket, r.event_type):
            (r.n, round(r.total, 2), r.vmin, r.vmax)
            for r in df.collect()}


def test_rollup_plus_tail_equals_full_recompute(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    # mid-day cutoff: the cutoff day's bucket exists in BOTH rollup and
    # tail and must re-combine exactly
    cutoff = datetime(2024, 1, 20, 12, 0, 0)
    rollup = materialize_rollup(events, keys=["event_type"], cutoff=cutoff)
    served = rollup_with_tail(rollup, events, cutoff, keys=["event_type"])
    assert _as_dict(served) == _as_dict(_full(events))


def test_rollup_is_much_smaller_than_raw(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    cutoff = datetime(2024, 1, 25)
    rollup = materialize_rollup(events, keys=["event_type"], cutoff=cutoff)
    # bounded by (days × event_types), independent of raw row count
    n_days = events.select(F.to_date("ts")).distinct().count()
    n_types = events.select("event_type").distinct().count()
    assert rollup.count() <= n_days * n_types
    assert rollup.count() < events.count()


def _with_bucket(events):
    return events.withColumn(
        "bucket", F.window("ts", "1 day").getField("start"))


def test_retract_then_refresh_equals_recompute_after_delete(spark, sf_dir):
    """Delete a slice, maintain the rollup incrementally (retract
    subtractable aggs + targeted min/max refresh), and the result must
    equal a from-scratch rollup over the surviving rows — including
    buckets the delete emptied entirely. The deleted set is constructed
    from the data itself: every click bucket's max-value rows (forces
    min/max staleness) plus an entire (type, window) slice (forces
    bucket drops)."""
    from bd_delete_records_from_external_hive_table_spark.operators.rollup_agg import (
        refresh_stale_buckets,
        retract_from_rollup,
    )
    events = load_table(spark, sf_dir, "events")
    cutoff = datetime(2024, 2, 1, 0, 0, 0)
    rollup = materialize_rollup(events, keys=["event_type"], cutoff=cutoff)

    max_click_rows = (_with_bucket(events.where(F.col("ts") < F.lit(cutoff)))
                      .where(F.col("event_type") == "click")
                      .join(rollup.select("bucket", "event_type", "vmax"),
                            ["bucket", "event_type"])
                      .where(F.col("value") == F.col("vmax"))
                      .select(*events.columns))
    slice_rows = events.where(
        (F.col("event_type") == "purchase")
        & (F.col("ts") >= F.lit("2024-01-05").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-08").cast("timestamp")))
    deleted = max_click_rows.unionByName(slice_rows)  # disjoint by type
    survivors = events.exceptAll(deleted)

    maintained, stale = retract_from_rollup(
        rollup, deleted, keys=["event_type"])
    refreshed = refresh_stale_buckets(
        maintained, stale, survivors, cutoff=cutoff, keys=["event_type"])

    expect = materialize_rollup(survivors, keys=["event_type"],
                                cutoff=cutoff)
    assert _as_dict(refreshed) == _as_dict(expect)
    # the delete really exercised both paths
    assert stale.count() > 0
    assert maintained.count() < rollup.count()  # emptied buckets dropped


def test_retract_untouched_extremes_needs_no_refresh(spark, sf_dir):
    """A delete that only removes strictly-interior values (vmin < value
    < vmax in their bucket) yields an empty stale set — maintenance is
    one join, no raw-data scan at all."""
    from bd_delete_records_from_external_hive_table_spark.operators.rollup_agg import (
        retract_from_rollup,
    )
    events = load_table(spark, sf_dir, "events")
    cutoff = datetime(2024, 2, 1, 0, 0, 0)
    rollup = materialize_rollup(events, keys=["event_type"], cutoff=cutoff)

    deleted = (_with_bucket(events.where(F.col("ts") < F.lit(cutoff)))
               .where(F.col("event_type") == "view")
               .join(rollup.select("bucket", "event_type", "vmin", "vmax"),
                     ["bucket", "event_type"])
               .where((F.col("value") > F.col("vmin"))
                      & (F.col("value") < F.col("vmax")))
               .select(*events.columns))
    assert deleted.count() > 0
    survivors = events.exceptAll(deleted)

    maintained, stale = retract_from_rollup(
        rollup, deleted, keys=["event_type"])
    assert stale.count() == 0
    expect = materialize_rollup(survivors, keys=["event_type"],
                                cutoff=cutoff)
    assert _as_dict(maintained) == _as_dict(expect)
