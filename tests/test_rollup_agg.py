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
