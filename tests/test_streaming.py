"""Structured Streaming tests: stream results must equal the batch
(oracle-checked) equivalents on the same input; dedup and custom stateful
operators behave."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from bd_delete_records_from_external_hive_table_spark.sources.tables import load_table
from bd_delete_records_from_external_hive_table_spark.streaming import windows as sw


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory, sf_dir):
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(f"{sf_dir}/events.parquet", d / "events.parquet")
    return str(d)


def test_tumbling_stream_equals_batch(spark, sf_dir, events_dir):
    stream = sw.tumbling_counts(sw.stream_events(spark, events_dir))
    sw.run_to_memory(stream, "tumbling_t", "complete")
    got = {(r.wstart, r.n, r.total)
           for r in spark.table("tumbling_t").collect()}
    batch = (load_table(spark, sf_dir, "events")
             .groupBy(F.window("ts", "1 day").alias("w"))
             .agg(F.count(F.lit(1)).alias("n"),
                  F.round(F.sum("value"), 2).alias("total"))
             .select(F.col("w.start").alias("wstart"), "n", "total"))
    want = {(r.wstart, r.n, r.total) for r in batch.collect()}
    assert got == want


def test_session_windows_stream(spark, events_dir):
    stream = sw.session_windows(sw.stream_events(spark, events_dir),
                                gap="30 minutes")
    sw.run_to_memory(stream, "sessions_t", "complete")
    rows = spark.table("sessions_t").collect()
    assert rows
    for r in rows:
        assert r.session_end > r.session_start
        assert r.n_events >= 1


def test_streaming_dedup_removes_replayed_file(spark, sf_dir, tmp_path):
    d = tmp_path / "dup_stream"
    d.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", d / "a.parquet")
    shutil.copy(f"{sf_dir}/events.parquet", d / "b.parquet")  # full replay
    deduped = sw.streaming_dedup(sw.stream_events(spark, str(d)),
                                 keys=["event_id"])
    counted = deduped.groupBy().agg(F.count(F.lit(1)).alias("n"))
    sw.run_to_memory(counted, "dedup_t", "complete")
    n = spark.table("dedup_t").first()["n"]
    distinct = load_table(spark, sf_dir, "events") \
        .select("event_id").distinct().count()
    assert n == distinct


def test_running_user_totals_stateful(spark, sf_dir, events_dir):
    stream = sw.running_user_totals(sw.stream_events(spark, events_dir))
    sw.run_to_memory(stream, "user_totals_t", "update")
    got = {r.user_id: (r.n_events, r.total_value)
           for r in spark.table("user_totals_t").collect()}
    batch = (load_table(spark, sf_dir, "events")
             .groupBy("user_id")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.round(F.sum("value"), 2).alias("total")))
    want = {r.user_id: (r.n, r.total) for r in batch.collect()}
    assert got == want
