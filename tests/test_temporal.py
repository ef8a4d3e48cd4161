"""As-of join and range join semantics (operators/temporal.py)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from bd_delete_records_from_external_hive_table_spark.operators.temporal import as_of_join, range_join


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_backward_inclusive(spark):
    left = spark.createDataFrame(
        [(1, _ts("2026-01-01T10:00:00")),   # before any right row
         (1, _ts("2026-01-01T12:00:00")),   # exactly at a right ts (inclusive)
         (1, _ts("2026-01-01T13:30:00")),   # between right rows
         (2, _ts("2026-01-01T12:30:00"))],  # other key
        "k long, ts timestamp")
    right = spark.createDataFrame(
        [(1, _ts("2026-01-01T12:00:00"), 10.0),
         (1, _ts("2026-01-01T13:00:00"), 20.0),
         (2, _ts("2026-01-01T12:00:00"), 99.0)],
        "k long, ts timestamp, v double")
    out = {(r.k, r.ts): r.v_asof
           for r in as_of_join(left, right, on="k",
                               value_cols=["v"]).collect()}
    assert out[(1, _ts("2026-01-01T10:00:00"))] is None
    assert out[(1, _ts("2026-01-01T12:00:00"))] == 10.0  # inclusive bound
    assert out[(1, _ts("2026-01-01T13:30:00"))] == 20.0  # latest prior
    assert out[(2, _ts("2026-01-01T12:30:00"))] == 99.0  # per-key isolation


def test_asof_null_value_in_latest_right_row_stays_null(spark):
    """The latest right row wins even when its value is NULL — and with
    two value columns both must come from the SAME right row."""
    left = spark.createDataFrame(
        [(1, _ts("2026-01-01T13:30:00"))], "k long, ts timestamp")
    right = spark.createDataFrame(
        [(1, _ts("2026-01-01T12:00:00"), 10.0, "a"),
         (1, _ts("2026-01-01T13:00:00"), None, "b")],
        "k long, ts timestamp, v double, tag string")
    row = as_of_join(left, right, on="k",
                     value_cols=["v", "tag"]).collect()[0]
    assert row.v_asof is None      # latest row's NULL preserved
    assert row.tag_asof == "b"     # both fields from the 13:00 row


def test_asof_ignores_null_ts_and_null_key_right_rows(spark):
    """SQL comparisons with NULL are never true: a right row with NULL ts
    or NULL key matches nothing (it must not sort first and leak its
    values), and a left row with no real prior match stays NULL."""
    left = spark.createDataFrame(
        [(1, _ts("2026-01-01T10:00:00"))], "k long, ts timestamp")
    right = spark.createDataFrame(
        [(1, None, 99.0),                       # NULL ts — never matches
         (None, _ts("2026-01-01T09:00:00"), 77.0),  # NULL key
         (1, _ts("2026-01-01T11:00:00"), 10.0)],    # after left ts
        "k long, ts timestamp, v double")
    row = as_of_join(left, right, on="k", value_cols=["v"]).collect()[0]
    assert row.v_asof is None


def test_range_join_rejects_bad_inputs(spark):
    points = spark.createDataFrame([(5.0,)], "x double")
    intervals = spark.createDataFrame(
        [(0, 10.0, 0.0)], "band int, lo double, hi double")  # inverted
    # inverted interval matches nothing (and must not explode)
    assert range_join(points, intervals, "x", "lo", "hi",
                      granularity=1.0).count() == 0
    import pytest as _pytest
    with _pytest.raises(ValueError):
        range_join(points, intervals, "x", "lo", "hi", granularity=0)


def test_asof_preserves_left_cardinality(spark, sf_dir):
    from bd_delete_records_from_external_hive_table_spark.sources.tables import load_table
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase")
    clicks = ev.where(F.col("event_type") == "click") \
        .select("user_id", "ts", "value")
    joined = as_of_join(purchases, clicks, on="user_id", value_cols=["value"])
    assert joined.count() == purchases.count()


def test_range_join_boundaries(spark):
    points = spark.createDataFrame(
        [(0.0,), (9.99,), (10.0,), (25.0,), (30.0,), (-1.0,)], "x double")
    intervals = spark.createDataFrame(
        [(0, 0.0, 10.0), (1, 10.0, 20.0), (2, 20.0, 30.0)],
        "band int, lo double, hi double")
    got = {r.x: r.band for r in
           range_join(points, intervals, "x", "lo", "hi",
                      granularity=10.0).collect()}
    assert got[0.0] == 0          # lo inclusive
    assert got[9.99] == 0
    assert got[10.0] == 1         # hi exclusive → next band
    assert got[25.0] == 2
    assert 30.0 not in got        # beyond last hi
    assert -1.0 not in got        # below first lo


def test_range_join_interval_spanning_buckets(spark):
    """An interval wider than the granularity must match points in every
    bucket it overlaps."""
    points = spark.createDataFrame([(5.0,), (15.0,), (35.0,)], "x double")
    intervals = spark.createDataFrame([(0, 0.0, 40.0)],
                                      "band int, lo double, hi double")
    rows = range_join(points, intervals, "x", "lo", "hi",
                      granularity=10.0).collect()
    assert sorted(r.x for r in rows) == [5.0, 15.0, 35.0]
    # no duplicate matches despite the interval exploding into 4 buckets
    assert len(rows) == 3
