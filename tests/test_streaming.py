"""Structured Streaming tests: stream results must equal the batch
(oracle-checked) equivalents on the same input; dedup and custom stateful
operators behave."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import Window
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


def test_interval_join_left_outer_batch_semantics(spark, sf_dir):
    """Batch form: left_outer == inner ∪ (unmatched left with NULL r_ts);
    every left event appears at least once."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.date_trunc("second", F.col("ts")))
    views = ev.where("event_type = 'view'")
    clicks = ev.where("event_type = 'click'")
    inner = sw.interval_join(views, clicks, max_delay="1 hour")
    outer = sw.interval_join(views, clicks, max_delay="1 hour",
                             how="left_outer")
    inner_rows = {(r.user_id, r.l_ts, r.r_ts) for r in inner.collect()}
    outer_rows = {(r.user_id, r.l_ts, r.r_ts) for r in outer.collect()}
    assert inner_rows <= outer_rows
    nulls = {(u, lt) for (u, lt, rt) in outer_rows if rt is None}
    matched = {(u, lt) for (u, lt, rt) in outer_rows if rt is not None}
    assert nulls.isdisjoint(matched)  # a left row is matched XOR null
    # every view appears exactly once as either matched-or-null key
    n_views = views.select("user_id", "ts").distinct().count()
    assert len(nulls | matched) == n_views
    assert nulls, "some views must be unconverted"


def test_interval_join_left_outer_stream_emits_unmatched(spark, sf_dir,
                                                         tmp_path):
    """Streaming outer join: unmatched left rows emit once a later batch
    advances the watermark past l_ts + max_delay. Two single-file
    triggers make the second batch advance the watermark over the
    first's events."""
    d = tmp_path / "outer_stream"
    d.mkdir()
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.date_trunc("second", F.col("ts")))
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    mid = lo + (hi - lo) / 2
    halves = (("early", ev.where(F.col("ts") <= mid)),
              ("late", ev.where(F.col("ts") > mid)))
    for name, half in halves:
        tmpd = tmp_path / f"w_{name}"
        half.coalesce(1).write.parquet(str(tmpd))
        part = next(p for p in tmpd.iterdir()
                    if p.name.endswith(".parquet"))
        shutil.copy(part, d / f"{name}.parquet")
    stream = sw.stream_events(spark, str(d), max_files_per_trigger=1)
    out = sw.interval_join(stream.where("event_type = 'view'"),
                           stream.where("event_type = 'click'"),
                           max_delay="1 hour", watermark="1 minute",
                           how="left_outer")
    sw.run_to_memory(out, "outer_join_t", "append")
    rows = spark.table("outer_join_t").collect()
    assert rows
    assert any(r.r_ts is None for r in rows), \
        "watermark advance must flush unmatched views"


def test_per_key_quota_stream(spark, sf_dir, events_dir):
    """Stateful quota sampler: at most `quota` events
    emitted per user across the stream; users under the quota keep every
    event."""
    quota = 5
    out = sw.per_key_quota(sw.stream_events(spark, events_dir),
                           quota=quota)
    sw.run_to_memory(out, "quota_t", "append")
    got = (spark.table("quota_t").groupBy("user_id")
           .agg(F.count(F.lit(1)).alias("n"),
                F.countDistinct("event_id").alias("nd")).collect())
    totals = {r.user_id: r.n for r in
              load_table(spark, sf_dir, "events").groupBy("user_id")
              .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert {r.user_id for r in got} == set(totals)
    for r in got:
        assert r.n == min(totals[r.user_id], quota), r
        assert r.nd == r.n  # admitted rows are distinct events, no dups


def test_per_key_quota_custom_key(spark, sf_dir, events_dir):
    """The quota key is a parameter: grouping by event_type must emit
    (event_type, event_id) with the key column's real dtype — round-2
    advice flagged the projection/schema as hardcoded to user_id."""
    quota = 7
    out = sw.per_key_quota(sw.stream_events(spark, events_dir),
                           quota=quota, key="event_type")
    sw.run_to_memory(out, "quota_et_t", "append")
    tbl = spark.table("quota_et_t")
    assert tbl.columns == ["event_type", "event_id"]
    assert dict(tbl.dtypes)["event_type"] == "string"
    got = {r.event_type: r.n
           for r in tbl.groupBy("event_type")
           .agg(F.count(F.lit(1)).alias("n")).collect()}
    totals = {r.event_type: r.n for r in
              load_table(spark, sf_dir, "events").groupBy("event_type")
              .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(got) == set(totals)
    for et, n in got.items():
        assert n == min(totals[et], quota), (et, n)


def test_stream_events_empty_dir_warns(spark, tmp_path):
    """An empty source dir falls back to EVENTS_FILE_SCHEMA with an
    explicit warning (legacy-dir callers must know to pass the legacy
    schema); real errors are not swallowed."""
    d = tmp_path / "empty_events"
    d.mkdir()
    with pytest.warns(UserWarning, match="EVENTS_FILE_SCHEMA"):
        df = sw.stream_events(spark, str(d))
    assert dict(df.dtypes)["ts"] == "timestamp"


def test_session_windows_stream_equals_batch_sf01(spark, tmp_path):
    """Session-window parity at bench scale (sf0.1): the streaming
    session assembly (state merge + eviction) must produce exactly the
    batch session_window result — st03's shape, 10x the smoke data."""
    sf1 = "/root/testdata/sf0.1"
    d = tmp_path / "events_sf01"
    d.mkdir()
    shutil.copy(f"{sf1}/events.parquet", d / "events.parquet")
    stream = sw.session_windows(sw.stream_events(spark, str(d)),
                                gap="30 minutes")
    sw.run_to_memory(stream, "sessions_sf01_t", "complete")
    key = ("user_id", "session_start", "session_end", "n_events",
           "session_value")
    got = {tuple(r[k] for k in key)
           for r in spark.table("sessions_sf01_t").collect()}
    batch = sw.session_windows(load_table(spark, sf1, "events"),
                               gap="30 minutes")  # watermark no-op in batch
    want = {tuple(r[k] for k in key) for r in batch.collect()}
    assert got == want
    assert len(got) > 100  # sf0.1 actually exercises many sessions


def test_stream_events_on_empty_dir_then_fill(spark, sf_dir, tmp_path):
    """A stream started on an empty directory (normal file-source setup —
    the producer fills it later) must not die on schema inference; the
    fallback schema kicks in and data copied in afterwards is read."""
    d = tmp_path / "empty_start"
    d.mkdir()
    stream = sw.stream_events(spark, str(d))  # must not raise
    assert stream.isStreaming
    assert dict(stream.dtypes)["ts"] == "timestamp"
    # producer shows up: the same stream definition reads the new file
    shutil.copy(f"{sf_dir}/events.parquet", d / "events.parquet")
    counted = stream.groupBy().agg(F.count(F.lit(1)).alias("n"))
    sw.run_to_memory(counted, "empty_start_t", "complete")
    n = spark.table("empty_start_t").first()["n"]
    expect = load_table(spark, sf_dir, "events").count()
    assert n == expect


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


def test_streaming_debounce_matches_batch_keyset(spark, sf_dir, events_dir):
    """st06's streaming sibling: dropDuplicatesWithinWatermark keyed on
    (user_id, event_type, minute-bucket) keeps exactly one event per
    debounce key. WHICH row survives is arrival-order-dependent in a
    stream, so parity is asserted on the KEY SET (and its size), which
    both forms must agree on exactly."""
    ev = sw.stream_events(spark, events_dir).withColumn(
        "minute", F.date_trunc("minute", F.col("ts")))
    deduped = sw.streaming_dedup(
        ev, keys=["user_id", "event_type", "minute"])
    sw.run_to_memory(deduped.select("user_id", "event_type", "minute"),
                     "debounce_t", "append")
    got = {(r.user_id, r.event_type, r.minute)
           for r in spark.table("debounce_t").collect()}
    batch = (load_table(spark, sf_dir, "events")
             .select("user_id", "event_type",
                     F.date_trunc("minute", F.col("ts")).alias("minute"))
             .distinct())
    want = {(r.user_id, r.event_type, r.minute) for r in batch.collect()}
    assert got == want


def test_stream_static_enrichment_matches_batch(spark, sf_dir, events_dir):
    """Stream-static join: enrich the event stream with a static user
    dimension (cohort = user_id % 5), aggregate per cohort, and match
    the batch equivalent exactly. Left join keeps events missing from
    the dimension: dropping even users ensures the NULL-cohort bucket
    is exercised."""
    batch_ev = load_table(spark, sf_dir, "events")
    dim = (batch_ev.select("user_id").distinct()
           .where(F.col("user_id") % 2 == 1)  # odd users only
           .withColumn("cohort", F.col("user_id") % 5))
    enriched = sw.enrich_with_static(
        sw.stream_events(spark, events_dir), dim)
    agg = (enriched.groupBy("cohort")
           .agg(F.count(F.lit(1)).alias("n"),
                F.round(F.sum("value"), 2).alias("total")))
    sw.run_to_memory(agg, "enrich_t", "complete")
    got = {(r.cohort, r.n, r.total)
           for r in spark.table("enrich_t").collect()}
    want = {(r.cohort, r.n, r.total)
            for r in (batch_ev.join(dim, "user_id", "left")
                      .groupBy("cohort")
                      .agg(F.count(F.lit(1)).alias("n"),
                           F.round(F.sum("value"), 2).alias("total"))
                      ).collect()}
    assert got == want
    assert any(c is None for c, _, _ in got)  # even users NULL-padded


def test_stateful_sessions_timeout_matches_batch(spark, sf_dir, tmp_path):
    """Event-time-timeout sessionization: batch 1 is the real event file,
    batch 2 a single far-future sentinel event (user −1). Processing the
    sentinel advances the watermark past every real session's
    last_event + gap, so ALL real sessions flush via state.hasTimedOut —
    and must equal the batch F.session_window sessions exactly
    (start, last-event end, count). The sentinel's own session stays
    open in state (nothing ever outlasts its timeout) and is excluded."""
    import os

    d = tmp_path / "sess_stream"
    d.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", d / "a.parquet")
    batch_ev = load_table(spark, sf_dir, "events")
    max_ts = batch_ev.agg(F.max("ts")).first()[0]
    sentinel = spark.createDataFrame(
        [(999_999, max_ts + __import__("datetime").timedelta(days=30),
          -1, "view", 0.0, "{}")],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string")
    sentinel.coalesce(1).write.parquet(str(tmp_path / "sentinel_out"))
    part = next((tmp_path / "sentinel_out").glob("part-*.parquet"))
    shutil.copy(part, d / "b.parquet")
    # file source processes oldest-mtime first: keep a.parquet older
    os.utime(d / "a.parquet", (1, 1))
    stream = sw.stream_events(spark, str(d),
                              max_files_per_trigger=1).withColumn(
        "ts", F.date_trunc("second", F.col("ts")))
    sessions = sw.stateful_sessions(stream, gap="30 minutes")
    q = (sessions.writeStream.format("memory").queryName("sess_state_t")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {(r.user_id, r.session_start, r.session_end, r.n_events)
           for r in spark.table("sess_state_t").collect()
           if r.user_id >= 0}
    want_df = (batch_ev.withColumn(
        "ts", F.date_trunc("second", F.col("ts")))
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.min("ts").alias("s"), F.max("ts").alias("e"),
             F.count(F.lit(1)).alias("n")))
    want = {(r.user_id, r.s, r.e, r.n) for r in want_df.collect()}
    assert got == want
    assert len(got) > 0


def test_watermark_drops_late_rows_in_append_mode(spark, tmp_path):
    """Late-data handling: with a 30-min watermark and 1-hour tumbling
    windows in append mode, rows arriving after their window's watermark
    has passed are dropped — bounded state is what makes streaming aggs
    viable at scale."""
    from datetime import datetime

    from pyspark.sql import functions as F

    d = tmp_path / "late_stream"
    d.mkdir()
    base = datetime(2026, 3, 1, 0, 0, 0)

    def write_file(name, rows):
        df = spark.createDataFrame(rows, "event_id long, ts timestamp, "
                                         "user_id long, event_type string, "
                                         "value double, props string")
        # single file per trigger; convert to the on-disk long-nanos shape
        (df.select("event_id",
                   (F.unix_timestamp("ts") * 1_000_000_000).alias("ts"),
                   "user_id", "event_type", "value", "props")
         .coalesce(1).write.mode("overwrite")
         .parquet(str(tmp_path / f"stage_{name}")))
        import glob
        import shutil
        src = glob.glob(str(tmp_path / f"stage_{name}" / "part-*.parquet"))[0]
        shutil.copy(src, d / f"{name}.parquet")

    def ts(h, m=0):
        return base.replace(hour=h, minute=m)

    # Three checkpointed runs = three ordered micro-batches (the
    # checkpoint carries watermark + window state across runs):
    # 1) events 02:00/02:10        → watermark advances to 01:40
    # 2) on-time 02:30 + late 00:05 (00:00 window far behind watermark
    #    → the late row must be dropped, never re-opening the window)
    # 3) event 04:00               → watermark 03:30 closes [02:00,03:00)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def run_batch():
        stream = (sw.stream_events(spark, str(d))
                  .withWatermark("ts", "30 minutes")
                  .groupBy(F.window("ts", "1 hour").alias("w"))
                  .agg(F.count(F.lit(1)).alias("n"))
                  .select(F.col("w.start").alias("wstart"), "n"))
        q = (stream.writeStream.format("parquet")
             .option("path", out)
             .option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination()

    write_file("a", [(1, ts(2, 0), 1, "click", 1.0, "{}"),
                     (2, ts(2, 10), 1, "click", 1.0, "{}")])
    run_batch()
    write_file("b", [(3, ts(2, 30), 1, "click", 1.0, "{}"),
                     (4, ts(0, 5), 1, "click", 1.0, "{}")])
    run_batch()
    write_file("c", [(5, ts(4, 0), 1, "click", 1.0, "{}")])
    run_batch()

    emitted = {r.wstart: r.n for r in spark.read.parquet(out).collect()}
    # the late row was dropped: the 00:00 window never emitted anywhere
    assert ts(0, 0) not in emitted, emitted
    # the finalized 02:00 window counts only the on-time rows 1,2,3
    assert emitted.get(ts(2, 0)) == 3, emitted


def test_stream_to_partitioned_table_idempotent(spark, sf_dir, tmp_path):
    """foreachBatch + dynamic partition overwrite: replaying the same
    input (fresh checkpoint, same files) converges to the same table
    state instead of appending duplicates."""
    from pyspark.sql import functions as F

    from bd_delete_records_from_external_hive_table_spark.streaming.sink import (
        write_stream_to_partitioned_table,
    )

    d = tmp_path / "in"
    d.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", d / "events.parquet")
    spark.sql("CREATE DATABASE IF NOT EXISTS stream_db")
    spark.sql("DROP TABLE IF EXISTS stream_db.events_by_day")
    spark.sql("""
        CREATE TABLE stream_db.events_by_day (
          event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
          event_type STRING, value DOUBLE, props STRING
        ) PARTITIONED BY (day STRING) STORED AS PARQUET
    """)
    try:
        def run(ckpt):
            q = write_stream_to_partitioned_table(
                sw.stream_events(spark, str(d)),
                "stream_db.events_by_day", "day",
                F.date_format("ts", "yyyyMMdd"), checkpoint=str(ckpt))
            q.awaitTermination()

        def count():
            # foreachBatch runs in a cloned session; this session's file
            # listing must be refreshed after the overwrite
            spark.catalog.refreshTable("stream_db.events_by_day")
            return spark.table("stream_db.events_by_day").count()

        run(tmp_path / "ckpt1")
        n1 = count()
        run(tmp_path / "ckpt2")  # full replay with a fresh checkpoint
        n2 = count()
        expected = load_table(spark, sf_dir, "events").count()
        assert n1 == expected
        assert n2 == expected  # no duplicates after the replay
        days = spark.sql("SHOW PARTITIONS stream_db.events_by_day").count()
        assert days >= 2  # actually partitioned by day
    finally:
        spark.sql("DROP TABLE IF EXISTS stream_db.events_by_day")


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


def test_interval_join_stream_equals_batch(spark, sf_dir, events_dir):
    """Stream-stream interval join (view → click within 1 hour per user)
    must produce exactly the batch join's pairs. Append mode: pairs emit
    once their watermark passes; availableNow drains everything."""
    views = sw.stream_events(spark, events_dir).where("event_type = 'view'")
    clicks = sw.stream_events(spark, events_dir).where("event_type = 'click'")
    joined = sw.interval_join(views, clicks, max_delay="1 hour")
    q = (joined.writeStream.format("memory").queryName("ij_t")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    got = {(r.user_id, r.l_ts, r.r_ts)
           for r in spark.table("ij_t").collect()}

    ev = load_table(spark, sf_dir, "events")
    b = sw.interval_join(ev.where("event_type = 'view'"),
                         ev.where("event_type = 'click'"),
                         max_delay="1 hour")
    want = {(r.user_id, r.l_ts, r.r_ts) for r in b.collect()}
    assert got == want and len(want) > 0


def test_cdc_stream_merges_into_hive_table(spark, tmp_path):
    """CDC micro-batches merge into a partitioned Hive table: last-wins
    within a batch, update + insert + key-move across partitions."""
    from bd_delete_records_from_external_hive_table_spark.streaming.sink import (
        write_cdc_stream_to_table,
    )

    db, table = "test_db", "test_cdc_sink"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    spark.sql(f"DROP TABLE IF EXISTS {db}.{table}")
    spark.sql(f"""
        CREATE TABLE {db}.{table} (
          id BIGINT, name STRING, status STRING, row_create_ts TIMESTAMP
        ) PARTITIONED BY (partition_id STRING) STORED AS ORC
    """)
    spark.sql(f"""
        INSERT INTO {db}.{table} PARTITION (partition_id='20260213') VALUES
        (1, 'User1', 'ACTIVE', TIMESTAMP '2026-02-13 09:00:00'),
        (2, 'User2', 'ACTIVE', TIMESTAMP '2026-02-13 09:00:00')
    """)

    cdc_schema = ("id BIGINT, name STRING, status STRING, "
                  "row_create_ts TIMESTAMP, partition_id STRING")
    cdc_dir = tmp_path / "cdc_in"
    cdc_dir.mkdir()
    # two versions of id=2 in one batch (last-wins on row_create_ts),
    # a key-move for id=1, and a brand-new id=3
    updates = spark.createDataFrame([
        (2, "User2-old", "ACTIVE", "2026-02-14 08:00:00", "20260213"),
        (2, "User2-new", "ACTIVE", "2026-02-14 09:00:00", "20260213"),
        (1, "User1-moved", "MOVED", "2026-02-14 09:00:00", "20260214"),
        (3, "User3", "NEW", "2026-02-14 09:00:00", "20260214"),
    ], "id BIGINT, name STRING, status STRING, row_create_ts STRING, "
       "partition_id STRING").selectExpr(
        "id", "name", "status",
        "CAST(row_create_ts AS TIMESTAMP) AS row_create_ts", "partition_id")
    updates.coalesce(1).write.parquet(str(cdc_dir / "batch1"))

    stream = (spark.readStream.schema(cdc_schema)
              .option("pathGlobFilter", "*.parquet")
              .parquet(str(cdc_dir / "batch1")))
    q = write_cdc_stream_to_table(
        stream, db, table, key_columns=["id"], order_col="row_create_ts",
        checkpoint=str(tmp_path / "ckpt"))
    q.awaitTermination()

    snap = {r.id: (r.name, r.status, r.partition_id)
            for r in spark.table(f"{db}.{table}").collect()}
    assert snap == {
        1: ("User1-moved", "MOVED", "20260214"),
        2: ("User2-new", "ACTIVE", "20260213"),
        3: ("User3", "NEW", "20260214"),
    }
    spark.sql(f"DROP TABLE IF EXISTS {db}.{table}")


def test_stream_events_missing_path_raises(spark, tmp_path):
    """A typo'd path must surface as PATH_NOT_FOUND, not be swallowed
    into the empty-directory schema fallback (which would mislead with
    a schema warning and fail later, obscured, at stream start)."""
    from pyspark.errors import AnalysisException

    with pytest.raises(AnalysisException):
        sw.stream_events(spark, str(tmp_path / "no_such_dir"))


def test_last_touch_attribution_stream_equals_batch(spark, sf_dir,
                                                    events_dir):
    """The streaming attributor's per-channel purchase counts must
    equal the oracle-checked w13 batch window exactly: same corpus,
    one micro-batch (in-order contract trivially satisfied), append
    output aggregated in the sink. Also pins the per-purchase grain:
    one output row per purchase event, keyed by event_id."""
    from bd_delete_records_from_external_hive_table_spark import plans

    stream = sw.last_touch_attribution(sw.stream_events(spark, events_dir))
    sw.run_to_memory(stream, "attr_t", "append")
    rows = spark.table("attr_t").collect()
    n_purchases = (load_table(spark, sf_dir, "events")
                   .where("event_type = 'purchase'").count())
    assert len(rows) == n_purchases
    assert len({r.event_id for r in rows}) == n_purchases
    got: dict[str, int] = {}
    for r in rows:
        ch = r.channel if r.channel is not None else "(none)"
        got[ch] = got.get(ch, 0) + 1
    want = {r.channel: r.purchases
            for r in plans.REGISTRY["w13_last_touch_attribution"]
            .spark_fn(spark, sf_dir).collect()}
    assert got == want


# ---------------------------------------------------------------------------
# streaming ingest dedup (d10's streaming sibling, round 9)
# ---------------------------------------------------------------------------

def _docs_stream(spark, path):
    return (spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)  # one file == one batch
            .parquet(path))


def _write_batch(df, directory, name, mtime):
    import os
    df.coalesce(1).write.mode("overwrite").parquet(f"{directory}/_tmp")
    import glob
    src = glob.glob(f"{directory}/_tmp/part-*.parquet")[0]
    dst = f"{directory}/{name}.parquet"
    shutil.copy(src, dst)
    shutil.rmtree(f"{directory}/_tmp")
    os.utime(dst, (mtime, mtime))  # file-source batch order = mtime


def test_ingest_dedup_stream_equals_batch_ladder(spark, sf_dir, tmp_path):
    """Exact-mode streaming ingest over TWO micro-batches must admit
    exactly what an INDEPENDENTLY-written d10-style batch ladder admits
    (store anti-join + min-id keeper, store grows between batches) —
    the cross-batch duplicate in batch 2 is the part only a persistent
    store can get right."""
    from bd_delete_records_from_external_hive_table_spark.streaming import ingest as si

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.where(F.col("doc_id") < 400)
    b1 = (docs.where((F.col("doc_id") >= 400) & (F.col("doc_id") < 450))
          .unionByName(  # dup-vs-corpus plants
              corpus.where(F.col("doc_id") % 20 == 0)
              .select((F.col("doc_id") + 3000).alias("doc_id"), "text")))
    b2 = (docs.where((F.col("doc_id") >= 450) & (F.col("doc_id") < 500))
          .unionByName(  # CROSS-BATCH dups: copies of batch-1 docs
              docs.where((F.col("doc_id") >= 400) & (F.col("doc_id") < 450)
                         & (F.col("doc_id") % 5 == 0))
              .select((F.col("doc_id") + 5000).alias("doc_id"), "text"))
          .unionByName(  # in-batch dups
              docs.where((F.col("doc_id") >= 450) & (F.col("doc_id") < 500)
                         & (F.col("doc_id") % 25 == 0))
              .select((F.col("doc_id") + 4000).alias("doc_id"), "text")))

    d = tmp_path / "ingest"
    d.mkdir()
    _write_batch(b1, str(d), "b1", 1_000_000_000)
    _write_batch(b2, str(d), "b2", 1_000_000_100)

    store_dir = str(tmp_path / "store")
    si.seed_store(corpus, store_dir, mode="exact")
    q = si.ingest_dedup_stream(
        _docs_stream(spark, str(d)), store_dir,
        str(tmp_path / "admitted"), str(tmp_path / "ckpt"))
    q.processAllAvailable()
    q.stop()

    adm = spark.read.parquet(str(tmp_path / "admitted"))
    got = {r.doc_id for r in adm.collect()}
    by_batch = {r.batch_id for r in adm.collect()}
    assert len(by_batch) == 2  # two micro-batches really happened

    # independent batch ladder (d10's rule, written from scratch)
    def ladder(batch_df, store_hashes):
        b = batch_df.select("doc_id", F.md5("text").alias("h")).collect()
        fresh = [(r.doc_id, r.h) for r in b if r.h not in store_hashes]
        keep = {}
        for i, h in fresh:
            keep[h] = min(keep.get(h, i), i)
        return set(keep.values()), {h for _, h in fresh}

    store = {r.h for r in corpus.select(F.md5("text").alias("h"))
             .distinct().collect()}
    a1, h1 = ladder(b1, store)
    store |= h1
    a2, h2 = ladder(b2, store)
    assert got == a1 | a2
    # the cross-batch plants (ids [5000, 10000)) must all be rejected —
    # assert it directly on the admitted set, not filtered through the
    # already-asserted got == a1 | a2 (the r9-advice vacuous form)
    assert not any(5000 <= i < 10000 for i in got)
    assert all(i + 5000 not in got
               for i in range(400, 450, 5))


def test_ingest_minhash_mode_blocks_near_dups(spark, sf_dir, tmp_path):
    """MinHash-mode admission: batch-2 near-copies of admitted batch-1
    docs are rejected by the band-key store; in-batch twins collapse to
    the min-id survivor; brand-new docs pass."""
    from bd_delete_records_from_external_hive_table_spark.streaming import ingest as si

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    long_docs = docs.where(F.size(F.split("text", r"\s+")) >= 12)
    b1 = long_docs.where((F.col("doc_id") >= 100) & (F.col("doc_id") < 140))
    # near-copies (2 appended tokens, d20's perturbation) + new docs
    near = (b1.where(F.col("doc_id") % 2 == 0)
            .select((F.col("doc_id") + 7000).alias("doc_id"),
                    F.concat("text", F.lit(" zq zq")).alias("text")))
    twin_src = long_docs.where(
        (F.col("doc_id") >= 140) & (F.col("doc_id") < 160))
    twins = twin_src.select((F.col("doc_id") + 8000).alias("doc_id"),
                            "text")
    b2 = twin_src.unionByName(twins).unionByName(near)

    d = tmp_path / "mh"
    d.mkdir()
    _write_batch(b1, str(d), "b1", 1_000_000_000)
    _write_batch(b2, str(d), "b2", 1_000_000_100)

    store_dir = str(tmp_path / "mh_store")
    q = si.ingest_dedup_stream(
        _docs_stream(spark, str(d)), store_dir,
        str(tmp_path / "mh_admitted"), str(tmp_path / "mh_ckpt"),
        mode="minhash")
    q.processAllAvailable()
    q.stop()

    got = {r.doc_id for r in
           spark.read.parquet(str(tmp_path / "mh_admitted")).collect()}
    b1_ids = {r.doc_id for r in b1.select("doc_id").collect()}
    assert b1_ids <= got                      # batch 1: all new
    near_ids = {r.doc_id for r in near.select("doc_id").collect()}
    assert near_ids and not (near_ids & got)  # near-copies blocked
    twin_ids = {r.doc_id for r in twins.select("doc_id").collect()}
    src_ids = {r.doc_id for r in twin_src.select("doc_id").collect()}
    assert src_ids <= got                     # in-batch: min-id keeper
    assert not (twin_ids & got)               # exact twins collapsed


def test_ingest_minhash_stream_equals_d15_batch_survivors(
        spark, sf_dir, tmp_path):
    """Round-10 (r9 verdict item 8): stream==batch parity between the
    minhash ingest ladder and d15's BATCH fuzzy-dedup survivor
    selection — the remaining gap between the streaming store and the
    batch pipeline. On a corpus of EXACT-duplicate families (identical
    text => identical length), d15's keep-best rule (longest text,
    min node on ties) provably coincides with the stream's min-id
    rule, and batches ordered by ascending id make the stream's
    first-arrival survivor the global min — so the admitted key set
    must equal d15's survivors plus the singletons, exactly. Both
    sides share the signature/banding construction, so every LSH
    coincidence is common to both; the distinct-filler guard below
    keeps the comparison exact rather than probabilistic."""
    from bd_delete_records_from_external_hive_table_spark.operators import dedup
    from bd_delete_records_from_external_hive_table_spark.streaming import ingest as si

    docs = (load_table(spark, sf_dir, "documents")
            .select("doc_id", "text")
            .where(F.size(F.filter(F.split("text", r"\s+"),
                                   lambda t: t != "")) >= 12))
    base = docs.where(F.col("doc_id") < 300)
    # the filler docs must have NO organic LSH candidate pairs among
    # themselves (keep-best-by-length and min-id could diverge on a
    # verified pair; an UNVERIFIED band collision would block in the
    # stream but not in d15) — drop every member of any organic
    # candidate pair, so only the planted families pair at all
    sigs = dedup.minhash_signatures(base, "text", "doc_id", 32, 3)
    organic = dedup.lsh_candidate_pairs(sigs, "doc_id", 8, 32).collect()
    bad = sorted({r.a for r in organic} | {r.b for r in organic})
    base = base.where(~F.col("doc_id").isin(bad))
    base1 = base.where(F.col("doc_id") < 200)
    base2 = base.where(F.col("doc_id") >= 200)

    copy = lambda df, off: df.select(
        (F.col("doc_id") + off).alias("doc_id"), "text")
    b1 = base1.unionByName(                      # in-batch exact dups
        copy(base1.where(F.col("doc_id") % 5 == 0), 50_000))
    b2 = (base2
          .unionByName(                          # cross-batch dups
              copy(base1.where(F.col("doc_id") % 7 == 0), 60_000))
          .unionByName(                          # in-batch dups
              copy(base2.where(F.col("doc_id") % 6 == 0), 70_000)))

    d = tmp_path / "fz"
    d.mkdir()
    _write_batch(b1, str(d), "b1", 1_000_000_000)
    _write_batch(b2, str(d), "b2", 1_000_000_100)
    q = si.ingest_dedup_stream(
        _docs_stream(spark, str(d)), str(tmp_path / "fz_store"),
        str(tmp_path / "fz_admitted"), str(tmp_path / "fz_ckpt"),
        mode="minhash")
    q.processAllAvailable()
    q.stop()
    got = {r.doc_id for r in
           spark.read.parquet(str(tmp_path / "fz_admitted")).collect()}

    # d15's batch pipeline over the full union: verified LSH pairs ->
    # connected components -> keep-best survivor (longest text, min
    # node); singletons survive by absence
    aug = b1.unionByName(b2).localCheckpoint(eager=False)
    pairs = dedup.minhash_near_duplicates(
        aug, num_hashes=32, bands=8, shingle_size=3, threshold=0.5)
    comps = dedup.connected_components(pairs)
    lens = aug.select(F.col("doc_id").alias("node"),
                      F.length("text").alias("_len"))
    w = Window.partitionBy("component").orderBy(F.desc("_len"), "node")
    verdicts = (comps.join(lens, "node")
                .select(F.col("node").alias("doc_id"),
                        (F.row_number().over(w) == 1).alias("keep"))
                .collect())
    clustered = {r.doc_id for r in verdicts}
    survivors = {r.doc_id for r in verdicts if r.keep}
    all_ids = {r.doc_id for r in aug.select("doc_id").collect()}
    expected = survivors | (all_ids - clustered)
    assert got == expected


def test_read_store_empty_dir_is_empty_store(spark, tmp_path):
    """Round-11 (r10 advice): a store_dir that EXISTS but holds no
    data files (an empty first micro-batch under dynamic overwrite
    leaves only _SUCCESS) is the same "not created yet" state as a
    missing path — read_store must return the empty typed store, not
    raise UNABLE_TO_INFER_SCHEMA and kill the stream."""
    from bd_delete_records_from_external_hive_table_spark.streaming.ingest import read_store

    d = tmp_path / "store"
    d.mkdir()
    (d / "_SUCCESS").touch()
    for mode in ("exact", "minhash"):
        got = read_store(spark, str(d), mode=mode)
        assert got.count() == 0
    # a genuinely corrupt store must still surface
    bad = tmp_path / "corrupt"
    bad.mkdir()
    (bad / "part-00000.parquet").write_bytes(b"not a parquet file")
    import pytest as _pytest
    with _pytest.raises(Exception):
        read_store(spark, str(bad)).collect()


def test_ingest_stream_min_id_vs_d15_keep_best_divergence(
        spark, sf_dir, tmp_path):
    """Round-11 (r10 verdict item 6): the exact-dup construction in
    the parity test above makes keep-best coincide with min-id, so a
    silent survivor-policy change in the streaming store could never
    fail it. Here the planted copies are PERTURBED to be strictly
    LONGER than their originals (unique appended tokens, so copies
    never pair with each other), which drives the two documented rules
    apart: the stream's first-arrival/min-id rule must admit the
    ORIGINAL and block the later, longer copy; d15's keep-best rule
    (longest text wins) must keep the COPY and drop the original.
    Asserting BOTH directions pins each policy — if either side
    silently adopts the other's rule, the test fails."""
    from bd_delete_records_from_external_hive_table_spark.operators import dedup
    from bd_delete_records_from_external_hive_table_spark.streaming import ingest as si

    docs = (load_table(spark, sf_dir, "documents")
            .select("doc_id", "text")
            .where(F.size(F.filter(F.split("text", r"\s+"),
                                   lambda t: t != "")) >= 12))
    base = docs.where(F.col("doc_id") < 250)
    # drop members of organic LSH candidate pairs (same guard as the
    # exact-dup parity test): only planted families may pair
    sigs = dedup.minhash_signatures(base, "text", "doc_id", 32, 3)
    organic = dedup.lsh_candidate_pairs(sigs, "doc_id", 8, 32).collect()
    bad = sorted({r.a for r in organic} | {r.b for r in organic})
    base = base.where(~F.col("doc_id").isin(bad)).localCheckpoint()

    OFF = 80_000
    # copy = original + three tokens UNIQUE to the doc (no cross-copy
    # shingle overlap) -> strictly longer, J vs original stays high
    longer = base.where(F.col("doc_id") % 4 == 0).select(
        (F.col("doc_id") + OFF).alias("doc_id"),
        F.concat("text", F.lit(" qx"), F.col("doc_id").cast("string"),
                 F.lit("a qx"), F.col("doc_id").cast("string"),
                 F.lit("b qx"), F.col("doc_id").cast("string"),
                 F.lit("c")).alias("text"))
    d = tmp_path / "dv"
    d.mkdir()
    _write_batch(base, str(d), "b1", 1_000_000_000)       # originals
    _write_batch(longer, str(d), "b2", 1_000_000_100)     # later copies
    q = si.ingest_dedup_stream(
        _docs_stream(spark, str(d)), str(tmp_path / "dv_store"),
        str(tmp_path / "dv_admitted"), str(tmp_path / "dv_ckpt"),
        mode="minhash")
    q.processAllAvailable()
    q.stop()
    admitted = {r.doc_id for r in
                spark.read.parquet(str(tmp_path / "dv_admitted"))
                .collect()}

    # d15 batch side over the same union
    aug = base.unionByName(longer).localCheckpoint(eager=False)
    pairs = dedup.minhash_near_duplicates(
        aug, num_hashes=32, bands=8, shingle_size=3, threshold=0.5)
    comps = dedup.connected_components(pairs)
    lens = aug.select(F.col("doc_id").alias("node"),
                      F.length("text").alias("_len"))
    w = Window.partitionBy("component").orderBy(F.desc("_len"), "node")
    keep = {r.node: r.k for r in
            comps.join(lens, "node")
            .select("node", (F.row_number().over(w) == 1).alias("k"))
            .collect()}

    # eligible families: the planted pair was LSH-found AND verified
    # (shared signature construction => the stream saw the same band
    # collision); everything else is out of scope by construction
    fams = [(a, b) for a, b in
            ((r.a, r.b) for r in pairs.collect()) if b == a + OFF]
    assert len(fams) >= 5, "corpus lost its planted divergent families"
    for o, c in fams:
        # stream: first arrival (the original, min id) is admitted,
        # the later longer copy is blocked
        assert o in admitted and c not in admitted, (o, c)
        # d15 keep-best: the LONGER copy survives, the original drops
        assert keep[c] is True and keep[o] is False, (o, c)
