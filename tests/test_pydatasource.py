"""Custom Python DataSource (synthetic_events): registration, exact row
counts, partition-count-independent determinism, and ts-filter pushdown
that narrows generation at the reader (the Python twin of row-group
pruning)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F
from pyspark.sql.datasource import GreaterThanOrEqual, LessThan

from bd_delete_records_from_external_hive_table_spark.sources.pydatasource import (
    _EventsReader,
    register_python_sources,
)


def _read(spark, **opts):
    r = spark.read.format("synthetic_events")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_source_generates_exact_rows_in_parallel(spark):
    register_python_sources(spark)
    df = _read(spark, rows=50_000, partitions=8, seed=7)
    assert df.count() == 50_000
    assert df.select("event_id").distinct().count() == 50_000
    assert df.columns == ["event_id", "ts", "user_id", "event_type",
                          "value"]


def test_rows_independent_of_partitioning(spark):
    """Field values hash from the row index alone — 2-way and 16-way
    reads of the same (rows, seed) are identical tables."""
    register_python_sources(spark)
    a = _read(spark, rows=10_000, partitions=2, seed=9)
    b = _read(spark, rows=10_000, partitions=16, seed=9)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_ts_filter_pushdown_narrows_generation(spark):
    """An hour-wide ts window over a day of events returns exactly 3600
    one-per-second rows, with correct inclusive/exclusive bounds."""
    register_python_sources(spark)
    df = _read(spark, rows=86_400, partitions=8)
    hour = df.where((F.col("ts") >= "2024-01-01 10:00:00")
                    & (F.col("ts") < "2024-01-01 11:00:00"))
    assert hour.count() == 3600
    lo, hi = hour.agg(F.min("ts"), F.max("ts")).collect()[0]
    assert lo == datetime(2024, 1, 1, 10, 0, 0)
    assert hi == datetime(2024, 1, 1, 10, 59, 59)


def test_reader_prunes_index_range_not_rows():
    """Reader-level proof the predicate prunes GENERATION: after
    pushFilters, the planned partitions cover only the requested index
    window — unmatched data is never produced, not produced-then-
    filtered."""
    rdr = _EventsReader({"rows": "86400", "partitions": "8"})
    leftover = list(rdr.pushFilters([
        GreaterThanOrEqual(("ts",), datetime(2024, 1, 1, 10, 0, 0)),
        LessThan(("ts",), datetime(2024, 1, 1, 11, 0, 0)),
    ]))
    assert leftover == []  # both consumed
    parts = rdr.partitions()
    lo = min(p.lo for p in parts)
    hi = max(p.hi for p in parts)
    assert lo == 10 * 3600 and hi == 11 * 3600
    assert sum(p.hi - p.lo for p in parts) == 3600


def test_unrelated_filters_stay_with_spark(spark):
    """Non-ts predicates are returned un-consumed and evaluated by
    Spark — results stay correct either way."""
    rdr = _EventsReader({"rows": "1000"})
    from pyspark.sql.datasource import EqualTo
    leftover = list(rdr.pushFilters([EqualTo(("event_type",), "click")]))
    assert len(leftover) == 1
    assert rdr.lo_idx == 0 and rdr.hi_idx == 1000

    register_python_sources(spark)
    df = _read(spark, rows=5_000, partitions=4)
    by_type = {r["event_type"]: r["n"] for r in
               df.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
               .collect()}
    assert sum(by_type.values()) == 5_000
    assert set(by_type) == {"click", "view", "purchase", "signup",
                            "error"}


def test_streaming_source_equals_batch_read(spark):
    """The streaming reader must regenerate EXACTLY the batch reader's
    rows for the same (rows, seed): drain the stream (one micro-batch —
    latestOffset reports full availability for restart safety — split
    into ceil(1000/250)=4 parallel ranges) and compare the full row
    set, proving offset-window splitting loses/duplicates nothing."""
    register_python_sources(spark)
    stream = (spark.readStream.format("synthetic_events")
              .option("rows", 1000).option("rowsPerBatch", 250)
              .option("partitions", 3).option("seed", 7).load())
    q = (stream.writeStream.format("memory").queryName("pysrc_stream_t")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {(r.event_id, r.ts, r.user_id, r.event_type, r.value)
           for r in spark.table("pysrc_stream_t").collect()}
    batch = (spark.read.format("synthetic_events")
             .option("rows", 1000).option("partitions", 5)
             .option("seed", 7).load())
    want = {(r.event_id, r.ts, r.user_id, r.event_type, r.value)
            for r in batch.collect()}
    assert len(got) == 1000
    assert got == want


def test_stream_reader_restart_never_regresses_offset():
    """Protocol-level restart simulation for the committed-batch case:
    reader A runs latestOffset -> partitions -> commit; a FRESH reader
    (the restarted driver's state, which receives NO start offset
    before its first latestOffset call) must not report an offset
    behind A's committed end — a regressed offset would enter the
    offset log and the following trigger would re-emit committed rows
    into an append sink. Also pins the partition-split width: the
    batch window splits into ceil(total / rowsPerBatch) >= partitions
    ranges that tile [lo, hi) exactly."""
    from bd_delete_records_from_external_hive_table_spark.sources.pydatasource import (
        _EventsStreamReader,
    )

    opts = {"rows": "1000", "rowsPerBatch": "250",
            "partitions": "3", "seed": "7"}
    a = _EventsStreamReader(opts)
    start = a.initialOffset()
    end = a.latestOffset()
    parts = a.partitions(start, end)
    assert len(parts) == 4  # ceil(1000/250), > the 3 requested parts
    bounds = sorted((p.lo, p.hi) for p in parts)
    assert bounds[0][0] == 0 and bounds[-1][1] == 1000
    assert all(bounds[i][1] == bounds[i + 1][0]
               for i in range(len(bounds) - 1))
    a.commit(end)

    b = _EventsStreamReader(opts)  # restarted driver: fresh instance
    assert b.latestOffset()["index"] >= end["index"]
