"""Structured Streaming operators over the events-stream shape
(event_id, ts, user_id, event_type, value, props).

The reference is batch-only (SURVEY §2k); this is the engine's extension
surface: watermarked tumbling/sliding/session windows, streaming dedup,
and a custom stateful operator via applyInPandasWithState.

Scale notes: all aggregations are keyed by (window[, key]) so state is
partitioned across executors; watermarks bound state size (late rows
beyond the delay are dropped, finalized windows are evicted). The batch
equivalents of the window aggs are oracle-checked in plans/llm_ops.py
(st01/st02) — streaming tests assert stream == batch on the same input.
"""

from __future__ import annotations

import warnings
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.errors import AnalysisException
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType,
    TimestampNTZType,
)

__all__ = [
    "EVENTS_FILE_SCHEMA", "EVENTS_LEGACY_FILE_SCHEMA", "stream_events",
    "tumbling_counts", "sliding_counts", "session_windows",
    "streaming_dedup", "running_user_totals", "per_key_quota",
    "stateful_sessions", "enrich_with_static",
]

#: On-disk file schema of the current events encoding: parquet
#: TIMESTAMP(MICROS, isAdjustedToUTC=false) reads as TIMESTAMP_NTZ. This
#: is the fallback stream schema when the source directory is empty at
#: stream start (nothing to infer from); ``stream_events`` normalizes
#: ``ts`` to the session-tz TimestampType either way.
EVENTS_FILE_SCHEMA = StructType([
    StructField("event_id", LongType()),
    StructField("ts", TimestampNTZType()),
    StructField("user_id", LongType()),
    StructField("event_type", StringType()),
    StructField("value", DoubleType()),
    StructField("props", StringType()),
])

#: File schema of the *legacy* events encoding: ``ts`` is the raw
#: TIMESTAMP(NANOS) value surfaced as a long under the nanosAsLong conf.
#: Pass explicitly as ``stream_events(..., schema=...)`` for legacy dirs
#: that start empty.
EVENTS_LEGACY_FILE_SCHEMA = StructType([
    StructField("event_id", LongType()),
    StructField("ts", LongType()),
    StructField("user_id", LongType()),
    StructField("event_type", StringType()),
    StructField("value", DoubleType()),
    StructField("props", StringType()),
])


def stream_events(spark: SparkSession, path: str,
                  max_files_per_trigger: int | None = None,
                  schema: StructType | None = None) -> DataFrame:
    """File-source stream of events parquet under ``path``, normalized to
    the batch loader's shape. The file schema is taken from a driver-side
    batch read of the same path (one footer read — streams require an
    explicit schema), so both TIMESTAMP(MICROS) files and legacy
    TIMESTAMP(NANOS)-as-long files stream correctly; the nanos→micros
    conversion is applied only when the on-disk column is a long.

    A stream is routinely started on an empty directory that a producer
    fills later; batch inference throws AnalysisException there, so we
    fall back to ``schema`` (if given) or :data:`EVENTS_FILE_SCHEMA`."""
    if schema is not None:
        file_schema = schema
    else:
        try:
            file_schema = spark.read.parquet(path).schema
        except AnalysisException as exc:
            # Empty dir / no footers yet (UNABLE_TO_INFER_SCHEMA): fall
            # back to the CURRENT encoding's schema. ONLY that error
            # class falls back — PATH_NOT_FOUND (a typo'd path) and
            # permission errors are also AnalysisExceptions and must
            # surface as themselves, not as a misleading schema warning.
            # A legacy nanos-as-long directory that starts empty needs
            # EVENTS_LEGACY_FILE_SCHEMA passed explicitly or later files
            # will be misread as TIMESTAMP_NTZ.
            cond = getattr(exc, "getCondition", None) or getattr(
                exc, "getErrorClass", lambda: None)
            if (cond() or "") != "UNABLE_TO_INFER_SCHEMA":
                raise
            warnings.warn(
                f"stream_events: could not infer schema from {path!r} "
                f"(empty directory?); falling back to EVENTS_FILE_SCHEMA "
                f"(TIMESTAMP_NTZ ts). Pass schema=EVENTS_LEGACY_FILE_SCHEMA "
                f"for legacy nanos-as-long directories.",
                stacklevel=2)
            file_schema = EVENTS_FILE_SCHEMA
    reader = spark.readStream.schema(file_schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(path)
    if isinstance(file_schema["ts"].dataType, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        # TIMESTAMP(MICROS) files arrive as TIMESTAMP_NTZ; watermarks
        # require the ltz TimestampType (session tz is UTC, no value shift).
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def tumbling_counts(events: DataFrame, window: str = "1 day",
                    watermark: str = "1 hour") -> DataFrame:
    """Watermarked tumbling-window count+sum — streaming form of st01."""
    return (events
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", window).alias("w"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("value"), 2).alias("total"))
            .select(F.col("w.start").alias("wstart"), "n", "total"))


def sliding_counts(events: DataFrame, length: str = "2 days",
                   slide: str = "1 day",
                   watermark: str = "1 hour") -> DataFrame:
    """Watermarked sliding-window count — streaming form of st02."""
    return (events
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", length, slide).alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("wstart"), "n"))


def session_windows(events: DataFrame, gap: str = "30 minutes",
                    watermark: str = "1 hour") -> DataFrame:
    """Per-user session windows: a session extends while successive events
    arrive within ``gap``. State is (user, open-session) — bounded by the
    watermark."""
    return (events
            .withWatermark("ts", watermark)
            .groupBy(F.session_window("ts", gap).alias("w"),
                     F.col("user_id"))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("value"), 2).alias("session_value"))
            .select("user_id", F.col("w.start").alias("session_start"),
                    F.col("w.end").alias("session_end"), "n_events",
                    "session_value"))


def streaming_dedup(events: DataFrame, keys: list[str] | None = None,
                    watermark: str = "1 hour") -> DataFrame:
    """Exactly-once-per-key stream: state holds keys only within the
    watermark horizon (dropDuplicatesWithinWatermark), so dedup state
    cannot grow unboundedly — the streaming form of exact dedup."""
    return (events
            .withWatermark("ts", watermark)
            .dropDuplicatesWithinWatermark(keys or ["event_id"]))


_USER_TOTALS_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("n_events", LongType()),
    StructField("total_value", DoubleType()),
])

_USER_TOTALS_STATE = StructType([
    StructField("n", LongType()),
    StructField("total", DoubleType()),
])


def running_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user
    running (count, sum) emitted every trigger — the pattern for stateful
    logic Spark's built-in aggs can't express (per-key custom state
    machines). Arrow-batched; state is two scalars per user."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key: tuple, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                            "total_value": [round(total, 2)]})

    return (events.groupBy("user_id").applyInPandasWithState(
        update, _USER_TOTALS_SCHEMA, _USER_TOTALS_STATE,
        "update", GroupStateTimeout.NoTimeout))


def per_key_quota(events: DataFrame, quota: int = 10,
                  key: str = "user_id") -> DataFrame:
    """Per-key quota sampler: emit at most ``quota`` events per key
    across the whole stream — the quota/budget enforcement a corpus
    pipeline applies per source/domain ('at most N documents per
    site'). State is ONE long per key (the running admitted count), so
    state size is |keys|, not |events|; rows beyond the quota are
    dropped inside the Arrow batch iterator without ever being emitted.

    Implemented on ``applyInPandasWithState``. The newer Spark 4
    ``transformWithStateInPandas`` API expresses the same processor
    (ValueState['n'] + early-exit emit) but its state server requires
    the ``protobuf`` Python package, which this environment lacks — the
    applyInPandasWithState form is semantically identical here
    (single ValueState, append output, no timers)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    q = int(quota)
    # Output schema derives from the key parameter (round-2 advice: the
    # projection/schema were hardcoded to user_id, so any other key
    # emitted the wrong column or raised KeyError). Grouping by
    # event_type ('N events per source/type') is the corpus-pipeline
    # case this operator exists for.
    out_cols = ["event_id"] if key == "event_id" else [key, "event_id"]
    out_schema = StructType([
        StructField(c, events.schema[c].dataType) for c in out_cols])

    def admit(key_: tuple, pdfs: Iterator[pd.DataFrame],
              state: GroupState) -> Iterator[pd.DataFrame]:
        (n,) = state.get if state.exists else (0,)
        for pdf in pdfs:
            if n >= q:
                continue  # consume the iterator; nothing more to admit
            take = pdf.iloc[: q - n]
            n += len(take)
            yield take[out_cols]
        state.update((n,))

    return (events.groupBy(key).applyInPandasWithState(
        admit, out_schema, "n BIGINT", "append",
        GroupStateTimeout.NoTimeout))


def last_touch_attribution(events: DataFrame,
                           purchase_type: str = "purchase") -> DataFrame:
    """Streaming last-touch attribution — the stateful twin of the
    registered w13 batch query: every ``purchase_type`` event is
    credited to its user's most recent PRECEDING non-purchase event
    type. State is ONE string per user (the running channel), so state
    size is O(|users|) forever — never a buffer of events — and output
    is append-mode (one row per purchase as it happens), which is what
    lets the attribution feed a live dashboard instead of a nightly
    window job.

    Ordering contract: rows are processed in (ts, event_id) order
    WITHIN each micro-batch (sorted here); across batches the source
    must deliver each user's events in event-time order (the
    file-source contract the CDC-sink and dedup tests rely on). Under
    that contract the emitted channels equal the batch w13 window
    exactly — test-asserted against the oracle-checked query."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = StructType([
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("channel", StringType()),
    ])

    def attribute(key: tuple, pdfs: Iterator[pd.DataFrame],
                  state: GroupState) -> Iterator[pd.DataFrame]:
        channel = state.get[0] if state.exists else None
        chunks = list(pdfs)
        if chunks:
            df = (pd.concat(chunks, ignore_index=True)
                  .sort_values(["ts", "event_id"]))
            ev_ids: list[int] = []
            chans: list[str | None] = []
            for et, eid in zip(df["event_type"], df["event_id"]):
                if et == purchase_type:
                    ev_ids.append(int(eid))
                    chans.append(channel)
                else:
                    channel = et
            if ev_ids:
                yield pd.DataFrame({"user_id": [key[0]] * len(ev_ids),
                                    "event_id": ev_ids,
                                    "channel": chans})
        state.update((channel,))

    return (events.select("user_id", "event_id", "ts", "event_type")
            .groupBy("user_id").applyInPandasWithState(
                attribute, out_schema, "channel string", "append",
                GroupStateTimeout.NoTimeout))


def interval_join(left: DataFrame, right: DataFrame, *,
                  key: str = "user_id", max_delay: str = "1 hour",
                  watermark: str = "2 hours",
                  how: str = "inner") -> DataFrame:
    """Watermarked stream-stream join: pair each left event with the
    right-side events of the same ``key`` that happen within
    ``(left.ts, left.ts + max_delay]`` — the attribution shape (view →
    click, impression → purchase).

    Both sides carry watermarks and the join condition bounds event-time
    distance, so the join state store holds only ``watermark + max_delay``
    of history per key — without the time bound a stream-stream join must
    buffer BOTH streams forever. Works identically on batch frames (the
    parity test runs the same plan both ways).

    ``how="left_outer"`` also emits unconverted left events (view with no
    click) with NULL ``r_ts`` — in streaming, an unmatched row emits only
    once the watermark passes ``l_ts + max_delay``, i.e. when a LATER
    batch has advanced event time; rows near the end of input stay
    buffered (standard Structured Streaming outer-join semantics)."""
    l = left.select(F.col(key).alias("l_key"),
                    F.col("ts").alias("l_ts")).withWatermark("l_ts", watermark)
    r = right.select(F.col(key).alias("r_key"),
                     F.col("ts").alias("r_ts")).withWatermark("r_ts", watermark)
    return (l.join(
        r, (F.col("l_key") == F.col("r_key"))
           & (F.col("r_ts") > F.col("l_ts"))
           & (F.col("r_ts") <= F.col("l_ts") + F.expr(
               f"INTERVAL {max_delay}")),
        how)
        .select(F.col("l_key").alias(key), "l_ts", "r_ts"))


_SESS_OUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("session_start", TimestampNTZType()),
    StructField("session_end", TimestampNTZType()),
    StructField("n_events", LongType()),
])

_SESS_STATE = StructType([
    StructField("start_us", LongType()),
    StructField("end_us", LongType()),
    StructField("n", LongType()),
])

_GAP_UNITS = {"second": 1, "seconds": 1, "minute": 60, "minutes": 60,
              "hour": 3600, "hours": 3600}


def _gap_to_us(gap: str) -> int:
    qty, unit = gap.split()
    return int(qty) * _GAP_UNITS[unit] * 1_000_000


def stateful_sessions(events: DataFrame, gap: str = "30 minutes",
                      watermark: str = "0 seconds") -> DataFrame:
    """Custom stateful sessionization with EVENT-TIME TIMEOUT — the
    state-machine pattern built-in ``session_window`` can't generalize
    to (per-session custom logic, early emission, side effects): state
    holds one open session (start, end, n) per user; a session closes
    and EMITS either when a same-batch event arrives ≥ gap later, or —
    the part only a timeout can do — when the WATERMARK passes
    last_event + gap with no successor (``state.hasTimedOut``), so idle
    users' sessions flush without waiting for their next event. State is
    three longs per user and every closed session is evicted: bounded
    regardless of stream length. Timestamps are compared as integral
    microseconds inside the state machine — no float time arithmetic.

    Emission is EAGER: a session closed by an in-batch successor emits
    immediately, so an in-watermark late event arriving in a *later*
    micro-batch can only join the still-open session (it extends the
    open interval backwards or forwards, or opens its own). With
    watermark delay 0 this equals batch ``session_window`` exactly;
    a larger delay trades that early emission for cross-batch late-row
    completeness — the standard custom-operator tradeoff."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = _gap_to_us(gap)

    def update(key: tuple, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        def emit(s: int, e: int, n: int) -> pd.DataFrame:
            return pd.DataFrame({
                "user_id": [key[0]],
                "session_start": [pd.to_datetime(s, unit="us")],
                "session_end": [pd.to_datetime(e, unit="us")],
                "n_events": [n]})

        if state.hasTimedOut:
            s, e, n = state.get
            state.remove()
            yield emit(s, e, n)
            return
        # Interval sweep: the open session is an interval [s, e] with n
        # events; batch events are point intervals. Sorting ALL of them
        # by start and merging within-gap neighbours handles late rows
        # on either side of the open session — an in-watermark event
        # BEFORE the open start extends the session backwards (or forms
        # its own earlier session) instead of being silently absorbed.
        items = [tuple(state.get)] if state.exists else []
        items += [(t, t, 1) for pdf in pdfs
                  for t in pdf["ts"].values.astype("datetime64[us]")
                  .astype("int64").tolist()]
        items.sort()
        merged: list[tuple[int, int, int]] = []
        for s0, e0, n0 in items:
            if merged and s0 - merged[-1][1] < gap_us:
                ps, pe, pn = merged[-1]
                merged[-1] = (ps, max(pe, e0), pn + n0)
            else:
                merged.append((s0, e0, n0))
        # All but the newest session are closed by an in-batch
        # successor ≥ gap later and emit now; the newest stays open.
        for s0, e0, n0 in merged[:-1]:
            yield emit(s0, e0, n0)
        if merged:
            s0, e0, n0 = merged[-1]
            state.update((s0, e0, n0))
            # timeout fires once the event-time watermark passes this
            # (ms epoch); until then the session stays open for late
            # same-session events inside the watermark delay
            state.setTimeoutTimestamp((e0 + gap_us) // 1000)

    return (events.withWatermark("ts", watermark)
            .groupBy("user_id")
            .applyInPandasWithState(
                update, _SESS_OUT_SCHEMA, _SESS_STATE, "append",
                GroupStateTimeout.EventTimeTimeout))


def enrich_with_static(stream: DataFrame, static_dim: DataFrame,
                       on: str = "user_id",
                       how: str = "left") -> DataFrame:
    """Stream-static enrichment join — the standard shape for decorating
    an event stream with a dimension (user profile, device registry,
    source metadata). The static side is broadcast to the stream's
    micro-batch tasks and — unlike a stream-stream join — needs NO
    watermark and NO join state store: each micro-batch joins against
    the dimension as-of that batch, so state is zero regardless of how
    long the stream runs. The broadcast hint pins the only sane plan
    for a dim (an unbounded stream side can never be the build side);
    ``left`` keeps events whose key is missing from the dimension
    (NULL-padded) rather than silently dropping them."""
    return stream.join(F.broadcast(static_dim), on, how)


def run_to_memory(stream_df: DataFrame, name: str,
                  output_mode: str = "complete"):
    """Drain a stream into an in-memory table with availableNow (test/dev
    helper): returns the finished StreamingQuery."""
    q = (stream_df.writeStream.format("memory").queryName(name)
         .outputMode(output_mode).trigger(availableNow=True).start())
    q.awaitTermination()
    return q
