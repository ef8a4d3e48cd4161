"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API):
a deterministic, partition-parallel synthetic event generator.

Why an engine ships one: load-testing the pipeline (deletes, rollups,
windows, sinks) at arbitrary scale needs input that (a) costs no
storage, (b) generates in parallel on the executors, and (c) is
bit-reproducible so failures replay. A Python DataSource provides all
three natively — `partitions()` plans N independent index ranges, each
executor materializes its range as Arrow RecordBatches (vectorized
numpy → Arrow, no per-row Python), and every field derives from the row
index by pure hashing, so the same (rows, seed) always yields the same
table no matter the parallelism.

Filter pushdown: event time is an affine function of the row index, so
a `ts >=` / `ts <` predicate converts EXACTLY into an index-range
restriction — the reader narrows what it *generates*, the Python twin
of parquet row-group pruning. Other predicates are left to Spark
(returned un-consumed from ``pushFilters``).

Usage::

    register_python_sources(spark)
    df = (spark.read.format("synthetic_events")
          .option("rows", 1_000_000).option("partitions", 64)
          .option("seed", 42).load())

Reference anchor: the reference reads only Hive/ORC external tables
(HiveTableOperations.java:30-69); this extends the source surface the
way its integration tests synthesize fixtures (TESTING.md:58-84), but
as a first-class parallel source instead of driver-side INSERTs.
"""

from __future__ import annotations

import math
from datetime import datetime, timezone
from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)

__all__ = ["SyntheticEventsDataSource", "register_python_sources"]

_EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)
_STEP_US = 1_000_000  # one event per second of simulated time
_TYPES = ("click", "view", "purchase", "signup", "error")


def _to_us(v) -> int:
    """Filter literal (datetime or ISO string) → microseconds since the
    generator epoch."""
    if isinstance(v, str):
        v = datetime.fromisoformat(v)
    if v.tzinfo is None:
        v = v.replace(tzinfo=timezone.utc)
    return int((v - _EPOCH).total_seconds() * 1_000_000)


class _Range(InputPartition):
    def __init__(self, lo: int, hi: int, seed: int):
        self.lo, self.hi, self.seed = lo, hi, seed


class _EventsReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 8))
        self.seed = int(options.get("seed", 42))
        self.batch = int(options.get("batch", 65536))
        # index window, narrowed by pushed ts filters
        self.lo_idx = 0
        self.hi_idx = self.rows

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Consume ts range predicates by shrinking the generated index
        window (ts = epoch + index * step is invertible); everything
        else is returned for Spark to evaluate post-read."""
        for f in filters:
            attr = getattr(f, "attribute", None)
            if attr == ("ts",):
                try:
                    if isinstance(f, GreaterThanOrEqual):
                        self.lo_idx = max(
                            self.lo_idx,
                            math.ceil(_to_us(f.value) / _STEP_US))
                        continue
                    if isinstance(f, GreaterThan):
                        self.lo_idx = max(
                            self.lo_idx,
                            math.floor(_to_us(f.value) / _STEP_US) + 1)
                        continue
                    if isinstance(f, LessThan):
                        self.hi_idx = min(
                            self.hi_idx,
                            math.ceil(_to_us(f.value) / _STEP_US))
                        continue
                    if isinstance(f, LessThanOrEqual):
                        self.hi_idx = min(
                            self.hi_idx,
                            math.floor(_to_us(f.value) / _STEP_US) + 1)
                        continue
                except (TypeError, ValueError):
                    pass  # unparseable literal → let Spark evaluate it
            yield f

    def partitions(self) -> Sequence[InputPartition]:
        lo, hi = self.lo_idx, max(self.lo_idx, self.hi_idx)
        total = hi - lo
        n = max(1, min(self.n_parts, total or 1))
        width = -(-total // n) if total else 1
        return [_Range(lo + i * width, min(lo + (i + 1) * width, hi),
                       self.seed)
                for i in range(n)]

    def read(self, partition: _Range):
        yield from _gen_batches(partition.lo, partition.hi,
                                partition.seed, self.batch)


def _gen_batches(lo: int, hi: int, seed: int, batch_size: int):
    """Materialize index range [lo, hi) as Arrow RecordBatches — shared
    by the batch and streaming readers so both read paths are
    bit-identical for the same (index, seed)."""
    import numpy as np
    import pyarrow as pa

    for b_lo in range(lo, hi, batch_size):
        b_hi = min(b_lo + batch_size, hi)
        if b_hi <= b_lo:
            continue
        idx = np.arange(b_lo, b_hi, dtype=np.uint64)
        # splitmix64-style index hash: field values depend only on
        # (index, seed), never on partitioning
        h = idx * np.uint64(0x9E3779B97F4A7C15) + np.uint64(seed)
        h ^= h >> np.uint64(30)
        h *= np.uint64(0xBF58476D1CE4E5B9)
        h ^= h >> np.uint64(27)
        ts_us = (np.int64(
            int(_EPOCH.timestamp() * 1_000_000))
            + idx.astype(np.int64) * _STEP_US)
        yield pa.record_batch(
            [
                pa.array(idx.astype(np.int64), pa.int64()),
                pa.array(ts_us, pa.timestamp("us", tz="UTC")),
                pa.array((h % np.uint64(10_000)).astype(np.int64),
                         pa.int64()),
                pa.array(
                    np.asarray(_TYPES, dtype=object)[
                        (h >> np.uint64(16))
                        % np.uint64(len(_TYPES))].tolist(),
                    pa.string()),
                pa.array(((h >> np.uint64(32)) % np.uint64(100_000))
                         .astype(np.float64) / 100.0,
                         pa.float64()),
            ],
            names=["event_id", "ts", "user_id", "event_type", "value"],
        )


class _EventsStreamReader(DataSourceStreamReader):
    """Micro-batch streaming twin of `_EventsReader`: the offset is the
    generated row index and ``partitions(start, end)`` splits the
    batch's index window into parallel executor ranges exactly like the
    batch reader. Offsets are plain dicts (checkpoint-JSON-able) and —
    because every field is a pure function of (index, seed) — any index
    window regenerates identical rows, so checkpoint recovery replays
    the exact rows of an interrupted batch.

    Restart correctness: ``latestOffset`` reports AVAILABILITY (the
    full ``rows`` cap), never instance-paced progress. The Python
    stream-reader API hands a fresh instance no start offset before
    its first ``latestOffset`` call, so any pacing derived from
    instance state (``min(self._latest + per_trigger, rows)``) would,
    after a restart whose last batch COMMITTED, return an offset
    BEHIND the checkpointed start — the engine logs the regressed
    offset and the next trigger re-emits committed rows into an
    append sink. Kafka-style sources answer latestOffset from the
    external system for exactly this reason; here the "external
    system" is the deterministic generator, whose availability is the
    cap. ``rowsPerBatch`` survives as the partition-split width, so
    executor parallelism and Arrow chunking are unchanged — the one
    behavioral difference is that all available rows arrive in the
    first micro-batch (admission-control ReadLimits are not exposed
    to Python sources)."""

    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        # floor at 1: rowsPerBatch is a split width now, and 0 would
        # divide-by-zero in partitions() instead of the old idle-stream
        self.per_part = max(1, int(options.get("rowsPerBatch", 250)))
        self.n_parts = int(options.get("partitions", 4))
        self.seed = int(options.get("seed", 42))
        self.batch = int(options.get("batch", 65536))

    def initialOffset(self) -> dict:
        return {"index": 0}

    def latestOffset(self) -> dict:
        # availability, not progress: pure function of the options, so
        # a restarted instance can never regress the offset log
        return {"index": self.rows}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        lo, hi = int(start["index"]), int(end["index"])
        total = hi - lo
        n = max(1, min(max(self.n_parts, -(-total // self.per_part)),
                       total or 1))
        width = -(-total // n) if total else 1
        return [_Range(lo + i * width, min(lo + (i + 1) * width, hi),
                       self.seed)
                for i in range(n)]

    def read(self, partition: _Range):
        yield from _gen_batches(partition.lo, partition.hi,
                                partition.seed, self.batch)

    def commit(self, end: dict) -> None:
        pass  # regeneration is pure; nothing to clean up


class SyntheticEventsDataSource(DataSource):
    """``spark.read.format("synthetic_events")`` — see module docstring.

    Options: rows (total row count), partitions (parallel read tasks),
    seed (determinism), batch (Arrow batch size).
    """

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return ("event_id long, ts timestamp, user_id long, "
                "event_type string, value double")

    def reader(self, schema) -> DataSourceReader:
        return _EventsReader(self.options)

    def streamReader(self, schema) -> DataSourceStreamReader:
        return _EventsStreamReader(self.options)


def register_python_sources(spark) -> None:
    """Idempotently register every custom Python data source.

    Python-source filter pushdown ships behind a flag (readers that
    implement ``pushFilters`` fail fast without it), so it is enabled
    here — registration and capability travel together."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SyntheticEventsDataSource)
