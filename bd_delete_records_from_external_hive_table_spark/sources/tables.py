"""Testdata table catalog: parquet loaders for the driver-generated tables.

The ``events`` table's ``ts`` column has shipped in two encodings across
testdata generations: parquet TIMESTAMP(MICROS) (read natively as Spark
TimestampType) and TIMESTAMP(NANOS) (unrepresentable in Spark's µs
TimestampType; read as ``long`` under ``spark.sql.legacy.parquet.
nanosAsLong`` in session.py and floored to microseconds with
``timestamp_micros(ts div 1000)``). ``load_table`` detects which shape it
got and normalizes to TimestampType either way. Flooring preserves every
comparison against microsecond-aligned literals (for bound B aligned to
1 µs: floor_us(v) >= B ⇔ v >= B), so filters/windows at second granularity
are exact in both encodings. Queries that *return* ts values truncate to a
common granularity on both the Spark and oracle sides.
"""

from __future__ import annotations

import os
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["TABLES", "dim", "load_table", "local_frame",
           "register_views", "spread"]

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def local_frame(spark: SparkSession, rows, schema) -> DataFrame:
    """Tiny driver-local DataFrame through the ARROW path.

    ``spark.createDataFrame(list_of_tuples, schema)`` parallelizes the
    rows as a PICKLED RDD over ``defaultParallelism`` slices, and every
    later action on the frame pays one Python-worker round-trip PER
    SLICE to unpickle them — measured 2.4–3.6 s per action for a
    16-row frame on local[32] (vs 0.18 s through Arrow), which was the
    entire cold cost of the artifact-save paths (e09) and the
    driver-report queries (g01) that build their result row on the
    driver (round 12; guide §4 — the Python boundary, in its sneakiest
    form). Routing the same rows through a pandas DataFrame makes the
    frame an Arrow-backed LocalTableScan: no Python worker ever runs.
    Semantics are identical — the explicit ``schema`` pins types and
    column names exactly as before."""
    import pandas as pd

    st = (spark.createDataFrame([], schema).schema
          if isinstance(schema, str) else schema)
    names = [f.name for f in st.fields]
    pdf = pd.DataFrame([tuple(r) for r in rows], columns=names)
    return spark.createDataFrame(pdf, schema=st)


def _epoch_nanos(ts: datetime) -> int:
    """Naive datetimes are UTC (the session timezone is pinned to UTC)."""
    if ts.tzinfo is None:
        ts = ts.replace(tzinfo=timezone.utc)
    return int(ts.timestamp()) * 1_000_000_000 + ts.microsecond * 1_000


def _ts_lit(ts: datetime, ntz: bool = False):
    """Timezone-independent timestamp literal.

    ``F.lit(naive_datetime)`` is interpreted in the *driver OS* timezone
    by the py4j converter — on a non-UTC driver the bound would silently
    shift by the UTC offset. Building the literal from epoch micros via
    ``timestamp_micros`` (naive input treated as UTC by ``_epoch_nanos``,
    tz-aware input converted exactly) depends only on the pinned UTC
    session timezone, never on the driver OS. Both forms constant-fold,
    so parquet pushdown still sees a plain literal; the ``timestamp_ntz``
    cast keeps the literal's type equal to the file's column type so the
    comparison needs no column-side cast (which would defeat pushdown)."""
    lit = F.timestamp_micros(F.lit(_epoch_nanos(ts) // 1000))
    return lit.cast("timestamp_ntz") if ntz else lit


def load_table(spark: SparkSession, sf_dir: str, name: str,
               ts_start: datetime | None = None,
               ts_end: datetime | None = None) -> DataFrame:
    """Load a testdata table. For ``events``, optional [ts_start, ts_end)
    bounds are applied to the RAW nanosecond long *before* the timestamp
    conversion: a predicate on ``timestamp_micros(ts div 1000)`` cannot be
    pushed into the parquet scan (the reader sees only the derived
    expression), while a plain long comparison reaches the row-group stats
    and skips non-matching groups — the difference between scanning a 100 TB
    event log and scanning one day of it. Callers still apply their own
    (semantically identical) timestamp predicate afterwards; this pre-filter
    only prunes I/O."""
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # Legacy TIMESTAMP(NANOS) encoding read as long under
            # nanosAsLong: filter the raw long, then convert.
            if ts_start is not None:
                df = df.where(F.col("ts") >= F.lit(_epoch_nanos(ts_start)))
            if ts_end is not None:
                df = df.where(F.col("ts") < F.lit(_epoch_nanos(ts_end)))
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        else:
            # Native TIMESTAMP(MICROS): a plain timestamp comparison pushes
            # down to the reader directly — no conversion layer needed. The
            # literal is built type-matched to the file column (ntz vs ltz)
            # so no column-side cast blocks pushdown.
            ntz = ts_type == "timestamp_ntz"
            if ts_start is not None:
                df = df.where(F.col("ts") >= _ts_lit(ts_start, ntz))
            if ts_end is not None:
                df = df.where(F.col("ts") < _ts_lit(ts_end, ntz))
            if ntz:
                # Normalize to TimestampType (session tz is UTC, so the
                # wall-clock value is unchanged); watermarks and the rest
                # of the engine expect the ltz type. Cast AFTER the bound
                # filters so the pushed predicate matches the file type.
                df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


#: inputs whose optimizer-estimated bytes exceed this keep their scan
#: layout in spread() — re-shuffling them would cost real IO, and at
#: that size the scan has enough genuine splits anyway.
_SPREAD_SIZE_CAP = 4 << 30


def spread(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Widen a COMPUTE-BOUND pipeline stage to full cluster parallelism
    when the scan under it cannot.

    Parquet splits at row-group boundaries, so a small corpus written
    as one row group yields ONE non-empty scan partition no matter what
    ``maxPartitionBytes`` says — and every downstream higher-order
    function (interpreted, ~µs per element: gram generation, per-token
    folds) then runs single-threaded. Measured on d14 at sf0.1: the
    8-gram explode alone took 3.7 s in one task (~15 µs/gram × 235k
    grams on one core).

    The check is METADATA-ONLY (physical-plan partition count + plan
    size stats — no job runs). The partition COUNT alone can lie:
    Spark plans byte-range splits, but parquet rows sit at row-group
    boundaries, so a modest single file can claim ``target`` splits
    with only ~#row-groups of them non-empty — the sf30 canary caught
    d14's gram generation running 12-wide under a 32-claiming scan
    (5.97× warm for 3× data from that skew alone). So a claimed-wide
    input is re-spread anyway while it is provably SMALL (footer-stats
    bytes under ``_SPREAD_SIZE_CAP``): one extra shuffle of a sub-GB
    corpus is noise next to the per-row HOF compute, while a real
    at-scale scan (hundreds of thousands of splits, TBs) keeps its
    layout untouched. Use it on inputs whose per-row compute dominates
    their byte size; it is NOT for general scans.
    """
    target = partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        try:
            size = int(df._jdf.queryExecution().optimizedPlan()
                       .stats().sizeInBytes())
        except Exception:
            return df
        if size > _SPREAD_SIZE_CAP:
            return df
    return df.repartition(target)


def register_views(spark: SparkSession, sf_dir: str,
                   names: tuple[str, ...] = TABLES) -> None:
    """Register each table as a temp view named after itself."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


#: Default on-disk parquet ceiling for a compile-time broadcast pin.
#: 32 MiB of parquet is roughly 100-300 MB deserialized — comfortably
#: broadcastable; anything larger is left to AQE's runtime decision.
_DIM_PIN_MAX_BYTES = 32 << 20


def _table_bytes(sf_dir: str, name: str) -> int | None:
    """On-disk size of a testdata table (file or directory parquet)."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        if os.path.isdir(path):
            return sum(os.path.getsize(os.path.join(root, f))
                       for root, _, files in os.walk(path) for f in files)
        return os.path.getsize(path)
    except OSError:
        return None


def dim(df: DataFrame, sf_dir: str, name: str) -> DataFrame:
    """Size-guarded dimension-side broadcast hint.

    ``F.broadcast`` is a *pin*: Spark ships the build side to every
    executor regardless of its actual size, so a hard pin on a table that
    grows with SF (part is SF x 200k rows, supplier SF x 10k, customer
    SF x 150k) becomes a multi-GB per-executor broadcast at a genuine
    100 TB — fatal. Only nation/region are SF-invariant.

    This helper applies the hint only when the dimension's BASE table is
    small on disk (an O(1) driver-side ``stat``, no extra Spark job —
    the on-disk parquet size upper-bounds any filtered/projected subset
    of it). Above the threshold it returns the side unhinted, leaving
    the decision to AQE, which sees the TRUE post-filter size at runtime
    and still broadcast-converts genuinely small sides. Threshold is
    tunable via ``SPARK_GRAFT_DIM_PIN_MAX_BYTES`` (read per call so
    tests can exercise both regimes).

    Pass ``name`` = the base table the side derives from (e.g. a
    HAVING-filtered supplier-key list is bounded by |supplier|, so its
    base is ``"supplier"``).
    """
    limit = int(os.environ.get("SPARK_GRAFT_DIM_PIN_MAX_BYTES",
                               _DIM_PIN_MAX_BYTES))
    size = _table_bytes(sf_dir, name)
    if size is not None and size <= limit:
        return F.broadcast(df)
    return df
