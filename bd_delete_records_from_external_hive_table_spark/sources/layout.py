"""Data-layout control: clustered (range-partitioned, sorted) writes for
min/max data skipping.

Parquet/ORC readers skip whole row groups when the pushed-down predicate
falls outside the group's min/max statistics. Those statistics are only
selective if the data is *laid out* so each row group covers a narrow
range of the filter column — which is exactly what a clustered write
produces:

    repartitionByRange(cluster_by)   # global range shuffle: each task
                                     # owns a disjoint key range
    .sortWithinPartitions(cluster_by)  # rows ordered inside the task →
                                       # row groups cover tight ranges

This is the Spark-native equivalent of Hive ``CLUSTER BY`` / Delta
``OPTIMIZE ZORDER BY`` for the single-column case: after it, a filter on
the cluster column reads O(matching row groups) instead of O(all files).
On a 100 TB fact table clustered by event time, a one-day predicate
touches ~1/365th of the row groups; unclustered, every row group's
min/max spans the whole history and nothing skips.

``clustering_report`` quantifies the effect from the parquet footers
(no data read): per-row-group min/max of the cluster column and the
average fraction of row groups a point/range query must touch.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["write_clustered", "write_zordered", "zorder_column",
           "clustering_report", "overlap_score", "ClusteringReport"]


def write_clustered(df: DataFrame, path: str, cluster_by: list[str],
                    partition_by: list[str] | None = None,
                    num_files: int | None = None,
                    fmt: str = "parquet") -> None:
    """Write ``df`` range-clustered on ``cluster_by``.

    ``num_files`` bounds output files (defaults to the session's shuffle
    partitions); at scale pick ``table_size / target_file_size``.
    ``partition_by`` adds directory-level (coarse) partitioning on top of
    the row-group-level (fine) clustering — filters on the partition
    column prune directories, filters on the cluster column prune row
    groups inside every surviving file.
    """
    cols = [df[c] for c in cluster_by]
    clustered = (df.repartitionByRange(num_files, *cols) if num_files
                 else df.repartitionByRange(*cols))
    clustered = clustered.sortWithinPartitions(*cluster_by)
    writer = clustered.write.mode("overwrite").format(fmt)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


@dataclass
class ClusteringReport:
    column: str
    row_groups: int
    #: per-row-group (min, max) of the cluster column
    ranges: list[tuple]
    #: mean fraction of row groups whose [min,max] contains an observed
    #: row-group boundary value — 1/row_groups is perfect clustering,
    #: 1.0 means every group spans everything
    avg_point_overlap: float

    @property
    def skip_ratio(self) -> float:
        """Fraction of row groups a point query can skip on average."""
        return 1.0 - self.avg_point_overlap


def clustering_report(path: str, column: str) -> ClusteringReport:
    """Measure clustering quality from parquet footers only (no data
    read) — usable as a post-write audit at any scale since footer size
    is independent of data size.

    The overlap metric needs only a total order on the column (numeric,
    temporal, or string cluster keys all work): every observed row-group
    boundary is a probe point, and the score is the mean fraction of row
    groups whose [min, max] contains a probe. Disjoint ranges score
    ~1/row_groups; fully-overlapping ranges score 1.0.
    """
    import pyarrow.dataset as ds

    ranges: list[tuple] = []
    dataset = ds.dataset(path, format="parquet")
    for frag in dataset.get_fragments():
        for rg in frag.row_groups:
            stats = rg.statistics.get(column)
            if (stats is not None and stats.get("min") is not None
                    and stats.get("max") is not None):
                ranges.append((stats["min"], stats["max"]))
    if not ranges:
        return ClusteringReport(column, 0, [], 1.0)
    return ClusteringReport(column, len(ranges), ranges,
                            overlap_score(ranges))


def overlap_score(ranges: list[tuple]) -> float:
    """Mean fraction of ranges containing an observed boundary value,
    clamped to [1/n, 1]. Needs only a total order on the values —
    numeric, temporal, and string keys all work."""
    n = len(ranges)
    probes = sorted({b for r in ranges for b in r})
    hits = [sum(1 for lo, hi in ranges if lo <= p <= hi) for p in probes]
    avg = (sum(hits) / len(hits)) / n
    return max(min(avg, 1.0), 1.0 / n)


def zorder_column(df: DataFrame, cols: list[str],
                  bits: int = 16) -> Column:
    """Morton (Z-order) key over ``cols``: each column is linearly
    scaled to a ``bits``-bit integer between its observed min and max,
    then the bits are interleaved so nearby (c1, c2, ...) tuples get
    nearby keys in EVERY dimension at once.

    The scan for per-column min/max is one tiny all-column aggregate
    (a single job, one output row); the scaling + interleave is a pure
    JVM expression — whole-stage-codegen'd, no Python in the write
    path. ``bits * len(cols)`` must fit a signed long (≤ 63): 16 bits ×
    2 cols is plenty — row-group skipping only needs coarse locality.

    Linear scaling keeps the expression stateless; heavily skewed
    columns trade some balance for it (the classic Z-order caveat —
    range-cluster single hot columns instead).
    """
    if bits * len(cols) > 63:
        raise ValueError(
            f"{bits} bits x {len(cols)} cols overflows a long")

    def numeric(c: str) -> Column:
        col = df[c]
        t = dict(df.dtypes)[c]
        if t.startswith("timestamp"):
            return col.cast("double")
        return col.cast("double")

    row = df.agg(*[F.min(numeric(c)).alias(f"mn_{i}")
                   for i, c in enumerate(cols)],
                 *[F.max(numeric(c)).alias(f"mx_{i}")
                   for i, c in enumerate(cols)]).collect()[0]
    top = (1 << bits) - 1
    scaled = []
    for i, c in enumerate(cols):
        mn, mx = row[f"mn_{i}"], row[f"mx_{i}"]
        span = (mx - mn) or 1.0
        s = ((numeric(c) - F.lit(mn)) / F.lit(span) * top).cast("long")
        scaled.append(F.greatest(F.lit(0), F.least(F.lit(top), s)))
    z = F.lit(0).cast("long")
    for bit in range(bits):
        for i, s in enumerate(scaled):
            z = z.bitwiseOR(
                F.shiftleft(s.bitwiseAND(F.lit(1 << bit)).cast("long"),
                            bit * (len(cols) - 1) + i))
    return z


def write_zordered(df: DataFrame, path: str, zorder_by: list[str],
                   bits: int = 16,
                   partition_by: list[str] | None = None,
                   num_files: int | None = None,
                   fmt: str = "parquet") -> None:
    """Write ``df`` Z-order-clustered on ``zorder_by`` — the multi-column
    generalization of :func:`write_clustered` (Delta ``OPTIMIZE ZORDER
    BY``): range-clustering is perfect for one filter column and useless
    for a second; the interleaved key gives every listed column
    meaningful row-group min/max locality, so point/range filters on ANY
    of them skip most row groups from footer stats alone."""
    z = zorder_column(df, zorder_by, bits=bits)
    keyed = df.withColumn("__zorder", z)
    keyed = (keyed.repartitionByRange(num_files, "__zorder") if num_files
             else keyed.repartitionByRange("__zorder"))
    keyed = keyed.sortWithinPartitions("__zorder").drop("__zorder")
    writer = keyed.write.mode("overwrite").format(fmt)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)
