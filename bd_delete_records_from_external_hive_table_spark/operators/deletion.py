"""Partition-granularity copy-on-write DELETE for external Hive tables.

Re-expresses the reference's core (``/root/reference/.../deletion/
PartitionHandler.java`` + ``DeletionExecutor.java``) Spark-first:

**Reference algorithm** (C1-C4 in SURVEY §2n): SHOW PARTITIONS → driver
date-range prune → *one COUNT(*) Spark job per candidate partition*
(PartitionHandler.java:102-123) → per batch, a retention scan
``SELECT * WHERE pcol IN (...) AND NOT(criteria)`` overwritten back via
dynamic-partition overwrite (DeletionExecutor.java:139-230).

**This engine** keeps the semantics but replaces the per-partition probe
loop with a single partition-pruned aggregation::

    scan.where(pcol IN candidates).groupBy(pcol)
        .agg(count(*) AS total, count_if(P) AS matches)

One job, one shuffle (map-side partial agg), and it returns *everything*
the planner needs: affected partitions (matches > 0), fully-emptied
partitions (matches == total → metadata-only DROP, no rewrite), and exact
per-partition delete counts for metrics. At 10k partitions this is ~10k×
fewer Spark jobs than the reference's loop; at 100 TB the scan is pruned to
candidate partitions and the criteria predicate is pushed down to the
ORC/parquet reader (filterPushdown conf in session.py).

Deliberate deviations from reference quirks (SURVEY §2n "noted quirks"):
the empty-retention fast path is decided **per partition** (the reference
drops every partition in a batch when the *batch-wide* retained count is 0,
DeletionExecutor.java:166-171), and per-partition metrics are exact.
Conservative inclusion on probe failure is preserved
(PartitionHandler.java:118-122).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import EngineConfig
from ..metrics import MetricsCollector, audit
from ..partitions import (
    filter_by_date_range,
    in_list_predicate,
    parse_partition_value,
    partition_spec,
    sort_chronologically,
)
from ..sources.fs import HadoopFS

__all__ = ["PartitionHandler", "DeletionExecutor", "PartitionPlan", "DeletionResult"]

log = logging.getLogger(__name__)


@dataclass
class PartitionPlan:
    """Outcome of the single-scan affected-partition analysis."""

    candidates: list[str]
    #: partition -> (total rows, rows matching the deletion predicate)
    counts: dict[str, tuple[int, int]] = field(default_factory=dict)

    @property
    def affected(self) -> list[str]:
        return sort_chronologically(
            [p for p, (_, m) in self.counts.items() if m > 0])

    @property
    def to_drop(self) -> list[str]:
        """Fully-emptied partitions → metadata-only DROP fast path."""
        return sort_chronologically(
            [p for p, (t, m) in self.counts.items() if m > 0 and m == t])

    @property
    def to_rewrite(self) -> list[str]:
        return sort_chronologically(
            [p for p, (t, m) in self.counts.items() if 0 < m < t])

    @property
    def would_delete(self) -> int:
        return sum(m for _, m in self.counts.values())


@dataclass
class DeletionResult:
    deleted: int
    retained: int
    partitions_rewritten: list[str]
    partitions_dropped: list[str]
    dry_run: bool
    metrics: MetricsCollector


class PartitionHandler:
    """Partition discovery + affected-partition analysis (reference C1)."""

    def __init__(self, spark: SparkSession, config: EngineConfig):
        self.spark = spark
        self.config = config

    def list_partitions(self) -> list[str]:
        """SHOW PARTITIONS → partition values (PartitionHandler.java:63-74)."""
        rows = self.spark.sql(
            f"SHOW PARTITIONS {self.config.qualified_table}").collect()
        return [parse_partition_value(r[0]) for r in rows]

    def candidate_partitions(self) -> list[str]:
        """All partitions, driver-side date-range pruned when the config
        carries a partition window (PartitionHandler.java:84-97). Partitions
        with unparseable IDs are only skipped when a window is set; with no
        window every partition is a candidate."""
        parts = self.list_partitions()
        if self.config.partition_start or self.config.partition_end:
            parts = filter_by_date_range(
                parts, self.config.partition_start, self.config.partition_end)
        return sort_chronologically(parts)

    def analyze(self) -> PartitionPlan:
        """Single-scan replacement for the reference's per-partition COUNT
        loop (PartitionHandler.java:102-123). On failure, conservatively
        treats every candidate as affected (PartitionHandler.java:118-122)."""
        cfg = self.config
        candidates = self.candidate_partitions()
        plan = PartitionPlan(candidates=candidates)
        if not candidates:
            return plan
        # count the rows the rewrite will actually drop (NULL-of-P rows
        # are dropped by the default retention scan, so P alone would
        # under-count and break reconciliation)
        pred = cfg.criteria.deletion_column(cfg.null_safe_retention)
        pcol = cfg.partition_column
        try:
            rows = (
                self.spark.table(cfg.qualified_table)
                .where(in_list_predicate(pcol, candidates))
                .groupBy(pcol)
                .agg(F.count(F.lit(1)).alias("total"),
                     F.count(F.when(pred, 1)).alias("matches"))
                .collect()
            )
            plan.counts = {r[pcol]: (r["total"], r["matches"]) for r in rows}
        except Exception as exc:  # conservative inclusion
            log.warning("partition probe failed (%s); conservatively "
                        "including all %d candidates", exc, len(candidates))
            plan.counts = {p: (-1, -1) for p in candidates}
        return plan


class DeletionExecutor:
    """Copy-on-write deletion over the plan (reference C2-C4)."""

    def __init__(self, spark: SparkSession, config: EngineConfig,
                 metrics: MetricsCollector | None = None):
        self.spark = spark
        self.config = config
        self.metrics = metrics or MetricsCollector()
        self.handler = PartitionHandler(spark, config)

    # -- public API ---------------------------------------------------------

    def dry_run(self, plan: PartitionPlan | None = None) -> DeletionResult:
        """Report would-delete counts without writing (C4,
        DeletionExecutor.java:77-107)."""
        plan = plan or self.handler.analyze()
        self.metrics.dry_run = True
        if any(t < 0 for t, _ in plan.counts.values()):
            # probe failed (sentinel counts): measure directly — dry run is
            # read-only, so the extra scan is the whole point
            cfg = self.config
            scoped = (self.spark.table(cfg.qualified_table)
                      .where(in_list_predicate(cfg.partition_column,
                                               plan.candidates)))
            total = scoped.count()
            deleted = scoped.where(
                cfg.criteria.deletion_column(cfg.null_safe_retention)).count()
            retained = total - deleted
        else:
            deleted = plan.would_delete
            retained = sum(t for t, _ in plan.counts.values()) - deleted
        audit("dry_run", table=self.config.qualified_table,
              would_delete=deleted, affected=plan.affected)
        return DeletionResult(deleted=deleted, retained=retained,
                              partitions_rewritten=[], partitions_dropped=[],
                              dry_run=True, metrics=self.metrics)

    def execute(self, plan: PartitionPlan | None = None) -> DeletionResult:
        """Run the deletion: DROP fully-emptied partitions, rewrite the rest
        in batches of ``partition_parallelism`` (C2/C3)."""
        cfg = self.config
        plan = plan or self.handler.analyze()
        if cfg.dry_run:
            return self.dry_run(plan)

        if any(t < 0 for t, _ in plan.counts.values()):
            # Probe failed (sentinel counts). Rewrite-only would be WRONG
            # for a partition whose rows ALL match: its retention scan is
            # empty, and dynamic-partition overwrite writes nothing for a
            # partition absent from the data — the matching rows would
            # silently survive. Repair the plan with one scan counting
            # (total, retained) per candidate; if this scan also fails,
            # the exception aborts the job BEFORE any mutation.
            pcol = cfg.partition_column
            keep = cfg.criteria.retention_column(cfg.null_safe_retention)
            rows = (self.spark.table(cfg.qualified_table)
                    .where(in_list_predicate(pcol, plan.candidates))
                    .groupBy(pcol)
                    .agg(F.count(F.lit(1)).alias("total"),
                         F.count(F.when(keep, 1)).alias("retained"))
                    .collect())
            plan.counts = {r[pcol]: (r["total"], r["total"] - r["retained"])
                           for r in rows}
        to_drop = plan.to_drop
        to_rewrite = plan.to_rewrite

        dropped = self.drop_partitions(to_drop)
        rewritten: list[str] = []
        for batch in _batches(to_rewrite, cfg.partition_parallelism):
            self._rewrite_batch(batch, plan)
            rewritten.extend(batch)

        for pid in dropped:
            _total, matches = plan.counts[pid]
            self.metrics.record_dropped_partition(pid, matches)
        self.metrics.partitions_dropped = len(dropped)

        deleted = self.metrics.records_deleted
        retained = self.metrics.records_retained
        audit("deletion_executed", table=cfg.qualified_table, deleted=deleted,
              retained=retained, dropped=dropped, rewritten=rewritten)
        return DeletionResult(deleted=deleted, retained=retained,
                              partitions_rewritten=rewritten,
                              partitions_dropped=dropped,
                              dry_run=False, metrics=self.metrics)

    # -- internals ----------------------------------------------------------

    def retention_scan(self, partitions: list[str]) -> DataFrame:
        """``SELECT * WHERE pcol IN (...) AND NOT(criteria)`` — the
        copy-on-write read (DeletionExecutor.java:153-157). Declarative, so
        Catalyst prunes to the listed partitions and pushes the retention
        predicate into the columnar reader."""
        cfg = self.config
        return (self.spark.table(cfg.qualified_table)
                .where(in_list_predicate(cfg.partition_column, partitions))
                .where(cfg.criteria.retention_column(cfg.null_safe_retention)))

    def _rewrite_batch(self, batch: list[str], plan: PartitionPlan) -> None:
        """Dynamic-partition overwrite of one batch (DeletionExecutor.java:
        215-222). NO ``partitionBy`` on insertInto — the table's partition
        spec governs (reference constraint, TEST_FIX.md:16-41).

        The retained row count is collected with ``observe()`` DURING the
        write pass — a free accumulator-backed metric, no extra scan (the
        reference re-counts with a second job, DeletionExecutor.java:158).
        It is also the write-TIME truth: ``plan.counts`` was measured at
        analyze time, so a divergence means the partition changed in
        between (concurrent writer) and reconciliation must use the
        observed value, not the stale plan."""
        from pyspark.sql import Observation

        cfg = self.config
        retained_df = self.retention_scan(batch)
        # insertInto is positional: align to the table's column order.
        cols = self.spark.table(cfg.qualified_table).columns
        obs = Observation()
        (retained_df.select(*cols)
         .observe(obs, F.count(F.lit(1)).alias("retained"))
         .write.mode("overwrite")
         .insertInto(cfg.qualified_table))
        observed_retained = int(obs.get["retained"])
        # plan.counts is always real here: execute() repairs sentinel
        # counts before batching.
        before = sum(plan.counts[p][0] for p in batch)
        per_part = {p: plan.counts[p][1] for p in batch}
        planned_retained = before - sum(per_part.values())
        if observed_retained != planned_retained:
            log.warning(
                "batch %s: retained rows at write time (%d) != analyze-time "
                "plan (%d) — table modified between analyze and rewrite; "
                "metrics use the observed count", batch, observed_retained,
                planned_retained)
            audit("concurrent_modification_detected", batch=batch,
                  planned_retained=planned_retained,
                  observed_retained=observed_retained)
            # Reconcile: retained is the write-time truth (observed in
            # the write pass itself); deleted falls back to the
            # analyze-time per-partition match counts — the criteria's
            # known target set, and the only non-negative estimate
            # available without a second scan (the retention scan never
            # reads matching rows, so write-time total is unobservable
            # for free). Rebuild `before` as their sum so the batch
            # arithmetic (deleted = before - retained) stays
            # consistent instead of going negative when a concurrent
            # writer ADDED rows after analyze. The reference has no
            # answer here at all — its counts race identically
            # (DeletionExecutor.java:143-158) with no detection.
            before = observed_retained + sum(per_part.values())
        self.metrics.record_batch(batch, before, observed_retained, per_part)

    def drop_partitions(self, partitions: list[str]) -> list[str]:
        """Empty-partition fast path: metadata DROP + external-dir delete
        (DeletionExecutor.java:164-214). External tables keep their HDFS
        directory after DROP PARTITION, so the files are removed explicitly
        (DeletionExecutor.java:251-269)."""
        if not partitions:
            return []
        cfg = self.config
        fs = HadoopFS(self.spark)
        dropped = []
        for pid in partitions:
            spec = partition_spec(cfg.partition_column, pid)
            location = self._partition_location(spec)
            self.spark.sql(
                f"ALTER TABLE {cfg.qualified_table} "
                f"DROP IF EXISTS PARTITION ({spec})")
            if location:
                try:
                    fs.delete(location, recursive=True)
                except Exception as exc:
                    log.warning("could not delete partition dir %s: %s",
                                location, exc)
            dropped.append(pid)
            audit("partition_dropped", table=cfg.qualified_table,
                  partition=pid, location=location)
        return dropped

    def _partition_location(self, spec: str) -> str | None:
        """DESCRIBE FORMATTED ... PARTITION → Location
        (DeletionExecutor.java:173-187)."""
        try:
            rows = (self.spark.sql(
                f"DESCRIBE FORMATTED {self.config.qualified_table} "
                f"PARTITION ({spec})")
                .filter(F.col("col_name") == "Location")
                .select("data_type").collect())
            return rows[0][0] if rows else None
        except Exception:
            return None


def _batches(items: list[str], width: int) -> list[list[str]]:
    """Sequential batches of ``min(width, n)`` (DeletionExecutor.java:235-244)."""
    width = max(1, width)
    return [items[i:i + width] for i in range(0, len(items), width)]
