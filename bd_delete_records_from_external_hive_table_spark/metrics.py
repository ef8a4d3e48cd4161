"""Metrics collection + audit logging.

Re-expression of ``/root/reference/.../util/MetricsCollector.java`` (wall
clock, read/deleted/retained counts, per-partition map, flags, formatted
report) and the dedicated AUDIT logger the reference wires through log4j
(``/root/reference/src/main/resources/log4j.properties:18-28``).

Reference quirks *fixed deliberately* (SURVEY §2n, flagged for review):
per-partition records here are genuinely per-partition, and
``partitions_processed`` counts partitions, not batches.
"""

from __future__ import annotations

import json
import logging
import time
from dataclasses import dataclass, field

__all__ = ["MetricsCollector", "audit"]

AUDIT = logging.getLogger("bd_engine.audit")


def audit(event: str, **details) -> None:
    """Structured audit record (reference: AUDIT logger call sites, e.g.
    HiveTableDeletionJob.java:49,62-67)."""
    AUDIT.info("%s %s", event, json.dumps(details, default=str, sort_keys=True))


@dataclass
class MetricsCollector:
    """Accumulates job metrics on the driver (MetricsCollector.java:10-133)."""

    started_at: float = field(default_factory=time.time)
    finished_at: float | None = None

    records_read: int = 0
    records_deleted: int = 0
    records_retained: int = 0
    partitions_processed: int = 0
    partitions_dropped: int = 0
    batches_processed: int = 0
    per_partition_deleted: dict[str, int] = field(default_factory=dict)

    backup_created: bool = False
    backup_ref: str | None = None
    validation_passed: bool | None = None
    dry_run: bool = False
    succeeded: bool | None = None
    error: str | None = None

    def record_batch(self, partitions: list[str], before: int, retained: int,
                     per_partition: dict[str, int] | None = None) -> None:
        self.batches_processed += 1
        self.partitions_processed += len(partitions)
        self.records_read += before
        self.records_retained += retained
        self.records_deleted += before - retained
        if per_partition:
            for pid, n in per_partition.items():
                self.per_partition_deleted[pid] = (
                    self.per_partition_deleted.get(pid, 0) + n)

    def record_dropped_partition(self, pid: str, deleted: int) -> None:
        """Metadata-only DROP fast path: rows are deleted but no rewrite
        batch ran and no data was read back — batches_processed and
        records_read stay untouched."""
        self.partitions_processed += 1
        self.records_deleted += deleted
        self.per_partition_deleted[pid] = (
            self.per_partition_deleted.get(pid, 0) + deleted)

    def finish(self, succeeded: bool, error: str | None = None) -> None:
        self.finished_at = time.time()
        self.succeeded = succeeded
        self.error = error

    @property
    def elapsed_sec(self) -> float:
        end = self.finished_at if self.finished_at is not None else time.time()
        return end - self.started_at

    def as_dict(self) -> dict:
        return {
            "elapsed_sec": round(self.elapsed_sec, 3),
            "records_read": self.records_read,
            "records_deleted": self.records_deleted,
            "records_retained": self.records_retained,
            "partitions_processed": self.partitions_processed,
            "partitions_dropped": self.partitions_dropped,
            "batches_processed": self.batches_processed,
            "per_partition_deleted": self.per_partition_deleted,
            "backup_created": self.backup_created,
            "backup_ref": self.backup_ref,
            "validation_passed": self.validation_passed,
            "dry_run": self.dry_run,
            "succeeded": self.succeeded,
            "error": self.error,
        }

    def report(self) -> str:
        """Human-readable report (MetricsCollector formatted report)."""
        d = self.as_dict()
        lines = ["=== Deletion job metrics ==="]
        lines.extend(f"{k:24s}: {v}" for k, v in d.items()
                     if k != "per_partition_deleted")
        if self.per_partition_deleted:
            lines.append("per-partition deleted:")
            lines.extend(f"  {pid}: {n}"
                         for pid, n in sorted(self.per_partition_deleted.items()))
        return "\n".join(lines)
