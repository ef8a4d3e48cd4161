"""Pre/post-deletion validation.

Re-expression of ``/root/reference/.../validation/ValidationManager.java``
and ``DataIntegrityValidator.java``. Four post-deletion checks (C7):

(a) retained count within ``expected ± tolerance%`` (ValidationManager.java:142-163)
(b) sampled integrity: no sampled surviving row matches the criteria
    (DataIntegrityValidator.java:33-118 — Bernoulli sample, fraction =
    sample_size / total, short-circuit when total <= sample_size)
(c) partition structure intact for partitions expected to survive
    (DataIntegrityValidator.java:123-145)
(d) zero rows still match the criteria (ValidationManager.java:181-194)

Engine upgrades: the sample takes a fixed seed for deterministic tests
(the reference is seedless), and check (d) uses the same single-scan count
as the probe rather than a fresh SQL string.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from ..config import EngineConfig
from ..metrics import audit
from ..partitions import in_list_predicate, partition_spec

__all__ = ["ValidationManager", "ValidationReport"]

log = logging.getLogger(__name__)


@dataclass
class ValidationReport:
    passed: bool = True
    checks: dict[str, bool] = field(default_factory=dict)
    details: dict[str, str] = field(default_factory=dict)

    def record(self, name: str, ok: bool, detail: str = "") -> None:
        self.checks[name] = ok
        if detail:
            self.details[name] = detail
        self.passed = self.passed and ok


class ValidationManager:
    def __init__(self, spark: SparkSession, config: EngineConfig):
        self.spark = spark
        self.config = config

    # -- pre-deletion -------------------------------------------------------

    def validate_pre_deletion(self) -> ValidationReport:
        """Table exists and is readable (ValidationManager.java:110-117)."""
        report = ValidationReport()
        cfg = self.config
        try:
            self.spark.sql(f"DESCRIBE TABLE {cfg.qualified_table}").collect()
            report.record("table_exists", True)
        except Exception as exc:
            report.record("table_exists", False, str(exc))
        return report

    # -- post-deletion ------------------------------------------------------

    def validate_post_deletion(self, expected_retained: int | None,
                               surviving_partitions: list[str] | None = None,
                               seed: int = 42,
                               scope_partitions: list[str] | None = None) -> ValidationReport:
        """``scope_partitions`` restricts every check to the partitions the
        deletion actually covered (the candidate set after partition-window
        pruning). Rows outside that scope may legitimately still match the
        criteria, and at scale a whole-table validation scan is wasteful —
        the IN-list predicate partition-prunes each check down to the
        touched partitions. ``None`` keeps whole-table semantics
        (ValidationManager.java:142-194 validates globally because the
        reference has no independent partition window)."""
        cfg = self.config
        report = ValidationReport()
        table = self.spark.table(cfg.qualified_table)
        if scope_partitions is not None:
            table = table.where(
                in_list_predicate(cfg.partition_column, scope_partitions))
        # "zero matching remain" means zero rows the deletion would drop —
        # under null-safe retention, surviving NULL-of-P rows are intended
        pred = cfg.criteria.deletion_column(cfg.null_safe_retention)

        # (a) count reconciliation + (d) zero remaining matches — ONE
        # conditional-aggregate scan for both (the reference runs two
        # jobs, ValidationManager.java:142-163 + 181-194; at 100 TB the
        # second full pass is pure waste)
        from pyspark.sql import functions as F
        row = table.agg(
            F.count(F.lit(1)).alias("total"),
            F.count(F.when(pred, 1)).alias("remaining")).first()
        actual, remaining = row["total"], row["remaining"]
        if expected_retained is not None:
            tol = expected_retained * cfg.validation_tolerance_pct / 100.0
            ok = abs(actual - expected_retained) <= tol
            report.record("count_reconciliation", ok,
                          f"expected={expected_retained} actual={actual} "
                          f"tol={tol}")
        report.record("zero_matching_remain", remaining == 0,
                      f"remaining_matches={remaining}")

        # (b) sampled integrity check — when everything fits in the
        # sample, check (d) already counted the identical full scan
        if cfg.validation_sample_size > 0 and actual > 0:
            if actual <= cfg.validation_sample_size:
                bad = remaining
            else:
                fraction = min(1.0, cfg.validation_sample_size / actual)
                sample = table.sample(withReplacement=False,
                                      fraction=fraction, seed=seed)
                bad = sample.where(pred).count()
            report.record("sample_integrity", bad == 0,
                          f"sampled_matches={bad}")

        # (c) partition structure intact
        if surviving_partitions:
            missing = [p for p in surviving_partitions
                       if not self._partition_exists(p)]
            report.record("partition_structure", not missing,
                          f"missing={missing}")

        audit("post_validation", table=cfg.qualified_table,
              passed=report.passed, checks=report.checks)
        return report

    def _partition_exists(self, value: str) -> bool:
        """SHOW PARTITIONS ... PARTITION(col='v') probe
        (DataIntegrityValidator.java:123-145)."""
        spec = partition_spec(self.config.partition_column, value)
        try:
            rows = self.spark.sql(
                f"SHOW PARTITIONS {self.config.qualified_table} "
                f"PARTITION ({spec})").collect()
            return len(rows) > 0
        except Exception:
            return False

    def count_matching(self, partitions: list[str] | None = None) -> int:
        """COUNT(*) of rows the deletion would drop; ``partitions`` prunes
        the scan — an explicit empty list means an empty scope (count 0),
        only ``None`` means whole-table."""
        cfg = self.config
        df = self.spark.table(cfg.qualified_table)
        if partitions is not None:
            df = df.where(in_list_predicate(cfg.partition_column, partitions))
        return df.where(
            cfg.criteria.deletion_column(cfg.null_safe_retention)).count()
