"""SURVEY §2o declared queries Q01–Q10 — the deletion engine's operator
families expressed over the driver testdata, DuckDB-oracle checked.

Each builder is pure DataFrame API (predicates as typed Columns, aggregates
with explicit aliases) so Catalyst gets full pushdown/pruning freedom; the
oracle strings are the §2o ANSI SQL with matching aliases.

Scale notes: every query here is either a scan+filter+count (map-side
partial aggregation, no meaningful shuffle) or a low-cardinality groupBy
(shuffle on a handful of keys). Filters sit directly on parquet columns →
PushedFilters in the scan; counts never collect rows to the driver.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import DeletionCriteria
from ..sources.tables import load_table
from .registry import register

# Bounds sit inside the events table's actual range (Jan 2024) so the
# window selects a proper non-empty subset — an empty result would make
# the oracle comparison vacuous.
_T0 = datetime(2024, 1, 10)
_T1 = datetime(2024, 1, 20)

#: The events-table criteria used by Q02–Q04: the reference's P3+P4
#: composition (time window + conjunctive user clause).
_EVENT_CRITERIA = DeletionCriteria(
    where_clause="event_type = 'click'",
    start_time=_T0, end_time=_T1, time_column="ts")

_EVENT_WINDOW_SQL = ("ts >= TIMESTAMP '2024-01-10 00:00:00' "
                     "AND ts < TIMESTAMP '2024-01-20 00:00:00'")


@register("q01_scan_count", "SELECT COUNT(*) AS n FROM lineitem")
def q01(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1/A1: full-scan cardinality (reference workhorse, SURVEY §2e A1)."""
    return load_table(spark, sf_dir, "lineitem").agg(
        F.count(F.lit(1)).alias("n"))


@register("q02_time_window",
          f"SELECT COUNT(*) AS n FROM events WHERE {_EVENT_WINDOW_SQL}")
def q02(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3: time-window predicate, start inclusive / end exclusive
    (DeletionCriteria.java:51-64)."""
    window = DeletionCriteria(start_time=_T0, end_time=_T1, time_column="ts")
    return (load_table(spark, sf_dir, "events", ts_start=_T0, ts_end=_T1)
            .where(window.to_column())
            .agg(F.count(F.lit(1)).alias("n")))


@register("q03_conjunctive_criteria",
          f"SELECT COUNT(*) AS n FROM events WHERE {_EVENT_WINDOW_SQL} "
          "AND (event_type = 'click')")
def q03(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4: window AND parenthesized user clause (DeletionCriteria.java:66-74)."""
    return (load_table(spark, sf_dir, "events", ts_start=_T0, ts_end=_T1)
            .where(_EVENT_CRITERIA.to_column())
            .agg(F.count(F.lit(1)).alias("n")))


@register("q04_retention_complement",
          f"SELECT COUNT(*) AS n FROM events WHERE NOT ({_EVENT_WINDOW_SQL} "
          "AND (event_type = 'click'))")
def q04(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5: retention complement NOT(P) with SQL three-valued logic — the
    core delete(P) ≡ retain(¬P) semantic (DeletionCriteria.java:82-88)."""
    return (load_table(spark, sf_dir, "events")
            .where(_EVENT_CRITERIA.retention_column())
            .agg(F.count(F.lit(1)).alias("n")))


@register("q05_in_list_filter",
          "SELECT COUNT(*) AS n FROM orders WHERE o_orderstatus IN ('F','O')")
def q05(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6: IN-list filter — the partition-pruning predicate shape
    (PartitionUtils.java:83-100)."""
    return (load_table(spark, sf_dir, "orders")
            .where(F.col("o_orderstatus").isin(["F", "O"]))
            .agg(F.count(F.lit(1)).alias("n")))


@register("q06_affected_partition_probe",
          "SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS c FROM orders "
          "WHERE o_totalprice > 100000 GROUP BY d HAVING COUNT(*) > 0 "
          "ORDER BY d")
def q06(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1: affected-partition probe as one partial-agg groupBy instead of
    the reference's per-partition COUNT loop (PartitionHandler.java:102-123)."""
    return (load_table(spark, sf_dir, "orders")
            .where(F.col("o_totalprice") > 100000)
            .groupBy(F.col("o_orderdate").cast("date").alias("d"))
            .agg(F.count(F.lit(1)).alias("c"))
            .where(F.col("c") > 0)
            .orderBy("d"))


@register("q07_delete_retain_complement",
          "SELECT COUNT(*) AS n FROM lineitem WHERE NOT (l_returnflag = 'R' "
          "AND l_shipdate >= TIMESTAMP '1994-01-01 00:00:00' "
          "AND l_shipdate < TIMESTAMP '1995-01-01 00:00:00')")
def q07(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3: the retained-set count of a realistic delete (flag+window)."""
    crit = DeletionCriteria(where_clause="l_returnflag = 'R'",
                            start_time=datetime(1994, 1, 1),
                            end_time=datetime(1995, 1, 1),
                            time_column="l_shipdate")
    return (load_table(spark, sf_dir, "lineitem")
            .where(crit.retention_column())
            .agg(F.count(F.lit(1)).alias("n")))


@register("q08_ordered_projection",
          "SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_quantity = 50 "
          "ORDER BY l_orderkey, l_linenumber")
def q08(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1/P2: pruned projection + total order (test verification shape,
    HiveTableDeletionJobIntegrationTest.java:166-167)."""
    return (load_table(spark, sf_dir, "lineitem")
            .where(F.col("l_quantity") == 50)
            .select("l_orderkey", "l_linenumber")
            .orderBy("l_orderkey", "l_linenumber"))


@register("q09_count_reconciliation",
          "SELECT (SELECT COUNT(*) FROM lineitem) "
          "- (SELECT COUNT(*) FROM lineitem WHERE l_discount > 0.05) "
          "- (SELECT COUNT(*) FROM lineitem WHERE NOT (l_discount > 0.05)) "
          "- (SELECT COUNT(*) FROM lineitem WHERE l_discount IS NULL) AS diff")
def q09(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C7a: the reconciliation invariant total = matches + complement +
    NULLs, computed in ONE scan with conditional counts (the oracle's four
    subqueries collapse into a single aggregation — 4× less I/O)."""
    p = F.col("l_discount") > 0.05
    return load_table(spark, sf_dir, "lineitem").agg(
        (F.count(F.lit(1))
         - F.count(F.when(p, 1))
         - F.count(F.when(~p, 1))
         - F.count(F.when(F.col("l_discount").isNull(), 1))
         ).cast("long").alias("diff"))


@register("q10_per_partition_counts",
          "SELECT o_orderstatus, COUNT(*) AS c FROM orders "
          "GROUP BY o_orderstatus ORDER BY o_orderstatus")
def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: per-partition counts as groupBy — engine-side generalization of
    the reference's driver map (MetricsCollector.java:29-51)."""
    return (load_table(spark, sf_dir, "orders")
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("c"))
            .orderBy("o_orderstatus"))
