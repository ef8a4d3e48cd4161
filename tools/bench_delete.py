"""End-to-end DELETE workflow benchmark at sf1 (1M-row partitioned table).

The engine's reason to exist — the reference's C1→C3 copy-on-write delete
over a partitioned Hive table (DeletionExecutor.java:139-230,
PartitionHandler.java:34-126) — is exercised by functional tests only at
toy scale; this tool gives the headline capability a real perf row.

Protocol: build ONE partitioned ORC Hive table from the sf1 events
derivation (tools/make_sf1.py → 1,000,000 rows across 30 daily
partitions, ~33k rows each), then run the FULL DeletionJob pipeline
(identify → backup → dynamic-overwrite rewrite → post-validate) for
scenarios chosen to hit each execution path once, each scoped to its
OWN disjoint partition window so no scenario sees another's mutations:

- ``delete_1pct``     7-partition window, criteria matches ~1% of rows
                      (the routine GDPR-style delete: rewrite dominated
                      by the retained 99%).
- ``delete_50pct``    7-partition window, ~50% match (rewrite cost at
                      its worst useful point: backup + half the data
                      rewritten).
- ``empty_partition`` time-window criteria covering one whole day →
                      matches == total → the metadata-only DROP fast
                      path (no rewrite batch, no read-back).
- ``no_match``        7-partition window, criteria matches nothing →
                      pure identify + validation cost (the floor every
                      run pays).
- ``dry_run``         7-partition window, ~1% match, dry_run=True →
                      the planning/reporting path (identify + counts,
                      zero writes).

Partition-pruning evidence (the 100 TB argument): for each scenario the
tool re-derives the handler's own analysis scan and records (a) the
driver-side prune ratio candidates/total_partitions and (b) whether the
executed scan carries the partition IN-list in ``PartitionFilters`` —
i.e. the probe reads ONLY the windowed partitions, so cost scales with
the window, not the table.

A ``many_partition_probe`` section additionally builds an
HOURLY-partitioned copy (~720 partitions) and counts the Spark jobs
``analyze()`` launches — the single-scan-analysis claim (reference:
one COUNT job per partition) measured, and the test that caught the
metastore IN-list overflow (see session.py's
``metastorePartitionPruningInSetThreshold``).

Results merge into BENCH_DETAIL.json under ``delete_bench`` (bench.py
preserves foreign keys on refresh; ``SPARK_GRAFT_DELETE_SF=10`` with
``SPARK_GRAFT_SF1_DIR=/tmp/sf10`` writes ``delete_bench_sf10``). Run
SOLO, like every bench.

Usage: python tools/make_sf1.py && python tools/bench_delete.py
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import sys
import tempfile
import time
from datetime import datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bd_delete_records_from_external_hive_table_spark.config import (  # noqa: E402
    DeletionCriteria, EngineConfig)
from bd_delete_records_from_external_hive_table_spark.job import DeletionJob  # noqa: E402
from bd_delete_records_from_external_hive_table_spark.operators.deletion import (  # noqa: E402
    PartitionHandler)
from bd_delete_records_from_external_hive_table_spark.partitions import (  # noqa: E402
    in_list_predicate)
from bd_delete_records_from_external_hive_table_spark.session import SessionFactory  # noqa: E402
from bd_delete_records_from_external_hive_table_spark.sources.tables import load_table  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/sf1")
#: label for the BENCH_DETAIL section: "1" → delete_bench (the default
#: sf1 run), anything else → delete_bench_sf<label> (e.g. a 10M-row
#: sf10 run with SPARK_GRAFT_SF1_DIR=/tmp/sf10 SPARK_GRAFT_DELETE_SF=10)
SF_LABEL = os.environ.get("SPARK_GRAFT_DELETE_SF", "1")
DB = "delete_bench"
TABLE = "events_sf1"


def _explain(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def build_table(spark) -> tuple[float, int, int]:
    """Partitioned ORC Hive table from sf1 events: partition_id =
    yyyyMMdd(ts) — the reference's exact layout (daily STRING
    partitions, ORC storage, HiveTableDeletionJobIntegrationTest.java
    fixture shape)."""
    t0 = time.time()
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {DB}")
    spark.sql(f"DROP TABLE IF EXISTS {DB}.{TABLE}")
    spark.sql(f"""
        CREATE TABLE {DB}.{TABLE} (
          event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
          event_type STRING, value DOUBLE, props STRING
        ) PARTITIONED BY (partition_id STRING) STORED AS ORC
    """)
    ev = load_table(spark, SF1, "events")
    (ev.select("event_id", "ts", "user_id", "event_type", "value", "props",
               F.date_format("ts", "yyyyMMdd").alias("partition_id"))
       .repartition("partition_id")   # one writer wave, one file/partition
       .write.insertInto(f"{DB}.{TABLE}"))
    n_rows = spark.table(f"{DB}.{TABLE}").count()
    n_parts = spark.sql(f"SHOW PARTITIONS {DB}.{TABLE}").count()
    return round(time.time() - t0, 3), n_rows, n_parts


def prune_evidence(spark, cfg: EngineConfig) -> dict:
    """Replicates PartitionHandler.analyze()'s scan and inspects its
    plan: at 100 TB the probe must read the windowed partitions only."""
    handler = PartitionHandler(spark, cfg)
    total = len(handler.list_partitions())
    cands = handler.candidate_partitions()
    pred = cfg.criteria.deletion_column(cfg.null_safe_retention)
    probe = (spark.table(cfg.qualified_table)
             .where(in_list_predicate(cfg.partition_column, cands))
             .groupBy(cfg.partition_column)
             .agg(F.count(F.lit(1)).alias("total"),
                  F.count(F.when(pred, 1)).alias("matches")))
    plan = _explain(probe)
    pf = [ln.strip() for ln in plan.splitlines()
          if "PartitionFilters" in ln]
    return {
        "total_partitions": total,
        "candidate_partitions": len(cands),
        # a single-candidate IN-list folds to an equality filter — both
        # shapes prove the probe reads only the windowed partitions
        "partition_filters_in_scan": bool(
            pf and cfg.partition_column in pf[0]
            and (" IN " in pf[0] or " = " in pf[0])),
        "partition_filters": pf[0][:200] if pf else None,
    }


def run_scenario(spark, name: str, cfg: EngineConfig) -> dict:
    evidence = prune_evidence(spark, cfg)
    t0 = time.time()
    outcome = DeletionJob(spark, cfg).run()
    wall = round(time.time() - t0, 3)
    if not outcome.success:
        raise RuntimeError(f"{name} failed: {outcome.error}")
    r, m = outcome.result, outcome.metrics
    row = {
        "wall_s": wall,
        "deleted": r.deleted,
        "retained_in_rewrites": r.retained,
        "partitions_rewritten": len(r.partitions_rewritten),
        "partitions_dropped": len(r.partitions_dropped),
        "dry_run": r.dry_run,
        "backup_created": m.backup_created,
        "validation_passed": m.validation_passed,
        **evidence,
    }
    print(json.dumps({name: row}), flush=True)
    return row


def many_partition_probe(spark) -> dict:
    """The single-scan-analysis claim, measured: the reference probes
    each candidate partition with its own COUNT(*) Spark job
    (PartitionHandler.java:102-123 — N partitions ⇒ N jobs); this
    engine's ``analyze()`` is ONE partition-pruned groupBy however many
    partitions exist. Build an HOURLY-partitioned copy (~720 partitions
    at sf1) and count the Spark jobs analyze() actually launches via a
    job group."""
    t0 = time.time()
    spark.sql(f"DROP TABLE IF EXISTS {DB}.events_hourly")
    spark.sql(f"""
        CREATE TABLE {DB}.events_hourly (
          event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
          event_type STRING, value DOUBLE, props STRING
        ) PARTITIONED BY (partition_id STRING) STORED AS ORC
    """)
    ev = load_table(spark, SF1, "events")
    (ev.select("event_id", "ts", "user_id", "event_type", "value", "props",
               F.date_format("ts", "yyyyMMddHH").alias("partition_id"))
       .repartition("partition_id")
       .write.insertInto(f"{DB}.events_hourly"))
    build_s = round(time.time() - t0, 3)
    cfg = EngineConfig(
        database=DB, table="events_hourly",
        criteria=DeletionCriteria(time_column="ts",
                                  where_clause="user_id % 1000 = 0"),
        backup_enabled=False, validation_enabled=True)
    sc = spark.sparkContext
    sc.setJobGroup("analyze-many", "single-scan partition analysis")
    t0 = time.time()
    plan = PartitionHandler(spark, cfg).analyze()
    analyze_s = round(time.time() - t0, 3)
    jobs = sc.statusTracker().getJobIdsForGroup("analyze-many")
    sc.setJobGroup("", "")
    # ...and the full multi-batch delete over the same table: ~122
    # affected partitions / partition_parallelism=10 ⇒ ~13 rewrite
    # batches — the C2/C3 batching path the 30-partition scenarios
    # (≤7 affected, single batch) never exercise.
    t0 = time.time()
    outcome = DeletionJob(spark, cfg).run()
    delete_s = round(time.time() - t0, 3)
    if not outcome.success:
        raise RuntimeError(f"many-partition delete failed: {outcome.error}")
    r, m = outcome.result, outcome.metrics
    row = {
        "build_wall_s": build_s,
        "partitions": len(plan.candidates),
        "affected": len(plan.affected),
        "analyze_wall_s": analyze_s,
        "analyze_spark_jobs": len(jobs),
        "reference_equivalent_jobs": len(plan.candidates),
        "delete_wall_s": delete_s,
        "deleted": r.deleted,
        "partitions_rewritten": len(r.partitions_rewritten),
        "rewrite_batches": m.batches_processed,
        "validation_passed": m.validation_passed,
    }
    print(json.dumps({"many_partition_probe": row}), flush=True)
    return row


def main() -> None:
    if not os.path.exists(os.path.join(SF1, "events.parquet")):
        sys.exit(f"{SF1}/events.parquet missing — run tools/make_sf1.py first")
    load0 = os.getloadavg()[0]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    base = tempfile.mkdtemp(prefix="delete_bench_")
    spark = SessionFactory.create(
        app_name="delete-bench", master=f"local[{cpus}]", hive=True,
        warehouse_dir=os.path.join(base, "warehouse"),
        metastore_dir=os.path.join(base, "metastore_db"),
        shuffle_partitions=int(cpus) if cpus.isdigit() else 32)

    build_s, n_rows, n_parts = build_table(spark)
    print(json.dumps({"build": {"wall_s": build_s, "rows": n_rows,
                                "partitions": n_parts}}), flush=True)

    def window(d0: int, d1: int) -> dict:
        return {"partition_start": datetime(2024, 1, d0),
                "partition_end": datetime(2024, 1, d1)}

    crit = lambda **kw: DeletionCriteria(time_column="ts", **kw)
    scenarios = {
        # ~1% of rows in a 7-day window; full pipeline incl. backup
        "delete_1pct": EngineConfig(
            database=DB, table=TABLE,
            criteria=crit(where_clause="user_id % 100 = 0"),
            **window(1, 8)),
        # ~50% of rows in the next 7-day window
        "delete_50pct": EngineConfig(
            database=DB, table=TABLE,
            criteria=crit(where_clause="user_id % 2 = 0"),
            **window(8, 15)),
        # whole-day time window empties partition 20240115 → DROP path
        "empty_partition": EngineConfig(
            database=DB, table=TABLE,
            criteria=crit(start_time=datetime(2024, 1, 15),
                          end_time=datetime(2024, 1, 16)),
            **window(15, 16)),
        # nothing matches → identify-only floor
        "no_match": EngineConfig(
            database=DB, table=TABLE,
            criteria=crit(where_clause="user_id < 0"),
            **window(16, 23)),
        # planning/reporting path, zero writes
        "dry_run": EngineConfig(
            database=DB, table=TABLE,
            criteria=crit(where_clause="user_id % 100 = 0"),
            dry_run=True, **window(23, 31)),
    }

    results = {}
    for name, cfg in scenarios.items():
        results[name] = run_scenario(spark, name, cfg)

    # --- merge-on-read counterpart (deletion vectors): same ~1% delete
    # shape as delete_1pct but via tombstones — the write-amplification
    # comparison: delete cost O(matching rows) vs CoW's partition
    # rewrite; read pays one broadcast anti join; compact() amortizes
    # the physical rewrite (reference CoW machinery underneath).
    from bd_delete_records_from_external_hive_table_spark.operators.deletion_vectors import (
        MergeOnReadDeleter)
    mor_cfg = EngineConfig(
        database=DB, table=TABLE,
        criteria=crit(where_clause="user_id % 100 = 50"),
        backup_enabled=False, **window(23, 31))
    mor = MergeOnReadDeleter(spark, mor_cfg,
                             dv_path=os.path.join(base, "dv_store"),
                             key_columns=["event_id"])
    t0 = time.time()
    dres = mor.delete()
    mor_delete_s = round(time.time() - t0, 3)
    t0 = time.time()
    visible = mor.read().count()
    mor_read_s = round(time.time() - t0, 3)
    t0 = time.time()
    cres = mor.compact()
    mor_compact_s = round(time.time() - t0, 3)
    results["mor_delete_1pct"] = {
        "wall_s": mor_delete_s, "deleted": dres.keys_written,
        "read_after_delete_s": mor_read_s, "visible_rows": visible,
        "compact_s": mor_compact_s,
        "compact_partitions_rewritten": len(cres.partitions_rewritten),
        "dry_run": False,
        "cow_equivalent_wall_s": results["delete_1pct"]["wall_s"],
    }
    print(json.dumps({"mor_delete_1pct": results["mor_delete_1pct"]}),
          flush=True)

    many = many_partition_probe(spark)

    # integrity: the table must account for every row (1% of ~233k +
    # 50% of ~233k + one full day) with untouched windows intact
    final_rows = spark.table(f"{DB}.{TABLE}").count()
    expected = n_rows - sum(r["deleted"] for r in results.values()
                            if not r["dry_run"])
    section = {
        "sf": SF_LABEL,
        "rows": n_rows,
        "partitions": n_parts,
        "build_wall_s": build_s,
        "final_rows_match": final_rows == expected,
        "loadavg_start": round(load0, 2),
        "loadavg_end": round(os.getloadavg()[0], 2),
        "scenarios": results,
        "many_partition_probe": many,
    }
    key = ("delete_bench" if SF_LABEL == "1"
           else f"delete_bench_sf{SF_LABEL}")
    path = os.path.join(REPO, "BENCH_DETAIL.json")
    with open(path) as f:
        detail = json.load(f)
    detail[key] = section
    with open(path, "w") as f:
        json.dump(detail, f, indent=1)
    print(json.dumps({key: {
        k: round(v["wall_s"], 2) for k, v in results.items()}
        | {"final_rows_match": section["final_rows_match"]}}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
