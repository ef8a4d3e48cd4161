"""Sixteenth-wave queries (round 9): the incremental-ingest LADDER as a
driver-gated query.

- st08 two-batch ingest ladder — d10 proves ONE ingestion step; the
  thing a continuously-ingesting corpus actually depends on is the
  step's FIXPOINT PROPERTY: the store grown by batch 1's survivors
  must reject batch 2's cross-batch duplicates. This query replays two
  sequential batches through the exact same kernel the streaming form
  runs per micro-batch (streaming/ingest.admit_batch — shared code, so
  the driver's value hash gates the streaming pipeline's arithmetic
  too; the stream==batch parity tests in tests/test_streaming.py gate
  the plumbing). Batch 2 plants all three duplicate classes: vs-corpus
  (+3000), CROSS-BATCH vs batch-1 admissions (+5000 — the class only a
  persistent store catches), and in-batch twins (+4000).

Reference anchor: widens the declared-query surface admitted by the
reference's SQL boundary (DeletionCriteria.java:40-63), as waves 1-15;
the store lifecycle mirrors the reference's backup-table reuse
(BackupManager.java:74-118).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from ..streaming import ingest
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# batch construction shared by the Spark side and the oracle: corpus =
# doc_id < 300; batch 1 = [300, 400) + vs-corpus plants; batch 2 =
# [400, 500) + vs-corpus plants + cross-batch copies of batch-1 docs +
# in-batch twins. All slices exist at every SF (sf0.001 has 500 docs).
_B1 = ("SELECT doc_id, text FROM documents "
       "WHERE doc_id >= 300 AND doc_id < 400 "
       "UNION ALL SELECT doc_id + 3000 AS doc_id, text FROM documents "
       "WHERE doc_id < 300 AND doc_id % 20 = 0")
_B2 = ("SELECT doc_id, text FROM documents "
       "WHERE doc_id >= 400 AND doc_id < 500 "
       "UNION ALL SELECT doc_id + 5000 AS doc_id, text FROM documents "
       "WHERE doc_id >= 300 AND doc_id < 400 AND doc_id % 5 = 0 "
       "UNION ALL SELECT doc_id + 4000 AS doc_id, text FROM documents "
       "WHERE doc_id >= 400 AND doc_id < 500 AND doc_id % 25 = 0")


def _slice(docs, lo, hi):
    return docs.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))


def _b1(docs):
    plants = (docs.where((F.col("doc_id") < 300)
                         & (F.col("doc_id") % 20 == 0))
              .select((F.col("doc_id") + 3000).alias("doc_id"), "text"))
    return _slice(docs, 300, 400).unionByName(plants)


def _b2(docs):
    cross = (_slice(docs, 300, 400).where(F.col("doc_id") % 5 == 0)
             .select((F.col("doc_id") + 5000).alias("doc_id"), "text"))
    twins = (_slice(docs, 400, 500).where(F.col("doc_id") % 25 == 0)
             .select((F.col("doc_id") + 4000).alias("doc_id"), "text"))
    return _slice(docs, 400, 500).unionByName(cross).unionByName(twins)


@register("st08_ingest_ladder",
          f"WITH b1 AS ({_B1}), b2 AS ({_B2}), "
          "store0 AS (SELECT DISTINCT md5(text) AS h FROM documents "
          "  WHERE doc_id < 300), "
          "f1 AS (SELECT doc_id, md5(text) AS h FROM b1 "
          "  WHERE md5(text) NOT IN (SELECT h FROM store0)), "
          "a1 AS (SELECT h, MIN(doc_id) AS doc_id FROM f1 GROUP BY h), "
          "store1 AS (SELECT h FROM store0 UNION SELECT h FROM a1), "
          "f2 AS (SELECT doc_id, md5(text) AS h FROM b2 "
          "  WHERE md5(text) NOT IN (SELECT h FROM store1)), "
          "a2 AS (SELECT h, MIN(doc_id) AS doc_id FROM f2 GROUP BY h) "
          "SELECT CAST(1 AS BIGINT) AS batch, doc_id AS admitted_id "
          "FROM a1 UNION ALL "
          "SELECT CAST(2 AS BIGINT) AS batch, doc_id AS admitted_id "
          "FROM a2 ORDER BY batch, admitted_id")
def st08(spark, sf_dir):
    """Two sequential ingestion steps through streaming/ingest's
    admit_batch kernel (exact mode — d10's rule): the store grown by
    batch 1's admissions must reject batch 2's cross-batch duplicates,
    which is the property that makes incremental ingestion SAFE to run
    forever. Scale shape per step: one anti-join keyed on the content
    hash (at 100 TB the store is bucketed by hash → only the incoming
    batch shuffles), one min-id keeper aggregate; the ladder is
    |batches| sequential small steps, never a corpus rescan. The
    STREAMING form (foreachBatch + partitioned store, idempotent under
    replay) runs this exact kernel per micro-batch — stream==batch
    key-set parity is asserted in tests/test_streaming.py, st06's
    pattern."""
    docs = (_t(spark, sf_dir, "documents").select("doc_id", "text")
            .localCheckpoint(eager=False))
    store0 = (docs.where(F.col("doc_id") < 300)
              .select(F.md5("text").alias("k")).distinct()
              .localCheckpoint(eager=False))
    a1, k1 = ingest.admit_batch(_b1(docs), store0)
    store1 = store0.unionByName(k1).distinct().localCheckpoint(eager=False)
    a2, _ = ingest.admit_batch(_b2(docs), store1)
    one = a1.select(F.lit(1).cast("long").alias("batch"),
                    F.col("doc_id").alias("admitted_id"))
    two = a2.select(F.lit(2).cast("long").alias("batch"),
                    F.col("doc_id").alias("admitted_id"))
    return one.unionByName(two).coalesce(1).orderBy("batch", "admitted_id")
