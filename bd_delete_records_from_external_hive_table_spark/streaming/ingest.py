"""Streaming incremental-ingest dedup — d10's streaming sibling.

d10 (plans/llm_ops.py) is the DAILY-BATCH form of corpus ingestion:
admit a new batch only where its content hash is absent from the
existing corpus's signature STORE and first-of-hash within the batch.
This module is the same contract as a Structured Streaming pipeline:
micro-batches arrive on a file source, each batch anti-joins the
persistent store, collapses in-batch duplicates, appends the
survivors' keys back to the store, and emits the admitted rows — the
shape a continuously-crawling corpus actually ingests through.

Two admission modes share one per-batch kernel (:func:`admit_batch` —
used by BOTH the ``foreachBatch`` closure and any batch caller, so
stream==batch parity is by construction and the tests exercise the
streaming plumbing: micro-batch boundaries, store persistence,
idempotent replay):

- ``exact``: store = DISTINCT md5 content hashes (d10's rule,
  verbatim). Admitted iff the hash is new to the store, min-id keeper
  within the batch.
- ``minhash``: store = LSH BAND KEYS (dedup.banded_signatures — the
  SAME key construction the batch near-dup pipeline banding uses, so
  store probes and pipeline buckets can never drift apart). A doc is
  rejected when ANY of its band keys already exists in the store
  (high-probability near-dup blocking — the streaming approximation of
  d15's verify pipeline, standard for admission control: a false
  collision only costs one admittable doc, never corrupts the store);
  survivors of the store probe then collapse in-batch via the LSH pair
  graph's connected components (min-id survivor, d15's rule) and the
  admitted docs' band keys join the store.

Scale shape: the store is a parquet directory PARTITIONED BY the
writing batch id — per-batch writes use dynamic partition overwrite,
so a replayed micro-batch (at-least-once delivery) rewrites ITS OWN
partition idempotently instead of double-appending; at 100 TB the
store would additionally be bucketed by key so the per-batch anti-join
shuffles only the (small) incoming batch, exactly as d10's docstring
prescribes. Every join keys on the hash/band key; document text never
rides a shuffle past the signature projection.

Reference anchor: extension surface beyond the reference's SQL
boundary (DeletionCriteria.java:40-63); the store lifecycle mirrors
the reference's backup-table lifecycle (BackupManager.java — create,
tag, reuse across runs).
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup

__all__ = ["admit_batch", "read_store", "seed_store",
           "ingest_dedup_stream"]

_EXACT_SCHEMA = "k string"
_MINHASH_SCHEMA = "band_idx int, band_key string"


def _store_schema(mode: str) -> str:
    return _EXACT_SCHEMA if mode == "exact" else _MINHASH_SCHEMA


def read_store(spark: SparkSession, store_dir: str,
               mode: str = "exact") -> DataFrame:
    """The persistent key store, or an empty typed frame before the
    first batch ever commits (a stream normally starts with no store —
    the d10 seed is optional)."""
    try:
        return (spark.read.parquet(store_dir)
                .drop("batch_id"))
    except AnalysisException as e:
        # Only "store not created yet" maps to the empty frame; a
        # corrupt store / permission error must surface, not silently
        # re-admit every duplicate.
        cond = None
        for probe in ("getCondition", "getErrorClass"):
            fn = getattr(e, probe, None)
            if callable(fn):
                try:
                    cond = fn()
                except Exception:
                    cond = None
                if cond:
                    break
        # UNABLE_TO_INFER_SCHEMA is the same "not created yet" state
        # reached differently (round-10 advice): a store_dir that
        # EXISTS but holds no data files — e.g. an empty first
        # micro-batch under dynamic overwrite writes only _SUCCESS —
        # must read as the empty store, not kill the stream.
        if cond in ("PATH_NOT_FOUND", "UNABLE_TO_INFER_SCHEMA") or (
                cond is None and ("PATH_NOT_FOUND" in str(e)
                                  or "UNABLE_TO_INFER_SCHEMA" in str(e))):
            from ..sources.tables import local_frame
            return local_frame(spark, [], _store_schema(mode))
        raise


def seed_store(corpus: DataFrame, store_dir: str, mode: str = "exact",
               text_col: str = "text", id_col: str = "doc_id",
               num_hashes: int = 32, bands: int = 8,
               shingle_size: int = 3) -> None:
    """Write the existing corpus's keys as the store's seed partition
    (batch_id = -1) — the 'precomputed DISTINCT-hash index' d10 anti-
    joins; ingestion never rescans corpus text afterwards."""
    if mode == "exact":
        keys = (corpus.select(F.md5(text_col).alias("k")).distinct())
    else:
        sigs = dedup.minhash_signatures(
            corpus, text_col, id_col, num_hashes, shingle_size)
        keys = (dedup.banded_signatures(sigs, id_col, bands, num_hashes)
                .select("band_idx", "band_key").distinct())
    (keys.withColumn("batch_id", F.lit(-1).cast("long"))
     .write.mode("overwrite").partitionBy("batch_id").parquet(store_dir))


def admit_batch(batch: DataFrame, store: DataFrame,
                mode: str = "exact",
                text_col: str = "text", id_col: str = "doc_id",
                num_hashes: int = 32, bands: int = 8,
                shingle_size: int = 3) -> tuple[DataFrame, DataFrame]:
    """One ingestion step: ``(admitted_ids, new_store_keys)`` for a
    batch against the current store. Pure DataFrame logic — the
    ``foreachBatch`` closure and the batch ladder call THIS, so the
    two forms cannot diverge."""
    if mode == "exact":
        b = batch.select(id_col, F.md5(text_col).alias("k"))
        fresh = b.join(store.hint("shuffle_hash"), "k", "left_anti")
        keeper = (fresh.groupBy("k").agg(F.min(id_col).alias(id_col)))
        admitted = keeper.select(id_col)
        return admitted, keeper.select("k")
    sigs = dedup.minhash_signatures(
        batch, text_col, id_col, num_hashes, shingle_size)
    sigs = sigs.localCheckpoint(eager=False)
    bk = dedup.banded_signatures(sigs, id_col, bands, num_hashes)
    bk = bk.localCheckpoint(eager=False)
    # store probe: ANY band collision rejects the doc
    hit = (bk.join(store.hint("shuffle_hash"),
                   ["band_idx", "band_key"], "left_semi")
           .select(id_col).distinct())
    survivors = (batch.select(id_col)
                 .join(hit, id_col, "left_anti"))
    # in-batch collapse: LSH pair graph over the surviving docs only,
    # min-id survivor per connected component (d15's keeper rule)
    s_sigs = sigs.join(survivors, id_col, "left_semi")
    pairs = dedup.lsh_candidate_pairs(s_sigs, id_col, bands, num_hashes)
    comps = dedup.connected_components(pairs)
    pruned = comps.where(F.col("node") != F.col("component")) \
        .select(F.col("node").alias(id_col))
    admitted = survivors.join(pruned, id_col, "left_anti")
    new_keys = (bk.join(admitted, id_col, "left_semi")
                .select("band_idx", "band_key").distinct())
    return admitted, new_keys


def ingest_dedup_stream(docs: DataFrame, store_dir: str,
                        admitted_dir: str, checkpoint_dir: str,
                        mode: str = "exact",
                        text_col: str = "text", id_col: str = "doc_id",
                        num_hashes: int = 32, bands: int = 8,
                        shingle_size: int = 3):
    """Start the streaming ingest: each micro-batch runs
    :func:`admit_batch` against the store-as-of-now, then commits the
    admitted rows and the new store keys under its OWN batch_id
    partition (dynamic overwrite → idempotent under replay). Returns
    the StreamingQuery; drain with ``processAllAvailable()``."""

    def process(bdf: DataFrame, batch_id: int) -> None:
        spark = bdf.sparkSession
        store = read_store(spark, store_dir, mode)
        admitted, keys = admit_batch(
            bdf, store, mode, text_col, id_col,
            num_hashes, bands, shingle_size)
        # eager checkpoints: both outputs are computed against the
        # store BEFORE this batch's write lands — also breaks the
        # read-from/overwrite-to same-path cycle Spark rejects
        admitted = admitted.localCheckpoint(eager=True)
        keys = keys.localCheckpoint(eager=True)
        # admitted rows land BEFORE the store keys: a crash between the
        # two writes replays against an unchanged store, recomputes the
        # same admitted set, and overwrites it idempotently — keys last
        # means a batch's rows can never be lost to its own keys.
        for frame, path in ((admitted, admitted_dir), (keys, store_dir)):
            (frame.withColumn("batch_id", F.lit(batch_id).cast("long"))
             .write.mode("overwrite")
             .option("partitionOverwriteMode", "dynamic")
             .partitionBy("batch_id").parquet(path))

    return (docs.writeStream.foreachBatch(process)
            .option("checkpointLocation", checkpoint_dir)
            .start())
