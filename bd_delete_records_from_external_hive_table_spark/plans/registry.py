"""Declared-query registry.

Each entry pairs an idiomatic-PySpark DataFrame builder with the ANSI-SQL
oracle DuckDB runs on the same parquet tables (SURVEY §2o). The driver's
correctness gate compares them at sf=0.01 per round: row count + schema +
order-insensitive value hash. Column names are part of the contract — every
computed column is aliased identically on both sides.

Queries with no SQL equivalent (streaming, iterative) register with
``oracle=None`` and get the driver's weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

__all__ = ["QuerySpec", "REGISTRY", "register", "queries", "oracle_sql",
           "FIXED_INPUT"]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, or None → rows-only check


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None):
    """Decorator: add a (spark, sf_dir) -> DataFrame builder to the registry."""
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            # silent overwrite would drop a query from the correctness
            # gate with no error (e.g. a copy-pasted name)
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name, fn, oracle)
        return fn
    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.spark_fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items()
            if spec.oracle is not None}


#: Queries whose input is DELIBERATELY not SF-proportional — a bounded
#: demo panel (capped doc/vec ids, a fixed key set, a bounded graph) —
#: so their bench/scaling rows measure ~constant work beyond the
#: pushed-down scan filter. Scaling tables must flag these rows: an
#: unmarked flat ratio here reads as "scales perfectly" when it
#: actually measures nothing (the round-4 m-series / round-5 e-series
#: lesson). Queries with a fixed QUERY panel but SF-growing corpus
#: (n01–n03, e08) are NOT listed: their work grows linearly with the
#: corpus. Maintained by audit; referential integrity is test-asserted.
FIXED_INPUT: dict[str, str] = {
    # first-100-docs near-dup demo panel (llm_ops._aug_neardup_docs):
    # the all-pairs ORACLE is quadratic, so the demo corpus stays
    # bounded; the operators' scale path is exercised by d01/d02/d14
    # (full corpus) and the banded machinery's recall tests
    "d03_ngram_jaccard_pairs": "first-100-docs near-dup panel",
    "d04_minhash_lsh_neardup": "first-100-docs near-dup panel",
    "d05_simhash_signatures": "first-100-docs panel",
    "d06_dup_clusters": "first-100-docs near-dup panel",
    "d09_simhash_banded_neardup": "first-100-docs near-dup panel",
    "d13_containment_neardup": "first-100-docs near-dup panel",
    "d10_incremental_ingest_dedup": "capped corpus(<400) + batch(400-500)",
    # text-analysis demo panels (bounded doc ids both engines)
    "t01_token_stats": "doc_id<100 panel",
    "t02_quality_scores": "doc_id<100 panel",
    "t03_lang_id": "doc_id<100 panel",
    "t04_fingerprint": "doc_id<100 panel",
    "t05_sentence_split": "doc_id<50 panel",
    "t06_repetition_score": "doc_id<200 panel",
    "t08_contamination_check": "corpus<2000 + bench<500 panels",
    "t09_gopher_quality_flags": "capped doc panels",
    "t10_char_bigram_entropy": "doc_id<100 panel",
    # function-surface demos on bounded slices
    "f06_array_funcs": "vec_id<50 panel",
    "f10_regexp_funcs": "doc_id<100 panel",
    "w02_running_total": "o_custkey<100 (key set SF-invariant)",
    # bounded co-purchase demo graph (g-series docstrings)
    "g01_triangle_count": "bounded demo graph",
    "g02_pagerank": "bounded demo graph",
    # (round 8: d15/d16 moved OFF the fixed panel onto the
    # SF-proportional _aug_full_neardup corpus — their replayed LSH
    # oracles are near-linear, so the driver's sf0.01 check affords
    # the full corpus while sf_scaling rows grow)
    # round-8 calibration report shares d04's panel (same replayed-
    # signature oracle; the estimator curve, not corpus scale, is
    # what it certifies)
    "d18_minhash_calibration": "first-100-docs near-dup panel",
}
