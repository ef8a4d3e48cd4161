"""Wave-11 operator tests: ml03 distributed k-means (numpy parity,
partitioning invariance), sa05 stratified quota sample, t25 TF-IDF
keywords. Oracle-checked queries (sa05/t25) are additionally covered by
the registry-wide parity sweep; this module asserts the SEMANTIC
contracts a value-hash alone doesn't explain."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from bd_delete_records_from_external_hive_table_spark.functions.text import stable_hash28
from bd_delete_records_from_external_hive_table_spark.operators import similarity
from bd_delete_records_from_external_hive_table_spark.plans import REGISTRY
from bd_delete_records_from_external_hive_table_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# ml03 / distributed k-means: numpy parity + partitioning invariance
# ---------------------------------------------------------------------------

def _hash_init(spark, corpus, nlist):
    rows = (corpus.select("embedding",
                          F.xxhash64("vec_id").alias("_h"))
            .orderBy("_h").limit(nlist).collect())
    cent = np.asarray([r["embedding"] for r in rows], dtype=np.float64)
    return cent / np.linalg.norm(cent, axis=1, keepdims=True)


def test_kmeans_distributed_numpy_parity(spark, sf_dir):
    """The distributed fit must reproduce the single-node reference
    EXACTLY (same quantization, same init, same update rule) — the
    integer fixed-point sums make partial aggregation order
    irrelevant, so there is no tolerance here, only equality."""
    emb = load_table(spark, sf_dir, "embeddings") \
        .select("vec_id", "embedding")
    got = similarity.kmeans_fit_distributed(emb, nlist=8, iters=4)
    x = np.asarray([r.embedding for r in
                    emb.orderBy("vec_id").collect()], dtype=np.float64)
    want = similarity.numpy_reference_kmeans(
        x, _hash_init(spark, emb, 8), iters=4)
    assert got.shape == want.shape == (8, x.shape[1])
    np.testing.assert_array_equal(got, want)


def test_kmeans_distributed_partitioning_invariant(spark, sf_dir):
    """Bit-identical centroids regardless of how the corpus is
    partitioned — the property float partial sums cannot give (their
    result depends on task arrival order) and the reason the update
    aggregates 2^-40 fixed-point integers."""
    emb = load_table(spark, sf_dir, "embeddings") \
        .select("vec_id", "embedding")
    c1 = similarity.kmeans_fit_distributed(emb, nlist=8, iters=3)
    c2 = similarity.kmeans_fit_distributed(emb.repartition(7), nlist=8,
                                           iters=3)
    c3 = similarity.kmeans_fit_distributed(emb.repartition(1), nlist=8,
                                           iters=3)
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_array_equal(c1, c3)


def test_kmeans_training_query_report(spark, sf_dir):
    rows = REGISTRY["ml03_kmeans_training"].spark_fn(
        spark, sf_dir).collect()
    assert rows
    n = load_table(spark, sf_dir, "embeddings").count()
    assert sum(r.n_vecs for r in rows) == n     # every vector bucketed
    for r in rows:
        assert 0 <= r.mean_d2 <= r.max_d2
        # normalized vectors: ||x-c||^2 <= 4 -> d2 <= 4*scale^2 (+slack)
        assert r.max_d2 <= 5 * similarity.KMEANS_EXACT_SCALE ** 2


# ---------------------------------------------------------------------------
# ml03 / EXACT k-means: pure-Python parity + partitioning invariance
# ---------------------------------------------------------------------------

def _exact_init(spark, corpus, nlist):
    rows = (corpus.select(
        "embedding",
        stable_hash28(F.col("vec_id").cast("string")).alias("_h"),
        F.col("vec_id").alias("_i"))
        .orderBy("_h", "_i").limit(nlist).collect())
    import math
    s = float(similarity.KMEANS_EXACT_SCALE)
    return [[math.floor(float(v) * s + 0.5) for v in r["embedding"]]
            for r in rows]


def test_kmeans_exact_python_parity(spark, sf_dir):
    """The exact trainer must reproduce the pure-Python replay
    BIT-FOR-BIT — quantize, argmin assignment, truncating update are
    all integer, so there is no tolerance, only equality. (The DuckDB
    unrolled-CTE oracle is the third engine on the same contract.)"""
    emb = load_table(spark, sf_dir, "embeddings") \
        .select("vec_id", "embedding")
    got = similarity.kmeans_fit_exact(emb, nlist=8, iters=3)
    x = np.asarray([r.embedding for r in
                    emb.orderBy("vec_id").collect()], dtype=np.float64)
    want = similarity.python_reference_kmeans_exact(
        x, _exact_init(spark, emb, 8), iters=3)
    assert got == want


def test_kmeans_exact_partitioning_invariant(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings") \
        .select("vec_id", "embedding")
    c1 = similarity.kmeans_fit_exact(emb, nlist=8, iters=2)
    c2 = similarity.kmeans_fit_exact(emb.repartition(7), nlist=8,
                                     iters=2)
    c3 = similarity.kmeans_fit_exact(emb.repartition(1), nlist=8,
                                     iters=2)
    assert c1 == c2 == c3


def test_trunc_div_matches_duckdb_semantics():
    """_trunc_div == DuckDB BIGINT // and Spark div (truncate toward
    zero), NOT Python // (floor) — the divergence ADVICE.md flagged
    for the Flesch class is structurally excluded here."""
    import duckdb
    cases = [(7, 2), (-7, 2), (7, -2), (-7, -2), (0, 3), (-1, 5),
             (10**17 + 7, 13), (-(10**17 + 7), 13)]
    for a, b in cases:
        want = duckdb.sql(
            f"SELECT CAST({a} AS BIGINT) // CAST({b} AS BIGINT)"
        ).fetchone()[0]
        assert similarity._trunc_div(a, b) == want, (a, b)


# ---------------------------------------------------------------------------
# sa05 / stratified sample: quota + reproducibility contract
# ---------------------------------------------------------------------------

def test_stratified_sample_quota_and_determinism(spark, sf_dir):
    from bd_delete_records_from_external_hive_table_spark.plans.analytics_wave11 import _SA05_QUOTA

    rows = REGISTRY["sa05_stratified_sample"].spark_fn(
        spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    per_source = {r["source"]: r["n"] for r in
                  docs.groupBy("source").count()
                  .withColumnRenamed("count", "n").collect()}
    got: dict[str, list] = {}
    for r in rows:
        got.setdefault(r.source, []).append((r.rk, r.doc_id))
    for src, members in got.items():
        assert len(members) == min(_SA05_QUOTA, per_source[src])
        assert sorted(rk for rk, _ in members) == list(
            range(1, len(members) + 1))
    # the chosen set is exactly the quota smallest (hash, id) per
    # stratum — reproducible forever, independent of partitioning
    hashed = docs.select(
        "source", "doc_id",
        stable_hash28(F.col("doc_id").cast("string")).alias("h")) \
        .collect()
    want: dict[str, list] = {}
    for r in hashed:
        want.setdefault(r.source, []).append((r.h, r.doc_id))
    for src, members in got.items():
        expect = [d for _, d in sorted(want[src])[:_SA05_QUOTA]]
        assert [d for _, d in sorted(members)] == expect


# ---------------------------------------------------------------------------
# t25 / TF-IDF keywords: rank + score contracts
# ---------------------------------------------------------------------------

def test_tfidf_keywords_contract(spark, sf_dir):
    from bd_delete_records_from_external_hive_table_spark.plans.analytics_wave11 import _T25_K

    rows = REGISTRY["t25_tfidf_keywords"].spark_fn(
        spark, sf_dir).collect()
    assert rows
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    for src, members in by_src.items():
        assert [m.rk for m in sorted(members, key=lambda m: m.rk)] == \
            list(range(1, len(members) + 1))
        assert len(members) <= _T25_K
        # scores are non-increasing in rank, ties broken by term asc
        ordered = sorted(members, key=lambda m: m.rk)
        for a, b in zip(ordered, ordered[1:]):
            assert (a.score_q, b.term) >= (b.score_q, a.term)
        # a term present in EVERY doc has idf 0 and can never rank
        # above a term with positive idf unless all scores are 0
        assert all(m.score_q >= 0 for m in members)


def test_exact_assign_f64_path_equals_int64_path():
    """Round-11: _exact_assign routes through float64 dgemm when every
    intermediate provably fits 2^53 (the ml03 N²/128 fix). The fast
    path must be BIT-IDENTICAL to the int64 fallback — assignment,
    ties (first-occurrence = smallest cluster id), and reported d2 —
    including planted exact-tie rows and the 2^20 quantization scale's
    actual magnitude. Also pins the guard: inputs past the bound take
    the int64 path and still agree where both are exact."""
    import numpy as np

    from bd_delete_records_from_external_hive_table_spark.operators import similarity as sim

    rng = np.random.default_rng(7)
    q = np.floor(rng.normal(0, 0.12, (3000, 64)) * 2**20 + 0.5) \
        .astype(np.int64)
    qm = np.floor(rng.normal(0, 0.12, (200, 64)) * 2**20 + 0.5) \
        .astype(np.int64)
    # plant exact ties: duplicate centroids (same distance to every
    # row) and rows equal to a centroid (d2 = 0 vs two candidates)
    qm[37] = qm[11]
    qm[199] = qm[0]
    q[5] = qm[11]
    q[6] = qm[0]

    def int64_ref(q, qm):
        xx = np.einsum("ij,ij->i", q, q)
        cc = np.einsum("ij,ij->i", qm, qm)
        d2 = xx[:, None] - 2 * (q @ qm.T) + cc[None, :]
        a = np.argmin(d2, axis=1)
        return a, d2[np.arange(len(q)), a]

    a_ref, d_ref = int64_ref(q, qm)
    a_got, d_got = sim._exact_assign(q, qm)
    assert np.array_equal(a_ref, a_got)
    assert np.array_equal(d_ref, d_got)
    # tie rows resolved to the SMALLEST cluster id
    assert a_got[5] == 11 and a_got[6] == 0
    assert d_got[5] == 0 and d_got[6] == 0
    # guard: magnitudes past the f64-exact bound fall back to int64
    big = (q[:64] * 0 + (1 << 22))
    bigm = (qm[:8] * 0 + (1 << 22))
    a_big, d_big = sim._exact_assign(big, bigm)
    a_bigref, d_bigref = int64_ref(big, bigm)
    assert np.array_equal(a_big, a_bigref)
    assert np.array_equal(d_big, d_bigref)
    # empty input contract
    a0, d0 = sim._exact_assign(np.empty((0, 64), np.int64), qm)
    assert len(a0) == 0 and len(d0) == 0
