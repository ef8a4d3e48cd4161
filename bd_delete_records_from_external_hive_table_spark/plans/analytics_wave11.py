"""Eleventh-wave queries (round 8): whole-corpus distributed k-means
training, stratified quota sampling, and exact-integer TF-IDF keyword
extraction.

- ml03 distributed k-means — the unsupervised member of the
  training-as-aggregates family (ml01 IRLS, ml02 NB): Lloyd's where
  every iteration is one Arrow assignment pass plus ONE map-side-
  combined INTEGER aggregate. Round 9 made the WHOLE pipeline exact
  integer arithmetic (2^-20 quantize → int64 argmin assignment →
  truncating-div update, hash28 init), so the iterated fixpoint
  replays in DuckDB as unrolled MATERIALIZED CTEs and ml03 is
  VALUE-HASH ORACLED (the g02-PageRank move; closes the last
  `no_oracle` driver row from round 8). This is the full-fidelity
  complement of the sample-trained IVF quantizer: use it when
  centroids ARE the product (cluster reports, curricula, mixture
  weights), not just a bucketing. Pure-Python parity +
  repartition-invariance are test-asserted.
- sa05 stratified quota sampling — exactly min(quota, |stratum|) docs
  per source, chosen by the 28-bit content-independent hash rank
  (s05's split hash, so the sample is reproducible forever and
  engine-exact). The curation move behind "N examples per domain for
  eval/annotation"; one window over hash-ranked rows per stratum,
  never a global sort. Value-hash oracled.
- t25 TF-IDF keyword extraction — top-5 terms per source by summed
  tf x idf, with idf quantized to integer micro-nats BEFORE the
  multiply (ml02's trick), so scores are exact BIGINTs and the ranking
  can never flip on float summation order. The which-terms-define-
  this-slice view a mixture report is built from. Value-hash oracled.

Reference anchor: widens the declared-query surface admitted by the
reference's SQL boundary (DeletionCriteria.java:40-63), same as waves
1-10; ml03 composes the reference's driver-orchestration shape
(HiveTableDeletionJob.java:87-160 — driver loop, cluster aggregate per
step).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import stable_hash28
from ..operators import similarity
from .analytics_wave13 import _wide_floor_div
from ..sources.tables import load_table
from .llm_ops import _DUCK_HASH28, _corpus_rows
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# ml03: distributed k-means (whole-corpus training as aggregates)
# ---------------------------------------------------------------------------

#: embeddings table vector width (TESTDATA.md schema — fixed, like
#: d18's 32 signature slots) and the exact trainer's iteration count
_ML03_DIM = 64
_ML03_ITERS = 5


def _ml03_oracle() -> str:
    """Unrolled per-iteration Lloyd's as DuckDB CTEs — the g02-PageRank
    move applied to k-means: because kmeans_fit_exact is integer-exact
    end-to-end (quantize → int64 argmin assignment → truncating-div
    update), a fixed iteration count unrolls to plain SQL that lands
    on the SAME fixpoint bit-for-bit. nlist replays coarse_nlist() as
    a scalar subquery so the oracle tracks the corpus-scaled cluster
    count at any SF. Every CTE is MATERIALIZED: DuckDB inlines
    plain CTEs, and an iteration chain re-inlined per reference is
    exponential in iters (the un-hinted form OOMed)."""
    s = similarity.KMEANS_EXACT_SCALE
    dims = range(1, _ML03_DIM + 1)
    qx = ", ".join(
        f"CAST(FLOOR(CAST(embedding[{j}] AS DOUBLE) * {s}.0 + 0.5) "
        f"AS BIGINT)" for j in dims)
    d2 = " + ".join(f"(x.q[{j}]-c.m[{j}])*(x.q[{j}]-c.m[{j}])"
                    for j in dims)
    sums = ", ".join(f"SUM(x.q[{j}])" for j in dims)
    upd = ", ".join(f"CAST(s.s[{j}] // s.n AS BIGINT)" for j in dims)
    auto = "GREATEST(16, COUNT(*) // 128)"
    parts = [
        f"p AS MATERIALIZED (SELECT CASE WHEN {auto} <= 4096 THEN {auto} "
        f"ELSE GREATEST(2, LEAST(4096, CAST(CEIL(SQRT(CAST({auto} "
        f"AS DOUBLE))) AS BIGINT))) END AS nlist FROM embeddings)",
        f"qx AS MATERIALIZED (SELECT vec_id, [{qx}] AS q FROM embeddings)",
        "ini AS MATERIALIZED (SELECT ROW_NUMBER() OVER (ORDER BY hk, vec_id) - 1 "
        "AS cluster, q AS m FROM (SELECT vec_id, q, "
        + _DUCK_HASH28.format("CAST(vec_id AS VARCHAR)")
        + " AS hk FROM qx))",
        "c0 AS MATERIALIZED (SELECT cluster, m FROM ini "
        "WHERE cluster < (SELECT nlist FROM p))",
    ]
    for i in range(_ML03_ITERS):
        parts += [
            f"b{i} AS MATERIALIZED (SELECT vec_id, cluster FROM (SELECT x.vec_id, "
            f"c.cluster, ROW_NUMBER() OVER (PARTITION BY x.vec_id "
            f"ORDER BY ({d2}), c.cluster) AS rn "
            f"FROM qx x CROSS JOIN c{i} c) WHERE rn = 1)",
            f"s{i} AS MATERIALIZED (SELECT b.cluster, COUNT(*) AS n, [{sums}] AS s "
            f"FROM b{i} b JOIN qx x USING (vec_id) GROUP BY b.cluster)",
            f"c{i + 1} AS MATERIALIZED (SELECT c.cluster, CASE WHEN s.n IS NULL "
            f"THEN c.m ELSE [{upd}] END AS m "
            f"FROM c{i} c LEFT JOIN s{i} s USING (cluster))",
        ]
    final = (
        f"bf AS MATERIALIZED (SELECT vec_id, cluster, d2 FROM (SELECT x.vec_id, "
        f"c.cluster, ({d2}) AS d2, ROW_NUMBER() OVER (PARTITION BY "
        f"x.vec_id ORDER BY ({d2}), c.cluster) AS rn "
        f"FROM qx x CROSS JOIN c{_ML03_ITERS} c) WHERE rn = 1) "
        "SELECT CAST(cluster AS BIGINT) AS cluster, "
        "CAST(COUNT(*) AS BIGINT) AS n_vecs, "
        "CAST(SUM(CAST(d2 AS HUGEINT)) // COUNT(*) AS BIGINT) "
        "AS mean_d2, "
        "CAST(MAX(d2) AS BIGINT) AS max_d2 "
        "FROM bf GROUP BY cluster ORDER BY cluster")
    return "WITH " + ", ".join(parts) + ", " + final


@register("ml03_kmeans_training", _ml03_oracle())
def ml03(spark, sf_dir):
    """Whole-corpus k-means (similarity.kmeans_fit_exact) + the
    per-cluster health report — now VALUE-HASH ORACLED (round-8
    verdict item 3): the trainer runs Lloyd's in exact integer
    arithmetic (2^-20 fixed-point quantization, int64 argmin
    assignment, truncating-div centroid update, hash28 init), so the
    whole iterated fixpoint replays in DuckDB as unrolled CTEs —
    exactly how g02 oracled PageRank. Unlike n03/e09's sample-trained
    coarse quantizer, every vector contributes to every update — the
    trainer to reach for when cluster quality is the deliverable. Per
    iteration the corpus reduces to ~partitions x nlist integer
    partial rows (cluster, quantized component sums, count),
    map-side-combined to nlist x dim longs on the driver — no vector
    ever shuffles, and the integer sums make the fit bit-deterministic
    under ANY partitioning AND any engine (repartition-invariance and
    pure-Python parity are test-asserted in tests/test_wave11.py).
    Cluster count scales with the corpus (similarity.coarse_nlist —
    driver state stays nlist x dim; past the flat cap the hierarchy
    takes over exactly as in e09). Report: per cluster, member count,
    truncated mean and max squared quantized distance — BALANCE and
    QUANTIZATION quality in exact BIGINTs (mean widens through
    DECIMAL(38,0)/HUGEINT internally — the g03 overflow class — since
    Σd2 passes 2^63 near 32k worst-case members per cluster)."""
    n = _corpus_rows(spark, sf_dir, "embeddings")
    corpus = (_t(spark, sf_dir, "embeddings")
              .select("vec_id", "embedding"))
    nlist = similarity.coarse_nlist(n)
    qcent = similarity.kmeans_fit_exact(corpus, nlist=nlist,
                                        iters=_ML03_ITERS, rows_hint=n)
    per = similarity.kmeans_assign_exact(corpus, qcent)
    mean_d2 = _wide_floor_div(
        F.sum(F.col("d2").cast("decimal(38,0)")),
        F.count(F.lit(1)).cast("decimal(38,0)"))
    return (per.groupBy(F.col("cluster").cast("long").alias("cluster"))
            .agg(F.count(F.lit(1)).alias("n_vecs"),
                 mean_d2.cast("long").alias("mean_d2"),
                 F.max("d2").alias("max_d2"))
            .coalesce(1).orderBy("cluster"))


# ---------------------------------------------------------------------------
# sa05: stratified quota sampling (hash-ranked, engine-exact)
# ---------------------------------------------------------------------------

_SA05_QUOTA = 20

@register("sa05_stratified_sample",
          "WITH h AS (SELECT doc_id, source, "
          + _DUCK_HASH28.format("CAST(doc_id AS VARCHAR)")
          + " AS hk FROM documents), "
          "r AS (SELECT doc_id, source, ROW_NUMBER() OVER ("
          "  PARTITION BY source ORDER BY hk, doc_id) AS rk FROM h) "
          f"SELECT source, doc_id, CAST(rk AS BIGINT) AS rk "
          f"FROM r WHERE rk <= {_SA05_QUOTA} ORDER BY source, rk")
def sa05(spark, sf_dir):
    """Stratified quota sample: exactly min(quota, |stratum|) documents
    per source, ranked by the content-independent 28-bit id hash (the
    s05 split hash — both engines replay it, so the chosen set is
    identical forever: re-running the pipeline next month yields the
    SAME eval panel). Scale shape: rank is a per-stratum window over
    (hash, id) — partitions by source, never a global sort — and only
    quota rows per stratum survive, so output is |sources| x quota at
    any SF. Hash-rank sampling is the standard reproducible-subset
    trick (vs rand(), which changes with partitioning and retries)."""
    docs = _t(spark, sf_dir, "documents")
    w = (Window.partitionBy("source")
         .orderBy(stable_hash28(F.col("doc_id").cast("string")),
                  "doc_id"))
    return (docs.select("source", "doc_id",
                        F.row_number().over(w).cast("long").alias("rk"))
            .where(F.col("rk") <= _SA05_QUOTA)
            .coalesce(1).orderBy("source", "rk"))


# ---------------------------------------------------------------------------
# t25: TF-IDF keyword extraction (integer micro-nat scores)
# ---------------------------------------------------------------------------

#: idf in integer micro-nats (ml02's _QLN shape): ln of a ratio of
#: exact integers, rounded to 1e-6 before the tf multiply — scores
#: become exact BIGINTs, so per-source ranking is order-independent
#: and cross-engine exact (libm risk confined to ln() landing within
#: one ulp of a 0.5-micro-nat boundary on identical double inputs).
_T25_K = 5

@register("t25_tfidf_keywords",
          "WITH tok AS (SELECT doc_id, source, "
          "  list_filter(string_split_regex(lower(text), '[^a-z]+'), "
          "  t -> t <> '') AS ts FROM documents), "
          "tp AS (SELECT doc_id, source, unnest(ts) AS w FROM tok), "
          "n AS (SELECT COUNT(DISTINCT doc_id) AS nd FROM tp), "
          "dfreq AS (SELECT w, COUNT(DISTINCT doc_id) AS df "
          "  FROM tp GROUP BY w), "
          "tf AS (SELECT source, w, COUNT(*) AS c FROM tp "
          "  GROUP BY source, w), "
          "sc AS (SELECT tf.source, tf.w, CAST(tf.c * "
          "  CAST(ROUND(ln(CAST(n.nd AS DOUBLE) / dfreq.df) * 1000000, "
          "  0) AS BIGINT) AS BIGINT) AS score_q "
          "  FROM tf JOIN dfreq USING (w), n), "
          "rk AS (SELECT source, w, score_q, ROW_NUMBER() OVER ("
          "  PARTITION BY source ORDER BY score_q DESC, w) AS rk "
          "  FROM sc) "
          f"SELECT source, w AS term, score_q, CAST(rk AS BIGINT) AS rk "
          f"FROM rk WHERE rk <= {_T25_K} ORDER BY source, rk")
def t25(spark, sf_dir):
    """Per-source TF-IDF keywords: the top-5 terms that distinguish
    each corpus slice — Σ(term count) x idf with idf = ln(N/df)
    quantized to integer micro-nats BEFORE the multiply, so every
    score is an exact BIGINT and the top-k can never flip on float
    order (ml02's micro-nat argmax, one rank down). Scale shape: ONE
    tokenize feeds both the document-frequency aggregate (map-side
    combine on the vocab) and the per-source term counts; the scoring
    join is dictionary-keyed; the final window ranks |sources| x vocab
    slices, each pruned to k rows. The corpus never re-tokenizes and
    text bytes never shuffle — (term, count) pairs do."""
    docs = _t(spark, sf_dir, "documents")
    ts = F.filter(F.split(F.lower("text"), "[^a-z]+"),
                  lambda t: t != F.lit(""))
    tp = (docs.select("doc_id", "source", F.explode(ts).alias("w"))
          .localCheckpoint(eager=False))
    nd = tp.agg(F.countDistinct("doc_id").alias("nd"))
    dfreq = tp.groupBy("w").agg(F.countDistinct("doc_id").alias("df"))
    tf = tp.groupBy("source", "w").agg(F.count(F.lit(1)).alias("c"))
    idf_q = F.round(
        F.log(F.col("nd").cast("double") / F.col("df")) * 1000000.0,
        0).cast("long")
    # shuffle_hash: tf and dfreq are both VOCABULARY-sized — they grow
    # with the corpus, and the checkpoint upstream strips the stats
    # (the executed plan broadcast one side; PLANS.md phantom-broadcast
    # rule). The 1-row nd frame keeps its broadcast — SF-invariant.
    sc = (tf.join(dfreq.hint("shuffle_hash"), "w")
          .crossJoin(F.broadcast(nd))
          .select("source", "w",
                  (F.col("c") * idf_q).cast("long").alias("score_q")))
    w_rk = (Window.partitionBy("source")
            .orderBy(F.desc("score_q"), "w"))
    return (sc.withColumn("rk", F.row_number().over(w_rk).cast("long"))
            .where(F.col("rk") <= _T25_K)
            .select("source", F.col("w").alias("term"), "score_q", "rk")
            .coalesce(1).orderBy("source", "rk"))
