"""Wave-10 operator tests: d17 prefix-filter exactness, t24 chunk
geometry, and (as they land) ml02 classifier invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from bd_delete_records_from_external_hive_table_spark.operators import dedup
from bd_delete_records_from_external_hive_table_spark.plans.llm_ops import (
    DOC_DUP_OFFSET, _aug_full_neardup)
from bd_delete_records_from_external_hive_table_spark.plans.registry import REGISTRY


# ---------------------------------------------------------------------------
# d17: the prefix filter is LOSSLESS — equality vs brute force
# ---------------------------------------------------------------------------

def test_prefix_filter_equals_brute_force(spark, sf_dir):
    corpus = _aug_full_neardup(spark, sf_dir)
    bf = dedup.ngram_jaccard_pairs(corpus, shingle_size=3, threshold=0.6)
    pf = dedup.prefix_filter_jaccard_pairs(corpus, shingle_size=3,
                                           threshold=0.6)
    b = sorted(map(tuple, bf.collect()))
    p = sorted(map(tuple, pf.collect()))
    assert b == p and len(p) > 0


def test_prefix_filter_exact_collapse_expansion(spark, sf_dir):
    """Round-9 exact-collapse ladder: plant EXACT-duplicate families
    (same shingle set, distinct ids) on top of the near-dup corpus and
    assert the collapsed pipeline still equals brute force — the intra-
    family (J=1.0) and cross-family expansion paths both load-bearing,
    which the stock corpus (perturbed copies only) never exercises.

    Round 10 (r9 verdict What's-wrong #1): the fixture was an
    UNORDERED ``.limit(120)`` re-executed per action — each of the
    six jobs could sample a different 120 rows, so the planted
    triangle intermittently missed the bf/pf corpora. Deterministic
    now: orderBy before limit (takeOrdered semantics) + cache, and
    the triangle assertion runs over EVERY planted family, not one
    arbitrary member."""
    corpus = (_aug_full_neardup(spark, sf_dir)
              .orderBy("doc_id").limit(120).cache())
    try:
        fam = corpus.where(F.col("doc_id") % 7 == 0)
        dup1 = fam.withColumn("doc_id", F.col("doc_id") + 10_000_000)
        dup2 = fam.withColumn("doc_id", F.col("doc_id") + 20_000_000)
        aug = corpus.unionByName(dup1).unionByName(dup2)
        bf = dedup.ngram_jaccard_pairs(aug, shingle_size=3,
                                       threshold=0.6)
        pf = dedup.prefix_filter_jaccard_pairs(aug, shingle_size=3,
                                               threshold=0.6)
        b = sorted(map(tuple, bf.collect()))
        p = sorted(map(tuple, pf.collect()))
        assert b == p and len(p) > 0
        # every planted family with a non-empty shingle set (>= 3
        # whitespace tokens -> >= 1 trigram) must appear as a J=1.0
        # triangle; emptier docs never enter the pair space at all
        ids = {r["doc_id"] for r in fam
               .where(F.size(F.filter(F.split("text", r"\s+"),
                                      lambda t: t != "")) >= 3)
               .select("doc_id").collect()}
        assert ids
        pairs = {(a, b): j for a, b, j in p}
        for d in sorted(ids):
            assert pairs.get((d, d + 10_000_000)) == 1.0
            assert pairs.get((d, d + 20_000_000)) == 1.0
            assert pairs.get((d + 10_000_000, d + 20_000_000)) == 1.0
    finally:
        corpus.unpersist()


def test_prefix_filter_finds_every_planted_pair(spark, sf_dir):
    rows = REGISTRY["d17_prefix_filter_jaccard"].spark_fn(
        spark, sf_dir).collect()
    pairs = {(r["a"], r["b"]) for r in rows}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # planted copies differ by 2 appended tokens; only docs long enough
    # for J >= 0.6 are guaranteed hits (n shared 3-gram shingles out of
    # n+2 in the copy: J = n/(n+2) >= 0.6 whenever n >= 3 — i.e. any doc
    # with >= 5 tokens)
    planted = {r["doc_id"] for r in docs
               .where((F.col("doc_id") % 10 == 0) &
                      (F.size(F.split("text", r"\s+")) >= 8))
               .select("doc_id").collect()}
    assert planted, "test corpus lost its planted population"
    for d in planted:
        assert (d, d + DOC_DUP_OFFSET) in pairs


# ---------------------------------------------------------------------------
# t24: chunk geometry invariants
# ---------------------------------------------------------------------------

def test_chunking_covers_every_token_once_per_window(spark, sf_dir):
    rows = REGISTRY["t24_context_chunking"].spark_fn(
        spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_tokens = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id",
            F.size(F.filter(F.split("text", r"\s+"),
                            lambda t: t != "")).alias("n")).collect()}
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # every doc with >= 1 token chunks; none other
    assert set(by_doc) == {d for d, n in n_tokens.items() if n > 0}
    for d, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["chunk_id"])
        n = n_tokens[d]
        # stride geometry: start = 96 * chunk_id, ids contiguous from 0
        assert [c["chunk_id"] for c in chunks] == list(range(len(chunks)))
        for c in chunks:
            assert c["start_tok"] == 96 * c["chunk_id"]
            assert 1 <= c["n_tok"] <= 128
            assert c["n_tok"] == min(128, n - c["start_tok"])
        # full coverage: last chunk reaches the final token
        last = chunks[-1]
        assert last["start_tok"] + last["n_tok"] == n
        # and no start beyond the document
        assert last["start_tok"] < n


# ---------------------------------------------------------------------------
# ml02: independent pure-Python Naive Bayes parity
# ---------------------------------------------------------------------------

def test_naive_bayes_matches_pure_python(spark, sf_dir):
    """The ml02 confusion matrix must equal an independently-written
    single-node NB with the same micro-nat quantization — training
    counts, add-one smoothing, priors, argmax and tie-break all
    replayed in plain Python (third log implementation: C libm via
    math.log, alongside Spark's JVM and DuckDB's std::log)."""
    import math
    import re

    got = {(r["source"], r["pred_source"]): r["n_docs"]
           for r in REGISTRY["ml02_naive_bayes_source"].spark_fn(
               spark, sf_dir).collect()}

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "source", "text").collect()
    # half-UP rounding (Spark/DuckDB ROUND), not Python's half-even;
    # all ln args here are >= 1 so the value is never negative
    qln = lambda x: int(math.floor(math.log(x) * 1_000_000 + 0.5))
    tok = {r["doc_id"]: ([t for t in re.split(r"\s+", r["text"]) if t]
                         if r["text"] is not None else [])
           for r in docs}
    src = {r["doc_id"]: r["source"] for r in docs}
    labels = sorted({s for s in src.values()})
    ctl: dict[tuple, int] = {}
    for d, ts in tok.items():
        for t in ts:
            ctl[(t, src[d])] = ctl.get((t, src[d]), 0) + 1
    t_l = {l: 0 for l in labels}
    for (t, l), c in ctl.items():
        t_l[l] += c
    vn = len({t for t, _ in ctl})
    d_l = {l: 0 for l in labels}
    for d in src.values():
        d_l[d] += 1
    n = len(src)
    conf: dict[tuple, int] = {}
    for d, ts in tok.items():
        scores = {}
        for l in labels:
            s = qln(d_l[l]) - qln(n) - len(ts) * qln(max(t_l[l] + vn, 1))
            s += sum(qln(ctl.get((t, l), 0) + 1) for t in ts)
            scores[l] = s
        pred = min(labels, key=lambda l: (-scores[l], l))
        conf[(src[d], pred)] = conf.get((src[d], pred), 0) + 1
    assert got == conf
    # sanity: the classifier must beat the best-prior baseline by a
    # wide margin (the corpus has ~20 near-uniform sources, so chance
    # is ~5%; a broken score function collapses to the majority prior)
    correct = sum(v for (a, b), v in conf.items() if a == b)
    majority = max(d_l.values())
    assert correct > 2 * majority
    assert sum(conf.values()) == n


def test_prefix_filter_grid_verify_equals_brute_force(spark, sf_dir):
    """Force the theta-join GRID verify path (g > 1) with a tiny cell
    size: the grid must produce exactly the brute-force pair set — the
    path the big corpora take, exercised at smoke scale."""
    corpus = _aug_full_neardup(spark, sf_dir)
    bf = dedup.ngram_jaccard_pairs(corpus, shingle_size=3, threshold=0.6)
    pf = dedup.prefix_filter_jaccard_pairs(
        corpus, shingle_size=3, threshold=0.6,
        grid_cell_elements=2000,   # forces g >> 1 at sf0.001
        verify="grid")             # and pins the grid past the r10
                                   # cost-based auto pick
    assert sorted(map(tuple, bf.collect())) == \
           sorted(map(tuple, pf.collect()))


def test_prefix_filter_full_ladder_equals_broadcast_ladder(
        spark, sf_dir, monkeypatch):
    """Round 11 made the exact-collapse ladder cost-based (identity /
    broadcast / full). Small planted families now take the BROADCAST
    regime, so without this test the FULL ladder (the replica-corpus
    path) would run untested. Pin the cap to 0 so the same planted-dup
    corpus goes through the full ladder, and assert the two regimes
    produce the identical pair set."""
    corpus = (_aug_full_neardup(spark, sf_dir)
              .orderBy("doc_id").limit(60).cache())
    try:
        fam = corpus.where(F.col("doc_id") % 5 == 0)
        aug = corpus.unionByName(
            fam.withColumn("doc_id", F.col("doc_id") + 30_000_000))
        bcast = sorted(map(tuple, dedup.prefix_filter_jaccard_pairs(
            aug, shingle_size=3, threshold=0.6).collect()))
        monkeypatch.setattr(dedup, "_LADDER_BROADCAST_CAP", 0)
        full = sorted(map(tuple, dedup.prefix_filter_jaccard_pairs(
            aug, shingle_size=3, threshold=0.6).collect()))
        assert bcast == full and len(full) > 0
    finally:
        corpus.unpersist()
