"""Round-7 wave-9 operators: fuzzy-dedup survivors, fuzzy
decontamination, duplication profile, forecast backtest, URL rollup,
audio QA and IVF index health.

Oracle-checked queries (d15/d16/t22/ts10/f15) are additionally covered
by the registry-wide parity sweep in test_oracle_parity.py; this module
asserts the SEMANTIC contracts (survivor rules, planted-defect counts,
numpy parity) that a value-hash alone doesn't explain.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from bd_delete_records_from_external_hive_table_spark.functions.text import stable_hash28
from bd_delete_records_from_external_hive_table_spark.operators import similarity
from bd_delete_records_from_external_hive_table_spark.operators.multimodal import (
    audio_quality_stats, synthetic_audio)
from bd_delete_records_from_external_hive_table_spark.plans import REGISTRY


# ---------------------------------------------------------------------------
# m05 / audio QA: planted-defect ground truth
# ---------------------------------------------------------------------------

def test_audio_quality_planted_defects(spark):
    n = 40
    qa = audio_quality_stats(synthetic_audio(spark, n)).collect()
    assert len(qa) == n
    by_id = {r["media_id"]: r for r in qa}
    for i in range(n):
        r = by_id[i]
        assert r["n_samples"] == 160
        if i % 7 == 0:  # driven past full scale → encoder hard-clips
            assert r["is_clipped"] == 1 and r["clip_frac"] > 0
            # encode_wav scales by 32767, decode_wav divides by 32768 →
            # a pinned sample reads 32767/32768, not exactly 1.0
            assert r["peak"] == pytest.approx(32767 / 32768, abs=1e-6)
        elif i % 11 == 0:  # near-silent
            assert r["is_silent"] == 1
            assert r["rms"] < 0.01
        else:  # clean 0.5-amp sine: rms ≈ 0.5/√2, never clipped/silent
            assert r["is_clipped"] == 0 and r["is_silent"] == 0
            assert r["rms"] == pytest.approx(0.5 / np.sqrt(2), rel=0.02)
            assert r["clip_frac"] == 0.0


def test_audio_quality_report_counts(spark, sf_dir):
    row = REGISTRY["m05_audio_quality_report"].spark_fn(
        spark, sf_dir).collect()
    assert len(row) == 1
    r = row[0]
    n = r["n_clips"]
    assert r["clipped_clips"] == sum(1 for i in range(n) if i % 7 == 0)
    assert r["silent_clips"] == sum(
        1 for i in range(n) if i % 7 != 0 and i % 11 == 0)
    assert r["max_peak"] == pytest.approx(1.0, abs=1e-4)


# ---------------------------------------------------------------------------
# e11 / IVF index health: numpy parity
# ---------------------------------------------------------------------------

def test_ivf_bucket_stats_numpy_parity(spark, sf_dir):
    # orderBy before limit + cache: an unordered limit re-executed per
    # action (train / stats / numpy replay are three jobs) could sample
    # three DIFFERENT 300-row corpora (the r9-verdict flake class)
    corpus = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
              .select("vec_id", "embedding")
              .orderBy("vec_id").limit(300).cache())
    cent = similarity.train_ivf_centroids(corpus, nlist=8)
    got = {r["bucket"]: r for r in
           similarity.ivf_bucket_stats(corpus, cent).collect()}

    x = np.asarray([r["embedding"] for r in corpus.collect()],
                   dtype=np.float64)
    sims = x @ cent.astype(np.float64).T
    best = np.argmax(sims, axis=1)
    top = sims[np.arange(len(x)), best]
    for b in np.unique(best):
        member = top[best == b]
        assert got[int(b)]["n_vecs"] == int((best == b).sum())
        assert got[int(b)]["mean_sim"] == pytest.approx(
            round(float(member.mean()), 4), abs=1e-4)
        assert got[int(b)]["min_sim"] == pytest.approx(
            round(float(member.min()), 4), abs=1e-4)
    assert set(got) == {int(b) for b in np.unique(best)}


# ---------------------------------------------------------------------------
# d15 / fuzzy-dedup survivors: survivor-rule contract
# ---------------------------------------------------------------------------

def test_fuzzy_dedup_survivor_rule(spark, sf_dir):
    rows = REGISTRY["d15_fuzzy_dedup_survivors"].spark_fn(
        spark, sf_dir).collect()
    assert rows, "panel plants near-dup pairs at every SF"
    # exactly one survivor per component
    per_comp: dict[int, list] = {}
    for r in rows:
        per_comp.setdefault(r["component"], []).append(r)
    for comp, members in per_comp.items():
        assert sum(m["is_survivor"] for m in members) == 1
        # every member's component is the min doc_id in the cluster
        assert comp == min(m["doc_id"] for m in members)
    # survivor is the longest text (tie → min doc_id): planted copies
    # append ' zq zq' to the base doc, so the copy (+DOC_DUP_OFFSET) wins
    from bd_delete_records_from_external_hive_table_spark.plans.llm_ops import DOC_DUP_OFFSET
    planted = {r["component"]: r for r in rows
               if r["doc_id"] >= DOC_DUP_OFFSET and r["is_survivor"] == 1}
    assert planted, "planted longer copies must win keep-best"


# ---------------------------------------------------------------------------
# d16 / fuzzy decontamination: split-side contract
# ---------------------------------------------------------------------------

def test_fuzzy_decontamination_sides(spark, sf_dir):
    rows = REGISTRY["d16_fuzzy_decontamination"].spark_fn(
        spark, sf_dir).collect()
    # reported docs are all on the corpus side of the deterministic
    # split, and every reported match is at/above the 0.5 threshold
    ids = [r["corpus_doc"] for r in rows]
    if not ids:
        pytest.skip("no cross-split near-dup at this SF (hash-dependent)")
    side = (spark.createDataFrame([(i,) for i in ids], "doc_id: long")
            .select("doc_id",
                    (stable_hash28(F.col("doc_id").cast("string")) % 100)
                    .alias("b")).collect())
    assert all(r["b"] < 70 for r in side)
    assert all(r["max_jaccard"] >= 0.5 for r in rows)
    assert all(r["n_bench_matches"] >= 1 for r in rows)


# ---------------------------------------------------------------------------
# t22 / duplication profile: internal-consistency vs d14's per-doc stats
# ---------------------------------------------------------------------------

def test_duplication_profile_consistency(spark, sf_dir):
    from bd_delete_records_from_external_hive_table_spark.operators import dedup

    prof = {r["source"]: r for r in
            REGISTRY["t22_duplication_profile"].spark_fn(
                spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rep = dedup.repeated_kgram_doc_stats(docs, k=8, min_docs=2) \
        .join(docs.select("doc_id", "source"), "doc_id") \
        .groupBy("source").agg(F.sum("n_rep_grams").alias("s")).collect()
    rep_by_source = {r["source"]: r["s"] for r in rep}
    for src, row in prof.items():
        assert row["total_rep_grams"] == rep_by_source.get(src, 0)
        assert 0.0 <= row["dup_share"] <= 1.0
        assert row["high_dup_docs"] <= row["gram_docs"]


# ---------------------------------------------------------------------------
# m06 / image QA: planted-defect ground truth
# ---------------------------------------------------------------------------

def test_image_quality_planted_defects(spark):
    from bd_delete_records_from_external_hive_table_spark.operators.multimodal import (
        image_quality_stats, synthetic_images_qa)

    n = 45
    qa = image_quality_stats(synthetic_images_qa(spark, n)).collect()
    assert len(qa) == n
    by_id = {r["media_id"]: r for r in qa}
    for i in range(n):
        r = by_id[i]
        assert r["n_pixels"] == 64
        if i % 5 == 0:  # solid color: exact zero contrast
            assert r["is_solid"] == 1
            assert r["contrast"] == 0.0
        elif i % 9 == 0:  # overexposed: ≥80% of pixels at 250+
            assert r["is_solid"] == 0
            assert r["is_overexposed"] == 1
            assert r["overexp_frac"] >= 0.8
        else:
            assert r["is_solid"] == 0 and r["is_overexposed"] == 0


def test_image_quality_report_counts(spark, sf_dir):
    row = REGISTRY["m06_image_quality_report"].spark_fn(
        spark, sf_dir).collect()
    assert len(row) == 1
    r = row[0]
    n = r["n_images"]
    assert r["solid_images"] == sum(1 for i in range(n) if i % 5 == 0)
    assert r["overexposed_images"] == sum(
        1 for i in range(n) if i % 5 != 0 and i % 9 == 0)


# ---------------------------------------------------------------------------
# e12 / snapshot drift: structural contract
# ---------------------------------------------------------------------------

def test_snapshot_drift_structure(spark, sf_dir):
    rows = REGISTRY["e12_embedding_snapshot_drift"].spark_fn(
        spark, sf_dir).collect()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    per_label = {r["label"]: r["n"] for r in
                 emb.groupBy("label").count()
                 .withColumnRenamed("count", "n").collect()}
    got_labels = {r["label"] for r in rows}
    # every label with members in BOTH halves appears exactly once
    assert len(rows) == len(got_labels)
    for r in rows:
        assert r["n_a"] + r["n_b"] == per_label[r["label"]]
        assert -1.0 <= r["drift_cos"] <= 1.0


# ---------------------------------------------------------------------------
# sa04 / weighted sample: exact pandas recompute
# ---------------------------------------------------------------------------

def test_weighted_sample_exact(spark, sf_dir):
    import hashlib

    got = {r["source"]: r for r in
           REGISTRY["sa04_weighted_sample"].spark_fn(
               spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "source", "n_chars").toPandas()

    def h28(s):  # the shared 28-bit md5 bucket
        return int(hashlib.md5(str(s).encode()).hexdigest()[:7], 16)

    docs["kept"] = [
        int(h28(d) % 2000 < c)
        for d, c in zip(docs["doc_id"], docs["n_chars"])]
    for src, g in docs.groupby("source"):
        assert got[src]["n_kept"] == int(g["kept"].sum())
        assert got[src]["kept_chars"] == int(
            (g["kept"] * g["n_chars"]).sum())
    # the weighting property: kept docs are longer on average
    total_kept = docs[docs["kept"] == 1]
    if len(total_kept):
        assert total_kept["n_chars"].mean() >= docs["n_chars"].mean()


# ---------------------------------------------------------------------------
# f16 / IP classification: exact pandas recompute
# ---------------------------------------------------------------------------

def test_ip_classification_exact(spark, sf_dir):
    got = {r["event_type"]: r for r in
           REGISTRY["f16_ip_classification"].spark_fn(
               spark, sf_dir).collect()}
    from bd_delete_records_from_external_hive_table_spark.sources.tables import load_table
    ev = load_table(spark, sf_dir, "events") \
        .select("event_type", "user_id").toPandas()
    u = ev["user_id"].astype("int64")
    o1 = u % 223 + 1
    o2 = (u // 7) % 256
    private = (o1 == 10) | ((o1 == 172) & o2.between(16, 31)) \
        | ((o1 == 192) & (o2 == 168))
    ev["cls"] = np.where(private, "private",
                         np.where(o1 == 127, "loopback", "public"))
    for et, g in ev.groupby("event_type"):
        assert got[et]["n_events"] == len(g)
        assert got[et]["n_private"] == int((g["cls"] == "private").sum())
        assert got[et]["n_loopback"] == int(
            (g["cls"] == "loopback").sum())
        assert got[et]["n_public"] == int((g["cls"] == "public").sum())


# ---------------------------------------------------------------------------
# t23 / bigram CE: structural sanity
# ---------------------------------------------------------------------------

def test_bigram_ce_sanity(spark, sf_dir):
    rows = REGISTRY["t23_bigram_ce_filter"].spark_fn(
        spark, sf_dir).collect()
    assert rows
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    per_source = {r["source"]: r["n"] for r in
                  docs.groupBy("source").count()
                  .withColumnRenamed("count", "n").collect()}
    for r in rows:
        # cross-entropy of a smoothed LM is strictly positive, and only
        # docs with ≥2 tokens are scored
        assert r["avg_ce"] > 0
        assert 0 < r["n_docs"] <= per_source[r["source"]]


def test_bigram_ce_one_token_doc_population(spark, tmp_path):
    """Round-7 ADVICE regression: a doc with exactly ONE alphabetic
    token has no bigram positions but WOULD shift the unigram counts
    and vocab size if either engine trained the LM on it while the
    other didn't (the generated corpus's 10-token minimum kept this
    divergence latent). Plant 1-token and 0-token docs and assert the
    Spark plan and the DuckDB oracle still agree exactly."""
    import duckdb

    rows = [(0, "web", "the cat sat on the mat"),
            (1, "web", "zzz"),            # 1 token: no bigrams
            (2, "lab", "the cat sat the cat"),
            (3, "lab", "123 !!!")]        # 0 alphabetic tokens
    d = str(tmp_path)
    (spark.createDataFrame(rows, "doc_id long, source string, text string")
     .coalesce(1).write.parquet(f"{d}/documents.parquet"))
    spec = REGISTRY["t23_bigram_ce_filter"]
    got = {r.source: (r.n_docs, r.avg_ce)
           for r in spec.spark_fn(spark, d).collect()}
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{d}/documents.parquet/*.parquet')")
    want = {r[0]: (r[1], r[2]) for r in con.sql(spec.oracle).fetchall()}
    con.close()
    assert got == want
    assert set(got) == {"web", "lab"}     # 1-/0-token docs not scored
    assert got["web"][0] == 1 and got["lab"][0] == 1


# ---------------------------------------------------------------------------
# ml01 / quality classifier: numpy parity + recovered rule
# ---------------------------------------------------------------------------

def test_quality_classifier_irls(spark, sf_dir):
    from bd_delete_records_from_external_hive_table_spark.operators.mlfit import (
        classifier_report, logistic_regression_irls,
        numpy_reference_irls, standardize_features,
        text_quality_features)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    raw = text_quality_features(docs).localCheckpoint()
    feats, _mu, _sd = standardize_features(raw, dim=5)
    feats = feats.localCheckpoint()
    w = logistic_regression_irls(feats, dim=5, iters=6)

    pdf = feats.toPandas()
    x = np.asarray(list(pdf["features"]), dtype=np.float64)
    y = pdf["label"].to_numpy(dtype=np.float64)
    w_ref = numpy_reference_irls(x, y, iters=6)
    # identical recurrence; drift = partition-order float sums + JVM vs
    # numpy exp ulps, compounding over 6 Newton steps
    assert np.allclose(w, w_ref, rtol=1e-4, atol=1e-6), (w, w_ref)

    rep = classifier_report(feats, w).collect()[0]
    assert rep["tp"] + rep["tn"] + rep["fp"] + rep["fn"] == rep["n_docs"]
    acc = (rep["tp"] + rep["tn"]) / rep["n_docs"]
    assert acc >= 0.97, f"classifier failed to recover planted rule: {acc}"
    assert rep["mean_logloss"] > 0


def test_quality_classifier_gd_parity(spark, sf_dir):
    # the first-order variant stays correct too (10 rounds suffice to
    # prove the distributed gradient aggregate equals the numpy one)
    from bd_delete_records_from_external_hive_table_spark.operators.mlfit import (
        logistic_regression_gd, numpy_reference_gd,
        standardize_features, text_quality_features)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    raw = text_quality_features(docs).localCheckpoint()
    feats, _mu, _sd = standardize_features(raw, dim=5)
    feats = feats.localCheckpoint()
    w = logistic_regression_gd(feats, dim=5, lr=1.0, iters=10)
    pdf = feats.toPandas()
    x = np.asarray(list(pdf["features"]), dtype=np.float64)
    y = pdf["label"].to_numpy(dtype=np.float64)
    w_ref = numpy_reference_gd(x, y, lr=1.0, iters=10)
    assert np.allclose(w, w_ref, rtol=1e-5, atol=1e-7), (w, w_ref)


def test_quality_classifier_report_query(spark, sf_dir):
    row = REGISTRY["ml01_quality_classifier"].spark_fn(
        spark, sf_dir).collect()
    assert len(row) == 1
    r = row[0]
    assert r["n_docs"] > 0
    assert r["tp"] + r["tn"] + r["fp"] + r["fn"] == r["n_docs"]


# ---------------------------------------------------------------------------
# ts10 / seasonal-naive backtest: pandas recompute parity
# ---------------------------------------------------------------------------

def test_seasonal_backtest_pandas_parity(spark, sf_dir):
    got = REGISTRY["ts10_seasonal_naive_backtest"].spark_fn(
        spark, sf_dir).toPandas()
    assert len(got) > 0
    ev = spark.read.parquet(f"{sf_dir}/events.parquet") \
        .select("event_type", "ts", "value").toPandas()
    ev["d"] = ev["ts"].dt.floor("D")
    daily = (ev.groupby(["event_type", "d"])["value"].sum()
             .round(2).mul(100).round(0).astype("int64").reset_index(
                 name="total_c"))
    daily = daily.sort_values(["event_type", "d"])
    daily["naive"] = daily.groupby("event_type")["total_c"].shift(1)
    daily["snaive"] = daily.groupby("event_type")["total_c"].shift(7)
    d = daily.dropna(subset=["snaive"]).copy()
    d["month"] = d["d"].dt.strftime("%Y-%m")
    agg = d.groupby(["event_type", "month"]).apply(
        lambda g: pd.Series({
            "n_days": len(g),
            "sae_naive": int(abs(g["total_c"] - g["naive"]).sum()),
            "sae_snaive": int(abs(g["total_c"] - g["snaive"]).sum())}),
        include_groups=False).reset_index()
    m = got.merge(agg, on=["event_type", "month"], suffixes=("", "_pd"))
    assert len(m) == len(got) == len(agg)
    assert (m["n_days"] == m["n_days_pd"]).all()
    assert (m["sae_naive"] == m["sae_naive_pd"]).all()
    assert (m["sae_snaive"] == m["sae_snaive_pd"]).all()


# ---------------------------------------------------------------------------
# f15 / URL rollup: parse_url semantics spot-check
# ---------------------------------------------------------------------------

def test_url_rollup_hosts(spark, sf_dir):
    rows = REGISTRY["f15_url_host_rollup"].spark_fn(
        spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sources = {r["source"] for r in docs.select("source").distinct()
               .collect()}
    assert {r["host"] for r in rows} == {f"{s}.example.com"
                                         for s in sources}
    n_docs = docs.count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    for r in rows:
        assert 1 <= r["n_refs"] <= 5
        assert r["n_paths"] <= r["n_docs"]
