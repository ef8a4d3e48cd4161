"""Ninth-wave queries (round 7): the fuzzy-dedup pipeline completed
end-to-end, split decontamination at the NEAR-dup level, corpus-wide
duplication profiling, forecast backtesting, URL curation, audio QA and
vector-index health — the remaining day-2 operations of a training-data
pipeline.

- d15 fuzzy-dedup survivors — the FULL fuzzy-dedup pass every LLM
  corpus pipeline actually ships (Dolma/SlimPajama shape, public):
  MinHash-LSH candidates → exact-Jaccard verify → connected components
  → keep-best survivor per cluster (longest text, tie min id). d04
  stops at pairs and d06 at cluster sizes; d15 emits the per-document
  keep/drop verdict — the pipeline's actionable output. The DuckDB
  oracle replays the ENTIRE pipeline (d04's shared permutation
  constants + banding, d06's recursive-CTE closure, a window for the
  survivor), so the driver hash-checks the deliverable itself.
- d16 fuzzy decontamination — t08 (exact 5-gram overlap) and s08
  (exact content hash) both miss lightly-edited benchmark leakage; d16
  runs the MinHash-LSH join ACROSS an s05-style deterministic hash
  split and reports, per corpus-side doc, how many benchmark-side docs
  it near-duplicates (GPT-3's fuzzy-dedup decontamination, Brown et
  al. 2020 Appendix C, public). Same replayed-pipeline oracle as d04.
- t22 corpus duplication profile — d14's per-doc repeated-8-gram stats
  rolled up per SOURCE over the whole corpus (zero-rep docs come from
  the gram pipeline's own totals aggregate via include_all=True — the
  corpus never tokenizes a third time):
  the "which slice of my mixture is internally duplicated" view that
  decides which source gets the aggressive dedup pass. All memberships
  integer cross-multiplied; the share is a reported 4-dp value.
- ts10 seasonal-naive forecast backtest — per event type and month,
  the MAE of the lag-7 (seasonal-naive) forecast vs the lag-1 (naive)
  forecast over the daily revenue series, in EXACT integer cents
  (ts06's quantization); `skill` < 1 ⇔ weekly seasonality is real and
  a seasonal model is worth shipping — the MASE denominator logic
  (Hyndman & Koehler 2006, public) as a query.
- f15 URL host rollup — parse_url(HOST/PATH/QUERY-key) over
  deterministic synthetic URLs + per-host rollup: the web-corpus
  curation entry step (domain whitelists, per-domain caps). The oracle
  re-parses the same strings with independent regexes, so Spark's
  parse_url semantics are what's being certified.
- m05 audio QA rollup — real WAV decode → per-clip RMS/peak/clip-
  fraction in one Arrow pass → corpus QA report, with DETERMINISTIC
  planted defects (every 7th clip hard-clipped, every remaining 11th
  near-silent) making the counts provable at every corpus size.
  Rows-only: binary decode has no SQL form; planted-truth parity is
  test-asserted.
- e11 IVF index health — per-bucket member count + member↔centroid
  cosine for the corpus-scaled coarse quantizer: the balance /
  quantization-quality report that decides when an ANN index (n03,
  e10) needs retraining. Rows-only (trained quantizer, same as n03);
  numpy parity is test-asserted.

Reference anchor: widens the declared-query surface admitted by the
reference's SQL boundary (DeletionCriteria.java:40-63) as waves 1-8 do;
d15/d16 compose the same primitives as the reference's
identify→verify→act workflow (HiveTableDeletionJob.java:87-160) —
identify candidates cheaply, verify exactly, then act per row group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import stable_hash28
from ..operators import dedup, similarity
from ..operators.multimodal import audio_quality_stats, synthetic_audio
from ..sources.tables import load_table
from .llm_ops import (_AUG_FULL_NEARDUP, _D04_BANDS, _D04_SIG_ELEMS,
                      _DUCK_HASH28, _DUCK_SHINGLES3, _DUCK_TOKENS,
                      _aug_full_neardup, _corpus_rows, media_corpus_n)
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# shared oracle fragment: the full MinHash-LSH verified-pair pipeline
# (d04's chain, reused verbatim so every fuzzy-dedup oracle replays the
# IDENTICAL deterministic pipeline — same shingle hash, permutations,
# banding, integer-cross-multiply threshold) — over the
# SF-PROPORTIONAL corpus (round 7 ran d15/d16 on the fixed 100-doc
# panel; the replayed pipeline is near-linear, so the oracle affords
# the full corpus at the driver's sf0.01 while sf_scaling rows grow)
# ---------------------------------------------------------------------------
_LSH_PAIRS_CTES = (
    f"aug AS ({_AUG_FULL_NEARDUP}), "
    f"sh AS (SELECT doc_id, {_DUCK_SHINGLES3} AS s FROM "
    f"(SELECT doc_id, {_DUCK_TOKENS} AS ts FROM aug)), "
    "hs AS (SELECT doc_id, list_transform(s, x -> "
    + _DUCK_HASH28.format("x") + ") AS h FROM sh), "
    f"sig AS (SELECT doc_id, [{_D04_SIG_ELEMS}] AS sig FROM hs), "
    f"banded AS ({_D04_BANDS}), "
    "cands AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b "
    "FROM banded x JOIN banded y ON x.band_idx = y.band_idx "
    "AND x.band_key = y.band_key AND x.doc_id < y.doc_id), "
    "pairs AS (SELECT c.a, c.b, "
    "ROUND(len(list_intersect(sa.s, sb.s))::DOUBLE / "
    "GREATEST(len(list_distinct(list_concat(sa.s, sb.s))), 1), 4) "
    "AS jaccard "
    "FROM cands c JOIN sh sa ON sa.doc_id = c.a "
    "JOIN sh sb ON sb.doc_id = c.b "
    "WHERE len(list_intersect(sa.s, sb.s)) * 10000 >= "
    "GREATEST(len(list_distinct(list_concat(sa.s, sb.s))), 1) * 5000)")


@register("d15_fuzzy_dedup_survivors",
          "WITH RECURSIVE " + _LSH_PAIRS_CTES + ", "
          "und AS (SELECT a AS src, b AS dst FROM pairs "
          "UNION SELECT b, a FROM pairs), "
          "reach AS (SELECT src, dst FROM und UNION "
          "SELECT r.src, u.dst FROM reach r JOIN und u ON r.dst = u.src "
          "WHERE r.src != u.dst), "
          "lab AS (SELECT src AS node, LEAST(src, MIN(dst)) AS component "
          "FROM reach GROUP BY src) "
          "SELECT lab.node AS doc_id, lab.component, "
          "CAST(CASE WHEN ROW_NUMBER() OVER (PARTITION BY lab.component "
          "ORDER BY length(a.text) DESC, lab.node) = 1 "
          "THEN 1 ELSE 0 END AS BIGINT) AS is_survivor "
          "FROM lab JOIN aug a ON a.doc_id = lab.node "
          "ORDER BY component, doc_id")
def d15(spark, sf_dir):
    """End-to-end fuzzy-dedup pass: MinHash-LSH verified pairs (d04's
    exact pipeline) → connected components (pointer-doubling min-label)
    → KEEP-BEST survivor per cluster (longest text wins, min doc_id
    breaks ties — d07's survivor rule lifted from exact to fuzzy
    clusters). Emits the per-document keep/drop verdict for every
    clustered doc — the actionable output a curation pipeline feeds to
    its filter stage; singletons survive by absence. Runs on the
    SF-PROPORTIONAL planted-near-dup corpus (_aug_full_neardup — the
    whole documents table plus perturbed copies of every 10th doc), so
    bench/scaling rows measure the composite on a corpus that actually
    grows; the replayed oracle is near-linear (banded LSH, not brute
    force), so the driver's sf0.01 check stays affordable. Scale
    shape: the pair join is band-key-bucketed (never doc×doc),
    components converge in O(log diameter) label rounds, and the
    survivor window partitions by component — cluster-sized groups, no
    global sort. The oracle replays the identical pipeline (shared
    permutation constants + recursive-CTE closure), so LSH misses and
    all are engine-identical by construction."""
    # checkpoint: the LSH pipeline + the survivor-length join are
    # multiple consumers — without materialization each re-derives the
    # union from the text scan (the d10 lesson; the fixed panel's
    # builder checkpointed for the same reason)
    aug = _aug_full_neardup(spark, sf_dir).localCheckpoint(eager=False)
    pairs = dedup.minhash_near_duplicates(
        aug, num_hashes=32, bands=8, shingle_size=3, threshold=0.5)
    comps = dedup.connected_components(pairs)
    lens = aug.select(F.col("doc_id").alias("node"),
                      F.length("text").alias("_len"))
    w = Window.partitionBy("component").orderBy(F.desc("_len"), "node")
    # shuffle_hash: lens is a corpus-growing projection of the
    # checkpointed union (no stats -> the executed plan broadcast it)
    return (comps.join(lens.hint("shuffle_hash"), "node")
            .select(F.col("node").alias("doc_id"), "component",
                    (F.row_number().over(w) == 1).cast("long")
                    .alias("is_survivor"))
            .orderBy("component", "doc_id"))


_D16_SPLIT = ("CASE WHEN " + _DUCK_HASH28.format("CAST(doc_id AS VARCHAR)")
              + " % 100 < 70 THEN 'corpus' ELSE 'benchmark' END")


@register("d16_fuzzy_decontamination",
          "WITH " + _LSH_PAIRS_CTES + ", "
          f"sp AS (SELECT doc_id, {_D16_SPLIT} AS split FROM aug), "
          "px AS (SELECT p.a AS corpus_doc, p.b AS bench_doc, p.jaccard "
          "FROM pairs p JOIN sp sa ON sa.doc_id = p.a "
          "JOIN sp sb ON sb.doc_id = p.b "
          "WHERE sa.split = 'corpus' AND sb.split = 'benchmark' "
          "UNION ALL SELECT p.b, p.a, p.jaccard "
          "FROM pairs p JOIN sp sa ON sa.doc_id = p.a "
          "JOIN sp sb ON sb.doc_id = p.b "
          "WHERE sa.split = 'benchmark' AND sb.split = 'corpus') "
          "SELECT corpus_doc, CAST(COUNT(*) AS BIGINT) AS n_bench_matches, "
          "MAX(jaccard) AS max_jaccard "
          "FROM px GROUP BY corpus_doc ORDER BY corpus_doc")
def d16(spark, sf_dir):
    """Fuzzy benchmark decontamination: MinHash-LSH near-dup join ACROSS
    a deterministic hash split (70% corpus / 30% benchmark — s05's
    content-independent 28-bit-md5 bucket, so the split is reproducible
    forever). Corpus docs that near-duplicate any benchmark doc at
    Jaccard ≥ 0.5 are the leakage exact decontamination (s08, t08)
    provably misses — a lightly-edited eval question shares no content
    hash and few exact 5-grams, but most shingles. Runs on the
    SF-PROPORTIONAL corpus (_aug_full_neardup, d15's rationale). Scale
    shape: ONE LSH pipeline over the union (the split is a projected
    column, not two pipelines), candidates band-bucketed, cross-split
    filtering on the verified pairs. The oracle replays the full
    pipeline with the shared constants, so the reported contamination
    set is engine-exact."""
    aug = _aug_full_neardup(spark, sf_dir).localCheckpoint(eager=False)
    pairs = dedup.minhash_near_duplicates(
        aug, num_hashes=32, bands=8, shingle_size=3, threshold=0.5)
    # round 11 (guide §2.4 — remove shuffles outright): the split is a
    # PURE FUNCTION of doc_id (28-bit md5 bucket), so it is computed
    # INLINE on the pair's own columns instead of joining the pair
    # frame back to a split projection of the corpus — the old shape
    # paid two shuffle-hash joins (pairs by a, then by b) to attach a
    # value each row could derive in codegen. Same expression as the
    # oracle's sp CTE, engine-exact.
    def _split(col):
        return F.when(stable_hash28(F.col(col).cast("string")) % 100 < 70,
                      "corpus").otherwise("benchmark")
    j = pairs.select("a", "b", "jaccard",
                     _split("a").alias("split_a"),
                     _split("b").alias("split_b"))
    cross = (j.where((F.col("split_a") == "corpus")
                     & (F.col("split_b") == "benchmark"))
             .select(F.col("a").alias("corpus_doc"), "jaccard")
             .unionByName(
                 j.where((F.col("split_a") == "benchmark")
                         & (F.col("split_b") == "corpus"))
                 .select(F.col("b").alias("corpus_doc"), "jaccard")))
    return (cross.groupBy("corpus_doc")
            .agg(F.count(F.lit(1)).alias("n_bench_matches"),
                 F.max("jaccard").alias("max_jaccard"))
            .orderBy("corpus_doc"))


@register("t22_duplication_profile",
          "WITH tok AS (SELECT doc_id, source, "
          f"  {_DUCK_TOKENS} AS ts FROM documents), "
          "g AS (SELECT doc_id, "
          "  unnest([array_to_string(ts[i:i+7], ' ') "
          "          for i in range(1, len(ts) - 6)]) AS gram FROM tok), "
          "gd AS (SELECT gram, doc_id, COUNT(*) AS occ "
          "  FROM g GROUP BY gram, doc_id), "
          "shg AS (SELECT gram FROM gd GROUP BY gram "
          "  HAVING COUNT(*) >= 2), "
          "rep AS (SELECT doc_id, SUM(occ) AS n_rep "
          "  FROM gd JOIN shg USING (gram) GROUP BY doc_id), "
          "base AS (SELECT doc_id, source, CASE WHEN ts IS NULL THEN 0 "
          "  ELSE GREATEST(len(ts) - 7, 0) END AS n_grams FROM tok), "
          "per AS (SELECT b.source, b.n_grams, "
          "  COALESCE(r.n_rep, 0) AS n_rep "
          "  FROM base b LEFT JOIN rep r USING (doc_id) "
          "  WHERE b.n_grams > 0) "
          "SELECT source, "
          "CAST(COUNT(*) AS BIGINT) AS gram_docs, "
          "CAST(COUNT(*) FILTER (n_rep * 5 >= n_grams) "
          "  AS BIGINT) AS high_dup_docs, "
          "CAST(SUM(n_grams) AS BIGINT) AS total_grams, "
          "CAST(SUM(n_rep) AS BIGINT) AS total_rep_grams, "
          "ROUND(CAST(SUM(n_rep) AS DOUBLE) "
          "  / GREATEST(SUM(n_grams), 1), 4) AS dup_share "
          "FROM per GROUP BY source ORDER BY source")
def t22(spark, sf_dir):
    """Corpus duplication profile per SOURCE: d14's cross-document
    repeated-8-gram machinery rolled up to the mixture-design view —
    how many of each source's docs are ≥20% built from cross-document
    repeated spans (``high_dup_docs``, Lee et al.'s dedup-decision
    signal) and what fraction of all gram positions are repeats
    (``dup_share``). d14 answers "which docs"; t22 answers "which
    SOURCE needs the aggressive dedup pass". Scale shape: the rep
    counts ride dedup.repeated_kgram_doc_stats' sort-free gram-keyed
    aggregates (grams travel as xxhash64); ``include_all=True`` returns
    the zero-rep population from the totals aggregate the pipeline
    already computes, so the corpus text tokenizes exactly twice (the
    gram pipeline's two passes) — never a third time for a base scan
    (measured: dropping the separate size(tokens) base join took sf0.1
    warm from 2.34 s to ~1.9 s). Only (doc_id, source) joins in from the raw
    table — a column-pruned scan with no string compute. The ≥20%
    membership is an integer cross-multiply (n_rep*5 >= n_grams); only
    dup_share is a reported float. Profiled over docs WITH ≥1 gram
    position (identical totals: zero-gram docs contribute nothing to
    any sum)."""
    docs = _t(spark, sf_dir, "documents")
    rep = dedup.repeated_kgram_doc_stats(docs, k=8, min_docs=2,
                                         include_all=True) \
        .withColumnRenamed("n_rep_grams", "n_rep")
    per = rep.join(docs.select("doc_id", "source"), "doc_id")
    return (per.groupBy("source")
            .agg(F.count(F.lit(1)).alias("gram_docs"),
                 F.sum((F.col("n_rep") * 5 >= F.col("n_grams"))
                       .cast("long")).cast("long").alias("high_dup_docs"),
                 F.sum("n_grams").cast("long").alias("total_grams"),
                 F.sum("n_rep").cast("long").alias("total_rep_grams"),
                 F.round(F.sum("n_rep").cast("double")
                         / F.greatest(F.sum("n_grams"), F.lit(1)), 4)
                 .alias("dup_share"))
            .coalesce(1).orderBy("source"))


@register("ts10_seasonal_naive_backtest",
          "WITH daily AS (SELECT event_type, date_trunc('day', ts) AS d, "
          "  CAST(ROUND(SUM(value) * 100, 0) AS BIGINT) AS total_c "
          "  FROM events GROUP BY event_type, date_trunc('day', ts)), "
          "lagged AS (SELECT event_type, d, total_c, "
          "  LAG(total_c, 1) OVER w AS naive_c, "
          "  LAG(total_c, 7) OVER w AS snaive_c "
          "  FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY d)) "
          "SELECT event_type, strftime(d, '%Y-%m') AS month, "
          "CAST(COUNT(*) AS BIGINT) AS n_days, "
          "CAST(SUM(ABS(total_c - naive_c)) AS BIGINT) AS sae_naive, "
          "CAST(SUM(ABS(total_c - snaive_c)) AS BIGINT) AS sae_snaive, "
          "ROUND(CAST(SUM(ABS(total_c - snaive_c)) AS DOUBLE) "
          "  / GREATEST(SUM(ABS(total_c - naive_c)), 1), 4) AS skill "
          "FROM lagged WHERE snaive_c IS NOT NULL "
          "GROUP BY event_type, month ORDER BY event_type, month")
def ts10(spark, sf_dir):
    """Seasonal-naive forecast backtest per (event type, month): compare
    the lag-7 forecast (same weekday last week) against the lag-1
    naive forecast over the daily revenue series — ``skill`` < 1 means
    weekly seasonality genuinely predicts (the MASE numerator/
    denominator logic, Hyndman & Koehler 2006), and it's the go/no-go
    gate before shipping any seasonal model (ts05's decomposition) to
    production. All error sums are EXACT integer cents (ts06's
    quantization) so months can never reorder on float noise; skill is
    a reported 4-dp ratio. Scale shape: one fact scan → calendar-
    bounded daily rollup; both lags ride ONE event-type-keyed window
    sort; the monthly regroup is map-side over a few hundred rows."""
    ev = _t(spark, sf_dir, "events")
    daily = (ev.groupBy("event_type", F.date_trunc("day", "ts").alias("d"))
             .agg(F.round(F.sum("value") * 100, 0).cast("bigint")
                  .alias("total_c")))
    w = Window.partitionBy("event_type").orderBy("d")
    lagged = daily.select(
        "event_type", "d", "total_c",
        F.lag("total_c", 1).over(w).alias("naive_c"),
        F.lag("total_c", 7).over(w).alias("snaive_c"))
    err_n = F.abs(F.col("total_c") - F.col("naive_c"))
    err_s = F.abs(F.col("total_c") - F.col("snaive_c"))
    return (lagged.where(F.col("snaive_c").isNotNull())
            .groupBy("event_type",
                     F.date_format("d", "yyyy-MM").alias("month"))
            .agg(F.count(F.lit(1)).alias("n_days"),
                 F.sum(err_n).cast("long").alias("sae_naive"),
                 F.sum(err_s).cast("long").alias("sae_snaive"),
                 F.round(F.sum(err_s).cast("double")
                         / F.greatest(F.sum(err_n), F.lit(1)), 4)
                 .alias("skill"))
            .coalesce(1).orderBy("event_type", "month"))


_F15_URL = ("'https://' || source || '.example.com/' || "
            "COALESCE(lang, 'und') || '/' || CAST(doc_id AS VARCHAR) "
            "|| '?ref=r' || CAST(doc_id % 5 AS VARCHAR)")


@register("f15_url_host_rollup",
          f"WITH u AS (SELECT {_F15_URL} AS url FROM documents), "
          "p AS (SELECT "
          "  regexp_extract(url, 'https://([^/]+)/', 1) AS host, "
          "  regexp_extract(url, 'https://[^/]+(/[^?]*)', 1) AS path, "
          "  regexp_extract(url, 'ref=(.*)$', 1) AS ref FROM u) "
          "SELECT host, CAST(COUNT(*) AS BIGINT) AS n_docs, "
          "CAST(COUNT(DISTINCT path) AS BIGINT) AS n_paths, "
          "CAST(COUNT(DISTINCT ref) AS BIGINT) AS n_refs "
          "FROM p GROUP BY host ORDER BY host")
def f15(spark, sf_dir):
    """URL parsing + per-host rollup — the entry step of web-corpus
    curation (domain whitelists, per-domain document caps, URL-level
    dedup keys). URLs are built DETERMINISTICALLY from (source, lang,
    doc_id) so both engines parse identical strings; the Spark side
    uses the real ``parse_url`` (HOST / PATH / QUERY-key extraction —
    the production codepath for crawled URLs) while the oracle
    re-parses with independent regexes, so parse_url's semantics are
    what gets certified. One scan, map-side string codegen; the
    distinct-counts group on |hosts| keys (the source cardinality)."""
    docs = _t(spark, sf_dir, "documents")
    url = F.concat(F.lit("https://"), F.col("source"),
                   F.lit(".example.com/"),
                   F.coalesce(F.col("lang"), F.lit("und")),
                   F.lit("/"), F.col("doc_id").cast("string"),
                   F.lit("?ref=r"), (F.col("doc_id") % 5).cast("string"))
    parsed = docs.select(
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("ref")).alias("ref"))
    return (parsed.groupBy("host")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.countDistinct("path").alias("n_paths"),
                 F.countDistinct("ref").alias("n_refs"))
            .coalesce(1).orderBy("host"))


@register("m05_audio_quality_report", None)  # binary decode: no SQL oracle
def m05(spark, sf_dir):
    """Audio QA report over an SF-proportional WAV corpus with planted
    defects: real PCM16 decode → per-clip RMS / peak / clip-fraction in
    ONE Arrow pass (operators/multimodal.py:audio_quality_stats; 7
    scalars per clip leave Python, payloads never re-serialize) →
    one-row corpus verdict. Every 7th clip is driven past full scale
    (encoder hard-clips → decoded PCM pins at ±32767, detected in the
    exact INTEGER domain) and every remaining 11th is near-silent, so
    ``clipped_clips``/``silent_clips`` are provable counts at every
    corpus size (test-asserted), not eyeballed statistics. Rows-only:
    binary decode has no SQL form (same class as m01-m04)."""
    corpus = synthetic_audio(spark, media_corpus_n(spark, sf_dir))
    qa = audio_quality_stats(corpus)
    return qa.agg(
        F.count(F.lit(1)).alias("n_clips"),
        F.sum("is_clipped").cast("long").alias("clipped_clips"),
        F.sum("is_silent").cast("long").alias("silent_clips"),
        F.round(F.avg("rms"), 4).alias("mean_rms"),
        F.round(F.max("peak"), 4).alias("max_peak"),
        F.round(F.avg("clip_frac"), 4).alias("mean_clip_frac"))


@register("t23_bigram_ce_filter",
          "WITH tok AS (SELECT * FROM (SELECT doc_id, source, "
          "  list_filter(string_split_regex(lower(text), '[^a-z]+'), "
          "  t -> t <> '') AS ts FROM documents) WHERE len(ts) >= 2), "
          "uni AS (SELECT unnest(ts) AS w FROM tok), "
          "ulm AS (SELECT w, COUNT(*) AS c1 FROM uni GROUP BY w), "
          "v AS (SELECT COUNT(*) AS vsz FROM ulm), "
          "bg AS (SELECT doc_id, source, "
          "  unnest(ts[1:len(ts)-1]) AS w1, unnest(ts[2:len(ts)]) AS w2 "
          "  FROM tok WHERE len(ts) >= 2), "
          "blm AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg "
          "  GROUP BY w1, w2), "
          "sc AS (SELECT doc_id, source, "
          "  -ln((c12 + 1.0) / (c1 + vsz)) AS ce "
          "  FROM bg JOIN blm USING (w1, w2) "
          "  JOIN ulm ON ulm.w = bg.w1, v), "
          "pd AS (SELECT doc_id, ANY_VALUE(source) AS source, "
          "  AVG(ce) AS dce FROM sc GROUP BY doc_id) "
          "SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, "
          "ROUND(AVG(dce), 4) AS avg_ce "
          "FROM pd GROUP BY source ORDER BY source")
def t23(spark, sf_dir):
    """Bigram-LM cross-entropy per source — t14's CCNet-style LM quality
    filter upgraded one n-gram order: add-one-smoothed p(w2|w1) trained
    on the corpus itself, each doc scored as mean −ln p over its bigram
    positions, rolled up per source (the which-slice-reads-like-noise
    mixture view; KenLM-filter shape, Wenzek et al. 2020, public).
    Scale shape: ONE tokenize feeds bigram generation; the bigram LM
    and unigram LM are dictionary-sized aggregates; the scoring join is
    dictionary-keyed (stopword-skewed — AQE skew-split territory); the
    vocab size is a 1-row broadcast. Per-term libm drift is ~1e-15 on
    O(1-10) values — invisible at the final 4-dp rounding (t14's
    adjudication). Docs with <2 tokens have no bigram positions; both
    engines EXPLICITLY drop them before the LM counts too (Spark's
    ``size(ts) >= 2`` filter precedes ulm/vsz; the oracle's tok CTE
    carries the same ``len(ts) >= 2``), so the unigram counts and
    vocab size are trained on the identical population — a 1-token doc
    would otherwise shift every smoothed denominator on one engine
    only (the round-7 ADVICE latent divergence)."""
    docs = _t(spark, sf_dir, "documents")
    ts = F.filter(F.split(F.lower("text"), "[^a-z]+"),
                  lambda t: t != F.lit(""))
    tok = (docs.select("doc_id", "source", ts.alias("ts"))
           .where(F.size("ts") >= 2)
           .localCheckpoint(eager=False))
    uni = tok.select(F.explode("ts").alias("w"))
    ulm = uni.groupBy("w").agg(F.count(F.lit(1)).alias("c1"))
    vsz = ulm.agg(F.count(F.lit(1)).alias("vsz"))
    bg = tok.select(
        "doc_id", "source",
        F.explode(F.transform(
            F.sequence(F.lit(1), F.size("ts") - 1),
            lambda i: F.struct(
                F.element_at("ts", i).alias("w1"),
                F.element_at("ts", i + 1).alias("w2")))).alias("b")) \
        .select("doc_id", "source", "b.w1", "b.w2")
    # round 11 (the ml02 lesson, guide §2.3): collapse bigram
    # OCCURRENCES to per-doc (w1, w2, k) counts before the dictionary
    # joins — the LM join and the per-doc aggregate then carry distinct
    # (doc, bigram) rows instead of every position, and blm derives
    # from the already-collapsed frame. The per-doc mean becomes the
    # weighted form Σk·ce / Σk over the same multiset of ce values —
    # numerically within libm-ulp territory of the occurrence sum, far
    # inside the 4-dp rounding the docstring already adjudicates
    # (oracle re-MATCHed at sf0.001/sf0.01/sfedge).
    # BOUNDARY RISK (r11 advice, the ts05 class): Σk·ce sums the same
    # multiset in a DIFFERENT order than the oracle's per-occurrence
    # AVG, so avg_ce could in principle land within half an ulp of a
    # 0.5e-4 rounding boundary and flip the 4th decimal on one engine
    # only. Certified SFs re-MATCHed; if a future SF trips it, the
    # exact fix is ml02/t25's micro-unit integer quantization of ce
    # BEFORE the k-multiply (order-free integer sums) — adopted on
    # evidence, not preemptively, because it changes the declared
    # output hash.
    bgc = (bg.groupBy("doc_id", "source", "w1", "w2")
           .agg(F.count(F.lit(1)).alias("k"))
           .localCheckpoint(eager=False))
    blm = bgc.groupBy("w1", "w2").agg(F.sum("k").alias("c12"))
    ce = -F.log((F.col("c12") + F.lit(1.0))
                / (F.col("c1") + F.col("vsz")))
    per_doc = (bgc.join(blm, ["w1", "w2"])
               .join(ulm.withColumnRenamed("w", "w1"), "w1")
               .crossJoin(F.broadcast(vsz))
               .groupBy("doc_id")
               .agg(F.first("source").alias("source"),
                    (F.sum(F.col("k") * ce) / F.sum("k")).alias("dce")))
    return (per_doc.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.round(F.avg("dce"), 4).alias("avg_ce"))
            .coalesce(1).orderBy("source"))


_E12_SPLIT = ("CASE WHEN " + _DUCK_HASH28.format("CAST(vec_id AS VARCHAR)")
              + " % 100 < 50 THEN 'a' ELSE 'b' END")


@register("e12_embedding_snapshot_drift",
          f"WITH sp AS (SELECT vec_id, label, {_E12_SPLIT} AS half, "
          "  embedding FROM embeddings), "
          "comp AS (SELECT label, half, pos, "
          "  CAST(SUM(CAST(FLOOR(CAST(v AS DOUBLE) * 10000) AS BIGINT)) "
          "    AS DECIMAL(19,0)) AS iq FROM ("
          "  SELECT label, half, UNNEST(embedding) AS v, "
          "         generate_subscripts(embedding, 1) AS pos "
          "  FROM sp) x GROUP BY label, half, pos), "
          "cnt AS (SELECT label, half, CAST(COUNT(*) AS BIGINT) AS n "
          "  FROM sp GROUP BY label, half), "
          "j AS (SELECT a.label, a.iq AS ia, b.iq AS ib FROM comp a "
          "  JOIN comp b ON a.label = b.label AND a.pos = b.pos "
          "  WHERE a.half = 'a' AND b.half = 'b'), "
          "d AS (SELECT label, CAST(SUM(ia * ib) AS DOUBLE) AS dot, "
          "  CAST(SUM(ia * ia) AS DOUBLE) AS na, "
          "  CAST(SUM(ib * ib) AS DOUBLE) AS nb FROM j GROUP BY label) "
          "SELECT d.label AS label, ca.n AS n_a, cb.n AS n_b, "
          "ROUND(dot / (SQRT(na) * SQRT(nb)), 4) AS drift_cos "
          "FROM d JOIN cnt ca ON ca.label = d.label AND ca.half = 'a' "
          "JOIN cnt cb ON cb.label = d.label AND cb.half = 'b' "
          "ORDER BY d.label")
def e12(spark, sf_dir):
    """Embedding snapshot drift per label: split the corpus into two
    deterministic hash halves (stand-ins for yesterday's and today's
    snapshot) and report the cosine between each label's half-A and
    half-B centroids — the embedding-pipeline regression check (a
    retrained encoder or a poisoned ingest shows up as drift_cos well
    below 1 for affected labels; stable pipelines sit ≈1 because both
    halves sample the same distribution). e04's determinism trick, tightened: each
    component quantizes to FLOOR(v·1e4) whose integer sums are
    order-free (float centroid AVGs vary in their last bits with
    partition order) AND small enough that every downstream integer
    (iq², dots, norms) stays below 2^53 at certification SFs — the
    decimal→double conversion is then EXACT on both engines (at 1e6 a
    >2^53 norm rounded differently in Java vs DuckDB and flipped a
    4-dp boundary). Pair math runs in exact decimals; floats appear
    only in the final normalize. Scale shape: ONE posexplode +
    partial-agg per corpus; everything after operates on
    |labels|×dim×2 rows."""
    emb = _t(spark, sf_dir, "embeddings")
    half = F.when(
        stable_hash28(F.col("vec_id").cast("string")) % 100 < 50,
        "a").otherwise("b")
    sp = emb.select("label", half.alias("half"), "embedding")
    comp = (sp.select("label", "half",
                      F.posexplode("embedding").alias("pos", "v"))
            .groupBy("label", "half", "pos")
            .agg(F.sum(F.floor(F.col("v").cast("double") * 10_000).cast("bigint"))
                 .cast("decimal(19,0)").alias("iq"))
            .localCheckpoint(eager=False))
    cnt = sp.groupBy("label", "half").agg(F.count(F.lit(1)).alias("n"))
    a = comp.where(F.col("half") == "a").select(
        "label", "pos", F.col("iq").alias("ia"))
    b = comp.where(F.col("half") == "b").select(
        F.col("label").alias("lb"), F.col("pos").alias("pb"),
        F.col("iq").alias("ib"))
    d = (a.join(b, (F.col("label") == F.col("lb"))
                & (F.col("pos") == F.col("pb")))
         .groupBy("label")
         .agg(F.sum(F.col("ia") * F.col("ib")).cast("double").alias("dot"),
              F.sum(F.col("ia") * F.col("ia")).cast("double").alias("na"),
              F.sum(F.col("ib") * F.col("ib")).cast("double").alias("nb")))
    ca = cnt.where(F.col("half") == "a").select(
        "label", F.col("n").alias("n_a"))
    cb = cnt.where(F.col("half") == "b").select(
        "label", F.col("n").alias("n_b"))
    return (d.join(F.broadcast(ca), "label")
            .join(F.broadcast(cb), "label")
            .select("label", "n_a", "n_b",
                    F.round(F.col("dot")
                            / (F.sqrt("na") * F.sqrt("nb")), 4)
                    .alias("drift_cos"))
            .coalesce(1).orderBy("label"))


@register("sa04_weighted_sample",
          "WITH k AS (SELECT source, n_chars, "
          "  CASE WHEN " + _DUCK_HASH28.format("CAST(doc_id AS VARCHAR)")
          + " % 2000 < n_chars THEN 1 ELSE 0 END AS kept "
          "  FROM documents) "
          "SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, "
          "CAST(SUM(kept) AS BIGINT) AS n_kept, "
          "CAST(SUM(kept * n_chars) AS BIGINT) AS kept_chars, "
          "CAST(SUM(n_chars) AS BIGINT) AS total_chars "
          "FROM k GROUP BY source ORDER BY source")
def sa04(spark, sf_dir):
    """Deterministic LENGTH-WEIGHTED Bernoulli sample per source:
    P(keep) ∝ n_chars via an EXACT integer comparison — keep iff
    hash28(doc_id) mod 2000 < n_chars — the quality/length-weighted
    corpus downsampling every mixture recipe needs (longer docs carry
    more training signal per selection), with sa01/sa03's
    reproducibility guarantees (content-independent hash ⇒ identical
    sample on every engine, every run, every partitioning — a seeded
    RNG gives none of these). No float ever enters the membership
    decision, so the kept set is engine-exact, not just
    distributionally right. One scan, map-side integer codegen, a
    |sources|-key rollup."""
    docs = _t(spark, sf_dir, "documents")
    kept = (stable_hash28(F.col("doc_id").cast("string")) % 2000
            < F.col("n_chars")).cast("long")
    return (docs.select("source", "n_chars", kept.alias("kept"))
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("kept").cast("long").alias("n_kept"),
                 F.sum(F.col("kept") * F.col("n_chars")).cast("long")
                 .alias("kept_chars"),
                 F.sum("n_chars").cast("long").alias("total_chars"))
            .coalesce(1).orderBy("source"))


_F16_OCTETS = ("user_id % 223 + 1 AS o1, "
               "CAST(FLOOR(user_id / 7) AS BIGINT) % 256 AS o2, "
               "CAST(FLOOR(user_id / 13) AS BIGINT) % 256 AS o3, "
               "CAST(FLOOR(user_id / 29) AS BIGINT) % 254 + 1 AS o4")


@register("f16_ip_classification",
          f"WITH ip AS (SELECT event_type, {_F16_OCTETS} FROM events), "
          "c AS (SELECT event_type, "
          "  ((o1 * 256 + o2) * 256 + o3) * 256 + o4 AS packed, "
          "  CASE WHEN o1 = 10 OR (o1 = 172 AND o2 BETWEEN 16 AND 31) "
          "       OR (o1 = 192 AND o2 = 168) THEN 'private' "
          "       WHEN o1 = 127 THEN 'loopback' "
          "       ELSE 'public' END AS cls FROM ip) "
          "SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events, "
          "CAST(COUNT(*) FILTER (cls = 'private') AS BIGINT) AS n_private, "
          "CAST(COUNT(*) FILTER (cls = 'loopback') AS BIGINT) "
          "  AS n_loopback, "
          "CAST(COUNT(*) FILTER (cls = 'public') AS BIGINT) AS n_public, "
          "CAST(COUNT(DISTINCT packed) AS BIGINT) AS n_distinct_ips "
          "FROM c GROUP BY event_type ORDER BY event_type")
def f16(spark, sf_dir):
    """IPv4 derivation + RFC-1918 classification per event type — the
    log-curation pass that separates internal/private traffic from
    public before a clickstream feeds analytics or training (private
    and loopback sources are monitoring noise at best, PII risk at
    worst). IPs derive DETERMINISTICALLY from user_id (the testdata has
    no IP column), all math is integer (octet extraction via exact
    floor-division — user_id ≪ 2^53 so the double floor is exact on
    both engines), classification is integer range checks, and the
    distinct-IP count rides a packed int64 — one scan, zero floats
    anywhere."""
    ev = _t(spark, sf_dir, "events")
    o1 = F.col("user_id") % 223 + 1
    o2 = F.floor(F.col("user_id") / 7).cast("bigint") % 256
    o3 = F.floor(F.col("user_id") / 13).cast("bigint") % 256
    o4 = F.floor(F.col("user_id") / 29).cast("bigint") % 254 + 1
    cls = (F.when((o1 == 10) | ((o1 == 172) & o2.between(16, 31))
                  | ((o1 == 192) & (o2 == 168)), "private")
           .when(o1 == 127, "loopback").otherwise("public"))
    packed = ((o1 * 256 + o2) * 256 + o3) * 256 + o4
    c = ev.select("event_type", packed.alias("packed"),
                  cls.alias("cls"))
    return (c.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum((F.col("cls") == "private").cast("long"))
                 .cast("long").alias("n_private"),
                 F.sum((F.col("cls") == "loopback").cast("long"))
                 .cast("long").alias("n_loopback"),
                 F.sum((F.col("cls") == "public").cast("long"))
                 .cast("long").alias("n_public"),
                 F.countDistinct("packed").alias("n_distinct_ips"))
            .coalesce(1).orderBy("event_type"))


@register("m06_image_quality_report", None)  # binary decode: no SQL oracle
def m06(spark, sf_dir):
    """Image QA report — m05's sibling for the image modality: real PPM
    decode → per-image brightness / contrast / overexposure in one
    Arrow pass (operators/multimodal.py:image_quality_stats) → one-row
    corpus verdict. Every 5th image is a planted solid color (EXACT
    max==min integer detection — the blank-placeholder asset) and every
    remaining 9th is overexposed (≥80% of pixels at 250+), so
    ``solid_images``/``overexposed_images`` are provable counts at
    every corpus size (test-asserted). Rows-only: binary decode has no
    SQL form."""
    from ..operators.multimodal import (image_quality_stats,
                                        synthetic_images_qa)
    corpus = synthetic_images_qa(spark, media_corpus_n(spark, sf_dir))
    qa = image_quality_stats(corpus)
    return qa.agg(
        F.count(F.lit(1)).alias("n_images"),
        F.sum("is_solid").cast("long").alias("solid_images"),
        F.sum("is_overexposed").cast("long").alias("overexposed_images"),
        F.round(F.avg("mean_brightness"), 2).alias("avg_brightness"),
        F.round(F.avg("contrast"), 2).alias("avg_contrast"))


@register("e11_ivf_index_health", None)  # trained quantizer: no SQL oracle
def e11(spark, sf_dir):
    """IVF index-health report over the SF-proportional embedding
    corpus: per coarse-quantizer bucket, the member count and the
    member↔centroid cosine (mean/min) — the BALANCE and QUANTIZATION
    diagnostics that decide when the ANN index behind n03/e10 needs
    retraining (a mega-bucket degrades probes toward brute force; low
    member↔centroid cosine makes nprobe miss true neighbors). nlist
    derives from the corpus count (similarity.auto_nlist — e09's fix),
    so bucket sizes target ~128 members at every SF and the report
    itself scales. One Arrow matmul pass per batch computes (bucket,
    sim); the rollup is a map-side-combined groupBy on nlist keys.
    Rows-only: the trained k-means quantizer has no SQL form (n03's
    rationale); numpy parity is test-asserted."""
    n = _corpus_rows(spark, sf_dir, "embeddings")
    corpus = (_t(spark, sf_dir, "embeddings")
              .select("vec_id", "embedding"))
    # coarse_nlist == auto_nlist until the flat-k-means cap, then the
    # √-split level-1 count — the quantizer a hierarchical index
    # actually trains flat (requesting a flat N/128 k-means at corpus
    # scale is the capped-sample defect the round-7 verdict flagged)
    nlist = similarity.coarse_nlist(n)
    cent = similarity.train_ivf_centroids(corpus, nlist=nlist,
                                          id_col="vec_id")
    return similarity.ivf_bucket_stats(corpus, cent)


@register("ml01_quality_classifier", None)  # iterative GD: no SQL oracle
def ml01(spark, sf_dir):
    """Quality-classifier training as a query: logistic regression fit
    by 6 Newton/IRLS rounds where each round is ONE map-side-combinable
    Spark aggregate computing gradient + d×d Hessian triangle — |corpus|
    rows reduce to d(d+3)/2 doubles per round and only those reach the
    driver
    (operators/mlfit.py; the CCNet/fastText quality-filter training
    step, no ML library; first-order GD ships alongside in
    operators/mlfit.py). Features (token count, word length, stopword
    share, alphabetic share) and the planted separable label are all
    codegen over ONE checkpointed projection, so an iteration costs a
    cached-column pass, never a corpus re-scan. Returns the one-row
    confusion/loss report; the ≥0.5 decision is the exact SIGN of w·x.
    Rows-only: an iterated float fixpoint has no SQL form (g02's
    rationale); numpy single-node parity is test-asserted."""
    from ..operators.mlfit import (classifier_report,
                                   logistic_regression_irls,
                                   standardize_features,
                                   text_quality_features)
    docs = _t(spark, sf_dir, "documents")
    # each optimizer round re-compiles its codegen (the weights are
    # literals), so round COUNT is the cost driver at bench SF — IRLS'
    # quadratic convergence (6 rounds to 0.99+ accuracy) beat GD at 50
    # rounds by >2x end-to-end here (7.2 s -> 3.4 s warm at 8 rounds;
    # both shapes ship in operators/mlfit.py). Feature-frame partitions
    # size by row volume: 5 doubles/doc, 50k rows per task
    n = _corpus_rows(spark, sf_dir)
    n_parts = max(2, min(32, n // 50_000))
    raw = (text_quality_features(docs).coalesce(n_parts)
           .localCheckpoint(eager=False))
    feats, _mu, _sd = standardize_features(raw, dim=5)
    feats = feats.localCheckpoint(eager=False)
    w = logistic_regression_irls(feats, dim=5, iters=6)
    return classifier_report(feats, w)
