"""Twelfth-wave queries (round 8, batch 2): embedding quantization QA,
vocabulary-growth profiling, and MinHash estimator calibration.

- e13 int8 quantization error report — the compression-QA step before
  shipping an int8 embedding index (the PQ/scalar-quantization
  trade-off decision): per label, the reconstruction error of
  symmetric per-vector int8 quantization, with every error term
  quantized to integer micro-units BEFORE aggregation (e12's exact-
  integer lesson: float sums are summation-order-dependent across
  engines; integer sums are not). Value-hash oracled.
- t26 Heaps'-law vocabulary growth — distinct-vocabulary size as the
  corpus grows doc by doc (Heaps 1978, public): each token's FIRST
  occurrence rank decides which prefix deciles contain it, so the
  whole curve costs one tokenize + one min-aggregate — never ten
  re-scans of growing prefixes. The "is my corpus still adding new
  vocabulary" curation signal. All-integer output, value-hash oracled.
- d18 MinHash estimator calibration — for every LSH candidate pair,
  the 32-permutation signature match count vs the EXACT shingle
  Jaccard (integer cross-multiplied), bucketed by match count: the
  empirical estimator-vs-truth curve that justifies d04's banding
  thresholds. Signatures and candidates replay d04's shared
  constants; jaccard sums are exact BIGINTs (i·10⁴ div u per pair).
  Value-hash oracled on the d04 demo panel (FIXED_INPUT, like d04:
  the oracle replays the full signature pipeline).

Reference anchor: widens the declared-query surface admitted by the
reference's SQL boundary (DeletionCriteria.java:40-63), as waves 1-11.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import dedup, ranks
from ..sources.tables import load_table
from .llm_ops import (_AUG_NEARDUP, _D04_SIG_ELEMS, _DUCK_HASH28,
                      _DUCK_SHINGLES3, _DUCK_TOKENS, _aug_neardup_docs)
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# e13: int8 scalar-quantization error report
# ---------------------------------------------------------------------------

@register("e13_int8_quantization_report",
          "WITH v AS (SELECT vec_id, label, "
          "  GREATEST(list_max(list_transform(embedding, "
          "    x -> abs(CAST(x AS DOUBLE)))), 1e-12) AS ma, "
          "  embedding FROM embeddings), "
          "e AS (SELECT label, CAST(FLOOR(abs("
          "    CAST(x AS DOUBLE) * (127.0 / ma) "
          "    - FLOOR(CAST(x AS DOUBLE) * (127.0 / ma) + 0.5)"
          "  ) * 1000000) AS BIGINT) AS err_q "
          "  FROM v, unnest(v.embedding) AS u(x)) "
          "SELECT label, CAST(COUNT(*) AS BIGINT) AS n_dims, "
          "CAST(SUM(err_q) AS BIGINT) AS sum_err_q, "
          "CAST(MAX(err_q) AS BIGINT) AS max_err_q "
          "FROM e GROUP BY label ORDER BY label")
def e13(spark, sf_dir):
    """Symmetric per-vector int8 quantization QA: each vector scales by
    127/max|component|, rounds half-up to int8 codes, and the per-
    component reconstruction error |v·s − q| (≤ 0.5 in code units by
    construction) is FLOOR-quantized to integer micro-units BEFORE the
    per-label sum — so the aggregate is an exact BIGINT on both
    engines regardless of summation order (e12's lesson; float32
    components are cast to double before any arithmetic — e04's
    lesson). One scan, one explode, map-side-combined group on
    |labels| keys. The report that decides whether an int8 index is
    safe to ship (max_err_q == 500000 means a component sits exactly
    between two codes)."""
    emb = _t(spark, sf_dir, "embeddings")
    xd = F.transform("embedding", lambda x: x.cast("double"))
    ma = F.greatest(F.array_max(F.transform(xd, F.abs)), F.lit(1e-12))
    scaled = (emb.select("label",
                         F.explode(F.transform(
                             xd, lambda x: x * (F.lit(127.0) / ma)))
                         .alias("xs")))
    err_q = F.floor(F.abs(F.col("xs") - F.floor(F.col("xs") + 0.5))
                    * 1000000).cast("long")
    return (scaled.select("label", err_q.alias("err_q"))
            .groupBy("label")
            .agg(F.count(F.lit(1)).alias("n_dims"),
                 F.sum("err_q").alias("sum_err_q"),
                 F.max("err_q").alias("max_err_q"))
            .coalesce(1).orderBy("label"))


# ---------------------------------------------------------------------------
# t26: Heaps'-law vocabulary growth
# ---------------------------------------------------------------------------

@register("t26_vocab_growth",
          "WITH tok AS (SELECT * FROM (SELECT doc_id, "
          "  list_filter(string_split_regex(lower(text), '[^a-z]+'), "
          "  t -> t <> '') AS ts FROM documents) WHERE len(ts) > 0), "
          "rk AS (SELECT doc_id, ts, ROW_NUMBER() OVER (ORDER BY doc_id)"
          "  AS r, (SELECT COUNT(*) FROM tok) AS n FROM tok), "
          "d AS (SELECT doc_id, ts, ((r - 1) * 10) // n + 1 AS dec, r "
          "  FROM rk), "
          "per_dec AS (SELECT dec, CAST(COUNT(*) AS BIGINT) AS docs_d, "
          "  CAST(SUM(len(ts)) AS BIGINT) AS toks_d FROM d GROUP BY dec), "
          "firsts AS (SELECT w, MIN(dec) AS first_dec FROM ("
          "  SELECT dec, unnest(ts) AS w FROM d) GROUP BY w), "
          "voc AS (SELECT first_dec AS dec, CAST(COUNT(*) AS BIGINT) "
          "  AS new_words FROM firsts GROUP BY first_dec) "
          "SELECT p.dec AS decile, "
          "CAST(SUM(p.docs_d) OVER w AS BIGINT) AS docs_cum, "
          "CAST(SUM(p.toks_d) OVER w AS BIGINT) AS tokens_cum, "
          "CAST(SUM(COALESCE(v.new_words, 0)) OVER w AS BIGINT) "
          "  AS vocab_cum "
          "FROM per_dec p LEFT JOIN voc v ON v.dec = p.dec "
          "WINDOW w AS (ORDER BY p.dec ROWS BETWEEN UNBOUNDED PRECEDING "
          "AND CURRENT ROW) ORDER BY decile")
def t26(spark, sf_dir):
    """Heaps'-law curve: cumulative distinct vocabulary vs cumulative
    docs/tokens over the doc_id-ordered corpus, in deciles. The key
    shape: a token belongs to the FIRST decile whose doc prefix
    contains it (min over its occurrences' deciles) — one tokenize,
    one min-aggregate on the vocab, a ≤10-row triangular cumulative
    join — instead of re-counting distinct tokens over ten growing
    prefixes (which would re-scan the corpus quadratically). The
    decile rank itself is the two-pass bucketed offset rank
    (operators/ranks.py): per-bucket counts + broadcast prefix
    offsets + a bucket-PARTITIONED window, so no task ever sees more
    than ~1/1024 of the corpus (the old global row_number was a
    single-task sort at scale — round-8 verdict item 2). Every output
    is an exact integer. A flattening curve says the corpus has
    stopped contributing new vocabulary — the stop-crawling signal."""
    docs = _t(spark, sf_dir, "documents")
    ts = F.filter(F.split(F.lower("text"), "[^a-z]+"),
                  lambda t: t != F.lit(""))
    tok = (docs.select("doc_id", ts.alias("ts"))
           .where(F.size("ts") > 0))
    # global rank WITHOUT a SinglePartition window (the round-8 audit
    # found the old row_number().over(Window.orderBy("doc_id")) funnels
    # the full tokenized corpus through one task): two-pass bucketed
    # offset rank — per-bucket counts, broadcast exclusive prefixes,
    # window partitioned by bucket. total_count doubles as n (no
    # separate count() scan).
    rf = ranks.global_rank_cumsum(tok, "doc_id", rank_col="_r")
    n = max(rf.total_count, 1)
    d = (rf.df.select(
        "ts",
        (F.expr(f"((_r - 1) * 10) div {n}") + 1).alias("dec"))
        .localCheckpoint(eager=False))
    per_dec = (d.groupBy("dec")
               .agg(F.count(F.lit(1)).alias("docs_d"),
                    F.sum(F.size("ts")).alias("toks_d")))
    firsts = (d.select("dec", F.explode("ts").alias("w"))
              .groupBy("w").agg(F.min("dec").alias("first_dec")))
    voc = (firsts.groupBy(F.col("first_dec").alias("dec"))
           .agg(F.count(F.lit(1)).alias("new_words")))
    # cumulative over the ≤10 decile rows via a triangular self-join
    # (b.dec <= a.dec) instead of an ordered window — the frame is
    # tiny, and this keeps the whole registry free of SinglePartition
    # WindowExecs so the plan invariant needs NO exemptions
    pv = (per_dec.join(voc, "dec", "left")
          .select("dec", "docs_d", "toks_d",
                  F.coalesce("new_words", F.lit(0)).alias("nw"))
          .localCheckpoint(eager=False))
    return (pv.alias("a")
            .join(pv.alias("b"), F.col("b.dec") <= F.col("a.dec"))
            .groupBy(F.col("a.dec").alias("decile"))
            .agg(F.sum(F.col("b.docs_d")).alias("docs_cum"),
                 F.sum(F.col("b.toks_d")).alias("tokens_cum"),
                 F.sum(F.col("b.nw")).alias("vocab_cum"))
            .coalesce(1).orderBy("decile"))


# ---------------------------------------------------------------------------
# d18: MinHash estimator calibration (signature overlap vs exact Jaccard)
# ---------------------------------------------------------------------------

_D18_MATCHES_DUCK = " + ".join(
    f"(CASE WHEN sa.sig[{j}] = sb.sig[{j}] THEN 1 ELSE 0 END)"
    for j in range(1, 33))

@register("d18_minhash_calibration",
          f"WITH aug AS ({_AUG_NEARDUP}), "
          f"sh AS (SELECT doc_id, {_DUCK_SHINGLES3} AS s FROM "
          f"(SELECT doc_id, {_DUCK_TOKENS} AS ts FROM aug)), "
          "hs AS (SELECT doc_id, list_transform(s, x -> "
          + _DUCK_HASH28.format("x") + ") AS h FROM sh), "
          f"sig AS (SELECT doc_id, [{_D04_SIG_ELEMS}] AS sig FROM hs), "
          "banded AS (SELECT doc_id, band_idx, band_key FROM ("
          + " UNION ALL ".join(
              f"SELECT doc_id, {i} AS band_idx, concat_ws('_', "
              + ", ".join(f"sig[{i * 4 + j + 1}]" for j in range(4))
              + f") AS band_key FROM sig WHERE sig[1] < {dedup.HASH_PRIME}"
              for i in range(8)) + ")), "
          "cands AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b "
          "  FROM banded x JOIN banded y ON x.band_idx = y.band_idx "
          "  AND x.band_key = y.band_key AND x.doc_id < y.doc_id), "
          "pairs AS (SELECT c.a, c.b, "
          f"  ({_D18_MATCHES_DUCK}) AS m, "
          "  (len(list_intersect(ha.s, hb.s)) * 10000) // "
          "  GREATEST(len(list_distinct(list_concat(ha.s, hb.s))), 1) "
          "  AS jq "
          "  FROM cands c "
          "  JOIN sig sa ON sa.doc_id = c.a "
          "  JOIN sig sb ON sb.doc_id = c.b "
          "  JOIN sh ha ON ha.doc_id = c.a "
          "  JOIN sh hb ON hb.doc_id = c.b) "
          "SELECT CAST(m AS BIGINT) AS sig_matches, "
          "CAST(COUNT(*) AS BIGINT) AS n_pairs, "
          "CAST(SUM(jq) AS BIGINT) AS sum_jaccard_q, "
          "CAST(MIN(jq) AS BIGINT) AS min_jaccard_q, "
          "CAST(MAX(jq) AS BIGINT) AS max_jaccard_q "
          "FROM pairs GROUP BY m ORDER BY sig_matches")
def d18(spark, sf_dir):
    """Estimator calibration for the MinHash family: every LSH
    candidate pair's signature match count (0-32 agreeing
    permutations — the unbiased Jaccard estimator's numerator) against
    its EXACT shingle Jaccard in integer ten-thousandths (i·10⁴ div u
    — exact BIGINT per pair, so bucket sums are order-independent).
    The empirical curve that justifies d04's (bands, rows) choice: at
    b=8, r=4 a pair at J≈0.5 should show ~16/32 matches, and buckets
    far off the diagonal expose a broken hash or permutation. Replays
    d04's shared constants end-to-end, so the driver hash-checks the
    estimator itself. Scale shape: candidates are band-bucketed (never
    quadratic); the signature/shingle joins are id-keyed and pinned;
    the report groups on ≤33 keys."""
    aug = _aug_neardup_docs(spark, sf_dir)
    # ONE combined (doc_id, sh, sig) frame (round 11, guide §1.2/§2.4):
    # the old shape kept SEPARATE sigs and sh checkpoints and attached
    # them with FOUR broadcast joins (each a broadcast-exchange job
    # under AQE) — on a 110-row FIXED_INPUT panel the per-job constant
    # was the whole cost. One projection computes shingles once and
    # derives the signature from them in place; candidates and both
    # pair sides read the same checkpoint, and attachment is TWO
    # broadcast joins. Round 12 (r11 advice): the signature expression
    # comes from dedup._signatures_from_shingles(keep_shingles=True) —
    # the same single source of truth d04/d15/d16 use — instead of a
    # hand-inlined copy that could silently diverge from the shared
    # permutation/seed constants the oracle replays.
    both = dedup._signatures_from_shingles(
        aug.select("doc_id",
                   F.array_distinct(dedup.shingles(
                       dedup.ws_tokens(F.col("text")), 3)).alias("sh")),
        num_hashes=32, keep_shingles=True).localCheckpoint(eager=False)
    sigs = both.select("doc_id", "sig")
    # num_hashes passed explicitly: deriving it from the frame costs a
    # blocking .first() job per call (round 11 job-count audit)
    cands = dedup.lsh_candidate_pairs(sigs, num_hashes=32)
    ab_a = both.select(F.col("doc_id").alias("a"),
                       F.col("sh").alias("sh_a"),
                       F.col("sig").alias("sig_a"))
    ab_b = both.select(F.col("doc_id").alias("b"),
                       F.col("sh").alias("sh_b"),
                       F.col("sig").alias("sig_b"))
    m = sum((F.col("sig_a")[j] == F.col("sig_b")[j]).cast("int")
            for j in range(32))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.greatest(F.size(F.array_union("sh_a", "sh_b")), F.lit(1))
    # broadcast, not shuffle_hash: unlike d15/d16's full-corpus frames,
    # this panel is BOUNDED BY CONSTRUCTION (first-100 docs + copies at
    # every SF — FIXED_INPUT), so the no-stats-after-checkpoint hazard
    # that mandates pins on corpus-growing sides cannot apply; each
    # broadcast replaces a 110-row exchange
    pairs = (cands
             .join(F.broadcast(ab_a), "a")
             .join(F.broadcast(ab_b), "b")
             .select(m.cast("long").alias("sig_matches"),
                     (inter.cast("long") * 10000).alias("_i10"),
                     union.cast("long").alias("_u"))
             # `div` = exact integer division (floor(double-/) can
             # land one off when the true quotient is an integer)
             .select("sig_matches",
                     F.expr("_i10 div _u").alias("jq")))
    return (pairs.groupBy("sig_matches")
            .agg(F.count(F.lit(1)).alias("n_pairs"),
                 F.sum("jq").alias("sum_jaccard_q"),
                 F.min("jq").alias("min_jaccard_q"),
                 F.max("jq").alias("max_jaccard_q"))
            .coalesce(1).orderBy("sig_matches"))
