"""Fifteenth-wave queries (round 8, batch 6): classifier operating
points and dedup-pipeline recall as driver-checked queries.

- ml06 precision/recall operating points — ml05 answers "does the
  score rank?" (threshold-free AUC); ml06 answers the question a
  curation pipeline actually ships on: "WHERE do I cut?" For ~10
  deterministic decile thresholds over the distinct-score axis, the
  exact TP / predicted-positive / precision / recall / F1 in integer
  micro-units. All counts come from ONE grouped-by-score frame plus
  the two-pass bucketed offset rank/cumsum over distinct scores
  (operators/ranks.py — no SinglePartition window) — the corpus is
  never re-scanned per threshold, which is the 100 TB difference
  between this and the naive per-threshold loop.
- d20 LSH planted-pair recall — the near-dup pipeline's RECALL,
  continuously measured: the corpus construction plants a known
  near-dup twin for every 10th doc, so |found ∩ planted| / |planted|
  is exactly computable on both engines (the oracle replays the full
  signature pipeline, d04/d15's constants). The local test suite
  already asserts recall once; registering it puts the guarantee
  under the driver's per-round value-hash gate — an LSH regression
  (broken hash, wrong banding) now fails CORRECTNESS, not just
  pytest. Also reports band-collision extras (the verify join's
  workload) as exact counts.

Reference anchor: widens the declared-query surface admitted by the
reference's SQL boundary (DeletionCriteria.java:40-63), as waves 1-14.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup, ranks
from .analytics_wave9 import _LSH_PAIRS_CTES
from .analytics_wave13 import _DUCK_XY, _xy
from .llm_ops import DOC_DUP_OFFSET, _aug_full_neardup
from .registry import register


# ---------------------------------------------------------------------------
# ml06: precision/recall operating points at decile thresholds
# ---------------------------------------------------------------------------

@register("ml06_pr_operating_points",
          f"WITH xy AS ({_DUCK_XY}), "
          "g AS (SELECT (y * 1000) // GREATEST(x, 1) AS score, "
          "  CAST(COUNT(*) AS BIGINT) AS cnt, "
          "  CAST(SUM(CASE WHEN x >= 50 THEN 1 ELSE 0 END) AS BIGINT) "
          "  AS pos FROM xy GROUP BY (y * 1000) // GREATEST(x, 1)), "
          "w AS (SELECT score, "
          "  SUM(cnt) OVER (ORDER BY score DESC ROWS BETWEEN UNBOUNDED "
          "  PRECEDING AND CURRENT ROW) AS cum_n, "
          "  SUM(pos) OVER (ORDER BY score DESC ROWS BETWEEN UNBOUNDED "
          "  PRECEDING AND CURRENT ROW) AS cum_tp, "
          "  ROW_NUMBER() OVER (ORDER BY score DESC) AS rn, "
          "  COUNT(*) OVER () AS nsc, "
          "  (SELECT SUM(pos) FROM g) AS p FROM g), "
          "sel AS (SELECT * FROM w "
          "  WHERE (rn * 10) // nsc > ((rn - 1) * 10) // nsc) "
          "SELECT CAST(score AS BIGINT) AS threshold_score, "
          "CAST(cum_n AS BIGINT) AS pred_pos, "
          "CAST(cum_tp AS BIGINT) AS tp, "
          "CAST((cum_tp * 1000000) // cum_n AS BIGINT) AS precision_micro,"
          "CAST((cum_tp * 1000000) // p AS BIGINT) AS recall_micro, "
          "CAST((2 * cum_tp * 1000000) // (cum_n + p) AS BIGINT) "
          "  AS f1_micro "
          "FROM sel ORDER BY threshold_score DESC")
def ml06(spark, sf_dir):
    """Operating-point table for the ml05 score/label pair: predict
    positive when score ≥ t, for ~10 thresholds placed at the decile
    boundaries of the DISTINCT-score axis (the boundary-crossing
    predicate (rn·10) div n > ((rn−1)·10) div n picks them with pure
    integer arithmetic — no float quantiles, well-defined when fewer
    than 10 distinct scores exist). Precision, recall and F1
    (= 2TP/(pred_pos + actual_pos) — the identity that keeps F1 one
    exact integer division) are BIGINT micro-units throughout. Scale
    shape: ONE grouped-by-score aggregate (map-side combinable), then
    the two-pass bucketed offset rank/cumsum (operators/ranks.py) over
    the distinct-score axis — bucket-PARTITIONED windows + broadcast
    prefix offsets, no SinglePartition exchange anywhere even if the
    distinct-score domain grew with the corpus (the round-8 suite-red
    shape); nsc and Σpos fall out of the offsets pass as exact driver
    scalars instead of unbounded windows — never a per-threshold
    corpus rescan; output ≤ 10 rows. Headroom: TP·10⁶ stays inside
    BIGINT to ~9·10¹² positives — past any per-corpus mandate."""
    score = F.expr("(y * 1000) div greatest(x, 1)")
    g = (_xy(spark, sf_dir)
         .groupBy(score.alias("score"))
         .agg(F.count(F.lit(1)).cast("long").alias("cnt"),
              F.sum((F.col("x") >= 50).cast("long")).alias("pos")))
    rf = ranks.global_rank_cumsum(g, "score", sum_cols=["cnt", "pos"],
                                  ascending=False, rank_col="rn")
    nsc, p = max(rf.total_count, 1), max(rf.totals["pos"], 1)
    sel = rf.df.where(
        F.expr(f"(rn * 10) div {nsc} > ((rn - 1) * 10) div {nsc}"))
    return (sel.select(
        F.col("score").alias("threshold_score"),
        F.col("cum_cnt").alias("pred_pos"),
        F.col("cum_pos").alias("tp"),
        F.expr("(cum_pos * 1000000) div cum_cnt")
        .alias("precision_micro"),
        F.expr(f"(cum_pos * 1000000) div {p}").alias("recall_micro"),
        F.expr(f"(2 * cum_pos * 1000000) div (cum_cnt + {p})")
        .alias("f1_micro"))
        .coalesce(1).orderBy(F.desc("threshold_score")))


# ---------------------------------------------------------------------------
# d20: LSH planted-pair recall (the dedup pipeline's recall, driver-gated)
# ---------------------------------------------------------------------------

@register("d20_lsh_planted_recall",
          "WITH " + _LSH_PAIRS_CTES + ", "
          f"planted AS (SELECT doc_id AS a, doc_id + {DOC_DUP_OFFSET} "
          "  AS b FROM documents WHERE doc_id % 10 = 0), "
          "hit AS (SELECT p.a FROM planted p JOIN pairs r "
          "  ON r.a = p.a AND r.b = p.b) "
          "SELECT CAST((SELECT COUNT(*) FROM planted) AS BIGINT) "
          "  AS planted_pairs, "
          "CAST((SELECT COUNT(*) FROM hit) AS BIGINT) AS found_pairs, "
          "CAST(((SELECT COUNT(*) FROM hit) * 1000000) // "
          "  GREATEST((SELECT COUNT(*) FROM planted), 1) AS BIGINT) "
          "  AS recall_ppm, "
          "CAST((SELECT COUNT(*) FROM pairs) AS BIGINT) AS total_pairs")
def d20(spark, sf_dir):
    """Recall of the MinHash-LSH near-dup pipeline against the KNOWN
    planted truth: every 10th doc has a twin at doc_id + offset whose
    two-token perturbation keeps Jaccard well above the 0.5 verify
    threshold, so a correct pipeline must find essentially all of
    them (banding theory: at b=8, r=4 and J ≈ 0.9 the miss
    probability is < 10⁻⁶ per pair). The local test suite asserts
    this once at test time; THIS query puts the same number under the
    driver's per-round value-hash gate, so a broken hash constant,
    permutation, or band key fails CORRECTNESS visibly. total_pairs
    additionally exposes background-collision volume (the verify
    join's workload). Scale shape: d15's banded pipeline (never
    doc×doc); the planted frame is a projection of the scan; the
    recall join is pair-keyed and PINNED shuffle_hash (corpus-growing
    both sides — the PLANS.md:405 class); output is one row of four
    BIGINTs."""
    aug = _aug_full_neardup(spark, sf_dir).localCheckpoint(eager=False)
    pairs = dedup.minhash_near_duplicates(
        aug, num_hashes=32, bands=8, shingle_size=3, threshold=0.5)
    pairs = pairs.localCheckpoint(eager=False)
    docs = aug.where(
        (F.col("doc_id") % 10 == 0) & (F.col("doc_id") < DOC_DUP_OFFSET))
    planted = docs.select(
        F.col("doc_id").alias("a"),
        (F.col("doc_id") + DOC_DUP_OFFSET).alias("b"))
    hit = planted.join(pairs.select("a", "b").hint("shuffle_hash"),
                       ["a", "b"])
    np_ = planted.agg(F.count(F.lit(1)).alias("planted_pairs"))
    nh = hit.agg(F.count(F.lit(1)).alias("found_pairs"))
    nt = pairs.agg(F.count(F.lit(1)).alias("total_pairs"))
    return (np_.crossJoin(nh).crossJoin(nt)  # three 1-row frames
            .select("planted_pairs", "found_pairs",
                    F.expr("(found_pairs * 1000000) div "
                           "greatest(planted_pairs, 1)")
                    .alias("recall_ppm"),
                    "total_pairs"))
