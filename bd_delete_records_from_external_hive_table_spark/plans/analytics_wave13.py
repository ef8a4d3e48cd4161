"""Thirteenth-wave queries (round 8, batch 3): closed-form model
fitting, ranking-quality evaluation, exact-substring dedup coverage,
and readability scoring.

- ml04 per-source OLS (chars-on-tokens regression) — the "tokenizer
  cost model" fit: every Gram-matrix entry (n, Σx, Σy, Σx², Σxy, Σy²)
  is an exact BIGINT (token and char counts are integers), so the
  sums are summation-order-independent across engines, and the
  closed-form slope/intercept/r² are each a FIXED tree of IEEE double
  ops over identical integer inputs — bit-deterministic, value-hash
  oracled. Distributed-training shape: ONE map-side-combined
  aggregate reduces |corpus| rows to 6 longs per source.
- ml05 ROC-AUC via the Mann-Whitney rank-sum — the classifier-eval
  primitive (Hanley & McNeil 1982, public): AUC of the
  milli-chars-per-token score against a median-balanced ≥50-token
  label (NOT ml01's ≥20-token rule — ADVICE.md round-8 doc fix), per
  source, with tie-correct average ranks. Computed on the GROUPED-BY-SCORE frame
  (2·ranksum = Σ pos·(2·cum_below + cnt + 1) is integer-exact), so
  the global sort is over distinct score VALUES, never corpus rows;
  the final AUC is exact integer micro-units (BIGINT div BIGINT).
- d19 duplicate-span coverage — the exact-substring dedup measurement
  of Lee et al. 2022 ("Deduplicating Training Data Makes Language
  Models Better", public): every 8-token window that occurs in ≥2
  distinct documents marks its positions duplicated; per-doc coverage
  is the interval-union length of the marked windows (the ts08
  running-max merge), rolled up by doc_id decile bucket. Runs on the
  SF-proportional planted-copy corpus (d15/d16/d17's), where every
  copied doc shares all its windows with its original — bucket 0
  (the planted families) shows near-total coverage, other buckets
  only background vocabulary collisions. All-integer output.
- t27 Flesch reading-ease — the classic readability quality signal
  (Flesch 1948, public) in exact fixed-point: words, sentences and
  vowel-group syllable counts are integers (syllables capped at 64
  per word — the structural bound), and the score
  206.835 − 1.015·(W/S) − 84.6·(Syl/W) is evaluated over the common
  denominator S·W as ONE wide integer division in
  DECIMAL(38,0)/HUGEINT, offset-shifted so the numerator is
  NON-NEGATIVE by construction (floor == truncate on both engines,
  structurally — both ADVICE.md round-8 items). Per-source BIGINT
  report.

Reference anchor: widens the declared-query surface admitted by the
reference's SQL boundary (DeletionCriteria.java:40-63), as waves 1-12.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .llm_ops import _AUG_FULL_NEARDUP, _DUCK_TOKENS, _aug_full_neardup
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _dec(c) -> "F.Column":
    """Widen a BIGINT column/expr to DECIMAL(19,0) so products land in
    DECIMAL(38,0) — exact to 10³⁸. The corpus-quadratic scalar products
    in the closed forms here (n·Σxy, rank-sum·10⁶) pass 2⁶³ at the
    100 TB mandate scale; g03's sf10 run crashed on exactly this class
    (ARITHMETIC_OVERFLOW at ~4·10²¹), so every such product is widened
    BEFORE it can overflow. DuckDB oracles widen to HUGEINT."""
    c = F.col(c) if isinstance(c, str) else c
    return c.cast("decimal(19,0)")


def _wide_floor_div(num, den) -> "F.Column":
    """EXACT floor(num/den) for positive DECIMAL(38,0) operands.

    Spark's ``div`` casts decimals to long first — on wide values it
    silently wraps to a WRONG result (probed: 2·10²⁰ div 3 returned a
    negative long), and plain decimal division rounds HALF_UP at scale
    6, so ``floor()`` of it flips up when the true quotient sits within
    5·10⁻⁷ below an integer — rare but not impossible, and the house
    rule is divergence must be STRUCTURALLY impossible, not unlikely.
    So: take the scale-6 candidate, then correct it by exact decimal
    multiply-compare (candidate ≤ 10⁶ here, so candidate·den stays
    within 38 digits). DuckDB oracles use HUGEINT ``//`` — exact floor
    natively — and the correction makes the Spark side equal to it by
    construction at ANY operand magnitude."""
    c = F.floor(num / den).cast("decimal(38,0)")
    return (F.when((c + 1) * den <= num, c + 1)
            .when(c * den > num, c - 1)
            .otherwise(c))


# shared doc frame: whitespace token count x, char count y, per source
_DUCK_XY = ("SELECT source, len(" + _DUCK_TOKENS + ") AS x, "
            "n_chars AS y FROM documents")


def _xy(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = F.filter(F.split("text", r"\s+"), lambda t: t != F.lit(""))
    return (_t(spark, sf_dir, "documents")
            .select("source", F.size(toks).alias("x"),
                    F.col("n_chars").alias("y")))


# ---------------------------------------------------------------------------
# ml04: per-source OLS — chars-on-tokens regression from exact integer sums
# ---------------------------------------------------------------------------

@register("ml04_chars_per_token_ols",
          f"WITH xy AS ({_DUCK_XY}), "
          "s AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n, "
          "  CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy, "
          "  CAST(SUM(x * x) AS BIGINT) AS sxx, "
          "  CAST(SUM(x * y) AS BIGINT) AS sxy, "
          "  CAST(SUM(y * y) AS BIGINT) AS syy "
          "  FROM xy GROUP BY source), "
          "d AS (SELECT source, n, "
          "  CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS num, "
          "  CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS den, "
          "  CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS ssy, "
          "  sx, sy FROM s) "
          "SELECT source, n AS n_docs, "
          "CASE WHEN den = 0 THEN NULL ELSE "
          "  ROUND(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) END "
          "  AS slope, "
          "CASE WHEN den = 0 THEN NULL ELSE "
          "  ROUND((CAST(sy AS DOUBLE) - CAST(num AS DOUBLE) / "
          "  CAST(den AS DOUBLE) * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE),"
          "  6) END AS intercept, "
          "CASE WHEN den = 0 OR ssy = 0 THEN NULL ELSE "
          "  ROUND(CAST(num AS DOUBLE) * CAST(num AS DOUBLE) / "
          "  (CAST(den AS DOUBLE) * CAST(ssy AS DOUBLE)), 6) END AS r2 "
          "FROM d ORDER BY source")
def ml04(spark, sf_dir):
    """Per-source least-squares fit of n_chars on token count — the
    bytes-per-token cost model a tokenizer-budget planner needs. The
    Gram sums are exact BIGINTs (integer features × integer target ⇒
    no fixed-point scaffolding needed), so the one aggregate that
    feeds the fit is map-side combinable AND engine-exact; the closed
    form touches floats only in a fixed expression tree over those
    identical integers (num/den, ·sx, −, /n — each one IEEE op), so
    the 6-dp rounding can never straddle engines. The closed-form
    products n·Σxy etc. are corpus-QUADRATIC and pass 2⁶³ near 10⁹
    docs per source — inside the 100 TB mandate — so they are widened
    to DECIMAL(38,0)/HUGEINT (the g03 overflow class); the BIGINT
    sums themselves stay exact to ~10¹¹ docs.
    Scale: one scan → 6 longs per source; nothing else moves."""
    s = (_xy(spark, sf_dir)
         .groupBy("source")
         .agg(F.count(F.lit(1)).cast("long").alias("n"),
              F.sum("x").cast("long").alias("sx"),
              F.sum("y").cast("long").alias("sy"),
              F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
              F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
              F.sum(F.col("y") * F.col("y")).cast("long").alias("syy")))
    # wide products (g03's overflow class): n·Σxy reaches 2⁶³ around
    # 10⁹ docs per source — inside the 100 TB mandate. The BIGINT sums
    # themselves stay exact far longer (Σxy ≤ 5·10¹⁷ at 10¹¹ docs).
    num = _dec("n") * _dec("sxy") - _dec("sx") * _dec("sy")
    den = _dec("n") * _dec("sxx") - _dec("sx") * _dec("sx")
    ssy = _dec("n") * _dec("syy") - _dec("sy") * _dec("sy")
    d = s.select("source", "n", "sx", "sy", num.alias("num"),
                 den.alias("den"), ssy.alias("ssy"))
    fnum, fden = F.col("num").cast("double"), F.col("den").cast("double")
    slope = fnum / fden
    intercept = ((F.col("sy").cast("double")
                  - slope * F.col("sx").cast("double"))
                 / F.col("n").cast("double"))
    r2 = (fnum * fnum) / (fden * F.col("ssy").cast("double"))
    return (d.select(
        "source", F.col("n").alias("n_docs"),
        F.when(F.col("den") == 0, F.lit(None))
         .otherwise(F.round(slope, 6)).alias("slope"),
        F.when(F.col("den") == 0, F.lit(None))
         .otherwise(F.round(intercept, 6)).alias("intercept"),
        F.when((F.col("den") == 0) | (F.col("ssy") == 0), F.lit(None))
         .otherwise(F.round(r2, 6)).alias("r2"))
        .coalesce(1).orderBy("source"))


# ---------------------------------------------------------------------------
# ml05: ROC-AUC by rank-sum, tie-correct, integer-exact
# ---------------------------------------------------------------------------

@register("ml05_auc_ranksum",
          f"WITH xy AS ({_DUCK_XY}), "
          "g AS (SELECT source, (y * 1000) // GREATEST(x, 1) AS score, "
          "  CAST(COUNT(*) AS BIGINT) AS cnt, "
          "  CAST(SUM(CASE WHEN x >= 50 THEN 1 ELSE 0 END) AS BIGINT) "
          "  AS pos FROM xy GROUP BY source, (y * 1000) // GREATEST(x, 1)), "
          "w AS (SELECT source, pos, cnt, "
          "  COALESCE(SUM(cnt) OVER (PARTITION BY source ORDER BY score "
          "  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
          "  AS cumb FROM g), "
          "a AS (SELECT source, SUM(pos) AS p, SUM(cnt) - SUM(pos) AS q, "
          "  SUM(CAST(pos AS HUGEINT) * (2 * cumb + cnt + 1)) "
          "  - CAST(SUM(pos) AS HUGEINT) * (SUM(pos) + 1) "
          "  AS u2 FROM w GROUP BY source) "
          "SELECT source, CAST(p AS BIGINT) AS n_pos, "
          "CAST(q AS BIGINT) AS n_neg, "
          "CAST(CASE WHEN p = 0 OR q = 0 THEN NULL "
          "ELSE (u2 * 500000) // (CAST(p AS HUGEINT) * q) END AS BIGINT) "
          "AS auc_micro "
          "FROM a ORDER BY source")
def ml05(spark, sf_dir):
    """ROC-AUC of a DELIBERATELY weak ranking signal — milli-chars-
    per-token, integer (y·1000 div x) — against a median-balanced
    ≥50-token label, per source, as the tie-correct Mann-Whitney
    statistic: with rows grouped by score value, the sum of positives'
    average ranks doubles to the integer Σ pos·(2·cum_below + cnt + 1),
    so 2U = that − p(p+1) and AUC·10⁶ = 2U·5·10⁵ div (p·q) — exact
    BIGINT end-to-end, no float ever. The weak score keeps AUC
    strictly inside (0,1) with real per-source variation AND makes the
    tie-averaging path load-bearing (chars-per-token collides heavily
    — a tie-broken-wrong implementation lands visibly off). Scale
    shape: the corpus collapses to one row per DISTINCT (source,
    score) before any window runs — the rank window walks score
    values, not corpus rows — and the report is |sources| rows.
    Overflow: u2 ≤ 2pn ≈ 5·10¹¹ at sf10; ·5·10⁵ ≈ 2.5·10¹⁷ — within
    BIGINT."""
    xy = _xy(spark, sf_dir)
    score = F.expr("(y * 1000) div greatest(x, 1)")
    g = (xy.groupBy("source", score.alias("score"))
         .agg(F.count(F.lit(1)).cast("long").alias("cnt"),
              F.sum((F.col("x") >= 50).cast("long")).alias("pos")))
    wspec = (Window.partitionBy("source").orderBy("score")
             .rowsBetween(Window.unboundedPreceding, -1))
    w = g.select("source", "pos", "cnt",
                 F.coalesce(F.sum("cnt").over(wspec), F.lit(0))
                 .alias("cumb"))
    # widened rank-sum (g03's overflow class): the per-row term
    # pos·(2·cumb+cnt+1) is bounded by cnt·2n, so the per-source sum
    # approaches 2n² — past 2⁶³ near 2·10⁹ docs per source, inside the
    # 100 TB mandate. Products go DECIMAL(38,0); the final division
    # uses the exact floor-corrected wide divide (Spark's `div` wraps
    # on decimals and plain decimal division rounds — see
    # _wide_floor_div). The oracle's HUGEINT // floors natively.
    term = _dec("pos") * _dec(F.lit(2) * F.col("cumb")
                              + F.col("cnt") + F.lit(1))
    a = (w.groupBy("source")
         .agg(F.sum("pos").alias("p"),
              (F.sum("cnt") - F.sum("pos")).alias("q"),
              (F.sum(term)
               - _dec(F.sum("pos")) * _dec(F.sum("pos") + F.lit(1)))
              .alias("u2")))
    auc = _wide_floor_div(
        (F.col("u2") * F.lit(500000)).cast("decimal(38,0)"),
        (_dec("p") * _dec("q")).cast("decimal(38,0)"))
    return (a.select("source", F.col("p").alias("n_pos"),
                     F.col("q").alias("n_neg"),
                     F.when((F.col("p") == 0) | (F.col("q") == 0),
                            F.lit(None).cast("long"))
                      .otherwise(auc.cast("long")).alias("auc_micro"))
            .coalesce(1).orderBy("source"))


# ---------------------------------------------------------------------------
# d19: exact-substring duplicate-span coverage (Lee et al. 2022 shape)
# ---------------------------------------------------------------------------

@register("d19_dup_span_coverage",
          f"WITH aug AS ({_AUG_FULL_NEARDUP}), "
          f"tok AS (SELECT doc_id, ts FROM (SELECT doc_id, {_DUCK_TOKENS} "
          "  AS ts FROM aug) WHERE len(ts) >= 8), "
          "win AS (SELECT doc_id, i AS s, "
          "  md5(array_to_string(ts[i:i+7], ' ')) AS gk "
          "  FROM tok, unnest(range(1, len(ts) - 6)) AS r(i)), "
          "dupg AS (SELECT gk FROM win GROUP BY gk "
          "  HAVING COUNT(DISTINCT doc_id) >= 2), "
          "dwin AS (SELECT w.doc_id, w.s FROM win w JOIN dupg USING (gk)), "
          "iv AS (SELECT doc_id, GREATEST(0, (s + 7) - GREATEST("
          "  COALESCE(MAX(s + 7) OVER (PARTITION BY doc_id ORDER BY s "
          "  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0), "
          "  s - 1)) AS c FROM dwin), "
          "percov AS (SELECT doc_id, SUM(c) AS cov FROM iv GROUP BY doc_id),"
          "base AS (SELECT doc_id, len(ts) AS m FROM tok) "
          "SELECT base.doc_id % 10 AS bucket, "
          "CAST(COUNT(*) AS BIGINT) AS n_docs, "
          "CAST(SUM(CASE WHEN COALESCE(cov, 0) > 0 THEN 1 ELSE 0 END) "
          "  AS BIGINT) AS docs_with_dup, "
          "CAST(SUM(m) AS BIGINT) AS sum_tokens, "
          "CAST(SUM(COALESCE(cov, 0)) AS BIGINT) AS covered_tokens, "
          "CAST((SUM(COALESCE(cov, 0)) * 1000000) // GREATEST(SUM(m), 1) "
          "  AS BIGINT) AS coverage_ppm "
          "FROM base LEFT JOIN percov USING (doc_id) "
          "GROUP BY bucket ORDER BY bucket")
def d19(spark, sf_dir):
    """Exact-substring duplicate-span coverage (the measurement half of
    Lee et al. 2022's ExactSubstr dedup): an 8-token window occurring
    in ≥2 DISTINCT docs marks its 8 positions duplicated; per-doc
    duplicated-token count is the interval-union length of its marked
    windows (running-max merge — starts are unique per doc, so the
    window order is total); the report buckets docs by doc_id mod 10.
    On the planted-copy corpus every 10th doc has a near-identical
    twin, so bucket 0 approaches 10⁶ ppm while other buckets carry
    only background vocabulary collisions — the planted gradient that
    makes the hash check meaningful at every SF.

    Scale shape: one tokenize; windows explode to ~|corpus tokens|
    rows keyed by md5(gram) — 128-bit, so cross-gram collisions are
    structurally impossible at any corpus size (d14's 28-bit grams are
    fine for ESTIMATES; a coverage measure must not merge distinct
    grams) — the duplicated-gram filter is a map-side-combinable
    count-distinct-ge-2, the mark-back join is gram-keyed and PINNED
    shuffle_hash (both sides grow with the corpus; the checkpoint-
    stats broadcast trap from PLANS.md), the merge window partitions
    by doc_id, and the rollup has 10 keys. Arithmetic headroom (the
    g03 overflow audit): the final coverage_ppm multiply Σcov·10⁶
    stays inside BIGINT while a bucket holds ≤ 9.2·10¹² tokens ≈
    46 TB of text per bucket — ~460 TB of corpus across the 10
    buckets, comfortably past the mandate."""
    aug = _aug_full_neardup(spark, sf_dir)
    toks = F.filter(F.split("text", r"\s+"), lambda t: t != F.lit(""))
    tok = (aug.select("doc_id", toks.alias("ts"))
           .where(F.size("ts") >= 8)
           .localCheckpoint(eager=False))
    win = tok.select(
        "doc_id",
        F.explode(F.transform(
            F.sequence(F.lit(1), F.size("ts") - 7),
            lambda i: F.struct(
                i.alias("s"),
                F.md5(F.concat_ws(" ", F.slice("ts", i, F.lit(8))))
                .alias("gk")))).alias("w")
    ).select("doc_id", F.col("w.s").alias("s"), F.col("w.gk").alias("gk"))
    win = win.localCheckpoint(eager=False)
    dupg = (win.groupBy("gk")
            .agg(F.countDistinct("doc_id").alias("nd"))
            .where(F.col("nd") >= 2).select("gk"))
    dwin = win.join(dupg.hint("shuffle_hash"), "gk").select("doc_id", "s")
    mw = (Window.partitionBy("doc_id").orderBy("s")
          .rowsBetween(Window.unboundedPreceding, -1))
    c = F.greatest(
        F.lit(0),
        (F.col("s") + 7) - F.greatest(
            F.coalesce(F.max(F.col("s") + 7).over(mw), F.lit(0)),
            F.col("s") - 1))
    percov = (dwin.select("doc_id", c.alias("c"))
              .groupBy("doc_id").agg(F.sum("c").alias("cov")))
    base = tok.select("doc_id", F.size("ts").cast("long").alias("m"))
    joined = base.join(percov.hint("shuffle_hash"), "doc_id", "left")
    cov0 = F.coalesce("cov", F.lit(0))
    return (joined.groupBy((F.col("doc_id") % 10).alias("bucket"))
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum((cov0 > 0).cast("long")).alias("docs_with_dup"),
                 F.sum("m").alias("sum_tokens"),
                 F.sum(cov0).alias("covered_tokens"),
                 F.expr("(sum(coalesce(cov, 0)) * 1000000) div "
                        "greatest(sum(m), 1)").alias("coverage_ppm"))
            .coalesce(1).orderBy("bucket"))


# ---------------------------------------------------------------------------
# t27: Flesch reading-ease in exact fixed-point
# ---------------------------------------------------------------------------

#: per-word syllable-estimate cap. Two structural guarantees hang off
#: it (both ADVICE.md round-8 items): (1) syl ≤ 64·w, so the offset
#: below dominates the 84.6e6·syl·s term for ANY input — the Flesch
#: numerator is non-negative by construction, making truncate (Spark
#: `div`, DuckDB `//` — BOTH truncate toward zero, probed incl.
#: HUGEINT) equal to floor on every row of every corpus, not just
#: plausible ones; (2) the widened products are bounded independently
#: of word length. Linguistically free: no natural-language word
#: carries 64+ vowel groups, so real scores are unchanged.
_SYL_CAP = 64

#: micro-unit offset that keeps the Flesch numerator non-negative
#: STRUCTURALLY: with syl ≤ 64·w and w ≤ 15·s (the sentence floor),
#: numerator ≥ (206835e3 + OFF − 15225e3 − 84600e3·64)·s·w > 0 for
#: OFF = 10^10. All products are widened to DECIMAL(38,0)/HUGEINT
#: (the g03 overflow class — ADVICE.md flagged the unwidened form
#: wrapping past ~3.4e5 alpha words per doc): (206835e3+OFF)·s·w ≤
#: ~10^28 even at s,w ≈ 10^9 tokens per doc.
_FLESCH_OFFSET = 10_000_000_000

@register("t27_flesch_readability",
          "WITH d AS (SELECT source, "
          "  list_filter(string_split_regex(lower(text), '[^a-z]+'), "
          "  t -> t <> '') AS ws, text FROM documents), "
          "m AS (SELECT source, CAST(len(ws) AS HUGEINT) AS w, "
          "  CAST(GREATEST(len(regexp_extract_all(text, '[.!?]+')), "
          "  (len(ws) + 14) // 15) AS HUGEINT) AS s, "
          "  CAST(list_sum(list_transform(ws, t -> LEAST(GREATEST("
          f"  len(regexp_extract_all(t, '[aeiouy]+')), 1), {_SYL_CAP})"
          "  )) AS HUGEINT) AS syl FROM d WHERE len(ws) > 0), "
          "q AS (SELECT source, CAST("
          "  (206835000 * s * w - 1015000 * w * w - 84600000 * syl * s "
          f"  + {_FLESCH_OFFSET} * s * w) // (s * w) "
          f"  - {_FLESCH_OFFSET} AS BIGINT) AS score_q FROM m) "
          "SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, "
          "CAST(SUM(score_q) AS BIGINT) AS sum_score_micro, "
          "CAST(MIN(score_q) AS BIGINT) AS min_score_micro, "
          "CAST(MAX(score_q) AS BIGINT) AS max_score_micro "
          "FROM q GROUP BY source ORDER BY source")
def t27(spark, sf_dir):
    """Flesch reading-ease per source, exact: words W (alpha tokens),
    sentences S (terminal-punctuation runs, floored by a 15-token
    segment count because this corpus carries no punctuation — the
    fallback is itself integer), syllables Syl (≥1 vowel-group runs
    per word, capped at 64 — the standard regex estimator; the cap is
    linguistically free and makes syl ≤ 64·w a STRUCTURAL bound, so
    the offset-shifted numerator below is non-negative on any input,
    not just plausible ones). The score
    206.835 − 1.015·W/S − 84.6·Syl/W is evaluated in micro-units over
    the common denominator S·W as ONE offset-shifted BIGINT division,
    so floor-vs-truncate divergence between engines is structurally
    impossible and per-source sums are exact. One scan, all codegen
    (split + regexp_extract_all + a HOF sum), |sources| output rows —
    the curation quality signal that needs no model."""
    docs = _t(spark, sf_dir, "documents")
    ws = F.filter(F.split(F.lower("text"), "[^a-z]+"),
                  lambda t: t != F.lit(""))
    d = docs.select("source", ws.alias("ws"), "text").where(F.size("ws") > 0)
    w = F.size("ws").cast("long")
    s = F.greatest(
        F.regexp_count("text", F.lit(r"[.!?]+")).cast("long"),
        F.expr("(size(ws) + 14) div 15")).cast("long")
    syl = F.aggregate(
        F.transform("ws", lambda t: F.least(F.greatest(
            F.regexp_count(t, F.lit("[aeiouy]+")), F.lit(1)),
            F.lit(_SYL_CAP))),
        F.lit(0).cast("long"), lambda acc, v: acc + v)
    m = d.select("source", w.alias("w"), s.alias("s"), syl.alias("syl"))
    # widened numerator (ADVICE.md: the unwidened BIGINT form wraps
    # past ~3.4e5 alpha words per doc); non-negative by the _SYL_CAP /
    # offset bound, so the exact wide floor-divide == both engines'
    # truncating division on every input
    sw = _dec("s") * _dec("w")
    num = (F.lit(206835000 + _FLESCH_OFFSET).cast("decimal(38,0)") * sw
           - F.lit(1015000).cast("decimal(38,0)") * _dec("w") * _dec("w")
           - F.lit(84600000).cast("decimal(38,0)")
           * _dec("syl") * _dec("s"))
    score_q = (_wide_floor_div(num.cast("decimal(38,0)"),
                               sw.cast("decimal(38,0)"))
               - F.lit(_FLESCH_OFFSET)).cast("long")
    return (m.select("source", score_q.alias("score_q"))
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("score_q").alias("sum_score_micro"),
                 F.min("score_q").alias("min_score_micro"),
                 F.max("score_q").alias("max_score_micro"))
            .coalesce(1).orderBy("source"))
