"""Fourteenth-wave queries (round 8, batch 4): lexical diversity,
robust trend estimation, and duplicate-graph health.

- t28 MATTR lexical diversity (Covington & McFall 2010, public): the
  moving-average type-token ratio — mean distinct-token count over
  every 25-token window of a doc — is the length-invariant form of
  TTR (raw TTR falls with doc length, so it can't compare sources).
  Per-position distinct counts are integers; each doc's MATTR is ONE
  offset-free BIGINT division (numerator positive by construction),
  and the per-source report aggregates those exact integers.
- ts11 Theil-Sen robust trend (Theil 1950 / Sen 1968, public): the
  median of pairwise daily-revenue slopes per event type — the
  outlier-resistant alternative to the OLS slope (one spiked day
  drags OLS; it moves at most half the pairwise slopes). Slopes are
  exact integer micro-cents/day (offset-shifted so floor == truncate
  across engines); the median is the LOWER order statistic, so the
  reported value is always an actually-occurring slope and is
  order-independent under ties. Pair space is calendar-bounded
  (days²/2 per type — ts06/ts07's rationale), NEVER event-bounded.
- g03 duplicate-graph degree assortativity (Newman 2002, public):
  over the MinHash-LSH verified near-dup graph (d04/d15's pipeline),
  the Pearson correlation of endpoint degrees across directed edges —
  positive means heavy duplicators cluster together (template farms),
  negative means hubs attach to leaves (one canonical doc with many
  variants). All sums are exact BIGINTs on bounded degrees; the
  closed form touches floats in one fixed expression tree (ml04's
  argument), so the 6-dp value is engine-identical. The oracle
  replays the full LSH pipeline (shared constants), as d15/d16.

Reference anchor: widens the declared-query surface admitted by the
reference's SQL boundary (DeletionCriteria.java:40-63), as waves 1-13.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import dedup
from ..sources.tables import load_table
from .analytics_wave9 import _LSH_PAIRS_CTES
from .llm_ops import _aug_full_neardup
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# t28: MATTR moving-average type-token ratio
# ---------------------------------------------------------------------------

@register("t28_mattr_diversity",
          "WITH d AS (SELECT source, "
          "  list_filter(string_split_regex(lower(text), '[^a-z]+'), "
          "  t -> t <> '') AS ts FROM documents), "
          "m AS (SELECT source, "
          "  CAST(list_sum(list_transform(range(1, len(ts) - 23), "
          "  i -> len(list_distinct(ts[i:i+24])))) AS BIGINT) AS ttr_sum, "
          "  CAST(len(ts) - 24 AS BIGINT) AS p "
          "  FROM d WHERE len(ts) >= 25), "
          "q AS (SELECT source, (ttr_sum * 1000000) // (25 * p) "
          "  AS mattr_micro FROM m) "
          "SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, "
          "CAST(SUM(mattr_micro) // COUNT(*) AS BIGINT) AS avg_mattr_micro,"
          "CAST(MIN(mattr_micro) AS BIGINT) AS min_mattr_micro, "
          "CAST(MAX(mattr_micro) AS BIGINT) AS max_mattr_micro "
          "FROM q GROUP BY source ORDER BY source")
def t28(spark, sf_dir):
    """MATTR-25 per source: every 25-token window's distinct count,
    averaged over the doc's W−24 positions, as ONE exact BIGINT
    division per doc (Σ distinct · 10⁶ div 25·P — numerator and
    denominator positive, so floor == truncate on both engines). The
    length-invariant lexical-diversity signal raw TTR cannot give:
    repetitive/boilerplate sources sink toward the template's window
    diversity however long their docs run. Scale shape: one scan, one
    codegen HOF per doc (O(W·25) array work, zero shuffles before the
    |sources|-key rollup); docs under 25 tokens have no window and are
    excluded on both engines by the same size filter."""
    docs = _t(spark, sf_dir, "documents")
    ts = F.filter(F.split(F.lower("text"), "[^a-z]+"),
                  lambda t: t != F.lit(""))
    d = (docs.select("source", ts.alias("ts"))
         .where(F.size("ts") >= 25))
    ttr_sum = F.aggregate(
        F.transform(F.sequence(F.lit(1), F.size("ts") - 24),
                    lambda i: F.size(F.array_distinct(
                        F.slice("ts", i, F.lit(25))))),
        F.lit(0).cast("long"), lambda acc, v: acc + v)
    m = d.select("source", ttr_sum.alias("ttr_sum"),
                 (F.size("ts") - 24).cast("long").alias("p"))
    q = m.select("source",
                 F.expr("(ttr_sum * 1000000) div (25 * p)")
                 .alias("mattr_micro"))
    return (q.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.expr("sum(mattr_micro) div count(1)")
                 .alias("avg_mattr_micro"),
                 F.min("mattr_micro").alias("min_mattr_micro"),
                 F.max("mattr_micro").alias("max_mattr_micro"))
            .coalesce(1).orderBy("source"))


# ---------------------------------------------------------------------------
# ts11: Theil-Sen robust trend per event type
# ---------------------------------------------------------------------------

#: keeps every pairwise-slope numerator positive: |Δrev| in micro-cents
#: is bounded by max-daily-revenue·10⁶ (≈10¹⁴ at sf10) and dd ≥ 1, so
#: OFF·dd ≥ 10¹⁵ dominates — floor == truncate on both engines.
_TS11_OFF = 1_000_000_000_000_000

@register("ts11_theil_sen_trend",
          "WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day, "
          "  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) "
          "  AS cents FROM events GROUP BY event_type, CAST(ts AS DATE)),"
          "pr AS (SELECT a.event_type, "
          "  datediff('day', a.day, b.day) AS dd, "
          "  b.cents - a.cents AS dv "
          "  FROM daily a JOIN daily b ON a.event_type = b.event_type "
          "  AND a.day < b.day), "
          "sl AS (SELECT event_type, "
          f"  (dv * 1000000 + {_TS11_OFF} * dd) // dd - {_TS11_OFF} "
          "  AS slope_micro FROM pr), "
          "rk AS (SELECT event_type, slope_micro, "
          "  ROW_NUMBER() OVER (PARTITION BY event_type "
          "  ORDER BY slope_micro) AS rn, "
          "  COUNT(*) OVER (PARTITION BY event_type) AS cnt FROM sl) "
          "SELECT event_type, "
          "CAST(MAX(cnt) AS BIGINT) AS n_pairs, "
          "CAST(MAX(CASE WHEN rn = (cnt + 1) // 2 THEN slope_micro END) "
          "  AS BIGINT) AS theil_sen_micro "
          "FROM rk GROUP BY event_type ORDER BY event_type")
def ts11(spark, sf_dir):
    """Theil-Sen trend of daily revenue per event type: the LOWER
    median of all pairwise slopes (Δcents·10⁶ div Δdays, offset-
    shifted exact integers), i.e. the robust cents-per-day drift a
    single spiked day cannot drag (it perturbs at most n−1 of the
    ~n²/2 pairwise slopes, never the median's neighborhood). The
    lower order statistic keeps the answer an actually-occurring
    slope AND makes it deterministic under duplicate slope values —
    an even-count averaged median would reintroduce a float. Scale
    shape: events collapse to ≤|days| rows per type in one map-side-
    combined rollup BEFORE the pair join, so the self-join is
    calendar-bounded (days²/2 per type — ts06/ts07's rationale),
    never event-bounded; the median window walks pair rows per type.
    Arithmetic headroom (the g03 overflow audit): the offset-shifted
    slope numerator |Δcents|·10⁶ + OFF·Δdays tops out near 3.7·10¹⁷
    for a year of days and stays exact while daily revenue is under
    9.2·10¹² cents/day (~$92B/day) — orders past any real stream."""
    ev = _t(spark, sf_dir, "events")
    daily = (ev.groupBy("event_type",
                        F.col("ts").cast("date").alias("day"))
             .agg(F.sum(F.round(F.col("value") * 100).cast("long"))
                  .alias("cents")))
    a = daily.select("event_type", F.col("day").alias("da"),
                     F.col("cents").alias("ca"))
    b = daily.select("event_type", F.col("day").alias("db"),
                     F.col("cents").alias("cb"))
    pr = (a.join(b, "event_type")
          .where(F.col("da") < F.col("db"))
          .select("event_type",
                  F.datediff("db", "da").cast("long").alias("dd"),
                  (F.col("cb") - F.col("ca")).alias("dv")))
    sl = pr.select("event_type", F.expr(
        f"(dv * 1000000 + {_TS11_OFF}L * dd) div dd - {_TS11_OFF}L")
        .alias("slope_micro"))
    w = Window.partitionBy("event_type").orderBy("slope_micro")
    cw = Window.partitionBy("event_type")
    rk = sl.select("event_type", "slope_micro",
                   F.row_number().over(w).alias("rn"),
                   F.count(F.lit(1)).over(cw).alias("cnt"))
    return (rk.groupBy("event_type")
            .agg(F.max("cnt").alias("n_pairs"),
                 F.max(F.when(F.col("rn") == F.expr("(cnt + 1) div 2"),
                              F.col("slope_micro")))
                 .alias("theil_sen_micro"))
            .coalesce(1).orderBy("event_type"))


# ---------------------------------------------------------------------------
# g03: duplicate-graph degree assortativity
# ---------------------------------------------------------------------------

@register("g03_dup_graph_assortativity",
          "WITH " + _LSH_PAIRS_CTES + ", "
          "und AS (SELECT a AS s, b AS d FROM pairs "
          "UNION ALL SELECT b, a FROM pairs), "
          "deg AS (SELECT s AS node, CAST(COUNT(*) AS BIGINT) AS dg "
          "FROM und GROUP BY s), "
          "ed AS (SELECT da.dg AS x, db.dg AS y FROM und "
          "JOIN deg da ON da.node = und.s "
          "JOIN deg db ON db.node = und.d), "
          "sm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m, "
          "  CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy, "
          "  CAST(SUM(x * y) AS BIGINT) AS sxy, "
          "  CAST(SUM(x * x) AS BIGINT) AS sxx, "
          "  CAST(SUM(y * y) AS BIGINT) AS syy FROM ed), "
          "wide AS (SELECT "
          "  CAST(m AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS num, "
          "  CAST(m AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS vx, "
          "  CAST(m AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS vy "
          "  FROM sm) "
          "SELECT CAST((SELECT COUNT(*) FROM deg) AS BIGINT) AS n_nodes, "
          "CAST((SELECT COUNT(*) FROM pairs) AS BIGINT) AS n_edges, "
          "CAST((SELECT MAX(dg) FROM deg) AS BIGINT) AS max_degree, "
          "CASE WHEN vx = 0 OR vy = 0 THEN NULL ELSE "
          "ROUND(CAST(num AS DOUBLE) / "
          "(SQRT(CAST(vx AS DOUBLE)) * SQRT(CAST(vy AS DOUBLE))), 6) END "
          "AS assortativity FROM wide")
def g03(spark, sf_dir):
    """Degree assortativity of the verified near-dup graph: Pearson r
    of endpoint degrees over DIRECTED edges (each undirected pair
    contributes both orientations — Newman's convention, which makes
    the statistic symmetric without special-casing). Positive ⇒
    duplicate-heavy docs pair with each other (template farms, mirror
    sets); negative ⇒ star shapes (one canonical, many variants) —
    the triage signal for which dedup strategy (cluster-collapse vs
    survivor-pick) fits the corpus. All five sums are exact BIGINTs
    (degrees are small integers); the closed form touches doubles in
    one fixed expression tree over identical inputs (ml04's
    determinism argument: num/den-shaped single IEEE ops + correctly-
    rounded SQRT), so 6-dp rounding cannot straddle engines. The
    oracle replays the FULL LSH pipeline (d15's shared constants).
    Scale shape: pairs are band-bucketed (never doc×doc); the degree
    aggregate and the two mark-back joins are node-keyed and PINNED
    shuffle_hash (corpus-growing frames downstream of a checkpoint —
    the PLANS.md:405 class); output is one row."""
    aug = _aug_full_neardup(spark, sf_dir).localCheckpoint(eager=False)
    pairs = dedup.minhash_near_duplicates(
        aug, num_hashes=32, bands=8, shingle_size=3, threshold=0.5)
    pairs = pairs.localCheckpoint(eager=False)
    und = (pairs.select(F.col("a").alias("s"), F.col("b").alias("d"))
           .unionByName(pairs.select(F.col("b").alias("s"),
                                     F.col("a").alias("d"))))
    und = und.localCheckpoint(eager=False)
    deg = und.groupBy(F.col("s").alias("node")) \
             .agg(F.count(F.lit(1)).alias("dg"))
    da = deg.select(F.col("node").alias("s"), F.col("dg").alias("x"))
    db = deg.select(F.col("node").alias("d"), F.col("dg").alias("y"))
    ed = (und.join(da.hint("shuffle_hash"), "s")
          .join(db.hint("shuffle_hash"), "d"))
    sm = ed.agg(F.count(F.lit(1)).alias("m"),
                F.sum("x").alias("sx"), F.sum("y").alias("sy"),
                F.sum(F.col("x") * F.col("y")).alias("sxy"),
                F.sum(F.col("x") * F.col("x")).alias("sxx"),
                F.sum(F.col("y") * F.col("y")).alias("syy"))
    nn = deg.agg(F.count(F.lit(1)).alias("n_nodes"),
                 F.max("dg").alias("max_degree"))
    ne = pairs.agg(F.count(F.lit(1)).alias("n_edges"))
    # wide-integer products: the BIGINT sums themselves are safe
    # (Σx·y ≈ edges·deg² ≈ 7·10¹² at sf10) but m·sxy reaches ~10²¹ on
    # the replica corpus's 3·10⁸-edge graph — the sf10 scaling run
    # found the int64 overflow. DECIMAL(19,0)×DECIMAL(19,0) →
    # DECIMAL(38,0) stays exact to 10³⁸ (DuckDB side: HUGEINT), and
    # the int→double conversions that follow are correctly rounded on
    # both engines, so determinism is unchanged.
    def _d(c: str):
        return F.col(c).cast("decimal(19,0)")
    vx = _d("m") * _d("sxx") - _d("sx") * _d("sx")
    vy = _d("m") * _d("syy") - _d("sy") * _d("sy")
    num = _d("m") * _d("sxy") - _d("sx") * _d("sy")
    assort = (num.cast("double")
              / (F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double"))))
    return (sm.crossJoin(nn).crossJoin(ne)  # three 1-row frames
            .select("n_nodes", "n_edges", "max_degree",
                    F.when((vx == 0) | (vy == 0), F.lit(None))
                     .otherwise(F.round(assort, 6))
                     .alias("assortativity")))
