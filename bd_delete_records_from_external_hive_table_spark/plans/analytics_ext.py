"""Second-wave extension queries: operator families the first wave left
uncovered (SURVEY §2d-§2i extension surface, §7 Phase 3/4).

New coverage here:
- full outer join (j09), TPC-H Q18 shape group-filter join (j10)
- correlated aggregate subquery (q14)
- ordered string aggregation / listagg (a11), fixed-width histogram (a12)
- first_value/last_value unbounded-frame window (w07)
- INTERSECT ALL bag semantics (u05)
- unpivot/melt (f11)
- time-series gap-fill + forward fill (ts01) — the resample/interpolate
  primitive every metrics pipeline needs
- corpus top-terms (t07) and per-label embedding centroids (e02) for the
  LLM-pipeline surface

Scale notes (100 TB design point):
- j10 aggregates the fact table BEFORE joining (group-filter first), so the
  join input is orders-of-magnitude smaller than lineitem; AQE converts the
  shrunken side to a broadcast at runtime.
- q14 computes per-nation averages as a tiny aggregate and broadcasts it —
  the correlated subquery never re-scans the fact per row.
- ts01's spine/forward-fill window is global but runs over a date spine
  (days, not rows) — thousands of rows at worst; the heavy part (daily
  aggregation) is a partial-agg shuffle on day.
- e02 reduces embeddings to |labels|×dim partial averages map-side before
  the shuffle; the per-position avg never materializes the full vector set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------

@register("j09_full_outer_join",
          "SELECT COALESCE(c.k, s.k) AS nationkey, "
          "COALESCE(c.n_cust, 0) AS n_cust, COALESCE(s.n_supp, 0) AS n_supp "
          "FROM (SELECT c_nationkey AS k, COUNT(*) AS n_cust "
          "      FROM customer GROUP BY c_nationkey) c "
          "FULL OUTER JOIN "
          "     (SELECT s_nationkey AS k, COUNT(*) AS n_supp "
          "      FROM supplier WHERE s_acctbal > 9000 GROUP BY s_nationkey) s "
          "ON c.k = s.k ORDER BY nationkey")
def j09(spark, sf_dir):
    """Full outer join of two aggregated sides; the supplier side is
    filtered to a rare predicate so unmatched rows genuinely occur and the
    null-padding path is exercised. Both inputs are post-aggregation
    (|nations| rows) — the outer join itself is trivially small regardless
    of fact-table scale."""
    cust = (_t(spark, sf_dir, "customer")
            .groupBy(F.col("c_nationkey").alias("k"))
            .agg(F.count(F.lit(1)).alias("n_cust")))
    supp = (_t(spark, sf_dir, "supplier")
            .where(F.col("s_acctbal") > 9000)
            .groupBy(F.col("s_nationkey").alias("k"))
            .agg(F.count(F.lit(1)).alias("n_supp")))
    return (cust.join(supp, "k", "full_outer")
            .select(F.col("k").alias("nationkey"),
                    F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
                    F.coalesce("n_supp", F.lit(0)).alias("n_supp"))
            .coalesce(1).orderBy("nationkey"))


@register("j10_tpch_q18_shape",
          "SELECT c_name, o_orderkey, ROUND(o_totalprice, 2) AS total_price, "
          "ROUND(q.sum_qty, 2) AS sum_qty "
          "FROM (SELECT l_orderkey, SUM(l_quantity) AS sum_qty FROM lineitem "
          "      GROUP BY l_orderkey HAVING SUM(l_quantity) > 250) q "
          "JOIN orders ON o_orderkey = q.l_orderkey "
          "JOIN customer ON c_custkey = o_custkey "
          "ORDER BY o_orderkey")
def j10(spark, sf_dir):
    """TPC-H Q18 shape (large-volume orders): aggregate-then-filter the
    fact table FIRST, then join the surviving keys back to orders/customer.
    At 100 TB the HAVING prunes ~99% of groups before any join; AQE sees
    the shrunken side and broadcast-converts the joins at runtime — no
    pins, since customer also grows with SF and must not be forced onto
    the driver."""
    big = (_t(spark, sf_dir, "lineitem")
           .groupBy("l_orderkey")
           .agg(F.sum("l_quantity").alias("sum_qty"))
           .where(F.col("sum_qty") > 250))
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    return (big.join(orders, big.l_orderkey == orders.o_orderkey)
            .join(customer, orders.o_custkey == customer.c_custkey)
            .select("c_name", "o_orderkey",
                    F.round("o_totalprice", 2).alias("total_price"),
                    F.round("sum_qty", 2).alias("sum_qty"))
            .orderBy("o_orderkey"))


@register("a13_tpch_q6_revenue",
          "SELECT CAST(ROUND(SUM(CAST(l_extendedprice * l_discount "
          "AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue FROM lineitem "
          "WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' "
          "AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00' "
          "AND l_discount >= 0.05 AND l_discount <= 0.07 "
          "AND l_quantity < 24")
def a13(spark, sf_dir):
    """TPC-H Q6 shape (forecast-revenue-change): pure filter + global sum,
    zero joins — the query where predicate pushdown IS the plan. All three
    predicates reach the parquet row-group stats. The per-row product is
    cast to DECIMAL before summing: decimal aggregation is exact and
    order-independent, so the result is bit-identical across engines and
    across any shuffle/AQE task layout — float SUM would drift with
    partition count."""
    li = _t(spark, sf_dir, "lineitem")
    return (li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount") >= 0.05) & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24))
        .select((F.col("l_extendedprice") * F.col("l_discount"))
                .cast("decimal(18,4)").alias("rev"))
        .agg(F.round(F.sum("rev"), 2).cast("double").alias("revenue")))


@register("j12_tpch_q10_shape",
          "SELECT c_custkey, c_name, n_name, revenue FROM ("
          "  SELECT c_custkey, c_name, n_name, "
          "    CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) "
          "      AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue "
          "  FROM customer "
          "  JOIN nation ON n_nationkey = c_nationkey "
          "  JOIN orders ON o_custkey = c_custkey "
          "  JOIN lineitem ON l_orderkey = o_orderkey "
          "  WHERE l_returnflag = 'R' "
          "  GROUP BY c_custkey, c_name, n_name) t "
          "ORDER BY revenue DESC, c_custkey LIMIT 20")
def j12(spark, sf_dir):
    """TPC-H Q10 shape (returned-item report): fact filtered to returns,
    two fact-side joins + one broadcast dim, revenue per customer, top-20.
    The lineitem filter runs before the join (Catalyst pushes it below),
    the nation dim broadcasts, and the final top-20 is
    TakeOrderedAndProject — no global sort materializes. Decimal sum makes
    the ranking deterministic across engines; the final revenue is cast to
    DOUBLE (2-dp values are exactly representable) so the pandas-level
    driver hash sees identical float64 on both engines."""
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    rev = (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))) \
        .cast("decimal(18,4)")
    return (cust
            .join(F.broadcast(nation),
                  nation.n_nationkey == cust.c_nationkey)
            .join(orders, orders.o_custkey == cust.c_custkey)
            .join(li, li.l_orderkey == orders.o_orderkey)
            .groupBy("c_custkey", "c_name", "n_name")
            .agg(F.round(F.sum(rev), 2).cast("double")
                 .alias("revenue"))
            .orderBy(F.desc("revenue"), "c_custkey")
            .limit(20))


@register("a14_approx_quantile", None)  # approx: rows-only + error-bound test
def a14(spark, sf_dir):
    """Approximate percentiles via percentile_approx (Greenwald-Khanna
    sketch): mergeable, single-pass, bounded-memory — the only way to get
    quantiles of a 100 TB column without a global sort. Accuracy is
    asserted against the exact percentile in tests (see
    test_analytics.py); the driver records a rows-only check since sketch
    output is engine-specific."""
    li = _t(spark, sf_dir, "lineitem")
    return (li.groupBy("l_returnflag")
            .agg(F.percentile_approx("l_extendedprice", [0.5, 0.95, 0.99],
                                     10000).alias("approx_pcts"))
            .select("l_returnflag",
                    F.round(F.col("approx_pcts")[0], 2).alias("p50"),
                    F.round(F.col("approx_pcts")[1], 2).alias("p95"),
                    F.round(F.col("approx_pcts")[2], 2).alias("p99"))
            .coalesce(1).orderBy("l_returnflag"))


# ---------------------------------------------------------------------------
# Subqueries
# ---------------------------------------------------------------------------

@register("q14_correlated_agg_subquery",
          "SELECT n_name, COUNT(*) AS n_above FROM customer "
          "JOIN nation ON n_nationkey = c_nationkey "
          "WHERE c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2 "
          "                   WHERE c2.c_nationkey = customer.c_nationkey) "
          "GROUP BY n_name ORDER BY n_name")
def q14(spark, sf_dir):
    """Correlated aggregate subquery (customers above their nation's mean
    balance), decorrelated by hand the way Catalyst would: compute the
    per-nation averages once as a tiny aggregate, broadcast it, filter.
    One scan of the fact side instead of one subquery per row."""
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    avgs = (cust.groupBy("c_nationkey")
            .agg(F.avg("c_acctbal").alias("nat_avg")))
    return (cust.join(F.broadcast(avgs), "c_nationkey")
            .where(F.col("c_acctbal") > F.col("nat_avg"))
            .groupBy("c_nationkey")
            .agg(F.count(F.lit(1)).alias("n_above"))
            .join(F.broadcast(nation),
                  F.col("c_nationkey") == F.col("n_nationkey"))
            .select("n_name", "n_above")
            .coalesce(1).orderBy("n_name"))


# ---------------------------------------------------------------------------
# Aggregations
# ---------------------------------------------------------------------------

@register("a11_listagg",
          "SELECT r_name, STRING_AGG(n_name, ',' ORDER BY n_name) AS nations "
          "FROM nation JOIN region ON n_regionkey = r_regionkey "
          "GROUP BY r_name ORDER BY r_name")
def a11(spark, sf_dir):
    """Ordered string aggregation (LISTAGG). Spark has no ordered
    string_agg; collect_list is unordered across tasks, so determinism
    comes from array_sort before the join — the canonical Spark idiom."""
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (nation.join(F.broadcast(region),
                        nation.n_regionkey == region.r_regionkey)
            .groupBy("r_name")
            .agg(F.array_join(F.array_sort(F.collect_list("n_name")), ",")
                 .alias("nations"))
            .coalesce(1).orderBy("r_name"))


@register("a12_histogram",
          "SELECT CAST(FLOOR(o_totalprice / 50000) AS BIGINT) AS bin, "
          "COUNT(*) AS n FROM orders GROUP BY bin ORDER BY bin")
def a12(spark, sf_dir):
    """Fixed-width histogram via floor-division binning — the one-pass,
    fully-parallel histogram (map-side partial counts per bin; the shuffle
    carries |bins| rows per task, not data)."""
    return (_t(spark, sf_dir, "orders")
            .select(F.floor(F.col("o_totalprice") / 50000)
                    .cast("long").alias("bin"))
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias("n"))
            .coalesce(1).orderBy("bin"))


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------

@register("w07_first_last_value",
          "SELECT o_custkey, first_day, last_day, first_price, last_price "
          "FROM (SELECT o_custkey, ROW_NUMBER() OVER w AS rn, "
          "  CAST(FIRST_VALUE(o_orderdate) OVER w2 AS DATE) AS first_day, "
          "  CAST(LAST_VALUE(o_orderdate) OVER w2 AS DATE) AS last_day, "
          "  ROUND(FIRST_VALUE(o_totalprice) OVER w2, 2) AS first_price, "
          "  ROUND(LAST_VALUE(o_totalprice) OVER w2, 2) AS last_price "
          "FROM orders WINDOW "
          "  w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), "
          "  w2 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey "
          "         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"
          ") t WHERE rn = 1 ORDER BY o_custkey")
def w07(spark, sf_dir):
    """first_value/last_value over an unbounded frame: each customer's
    first and last order (date + price), ties broken by order key so the
    result is deterministic. Partitioned window — parallel across
    customers, no global sort."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w2 = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (orders
            .select("o_custkey",
                    F.row_number().over(w).alias("rn"),
                    F.to_date(F.first("o_orderdate").over(w2))
                    .alias("first_day"),
                    F.to_date(F.last("o_orderdate").over(w2))
                    .alias("last_day"),
                    F.round(F.first("o_totalprice").over(w2), 2)
                    .alias("first_price"),
                    F.round(F.last("o_totalprice").over(w2), 2)
                    .alias("last_price"))
            .where(F.col("rn") == 1)
            .drop("rn")
            .orderBy("o_custkey"))


@register("w08_gaps_and_islands",
          "WITH daily AS ("
          "  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events), "
          "isl AS ("
          "  SELECT user_id, d, d - CAST(ROW_NUMBER() OVER ("
          "    PARTITION BY user_id ORDER BY d) AS INTEGER) AS grp "
          "  FROM daily), "
          "streaks AS ("
          "  SELECT user_id, grp, COUNT(*) AS len "
          "  FROM isl GROUP BY user_id, grp) "
          "SELECT user_id, MAX(len) AS max_streak FROM streaks "
          "GROUP BY user_id ORDER BY max_streak DESC, user_id LIMIT 20")
def w08(spark, sf_dir):
    """Gaps-and-islands: longest consecutive-day activity streak per
    user via the row_number-difference trick (consecutive days share
    ``day − row_number``). Position-based islands complement st03's
    time-gap sessionization. All three aggregation layers are keyed on
    user_id, so partial aggregation and one hash shuffle per layer carry
    the whole computation — no global sort until the final top-20
    (TakeOrderedAndProject)."""
    ev = _t(spark, sf_dir, "events")
    daily = (ev.select("user_id", F.to_date("ts").alias("d")).distinct())
    w = Window.partitionBy("user_id").orderBy("d")
    isl = daily.select(
        "user_id", "d",
        F.date_sub("d", F.row_number().over(w)).alias("grp"))
    streaks = (isl.groupBy("user_id", "grp")
               .agg(F.count(F.lit(1)).alias("len")))
    return (streaks.groupBy("user_id")
            .agg(F.max("len").alias("max_streak"))
            .orderBy(F.desc("max_streak"), "user_id")
            .limit(20))


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------

@register("u05_intersect_all",
          "SELECT l_quantity, COUNT(*) AS n FROM ("
          "  SELECT l_quantity FROM lineitem WHERE l_returnflag = 'R' "
          "  INTERSECT ALL "
          "  SELECT l_quantity FROM lineitem WHERE l_returnflag = 'A') t "
          "GROUP BY l_quantity ORDER BY l_quantity")
def u05(spark, sf_dir):
    """INTERSECT ALL (bag semantics: multiplicity = min of the two sides'
    counts), summarized per value so the declared output stays small. The
    underlying plan is a single hash aggregation per side + join on the
    value — no row-by-row matching."""
    li = _t(spark, sf_dir, "lineitem")
    r = li.where(F.col("l_returnflag") == "R").select("l_quantity")
    a = li.where(F.col("l_returnflag") == "A").select("l_quantity")
    return (r.intersectAll(a)
            .groupBy("l_quantity")
            .agg(F.count(F.lit(1)).alias("n"))
            .coalesce(1).orderBy("l_quantity"))


# ---------------------------------------------------------------------------
# Reshaping
# ---------------------------------------------------------------------------

@register("f11_unpivot",
          "SELECT * FROM ("
          "  SELECT c_nationkey, 'min_bal' AS metric, "
          "         ROUND(MIN(c_acctbal), 2) AS val "
          "  FROM customer GROUP BY c_nationkey "
          "  UNION ALL "
          "  SELECT c_nationkey, 'max_bal' AS metric, "
          "         ROUND(MAX(c_acctbal), 2) AS val "
          "  FROM customer GROUP BY c_nationkey) t "
          "ORDER BY c_nationkey, metric")
def f11(spark, sf_dir):
    """Unpivot (melt): wide per-nation metrics to long (nation, metric,
    value) rows — the inverse of a09's pivot. Spark's native ``unpivot``
    is a zero-shuffle narrow transform. Metrics are min/max (exact — no
    accumulation-order float drift across engines)."""
    wide = (_t(spark, sf_dir, "customer")
            .groupBy("c_nationkey")
            .agg(F.round(F.min("c_acctbal"), 2).alias("min_bal"),
                 F.round(F.max("c_acctbal"), 2).alias("max_bal")))
    return (wide.unpivot("c_nationkey", ["min_bal", "max_bal"],
                         "metric", "val")
            .coalesce(1).orderBy("c_nationkey", "metric"))


# ---------------------------------------------------------------------------
# Time series: resample + gap-fill + forward fill
# ---------------------------------------------------------------------------

@register("ts01_gap_fill",
          "WITH daily AS ("
          "  SELECT CAST(ts AS DATE) AS day, ROUND(SUM(value), 2) AS v "
          "  FROM events WHERE event_type = 'purchase' AND value > 180 "
          "  GROUP BY day), "
          "spine AS ("
          "  SELECT UNNEST(generate_series((SELECT MIN(day) FROM daily), "
          "    (SELECT MAX(day) FROM daily), INTERVAL 1 DAY))::DATE AS day) "
          "SELECT s.day, last_value(d.v IGNORE NULLS) OVER ("
          "  ORDER BY s.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
          ") AS v_filled "
          "FROM spine s LEFT JOIN daily d USING (day) ORDER BY s.day")
def ts01(spark, sf_dir):
    """Resample-to-daily with gap-fill and forward-fill — the time-series
    primitive (TimescaleDB ``time_bucket_gapfill`` + ``locf`` shape).
    Build a dense date spine with ``sequence``, left-join the sparse daily
    aggregate, forward-fill with ``last(ignorenulls)``. The global window
    runs over the *spine* (days), not events — thousands of rows even for
    decades of data; the heavy daily aggregation is an ordinary partial-agg
    shuffle. The filter keeps only rare high-value purchases so the series
    genuinely has gaps to fill."""
    ev = _t(spark, sf_dir, "events")
    daily = (ev.where((F.col("event_type") == "purchase")
                      & (F.col("value") > 180))
             .groupBy(F.to_date("ts").alias("day"))
             .agg(F.round(F.sum("value"), 2).alias("v")))
    spine = (daily.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
             .select(F.explode(F.sequence("lo", "hi")).alias("day")))
    w = (Window.orderBy("day")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (spine.join(daily, "day", "left")
            .select("day",
                    F.last("v", ignorenulls=True).over(w).alias("v_filled"))
            .coalesce(1).orderBy("day"))


# ---------------------------------------------------------------------------
# LLM-pipeline: corpus top terms, embedding centroids
# ---------------------------------------------------------------------------

_STOPWORDS = ("that", "with", "this", "from", "have", "been", "were",
              "their", "which", "said", "will", "would", "there",
              "what", "when", "your", "they", "them", "then", "than",
              "into", "over", "only", "also", "some", "more", "other")


@register("t07_top_terms",
          "SELECT token, COUNT(*) AS n FROM ("
          "  SELECT UNNEST(regexp_split_to_array(LOWER(text), '[^a-z]+')) "
          "  AS token FROM documents) t "
          "WHERE LENGTH(token) > 3 AND token NOT IN ("
          + ", ".join(f"'{w}'" for w in _STOPWORDS) +
          ") GROUP BY token ORDER BY n DESC, token LIMIT 20")
def t07(spark, sf_dir):
    """Corpus top-terms (the word-count of LLM data work): lowercase,
    split on non-alpha, drop short tokens + stopwords, count, top-20 with
    a deterministic tie-break. Catalyst plans the limit as
    TakeOrderedAndProject — only 20 rows per partition survive the
    shuffle, never the full term dictionary."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.split(F.lower("text"), "[^a-z]+"))
                       .alias("token"))
    return (toks.where((F.length("token") > 3)
                       & (~F.col("token").isin(list(_STOPWORDS))))
            .groupBy("token")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), "token")
            .limit(20))


@register("e02_embedding_centroids",
          "SELECT label, ROUND(SQRT(SUM(m * m)), 4) AS centroid_norm FROM ("
          "  SELECT label, pos, AVG(v) AS m FROM ("
          "    SELECT label, UNNEST(embedding) AS v, "
          "           generate_subscripts(embedding, 1) AS pos "
          "    FROM embeddings) x GROUP BY label, pos) c "
          "GROUP BY label ORDER BY label")
def e02(spark, sf_dir):
    """Per-label embedding centroid (L2 norm reported): posexplode to
    (label, position, component), average per position, fold back to a
    norm. Map-side partial aggregation reduces each task's contribution to
    |labels|x|dim| partial sums before the shuffle — the full vector set
    never moves. This is the building block for IVF coarse quantizers and
    class prototypes."""
    emb = _t(spark, sf_dir, "embeddings")
    ex = emb.select("label", F.posexplode("embedding").alias("pos", "v"))
    comp = ex.groupBy("label", "pos").agg(F.avg("v").alias("m"))
    return (comp.groupBy("label")
            .agg(F.round(F.sqrt(F.sum(F.col("m") * F.col("m"))), 4)
                 .alias("centroid_norm"))
            .coalesce(1).orderBy("label"))
