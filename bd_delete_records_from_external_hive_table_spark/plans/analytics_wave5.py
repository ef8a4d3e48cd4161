"""Fifth-wave extension queries: the LAST three classic TPC-H shapes the
registry lacked — with these, all 22 TPC-H query shapes are covered,
adapted to the synthetic schema (no partsupp table; Q2/Q11 swap in a
lineitem-derived offer/value relation that preserves the original
query's join + subquery structure).

New coverage here:
- Q5  local-supplier volume: the customer-nation == supplier-nation
  equi-constraint inside a 6-way star (j20)
- Q2  min-cost supplier: correlated MIN subquery over a join,
  decorrelated into a window over the part key (q19)
- Q11 important parts: grouped value vs a scalar fraction-of-total
  threshold in HAVING (a22)

Scale notes (100 TB design point):
- j20 carries c_nationkey through the orders join and applies the
  locality constraint at the customer join — no extra shuffle beyond
  the three fact-key exchanges AQE already plans; nation/region pin
  broadcast (SF-invariant), supplier/customer go through the
  size-guarded ``dim`` helper.
- q19's correlated "= (SELECT MIN ...)" decorrelates as a window MIN
  over l_partkey on the region-filtered offer relation: ONE shuffle
  by part key serves both the per-part minimum and the equality
  filter — no second scan, no per-row subquery. Unit price is an IEEE
  double division of identical inputs on both engines, so MIN-equality
  ties are bit-exact.
- a22's fraction threshold is the multiply-compare form
  ``value * 1000 > total`` in exact decimals (never
  ``value > 0.001 * total`` with a float fraction), so no
  boundary-group can flip between engines; the scalar total re-sums
  the |parts|-grained group sums (decimal addition is associative-
  exact) instead of rescanning the fact.

Reference anchor: widens the declared-query surface admitted by the
reference's SQL boundary (DeletionCriteria.java:40-63,
HiveTableOperations.java:71-116) the same way waves 1-4 do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import dim, load_table
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


_REV = "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))"


def _rev():
    return (F.col("l_extendedprice")
            * (1 - F.col("l_discount"))).cast("decimal(18,4)")


@register("j20_tpch_q5_shape",
          "SELECT n_name, CAST(ROUND(SUM(" + _REV + "), 2) AS DOUBLE) AS revenue "
          "FROM customer "
          "JOIN orders ON c_custkey = o_custkey "
          "JOIN lineitem ON l_orderkey = o_orderkey "
          "JOIN supplier ON l_suppkey = s_suppkey "
          "                 AND c_nationkey = s_nationkey "
          "JOIN nation ON s_nationkey = n_nationkey "
          "JOIN region ON n_regionkey = r_regionkey "
          "WHERE r_name = 'ASIA' "
          "  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' "
          "  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00' "
          "GROUP BY n_name "
          "ORDER BY revenue DESC, n_name")
def j20(spark, sf_dir):
    """TPC-H Q5 shape (local-supplier volume): revenue only counts when
    the customer and the supplier share a nation, and the nation must
    sit in one region. The locality constraint ``c_nationkey ==
    s_nationkey`` rides along the customer equi-join (carried through
    orders) instead of becoming a post-join filter on a wider result.
    The region pre-filter shrinks nation to ~1/5 BEFORE it reaches the
    supplier join, so the supplier side is region-pruned at the scan.
    nation/region pin broadcast (25/5 rows at any SF); supplier and
    customer use the size-guarded ``dim`` — AQE decides above the pin
    threshold. The date range pushes into the orders scan."""
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA") \
        .select("r_regionkey")
    nation = (_t(spark, sf_dir, "nation")
              .join(F.broadcast(region),
                    F.col("n_regionkey") == F.col("r_regionkey"))
              .select("n_nationkey", "n_name"))
    supp = (_t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
            .join(F.broadcast(nation),
                  F.col("s_nationkey") == F.col("n_nationkey")))
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate")
         >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate")
           < F.lit("1997-01-01 00:00:00").cast("timestamp"))) \
        .select("o_orderkey", "o_custkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    return (li
            .join(dim(supp, sf_dir, "supplier"),
                  li.l_suppkey == supp.s_suppkey)
            .join(orders, li.l_orderkey == orders.o_orderkey)
            .join(dim(cust, sf_dir, "customer"),
                  (orders.o_custkey == cust.c_custkey)
                  & (F.col("c_nationkey") == F.col("s_nationkey")))
            .groupBy("n_name")
            .agg(F.round(F.sum(_rev()), 2).cast("double").alias("revenue"))
            .coalesce(1).orderBy(F.desc("revenue"), "n_name"))


@register("q19_tpch_q2_shape",
          "WITH offers AS ("
          "  SELECT l_partkey, l_suppkey, "
          "         MIN(l_extendedprice / l_quantity) AS unit_price "
          "  FROM lineitem GROUP BY l_partkey, l_suppkey), "
          "region_offers AS ("
          "  SELECT l_partkey, l_suppkey, unit_price, "
          "         s_acctbal, s_name, n_name "
          "  FROM offers "
          "  JOIN supplier ON l_suppkey = s_suppkey "
          "  JOIN nation ON s_nationkey = n_nationkey "
          "  JOIN region ON n_regionkey = r_regionkey "
          "  WHERE r_name = 'EUROPE') "
          "SELECT s_acctbal, s_name, n_name, p_partkey, p_type, unit_price "
          "FROM part JOIN region_offers ON p_partkey = l_partkey "
          "WHERE p_size <= 10 AND p_type = 'ECONOMY' "
          "  AND unit_price = (SELECT MIN(r2.unit_price) "
          "                    FROM region_offers r2 "
          "                    WHERE r2.l_partkey = p_partkey) "
          "ORDER BY s_acctbal DESC, n_name, s_name, p_partkey, l_suppkey "
          "LIMIT 100")
def q19(spark, sf_dir):
    """TPC-H Q2 shape (min-cost supplier): for each small ECONOMY part,
    the European suppliers whose historical unit price equals that
    part's regional minimum — the classic correlated-MIN-over-a-join.
    No partsupp table exists, so the offer relation derives from
    lineitem: MIN(l_extendedprice/l_quantity) per (part, supplier).

    Decorrelation: the per-part minimum is a window MIN over l_partkey
    on the region-filtered offers — the part-key shuffle that the
    part join needs anyway co-locates the window, so the correlated
    subquery costs zero extra exchanges and the offer relation is
    built (and scanned) exactly once. Unit price is double/double IEEE
    division of identical inputs, so the MIN-equality keeps ties
    bit-exact across engines; the ORDER BY carries the full
    (part, supplier) key so LIMIT 100 is deterministic."""
    part = _t(spark, sf_dir, "part").where(
        (F.col("p_size") <= 10) & (F.col("p_type") == "ECONOMY")) \
        .select("p_partkey", "p_type")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("up"))
    # The correlated minimum is per-part, so parts outside the size/type
    # filter can never influence a surviving row — semi-joining the fact
    # against the filtered part keys BEFORE the offer aggregate prunes
    # ~97% of the aggregation input (and, broadcast, it prunes at the
    # scan). The oracle keeps the unpruned formulation; results are
    # provably identical.
    li = li.join(dim(part.select("p_partkey"), sf_dir, "part"),
                 li.l_partkey == F.col("p_partkey"), "left_semi")
    offers = (li.groupBy("l_partkey", "l_suppkey")
              .agg(F.min("up").alias("unit_price")))
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE") \
        .select("r_regionkey")
    nation = (_t(spark, sf_dir, "nation")
              .join(F.broadcast(region),
                    F.col("n_regionkey") == F.col("r_regionkey"))
              .select("n_nationkey", "n_name"))
    supp = (_t(spark, sf_dir, "supplier")
            .select("s_suppkey", "s_nationkey", "s_acctbal", "s_name")
            .join(F.broadcast(nation),
                  F.col("s_nationkey") == F.col("n_nationkey"))
            .select("s_suppkey", "s_acctbal", "s_name", "n_name"))
    region_offers = offers.join(dim(supp, sf_dir, "supplier"),
                                offers.l_suppkey == supp.s_suppkey)
    w = Window.partitionBy("l_partkey")
    return (region_offers
            .join(dim(part, sf_dir, "part"),
                  region_offers.l_partkey == part.p_partkey)
            .withColumn("min_price", F.min("unit_price").over(w))
            .where(F.col("unit_price") == F.col("min_price"))
            .orderBy(F.desc("s_acctbal"), "n_name", "s_name",
                     "p_partkey", "l_suppkey")
            .limit(100)
            .select("s_acctbal", "s_name", "n_name", "p_partkey",
                    "p_type", "unit_price"))


def _a22_by_part(spark, sf_dir):
    """a22's pre-checkpoint per-part value view, exposed so the plan
    test can pin the ONE-lineitem-scan property that the checkpoint's
    lineage truncation hides from the final plan."""
    nation = _t(spark, sf_dir, "nation") \
        .where(F.col("n_name") == "NATION_5").select("n_nationkey")
    supp = (_t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
            .join(F.broadcast(nation),
                  F.col("s_nationkey") == F.col("n_nationkey"))
            .select("s_suppkey"))
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
    return (li.join(dim(supp, sf_dir, "supplier"),
                    li.l_suppkey == supp.s_suppkey)
            .groupBy("l_partkey")
            .agg(F.sum(_rev()).alias("part_value")))


@register("a22_tpch_q11_shape",
          "WITH value_by_part AS ("
          "  SELECT l_partkey, SUM(" + _REV + ") AS part_value "
          "  FROM lineitem "
          "  JOIN supplier ON l_suppkey = s_suppkey "
          "  JOIN nation ON s_nationkey = n_nationkey "
          "  WHERE n_name = 'NATION_5' "
          "  GROUP BY l_partkey) "
          "SELECT l_partkey, "
          "       CAST(ROUND(part_value, 2) AS DOUBLE) AS part_value "
          "FROM value_by_part "
          "WHERE part_value * 1000 > "
          "      (SELECT SUM(part_value) FROM value_by_part) "
          "ORDER BY part_value DESC, l_partkey")
def a22(spark, sf_dir):
    """TPC-H Q11 shape (important parts): per-part value within one
    nation's suppliers, kept only when the part carries more than a
    fixed fraction (0.1%) of the nation's total value. No partsupp
    table, so "value" derives from lineitem revenue.

    The scalar total is a re-aggregate of the |parts|-grained group
    sums — NOT a second fact scan: ``by_part`` is materialized once
    (lazy ``localCheckpoint``) and the total computed as a 1-row
    aggregate broadcast back via cross join. Unlike the previous
    global-window form this never funnels the |parts| rows through a
    single task — the scalar agg's final stage sees one partial sum
    per partition, so it stays O(partitions) even when parts grow
    with SF (SF x 200k; billions of rows at a genuine 100 TB).
    Decimal addition is associative-exact, so re-summing group sums
    equals summing rows, and the threshold keeps the multiply-compare
    form ``part_value * 1000 > total`` in exact decimals: an
    equivalent float-fraction form could flip a boundary group
    between engines."""
    by_part = _a22_by_part(spark, sf_dir).localCheckpoint(eager=False)
    total = by_part.agg(F.sum("part_value").alias("total_value"))
    return (by_part
            .crossJoin(F.broadcast(total))
            .where(F.col("part_value") * 1000 > F.col("total_value"))
            .select("l_partkey",
                    F.round("part_value", 2).cast("double")
                    .alias("part_value"))
            .coalesce(1).orderBy(F.desc("part_value"), "l_partkey"))


@register("w10_retention_cohorts",
          "WITH firsts AS (SELECT user_id, "
          "  CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week "
          "  FROM events GROUP BY user_id), "
          "activity AS (SELECT DISTINCT e.user_id, f.cohort_week, "
          "  CAST(date_trunc('week', e.ts) AS DATE) AS w "
          "  FROM events e JOIN firsts f ON e.user_id = f.user_id) "
          "SELECT cohort_week, "
          "CAST(date_diff('day', cohort_week, w) // 7 AS BIGINT) "
          "  AS week_n, "
          "CAST(COUNT(*) AS BIGINT) AS n_users "
          "FROM activity GROUP BY cohort_week, week_n "
          "ORDER BY cohort_week, week_n")
def w10(spark, sf_dir):
    """Weekly retention cohorts: users grouped by first-activity week,
    counted in each subsequent week they return — the classic retention
    triangle. Three bounded shuffles: (1) groupBy(user) MIN(ts) — the
    heavy one, partial-aggregated map-side so the exchange carries one
    row per user, not per event; (2) the events⨝firsts join reuses the
    same user_id hash partitioning (no re-exchange of the already-
    shuffled side under AQE) and is broadcast-convertible when the user
    dimension is small; (3) the (user, cohort, week) DISTINCT and the
    final (cohort, week_n) rollup collapse into one exchange because
    the grouping keys are a prefix. Week arithmetic stays integral
    (both truncations are Mondays, so the day difference is an exact
    multiple of 7) — no float date math to drift between engines."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    firsts = (ev.groupBy("user_id")
              .agg(F.date_trunc("week", F.min("ts")).cast("date")
                   .alias("cohort_week")))
    activity = (ev.select("user_id",
                          F.date_trunc("week", "ts").cast("date").alias("w"))
                .join(firsts, "user_id")
                .select("user_id", "cohort_week", "w")
                .distinct())
    week_n = F.floor(F.datediff("w", "cohort_week") / 7).cast("long")
    return (activity
            .groupBy("cohort_week", week_n.alias("week_n"))
            .agg(F.count("*").cast("long").alias("n_users"))
            .coalesce(1).orderBy("cohort_week", "week_n"))


@register("a23_salted_skew_agg",
          "SELECT k, CAST(COUNT(*) AS BIGINT) AS n, "
          "CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) "
          "  AS total, "
          "MIN(value) AS vmin, MAX(value) AS vmax "
          "FROM (SELECT CASE WHEN event_id % 2 = 0 THEN 'hot' "
          "             ELSE event_type END AS k, value FROM events) "
          "GROUP BY k ORDER BY k")
def a23(spark, sf_dir):
    """Skew-safe two-stage aggregation, certified exact: half the corpus
    is forced onto one 'hot' key (the null-key / default-tenant shape
    that AQE's skew handling cannot fix for groupBy), then aggregated
    through ``operators.skew.salted_aggregate`` — stage 1 groups on
    (key, salt) so the hottest stage-1 task is bounded at ~1/16 of the
    hot key, stage 2 combines |keys|x16 partial rows. The oracle is the
    plain GROUP BY: salting must be a pure plan-level rewrite with
    bit-identical results (sums ride exact decimals, so combine order
    cannot drift them; count/min/max are order-free)."""
    from ..operators.skew import salted_aggregate
    ev = load_table(spark, sf_dir, "events").select(
        F.when(F.col("event_id") % 2 == 0, F.lit("hot"))
        .otherwise(F.col("event_type")).alias("k"),
        "value", F.col("value").cast("decimal(18,4)").alias("vdec"))
    out = salted_aggregate(
        ev, keys=["k"],
        aggs={"n": ("count", "value"), "dec_total": ("sum", "vdec"),
              "vmin": ("min", "value"), "vmax": ("max", "value")},
        salt_buckets=16)
    return (out.select(
        "k", F.col("n").cast("long").alias("n"),
        F.round("dec_total", 2).cast("double").alias("total"),
        "vmin", "vmax")
        .coalesce(1).orderBy("k"))


@register("w11_event_funnel",
          "WITH s1 AS (SELECT user_id, "
          "  MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view "
          "  FROM events GROUP BY user_id), "
          "s2 AS (SELECT e.user_id, s1.t_view, MIN(e.ts) AS t_click "
          "  FROM events e JOIN s1 ON e.user_id = s1.user_id "
          "  WHERE e.event_type = 'click' AND e.ts > s1.t_view "
          "  GROUP BY e.user_id, s1.t_view), "
          "s3 AS (SELECT e.user_id, MIN(e.ts) AS t_buy "
          "  FROM events e JOIN s2 ON e.user_id = s2.user_id "
          "  WHERE e.event_type = 'purchase' AND e.ts > s2.t_click "
          "  GROUP BY e.user_id) "
          "SELECT CAST((SELECT COUNT(*) FROM s1 WHERE t_view IS NOT NULL) "
          "  AS BIGINT) AS n_view, "
          "CAST((SELECT COUNT(*) FROM s2) AS BIGINT) AS n_click, "
          "CAST((SELECT COUNT(*) FROM s3) AS BIGINT) AS n_purchase")
def w11(spark, sf_dir):
    """Ordered three-step conversion funnel (view -> later click ->
    later purchase): how many users complete each prefix, in order —
    the product-analytics query sequence databases advertise. Each
    stage is a user-grained aggregate joined back to events; all three
    shuffles hash on user_id, so under AQE the exchanges reuse one
    partitioning of the fact and the join sides are |users|-sized
    aggregates (broadcast-convertible). Stage relations shrink
    monotonically (funnel property), so each successive join probes a
    smaller build side. Counts are exact integers; the strictly-after
    comparisons ride microsecond-exact timestamps on both engines."""
    # three stage aggregates + two back-references re-scanned events
    # six times; the checkpointed projection is read instead
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts").localCheckpoint(eager=False)
    s1 = (ev.groupBy("user_id")
          .agg(F.min(F.when(F.col("event_type") == "view", F.col("ts")))
               .alias("t_view"))
          .where(F.col("t_view").isNotNull()))
    s2 = (ev.where(F.col("event_type") == "click")
          .join(s1, "user_id")
          .where(F.col("ts") > F.col("t_view"))
          .groupBy("user_id")
          .agg(F.min("ts").alias("t_click")))
    s3 = (ev.where(F.col("event_type") == "purchase")
          .join(s2, "user_id")
          .where(F.col("ts") > F.col("t_click"))
          .groupBy("user_id")
          .agg(F.min("ts").alias("t_buy")))
    return (s1.agg(F.count("*").cast("long").alias("n_view"))
            .crossJoin(s2.agg(F.count("*").cast("long").alias("n_click")))
            .crossJoin(s3.agg(F.count("*").cast("long")
                              .alias("n_purchase"))))


@register("ts03_linear_interpolation",
          "WITH daily AS ("
          "  SELECT CAST(ts AS DATE) AS day, "
          "  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS v "
          "  FROM events WHERE event_type = 'purchase' AND value > 180 "
          "  GROUP BY day), "
          "spine AS ("
          "  SELECT UNNEST(generate_series((SELECT MIN(day) FROM daily), "
          "  (SELECT MAX(day) FROM daily), INTERVAL 1 DAY))::DATE AS day), "
          "filled AS ("
          "  SELECT s.day, d.v, "
          "  last_value(d.v IGNORE NULLS) OVER w_prev AS pv, "
          "  last_value(CASE WHEN d.v IS NOT NULL THEN s.day END "
          "             IGNORE NULLS) OVER w_prev AS pd, "
          "  first_value(d.v IGNORE NULLS) OVER w_next AS nv, "
          "  first_value(CASE WHEN d.v IS NOT NULL THEN s.day END "
          "              IGNORE NULLS) OVER w_next AS nd "
          "  FROM spine s LEFT JOIN daily d ON s.day = d.day "
          "  WINDOW w_prev AS (ORDER BY s.day ROWS BETWEEN UNBOUNDED "
          "  PRECEDING AND CURRENT ROW), "
          "  w_next AS (ORDER BY s.day ROWS BETWEEN CURRENT ROW AND "
          "  UNBOUNDED FOLLOWING)) "
          "SELECT day, (v IS NOT NULL) AS observed, "
          "CASE WHEN v IS NOT NULL THEN v "
          "     WHEN pv IS NULL THEN nv WHEN nv IS NULL THEN pv "
          "     ELSE pv + (nv - pv) * "
          "       (CAST(date_diff('day', pd, day) AS DOUBLE) "
          "        / CAST(date_diff('day', pd, nd) AS DOUBLE)) END "
          "  AS v_interp "
          "FROM filled ORDER BY day")
def ts03(spark, sf_dir):
    """Linear interpolation over a daily date spine — the interpolating
    sibling of ts01's LOCF forward-fill (metrics dashboards offer both;
    interpolation is the right call for additive gauges). Same scale
    shape as ts01: the heavy aggregate keys on day (one corpus
    shuffle), every window runs over the SPINE — bounded by calendar
    days, never event volume. Determinism: daily sums ride exact
    decimals into identical doubles, and the interpolation formula is
    written with identical operation order on both engines (IEEE ops on
    identical inputs are bit-identical), so no rounding tolerance is
    needed even for interpolated points."""
    ev = load_table(spark, sf_dir, "events").where(
        (F.col("event_type") == "purchase") & (F.col("value") > 180))
    daily = (ev.groupBy(F.to_date("ts").alias("day"))
             .agg(F.sum(F.col("value").cast("decimal(18,4)"))
                  .cast("double").alias("v")))
    bounds = daily.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi")).alias("day"))
    w_prev = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    w_next = Window.orderBy("day").rowsBetween(
        Window.currentRow, Window.unboundedFollowing)
    filled = (spine.join(daily, "day", "left")
              .select(
                  "day", "v",
                  F.last("v", ignorenulls=True).over(w_prev).alias("pv"),
                  F.last(F.when(F.col("v").isNotNull(), F.col("day")),
                         ignorenulls=True).over(w_prev).alias("pd"),
                  F.first("v", ignorenulls=True).over(w_next).alias("nv"),
                  F.first(F.when(F.col("v").isNotNull(), F.col("day")),
                          ignorenulls=True).over(w_next).alias("nd")))
    frac = (F.datediff("day", "pd").cast("double")
            / F.datediff("nd", "pd").cast("double"))
    interp = (F.when(F.col("v").isNotNull(), F.col("v"))
              .when(F.col("pv").isNull(), F.col("nv"))
              .when(F.col("nv").isNull(), F.col("pv"))
              .otherwise(F.col("pv")
                         + (F.col("nv") - F.col("pv")) * frac))
    return (filled.select("day",
                          F.col("v").isNotNull().alias("observed"),
                          interp.alias("v_interp"))
            .coalesce(1).orderBy("day"))
