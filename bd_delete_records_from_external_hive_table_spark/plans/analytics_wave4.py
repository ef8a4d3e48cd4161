"""Fourth-wave extension queries: the remaining classic TPC-H join /
subquery shapes, adapted to the synthetic schema (no partsupp table, no
l_shipmode / l_commitdate columns — each query keeps the *shape* of the
original and swaps in columns that exist).

New coverage here:
- Q7  volume-shipping: double-dim self-join of nation on both ends of
  the supplier→lineitem→orders→customer chain (j15)
- Q8  market-share: conditional-ratio over a 6-way star, per year (j16)
- Q13 customer-order distribution: LEFT OUTER with a join-side filter,
  then a two-level aggregate (j17)
- Q12 priority-class counts: CASE-in-agg over a fact⨝fact join (a17)
- Q17 small-quantity revenue: correlated per-part average, decorrelated
  into a window over the join key (a18)
- Q15 top supplier: grouped revenue view + scalar MAX threshold (q16)
- Q4  priority EXISTS: semi join into a grouped count (q17)
- Q20 nested IN with HAVING: group-filtered key list feeding a semi
  join (q18)

Scale notes (100 TB design point):
- j15/j16 broadcast every dimension (nation, region, customer at the
  synthetic SFs; at real scale customer joins shuffle on the key that
  orders already carries) — the single fact scan drives the plan.
- j17's outer-join filter (`o_orderpriority <> '1-URGENT'`) lives in
  the join condition, NOT a post-join WHERE — pushing it post-join
  would turn unmatched customers into dropped rows and change the
  semantics; Catalyst still prunes orders' scan to two columns.
- a18 decorrelates the per-part average as a window over l_partkey:
  ONE shuffle of the (brand-pruned) fact co-locates both the stats and
  the comparison — no second lineitem scan, no per-row subquery. The
  5·qty·cnt < sum form compares exact decimals, so no float-boundary
  row can flip between engines.
- q16's MAX threshold is a 1-row aggregate broadcast against the
  supplier-grained revenue view (|suppliers| rows, not |lineitem|).
- q17/q18 lower IN/EXISTS to LeftSemi hash joins keyed on the fact's
  natural keys; the HAVING list in q18 aggregates map-side first.

Reference anchor: widens the declared-query surface admitted by the
reference's SQL boundary (DeletionCriteria.java:40-63,
HiveTableOperations.java:71-116) the same way waves 1-3 do.
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


@register("j15_tpch_q7_shape",
          "SELECT supp_nation, cust_nation, l_year, "
          "CAST(ROUND(SUM(volume), 2) AS DOUBLE) AS revenue FROM ("
          "  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, "
          "         EXTRACT(year FROM l_shipdate) AS l_year, "
          "         " + _REV + " AS volume "
          "  FROM supplier JOIN lineitem ON s_suppkey = l_suppkey "
          "  JOIN orders ON o_orderkey = l_orderkey "
          "  JOIN customer ON c_custkey = o_custkey "
          "  JOIN nation n1 ON s_nationkey = n1.n_nationkey "
          "  JOIN nation n2 ON c_nationkey = n2.n_nationkey "
          "  WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7') "
          "      OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')) "
          "    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' "
          "    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00') "
          "GROUP BY supp_nation, cust_nation, l_year "
          "ORDER BY supp_nation, cust_nation, l_year")
def j15(spark, sf_dir):
    """TPC-H Q7 shape (volume shipping): the same dimension (nation)
    joins both ends of the chain — supplier side and customer side —
    with a symmetric two-nation disjunction. True dims (supplier, both
    nation copies) broadcast; orders and customer grow with SF, so their
    joins are left to AQE — broadcast if small at runtime, sort-merge
    otherwise. The date range pushes into the lineitem scan."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")))
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    pair = ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")) | \
           ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    return (li
            .join(dim(supp, sf_dir, "supplier"),
                  li.l_suppkey == supp.s_suppkey)
            .join(orders, li.l_orderkey == orders.o_orderkey)
            .join(cust, orders.o_custkey == cust.c_custkey)
            .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
            .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
            .where(pair)
            .groupBy("supp_nation", "cust_nation",
                     F.year("l_shipdate").cast("long").alias("l_year"))
            .agg(F.round(F.sum(_rev()), 2).cast("double").alias("revenue"))
            .coalesce(1).orderBy("supp_nation", "cust_nation", "l_year"))


@register("j16_tpch_q8_shape",
          "SELECT o_year, CAST(ROUND(SUM(CASE WHEN nation = 'NATION_2' "
          "THEN volume ELSE CAST(0 AS DECIMAL(18,4)) END) "
          "/ SUM(volume), 6) AS DOUBLE) AS mkt_share FROM ("
          "  SELECT EXTRACT(year FROM o_orderdate) AS o_year, "
          "         " + _REV + " AS volume, n2.n_name AS nation "
          "  FROM part JOIN lineitem ON p_partkey = l_partkey "
          "  JOIN supplier ON s_suppkey = l_suppkey "
          "  JOIN orders ON l_orderkey = o_orderkey "
          "  JOIN customer ON o_custkey = c_custkey "
          "  JOIN nation n1 ON c_nationkey = n1.n_nationkey "
          "  JOIN region ON n1.n_regionkey = r_regionkey "
          "  JOIN nation n2 ON s_nationkey = n2.n_nationkey "
          "  WHERE r_name = 'ASIA' AND p_type = 'ECONOMY' "
          "    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' "
          "    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00') "
          "GROUP BY o_year ORDER BY o_year")
def j16(spark, sf_dir):
    """TPC-H Q8 shape (national market share): one nation's share of
    regional revenue for a part type, per year. Customer-side nation ⨝
    region restricts WHERE the revenue counts; supplier-side nation
    labels WHO earned it — numerator and denominator come out of one
    conditional-aggregate pass (a15's trick at 6-way-star scale).
    True dims (part/supplier/nation/region) broadcast; orders and
    customer scale with SF so AQE picks their join strategy at runtime.
    The decimal ratio is cast to DOUBLE only after both exact sums."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY") \
        .select("p_partkey")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))) \
        .select("o_orderkey", "o_custkey", "o_orderdate")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region"))
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA") \
        .select("r_regionkey")
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation"))
    vol = _rev().alias("volume")
    joined = (li
              .join(dim(part, sf_dir, "part"), li.l_partkey == part.p_partkey)
              .join(dim(supp, sf_dir, "supplier"),
                    li.l_suppkey == supp.s_suppkey)
              .join(orders, li.l_orderkey == orders.o_orderkey)
              .join(cust, orders.o_custkey == cust.c_custkey)
              .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
              .join(F.broadcast(region), F.col("n1_region") == F.col("r_regionkey"),
                    "left_semi")
              .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
              .select(F.year("o_orderdate").cast("long").alias("o_year"),
                      vol, "nation"))
    zero = F.lit(0).cast("decimal(18,4)")
    return (joined.groupBy("o_year")
            .agg(F.round(
                F.sum(F.when(F.col("nation") == "NATION_2", F.col("volume"))
                      .otherwise(zero))
                / F.sum("volume"), 6).cast("double").alias("mkt_share"))
            .coalesce(1).orderBy("o_year"))


@register("j17_tpch_q13_shape",
          "SELECT c_count, COUNT(*) AS custdist FROM ("
          "  SELECT c_custkey, COUNT(o_orderkey) AS c_count "
          "  FROM customer LEFT OUTER JOIN orders "
          "    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT' "
          "  GROUP BY c_custkey) "
          "GROUP BY c_count ORDER BY custdist DESC, c_count DESC")
def j17(spark, sf_dir):
    """TPC-H Q13 shape (customer order distribution): how many customers
    placed exactly N (non-urgent) orders — including N = 0, which is why
    the priority filter MUST sit in the outer-join condition, not a
    post-join WHERE (a WHERE would silently drop the zero-order
    customers). Two-level aggregate: per-customer count (shuffle on
    custkey, which the join already partitioned — AQE reuses it), then
    the tiny distribution-of-counts aggregate."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority")
    cond = (cust.c_custkey == orders.o_custkey) & \
           (orders.o_orderpriority != "1-URGENT")
    return (cust.join(orders, cond, "left_outer")
            .groupBy("c_custkey")
            .agg(F.count("o_orderkey").alias("c_count"))
            .groupBy("c_count")
            .agg(F.count(F.lit(1)).alias("custdist"))
            .coalesce(1).orderBy(F.desc("custdist"), F.desc("c_count")))


@register("a17_tpch_q12_shape",
          "SELECT l_linestatus, "
          "CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') "
          "    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count, "
          "CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') "
          "    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count "
          "FROM orders JOIN lineitem ON o_orderkey = l_orderkey "
          "WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' "
          "  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00' "
          "GROUP BY l_linestatus ORDER BY l_linestatus")
def a17(spark, sf_dir):
    """TPC-H Q12 shape (priority class by line status; the synthetic
    schema has no l_shipmode, so line status plays the grouping role
    and order priority the CASE role). Both CASE branches come out of
    ONE pass over the joined fact — the date filter pushes to the
    lineitem scan, orders prunes to two columns, and the final group-by
    has two grouping values so the shuffle is trivially small. The CASE
    sums are CAST AS BIGINT in the oracle: DuckDB SUM over integers
    returns HUGEINT, which pandas degrades to float64 ('5.0') while
    Spark's long stays int — the driver's value hash would go red."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))) \
        .select("l_orderkey", "l_linestatus")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("l_linestatus")
            .agg(F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
                 F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"))
            .coalesce(1).orderBy("l_linestatus"))


@register("a18_tpch_q17_shape",
          "SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) "
          "/ 7.0, 2) AS DOUBLE) AS avg_yearly "
          "FROM lineitem JOIN part ON p_partkey = l_partkey "
          "WHERE p_brand = 'Brand#11' "
          "AND 5 * CAST(l_quantity AS DECIMAL(18,6)) "
          "      * (SELECT COUNT(l2.l_quantity) FROM lineitem l2 "
          "         WHERE l2.l_partkey = p_partkey) "
          "    < (SELECT SUM(CAST(l2.l_quantity AS DECIMAL(18,6))) "
          "       FROM lineitem l2 WHERE l2.l_partkey = p_partkey)")
def a18(spark, sf_dir):
    """TPC-H Q17 shape (small-quantity-order revenue): keep lines whose
    quantity is below 20% of their part's average. The correlated
    per-part average decorrelates into a window over l_partkey on the
    brand-pruned join result: ONE shuffle co-locates each part's lines,
    the window emits (sum, count) per row, and the threshold compares
    5·qty·cnt < sum in exact decimals — algebraically identical to
    qty < 0.2·avg but with no float division that could flip a
    borderline row between engines. No second lineitem scan.

    (The window runs over the joined-and-pruned rows; that is exact
    because the part join is key-preserving — every lineitem row of a
    surviving part survives the join.)"""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice")
    part = _t(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#11") \
        .select("p_partkey")
    w = Window.partitionBy("l_partkey")
    qty = F.col("l_quantity").cast("decimal(18,6)")
    joined = (li.join(dim(part, sf_dir, "part"),
                      li.l_partkey == part.p_partkey)
              .withColumn("sum_qty", F.sum(qty).over(w))
              .withColumn("cnt_qty", F.count("l_quantity").over(w)))
    return (joined
            .where(F.lit(5) * qty * F.col("cnt_qty") < F.col("sum_qty"))
            .agg(F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,4)")) / 7.0,
                2).cast("double").alias("avg_yearly")))


def _q16_revenue(spark, sf_dir):
    """q16's pre-checkpoint revenue view, exposed so the plan test can
    pin the ONE-lineitem-scan property that the checkpoint's lineage
    truncation hides from the final plan."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp")))
    return (li.groupBy(F.col("l_suppkey").alias("supplier_no"))
            .agg(F.sum(_rev()).alias("total_revenue")))


@register("q16_tpch_q15_shape",
          "WITH revenue AS ("
          "  SELECT l_suppkey AS supplier_no, "
          "         SUM(" + _REV + ") AS total_revenue "
          "  FROM lineitem "
          "  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' "
          "    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00' "
          "  GROUP BY l_suppkey) "
          "SELECT s_suppkey, s_name, "
          "CAST(ROUND(total_revenue, 2) AS DOUBLE) AS total_revenue "
          "FROM supplier "
          "JOIN revenue ON s_suppkey = supplier_no "
          "WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue) "
          "ORDER BY s_suppkey")
def q16(spark, sf_dir):
    """TPC-H Q15 shape (top supplier): a grouped revenue view consumed
    twice — once for the scalar MAX, once for the equality filter.
    Expressing the MAX as a separate aggregate on the raw view would
    re-plan it and SCAN LINEITEM TWICE (self-"join" subtrees are not
    exchange-reused here), and the previous global-window form
    single-tasked a pass over ALL |suppliers| rows — the same 100 TB
    hazard the a22 audit flagged (suppliers grow SFx10k). Instead the
    supplier-grained view materializes ONCE (lazy localCheckpoint) and
    the scalar MAX is a re-aggregate whose final stage sees one
    partial max per partition, broadcast back as a 1-row cross join.
    The decimal revenue makes the MAX-equality tie-exact across
    engines."""
    revenue = _q16_revenue(spark, sf_dir).localCheckpoint(eager=False)
    max_rev = revenue.agg(F.max("total_revenue").alias("max_rev"))
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (revenue
            .crossJoin(F.broadcast(max_rev))
            .where(F.col("total_revenue") == F.col("max_rev"))
            .join(dim(supp, sf_dir, "supplier"),
                  F.col("supplier_no") == F.col("s_suppkey"))
            .select("s_suppkey", "s_name",
                    F.round("total_revenue", 2).cast("double")
                    .alias("total_revenue"))
            .coalesce(1).orderBy("s_suppkey"))


@register("q17_tpch_q4_shape",
          "SELECT o_orderpriority, COUNT(*) AS order_count FROM orders "
          "WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00' "
          "  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00' "
          "  AND EXISTS (SELECT 1 FROM lineitem "
          "              WHERE l_orderkey = o_orderkey "
          "                AND l_returnflag = 'R') "
          "GROUP BY o_orderpriority ORDER BY o_orderpriority")
def q17(spark, sf_dir):
    """TPC-H Q4 shape (order priority checking): EXISTS over the fact
    lowers to a LeftSemi hash join on l_orderkey — each order is
    checked once against the (returnflag-pruned) line set, never
    re-probed per row. The date range pushes into the orders scan; the
    five-value group-by aggregates map-side first."""
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))) \
        .select("o_orderkey", "o_orderpriority")
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R") \
        .select("l_orderkey")
    return (orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("order_count"))
            .coalesce(1).orderBy("o_orderpriority"))


@register("q18_tpch_q20_shape",
          "SELECT s_name, CAST(ROUND(CAST(s_acctbal AS DECIMAL(18,2)), 2) "
          "AS DOUBLE) AS s_acctbal FROM supplier WHERE s_suppkey IN ("
          "  SELECT l_suppkey FROM lineitem "
          "  JOIN part ON p_partkey = l_partkey "
          "  WHERE p_name LIKE 'cold%' "
          "    AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' "
          "    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00' "
          "  GROUP BY l_suppkey "
          "  HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 400) "
          "ORDER BY s_name")
def q18(spark, sf_dir):
    """TPC-H Q20 shape (potential part promotion): suppliers who moved
    more than a threshold quantity of 'cold%' parts last year. The
    nested IN-list is itself a grouped HAVING query — it aggregates
    map-side on l_suppkey after the part prefix filter broadcasts, and
    the surviving key list (tiny) feeds a LeftSemi back into supplier.
    The decimal quantity sum makes the threshold comparison exact."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))) \
        .select("l_partkey", "l_suppkey", "l_quantity")
    part = _t(spark, sf_dir, "part").where(F.col("p_name").like("cold%")) \
        .select("p_partkey")
    keys = (li.join(dim(part, sf_dir, "part"), li.l_partkey == part.p_partkey)
            .groupBy("l_suppkey")
            .agg(F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("q"))
            .where(F.col("q") > 400)
            .select("l_suppkey"))
    supp = _t(spark, sf_dir, "supplier")
    return (supp.join(dim(keys, sf_dir, "supplier"),
                      supp.s_suppkey == keys.l_suppkey, "left_semi")
            .select("s_name",
                    F.round(F.col("s_acctbal").cast("decimal(18,2)"), 2)
                    .cast("double").alias("s_acctbal"))
            .orderBy("s_name"))


@register("a19_stats_aggregates",
          "SELECT l_returnflag, n, "
          "ROUND((n * sxx - sx * sx) / (n * (n - 1)), 6) AS var_qty, "
          "ROUND(SQRT((n * sxx - sx * sx) / (n * (n - 1))), 6) "
          "  AS stddev_qty, "
          "ROUND((n * sxy - sx * sy) / (n * (n - 1)), 6) AS covar_qp, "
          "ROUND((n * sxy - sx * sy) / "
          "  (SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy)), 6) "
          "  AS corr_qp "
          "FROM ("
          "  SELECT l_returnflag, COUNT(*) AS n, "
          "  CAST(SUM(CAST(l_quantity AS DECIMAL(12,6))) AS DOUBLE) AS sx, "
          "  CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2))) AS DOUBLE) "
          "    AS sy, "
          "  CAST(SUM(CAST(l_quantity AS DECIMAL(12,6)) "
          "         * CAST(l_quantity AS DECIMAL(12,6))) AS DOUBLE) AS sxx, "
          "  CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2)) "
          "         * CAST(l_extendedprice AS DECIMAL(15,2))) AS DOUBLE) "
          "    AS syy, "
          "  CAST(SUM(CAST(l_quantity AS DECIMAL(12,6)) "
          "         * CAST(l_extendedprice AS DECIMAL(15,2))) AS DOUBLE) "
          "    AS sxy "
          "  FROM lineitem GROUP BY l_returnflag) "
          "ORDER BY l_returnflag")
def a19(spark, sf_dir):
    """Statistical aggregates (variance / stddev / covariance /
    correlation) computed from decimal-exact power sums instead of the
    built-in float accumulators. The built-ins (stddev_samp, corr, ...)
    stream float partial states whose summation ORDER depends on the
    task layout — results drift in the last bits between runs and
    between engines. Power sums in DECIMAL are associative and exact,
    so any shuffle layout (and DuckDB) produces bit-identical moments;
    the only float math left is one deterministic division/sqrt per
    group. Same single-pass, map-side-combining plan shape as the
    built-ins — exactness costs nothing structurally."""
    li = _t(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("decimal(12,6)")
    p = F.col("l_extendedprice").cast("decimal(15,2)")
    base = (li.groupBy("l_returnflag")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(q).cast("double").alias("sx"),
                 F.sum(p).cast("double").alias("sy"),
                 F.sum(q * q).cast("double").alias("sxx"),
                 F.sum(p * p).cast("double").alias("syy"),
                 F.sum(q * p).cast("double").alias("sxy")))
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    var = (n * sxx - sx * sx) / (n * (n - 1))
    cov = (n * sxy - sx * sy) / (n * (n - 1))
    corr = (n * sxy - sx * sy) / (
        F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy))
    return (base.select(
        "l_returnflag", "n",
        F.round(var, 6).alias("var_qty"),
        F.round(F.sqrt(var), 6).alias("stddev_qty"),
        F.round(cov, 6).alias("covar_qp"),
        F.round(corr, 6).alias("corr_qp"))
        .coalesce(1).orderBy("l_returnflag"))


@register("a20_mode_per_group",
          "SELECT l_returnflag, l_quantity AS mode_qty, cnt FROM ("
          "  SELECT l_returnflag, l_quantity, COUNT(*) AS cnt, "
          "  ROW_NUMBER() OVER (PARTITION BY l_returnflag "
          "    ORDER BY COUNT(*) DESC, l_quantity) AS rk "
          "  FROM lineitem GROUP BY l_returnflag, l_quantity) "
          "WHERE rk = 1 ORDER BY l_returnflag")
def a20(spark, sf_dir):
    """Mode (most frequent value) per group with a DETERMINISTIC
    tie-break (smallest value wins) — the built-in `mode()` leaves ties
    engine-defined, which can never oracle-match. Two-phase: the
    (group, value) count aggregates map-side; the per-group argmax is a
    window over the count table (|groups|x|distinct values| rows, not
    raw data)."""
    li = _t(spark, sf_dir, "lineitem")
    counts = (li.groupBy("l_returnflag", "l_quantity")
              .agg(F.count(F.lit(1)).alias("cnt")))
    w = Window.partitionBy("l_returnflag").orderBy(
        F.desc("cnt"), "l_quantity")
    return (counts.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") == 1)
            .select("l_returnflag", F.col("l_quantity").alias("mode_qty"),
                    "cnt")
            .coalesce(1).orderBy("l_returnflag"))


@register("j18_shuffle_hash_join",
          "SELECT o_orderpriority, COUNT(*) AS n, "
          "ROUND(SUM(l_quantity), 2) AS total_qty "
          "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
          "WHERE o_orderstatus = 'F' "
          "GROUP BY o_orderpriority ORDER BY o_orderpriority")
def j18(spark, sf_dir):
    """The third join strategy, pinned explicitly: SHUFFLE_HASH builds a
    hash table per partition instead of sorting both sides — wins over
    sort-merge when one side is much smaller than the other but still
    too big to broadcast (the mid-size dimension case at 100 TB), since
    it skips both sort passes. The hint goes on the smaller (orders)
    side; AQE still coalesces the post-shuffle partitions. j01 (pinned
    broadcast) / j02 (pinned merge) / j18 (pinned shuffle-hash) cover
    the full explicit join-strategy surface."""
    li = _t(spark, sf_dir, "lineitem")
    orders = (_t(spark, sf_dir, "orders")
              .where(F.col("o_orderstatus") == "F")
              .hint("shuffle_hash"))
    return (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("l_quantity"), 2).alias("total_qty"))
            .coalesce(1).orderBy("o_orderpriority"))


@register("w09_rolling_distinct_users",
          "WITH daily AS (SELECT DISTINCT CAST(ts AS DATE) AS d "
          "FROM events) "
          "SELECT d, CAST((SELECT COUNT(DISTINCT e2.user_id) FROM events "
          "e2 WHERE CAST(e2.ts AS DATE) BETWEEN d - 6 AND d) AS BIGINT) "
          "AS n_active_7d FROM daily ORDER BY d")
def w09(spark, sf_dir):
    """7-day rolling distinct active users — the windowed COUNT DISTINCT
    that plain window frames can't express (DISTINCT aggs aren't
    window-able). Two-level plan: per-day user sets first (one shuffle,
    keyed by day; the heavy distinct happens here, map-side partial),
    then a range-frame window over the DAILY table — |days| rows, so
    the single-partition window is bounded by the calendar, never by
    event volume (same argument as ts01's date spine). The oracle pays
    the quadratic correlated-subquery price instead — fine at sf0.01,
    which is exactly why the engine-side shape matters at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    daily_users = (ev.select(F.to_date("ts").alias("d"), "user_id")
                   .distinct())
    day_sets = (daily_users.groupBy("d")
                .agg(F.collect_set("user_id").alias("us")))
    dnum = F.datediff(F.col("d"), F.lit("1970-01-01").cast("date"))
    w = Window.orderBy("dnum").rangeBetween(-6, 0)
    return (day_sets.withColumn("dnum", dnum)
            .withColumn("n_active_7d",
                        F.size(F.array_distinct(
                            F.flatten(F.collect_list("us").over(w))))
                        .cast("long"))
            .select("d", "n_active_7d")
            .coalesce(1).orderBy("d"))


@register("j19_tpch_q9_shape",
          "SELECT nation, o_year, "
          "CAST(ROUND(SUM(amount), 2) AS DOUBLE) AS sum_profit "
          "FROM (SELECT n_name AS nation, "
          "  EXTRACT(year FROM o_orderdate) AS o_year, "
          "  CAST(l_extendedprice * (1 - l_discount) "
          "    - 0.1 * p_retailprice * l_quantity AS DECIMAL(18,4)) "
          "    AS amount "
          "  FROM part JOIN lineitem ON p_partkey = l_partkey "
          "  JOIN supplier ON s_suppkey = l_suppkey "
          "  JOIN orders ON o_orderkey = l_orderkey "
          "  JOIN nation ON s_nationkey = n_nationkey "
          "  WHERE p_name LIKE '%gear%') "
          "GROUP BY nation, o_year ORDER BY nation, o_year DESC")
def j19(spark, sf_dir):
    """TPC-H Q9 shape (product-type profit): per (supplier nation, order
    year) profit over name-filtered parts. The synthetic schema has no
    partsupp, so supply cost is proxied by 0.1·p_retailprice·quantity —
    the SHAPE is what matters: a 5-way join where TWO fact-sized sides
    (lineitem, orders) meet, part pre-filtered by a LIKE. part/supplier/
    nation broadcast (true dims); the lineitem⨝orders join is AQE's
    call — sort-merge at 100 TB. Decimal profit keeps grouping sums
    layout-independent."""
    li = _t(spark, sf_dir, "lineitem")
    part = (_t(spark, sf_dir, "part")
            .where(F.col("p_name").like("%gear%"))
            .select("p_partkey", "p_retailprice"))
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    nation = _t(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation"))
    amount = (F.col("l_extendedprice") * (1 - F.col("l_discount"))
              - 0.1 * F.col("p_retailprice") * F.col("l_quantity")) \
        .cast("decimal(18,4)")
    return (li
            .join(dim(part, sf_dir, "part"), li.l_partkey == part.p_partkey)
            .join(dim(supp, sf_dir, "supplier"),
                  li.l_suppkey == supp.s_suppkey)
            .join(orders, li.l_orderkey == orders.o_orderkey)
            .join(F.broadcast(nation),
                  F.col("s_nationkey") == F.col("n_nationkey"))
            .groupBy("nation",
                     F.year("o_orderdate").cast("long").alias("o_year"))
            .agg(F.round(F.sum(amount), 2).cast("double")
                 .alias("sum_profit"))
            .orderBy("nation", F.desc("o_year")))


@register("a21_hll_sketch_rollup", None)  # sketch bytes: no SQL oracle
def a21(spark, sf_dir):
    """Mergeable distinct-count sketches — the incremental-rollup pattern
    for 100 TB: per-partition HLL sketches (here per o_orderstatus) are
    small binary states that persist alongside a continuous aggregate;
    a new day of data sketches independently and hll_union_agg folds it
    in WITHOUT recounting history. This query materializes the per-group
    sketches, unions them to a global estimate, and returns per-group +
    global estimates — deterministic for fixed input (Datasketches HLL
    is order-insensitive), error-bound-tested against exact counts."""
    orders = _t(spark, sf_dir, "orders")
    per_group = (orders.groupBy("o_orderstatus")
                 .agg(F.hll_sketch_agg("o_custkey").alias("sk")))
    est = (per_group
           .select("o_orderstatus",
                   F.hll_sketch_estimate("sk").alias("approx_custkeys")))
    merged = (per_group
              .agg(F.hll_sketch_estimate(F.hll_union_agg("sk"))
                   .alias("approx_custkeys"))
              .select(F.lit("ALL").alias("o_orderstatus"),
                      "approx_custkeys"))
    return est.unionByName(merged).coalesce(1).orderBy("o_orderstatus")
