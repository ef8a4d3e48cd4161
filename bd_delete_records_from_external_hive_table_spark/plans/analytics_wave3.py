"""Third-wave extension queries: remaining classic OLAP shapes and
pipeline primitives (SURVEY §2d/§2e/§2k extension surface, §7 Phase 3/4).

New coverage here:
- disjunctive OR-of-ANDs join predicate, TPC-H Q19 shape (j13)
- conditional-ratio aggregate, TPC-H Q14 promo-revenue shape (a15)
- scalar-subquery threshold + NOT EXISTS, TPC-H Q22 shape (q15)
- time-series downsample/resample to fixed buckets per key (ts02)
- canonicalizing (whitespace/case-normalized) dedup counts (d08)

Scale notes (100 TB design point):
- j13's disjunction references both sides of the join, so it cannot be
  pushed below the join — but the per-side conjuncts Catalyst extracts
  (brand IN (...), size/quantity range hulls) DO push into the scans,
  and `part` stays broadcast. The residual OR runs post-join on the
  already-pruned stream.
- a15 is one pass over lineitem (conditional aggregation, no second
  scan for the denominator) plus a broadcast of `part`.
- q15's global threshold is a 1-row aggregate broadcast to the filter;
  the NOT EXISTS side is a left-anti join on the order keys — no
  per-row subquery execution anywhere.
- ts02 reduces events map-side (partial agg on (bucket, key)) before
  one shuffle sized by |buckets|x|keys|, not by input rows.
- d08's three distinct-counts run in a single aggregation pass;
  normalization is a codegen'd JVM expression, no Python boundary.

Reference anchor: these extend the declared-query surface the same way
the reference's SQL generation boundary would admit
(DeletionCriteria.java:40-63 builds WHERE fragments; anything valid
there — disjunctions included — must scan-prune correctly here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import dim, load_table
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


_REV = "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))"


@register("j13_tpch_q19_disjunctive",
          "SELECT CAST(ROUND(SUM(" + _REV + "), 2) AS DOUBLE) AS revenue, "
          "COUNT(*) AS n_lines "
          "FROM lineitem JOIN part ON p_partkey = l_partkey "
          "WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 "
          "       AND l_quantity BETWEEN 1 AND 11) "
          "   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 "
          "       AND l_quantity BETWEEN 10 AND 20) "
          "   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 "
          "       AND l_quantity BETWEEN 20 AND 30)")
def j13(spark, sf_dir):
    """TPC-H Q19 shape (discounted-revenue, disjunctive predicates): the
    WHERE is an OR of three conjunct blocks mixing part and lineitem
    columns. Catalyst cannot push the whole disjunction below the join,
    but it extracts the per-side hulls — ``p_brand IN (...)`` +
    ``p_size <= 35`` prune the part scan and ``l_quantity BETWEEN 1 AND
    30`` prunes lineitem row groups — and `part` broadcasts, so the
    residual OR evaluates only on join survivors."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    block = [
        (F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11),
        (F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(10, 20),
        (F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 35)
        & F.col("l_quantity").between(20, 30),
    ]
    rev = (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))) \
        .cast("decimal(18,4)")
    return (li.join(dim(part, sf_dir, "part"), part.p_partkey == li.l_partkey)
            .where(block[0] | block[1] | block[2])
            .agg(F.round(F.sum(rev), 2).cast("double").alias("revenue"),
                 F.count(F.lit(1)).alias("n_lines")))


@register("a15_promo_revenue",
          "SELECT ROUND(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN "
          + _REV + " ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) "
          "/ CAST(SUM(" + _REV + ") AS DOUBLE), 4) AS promo_pct "
          "FROM lineitem JOIN part ON p_partkey = l_partkey "
          "WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' "
          "AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'")
def a15(spark, sf_dir):
    """TPC-H Q14 shape (promotion-effect ratio): numerator and
    denominator come out of ONE conditional-aggregation pass — no second
    scan of lineitem for the total. Both sums are exact decimals (shuffle-
    order independent); only the final scalar division happens in double,
    so the ratio is bit-stable across engines and task layouts."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate")
         >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate")
           < F.lit("1996-04-01 00:00:00").cast("timestamp")))
    part = _t(spark, sf_dir, "part")
    rev = (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))) \
        .cast("decimal(18,4)")
    promo = F.when(F.col("p_type") == "PROMO", rev) \
        .otherwise(F.lit(0).cast("decimal(18,4)"))
    return (li.join(dim(part, sf_dir, "part"), part.p_partkey == li.l_partkey)
            .agg(F.round(F.lit(100.0) * F.sum(promo).cast("double")
                         / F.sum(rev).cast("double"), 4)
                 .alias("promo_pct")))


@register("q15_tpch_q22_shape",
          "WITH bal AS (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS s, "
          "             COUNT(*) AS n FROM customer WHERE c_acctbal > 0.0) "
          "SELECT c_nationkey, COUNT(*) AS numcust, "
          "CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE) "
          "AS totacctbal "
          "FROM customer, bal "
          "WHERE CAST(c_acctbal AS DECIMAL(18,2)) * n > s "
          "AND NOT EXISTS (SELECT 1 FROM orders o "
          "                WHERE o.o_custkey = c_custkey "
          "                AND o.o_orderstatus = 'O') "
          "GROUP BY c_nationkey ORDER BY c_nationkey")
def q15(spark, sf_dir):
    """TPC-H Q22 shape (global-customer-relationship): keep customers
    whose balance exceeds the positive-balance average AND who have no
    open ('O') orders, grouped per nation. The average is compared as
    ``bal * n > sum`` in exact decimal arithmetic — the same rows pass on
    every engine, where a float AVG threshold could flip borderline rows.
    The 1-row aggregate broadcasts; NOT EXISTS lowers to a left-anti join
    on the (filtered) order keys — no correlated per-row probing."""
    cust = _t(spark, sf_dir, "customer")
    bal = (cust.where(F.col("c_acctbal") > 0.0)
           .agg(F.sum(F.col("c_acctbal").cast("decimal(18,2)")).alias("s"),
                F.count(F.lit(1)).alias("n")))
    open_orders = (_t(spark, sf_dir, "orders")
                   .where(F.col("o_orderstatus") == "O")
                   .select("o_custkey"))
    return (cust.crossJoin(F.broadcast(bal))
            .where(F.col("c_acctbal").cast("decimal(18,2)")
                   * F.col("n") > F.col("s"))
            .join(open_orders,
                  F.col("c_custkey") == F.col("o_custkey"), "left_anti")
            .groupBy("c_nationkey")
            .agg(F.count(F.lit(1)).alias("numcust"),
                 F.round(F.sum(F.col("c_acctbal").cast("decimal(18,2)")), 2)
                 .cast("double").alias("totacctbal"))
            .coalesce(1).orderBy("c_nationkey"))


@register("ts02_resample",
          "SELECT time_bucket(INTERVAL '1 hour', ts) AS bucket, "
          "event_type, COUNT(*) AS n, MIN(value) AS vmin, "
          "MAX(value) AS vmax, "
          "CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) "
          "AS vsum "
          "FROM events GROUP BY bucket, event_type "
          "ORDER BY bucket, event_type")
def ts02(spark, sf_dir):
    """Time-series downsample: resample the event stream to fixed 1-hour
    buckets per event type (the hypertable/continuous-aggregate
    primitive). Partial aggregation reduces each input split to at most
    |buckets|x|types| rows map-side, so the single shuffle is sized by
    the OUTPUT grid, not the input row count — the op that turns 100 TB
    of raw events into a dashboard-sized rollup in one pass. min/max are
    exact in float; the sum is decimal-cast for cross-engine equality."""
    ev = _t(spark, sf_dir, "events")
    return (ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.min("value").alias("vmin"),
                 F.max("value").alias("vmax"),
                 F.round(F.sum(F.col("value").cast("decimal(18,6)")), 4)
                 .cast("double").alias("vsum"))
            .select(F.col("w.start").alias("bucket"), "event_type",
                    "n", "vmin", "vmax", "vsum")
            .orderBy("bucket", "event_type"))


@register("j14_tpch_q21_shape",
          "SELECT s_name, COUNT(*) AS numwait FROM supplier "
          "JOIN lineitem l1 ON l1.l_suppkey = s_suppkey "
          "WHERE l1.l_returnflag = 'R' "
          "AND EXISTS (SELECT 1 FROM lineitem l2 "
          "            WHERE l2.l_orderkey = l1.l_orderkey "
          "            AND l2.l_suppkey <> l1.l_suppkey) "
          "AND NOT EXISTS (SELECT 1 FROM lineitem l3 "
          "                WHERE l3.l_orderkey = l1.l_orderkey "
          "                AND l3.l_suppkey <> l1.l_suppkey "
          "                AND l3.l_returnflag = 'R') "
          "GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 10")
def j14(spark, sf_dir):
    """TPC-H Q21 shape (suppliers-who-kept-orders-waiting): the flagship
    multi-self-join — lines sole-at-fault on multi-supplier orders, via
    EXISTS (another supplier on the order) + NOT EXISTS (another supplier
    also at fault). Both lower to semi/anti hash joins equi-keyed on
    l_orderkey with the supplier inequality as a residual: three passes
    over lineitem co-grouped on the same key, so the exchanges line up
    (reused / AQE-coalesced), never a nested-loop probe. The supplier
    dim broadcasts; the top-10 is TakeOrderedAndProject."""
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    l1 = (li.where(F.col("l_returnflag") == "R")
          .select("l_orderkey", "l_suppkey").alias("l1"))
    l2 = li.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = (li.where(F.col("l_returnflag") == "R")
          .select("l_orderkey", "l_suppkey").alias("l3"))
    sole_fault = (
        l1.join(l2, (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
                & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
                "left_semi")
        .join(l3, (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
              & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
              "left_anti"))
    return (sole_fault
            .join(dim(supp, sf_dir, "supplier"),
                  F.col("l1.l_suppkey") == F.col("s_suppkey"))
            .groupBy("s_name")
            .agg(F.count(F.lit(1)).alias("numwait"))
            .orderBy(F.desc("numwait"), "s_name")
            .limit(10))


@register("a16_tpch_q16_shape",
          "SELECT p_brand, p_size, "
          "COUNT(DISTINCT l_suppkey) AS supplier_cnt "
          "FROM part JOIN lineitem ON l_partkey = p_partkey "
          "WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO' "
          "AND p_size IN (1,5,9,13,17,21,25,29) "
          "AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier "
          "                      WHERE s_acctbal < 1000) "
          "GROUP BY p_brand, p_size "
          "ORDER BY supplier_cnt DESC, p_brand, p_size LIMIT 20")
def a16(spark, sf_dir):
    """TPC-H Q16 shape (parts/supplier relationship): distinct-supplier
    counts per part attribute, excluding a complained-about supplier
    list. The part filters (inequality + IN-list) push into the scan and
    shrink part enough to broadcast into lineitem; the NOT IN lowers to
    a broadcast left-anti on the (tiny, non-null) exclusion keys. The
    distinct-agg is the standard two-phase partial-distinct expand —
    keyed on (brand, size, suppkey) map-side before the one shuffle."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1") & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29))
    excl = (_t(spark, sf_dir, "supplier")
            .where(F.col("s_acctbal") < 1000).select("s_suppkey"))
    return (li.join(dim(part, sf_dir, "part"), part.p_partkey == li.l_partkey)
            .join(dim(excl, sf_dir, "supplier"),
                  F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
            .groupBy("p_brand", "p_size")
            .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
            .orderBy(F.desc("supplier_cnt"), "p_brand", "p_size")
            .limit(20))


@register("d08_normalized_dedup",
          "SELECT source, COUNT(*) AS n_docs, "
          "COUNT(DISTINCT text) AS distinct_raw, "
          "COUNT(DISTINCT regexp_replace(lower(trim(text)), '\\s+', ' ', "
          "'g')) AS distinct_norm FROM documents "
          "GROUP BY source ORDER BY source")
def d08(spark, sf_dir):
    """Canonicalizing dedup audit: per source, how many documents remain
    distinct after whitespace-collapse + lowercase normalization vs raw
    byte equality — the first, cheapest rung of the dedup ladder (below
    MinHash/SimHash): catches trivial near-dups for the cost of a string
    expression. Normalization is a codegen'd JVM regexp (no Python); the
    multi-distinct aggregation is a standard two-phase expand+agg that
    scales with distinct counts per source, not corpus size."""
    docs = _t(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    return (docs.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.countDistinct("text").alias("distinct_raw"),
                 F.countDistinct(norm).alias("distinct_norm"))
            .coalesce(1).orderBy("source"))
