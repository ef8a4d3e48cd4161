"""Scale patterns: salted aggregation equivalence and bucketed co-located
joins (shuffle-free sort-merge)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from bd_delete_records_from_external_hive_table_spark.operators.skew import salted_aggregate, with_salt
from bd_delete_records_from_external_hive_table_spark.sources.tables import load_table


def test_salted_aggregate_equals_plain_groupby(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    plain = {r.l_returnflag: (r.n, round(r.qty, 2), r.mn, r.mx)
             for r in li.groupBy("l_returnflag").agg(
                 F.count(F.lit(1)).alias("n"),
                 F.sum("l_quantity").alias("qty"),
                 F.min("l_orderkey").alias("mn"),
                 F.max("l_orderkey").alias("mx")).collect()}
    salted = {r.l_returnflag: (r.n, round(r.qty, 2), r.mn, r.mx)
              for r in salted_aggregate(
                  li, ["l_returnflag"],
                  {"n": ("count", "l_quantity"),
                   "qty": ("sum", "l_quantity"),
                   "mn": ("min", "l_orderkey"),
                   "mx": ("max", "l_orderkey")},
                  salt_buckets=8).collect()}
    assert salted == plain


def test_salt_is_uniform_and_spreads_identical_rows(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").limit(2000)
    s1 = with_salt(li, 16).groupBy("_salt").count().collect()
    assert len(s1) == 16
    counts = [r["count"] for r in s1]
    assert max(counts) < 2 * min(counts)  # roughly uniform
    # the degenerate skew case: byte-identical rows of one hot key must
    # still spread across salt buckets
    from pyspark.sql import functions as F
    dup = spark.range(2000).select(F.lit("hot").alias("k"),
                                   F.lit(1).alias("v"))
    spread = with_salt(dup, 16).select("_salt").distinct().count()
    assert spread == 16


def test_salted_aggregate_correct_on_identical_rows(spark):
    from pyspark.sql import functions as F
    dup = spark.range(5000).select(F.lit("hot").alias("k"),
                                   F.lit(2).alias("v"))
    got = salted_aggregate(dup, ["k"], {"n": ("count", "v"),
                                        "s": ("sum", "v")},
                           salt_buckets=16).collect()
    assert len(got) == 1
    assert (got[0].n, got[0].s) == (5000, 10000)


def test_salted_aggregate_rejects_non_decomposable(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    with pytest.raises(ValueError):
        salted_aggregate(li, ["l_returnflag"],
                         {"m": ("median", "l_quantity")})


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    """Tables bucketed on the join key sort-merge-join without any
    Exchange — the co-location pattern that makes repeated fact-fact
    joins affordable at 100 TB (shuffle paid once at write time)."""
    orders = load_table(spark, sf_dir, "orders").limit(5000)
    li = load_table(spark, sf_dir, "lineitem").limit(5000)
    spark.sql("CREATE DATABASE IF NOT EXISTS bkt")
    spark.sql("DROP TABLE IF EXISTS bkt.orders_b")
    spark.sql("DROP TABLE IF EXISTS bkt.lineitem_b")
    (orders.write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
     .format("parquet").saveAsTable("bkt.orders_b"))
    (li.write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
     .format("parquet").saveAsTable("bkt.lineitem_b"))
    try:
        a = spark.table("bkt.orders_b")
        b = spark.table("bkt.lineitem_b")
        joined = (a.join(b.hint("merge"),
                         a.o_orderkey == b.l_orderkey)
                  .groupBy("o_orderstatus")
                  .agg(F.count(F.lit(1)).alias("n")))
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # no shuffle feeds the join — the only allowed Exchange is the
        # post-join aggregation's
        assert not re.search(r"Exchange hashpartitioning\([lo]_orderkey",
                             plan), plan
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt.orders_b")
        spark.sql("DROP TABLE IF EXISTS bkt.lineitem_b")


def test_partitioned_table_schema_evolution(spark):
    """Adding a column to a partitioned external-format table must leave
    old partitions readable (NULL-filled) while new partitions carry the
    value — the operational path for evolving a 100 TB table in place
    without rewriting history."""
    spark.sql("CREATE DATABASE IF NOT EXISTS test_db")
    t = "test_db.evolve_t"
    spark.sql(f"DROP TABLE IF EXISTS {t}")
    spark.sql(f"CREATE TABLE {t} (id BIGINT, v STRING) "
              f"PARTITIONED BY (p STRING) STORED AS ORC")
    try:
        spark.sql(f"INSERT INTO {t} PARTITION (p='old') "
                  f"VALUES (1, 'a'), (2, 'b')")
        spark.sql(f"ALTER TABLE {t} ADD COLUMNS (score DOUBLE)")
        spark.sql(f"INSERT INTO {t} PARTITION (p='new') "
                  f"VALUES (3, 'c', 1.5), (4, 'd', 2.5)")

        rows = {r.id: (r.v, r.score)
                for r in spark.table(t).collect()}
        assert rows == {1: ("a", None), 2: ("b", None),
                        3: ("c", 1.5), 4: ("d", 2.5)}
        # aggregates treat missing-in-old as NULL (ignored by SUM)
        got = spark.table(t).agg(F.sum("score").alias("s")).first()["s"]
        assert got == 4.0
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_analyze_table_statistics_feed_the_optimizer(spark, sf_dir):
    """ANALYZE TABLE populates table/column stats the optimizer uses for
    size estimates (broadcast decisions, CBO join orders). At 100 TB,
    stale stats mean a sort-merge join where a broadcast was possible."""
    spark.sql("CREATE DATABASE IF NOT EXISTS test_db")
    t = "test_db.stats_t"
    spark.sql(f"DROP TABLE IF EXISTS {t}")
    load_table(spark, sf_dir, "nation").write.saveAsTable(t)
    try:
        spark.sql(f"ANALYZE TABLE {t} COMPUTE STATISTICS")
        spark.sql(f"ANALYZE TABLE {t} COMPUTE STATISTICS "
                  f"FOR COLUMNS n_nationkey, n_name")
        detail = spark.sql(f"DESCRIBE TABLE EXTENDED {t}").collect()
        stats_row = [r.data_type for r in detail
                     if r.col_name == "Statistics"]
        assert stats_row and "rows" in stats_row[0]
        col = spark.sql(
            f"DESCRIBE TABLE EXTENDED {t} n_nationkey").collect()
        info = {r.info_name: r.info_value for r in col}
        assert info.get("distinct_count") not in (None, "NULL")
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_dynamic_partition_pruning_prunes_fact_partitions(spark, sf_dir,
                                                          tmp_path):
    """A date-partitioned fact joined to a filtered dim on the partition
    column is pruned at RUNTIME by Catalyst's dynamic partition pruning:
    the broadcast dim's key set becomes a partition filter on the fact
    scan. At 100 TB this is the star-schema lever — a 'last quarter'
    dim filter reads only last quarter's fact partitions, with no
    literal date predicate anywhere in the query.

    Two non-obvious preconditions (both bit us): the dim must be a real
    file-backed relation — a createDataFrame local relation gets its
    filter constant-folded away, leaving no selective predicate for the
    DPP rule to key on — and the dim filter must be a *comparison*
    (`quarter = 'Q1'`), because a bare boolean attribute does not count
    as 'likely selective' in Catalyst's heuristic."""
    orders = load_table(spark, sf_dir, "orders")
    loc = str(tmp_path / "orders_by_month")
    (orders.withColumn("o_month", F.date_format("o_orderdate", "yyyy-MM"))
     .write.partitionBy("o_month").mode("overwrite").parquet(loc))
    fact = spark.read.parquet(loc)

    months = [r[0] for r in fact.select("o_month").distinct().collect()]
    dimloc = str(tmp_path / "months_dim")
    spark.createDataFrame(
        [(m, f"Q{(int(m[5:7]) - 1) // 3 + 1}") for m in months],
        "m string, quarter string").write.parquet(dimloc)
    dim = spark.read.parquet(dimloc)

    joined = (fact.join(F.broadcast(dim.where(F.col("quarter") == "Q1")),
                        fact.o_month == F.col("m"))
              .agg(F.sum("o_totalprice").alias("s")))
    q1_months = [m for m in months if int(m[5:7]) <= 3]
    expect = (fact.where(F.col("o_month").isin(q1_months))
              .agg(F.sum("o_totalprice")).collect()[0][0])
    assert joined.collect()[0]["s"] == pytest.approx(expect)

    plan = joined._jdf.queryExecution().toString()
    assert "dynamicpruning" in plan, plan


def test_runtime_bloom_filter_prunes_probe_side(spark, sf_dir):
    """With runtime bloom-filter injection on, a selective filter on one
    side of a shuffle join plants a `might_contain` pre-filter on the
    other side's scan — rows that cannot match are dropped BEFORE the
    shuffle. The size thresholds exist because the filter costs a build
    pass; at 100 TB the defaults (10 MB creation / 10 GB probe) enable
    it exactly where it pays. Here they're lowered to exercise the path
    on test-sized data."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter"
        ".applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold":
            "100MB",
        # force the shuffle-join path the filter targets
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        li = load_table(spark, sf_dir, "lineitem")
        orders = load_table(spark, sf_dir, "orders").where(
            F.col("o_totalprice") > 400000).select("o_orderkey")
        joined = (li.join(orders, li.l_orderkey == orders.o_orderkey)
                  .agg(F.count(F.lit(1)).alias("n")))
        n = joined.collect()[0]["n"]
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, plan
        # correctness unchanged by the filter
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
        assert n == (li.join(orders, li.l_orderkey == orders.o_orderkey)
                     .count())
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
