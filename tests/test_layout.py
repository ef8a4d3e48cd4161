"""Clustered-write layout: row-group min/max stats become selective, so
point/range predicates can skip most of the file bytes — measured from
the parquet footers, plus a read-back correctness check."""

from __future__ import annotations

from pyspark.sql import functions as F

from bd_delete_records_from_external_hive_table_spark.sources.layout import (
    clustering_report,
    write_clustered,
)
from bd_delete_records_from_external_hive_table_spark.sources.tables import load_table


def test_clustered_write_tightens_row_group_stats(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem")
    shuffled = str(tmp_path / "shuffled")
    clustered = str(tmp_path / "clustered")

    # baseline: random 4-way layout — every row group spans ~all of
    # l_shipdate, nothing can skip
    li.repartition(4).write.mode("overwrite").parquet(shuffled)
    # clustered: range-shuffled + sorted — each row group owns a narrow
    # disjoint slice
    write_clustered(li, clustered, cluster_by=["l_shipdate"], num_files=4)

    base = clustering_report(shuffled, "l_shipdate")
    clus = clustering_report(clustered, "l_shipdate")
    assert base.row_groups >= 4 and clus.row_groups >= 4
    # random layout: point query hits ~every group; clustered: ~1/n
    assert base.avg_point_overlap > 0.7
    assert clus.avg_point_overlap < 0.4
    assert clus.skip_ratio > base.skip_ratio

    # clustered ranges are (near-)disjoint: sorted by min, each group's
    # min is >= the previous group's max (touching endpoints allowed)
    rs = sorted(clus.ranges)
    assert all(rs[i][0] >= rs[i - 1][1] for i in range(1, len(rs)))


def test_clustered_read_back_is_lossless_and_pushes_filters(
        spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem")
    path = str(tmp_path / "clustered")
    write_clustered(li, path, cluster_by=["l_shipdate"], num_files=4)

    pred = (F.col("l_shipdate") >= "1996-01-01") \
        & (F.col("l_shipdate") < "1996-02-01")
    expect = li.where(pred).count()
    got_df = spark.read.parquet(path).where(pred)
    assert got_df.count() == expect
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "l_shipdate" in plan.split(
        "PushedFilters", 1)[1].splitlines()[0]


def test_clustered_write_with_directory_partitioning(spark, sf_dir,
                                                     tmp_path):
    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.to_date("ts").cast("string"))
    path = str(tmp_path / "by_type")
    write_clustered(ev, path, cluster_by=["user_id"],
                    partition_by=["event_type"], num_files=2)
    import os
    dirs = {d for d in os.listdir(path) if d.startswith("event_type=")}
    assert len(dirs) >= 3  # coarse directory pruning layer exists
    back = spark.read.parquet(path)
    assert back.count() == ev.count()
    # directory-partition pruning: a filter on event_type lists only one dir
    one = back.where(F.col("event_type") == "click")
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


def test_clustering_report_handles_string_columns(spark, sf_dir, tmp_path):
    """The overlap metric needs only a total order — string cluster keys
    must report, not crash (regression: the span arithmetic used to
    TypeError on str)."""
    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "by_type_str")
    write_clustered(ev, path, cluster_by=["event_type"], num_files=4)
    rep = clustering_report(path, "event_type")
    assert rep.row_groups >= 4
    assert 0.0 < rep.avg_point_overlap <= 1.0
    # range-clustered on the string key → mostly disjoint groups
    assert rep.avg_point_overlap < 0.6


def test_clustering_metric_properties():
    """Pure-metric properties on synthetic range sets: bounded to
    [1/n, 1]; disjoint ranges score near-perfect; identical full-span
    ranges score 1.0."""
    from bd_delete_records_from_external_hive_table_spark.sources.layout import (
        overlap_score as score,
    )

    disjoint = [(i * 10, i * 10 + 9) for i in range(8)]
    overlapping = [(0, 100)] * 8
    half = [(i * 5, i * 5 + 50) for i in range(8)]
    assert score(disjoint) <= 0.15
    assert score(overlapping) == 1.0
    assert score(disjoint) < score(half) < score(overlapping)
    # string ordering works identically
    sdisjoint = [("a", "b"), ("c", "d"), ("e", "f")]
    assert score(sdisjoint) <= 0.5


def test_zorder_write_skips_on_both_columns(spark, sf_dir, tmp_path):
    """Z-order (Morton-interleaved) clustering gives BOTH listed columns
    meaningful row-group locality: the worst column's skip ratio beats
    single-column range clustering's worst column, and each z-ordered
    column individually clears 50% skippable. Range clustering stays the
    better choice for its one column — that contrast is the point."""
    from bd_delete_records_from_external_hive_table_spark.sources.layout import (
        write_zordered,
    )
    orders = load_table(spark, sf_dir, "orders")
    rng = str(tmp_path / "rng")
    zo = str(tmp_path / "zo")
    write_clustered(orders, rng, cluster_by=["o_custkey"], num_files=16)
    write_zordered(orders, zo, zorder_by=["o_custkey", "o_totalprice"],
                   num_files=16)

    skips = {(tag, col): clustering_report(path, col).skip_ratio
             for tag, path in (("rng", rng), ("zo", zo))
             for col in ("o_custkey", "o_totalprice")}
    zo_worst = min(skips[("zo", "o_custkey")], skips[("zo", "o_totalprice")])
    rng_worst = min(skips[("rng", "o_custkey")],
                    skips[("rng", "o_totalprice")])
    assert zo_worst > rng_worst, skips
    assert zo_worst >= 0.5, skips
    # single-column range clustering stays unbeaten on its own column
    assert skips[("rng", "o_custkey")] >= 0.85, skips
    assert skips[("rng", "o_custkey")] > skips[("zo", "o_custkey")], skips


def test_zorder_read_back_is_lossless(spark, sf_dir, tmp_path):
    """The z-key is layout-only: it never lands in the file schema and
    the written rows are exactly the input rows."""
    from bd_delete_records_from_external_hive_table_spark.sources.layout import (
        write_zordered,
    )
    orders = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "zo_rt")
    write_zordered(orders, path, zorder_by=["o_custkey", "o_totalprice"],
                   num_files=8)
    back = spark.read.parquet(path)
    assert set(back.columns) == set(orders.columns)
    assert back.count() == orders.count()
    assert back.exceptAll(orders).count() == 0
    assert orders.exceptAll(back).count() == 0


def test_zorder_rejects_long_overflow(spark, sf_dir):
    from bd_delete_records_from_external_hive_table_spark.sources.layout import (
        zorder_column,
    )
    import pytest as _pytest
    orders = load_table(spark, sf_dir, "orders")
    with _pytest.raises(ValueError):
        zorder_column(orders, ["o_custkey", "o_totalprice"], bits=32)
