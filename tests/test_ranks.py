"""operators/ranks.py — two-pass bucketed global rank/cumsum.

The contract: identical VALUES to a global ROW_NUMBER / running-sum
window, with a plan that contains no Exchange SinglePartition under
any WindowExec (the whole reason the operator exists — round-8
verdict items 1 and 2)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from bd_delete_records_from_external_hive_table_spark.operators import ranks


def _reference(rows, asc):
    ordered = sorted(rows, key=lambda r: r[0], reverse=not asc)
    out, run = {}, 0
    for i, (k, v) in enumerate(ordered, start=1):
        run += v
        out[k] = (i, run)
    return out


@pytest.mark.parametrize("asc", [True, False])
@pytest.mark.parametrize("seed", [1, 2])
def test_rank_cumsum_matches_global_window(spark, asc, seed):
    rng = random.Random(seed)
    keys = rng.sample(range(-10**9, 10**9), 500)
    rows = [(k, rng.randrange(0, 100)) for k in keys]
    df = spark.createDataFrame(rows, "k long, v long").repartition(7)
    rf = ranks.global_rank_cumsum(df, "k", sum_cols=["v"],
                                  ascending=asc, num_buckets=16,
                                  rank_col="r")
    want = _reference(rows, asc)
    got = {r["k"]: (r["r"], r["cum_v"]) for r in rf.df.collect()}
    assert got == want
    assert rf.total_count == len(rows)
    assert rf.totals["v"] == sum(v for _, v in rows)


def test_rank_cumsum_plan_has_no_single_partition_window(spark):
    df = spark.createDataFrame(
        [(i, i % 7) for i in range(200)], "k long, v long")
    rf = ranks.global_rank_cumsum(df, "k", sum_cols=["v"])
    plan = (rf.df._jdf.queryExecution().executedPlan().toString())
    assert "Window" in plan            # it does use windows...
    for line in plan.splitlines():     # ...but never a global one
        if "Exchange" in line:
            assert "SinglePartition" not in line, line


def test_rank_cumsum_empty_and_constant_key(spark):
    empty = spark.createDataFrame([], "k long, v long")
    rf = ranks.global_rank_cumsum(empty, "k", sum_cols=["v"])
    assert rf.df.count() == 0 and rf.total_count == 0
    one = spark.createDataFrame([(5, 3)], "k long, v long")
    rf1 = ranks.global_rank_cumsum(one, "k", sum_cols=["v"])
    row = rf1.df.collect()[0]
    assert (row["rank"], row["cum_v"]) == (1, 3)
    assert rf1.total_count == 1 and rf1.totals["v"] == 3


def test_rank_cumsum_extreme_key_range(spark):
    """Keys spanning beyond 2^53 (where the double bucket map loses
    ulps): bucket assignment only needs monotonicity, so ranks must
    still be exact."""
    keys = [-(2**62), -12345, 0, 7, 2**40, 2**61, 2**62]
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    rf = ranks.global_rank_cumsum(df, "k", num_buckets=4)
    got = {r["k"]: r["rank"] for r in rf.df.collect()}
    assert got == {k: i + 1 for i, k in enumerate(sorted(keys))}
