"""Skew-mitigation helpers: salted two-stage aggregation and salted
broadcast joins.

AQE's skew-join splitting (enabled in session.py) handles most runtime
skew in sort-merge joins; these helpers cover the cases AQE cannot: a
groupBy where one key holds a double-digit percentage of all rows (the
"null key" / "default tenant" problem at 100 TB), and a broadcast join
against a skewed probe side where one task's input explodes.

Salting trades one extra (cheap, well-distributed) shuffle stage for
bounded per-task input: stage 1 aggregates on (key, salt) — at most
``salt_buckets``× the average partition size per task — stage 2 combines
the per-salt partials, shuffling only ``distinct_keys × salt_buckets``
rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["with_salt", "salted_aggregate"]

#: Decomposable aggregates: (partial expression, combine expression).
_COMBINABLE = {
    "count": (lambda c: F.count(c), F.sum),
    "sum": (lambda c: F.sum(c), F.sum),
    "min": (lambda c: F.min(c), F.min),
    "max": (lambda c: F.max(c), F.max),
}


def with_salt(df: DataFrame, salt_buckets: int,
              salt_col: str = "_salt") -> DataFrame:
    """Uniform salt in [0, salt_buckets): row-content hash mixed with a
    per-row sequence id. The sequence id is essential — a pure content
    hash would send *identical* rows (exactly the repeated-sentinel-row
    shape that causes the skew) to one salt bucket. The id makes the salt
    dependent on partition layout, which is safe here: salted_aggregate's
    combine step is commutative, so results are identical for any salt
    assignment."""
    return df.withColumn(
        salt_col,
        F.pmod(F.xxhash64(F.monotonically_increasing_id(),
                          *[F.col(c) for c in df.columns]),
               F.lit(salt_buckets)))


def salted_aggregate(df: DataFrame, keys: list[str],
                     aggs: dict[str, tuple[str, str]],
                     salt_buckets: int = 16) -> DataFrame:
    """Two-stage skew-safe groupBy.

    ``aggs`` maps output column → (function, input column) with function
    in {count, sum, min, max} (the decomposable set; avg = sum/count at
    the call site). Semantically identical to
    ``df.groupBy(keys).agg(...)`` — the pre-shuffle salt bounds the
    largest stage-1 task even when one key dominates the table.
    """
    unknown = {fn for fn, _ in aggs.values()} - set(_COMBINABLE)
    if unknown:
        raise ValueError(f"non-decomposable aggregate(s): {sorted(unknown)}")

    salted = with_salt(df, salt_buckets)
    partial = salted.groupBy(*keys, "_salt").agg(*[
        _COMBINABLE[fn][0](F.col(col)).alias(f"_p_{out}")
        for out, (fn, col) in aggs.items()])
    return partial.groupBy(*keys).agg(*[
        _COMBINABLE[fn][1](F.col(f"_p_{out}")).alias(out)
        for out, (fn, _) in aggs.items()])
