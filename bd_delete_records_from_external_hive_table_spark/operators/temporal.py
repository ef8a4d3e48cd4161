"""Temporal join operators Spark lacks as builtins: as-of join and range
join — expressed as compositions of existing DataFrame ops (SURVEY §2d
extension surface; the reference contains no joins at all).

Scale design (100 TB event logs):
- **As-of join** avoids the naive theta-join (every left row × every
  earlier right row) entirely: union both sides, one shuffle on the key,
  and a running ``last(ignorenulls)`` window carries the most recent right
  value forward onto left rows. Cost = one shuffle + one sort per key
  group, independent of time-range density. This is the standard
  union-merge formulation (same algorithm pandas.merge_asof uses locally,
  re-expressed as a distributed window).
- **Range join** (point-in-interval) avoids the BroadcastNestedLoopJoin
  Spark would plan for a non-equi condition: both sides map onto a bucket
  grid of width ``granularity`` (intervals explode to every bucket they
  overlap), the join becomes an equi-join on the bucket id, and a residual
  predicate removes false positives. Pair space shrinks from |L|×|R| to
  overlap-proportional; the join co-locates by bucket hash.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["as_of_join", "nearest_join", "range_join"]


def as_of_join(left: DataFrame, right: DataFrame, on: str,
               left_ts: str = "ts", right_ts: str = "ts",
               value_cols: list[str] | None = None,
               suffix: str = "_asof") -> DataFrame:
    """For every left row, attach the latest right row with
    ``right.ts <= left.ts`` for the same ``on`` key (backward as-of,
    inclusive — DuckDB ``ASOF JOIN ... ON l.ts >= r.ts`` semantics).
    Left rows with no prior right row keep NULLs.

    Returns all left columns plus ``<value_col><suffix>`` for each value
    column of the right side.
    """
    value_cols = value_cols or [
        c for c in right.columns if c not in (on, right_ts)]

    # Carry the right VALUES inside one struct so (a) all value columns
    # come from the same right row (never a chimera of two rows) and
    # (b) a legitimately-NULL value in the latest right row stays NULL —
    # only the struct itself is NULL on left rows, so last(ignorenulls)
    # skips left rows but never skips a real right row.
    vals = F.struct(*[F.col(c).alias(c) for c in value_cols])
    # A right row with a NULL key or NULL ts can never satisfy
    # `l.key = r.key AND l.ts >= r.ts` (SQL comparisons with NULL are
    # never true) — but the ascending sort would place NULL ts FIRST and
    # carry its values onto everything, so such rows are dropped here.
    rhs = (right
           .where(F.col(on).isNotNull() & F.col(right_ts).isNotNull())
           .select(F.col(on), F.col(right_ts).alias("_ts"),
                   F.lit(0).alias("_is_left"), vals.alias("_vals")))
    lhs = left.select(
        F.col(on), F.col(left_ts).alias("_ts"), F.lit(1).alias("_is_left"),
        F.struct(*left.columns).alias("_row"),
        F.lit(None).cast(rhs.schema["_vals"].dataType).alias("_vals"))
    rhs = rhs.withColumn(
        "_row", F.lit(None).cast(lhs.schema["_row"].dataType)) \
        .select(*lhs.columns)

    # Right rows sort before left rows at equal ts (_is_left ascending) so
    # the inclusive bound holds; the running last(ignorenulls) carries the
    # latest right ROW forward within the key group.
    w = (Window.partitionBy(on).orderBy("_ts", "_is_left")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = lhs.unionByName(rhs).select(
        "*", F.last("_vals", ignorenulls=True).over(w).alias("_carr"))
    return (carried.where(F.col("_is_left") == 1)
            .select(*[F.col(f"_row.{c}").alias(c) for c in left.columns],
                    *[F.col(f"_carr.{c}").alias(f"{c}{suffix}")
                      for c in value_cols]))


def nearest_join(left: DataFrame, right: DataFrame, on: str,
                 left_ts: str = "ts", right_ts: str = "ts") -> DataFrame:
    """For every left row, the nearest right timestamp for the same key in
    EITHER direction: backward (``right.ts <= left.ts``, inclusive) and
    forward (``right.ts > left.ts``, strict), with the nearer of the two
    selected and backward winning exact-distance ties. The
    backward/forward split is exhaustive and non-overlapping, so every
    right row is a candidate exactly once.

    Same union-window shape as :func:`as_of_join` — one shuffle on the
    key, then a running ``last`` (backward carry) and ``first`` (forward
    carry) over the SAME sorted union, so both directions cost one sort.
    Right rows order before left rows at equal ts (``_is_left``
    ascending): the preceding-frame ``last`` therefore sees equal-ts
    right rows (inclusive backward) while the following-frame ``first``
    does not (strict forward) — both bounds fall out of one sort order.

    Returns all left columns plus ``back_ts`` / ``fwd_ts`` (nullable),
    ``nearest_ts`` and ``side`` ('back' / 'fwd'; NULL when the key has no
    right rows at all). Timestamps are compared as-is; pass integer
    epochs for engine-exact tie behavior.
    """
    rhs = (right
           .where(F.col(on).isNotNull() & F.col(right_ts).isNotNull())
           .select(F.col(on), F.col(right_ts).alias("_ts"),
                   F.lit(0).alias("_is_left")))
    lhs = left.select(
        F.col(on), F.col(left_ts).alias("_ts"), F.lit(1).alias("_is_left"),
        F.struct(*left.columns).alias("_row"))
    rhs = rhs.withColumn(
        "_row", F.lit(None).cast(lhs.schema["_row"].dataType))

    order = [F.col("_ts"), F.col("_is_left")]
    w_back = (Window.partitionBy(on).orderBy(*order)
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    w_fwd = (Window.partitionBy(on).orderBy(*order)
             .rowsBetween(Window.currentRow, Window.unboundedFollowing))
    right_ts_or_null = F.when(F.col("_is_left") == 0, F.col("_ts"))
    carried = lhs.unionByName(rhs).select(
        "*",
        F.last(right_ts_or_null, ignorenulls=True).over(w_back)
        .alias("back_ts"),
        F.first(right_ts_or_null, ignorenulls=True).over(w_fwd)
        .alias("fwd_ts"))

    back_d = F.col("_ts") - F.col("back_ts")
    fwd_d = F.col("fwd_ts") - F.col("_ts")
    take_back = F.col("back_ts").isNotNull() & (
        F.col("fwd_ts").isNull() | (back_d <= fwd_d))
    return (carried.where(F.col("_is_left") == 1)
            .select(*[F.col(f"_row.{c}").alias(c) for c in left.columns],
                    "back_ts", "fwd_ts",
                    F.when(take_back, F.col("back_ts"))
                    .otherwise(F.col("fwd_ts")).alias("nearest_ts"),
                    F.when(take_back, F.lit("back"))
                    .when(F.col("fwd_ts").isNotNull(), F.lit("fwd"))
                    .alias("side")))


def range_join(points: DataFrame, intervals: DataFrame,
               point_col: str, lo_col: str, hi_col: str,
               granularity: float,
               how: str = "inner") -> DataFrame:
    """Join point rows to interval rows where ``lo <= point < hi`` via a
    bucket-grid equi-join plus residual filter (no nested-loop join).

    ``granularity`` is the bucket width — pick it near the typical
    interval length so intervals explode into O(1) buckets each.
    """
    if how != "inner":
        raise ValueError("range_join currently supports inner joins only")
    g = float(granularity)
    if g <= 0:
        raise ValueError("granularity must be positive")
    p = points.withColumn("_bucket",
                          F.floor(F.col(point_col) / F.lit(g)).cast("long"))
    lo_b = F.floor(F.col(lo_col) / F.lit(g)).cast("long")
    # hi is exclusive: when hi sits exactly on a bucket boundary that
    # bucket can't match. Integer arithmetic, not a float epsilon — an
    # epsilon below one ulp (e.g. epoch-scale doubles) silently no-ops.
    hi_b = F.floor(F.col(hi_col) / F.lit(g)).cast("long") - \
        F.when(F.pmod(F.col(hi_col), F.lit(g)) == 0, F.lit(1)) \
         .otherwise(F.lit(0))
    iv = (intervals
          # empty/inverted intervals match nothing; without this guard a
          # malformed hi < lo row would explode a DESCENDING sequence
          .where(F.col(hi_col) > F.col(lo_col))
          .withColumn("_bucket",
                      F.explode(F.sequence(lo_b, F.greatest(hi_b, lo_b)))))
    return (p.join(iv, "_bucket")
            .where((F.col(point_col) >= F.col(lo_col))
                   & (F.col(point_col) < F.col(hi_col)))
            .drop("_bucket"))
