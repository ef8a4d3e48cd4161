"""As-of join and range join semantics (operators/temporal.py)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from bd_delete_records_from_external_hive_table_spark.operators.temporal import as_of_join, range_join


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_backward_inclusive(spark):
    left = spark.createDataFrame(
        [(1, _ts("2026-01-01T10:00:00")),   # before any right row
         (1, _ts("2026-01-01T12:00:00")),   # exactly at a right ts (inclusive)
         (1, _ts("2026-01-01T13:30:00")),   # between right rows
         (2, _ts("2026-01-01T12:30:00"))],  # other key
        "k long, ts timestamp")
    right = spark.createDataFrame(
        [(1, _ts("2026-01-01T12:00:00"), 10.0),
         (1, _ts("2026-01-01T13:00:00"), 20.0),
         (2, _ts("2026-01-01T12:00:00"), 99.0)],
        "k long, ts timestamp, v double")
    out = {(r.k, r.ts): r.v_asof
           for r in as_of_join(left, right, on="k",
                               value_cols=["v"]).collect()}
    assert out[(1, _ts("2026-01-01T10:00:00"))] is None
    assert out[(1, _ts("2026-01-01T12:00:00"))] == 10.0  # inclusive bound
    assert out[(1, _ts("2026-01-01T13:30:00"))] == 20.0  # latest prior
    assert out[(2, _ts("2026-01-01T12:30:00"))] == 99.0  # per-key isolation


def test_asof_null_value_in_latest_right_row_stays_null(spark):
    """The latest right row wins even when its value is NULL — and with
    two value columns both must come from the SAME right row."""
    left = spark.createDataFrame(
        [(1, _ts("2026-01-01T13:30:00"))], "k long, ts timestamp")
    right = spark.createDataFrame(
        [(1, _ts("2026-01-01T12:00:00"), 10.0, "a"),
         (1, _ts("2026-01-01T13:00:00"), None, "b")],
        "k long, ts timestamp, v double, tag string")
    row = as_of_join(left, right, on="k",
                     value_cols=["v", "tag"]).collect()[0]
    assert row.v_asof is None      # latest row's NULL preserved
    assert row.tag_asof == "b"     # both fields from the 13:00 row


def test_asof_ignores_null_ts_and_null_key_right_rows(spark):
    """SQL comparisons with NULL are never true: a right row with NULL ts
    or NULL key matches nothing (it must not sort first and leak its
    values), and a left row with no real prior match stays NULL."""
    left = spark.createDataFrame(
        [(1, _ts("2026-01-01T10:00:00"))], "k long, ts timestamp")
    right = spark.createDataFrame(
        [(1, None, 99.0),                       # NULL ts — never matches
         (None, _ts("2026-01-01T09:00:00"), 77.0),  # NULL key
         (1, _ts("2026-01-01T11:00:00"), 10.0)],    # after left ts
        "k long, ts timestamp, v double")
    row = as_of_join(left, right, on="k", value_cols=["v"]).collect()[0]
    assert row.v_asof is None


def test_range_join_rejects_bad_inputs(spark):
    points = spark.createDataFrame([(5.0,)], "x double")
    intervals = spark.createDataFrame(
        [(0, 10.0, 0.0)], "band int, lo double, hi double")  # inverted
    # inverted interval matches nothing (and must not explode)
    assert range_join(points, intervals, "x", "lo", "hi",
                      granularity=1.0).count() == 0
    import pytest as _pytest
    with _pytest.raises(ValueError):
        range_join(points, intervals, "x", "lo", "hi", granularity=0)


def test_asof_preserves_left_cardinality(spark, sf_dir):
    from bd_delete_records_from_external_hive_table_spark.sources.tables import load_table
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase")
    clicks = ev.where(F.col("event_type") == "click") \
        .select("user_id", "ts", "value")
    joined = as_of_join(purchases, clicks, on="user_id", value_cols=["value"])
    assert joined.count() == purchases.count()


def test_range_join_boundaries(spark):
    points = spark.createDataFrame(
        [(0.0,), (9.99,), (10.0,), (25.0,), (30.0,), (-1.0,)], "x double")
    intervals = spark.createDataFrame(
        [(0, 0.0, 10.0), (1, 10.0, 20.0), (2, 20.0, 30.0)],
        "band int, lo double, hi double")
    got = {r.x: r.band for r in
           range_join(points, intervals, "x", "lo", "hi",
                      granularity=10.0).collect()}
    assert got[0.0] == 0          # lo inclusive
    assert got[9.99] == 0
    assert got[10.0] == 1         # hi exclusive → next band
    assert got[25.0] == 2
    assert 30.0 not in got        # beyond last hi
    assert -1.0 not in got        # below first lo


def test_range_join_interval_spanning_buckets(spark):
    """An interval wider than the granularity must match points in every
    bucket it overlaps."""
    points = spark.createDataFrame([(5.0,), (15.0,), (35.0,)], "x double")
    intervals = spark.createDataFrame([(0, 0.0, 40.0)],
                                      "band int, lo double, hi double")
    rows = range_join(points, intervals, "x", "lo", "hi",
                      granularity=10.0).collect()
    assert sorted(r.x for r in rows) == [5.0, 15.0, 35.0]
    # no duplicate matches despite the interval exploding into 4 buckets
    assert len(rows) == 3


# ---------------------------------------------------------------------------
# nearest_join (bidirectional as-of)
# ---------------------------------------------------------------------------

def test_nearest_join_picks_closer_side_and_breaks_ties_backward(spark):
    from bd_delete_records_from_external_hive_table_spark.operators.temporal import nearest_join
    left = spark.createDataFrame(
        [(1, 100), (2, 100), (3, 100), (4, 200)], "id long, k long") \
        .selectExpr("id", "k",
                    "CASE id WHEN 1 THEN 50 WHEN 2 THEN 95 "
                    "WHEN 3 THEN 10 ELSE 999 END AS t")
    right = spark.createDataFrame(
        [(100, 40), (100, 60), (100, 90)], "k long, t long")
    out = {r.id: r for r in nearest_join(left, right, on="k",
                                         left_ts="t", right_ts="t")
           .collect()}
    # id=1 @50: back=40 (d=10), fwd=60 (d=10) — tie → backward wins
    assert (out[1].side, out[1].nearest_ts) == ("back", 40)
    # id=2 @95: back=90 (d=5), fwd none → back
    assert (out[2].side, out[2].nearest_ts) == ("back", 90)
    # id=3 @10: nothing before → fwd=40
    assert (out[3].side, out[3].nearest_ts) == ("fwd", 40)
    # id=4: key with no right rows at all → NULL side, NULL nearest
    assert out[4].side is None and out[4].nearest_ts is None


def test_nearest_join_equal_ts_counts_backward_not_forward(spark):
    """A right row AT the left ts is the inclusive-backward match (gap 0);
    the forward bound is strict, so it must not also serve as fwd."""
    from bd_delete_records_from_external_hive_table_spark.operators.temporal import nearest_join
    left = spark.createDataFrame([(1, 7, 100)], "id long, k long, t long") \
        .select("id", "k", "t")
    right = spark.createDataFrame([(7, 100), (7, 150)], "k long, t long")
    row = nearest_join(left, right, on="k",
                       left_ts="t", right_ts="t").collect()[0]
    assert row.back_ts == 100 and row.fwd_ts == 150
    assert row.side == "back" and row.nearest_ts == 100


# ---------------------------------------------------------------------------
# containment_pairs (asymmetric shingle containment)
# ---------------------------------------------------------------------------

def test_containment_is_asymmetric_for_subset_docs(spark):
    """A doc fully pasted into a longer one scores 1.0 in the subset
    direction but below threshold the other way — the case symmetric
    Jaccard misses."""
    from bd_delete_records_from_external_hive_table_spark.operators.dedup import containment_pairs
    docs = spark.createDataFrame(
        [(1, "a b c d e"),
         (2, "a b c d e f g h i j k l m n o p"),
         (3, "z y x w v")],
        "doc_id long, text string")
    rows = {(r.a, r.b): r.containment
            for r in containment_pairs(docs, threshold=0.8).collect()}
    # doc1 has 3 shingles, all present in doc2 → C(1→2) = 1.0
    assert rows[(1, 2)] == 1.0
    # doc2 has 14 shingles, only 3 shared → C(2→1) ≈ 0.21 < 0.8: absent
    assert (2, 1) not in rows
    # unrelated doc never pairs (no shared shingle → no candidate row)
    assert not any(3 in p for p in rows)


def test_containment_max_shingle_df_prunes_hot_shingles(spark):
    """Capping shingle document frequency drops boilerplate shingles
    before pairing; intersections only ever UNDERcount."""
    from bd_delete_records_from_external_hive_table_spark.operators.dedup import containment_pairs
    # the same boilerplate shingle set in every doc
    docs = spark.createDataFrame(
        [(i, "common boiler plate text here") for i in range(5)],
        "doc_id long, text string")
    full = containment_pairs(docs, threshold=0.5).collect()
    assert len(full) == 5 * 4  # every ordered pair, containment 1.0
    # df cap of 4 < 5 docs removes every shingle → no candidates at all
    pruned = containment_pairs(docs, threshold=0.5,
                               max_shingle_df=4).collect()
    assert pruned == []


def test_containment_pruning_never_inflates_containment(spark):
    """size_a must come from the UNPRUNED shingle set: a doc dominated
    by boilerplate (pruned) shingles plus one rare shared shingle must
    NOT score containment 1.0 after pruning — pruning shrinks only the
    intersection, never the denominator."""
    from bd_delete_records_from_external_hive_table_spark.operators.dedup import containment_pairs
    boiler = "common boiler plate text here appears in every document"
    docs = spark.createDataFrame(
        # docs 0-4 share the boilerplate; after df-pruning, doc 0's ONLY
        # surviving shingles are the 3 trailing ones, all shared with
        # doc 5 — the exact shape that inflated containment pre-fix
        [(0, boiler + " rare shared trigram"),
         (1, boiler), (2, boiler), (3, boiler), (4, boiler),
         (5, "zz ww every document rare shared trigram")],
        "doc_id long, text string")
    got = {(r.a, r.b): (r.n_shared, r.size_a, r.containment)
           for r in containment_pairs(docs, threshold=0.8,
                                      max_shingle_df=3).collect()}
    # pre-fix this reported (0, 5) with size_a=3 (post-prune) and
    # containment 1.0; with the unpruned denominator C(0→5) = 3/10 ≪ 0.8
    assert (0, 5) not in got
    # and pruning still kills the boilerplate-only quadratic pairs
    assert not any(a in (1, 2, 3, 4) and b in (1, 2, 3, 4)
                   for a, b in got)


def test_nearest_join_matches_bruteforce_on_randomized_input(spark):
    """Randomized cross-check: 300x300 rows over 12 keys with a tiny ts
    range (forcing equal-ts collisions and exact-distance ties) must
    match a brute-force per-row oracle exactly."""
    import random as _random

    from bd_delete_records_from_external_hive_table_spark.operators.temporal import nearest_join
    rng = _random.Random(20260814)
    lrows = [(i, rng.randrange(12), rng.randrange(40)) for i in range(300)]
    rrows = [(rng.randrange(12), rng.randrange(40)) for _ in range(300)]
    left = spark.createDataFrame(lrows, "id long, k long, t long")
    right = spark.createDataFrame(rrows, "k long, t long")

    expect = {}
    for i, k, t in lrows:
        backs = [rt for rk, rt in rrows if rk == k and rt <= t]
        fwds = [rt for rk, rt in rrows if rk == k and rt > t]
        back = max(backs) if backs else None
        fwd = min(fwds) if fwds else None
        if back is not None and (fwd is None or t - back <= fwd - t):
            expect[i] = (back, fwd, back, "back")
        elif fwd is not None:
            expect[i] = (back, fwd, fwd, "fwd")
        else:
            expect[i] = (None, None, None, None)

    out = nearest_join(left, right, on="k",
                       left_ts="t", right_ts="t").collect()
    assert len(out) == len(lrows)
    for r in out:
        assert (r.back_ts, r.fwd_ts, r.nearest_ts, r.side) == expect[r.id], \
            (r.id, r.k, r.t)


def test_containment_pairs_match_setwise_bruteforce(spark):
    """Randomized cross-check vs a Python-set oracle: every ordered pair
    over threshold, with exact n_shared / size_a, and nothing extra."""
    import random as _random

    from bd_delete_records_from_external_hive_table_spark.operators.dedup import containment_pairs
    rng = _random.Random(42)
    vocab = ["w%d" % i for i in range(12)]
    docs = [(i, " ".join(rng.choice(vocab)
                         for _ in range(rng.randrange(3, 25))))
            for i in range(40)]

    def sset(text):
        toks = text.split()
        return {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}

    shingle_sets = {i: sset(t) for i, t in docs}
    expect = {}
    for a, sa in shingle_sets.items():
        if not sa:
            continue
        for b, sb in shingle_sets.items():
            if a == b:
                continue
            shared = len(sa & sb)
            # same integer cross-multiply the operator uses (rounding-free)
            if shared * 10000 >= len(sa) * 5000:
                expect[(a, b)] = (shared, len(sa), round(shared / len(sa), 4))

    got = {(r.a, r.b): (r.n_shared, r.size_a, r.containment)
           for r in containment_pairs(
               spark.createDataFrame(docs, "doc_id long, text string"),
               threshold=0.5).collect()}
    assert got == expect
