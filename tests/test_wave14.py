"""Wave-14 operator tests: t28 MATTR (hand-computed parity), ts11
Theil-Sen (pure-Python pairwise-slope reference), g03 assortativity
(clique-graph exactness + a hand-built path graph with a known
negative value). The oracle-checked queries are additionally covered
by the registry-wide parity sweep; this module asserts the SEMANTIC
contracts a value-hash alone doesn't explain."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from bd_delete_records_from_external_hive_table_spark.plans import REGISTRY
from bd_delete_records_from_external_hive_table_spark.sources.tables import load_table


def _q(name, spark, sf_dir):
    return REGISTRY[name].spark_fn(spark, sf_dir)


# ---------------------------------------------------------------------------
# t28: MATTR vs a from-first-principles Python recomputation
# ---------------------------------------------------------------------------

def test_t28_hand_computed_mattr(spark, sf_dir):
    got = {r["source"]: r for r in
           _q("t28_mattr_diversity", spark, sf_dir).collect()}
    docs = (load_table(spark, sf_dir, "documents")
            .select("source", "text").collect())
    by_src: dict[str, list[str]] = {}
    for r in docs:
        by_src.setdefault(r["source"], []).append(r["text"])
    for src in list(by_src)[:3]:
        vals = []
        for text in by_src[src]:
            ws = [t for t in re.split(r"[^a-z]+", text.lower()) if t]
            if len(ws) < 25:
                continue
            p = len(ws) - 24
            ttr = sum(len(set(ws[i:i + 25])) for i in range(p))
            vals.append((ttr * 1_000_000) // (25 * p))
        r = got[src]
        assert r["n_docs"] == len(vals)
        assert r["avg_mattr_micro"] == sum(vals) // len(vals)
        assert r["min_mattr_micro"] == min(vals)
        assert r["max_mattr_micro"] == max(vals)
        # MATTR is a ratio of distinct to window size: (0, 1] in micro
        assert 0 < r["min_mattr_micro"] <= 1_000_000


# ---------------------------------------------------------------------------
# ts11: Theil-Sen vs a pure-Python pairwise-slope median
# ---------------------------------------------------------------------------

def test_ts11_matches_python_reference(spark, sf_dir):
    OFF = 1_000_000_000_000_000
    got = {r["event_type"]: r for r in
           _q("ts11_theil_sen_trend", spark, sf_dir).collect()}
    daily = (load_table(spark, sf_dir, "events")
             .groupBy("event_type", F.col("ts").cast("date").alias("day"))
             .agg(F.sum(F.round(F.col("value") * 100).cast("long"))
                  .alias("cents"))
             .collect())
    by_type: dict[str, list[tuple]] = {}
    for r in daily:
        by_type.setdefault(r["event_type"], []).append((r["day"], r["cents"]))
    for et, pts in by_type.items():
        pts.sort()
        slopes = []
        for i in range(len(pts)):
            for j in range(i + 1, len(pts)):
                dd = (pts[j][0] - pts[i][0]).days
                dv = pts[j][1] - pts[i][1]
                slopes.append((dv * 1_000_000 + OFF * dd) // dd - OFF)
        slopes.sort()
        want = slopes[(len(slopes) + 1) // 2 - 1]  # lower median, 1-based
        assert got[et]["n_pairs"] == len(slopes), et
        assert got[et]["theil_sen_micro"] == want, et


def test_ts11_robust_to_one_spiked_day(spark):
    """The defining property: spiking ONE day by 100x moves the OLS
    slope wildly but leaves the Theil-Sen median in place (a linear
    series has all pairwise slopes equal; one outlier day perturbs
    only the n-1 pairs through it)."""
    import datetime as dt
    base = dt.date(2024, 1, 1)
    rows = [("a", base + dt.timedelta(days=i), 1000 + 10 * i)
            for i in range(20)]
    spiked = [(t, d, c * 100 if d == base + dt.timedelta(days=9) else c)
              for t, d, c in rows]
    OFF = 1_000_000_000_000_000

    def ts_micro(data):
        slopes = []
        for i in range(len(data)):
            for j in range(i + 1, len(data)):
                dd = (data[j][1] - data[i][1]).days
                dv = data[j][2] - data[i][2]
                slopes.append((dv * 1_000_000 + OFF * dd) // dd - OFF)
        slopes.sort()
        return slopes[(len(slopes) + 1) // 2 - 1]

    assert ts_micro(rows) == 10_000_000          # exact 10 cents/day
    assert ts_micro(spiked) == 10_000_000        # unmoved by the spike


# ---------------------------------------------------------------------------
# g03: assortativity — clique exactness + hand-built path graph
# ---------------------------------------------------------------------------

def _assort_frame(spark, pairs):
    """Replay the query's downstream math on an explicit pair list."""
    p = spark.createDataFrame(pairs, "a long, b long")
    und = (p.select(F.col("a").alias("s"), F.col("b").alias("d"))
           .unionByName(p.select(F.col("b").alias("s"),
                                 F.col("a").alias("d"))))
    deg = und.groupBy(F.col("s").alias("node")) \
             .agg(F.count(F.lit(1)).alias("dg"))
    da = deg.select(F.col("node").alias("s"), F.col("dg").alias("x"))
    db = deg.select(F.col("node").alias("d"), F.col("dg").alias("y"))
    ed = und.join(da, "s").join(db, "d")
    sm = ed.agg(F.count(F.lit(1)).alias("m"),
                F.sum("x").alias("sx"), F.sum("y").alias("sy"),
                F.sum(F.col("x") * F.col("y")).alias("sxy"),
                F.sum(F.col("x") * F.col("x")).alias("sxx"),
                F.sum(F.col("y") * F.col("y")).alias("syy")).collect()[0]
    num = sm["m"] * sm["sxy"] - sm["sx"] * sm["sy"]
    vx = sm["m"] * sm["sxx"] - sm["sx"] ** 2
    vy = sm["m"] * sm["syy"] - sm["sy"] ** 2
    if vx == 0 or vy == 0:
        return None
    return num / (vx ** 0.5 * vy ** 0.5)


def test_g03_path_graph_is_disassortative(spark):
    """P3 (a-b-c): degrees 1,2,1; directed edge degree pairs are
    (1,2),(2,1),(2,1),(1,2) — perfectly anti-correlated, r = −1."""
    assert abs(_assort_frame(spark, [(1, 2), (2, 3)]) - (-1.0)) < 1e-12


def test_g03_mixed_graph_known_value(spark):
    """P3 plus a disjoint edge (4-5): the extra (1,1) degree points
    weaken but do not destroy the anti-correlation — a value a
    degree-join bug cannot reproduce by accident. Hand computation:
    directed degree pairs (1,2),(2,1),(2,1),(1,2),(1,1),(1,1) →
    m=6, Σx=Σy=8, Σxy=10, Σxx=Σyy=12 → r = (60−64)/(72−64) = −0.5."""
    got = _assort_frame(spark, [(1, 2), (2, 3), (4, 5)])
    assert abs(got - (-0.5)) < 1e-12


def test_g03_wide_products_survive_sf10_magnitudes(spark):
    """Regression for the int64 overflow the sf10 scaling run caught:
    on the 100-replica corpus the dup graph has ~3·10⁸ directed edges
    with degrees ~110, so m·Σxy ≈ 4·10²¹ — past BIGINT. The query's
    DECIMAL(19,0)×DECIMAL(19,0) products must stay exact at those
    magnitudes (Spark's precision cap at 38 digits must not null or
    truncate them); verified against Python's arbitrary-precision
    integers on planted sums of the measured sf10 order."""
    m, sx, sxy, sxx = 600_000_000, 60_000_000_000, 7_300_000_000_000, \
        7_300_000_000_000
    df = spark.createDataFrame(
        [(m, sx, sx, sxy, sxx, sxx)],
        "m long, sx long, sy long, sxy long, sxx long, syy long")
    from pyspark.sql import functions as F

    def _d(c):
        return F.col(c).cast("decimal(19,0)")
    row = df.select(
        (_d("m") * _d("sxy") - _d("sx") * _d("sy")).alias("num"),
        (_d("m") * _d("sxx") - _d("sx") * _d("sx")).alias("vx"),
    ).collect()[0]
    assert int(row["num"]) == m * sxy - sx * sx    # exact, no overflow
    assert int(row["vx"]) == m * sxx - sx * sx
    assert m * sxy > 2**63 - 1                     # old path overflowed


def test_g03_planted_corpus_is_clique_assortative(spark, sf_dir):
    """On the planted corpus every LSH component is a clique
    (original + its perturbed copy, plus fully-connected background
    families), so EVERY edge joins equal-degree endpoints and the
    correlation must be EXACTLY +1 — any degree-miscount or join
    drift breaks the equality. Structure guards: the graph is
    non-trivial and degrees vary (without ≥2 distinct degrees the
    query would return NULL instead)."""
    row = _q("g03_dup_graph_assortativity", spark, sf_dir).collect()[0]
    assert row["n_edges"] > 0
    # every counted node carries >=1 undirected edge
    assert row["n_nodes"] <= 2 * row["n_edges"]
    assert row["max_degree"] >= 2
    assert row["assortativity"] == 1.0
