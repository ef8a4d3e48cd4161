"""Wave-13 operator tests: ml04 grouped OLS (numpy parity), ml05
rank-sum AUC (pure-numpy tie-corrected reference), d19 duplicate-span
coverage (planted gradient + a hand-built exact case), t27 Flesch
fixed-point (hand-computed exact case). The oracle-checked queries are
additionally covered by the registry-wide parity sweep; this module
asserts the SEMANTIC contracts a value-hash alone doesn't explain."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from bd_delete_records_from_external_hive_table_spark.plans import REGISTRY
from bd_delete_records_from_external_hive_table_spark.sources.tables import load_table


def _q(name, spark, sf_dir):
    return REGISTRY[name].spark_fn(spark, sf_dir)


# ---------------------------------------------------------------------------
# ml04: grouped OLS vs numpy.polyfit
# ---------------------------------------------------------------------------

def test_ml04_matches_numpy_polyfit(spark, sf_dir):
    """The closed-form integer-sum fit must agree with numpy's
    least-squares on the same (x, y) points per source — an
    independent third engine for the regression itself (the DuckDB
    oracle replays the same closed form; numpy does not)."""
    got = {r["source"]: r for r in
           _q("ml04_chars_per_token_ols", spark, sf_dir).collect()}
    toks = F.filter(F.split("text", r"\s+"), lambda t: t != F.lit(""))
    pts = (load_table(spark, sf_dir, "documents")
           .select("source", F.size(toks).alias("x"), "n_chars")
           .collect())
    by_src: dict[str, list[tuple[int, int]]] = {}
    for r in pts:
        by_src.setdefault(r["source"], []).append((r["x"], r["n_chars"]))
    assert set(got) == set(by_src)
    for src, xy in by_src.items():
        x = np.asarray([p[0] for p in xy], dtype=np.float64)
        y = np.asarray([p[1] for p in xy], dtype=np.float64)
        slope, intercept = np.polyfit(x, y, 1)
        assert abs(got[src]["slope"] - slope) < 1e-4, src
        assert abs(got[src]["intercept"] - intercept) < 1e-3, src
        r = np.corrcoef(x, y)[0, 1]
        assert abs(got[src]["r2"] - r * r) < 1e-4, src
        assert got[src]["n_docs"] == len(xy)


# ---------------------------------------------------------------------------
# ml05: rank-sum AUC vs a pure-numpy tie-corrected reference
# ---------------------------------------------------------------------------

def _exact_auc_micro(scores: np.ndarray, labels: np.ndarray) -> int:
    """Tie-corrected floor(AUC·10⁶) by average ranks, in EXACT integer
    arithmetic (the textbook Mann-Whitney construction, written
    independently of the query's grouped form). Doubled ranks keep
    everything integral: 2·avg-rank of a tie block [i..j] (0-based) is
    i + j + 2, so 2U = Σ_pos 2·rank − p(p+1) is an exact int and the
    expected report is (2U · 5·10⁵) // (p·q) — no float ever, so the
    comparison can't wobble when the exact rational AUC·10⁶ sits at an
    integer boundary (ADVICE.md round-8: the old float reference plus
    a 1e-9 nudge could land one above the true floor)."""
    order = np.argsort(scores, kind="mergesort")
    s, lab = scores[order], labels[order]
    two_ranks = np.empty(len(s), dtype=np.int64)
    i = 0
    while i < len(s):
        j = i
        while j + 1 < len(s) and s[j + 1] == s[i]:
            j += 1
        two_ranks[i:j + 1] = i + j + 2   # 2 × average 1-based rank
        i = j + 1
    p = int(lab.sum())
    q = len(lab) - p
    u2 = int(two_ranks[lab == 1].sum()) - p * (p + 1)
    return (u2 * 500000) // (p * q)     # u2 ≥ 0: floor == truncate


def test_ml05_matches_numpy_rank_auc(spark, sf_dir):
    got = {r["source"]: r for r in
           _q("ml05_auc_ranksum", spark, sf_dir).collect()}
    toks = F.filter(F.split("text", r"\s+"), lambda t: t != F.lit(""))
    pts = (load_table(spark, sf_dir, "documents")
           .select("source", F.size(toks).alias("x"), "n_chars")
           .collect())
    by_src: dict[str, list[tuple[int, int]]] = {}
    for r in pts:
        by_src.setdefault(r["source"], []).append((r["x"], r["n_chars"]))
    for src, xy in by_src.items():
        scores = np.asarray([(y * 1000) // max(x, 1) for x, y in xy],
                            dtype=np.int64)
        labels = np.asarray([1 if x >= 50 else 0 for x, _ in xy],
                            dtype=np.int64)
        p, q = int(labels.sum()), int((1 - labels).sum())
        assert got[src]["n_pos"] == p and got[src]["n_neg"] == q, src
        if p == 0 or q == 0:
            assert got[src]["auc_micro"] is None, src
            continue
        # query reports floor(AUC * 1e6) exactly — compared exactly
        assert got[src]["auc_micro"] == _exact_auc_micro(scores, labels), src


def test_ml05_ties_are_load_bearing(spark, sf_dir):
    """A mid-rank tie block spanning both classes must resolve to the
    average-rank value — the case a naive dense/row-number ranking
    gets wrong. 4 rows: scores [1, 5, 5, 9], labels [0, 1, 0, 1]:
    average ranks give AUC = (2.5 + 4 − 3) / (2·2) = 0.875."""
    df = spark.createDataFrame(
        [("s", 1, 0), ("s", 5, 1), ("s", 5, 0), ("s", 9, 1)],
        "source string, score long, pos int")
    # replay the query's grouped construction on the tiny frame
    from pyspark.sql import Window
    g = (df.groupBy("source", "score")
         .agg(F.count(F.lit(1)).cast("long").alias("cnt"),
              F.sum("pos").cast("long").alias("p")))
    w = (Window.partitionBy("source").orderBy("score")
         .rowsBetween(Window.unboundedPreceding, -1))
    row = (g.select("source", "p", "cnt",
                    F.coalesce(F.sum("cnt").over(w), F.lit(0))
                    .alias("cumb"))
           .groupBy("source")
           .agg(((F.sum(F.col("p") * (F.lit(2) * F.col("cumb")
                                      + F.col("cnt") + F.lit(1)))
                  - F.sum("p") * (F.sum("p") + F.lit(1))) * 500000
                 / (F.sum("p") * (F.sum("cnt") - F.sum("p"))))
           .alias("auc_micro")).collect()[0])
    assert row["auc_micro"] == 875000.0


def test_wide_floor_div_corrects_decimal_rounding(spark):
    """The three hazards the helper exists for, each pinned:
    1. Spark `div` on wide decimals silently WRAPS to a wrong long
       (2·10²⁰ div 3 probes negative) — why the helper exists at all;
    2. plain decimal division rounds HALF_UP at scale 6, so
       floor((2·10¹³−1)/10¹³) naively reads the 2.000000 candidate —
       the downward correction must return 1;
    3. the symmetric near-integer-from-above case must stay put."""
    from decimal import Decimal

    from pyspark.sql import functions as F

    from bd_delete_records_from_external_hive_table_spark.plans.analytics_wave13 import \
        _wide_floor_div

    rows = [
        (Decimal(2 * 10**13 - 1), Decimal(10**13), 1),     # rounds up w/o fix
        (Decimal(2 * 10**13 + 1), Decimal(10**13), 2),     # exact from above
        (Decimal(2 * 10**20 + 7), Decimal(3), (2 * 10**20 + 7) // 3),
        (Decimal(0), Decimal(10**13), 0),
    ]
    df = spark.createDataFrame(
        [(a, b) for a, b, _ in rows], "a decimal(38,0), b decimal(38,0)")
    got = [int(r["r"]) for r in
           df.select(_wide_floor_div(F.col("a"), F.col("b"))
                     .alias("r")).collect()]
    assert got == [w for _, _, w in rows]


def test_wide_floor_div_property(spark):
    """Property sweep: over randomized wide operands — including
    adversarial near-integer quotients, where plain decimal division
    rounds across the floor boundary — the helper must equal Python's
    arbitrary-precision ``//`` exactly. One batched Spark job for the
    whole example set (hypothesis drives the DATA, not the session)."""
    from decimal import Decimal

    from hypothesis import given, settings
    from hypothesis import strategies as st
    from pyspark.sql import functions as F

    from bd_delete_records_from_external_hive_table_spark.plans.analytics_wave13 import \
        _wide_floor_div

    cases: list[tuple[int, int]] = []

    @settings(max_examples=200, deadline=None)
    @given(q=st.integers(min_value=0, max_value=10**6),
           den=st.integers(min_value=1, max_value=10**26),
           off=st.integers(min_value=-2, max_value=2))
    def _collect(q, den, off):
        # construct num = q*den + off: quotients that sit exactly ON,
        # just below, and just above integer boundaries
        num = q * den + off
        if num >= 0:
            cases.append((num, den))

    _collect()
    df = spark.createDataFrame(
        [(Decimal(n), Decimal(d)) for n, d in cases],
        "a decimal(38,0), b decimal(38,0)")
    got = [int(r["r"]) for r in
           df.select(_wide_floor_div(F.col("a"), F.col("b"))
                     .alias("r")).collect()]
    want = [n // d for n, d in cases]
    assert got == want


# ---------------------------------------------------------------------------
# d19: duplicate-span coverage
# ---------------------------------------------------------------------------

def test_d19_planted_gradient(spark, sf_dir):
    """Bucket 0 holds every planted copy + its original (offset ≡ 0
    mod 10), so its coverage must dominate every background bucket,
    and coverage can never exceed the token count."""
    rows = {r["bucket"]: r for r in
            _q("d19_dup_span_coverage", spark, sf_dir).collect()}
    assert set(rows) == set(range(10))
    for b, r in rows.items():
        assert 0 <= r["covered_tokens"] <= r["sum_tokens"], b
        assert r["docs_with_dup"] <= r["n_docs"], b
    background = max(rows[b]["coverage_ppm"] for b in range(1, 10))
    assert rows[0]["coverage_ppm"] > 5 * background
    assert rows[0]["coverage_ppm"] > 900_000  # near-total by construction


def test_d19_interval_union_exact(spark):
    """Hand-built corpus with a KNOWN duplicated window layout:
    doc 1 and doc 2 share tokens 1-9 (two overlapping 8-windows at
    s=1,2 → union covers 9 tokens); doc 3 is disjoint. Every number
    is checkable by hand."""
    shared = " ".join(f"w{i}" for i in range(9))          # 9 tokens
    d1 = shared + " aa bb cc"                              # 12 tokens
    d2 = shared + " dd ee ff"                              # 12 tokens
    d3 = " ".join(f"z{i}" for i in range(12))              # 12 tokens
    docs = spark.createDataFrame(
        [(1, d1), (2, d2), (3, d3)], "doc_id long, text string")
    from pyspark.sql import Window
    toks = F.filter(F.split("text", r"\s+"), lambda t: t != F.lit(""))
    tok = docs.select("doc_id", toks.alias("ts")).where(F.size("ts") >= 8)
    win = tok.select(
        "doc_id",
        F.explode(F.transform(
            F.sequence(F.lit(1), F.size("ts") - 7),
            lambda i: F.struct(
                i.alias("s"),
                F.md5(F.concat_ws(" ", F.slice("ts", i, F.lit(8))))
                .alias("gk")))).alias("w")
    ).select("doc_id", F.col("w.s").alias("s"), F.col("w.gk").alias("gk"))
    dupg = (win.groupBy("gk").agg(F.countDistinct("doc_id").alias("nd"))
            .where(F.col("nd") >= 2).select("gk"))
    dwin = win.join(dupg, "gk").select("doc_id", "s")
    mw = (Window.partitionBy("doc_id").orderBy("s")
          .rowsBetween(Window.unboundedPreceding, -1))
    c = F.greatest(
        F.lit(0),
        (F.col("s") + 7) - F.greatest(
            F.coalesce(F.max(F.col("s") + 7).over(mw), F.lit(0)),
            F.col("s") - 1))
    cov = {r["doc_id"]: r["cov"] for r in
           dwin.select("doc_id", c.alias("c"))
           .groupBy("doc_id").agg(F.sum("c").alias("cov")).collect()}
    # windows s=1 (w0..w7) and s=2 (w1..w8) are shared → union = 9
    assert cov == {1: 9, 2: 9}


# ---------------------------------------------------------------------------
# t27: Flesch fixed-point
# ---------------------------------------------------------------------------

def test_t27_hand_computed_score(spark, sf_dir):
    """One source's aggregate recomputed from first principles in
    Python over the collected docs — same W/S/Syl definitions, exact
    integer arithmetic — must equal the query's BIGINT output."""
    import re
    got = {r["source"]: r for r in
           _q("t27_flesch_readability", spark, sf_dir).collect()}
    docs = (load_table(spark, sf_dir, "documents")
            .select("source", "text").collect())
    by_src: dict[str, list[str]] = {}
    for r in docs:
        by_src.setdefault(r["source"], []).append(r["text"])
    from bd_delete_records_from_external_hive_table_spark.plans.analytics_wave13 import (
        _FLESCH_OFFSET, _SYL_CAP)
    for src in list(by_src)[:3]:
        scores = []
        for text in by_src[src]:
            ws = [t for t in re.split(r"[^a-z]+", text.lower()) if t]
            if not ws:
                continue
            w = len(ws)
            s = max(len(re.findall(r"[.!?]+", text)), (w + 14) // 15)
            syl = sum(min(max(len(re.findall(r"[aeiouy]+", t)), 1),
                          _SYL_CAP)
                      for t in ws)
            num = (206_835_000 * s * w - 1_015_000 * w * w
                   - 84_600_000 * syl * s + _FLESCH_OFFSET * s * w)
            assert num >= 0   # the structural positivity invariant
            scores.append(num // (s * w) - _FLESCH_OFFSET)
        r = got[src]
        assert r["n_docs"] == len(scores)
        assert r["sum_score_micro"] == sum(scores)
        assert r["min_score_micro"] == min(scores)
        assert r["max_score_micro"] == max(scores)


def test_t27_pathological_inputs_stay_engine_exact():
    import duckdb
    duck = duckdb
    """The two ADVICE.md round-8 hazards, planted and replayed on both
    engines' ARITHMETIC directly (the query is documents-bound, so the
    hazard expressions are probed standalone):
    1. a vowel-alternating mega-word (syl ≈ len/2, w = 1) used to
       drive the numerator NEGATIVE, where Spark's truncate and a
       float-floor reference diverge by 1 — with the _SYL_CAP bound
       plus the 10^10 offset the numerator must stay ≥ 0;
    2. a doc with enough alpha words that the old unwidened BIGINT
       numerator wrapped past 2^63 — the widened form must agree with
       exact Python int arithmetic."""
    from bd_delete_records_from_external_hive_table_spark.plans.analytics_wave13 import (
        _FLESCH_OFFSET, _SYL_CAP)

    def score(w, s, syl):
        num = (206_835_000 * s * w - 1_015_000 * w * w
               - 84_600_000 * syl * s + _FLESCH_OFFSET * s * w)
        assert num >= 0, (w, s, syl)
        return num // (s * w) - _FLESCH_OFFSET

    # hazard 1: one 10^6-char 'iaia…' word → capped syl = _SYL_CAP
    assert score(w=1, s=1, syl=min(500_000, _SYL_CAP)) < 0  # real Flesch < 0
    # hazard 2: 10^9 alpha words, one syllable each (old form wrapped
    # at ~3.4e5): exact Python == DuckDB HUGEINT replay
    w, s = 10**9, (10**9 + 14) // 15
    syl = w
    want = score(w, s, syl)
    got = duck.sql(
        f"SELECT CAST((206835000 * w * s - 1015000 * w * w "
        f"- 84600000 * syl * s + {_FLESCH_OFFSET} * s * w) // (s * w) "
        f"- {_FLESCH_OFFSET} AS BIGINT) FROM (SELECT "
        f"CAST({w} AS HUGEINT) w, CAST({s} AS HUGEINT) s, "
        f"CAST({syl} AS HUGEINT) syl)").fetchone()[0]
    assert got == want
