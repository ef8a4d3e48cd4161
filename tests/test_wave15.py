"""Wave-15 operator tests: ml06 PR operating points (Python reference
parity + curve invariants), d20 LSH planted recall (truth-set
guarantees). The oracle-checked queries are additionally covered by
the registry-wide parity sweep."""

from __future__ import annotations

from pyspark.sql import functions as F

from bd_delete_records_from_external_hive_table_spark.plans import REGISTRY
from bd_delete_records_from_external_hive_table_spark.sources.tables import load_table


def _q(name, spark, sf_dir):
    return REGISTRY[name].spark_fn(spark, sf_dir)


# ---------------------------------------------------------------------------
# ml06: operating points
# ---------------------------------------------------------------------------

def _python_reference_points(pts):
    """Independent recomputation: full threshold sweep in Python, then
    the same decile-boundary selection over distinct scores."""
    from collections import Counter
    cnt, pos = Counter(), Counter()
    for x, y in pts:
        s = (y * 1000) // max(x, 1)
        cnt[s] += 1
        pos[s] += 1 if x >= 50 else 0
    scores = sorted(cnt, reverse=True)
    p_total = sum(pos.values())
    rows, cum_n, cum_tp = [], 0, 0
    n = len(scores)
    for rn, s in enumerate(scores, start=1):
        cum_n += cnt[s]
        cum_tp += pos[s]
        if (rn * 10) // n > ((rn - 1) * 10) // n:
            rows.append({
                "threshold_score": s, "pred_pos": cum_n, "tp": cum_tp,
                "precision_micro": (cum_tp * 1_000_000) // cum_n,
                "recall_micro": (cum_tp * 1_000_000) // p_total,
                "f1_micro": (2 * cum_tp * 1_000_000) // (cum_n + p_total),
            })
    return rows


def test_ml06_matches_python_reference(spark, sf_dir):
    got = [r.asDict() for r in
           _q("ml06_pr_operating_points", spark, sf_dir).collect()]
    toks = F.filter(F.split("text", r"\s+"), lambda t: t != F.lit(""))
    pts = [(r["x"], r["n_chars"]) for r in
           (load_table(spark, sf_dir, "documents")
            .select(F.size(toks).alias("x"), "n_chars").collect())]
    want = _python_reference_points(pts)
    assert got == want


def test_ml06_curve_invariants(spark, sf_dir):
    """Lowering the threshold can only ADD predictions: pred_pos, tp
    and recall are nondecreasing down the table, the final row
    predicts everything (recall exactly 10⁶), and precision stays a
    valid fraction."""
    rows = _q("ml06_pr_operating_points", spark, sf_dir).collect()
    assert 1 <= len(rows) <= 10
    for prev, cur in zip(rows, rows[1:]):
        assert cur["threshold_score"] < prev["threshold_score"]
        assert cur["pred_pos"] > prev["pred_pos"]
        assert cur["tp"] >= prev["tp"]
        assert cur["recall_micro"] >= prev["recall_micro"]
    last = rows[-1]
    assert last["recall_micro"] == 1_000_000
    for r in rows:
        assert 0 <= r["precision_micro"] <= 1_000_000
        assert r["tp"] <= r["pred_pos"]


# ---------------------------------------------------------------------------
# d20: planted recall
# ---------------------------------------------------------------------------

def test_d20_planted_recall_bounds(spark, sf_dir):
    """The pipeline must recover essentially every planted twin (the
    two-token perturbation keeps Jaccard far above the 0.5 verify
    threshold; banding misses are ~ppm-rare), and the count algebra
    must hold: found ≤ planted, found ≤ total, recall consistent."""
    row = _q("d20_lsh_planted_recall", spark, sf_dir).collect()[0]
    assert row["planted_pairs"] > 0
    assert 0 <= row["found_pairs"] <= row["planted_pairs"]
    assert row["found_pairs"] <= row["total_pairs"]
    assert row["recall_ppm"] == (row["found_pairs"] * 1_000_000) \
        // row["planted_pairs"]
    # recall floor: >= 99% at any SF — a broken hash constant or band
    # key collapses this to ~0, which is the regression this guards
    assert row["recall_ppm"] >= 990_000
