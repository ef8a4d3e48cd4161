"""Behavioral tests for the Phase-3 analytics surface that the oracle
harness can't cover: the approximate/sampling queries (no SQL oracle) and
physical-plan assertions (broadcast actually broadcast, top-k not a full
sort, filters pushed to the scan)."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from bd_delete_records_from_external_hive_table_spark import plans
from bd_delete_records_from_external_hive_table_spark.sources.tables import load_table


def _explain(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_approx_count_distinct_within_bounds(spark, sf_dir):
    approx = plans.REGISTRY["a05_approx_count_distinct"] \
        .spark_fn(spark, sf_dir).first()["approx_customers"]
    exact = (load_table(spark, sf_dir, "orders")
             .agg(F.countDistinct("o_custkey")).first()[0])
    assert abs(approx - exact) / exact < 0.1  # rsd=0.02, generous bound


def test_bernoulli_sample_fraction(spark, sf_dir):
    n = plans.REGISTRY["sa01_bernoulli_sample"] \
        .spark_fn(spark, sf_dir).first()["sample_rows"]
    total = load_table(spark, sf_dir, "lineitem").count()
    assert 0.05 * total < n < 0.15 * total  # target fraction 0.1


def test_stratified_sample_fractions(spark, sf_dir):
    got = {r.o_orderstatus: r.sampled
           for r in plans.REGISTRY["sa02_stratified_sample"]
           .spark_fn(spark, sf_dir).collect()}
    totals = {r.o_orderstatus: r.n for r in
              load_table(spark, sf_dir, "orders")
              .groupBy("o_orderstatus")
              .agg(F.count(F.lit(1)).alias("n")).collect()}
    targets = {"F": 0.2, "O": 0.05, "P": 1.0}
    for status, frac in targets.items():
        realized = got.get(status, 0) / totals[status]
        assert abs(realized - frac) <= max(0.05, 0.5 * frac), \
            f"{status}: realized {realized} vs target {frac}"


def test_broadcast_join_is_broadcast(spark, sf_dir):
    plan = _explain(plans.REGISTRY["j01_broadcast_join"]
                    .spark_fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_semi_and_anti_join_strategies(spark, sf_dir):
    semi = _explain(plans.REGISTRY["j03_semi_join"].spark_fn(spark, sf_dir))
    anti = _explain(plans.REGISTRY["j04_anti_join"].spark_fn(spark, sf_dir))
    assert "LeftSemi" in semi
    assert "LeftAnti" in anti


def test_global_topk_avoids_full_sort(spark, sf_dir):
    plan = _explain(plans.REGISTRY["s01_global_topk"].spark_fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    plan = _explain(plans.REGISTRY["q08_ordered_projection"]
                    .spark_fn(spark, sf_dir))
    assert "PushedFilters: [IsNotNull(l_quantity), EqualTo(l_quantity,50.0)]" \
        in plan
    # column pruning: only the 3 needed columns in ReadSchema
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_orderkey" in read_schema and "l_extendedprice" not in read_schema


@pytest.mark.parametrize("name", ["j05_star_join", "a01_pricing_summary",
                                  "w01_topk_per_group"])
def test_headline_queries_nonempty(spark, sf_dir, name):
    assert len(plans.REGISTRY[name].spark_fn(spark, sf_dir).take(1)) == 1


def test_approx_quantile_within_bounds(spark, sf_dir):
    """percentile_approx(accuracy=10000) vs exact percentile: relative
    error well under 1% at test scale."""
    approx = {r["l_returnflag"]: (r["p50"], r["p95"], r["p99"])
              for r in plans.REGISTRY["a14_approx_quantile"]
              .spark_fn(spark, sf_dir).collect()}
    exact = {r["l_returnflag"]: (r["e50"], r["e95"], r["e99"])
             for r in (load_table(spark, sf_dir, "lineitem")
                       .groupBy("l_returnflag")
                       .agg(F.expr("percentile(l_extendedprice, 0.50)")
                            .alias("e50"),
                            F.expr("percentile(l_extendedprice, 0.95)")
                            .alias("e95"),
                            F.expr("percentile(l_extendedprice, 0.99)")
                            .alias("e99"))).collect()}
    assert set(approx) == set(exact)
    for flag in approx:
        for a, e in zip(approx[flag], exact[flag]):
            assert abs(a - e) / e < 0.01, (flag, a, e)


def test_q6_predicates_pushed_to_scan(spark, sf_dir):
    plan = _explain(plans.REGISTRY["a13_tpch_q6_revenue"]
                    .spark_fn(spark, sf_dir))
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l][0]
    # all three predicate families reach the parquet scan
    assert "l_shipdate" in pushed and "l_discount" in pushed \
        and "l_quantity" in pushed
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_extendedprice" in read_schema and "l_orderkey" not in read_schema


def test_q10_topk_and_broadcast_plan(spark, sf_dir):
    plan = _explain(plans.REGISTRY["j12_tpch_q10_shape"]
                    .spark_fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan  # top-20 never global-sorts
    assert "BroadcastHashJoin" in plan      # nation dim broadcast


def test_q21_shape_is_cokeyed_semi_anti(spark, sf_dir):
    plan = _explain(plans.REGISTRY["j14_tpch_q21_shape"]
                    .spark_fn(spark, sf_dir))
    assert "LeftSemi" in plan   # EXISTS lowered to a hash semi join
    assert "LeftAnti" in plan   # NOT EXISTS lowered to a hash anti join
    assert "NestedLoop" not in plan  # never per-row probing
    assert "TakeOrderedAndProject" in plan


def test_a22_total_is_broadcast_scalar_not_global_window(spark, sf_dir):
    """a22's nation-total must NOT be a global (unpartitioned) window
    over the per-part sums — parts grow with SF, and a single-task
    window pass over billions of rows is the 100 TB killer the round-3
    audit flagged. The fixed shape: by_part materializes once (lazy
    localCheckpoint), the total is a scalar re-aggregate whose final
    stage sees one partial sum per partition, and it rejoins as a
    broadcast 1-row side."""
    df = plans.REGISTRY["a22_tpch_q11_shape"].spark_fn(spark, sf_dir)
    plan = _explain_simple(df)
    assert "Window" not in plan, plan          # no global window pass
    assert "BroadcastExchange" in plan, plan   # total rejoins broadcast
    # the checkpointed by_part feeds both consumers from ONE
    # materialization — no second lineitem aggregation in the plan
    assert plan.count("FileScan") == 0, plan   # lineage truncated


def _explain_simple(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain()
    return buf.getvalue()


def test_q17_shape_single_partkey_shuffle(spark, sf_dir):
    """The decorrelated per-part average must co-locate on ONE
    l_partkey exchange feeding the window — not a second lineitem
    scan/aggregate."""
    plan = _explain_simple(plans.REGISTRY["a18_tpch_q17_shape"]
                           .spark_fn(spark, sf_dir))
    assert plan.count("Exchange hashpartitioning(l_partkey") == 1, plan
    assert "Window" in plan
    assert "BroadcastHashJoin" in plan  # brand-pruned part broadcasts


def test_fact_joins_never_broadcast_pinned(spark, sf_dir):
    """Scale guard: orders/customer grow with SF, so their joins must
    never be pinned with F.broadcast (a pin forces the build side onto
    every executor regardless of size — fatal at 100×). Disabling the
    auto-broadcast threshold exposes pins: only explicitly hinted sides
    still broadcast, so true dims (nation/region/supplier/part) may
    appear as BroadcastHashJoin but every fact-side join must fall back
    to SortMergeJoin."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j15 = _explain_simple(plans.REGISTRY["j15_tpch_q7_shape"]
                              .spark_fn(spark, sf_dir))
        # supplier + both nation copies are pinned dims; orders/customer
        # must shuffle
        assert j15.count("BroadcastHashJoin") == 3, j15
        assert "SortMergeJoin" in j15
        j16 = _explain_simple(plans.REGISTRY["j16_tpch_q8_shape"]
                              .spark_fn(spark, sf_dir))
        # part, supplier, nation x2, region(semi) pinned; orders/customer
        # shuffle
        assert j16.count("BroadcastHashJoin") == 5, j16
        assert "SortMergeJoin" in j16
        for name in ("j08_tpch_q3_shape", "j10_tpch_q18_shape",
                     "j05_star_join", "j19_tpch_q9_shape"):
            plan = _explain_simple(plans.REGISTRY[name]
                                   .spark_fn(spark, sf_dir))
            assert "SortMergeJoin" in plan, name
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_dim_pins_drop_above_threshold(spark, sf_dir, monkeypatch):
    """Scale guard, part 2: part/supplier/customer also grow with SF
    (SF x 200k / 10k / 150k), so their pins go through the size-guarded
    ``dim()`` helper — hinted only while the base table is small on
    disk. Forcing the threshold to 0 simulates the 100 TB regime: with
    auto-broadcast also disabled, ONLY the SF-invariant nation/region
    pins may remain as BroadcastHashJoin; every part/supplier/customer
    join must fall back to a shuffle join for AQE to re-plan."""
    monkeypatch.setenv("SPARK_GRAFT_DIM_PIN_MAX_BYTES", "0")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j15 = _explain_simple(plans.REGISTRY["j15_tpch_q7_shape"]
                              .spark_fn(spark, sf_dir))
        assert j15.count("BroadcastHashJoin") == 2, j15  # nation x2 only
        assert "SortMergeJoin" in j15
        j16 = _explain_simple(plans.REGISTRY["j16_tpch_q8_shape"]
                              .spark_fn(spark, sf_dir))
        # nation x2 + region(semi) only; part/supplier shuffle
        assert j16.count("BroadcastHashJoin") == 3, j16
        assert "SortMergeJoin" in j16
        j19 = _explain_simple(plans.REGISTRY["j19_tpch_q9_shape"]
                              .spark_fn(spark, sf_dir))
        assert j19.count("BroadcastHashJoin") == 1, j19  # nation only
        for name in ("j13_tpch_q19_disjunctive", "a16_tpch_q16_shape",
                     "a18_tpch_q17_shape",
                     "q18_tpch_q20_shape", "j14_tpch_q21_shape",
                     "j01_broadcast_join"):
            plan = _explain_simple(plans.REGISTRY[name]
                                   .spark_fn(spark, sf_dir))
            assert "BroadcastHashJoin" not in plan, f"{name}: {plan}"
            assert ("SortMergeJoin" in plan
                    or "ShuffledHashJoin" in plan), f"{name}: {plan}"
        # q16's ONE surviving broadcast is the 1-row scalar max — an
        # SF-INVARIANT side that must stay broadcast even at 100 TB;
        # the supplier join itself falls back to shuffle.
        q16p = _explain_simple(plans.REGISTRY["q16_tpch_q15_shape"]
                               .spark_fn(spark, sf_dir))
        assert q16p.count("BroadcastHashJoin") == 1, q16p
        assert ("SortMergeJoin" in q16p
                or "ShuffledHashJoin" in q16p), q16p
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_q15_shape_scans_lineitem_once(spark, sf_dir):
    """The scalar MAX threshold must come from ONE materialization of
    the supplier-grained revenue view: the view localCheckpoints (plan
    shows its truncated lineage, zero lineitem FileScans), the max is
    a re-aggregate of it, and it rejoins broadcast — never the old
    global-window one-task pass over all suppliers, and never a second
    lineitem scan from re-planning the view for the MAX."""
    df = plans.REGISTRY["q16_tpch_q15_shape"].spark_fn(spark, sf_dir)
    plan = _explain_simple(df)
    scans = [l for l in plan.splitlines()
             if "FileScan" in l and "lineitem" in l]
    assert len(scans) == 0, plan          # checkpoint = one materialization
    assert "Window" not in plan, plan     # no global-window scalar
    assert "BroadcastExchange" in plan, plan
    # the checkpoint hides the lineage, so pin the one-scan property on
    # the exposed PRE-checkpoint view (a regression here would silently
    # double the fact scan inside the single materialization)
    from bd_delete_records_from_external_hive_table_spark.plans.analytics_wave4 import _q16_revenue
    from bd_delete_records_from_external_hive_table_spark.plans.analytics_wave5 import _a22_by_part
    for pre in (_q16_revenue(spark, sf_dir), _a22_by_part(spark, sf_dir)):
        pp = _explain_simple(pre)
        pre_scans = [l for l in pp.splitlines()
                     if "FileScan" in l and "lineitem" in l]
        assert len(pre_scans) == 1, pp


def test_registry_rotation_orders_by_check_strength():
    """Driver-budget ordering invariant: never-rowed oracle-backed
    queries first (each budget slot earns a full value-hash row), then
    never-rowed rows-only queries (weaker non-empty check), then
    previously-green queries — and within the greens, OLDEST
    certification round first, so once every query has a row the
    leftover budget re-certifies the stalest rows and driver coverage
    ages uniformly."""
    from bd_delete_records_from_external_hive_table_spark.plans import _previously_green

    green = _previously_green()

    def strength(name: str) -> int:
        if name in green:
            return 2
        return 0 if plans.REGISTRY[name].oracle is not None else 1

    classes = [strength(n) for n in plans.REGISTRY]
    assert classes == sorted(classes), classes
    green_rounds = [green[n] for n in plans.REGISTRY if n in green]
    assert green_rounds == sorted(green_rounds), green_rounds
    # sanity: rounds actually span history (r01..r03 all contribute)
    assert len(set(green_rounds)) >= 2


def test_t13_tfidf_scans_documents_once(spark, sf_dir):
    """Document frequency is derived from the per-(source, token)
    partials via a window SUM — a second corpus scan (or a self-join)
    would double the dominant cost at scale."""
    df = plans.REGISTRY["t13_tfidf_terms"].spark_fn(spark, sf_dir)
    plan = _explain_simple(df)
    scans = [l for l in plan.splitlines()
             if "FileScan" in l and "documents" in l]
    assert len(scans) == 2, plan  # token explode + the 1-row N scalar
    # the token derivation itself appears once: one Generate (explode)
    assert plan.count("Generate explode") == 1, plan


def test_w12_burst_single_hash_exchange(spark, sf_dir):
    """The rolling-burst rollup must reuse the window's user_id
    partitioning: exactly ONE hash exchange (plus the output sort's
    range exchange), or the query shuffles the event log twice."""
    df = plans.REGISTRY["w12_time_range_burst"].spark_fn(spark, sf_dir)
    plan = _explain_simple(df)
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_q21_lateral_plans_as_window_group_limit(spark, sf_dir):
    """The per-customer LATERAL ORDER BY ... LIMIT must decorrelate to
    the WindowGroupLimit plan (pre-shuffle top-k pruning), never a
    per-row correlated execution or nested loop."""
    df = plans.REGISTRY["q21_lateral_topk"].spark_fn(spark, sf_dir)
    plan = _explain_simple(df)
    assert "WindowGroupLimit" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_no_registry_query_rescans_a_fact_table(spark, sf_dir):
    """Scan-count invariant from the round-3 plan audit: no registry
    query's FINAL plan may scan any single fact table 3+ times — shared
    derivations must materialize (localCheckpoint) instead of
    re-deriving per consumer (d10 reached 24 documents scans before the
    sweep). Exempt: q11 (Catalyst's scalar-subquery shape), j14
    (TPC-H Q21's canonical base + EXISTS + NOT EXISTS triple), and t22
    (exactly 3 by design: d14's measured-cheaper-than-checkpoint double
    gram pass over the text column, plus a COLUMN-PRUNED
    (doc_id, source) join scan — at 100 TB that 2-column scan is
    cheaper than carrying source through the gram-keyed shuffle, the
    biggest exchange in the plan)."""
    facts = ("lineitem", "orders", "events", "documents", "embeddings")
    exempt = {"q11_scalar_subquery", "j14_tpch_q21_shape",
              "t22_duplication_profile"}
    # FileScan Location strings truncate at spark.sql.maxMetadataStringLength
    # (default 100): under a long sf_dir the "<table>.parquet" suffix
    # would vanish and the test would pass vacuously — raise the limit
    # for the duration of the sweep.
    old_len = spark.conf.get("spark.sql.maxMetadataStringLength", "100")
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    offenders = []
    try:
        for name, spec in plans.REGISTRY.items():
            if name in exempt:
                continue
            plan = (spec.spark_fn(spark, sf_dir)
                    ._jdf.queryExecution().executedPlan().toString())
            counts: dict[str, int] = {}
            for line in plan.splitlines():
                if "FileScan" in line:
                    for t in facts:
                        if f"{t}.parquet" in line:
                            counts[t] = counts.get(t, 0) + 1
            bad = {t: c for t, c in counts.items() if c >= 3}
            if bad:
                offenders.append((name, bad))
    finally:
        # always restore: an exception mid-sweep must not leak the
        # raised limit into the shared session for later tests
        spark.conf.set("spark.sql.maxMetadataStringLength", old_len)
    assert not offenders, offenders
    # guard against vacuity: at least one single-scan query must be seen
    plan = (plans.REGISTRY["q01_scan_count"].spark_fn(spark, sf_dir)
            ._jdf.queryExecution().executedPlan().toString())
    assert any("lineitem.parquet" in l for l in plan.splitlines()
               if "FileScan" in l)


def test_no_registry_query_windows_over_single_partition(spark, sf_dir):
    """Window-shuffle invariant from the round-3 audit: no registry
    query may run a window function over an Exchange SinglePartition
    on an input that GROWS with data size — a global window is a
    one-task pass over everything below it (the shape that pushed a22
    and q16 onto the broadcast-scalar rewrite). Exempt, each with a
    docstring stating its bound:
      - w06_distribution_ranks: demo over a <=500-row dimension slice;
      - s04_temperature_mixing: window input is the per-SOURCE
        aggregate (|sources| rows, corpus-count-invariant);
      - w09_rolling_distinct_users / ts01_gap_fill /
        ts03_linear_interpolation: calendar-day spine (rows = days in
        the queried range, not events)."""
    exempt = {"w06_distribution_ranks", "s04_temperature_mixing",
              "w09_rolling_distinct_users",
              # ts01/ts03 window over the generated DATE SPINE (|days|
              # rows, calendar-bounded — events collapse to daily aggs
              # BEFORE the spine join); caught only once the sweep
              # became subtree-accurate, same class as w09
              "ts01_gap_fill", "ts03_linear_interpolation"}
    # t26 and ml06 are deliberately NOT exempt anymore: round 9
    # replaced t26's corpus-wide row_number (a single-task sort the
    # old exemption comment mis-described) and ml06's unpartitioned
    # cumulative windows with the two-pass bucketed offset rank
    # (operators/ranks.py) + a triangular join over the ≤10 decile
    # rows — their executed plans are audited like everyone else's.

    def depth(line: str) -> int:
        # tree depth in Spark's plan text = column of the operator
        # name (first alphabetic char) past the ":  +- " scaffolding
        for j, ch in enumerate(line):
            if ch.isalpha():
                return j
        return -1

    offenders = []
    for name, spec in plans.REGISTRY.items():
        if name in exempt:
            continue
        plan = (spec.spark_fn(spark, sf_dir)
                ._jdf.queryExecution().executedPlan().toString())
        lines = plan.splitlines()
        for i, line in enumerate(lines):
            if (("Window" in line and "windowspecdefinition" in line)
                    or "WindowGroupLimit" in line):
                # the feeding Exchange is the first Exchange WITHIN the
                # window's subtree (strictly deeper indent); leaving the
                # subtree (indent <= window's) means no exchange feeds
                # it — an unbounded line-window (the old version only
                # looked 4 lines down and could miss a long chain or
                # match a sibling subtree's Exchange)
                d0 = depth(line)
                for nxt in lines[i + 1:]:
                    dn = depth(nxt)
                    if dn != -1 and dn <= d0:
                        break  # left this window's input chain
                    if "Exchange" in nxt:
                        if "SinglePartition" in nxt:
                            offenders.append((name, line.strip()[:80]))
                        break
    assert not offenders, offenders
    # vacuity guard: the exempt demo still plans the shape we skip
    plan = (plans.REGISTRY["w06_distribution_ranks"]
            .spark_fn(spark, sf_dir)
            ._jdf.queryExecution().executedPlan().toString())
    assert "SinglePartition" in plan


def test_cdc03_mor_read_plans_anti_join(spark, sf_dir):
    """The merge-on-read read path must lower to a LEFT ANTI join of
    the base against the keys-only tombstone projection — never a
    filter-by-collected-list or a full outer reconciliation — and the
    tombstone side must be pruned to the key column before the join
    (scan reads only what the DISTINCT needs)."""
    df = plans.REGISTRY["cdc03_mor_read"].spark_fn(spark, sf_dir)
    plan = _explain_simple(df)
    assert "LeftAnti" in plan, plan
    # lineitem (tombstone source) and orders each scanned exactly once
    scans = [l for l in plan.splitlines() if "FileScan" in l]
    assert sum("lineitem" in l for l in scans) == 1, plan
    assert sum("orders" in l for l in scans) == 1, plan


def test_a26_pair_join_never_broadcasts_baskets(spark, sf_dir):
    """Regression pin for the sf1 scaling finding: the basket pair
    self-join must co-partition on the order key (SortMergeJoin),
    never broadcast-hash the SF-growing items relation — the lazy
    checkpoint's LogicalRDD reports its pre-materialization size
    estimate, which tricked Spark into building a hash relation of
    the whole basket table (>250x blowup at sf1)."""
    df = plans.REGISTRY["a26_frequent_pairs"].spark_fn(spark, sf_dir)
    plan = _explain_simple(df)
    assert "SortMergeJoin" in plan, plan
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "BroadcastHashJoin [k#" in line or \
                ("BroadcastHashJoin" in line and "[k2#" in line):
            raise AssertionError(f"pair join broadcast: {line}\n{plan}")


def test_fixed_input_audit_referential_integrity():
    """Every FIXED_INPUT marker must name a real registry query (a typo
    would silently unmark a fixed-input row from scaling tables), and
    the audit's known-growing anchors must never be marked: full-corpus
    dedup (d01/d14), full-table text analysis (t11), and the
    linear-work fixed-panel scorers (n01, e08) whose cost grows with
    the corpus side."""
    from bd_delete_records_from_external_hive_table_spark.plans import FIXED_INPUT, REGISTRY

    unknown = [k for k in FIXED_INPUT if k not in REGISTRY]
    assert not unknown, f"FIXED_INPUT names not in registry: {unknown}"
    for growing in ("d01_exact_dup_groups", "d14_repeated_substring_stats",
                    "t11_boilerplate_ngrams", "n01_ann_bruteforce_topk",
                    "e08_knn_label_vote", "e01_embedding_neardup",
                    "e09_semantic_dedup"):
        assert growing in REGISTRY
        assert growing not in FIXED_INPUT, (
            f"{growing} does SF-proportional work; marking it fixed "
            "would wrongly exclude it from scaling evidence")
