"""Seventh-wave queries (round 4): corpus-statistics, embedding-geometry
and merge-on-read read-path shapes the registry still lacked.

- a27 exact grouped median/quartiles — the EXACT complement of the
  approx quantiles (a14/a24): Spark's ``percentile`` runs as a proper
  partial-aggregate (per-group sorted buffers merged map-side), not a
  global sort, so the shuffle carries one state per group.
- t17 hapax-legomena rate — vocabulary-richness screen (share of
  words seen exactly once): the corpus scans ONCE into a (source,
  word) dictionary; everything after is dictionary-sized.
- e06 Matryoshka norm-retention — how much of each embedding's energy
  the first k dims keep (the representation-truncation question MRL
  training asks). One pass computes every budget from the SAME
  running prefix via a single ``aggregate`` fold, not one slice-sum
  per budget.
- cdc03 merge-on-read read path — the ``base LEFT ANTI JOIN
  tombstones`` shape of :mod:`..operators.deletion_vectors` (its
  ``read()``, deletion_vectors.py:156-169) as an oracle-checked query:
  line-level quarantine keys hide their orders at read time with no
  base rewrite. The tombstone side stays a keys-only projection, so
  AQE broadcasts it when small; the base never shuffles.

Reference anchor: widens the declared-query surface admitted by the
reference's SQL boundary (DeletionCriteria.java:40-63) as waves 1-6 do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register("a27_exact_median_groups",
          "SELECT l_returnflag, "
          "CAST(COUNT(*) AS BIGINT) AS n, "
          "ROUND(MEDIAN(l_quantity), 4) AS med_qty, "
          "ROUND(QUANTILE_CONT(l_extendedprice, 0.25), 4) AS p25_price, "
          "ROUND(QUANTILE_CONT(l_extendedprice, 0.75), 4) AS p75_price "
          "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag")
def a27(spark, sf_dir):
    """Exact grouped median + quartiles — the no-error-bound complement
    of a14's approx_percentile and a24's KLL rollup. Spark's
    ``percentile`` is a true aggregate (per-group buffer, map-side
    partial merge): the shuffle moves one digest per (partition,
    group), never the raw rows, and there is no global sort anywhere.
    Both engines use linear interpolation (percentile ==
    QUANTILE_CONT), so values agree to float rounding; ROUND(.,4)
    absorbs the last-bit drift of summing in different orders."""
    li = _t(spark, sf_dir, "lineitem")
    # both price quantiles come from ONE percentile buffer (array of
    # percentages) — a second buffer would re-accumulate the same
    # 600k-value histogram per group for no information gain
    return (li.groupBy("l_returnflag")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.expr("percentile(l_quantity, 0.5)"), 4)
                 .alias("med_qty"),
                 F.expr("percentile(l_extendedprice, array(0.25, 0.75))")
                 .alias("pq"))
            .select("l_returnflag", "n", "med_qty",
                    F.round(F.element_at("pq", 1), 4).alias("p25_price"),
                    F.round(F.element_at("pq", 2), 4).alias("p75_price"))
            .coalesce(1).orderBy("l_returnflag"))


@register("t17_hapax_rate",
          "WITH words AS (SELECT source, w AS word FROM documents, "
          "UNNEST(string_split_regex(lower(text), '[^a-z]+')) AS t(w) "
          "WHERE w <> ''), "
          "freqs AS (SELECT source, word, COUNT(*) AS f FROM words "
          "GROUP BY source, word) "
          "SELECT source, CAST(COUNT(*) AS BIGINT) AS vocab, "
          "CAST(COUNT(*) FILTER (f = 1) AS BIGINT) AS hapax, "
          "ROUND(COUNT(*) FILTER (f = 1) * 1.0 / COUNT(*), 6) "
          "AS hapax_rate "
          "FROM freqs GROUP BY source ORDER BY source")
def t17(spark, sf_dir):
    """Hapax-legomena rate per source: the share of vocabulary words
    occurring exactly once — a standard vocabulary-richness /
    contamination screen (boilerplate-heavy or templated sources show
    abnormally LOW hapax rates). ONE corpus scan explodes to (source,
    word); the per-word count and the per-source rollup are two
    dictionary-sized aggregations whose grouping keys share the
    ``source`` prefix, and the word-frequency exchange carries partial
    counts, not token instances. All JVM codegen — no Python."""
    docs = _t(spark, sf_dir, "documents")
    words = (docs.select("source",
                         F.explode(F.split(F.lower("text"), "[^a-z]+"))
                         .alias("word"))
             .where(F.col("word") != ""))
    freqs = (words.groupBy("source", "word")
             .agg(F.count(F.lit(1)).alias("f")))
    return (freqs.groupBy("source")
            .agg(F.count(F.lit(1)).alias("vocab"),
                 F.sum(F.when(F.col("f") == 1, 1).otherwise(0))
                 .cast("bigint").alias("hapax"))
            .withColumn("hapax_rate",
                        F.round(F.col("hapax") / F.col("vocab"), 6))
            .select("source", "vocab", "hapax", "hapax_rate")
            .coalesce(1).orderBy("source"))


_E06_BUDGETS = (8, 16, 32, 64)


@register("e06_matryoshka_ablation",
          "WITH pp AS (SELECT vec_id, "
          "list_sum(list_transform(embedding[1:8], "
          "  x -> CAST(x AS DOUBLE) * x)) AS s8, "
          "list_sum(list_transform(embedding[1:16], "
          "  x -> CAST(x AS DOUBLE) * x)) AS s16, "
          "list_sum(list_transform(embedding[1:32], "
          "  x -> CAST(x AS DOUBLE) * x)) AS s32, "
          "list_sum(list_transform(embedding, "
          "  x -> CAST(x AS DOUBLE) * x)) AS s64 "
          "FROM embeddings) "
          "SELECT CAST(k AS BIGINT) AS k, "
          "ROUND(AVG(retention), 6) AS avg_retention, "
          "ROUND(MIN(retention), 6) AS min_retention "
          "FROM (SELECT vec_id, 8 AS k, sqrt(s8 / s64) AS retention "
          "      FROM pp WHERE s64 > 0 "
          "      UNION ALL SELECT vec_id, 16, sqrt(s16 / s64) FROM pp "
          "      WHERE s64 > 0 "
          "      UNION ALL SELECT vec_id, 32, sqrt(s32 / s64) FROM pp "
          "      WHERE s64 > 0 "
          "      UNION ALL SELECT vec_id, 64, 1.0 FROM pp "
          "      WHERE s64 > 0) "
          "GROUP BY k ORDER BY k")
def e06(spark, sf_dir):
    """Matryoshka-style truncation ablation: for each dim budget k in
    (8, 16, 32, 64), how much of the embedding's L2 energy the first k
    dims retain — cos(v, truncate_k(v)) = ||v[:k]|| / ||v||, the exact
    quality loss of serving a k-dim prefix index. ONE ``aggregate``
    fold per row accumulates the running prefix sum and emits every
    budget's partial in a single pass (never one slice-scan per
    budget); per-vector ratios then unpivot to (k, retention) rows and
    aggregate — all JVM higher-order functions, no Python, no shuffle
    until the final |budgets|-row rollup."""
    emb = _t(spark, sf_dir, "embeddings")
    n_budgets = len(_E06_BUDGETS)
    budgets_arr = F.array(*[F.lit(b) for b in _E06_BUDGETS])
    # fold once: acc = struct(idx, running, partials[4]); at each
    # element, bump running and snapshot it when idx hits a budget
    partials = F.aggregate(
        "embedding",
        F.struct(F.lit(0).alias("i"),
                 F.lit(0.0).alias("run"),
                 F.array_repeat(F.lit(0.0), n_budgets).alias("ps")),
        lambda acc, x: F.struct(
            (acc["i"] + 1).alias("i"),
            (acc["run"] + x.cast("double") * x).alias("run"),
            F.transform(
                F.sequence(F.lit(0), F.lit(n_budgets - 1)),
                lambda j: F.when(acc["i"] + 1 == budgets_arr[j],
                                 acc["run"] + x.cast("double") * x)
                .otherwise(acc["ps"][j])).alias("ps")),
        lambda acc: acc["ps"])
    pp = (emb.select("vec_id", partials.alias("ps"))
          .where(F.element_at("ps", n_budgets) > 0))
    unpivoted = pp.select(
        "vec_id",
        F.explode(F.arrays_zip(
            budgets_arr.alias("k"),
            F.transform("ps",
                        lambda s: F.sqrt(
                            s / F.element_at("ps", n_budgets)))
            .alias("retention"))).alias("z"))
    return (unpivoted
            .groupBy(F.col("z.k").cast("bigint").alias("k"))
            .agg(F.round(F.avg("z.retention"), 6).alias("avg_retention"),
                 F.round(F.min("z.retention"), 6).alias("min_retention"))
            .coalesce(1).orderBy("k"))


@register("cdc03_mor_read",
          "WITH tombstones AS (SELECT DISTINCT l_orderkey AS key "
          "FROM lineitem WHERE l_returnflag = 'R' AND l_quantity > 49) "
          "SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS live_orders, "
          "ROUND(SUM(o_totalprice), 2) AS live_value "
          "FROM orders WHERE NOT EXISTS (SELECT 1 FROM tombstones "
          "WHERE key = o_orderkey) "
          "GROUP BY o_orderpriority ORDER BY o_orderpriority")
def cdc03(spark, sf_dir):
    """Merge-on-read read path as a query: a line-level quarantine
    (returned full-quantity lines) produces tombstone KEYS, and the
    logical orders table is ``base LEFT ANTI JOIN tombstones`` — the
    exact read shape of the deletion-vector operator
    (deletion_vectors.py:156-169, MergeOnReadDeleter.read), where
    delete cost is O(matching rows) and the base is never rewritten.
    The tombstone side reduces to a DISTINCT key projection before the
    join (pushdown-pruned to two columns), so the anti join probes a
    key set, and AQE broadcasts it while small; the orders side keeps
    its scan partitioning — no fact shuffle."""
    li = _t(spark, sf_dir, "lineitem")
    tomb = (li.where((F.col("l_returnflag") == "R")
                     & (F.col("l_quantity") > 49))
            .select(F.col("l_orderkey").alias("key"))
            .distinct())
    orders = _t(spark, sf_dir, "orders")
    live = orders.join(tomb, orders.o_orderkey == tomb.key, "left_anti")
    return (live.groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("live_orders"),
                 F.round(F.sum("o_totalprice"), 2).alias("live_value"))
            .coalesce(1).orderBy("o_orderpriority"))


@register("a28_heavy_hitters",
          "WITH words AS (SELECT w AS word FROM documents, "
          "UNNEST(string_split_regex(lower(text), '[^a-z]+')) AS t(w) "
          "WHERE w <> '') "
          "SELECT word, CAST(COUNT(*) AS BIGINT) AS n FROM words "
          "GROUP BY word ORDER BY n DESC, word LIMIT 20")
def a28(spark, sf_dir):
    """EXACT top-20 heavy hitters with bounded per-task state — the
    Misra-Gries two-pass: pass 1 runs an MG summary (capacity 256)
    per Arrow batch inside ``mapInPandas``, emitting only candidate
    keys (any key with global share > 1/capacity is guaranteed to be
    an MG candidate in at least one partition — the standard
    distributed-MG soundness argument); pass 2 exactly recounts ONLY
    the candidates (semi join) and takes the top 20. Two corpus scans
    total, but per-task state is O(capacity) however many distinct
    keys exist — the shape that survives a key space too large for a
    hash aggregate (user pairs, n-grams, URLs) where the single-pass
    groupBy would spill or die.

    Exactness is CONDITIONAL and therefore GUARDED: MG soundness
    promises candidacy only for keys with global share >
    1/(capacity+1) (max-over-partitions local share >= global share,
    and such a key survives its partition's decrements). If the true
    20th-ranked count is at or under that threshold the candidate set
    may have missed a contender — so every returned row is checked
    against the total token count (emitted by the SAME pass-1 scan as
    per-partition sentinel rows) and the query RAISES instead of
    silently returning an uncertified rank. On this corpus the guard
    passes and the result equals the oracle's plain GROUP BY top-20."""
    import pandas as pd

    docs = _t(spark, sf_dir, "documents")
    words = (docs.select(F.explode(F.split(F.lower("text"), "[^a-z]+"))
                         .alias("word"))
             .where(F.col("word") != ""))

    capacity = 256

    def mg_candidates(batches):
        counters: dict[str, int] = {}
        total = 0
        evicted = 0
        for pdf in batches:
            total += len(pdf)
            for w in pdf["word"]:
                if w in counters:
                    counters[w] += 1
                elif len(counters) < capacity:
                    counters[w] = 1
                else:  # decrement-all: the MG eviction step
                    evicted = 1
                    for k in list(counters):
                        counters[k] -= 1
                        if counters[k] == 0:
                            del counters[k]
        # sentinel row carries the partition's token count and whether
        # any eviction happened: the certification inputs cost no
        # third corpus scan
        yield pd.DataFrame({"word": list(counters) + [None],
                            "batch_total": [0] * len(counters) + [total],
                            "evicted": [0] * len(counters) + [evicted]})

    summary = (words.mapInPandas(
        mg_candidates, "word string, batch_total long, evicted long")
        .localCheckpoint(eager=False))  # feeds two consumers
    cands = (summary.where(F.col("word").isNotNull())
             .select("word").distinct())
    total = summary.agg(F.sum("batch_total").alias("n_total"),
                        F.sum("evicted").alias("n_evicted"))
    top = (words.join(cands.hint("broadcast"), "word", "left_semi")
           .groupBy("word").agg(F.count(F.lit(1)).alias("n"))
           .orderBy(F.desc("n"), "word").limit(20))
    # Two independent exactness certificates: (a) NO partition ever
    # evicted ⇒ every distinct key is a candidate ⇒ the recount IS the
    # exact top-20 whatever the counts; (b) the MG share bound
    # n > N/(capacity+1) per returned row. Raise only when BOTH fail —
    # (a) alone would previously abort provably-exact small-vocab runs.
    certified = F.when(
        (F.col("n_evicted") == 0)
        | (F.col("n") * (capacity + 1) > F.col("n_total")),
        F.lit(True)).otherwise(F.raise_error(
            "a28_heavy_hitters: evictions occurred and a top-20 count "
            "is at or under the Misra-Gries candidacy threshold "
            "N/(capacity+1) — exactness not certifiable; raise "
            "capacity"))
    return (top.crossJoin(F.broadcast(total))
            .where(certified)
            .select("word", "n")
            .coalesce(1).orderBy(F.desc("n"), "word"))


@register("ts07_autocorrelation",
          "WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d, "
          "SUM(o_totalprice) AS rev FROM orders GROUP BY d), "
          "lagged AS (SELECT a.rev AS x, b.rev AS y, lag FROM daily a "
          "JOIN (SELECT UNNEST(range(1, 8)) AS lag) l ON true "
          "JOIN daily b ON b.d = a.d - CAST(lag AS INT)) "
          "SELECT CAST(lag AS BIGINT) AS lag, "
          "CAST(COUNT(*) AS BIGINT) AS n_pairs, "
          "ROUND(CORR(x, y), 4) AS acf FROM lagged "
          "GROUP BY lag ORDER BY lag")
def ts07(spark, sf_dir):
    """Autocorrelation function of the daily revenue series (lags
    1-7) — the seasonality detector that tells a forecaster whether
    ts05's weekly decomposition is even warranted (a lag-7 spike =
    weekly cycle). The fact table collapses to |days| rows in ONE
    partial-aggregated rollup; the lag alignment is a 7-way explode
    of that tiny series joined back on shifted dates, so every
    downstream op is calendar-bounded. CORR over the same float pairs
    on both engines; ROUND(4) absorbs summation-order drift."""
    orders = _t(spark, sf_dir, "orders")
    daily = (orders.groupBy(F.col("o_orderdate").cast("date").alias("d"))
             .agg(F.sum("o_totalprice").alias("rev"))
             .localCheckpoint(eager=False))
    lags = (daily.select("d", F.col("rev").alias("x"),
                         F.explode(F.sequence(F.lit(1), F.lit(7)))
                         .alias("lag")))
    prev = daily.select(F.col("d").alias("d2"), F.col("rev").alias("y"))
    return (lags.join(prev,
                      prev.d2 == F.date_sub(lags.d, F.col("lag")))
            .groupBy(F.col("lag").cast("bigint").alias("lag"))
            .agg(F.count(F.lit(1)).alias("n_pairs"),
                 F.round(F.corr("x", "y"), 4).alias("acf"))
            .coalesce(1).orderBy("lag"))


@register("w13_last_touch_attribution",
          "WITH ordered AS (SELECT user_id, event_type, ts, event_id, "
          "  last_value(CASE WHEN event_type <> 'purchase' "
          "             THEN event_type END IGNORE NULLS) OVER ("
          "    PARTITION BY user_id ORDER BY ts, event_id "
          "    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) "
          "  AS channel FROM events) "
          "SELECT COALESCE(channel, '(none)') AS channel, "
          "CAST(COUNT(*) AS BIGINT) AS purchases "
          "FROM ordered WHERE event_type = 'purchase' "
          "GROUP BY channel ORDER BY channel")
def w13(spark, sf_dir):
    """Last-touch attribution: each purchase credits the user's most
    recent preceding non-purchase event type. ONE user-keyed window
    shuffle does all the work — `last(..., ignorenulls) OVER (ROWS
    ... 1 PRECEDING)` carries the running channel; the purchase
    filter and the channel rollup are map-side against the window
    output. The frame needs no lookback bound: running `last` state
    is O(1) per row regardless of history. Deterministic across
    engines via the (ts, event_id) total order."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    channel = F.last(F.when(F.col("event_type") != "purchase",
                            F.col("event_type")), ignorenulls=True).over(w)
    return (ev.withColumn("channel", channel)
            .where(F.col("event_type") == "purchase")
            .groupBy(F.coalesce("channel", F.lit("(none)"))
                     .alias("channel"))
            .agg(F.count(F.lit(1)).alias("purchases"))
            .coalesce(1).orderBy("channel"))


@register("e07_pair_cosine_histogram",
          "WITH pairs AS (SELECT a.embedding AS ea, b.embedding AS eb "
          "FROM embeddings a JOIN embeddings b "
          "ON b.vec_id = a.vec_id + 97), "
          "cos AS (SELECT list_sum(list_transform(range(1, 65), "
          "  i -> CAST(ea[i] AS DOUBLE) * eb[i])) / "
          "  (sqrt(list_sum(list_transform(ea, x -> CAST(x AS DOUBLE) * x))) * "
          "   sqrt(list_sum(list_transform(eb, x -> CAST(x AS DOUBLE) * x)))) "
          "  AS c FROM pairs) "
          "SELECT CAST(FLOOR(c * 10) AS BIGINT) AS bucket, "
          "CAST(COUNT(*) AS BIGINT) AS n, "
          "ROUND(AVG(c), 4) AS avg_cos FROM cos "
          "GROUP BY bucket ORDER BY bucket")
def e07(spark, sf_dir):
    """Embedding-space health histogram: cosine similarity of
    deterministic probe pairs (vec_id, vec_id+97), bucketed at 0.1
    width — the quick check for collapsed or hubby embedding spaces
    (healthy: mass near 0; collapsed: mass near 1) before any ANN
    index is built. The probe join is a key equi-join (no pair
    explosion — |corpus| probe pairs, not |corpus|²); the cosine is
    one zip_with dot product per pair, all JVM higher-order
    functions. FLOOR bucketing, not ROUND, so no half-way value can
    split engines; per-bucket AVG rounds at 4dp."""
    emb = _t(spark, sf_dir, "embeddings")
    a = emb.select("vec_id", F.col("embedding").alias("ea"))
    b = emb.select((F.col("vec_id") - 97).alias("vec_id"),
                   F.col("embedding").alias("eb"))
    dot = F.aggregate(
        F.zip_with("ea", "eb", lambda x, y: x.cast("double") * y),
        F.lit(0.0), lambda acc, v: acc + v)
    nrm = lambda c: F.sqrt(F.aggregate(
        c, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v))
    cos = (dot / (nrm(F.col("ea")) * nrm(F.col("eb")))).alias("c")
    return (a.join(b, "vec_id")
            .select(cos)
            .groupBy(F.floor(F.col("c") * 10).cast("bigint")
                     .alias("bucket"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.avg("c"), 4).alias("avg_cos"))
            .coalesce(1).orderBy("bucket"))


@register("ts08_interval_union",
          "WITH iv AS (SELECT user_id, "
          "CAST(date_trunc('second', ts) AS TIMESTAMP) AS s, "
          "CAST(date_trunc('second', ts) AS TIMESTAMP) "
          "  + INTERVAL 10 MINUTE AS e "
          "FROM events), "
          "ord AS (SELECT user_id, s, e, "
          "MAX(e) OVER (PARTITION BY user_id ORDER BY s, e "
          "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max "
          "FROM iv), "
          "isl AS (SELECT user_id, s, e, "
          "SUM(CASE WHEN prev_max IS NULL OR s > prev_max THEN 1 "
          "ELSE 0 END) OVER (PARTITION BY user_id ORDER BY s, e "
          "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island "
          "FROM ord), "
          "cov AS (SELECT user_id, island, "
          "date_diff('second', MIN(s), MAX(e)) AS sec "
          "FROM isl GROUP BY user_id, island) "
          "SELECT user_id, CAST(SUM(sec) AS BIGINT) AS covered_sec, "
          "CAST(COUNT(*) AS BIGINT) AS n_islands "
          "FROM cov GROUP BY user_id "
          "ORDER BY covered_sec DESC, user_id LIMIT 20")
def ts08(spark, sf_dir):
    """Interval-set union (activity coverage): each event opens a
    10-minute activity interval; overlapping intervals per user merge,
    and the answer is the user's total covered wall-clock — the
    sessionless 'time actually active' metric billing and engagement
    models need. The classic gaps-and-islands sweep: ONE user-key
    window shuffle serves the running-max-end pass (new island when an
    interval starts past everything seen) AND the island-id running
    sum; per-island min/max and the per-user rollup ride the same
    partitioning. All integer-second arithmetic — no float drift —
    and the (s, e) sort totally orders ties identically on both
    engines. Truncation to seconds keeps the nanos-vs-micros testdata
    encodings equal."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("second", "ts").alias("s"))
    iv = ev.withColumn("e", F.col("s") + F.expr("INTERVAL 10 MINUTES"))
    w_prev = (Window.partitionBy("user_id").orderBy("s", "e")
              .rowsBetween(Window.unboundedPreceding, -1))
    w_run = (Window.partitionBy("user_id").orderBy("s", "e")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    ord_ = iv.withColumn("prev_max", F.max("e").over(w_prev))
    isl = ord_.withColumn(
        "island",
        F.sum(F.when(F.col("prev_max").isNull()
                     | (F.col("s") > F.col("prev_max")), 1)
              .otherwise(0)).over(w_run))
    cov = (isl.groupBy("user_id", "island")
           .agg((F.unix_timestamp(F.max("e"))
                 - F.unix_timestamp(F.min("s"))).alias("sec")))
    return (cov.groupBy("user_id")
            .agg(F.sum("sec").cast("bigint").alias("covered_sec"),
                 F.count(F.lit(1)).alias("n_islands"))
            .orderBy(F.desc("covered_sec"), "user_id").limit(20))


@register("w14_mad_outlier_days",
          "WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d, "
          "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) "
          "AS rev FROM orders GROUP BY d), "
          "med AS (SELECT t.d, t.rev, MEDIAN(h.rev) AS med "
          "FROM daily t JOIN daily h "
          "ON h.d >= t.d - 15 AND h.d < t.d GROUP BY t.d, t.rev), "
          "dev AS (SELECT m.d, m.rev, m.med, "
          "MEDIAN(ABS(h.rev - m.med)) AS mad "
          "FROM med m JOIN daily h "
          "ON h.d >= m.d - 15 AND h.d < m.d "
          "GROUP BY m.d, m.rev, m.med) "
          "SELECT d, ROUND(rev, 2) AS rev, ROUND(med, 3) AS med, "
          "ROUND(ABS(rev - med), 3) AS abs_dev "
          "FROM dev WHERE ABS(rev - med) > 2 * mad AND mad > 0 "
          "ORDER BY d")
def w14(spark, sf_dir):
    """Rolling-MAD outlier days: a day is anomalous when its revenue
    sits more than 5 robust deviations from the trailing-15-day
    median (2 robust deviations flags notable days on this smooth
    synthetic series; production would use 3-5) — the rule that
    survives the outliers themselves
    (mean/stddev get dragged by the very spike being tested; median
    and MAD don't). The fact table collapses to |days| rows in one
    partial-aggregated rollup; the trailing window is a 15-way
    explode-join of that calendar-bounded series (same shape as
    ts07), so nothing downstream scales with event volume. Exact
    percentile on both engines; comparisons on ROUND(2)-stable
    doubles."""
    orders = _t(spark, sf_dir, "orders")
    # daily revenue sums in EXACT decimal, converted to double only
    # after: float sums accumulate in engine-specific order and a
    # last-bit difference flips ROUND(.,2) on .xx5 boundaries (caught
    # by the sf0.001 parity run); decimal addition is order-exact, so
    # both engines hand the median/MAD math bit-identical inputs
    daily = (orders.groupBy(F.col("o_orderdate").cast("date").alias("d"))
             .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                  .cast("double").alias("rev"))
             .localCheckpoint(eager=False))
    t = daily.select(F.col("d"), F.col("rev"),
                     F.explode(F.sequence(F.lit(1), F.lit(15)))
                     .alias("lag"))
    h = daily.select(F.col("d").alias("hd"), F.col("rev").alias("hrev"))
    # two-stage robust stats: the MAD needs deviations w.r.t. EACH
    # day's own trailing median, so median lands first and the same
    # (checkpointed) 15-way lag join replays against it for the MAD
    med = (t.join(h, h.hd == F.date_sub(t.d, F.col("lag")))
           .groupBy("d", "rev")
           .agg(F.expr("percentile(hrev, 0.5)").alias("med")))
    dev = (t.join(h, h.hd == F.date_sub(t.d, F.col("lag")))
           .join(med.select(F.col("d").alias("md"), "med"),
                 F.col("md") == F.col("d"))
           .groupBy("d", "rev", "med")
           .agg(F.expr("percentile(abs(hrev - med), 0.5)").alias("mad")))
    return (dev.where((F.abs(F.col("rev") - F.col("med"))
                       > 2 * F.col("mad")) & (F.col("mad") > 0))
            # med/abs_dev round at 3dp, NOT 2: partial (even-count)
            # trailing windows interpolate the median to exact
            # half-cents (.975), where Spark's HALF_UP and DuckDB's
            # rounding disagree — 3dp sits beyond the data's half-cent
            # granularity so no value can land on a boundary
            .select("d", F.round("rev", 2).alias("rev"),
                    F.round("med", 3).alias("med"),
                    F.round(F.abs(F.col("rev") - F.col("med")), 3)
                    .alias("abs_dev"))
            .orderBy("d"))
