"""Sixth-wave queries: streaming-adjacent dedup, corpus statistics, and
time-series smoothing — the remaining shapes a training-data pipeline
runs daily that earlier waves did not yet declare:

- st06 debounce dedup: keep one event per (user, type, minute) — the
  batch form of streaming ``dropDuplicatesWithinWatermark``; the
  survivor rule (min event_id) is engine-independent, so the oracle is
  exact.
- t12 Zipf fit: log-log regression slope of the term-frequency curve —
  the one-number corpus-health signal (natural text ⇒ slope ≈ -1;
  word-salad/boilerplate corpora bend away from it).
- t13 TF-IDF: per-source discriminative terms. Because every document
  belongs to exactly one source, document frequency = the sum of
  per-(source, token) distinct-doc counts over sources — ONE explode,
  ONE groupBy, ONE window shuffle on token; the corpus is never
  scanned twice.
- e04 centroid similarity: pairwise cosine between per-label embedding
  centroids — drift/confusion audit over e02's building block. All
  pair math happens AFTER aggregation collapses N vectors to
  |labels| x dim rows.
- ts04 EWMA: per-user exponential smoothing over the last-k events via
  a higher-order fold (``F.aggregate``) — the recursive operator SQL
  windows cannot express directly; bounding to k rows keeps per-key
  state O(1) at any scale.

Scale notes (100 TB design point): st06's window partitions by
(user, type, minute) — fine-grained keys, no skew pileup; t12's
dictionary passes through TakeOrderedAndProject (top-100 per partition
survive the shuffle, never the full vocabulary); t13 shuffles the token
dictionary once (dictionary-sized, not corpus-sized); e04 joins only
aggregated centroids; ts04's collect_list is bounded to 20 rows/key by
the preceding row_number filter, so the fold state cannot grow with
history length.

Reference anchor: same admitted-SQL surface as waves 1-5
(DeletionCriteria.java:40-63, HiveTableOperations.java:71-116).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..sources.tables import load_table, local_frame
from .registry import register


# ---------------------------------------------------------------------------
# st06: debounce dedup (batch form of dropDuplicatesWithinWatermark)
# ---------------------------------------------------------------------------

@register("st06_dedup_debounce",
          "WITH r AS (SELECT event_type, ROW_NUMBER() OVER ("
          "PARTITION BY user_id, event_type, date_trunc('minute', ts) "
          "ORDER BY event_id) AS rn FROM events) "
          "SELECT event_type, COUNT(*) AS n_events, "
          "CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) "
          "AS n_kept, "
          "CAST(COUNT(*) - SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) "
          "AS BIGINT) AS n_dupes "
          "FROM r GROUP BY event_type ORDER BY event_type")
def st06(spark, sf_dir):
    """Debounce dedup: one event survives per (user, type, minute) — the
    batch form of streaming ``dropDuplicatesWithinWatermark`` (whose
    state TTL is exactly the bucket width; stream==batch key-set parity
    is test-asserted in test_streaming.py). Survivor = min event_id in
    the bucket: event_id is unique, so the rule is deterministic and
    independent of each engine's sub-microsecond timestamp precision.
    One window shuffle on fine-grained keys (no skew pileup: a hot user
    still splits across minutes), then a partial-aggregated rollup."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy(
        "user_id", "event_type", F.date_trunc("minute", "ts")
    ).orderBy("event_id")
    flagged = ev.select(
        "event_type", (F.row_number().over(w) == 1).alias("kept"))
    return (flagged.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(F.col("kept").cast("long")).alias("n_kept"),
                 (F.count(F.lit(1))
                  - F.sum(F.col("kept").cast("long"))).alias("n_dupes"))
            .coalesce(1).orderBy("event_type"))


# ---------------------------------------------------------------------------
# t12: Zipf's-law fit over the term-frequency curve
# ---------------------------------------------------------------------------

@register("t12_zipf_fit",
          "WITH tf AS (SELECT token, COUNT(*) AS n FROM ("
          "  SELECT UNNEST(regexp_split_to_array(LOWER(text), '[^a-z]+')) "
          "  AS token FROM documents) t WHERE token <> '' GROUP BY token), "
          "top AS (SELECT n FROM tf ORDER BY n DESC, token LIMIT 100), "
          "rk AS (SELECT ln(ROW_NUMBER() OVER (ORDER BY n DESC)) AS lr, "
          "       ln(n) AS lf FROM top) "
          "SELECT COUNT(*) AS n_terms, "
          "ROUND(covar_pop(lr, lf) / var_pop(lr), 4) AS zipf_slope, "
          "ROUND(corr(lr, lf) * corr(lr, lf), 4) AS zipf_r2 FROM rk")
def t12(spark, sf_dir):
    """Zipf's-law fit: regress ln(frequency) on ln(rank) over the top-100
    terms. Natural language gives slope ≈ -1 with r² near 1; corpora full
    of boilerplate or synthetic filler bend away — a one-number corpus
    health check. The vocabulary aggregation flows through
    TakeOrderedAndProject (top-100 per partition cross the shuffle, never
    the dictionary), and the regression runs over exactly 100 rows, so
    the only corpus-sized cost is the token explode + partial-agg count.
    Rank ties share a frequency, so (n DESC, token) vs (n DESC) ordering
    cannot change any (rank, ln n) pair the regression sees."""
    docs = load_table(spark, sf_dir, "documents")
    tf = (docs.select(F.explode(F.split(F.lower("text"), "[^a-z]+"))
                      .alias("token"))
          .where(F.col("token") != "")
          .groupBy("token").agg(F.count(F.lit(1)).alias("n")))
    top = tf.orderBy(F.desc("n"), "token").limit(100)
    rk = top.select(
        F.log(F.row_number().over(Window.orderBy(F.desc("n"), "token")))
        .alias("lr"),
        F.log("n").alias("lf"))
    return rk.agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.round(F.covar_pop("lr", "lf") / F.var_pop("lr"), 4)
        .alias("zipf_slope"),
        F.round(F.corr("lr", "lf") * F.corr("lr", "lf"), 4)
        .alias("zipf_r2"))


# ---------------------------------------------------------------------------
# t13: per-source TF-IDF discriminative terms
# ---------------------------------------------------------------------------

@register("t13_tfidf_terms",
          "WITH ex AS (SELECT source, doc_id, UNNEST("
          "  regexp_split_to_array(LOWER(text), '[^a-z]+')) AS token "
          "  FROM documents), "
          "st AS (SELECT source, token, COUNT(*) AS tf, "
          "       COUNT(DISTINCT doc_id) AS dfp FROM ex "
          "       WHERE token <> '' AND LENGTH(token) > 3 "
          "       GROUP BY source, token), "
          "wd AS (SELECT *, SUM(dfp) OVER (PARTITION BY token) AS df "
          "       FROM st), "
          "n AS (SELECT COUNT(*) AS n_docs FROM documents), "
          "sc AS (SELECT source, token, "
          "       ROUND(tf * ln(n_docs / df), 4) AS tfidf, "
          "       ROW_NUMBER() OVER (PARTITION BY source ORDER BY "
          "       tf * ln(n_docs / df) DESC, token) AS trank "
          "       FROM wd, n) "
          "SELECT source, trank, token, tfidf FROM sc WHERE trank <= 5 "
          "ORDER BY source, trank")
def t13(spark, sf_dir):
    """Per-source TF-IDF top terms — which vocabulary distinguishes each
    source (the mixture-debugging view of a multi-source corpus). Every
    document has exactly ONE source, so corpus document frequency
    df(token) = Σ_source countDistinct(doc_id | source, token): one
    explode, one (source, token) groupBy, then a window SUM over token
    replaces the usual second corpus scan + self-join. The shuffles that
    remain are dictionary-sized, not corpus-sized. idf uses the raw
    ln(N/df) form; both engines compute the identical double expression
    from exact integer inputs, so the row_number tie-break (token asc)
    sees identical ordering keys."""
    docs = load_table(spark, sf_dir, "documents")
    ex = docs.select(
        "source", "doc_id",
        F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("token"))
    st = (ex.where((F.col("token") != "") & (F.length("token") > 3))
          .groupBy("source", "token")
          .agg(F.count(F.lit(1)).alias("tf"),
               F.countDistinct("doc_id").alias("dfp")))
    wd = st.withColumn(
        "df", F.sum("dfp").over(Window.partitionBy("token")))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    sc = (wd.crossJoin(F.broadcast(n))
          .withColumn("tfidf_raw",
                      F.col("tf") * F.log(F.col("n_docs") / F.col("df")))
          .withColumn("trank", F.row_number().over(
              Window.partitionBy("source")
              .orderBy(F.desc("tfidf_raw"), "token"))))
    return (sc.where(F.col("trank") <= 5)
            .select("source", "trank", "token",
                    F.round("tfidf_raw", 4).alias("tfidf"))
            .coalesce(1).orderBy("source", "trank"))


# ---------------------------------------------------------------------------
# e04: pairwise cosine similarity between label centroids
# ---------------------------------------------------------------------------

@register("e04_centroid_similarity",
          "WITH comp AS (SELECT label, pos, "
          "  CAST(SUM(CAST(FLOOR(CAST(v AS DOUBLE) * 1000000) AS BIGINT)) AS DECIMAL(19,0))"
          "  AS iq FROM ("
          "  SELECT label, UNNEST(embedding) AS v, "
          "         generate_subscripts(embedding, 1) AS pos "
          "  FROM embeddings) x GROUP BY label, pos), "
          "nrm AS (SELECT label, CAST(SUM(iq * iq) AS DOUBLE) AS sq "
          "        FROM comp GROUP BY label) "
          "SELECT a.label AS label_a, b.label AS label_b, "
          "ROUND(CAST(SUM(a.iq * b.iq) AS DOUBLE) "
          "      / (SQRT(MIN(na.sq)) * SQRT(MIN(nb.sq))), 4) AS cos_sim "
          "FROM comp a JOIN comp b ON a.pos = b.pos AND a.label < b.label "
          "JOIN nrm na ON na.label = a.label "
          "JOIN nrm nb ON nb.label = b.label "
          "GROUP BY a.label, b.label ORDER BY label_a, label_b")
def e04(spark, sf_dir):
    """Pairwise cosine similarity between per-label embedding centroids —
    the class-confusion / embedding-drift audit built on e02's centroid
    block. The corpus-sized work is ONE posexplode + partial-agg sum;
    everything after operates on |labels| x dim rows (tiny), so the
    label < label self-join never touches raw vectors. At 100 TB the
    plan cost is the one centroid aggregation — identical to e02.

    Determinism: a float AVG centroid would vary in its last bits with
    partition order. Instead each component quantizes to an integer
    (FLOOR(v·1e6) AFTER an explicit float→double cast — the engines'
    float×int promotion rules differ, and a float32 multiply floors
    across integer boundaries differently than the double multiply:
    103/640 (label,pos) sums diverged at sf0.01 before the cast, held
    green only by 4-dp insensitivity; FLOOR of a double is an exact
    bit-function) whose
    BIGINT sum is order-free, and cosine is scale-invariant, so the
    un-normalized integer sums ARE the centroid: all pair math runs in
    exact DECIMAL and only the final division/sqrt touches floats —
    identical on both engines, stable across driver re-runs."""
    emb = load_table(spark, sf_dir, "embeddings")
    # comp feeds THREE consumers (norms + both pair sides); checkpoint
    # the |labels|x dim aggregate so the corpus is scanned once
    comp = (emb.select("label", F.posexplode("embedding").alias("pos", "v"))
            .groupBy("label", "pos")
            .agg(F.sum(F.floor(F.col("v").cast("double") * 1_000_000)
                       .cast("bigint"))
                 .cast("decimal(19,0)").alias("iq"))
            .localCheckpoint(eager=False))
    nrm = (comp.groupBy("label")
           .agg(F.sum(F.col("iq") * F.col("iq")).cast("double")
                .alias("sq")))
    a = comp.select(F.col("label").alias("label_a"),
                    "pos", F.col("iq").alias("ia"))
    b = comp.select(F.col("label").alias("label_b"),
                    F.col("pos").alias("pos_b"), F.col("iq").alias("ib"))
    dots = (a.join(b, (F.col("pos") == F.col("pos_b"))
                   & (F.col("label_a") < F.col("label_b")))
            .groupBy("label_a", "label_b")
            .agg(F.sum(F.col("ia") * F.col("ib")).cast("double")
                 .alias("dot")))
    na = nrm.select(F.col("label").alias("label_a"),
                    F.col("sq").alias("sqa"))
    nb = nrm.select(F.col("label").alias("label_b"),
                    F.col("sq").alias("sqb"))
    return (dots.join(F.broadcast(na), "label_a")
            .join(F.broadcast(nb), "label_b")
            .select("label_a", "label_b",
                    F.round(F.col("dot")
                            / (F.sqrt("sqa") * F.sqrt("sqb")), 4)
                    .alias("cos_sim"))
            .coalesce(1).orderBy("label_a", "label_b"))


# ---------------------------------------------------------------------------
# w12: time-RANGE window frame (rolling 1-hour burst detection)
# ---------------------------------------------------------------------------

@register("w12_time_range_burst",
          "WITH s AS (SELECT user_id, "
          "CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec, value "
          "FROM events), "
          "r AS (SELECT user_id, "
          "COUNT(*) OVER w AS n_1h, SUM(value) OVER w AS v_1h FROM s "
          "WINDOW w AS (PARTITION BY user_id ORDER BY sec "
          "RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)) "
          "SELECT user_id, MAX(n_1h) AS peak_1h_events, "
          "CAST(ROUND(MAX(v_1h), 2) AS DOUBLE) AS peak_1h_value "
          "FROM r GROUP BY user_id ORDER BY user_id")
def w12(spark, sf_dir):
    """Rolling 1-hour burst detection per user via a RANGE window frame —
    the frame type (value-range, not row-count) none of w01–w11 exercise:
    each event sees the count/sum of that user's events in the trailing
    hour, then the per-user MAX reports the peak burst (the
    rate-limit/anomaly signal). RANGE on epoch seconds handles ties
    (same-second events share a frame) identically on both engines;
    the sort the window needs is the only shuffle, and the rollup reuses
    the same user_id partitioning — one exchange end-to-end. The peak
    chooser is an exact integer MAX (count); the float sum rides along
    and is display-rounded."""
    ev = load_table(spark, sf_dir, "events")
    sec = F.unix_timestamp(F.date_trunc("second", F.col("ts")))
    w = (Window.partitionBy("user_id").orderBy("sec")
         .rangeBetween(-3600, Window.currentRow))
    r = (ev.select("user_id", sec.alias("sec"), "value")
         .select("user_id",
                 F.count(F.lit(1)).over(w).alias("n_1h"),
                 F.sum("value").over(w).alias("v_1h")))
    return (r.groupBy("user_id")
            .agg(F.max("n_1h").alias("peak_1h_events"),
                 F.round(F.max("v_1h"), 2).cast("double")
                 .alias("peak_1h_value"))
            .orderBy("user_id"))


# ---------------------------------------------------------------------------
# q20: recursive CTE (hierarchy walk via the SQL surface)
# ---------------------------------------------------------------------------

_Q20_SQL = (
    "WITH RECURSIVE anc(start_key, k, depth) AS ("
    "  SELECT o_orderkey, o_orderkey, CAST(0 AS BIGINT) FROM orders "
    "  WHERE o_orderkey >= (SELECT MAX(o_orderkey) FROM orders) - 9 "
    "  UNION ALL "
    "  SELECT start_key, CAST(FLOOR(k / 2) AS BIGINT), depth + 1 "
    "  FROM anc WHERE k > 0) "
    "SELECT start_key, MAX(depth) AS chain_depth, "
    "CAST(COUNT(*) AS BIGINT) AS n_nodes, "
    "CAST(ROUND(SUM(o_totalprice), 2) AS DOUBLE) AS chain_value "
    "FROM anc JOIN orders ON o_orderkey = k "
    "GROUP BY start_key ORDER BY start_key")


@register("q20_recursive_cte", _Q20_SQL)
def q20(spark, sf_dir):
    """Recursive CTE (Spark 4's WITH RECURSIVE) — the hierarchy-walk SQL
    surface: each seed order climbs its implicit binary-tree ancestor
    chain (k → ⌊k/2⌋; order keys are dense, so every ancestor exists),
    joining back to orders to accumulate value along the chain. Depth is
    ⌈log₂ N⌉ — recursion rounds grow logarithmically with table size, and
    each round is a bounded equi-join, the shape that survives scale (the
    same reason d06's pointer-doubling clustering converges in O(log d)).
    The seed set is defined relative to MAX(o_orderkey), so the query is
    scale-factor-independent. Both engines run the IDENTICAL SQL text."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_Q20_SQL)


# ---------------------------------------------------------------------------
# q21: LATERAL correlated subquery with LIMIT (top-k per group, SQL form)
# ---------------------------------------------------------------------------

_Q21_SQL = (
    "SELECT c.c_custkey, o.o_orderkey, o.o_totalprice "
    "FROM customer c CROSS JOIN LATERAL ("
    "  SELECT o_orderkey, o_totalprice FROM orders "
    "  WHERE o_custkey = c.c_custkey "
    "  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o "
    "WHERE c.c_mktsegment = 'BUILDING' "
    "ORDER BY c_custkey, o_totalprice DESC, o_orderkey")


@register("q21_lateral_topk", _Q21_SQL)
def q21(spark, sf_dir):
    """LATERAL correlated subquery with LIMIT — the SQL spelling of
    top-k-per-group (w01's window form, expressed the way analysts write
    it). Catalyst decorrelates the per-customer ORDER BY ... LIMIT 2
    into a partitioned window filter over ONE orders shuffle — no
    per-customer subquery execution, no nested loop — so the plan is
    w01's, at any scale. The (o_totalprice, o_orderkey) sort key makes
    the kept rows unique, so both engines retain identical sets. Both
    engines run the IDENTICAL SQL text."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_Q21_SQL)


# ---------------------------------------------------------------------------
# a26: market-basket frequent pairs (co-occurrence support + lift)
# ---------------------------------------------------------------------------

@register("a26_frequent_pairs",
          "WITH items AS (SELECT DISTINCT l_orderkey, l_partkey "
          "FROM lineitem), "
          "n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders "
          "FROM items), "
          "cnt AS (SELECT l_partkey, COUNT(*) AS c FROM items "
          "GROUP BY l_partkey), "
          "pairs AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, "
          "COUNT(*) AS support FROM items a JOIN items b "
          "ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey "
          "GROUP BY part_a, part_b) "
          "SELECT part_a, part_b, support, "
          "ROUND(support * n_orders / (ca.c * CAST(cb.c AS DOUBLE)), 4) "
          "AS lift FROM pairs, n "
          "JOIN cnt ca ON ca.l_partkey = part_a "
          "JOIN cnt cb ON cb.l_partkey = part_b "
          "WHERE support >= 2 "
          "ORDER BY support DESC, part_a, part_b LIMIT 15")
def a26(spark, sf_dir):
    """Market-basket frequent-pair mining (the A-priori pair stage):
    which parts co-occur in the same order more than chance, reported
    as support + lift. The pair generation self-joins baskets ON THE
    ORDER KEY — pair count is bounded by basket_size² per order, never
    |parts|², and the join co-locates on the one shuffle the distinct
    pass already needs. Item counts are dictionary-sized; the order
    total is a 1-row broadcast; output flows through
    TakeOrderedAndProject. Support/counts are exact integers; lift is
    one deterministic division per surviving pair."""
    li = load_table(spark, sf_dir, "lineitem")
    # the deduped basket feeds FOUR consumers (total, item counts, both
    # pair sides); without materialization each re-scans lineitem — 5
    # corpus passes at 100 TB. The checkpoint is smaller than the
    # source (distinct keys only) and is read, not recomputed.
    items = (li.select("l_orderkey", "l_partkey").distinct()
             .localCheckpoint(eager=False))
    n = items.select(F.countDistinct("l_orderkey").alias("n_orders"))
    cnt = items.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("c"))
    a = items.select(F.col("l_orderkey").alias("k"),
                     F.col("l_partkey").alias("part_a"))
    b = items.select(F.col("l_orderkey").alias("k2"),
                     F.col("l_partkey").alias("part_b"))
    # MERGE-pinned: both pair sides are the SAME fact-derived relation
    # — it grows with SF and must co-partition on the order key, never
    # broadcast. Without the pin, the lazy checkpoint's LogicalRDD
    # carries the (tiny) pre-materialization size estimate and Spark
    # broadcast-hashes the whole basket relation: the sf1 scaling run
    # measured a >250x blowup (OOM-thrash) from exactly that plan.
    pairs = (a.join(b.hint("merge"), (F.col("k") == F.col("k2"))
                    & (F.col("part_a") < F.col("part_b")))
             .groupBy("part_a", "part_b")
             .agg(F.count(F.lit(1)).alias("support"))
             .where(F.col("support") >= 2))
    ca = cnt.select(F.col("l_partkey").alias("part_a"),
                    F.col("c").alias("ca"))
    cb = cnt.select(F.col("l_partkey").alias("part_b"),
                    F.col("c").alias("cb"))
    return (pairs.crossJoin(F.broadcast(n))
            .join(ca, "part_a").join(cb, "part_b")
            .select("part_a", "part_b", "support",
                    F.round(F.col("support") * F.col("n_orders")
                            / (F.col("ca") * F.col("cb")
                               .cast("double")), 4).alias("lift"))
            .orderBy(F.desc("support"), "part_a", "part_b")
            .limit(15))


# ---------------------------------------------------------------------------
# v01: snapshot diff (table reconciliation)
# ---------------------------------------------------------------------------

#: Deterministic "tomorrow" snapshot derived from orders: every 97th
#: key deleted, every 89th key inserted back shifted (simulating new
#: rows), every 13th surviving key's total modified.
_V01_B = (
    "SELECT o_orderkey, o_custkey, "
    "CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice + 10.0 "
    "ELSE o_totalprice END AS o_totalprice "
    "FROM orders WHERE o_orderkey % 97 <> 0 "
    "UNION ALL "
    "SELECT o_orderkey + 1000000, o_custkey, o_totalprice "
    "FROM orders WHERE o_orderkey % 89 = 0")


@register("v01_snapshot_diff",
          "WITH a AS (SELECT o_orderkey, o_custkey, o_totalprice "
          "FROM orders), "
          "b AS (" + _V01_B + "), "
          "j AS (SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS k, "
          "  CASE WHEN a.o_orderkey IS NULL THEN 'added' "
          "       WHEN b.o_orderkey IS NULL THEN 'removed' "
          "       WHEN a.o_totalprice <> b.o_totalprice "
          "            OR a.o_custkey <> b.o_custkey THEN 'changed' "
          "       ELSE 'unchanged' END AS klass "
          "  FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey) "
          "SELECT klass, COUNT(*) AS n, "
          "CAST(MIN(k) AS BIGINT) AS first_key "
          "FROM j GROUP BY klass ORDER BY klass")
def v01(spark, sf_dir):
    """Snapshot diff — the table-reconciliation operator (the read-side
    sibling of the deletion engine's post-deletion validation, C7):
    classify every key across two snapshots as added / removed /
    changed / unchanged via ONE key-keyed full outer join, then roll up
    per class. At 100 TB both snapshots shuffle once on the key (or not
    at all if both are bucketed by it); no per-column self-joins, no
    row-by-row driver comparison. The comparison snapshot is derived
    deterministically from the same table so the oracle is exact."""
    orders = load_table(spark, sf_dir, "orders")
    # snapshot A feeds three subtrees (both derived-B branches + the
    # join's left side); the checkpoint holds one projected copy so
    # orders is scanned once, not three times
    a = (orders.select("o_orderkey", "o_custkey", "o_totalprice")
         .localCheckpoint(eager=False))
    b = (a.where(F.col("o_orderkey") % 97 != 0)
         .withColumn("o_totalprice",
                     F.when(F.col("o_orderkey") % 13 == 0,
                            F.col("o_totalprice") + 10.0)
                     .otherwise(F.col("o_totalprice")))
         .unionByName(
             a.where(F.col("o_orderkey") % 89 == 0)
             .withColumn("o_orderkey",
                         F.col("o_orderkey") + 1_000_000)))
    bb = b.select(F.col("o_orderkey").alias("bk"),
                  F.col("o_custkey").alias("bc"),
                  F.col("o_totalprice").alias("bt"))
    j = a.join(bb, a.o_orderkey == bb.bk, "full_outer")
    klass = (F.when(F.col("o_orderkey").isNull(), "added")
             .when(F.col("bk").isNull(), "removed")
             .when((F.col("o_totalprice") != F.col("bt"))
                   | (F.col("o_custkey") != F.col("bc")), "changed")
             .otherwise("unchanged"))
    return (j.select(F.coalesce("o_orderkey", "bk").alias("k"),
                     klass.alias("klass"))
            .groupBy("klass")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.min("k").cast("bigint").alias("first_key"))
            .coalesce(1).orderBy("klass"))


# ---------------------------------------------------------------------------
# p02: single-pass data profiling report
# ---------------------------------------------------------------------------

_P02_COLS = ("o_orderstatus", "o_orderpriority", "o_custkey",
             "o_totalprice")


@register("p02_data_profile",
          " UNION ALL ".join(
              f"SELECT '{c}' AS col_name, "
              f"CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls, "
              f"CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct, "
              f"CAST(MIN({c}) AS VARCHAR) AS min_val, "
              f"CAST(MAX({c}) AS VARCHAR) AS max_val FROM orders"
              for c in _P02_COLS) + " ORDER BY col_name")
def p02(spark, sf_dir):
    """Single-pass data-profiling report (the ANALYZE/data-quality
    summary every warehouse job runs before trusting a feed): per-column
    null count, exact distinct count, and min/max — computed in ONE
    aggregation over ONE scan (multiple COUNT DISTINCTs compile to a
    shared Expand), then unpivoted to the per-column report shape. The
    oracle spells it as per-column scans, which is exactly the naive
    plan this query exists to avoid — at 100 TB, one profiler pass vs
    |columns| passes. min/max stringify for a uniform report schema."""
    orders = load_table(spark, sf_dir, "orders")
    aggs = []
    for c in _P02_COLS:
        aggs += [
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    one = orders.agg(*aggs)
    stack = ", ".join(
        f"'{c}', {c}__nulls, {c}__distinct, {c}__min, {c}__max"
        for c in _P02_COLS)
    return (one.selectExpr(
        f"stack({len(_P02_COLS)}, {stack}) AS "
        f"(col_name, n_nulls, n_distinct, min_val, max_val)")
        .coalesce(1).orderBy("col_name"))


# ---------------------------------------------------------------------------
# g01/g02: co-purchase graph analytics
# ---------------------------------------------------------------------------

def _copurchase_edges(spark, sf_dir):
    """Canonical (u < v, distinct) co-purchase edges over the capped
    part range — ONE definition shared by g01, g02, and the PageRank
    reference test so the three can never silently diverge onto
    different graphs. Checkpointed: both consumers fan out multiple
    actions over it, and the basket self-join must compute once."""
    li = (load_table(spark, sf_dir, "lineitem")
          .where(F.col("l_partkey") < 400)
          .select("l_orderkey", "l_partkey").distinct())
    a = li.select(F.col("l_orderkey").alias("k"),
                  F.col("l_partkey").alias("pa"))
    b = li.select(F.col("l_orderkey").alias("k2"),
                  F.col("l_partkey").alias("pb"))
    return (a.join(b, (F.col("k") == F.col("k2"))
                   & (F.col("pa") < F.col("pb")))
            .select(F.col("pa").alias("u"), F.col("pb").alias("v"))
            .distinct()
            .localCheckpoint(eager=False))


_G01_EDGES = (
    "SELECT DISTINCT LEAST(a.l_partkey, b.l_partkey) AS u, "
    "GREATEST(a.l_partkey, b.l_partkey) AS v "
    "FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem "
    "      WHERE l_partkey < 400) a "
    "JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem "
    "      WHERE l_partkey < 400) b "
    "ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey")


@register("g01_triangle_count",
          "WITH edges AS (" + _G01_EDGES + "), "
          "deg AS (SELECT x AS node, COUNT(*) AS d FROM ("
          "  SELECT u AS x FROM edges UNION ALL SELECT v FROM edges) t "
          "  GROUP BY x), "
          "ori AS (SELECT CASE WHEN (du.d, e.u) < (dv.d, e.v) "
          "  THEN e.u ELSE e.v END AS s, "
          "  CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.v ELSE e.u END "
          "  AS t FROM edges e "
          "  JOIN deg du ON du.node = e.u JOIN deg dv ON dv.node = e.v), "
          "wedges AS (SELECT e1.t AS a, e2.t AS b FROM ori e1 "
          "  JOIN ori e2 ON e1.s = e2.s AND e1.t < e2.t) "
          "SELECT (SELECT COUNT(*) FROM edges) AS n_edges, "
          "(SELECT COUNT(*) FROM deg) AS n_nodes, "
          "CAST((SELECT COUNT(*) FROM wedges w JOIN edges e "
          "ON w.a = e.u AND w.b = e.v) AS BIGINT) AS n_triangles")
def g01(spark, sf_dir):
    """Triangle counting on the co-purchase graph (parts sharing an
    order) via DEGREE-ORDERED ORIENTATION (Suri & Vassilvitskii 2011):
    each undirected edge points from its lower-(degree, id) endpoint to
    the higher, so every triangle is counted exactly once and — the
    scale property — wedge generation is Σ out-degree² where
    out-degrees are bounded by orientation (a hub's edges point INTO
    it, so the hub never fans out its full neighborhood). The wedge
    join and the closing-edge probe are plain equi-joins; nothing in
    the plan is quadratic in the part catalog. The part-key cap keeps
    the demo graph bounded at any SF while exercising the identical
    plan."""
    edges = _copurchase_edges(spark, sf_dir)
    deg = (edges.select(F.col("u").alias("node"))
           .unionAll(edges.select(F.col("v").alias("node")))
           .groupBy("node").agg(F.count(F.lit(1)).alias("d")))
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    lower_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v")))
    ori = (edges.join(du, "u").join(dv, "v")
           .select(F.when(lower_first, F.col("u")).otherwise(F.col("v"))
                   .alias("s"),
                   F.when(lower_first, F.col("v")).otherwise(F.col("u"))
                   .alias("t")))
    e1 = ori.select(F.col("s"), F.col("t").alias("a"))
    e2 = ori.select(F.col("s").alias("s2"), F.col("t").alias("b"))
    wedges = (e1.join(e2, (F.col("s") == F.col("s2"))
                      & (F.col("a") < F.col("b")))
              .select("a", "b"))
    # wedges carry a < b and edges are canonical u < v, so the closing
    # edge can ONLY match as (a=u, b=v) — a pure equi-join (an OR form
    # would plan as a nested loop)
    closing = wedges.join(
        edges, (wedges.a == edges.u) & (wedges.b == edges.v))
    n_tri = closing.count()
    n_edges = edges.count()
    n_nodes = deg.count()
    return local_frame(
        spark, [(n_edges, n_nodes, n_tri)],
        "n_edges long, n_nodes long, n_triangles bigint")


# ---------------------------------------------------------------------------
# g02: PageRank (fixed-iteration power method)
# ---------------------------------------------------------------------------

def _pr_step(k: int) -> str:
    """One unrolled PageRank iteration as a DuckDB CTE: the 5-round
    power method is a FIXED iteration count, so the oracle needs no
    recursive CTE at all — chain r0..r5 and read r5."""
    return (f"r{k} AS (SELECT e.v AS u, "
            "0.15::DOUBLE + 0.85::DOUBLE * SUM(r.rank / d.outd) AS rank "
            f"FROM edges e JOIN r{k - 1} r ON e.u = r.u "
            "JOIN deg d ON d.u = e.u GROUP BY e.v)")


@register("g02_pagerank",
          "WITH e0 AS (" + _G01_EDGES + "), "
          "edges AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0), "
          "deg AS (SELECT u, COUNT(*) AS outd FROM edges GROUP BY u), "
          "r0 AS (SELECT u, 1.0::DOUBLE AS rank FROM deg), "
          + ", ".join(_pr_step(k) for k in range(1, 6)) +
          " SELECT u, ROUND(rank, 3) AS rank FROM r5 "
          "ORDER BY rank DESC, u LIMIT 10")
def g02(spark, sf_dir):
    """PageRank over the (undirected → both-ways) co-purchase graph:
    5 power iterations at damping 0.85 — the canonical iterative graph
    workload. Per iteration: a vertex-sized prep join attaches
    out-degree to ranks, then contributions = rank/out-degree ship
    along edges in the round's ONE edge-sized join, partial-agged per
    destination, damped — the plan a 1000-executor PageRank uses, with
    ``localCheckpoint`` truncating lineage per round exactly like
    d06/t15. Dangling mass is impossible here (undirected edges give
    every vertex out-degree ≥ 1), so rank mass stays |V| — asserted in
    the test via a numpy power-iteration reference the Spark result
    must match. The DuckDB oracle UNROLLS the 5 fixed iterations as
    chained CTEs r0→r5 (no recursive CTE needed for a fixed-depth
    loop), so the driver hash-checks the rounded top-10 directly.
    Ranks are reported at 3 dp: the two engines sum contributions in
    different orders (cross-engine FP noise ~1e-13 on these O(1)
    ranks), and at sf0.01 the nearest rank to a 3-dp rounding boundary
    is 4.6e-7 away — a 6-orders-of-magnitude margin (measured; at 4 dp
    the margin narrows to 3.2e-8, so 3 dp is the safer grid).
    Returns the top-10 parts by rank."""
    und = _copurchase_edges(spark, sf_dir)
    edges = (und.unionAll(und.select(F.col("v").alias("u"),
                                     F.col("u").alias("v")))
             .localCheckpoint())
    deg = (edges.groupBy("u").agg(F.count(F.lit(1)).alias("outd"))
           .localCheckpoint())
    ranks = deg.select("u", F.lit(1.0).alias("rank")).localCheckpoint()
    for _ in range(5):
        # vertex-sized prep join attaches out-degree to ranks, so the
        # edge-sized join of the round is the ONE against edges
        r_outd = ranks.join(deg, "u")
        contrib = (edges.join(r_outd, "u")
                   .select(F.col("v").alias("u"),
                           (F.col("rank") / F.col("outd"))
                           .alias("c")))
        ranks = (contrib.groupBy("u")
                 .agg((F.lit(0.15) + F.lit(0.85) * F.sum("c"))
                      .alias("rank"))
                 .localCheckpoint())
    return (ranks.select("u", F.round("rank", 3).alias("rank"))
            .orderBy(F.desc("rank"), "u").limit(10))


# ---------------------------------------------------------------------------
# f14: error-tolerant expressions (try_cast / try_divide)
# ---------------------------------------------------------------------------

@register("f14_try_functions",
          "SELECT TRY_CAST(substr(o_orderpriority, 1, 1) AS BIGINT) "
          "AS prio, COUNT(*) AS n, "
          "CAST(SUM(CASE WHEN TRY_CAST(o_orderstatus AS BIGINT) IS NULL "
          "THEN 1 ELSE 0 END) AS BIGINT) AS n_unparseable_status, "
          "ROUND(AVG(CASE WHEN TRY_CAST(substr(o_orderpriority, 1, 1) "
          "AS BIGINT) - 1 = 0 THEN NULL ELSE o_totalprice / "
          "(TRY_CAST(substr(o_orderpriority, 1, 1) AS BIGINT) - 1) END), "
          "2) AS avg_safe_ratio "
          "FROM orders GROUP BY prio ORDER BY prio")
def f14(spark, sf_dir):
    """Error-tolerant expression surface (``try_cast`` / ``try_divide``)
    — on a 100 TB ingest some rows are always malformed, and the try_*
    family turns would-be task failures into NULLs that flow into
    ordinary NULL-skipping aggregates instead of killing the job:
    try_cast parses the leading priority digit (and proves the
    letters-only status column yields NULL, never an error), try_divide
    absorbs the zero divisor the priority-1 group produces. All
    branch-free codegen; the oracle spells try_divide as its CASE
    definition (DuckDB has TRY_CAST but no TRY_DIVIDE)."""
    orders = load_table(spark, sf_dir, "orders")
    prio = F.substring("o_orderpriority", 1, 1).try_cast("bigint")
    return (orders.groupBy(prio.alias("prio"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.when(F.col("o_orderstatus")
                              .try_cast("bigint")
                              .isNull(), 1).otherwise(0)).cast("bigint")
                 .alias("n_unparseable_status"),
                 F.round(F.avg(F.try_divide(F.col("o_totalprice"),
                                            prio - 1)), 2)
                 .alias("avg_safe_ratio"))
            .coalesce(1).orderBy("prio"))


# ---------------------------------------------------------------------------
# t15: BPE tokenizer training (iterative; dictionary-sized per merge)
# ---------------------------------------------------------------------------

# One trained tokenizer per (session, corpus, size): t15 and t16 are the
# train and encode halves of the same pipeline, so the trainer loop runs
# once and both queries read the artifact — exactly what save_merges/
# load_merges model for cross-job reuse, done in-process here. The
# session is held by WEAKREF and hits require identity: an id()-keyed
# cache could serve a vocab DataFrame bound to a stopped session whose
# CPython address was reused, and would pin dead sessions' checkpointed
# RDDs for the process lifetime.
_BPE_MEMO: dict = {}


def _trained_bpe(spark, sf_dir, num_merges):
    import weakref

    from ..operators.bpe import train_bpe

    key = (sf_dir, num_merges)
    # one slot PER LIVE SESSION (dead refs pruned): a single slot would
    # thrash — two concurrently-live sessions alternating t15/t16 for
    # the same corpus would evict each other and retrain every call
    slots = [(r, v) for r, v in _BPE_MEMO.get(key, []) if r() is not None]
    for spark_ref, value in slots:
        if spark_ref() is spark:
            _BPE_MEMO[key] = slots
            return value
    docs = load_table(spark, sf_dir, "documents")
    value = train_bpe(docs, num_merges=num_merges)
    _BPE_MEMO[key] = slots + [(weakref.ref(spark), value)]
    return value


@register("t15_bpe_train", None)  # iterative trainer: no SQL oracle
def t15(spark, sf_dir):
    """BPE tokenizer training on the document corpus (64 merges) — the
    tokenizer-learning step of an LLM data pipeline, in its
    scale-correct Sennrich formulation: ONE corpus scan builds the
    weighted word dictionary, every round then runs on dictionary rows
    only (pair counts = JVM-codegen arrays_zip explode; candidates =
    TakeOrderedAndProject with a total order; merge apply =
    Arrow-batched fold per word). BATCH SEMANTICS: each round accepts
    the top-16 SYMBOL-DISJOINT candidate pairs and applies them in one
    rewrite — disjoint merges commute and keep exact counts, so the
    64-merge table costs 4 Spark rounds, not 64, and a real 32k-merge
    tokenizer stays O(merges/16) rounds (operators/bpe.py module doc).
    Exact integer counts + total-order tie-break make the learned
    table a pure function of the corpus — pytest asserts equality with
    an independent pure-Python reference trainer at 64 merges.
    Returns the merge table."""
    merges, _ = _trained_bpe(spark, sf_dir, num_merges=64)
    return local_frame(
        spark, [(r, a, b, a + b, n) for r, a, b, n in merges],
        "rank long, left string, right string, merged string, n long")


# ---------------------------------------------------------------------------
# t16: BPE encoding + per-source compression report
# ---------------------------------------------------------------------------

@register("t16_bpe_compression", None)  # depends on trained merges: no oracle
def t16(spark, sf_dir):
    """Apply the trained BPE merges and report per-source compression
    (chars per subword token) — the train→encode→measure loop of
    tokenizer development. The scale move: token counts come
    straight from the trainer's final DISTINCT-word vocab (each word was
    tokenized once, during training) and the exploded corpus joins that
    dictionary on the word key — no re-tokenization, no second corpus
    scan. ``operators.bpe.encode_with_merges`` is the same
    dictionary-encode for corpora the trainer has NOT seen (tested
    equal to the trainer's own vocab). The trainer itself runs ONCE
    per (session, corpus): t15 and t16 share the memoized merge table,
    mirroring the save_merges/load_merges artifact flow. Exact integer
    sums; deterministic for a fixed corpus (the merge table itself is
    reference-equal)."""
    docs = load_table(spark, sf_dir, "documents")
    merges, vocab = _trained_bpe(spark, sf_dir, num_merges=64)
    # the trainer's final vocab ALREADY holds each word's merged
    # symbols — n_tokens is just its length; re-encoding (or a second
    # word_dictionary scan) would repeat the work the loop has done
    encoded = vocab.select("word", F.size("symbols").alias("n_tokens"))
    ex = (docs.select("source",
                      F.explode(F.split(F.lower("text"), "[^a-z]+"))
                      .alias("word"))
          .where(F.col("word") != ""))
    return (ex.join(encoded.select("word", "n_tokens"), "word")
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_words"),
                 F.sum(F.length("word")).alias("n_chars"),
                 F.sum("n_tokens").cast("bigint").alias("n_bpe_tokens"))
            .withColumn("chars_per_token",
                        F.round(F.col("n_chars") / F.col("n_bpe_tokens"), 4))
            .coalesce(1).orderBy("source"))


# ---------------------------------------------------------------------------
# cdc02: SCD Type-2 history assembly from a change feed
# ---------------------------------------------------------------------------

@register("cdc02_scd2_history",
          "WITH feed AS (SELECT user_id, date_trunc('day', ts) AS d, "
          "  value, ROW_NUMBER() OVER (PARTITION BY user_id, "
          "  date_trunc('day', ts) ORDER BY event_id DESC) AS rn "
          "  FROM events WHERE event_type = 'signup'), "
          "daily AS (SELECT user_id, d, value FROM feed WHERE rn = 1), "
          "hist AS (SELECT user_id, value, d AS valid_from, "
          "  LEAD(d) OVER (PARTITION BY user_id ORDER BY d) AS valid_to "
          "  FROM daily) "
          "SELECT user_id, value, valid_from, valid_to, "
          "(valid_to IS NULL) AS is_current FROM hist "
          "ORDER BY user_id, valid_from LIMIT 200")
def cdc02(spark, sf_dir):
    """SCD Type-2 dimension history assembled from a change feed — the
    warehouse-standard versioned-dimension shape (cdc01 is the Type-1
    'overwrite' sibling): collapse the feed to one change per (entity,
    day) with a deterministic last-writer rule, then LEAD() closes each
    version's validity interval and the open interval marks the current
    row. One window shuffle on the entity key serves BOTH the dedup and
    the interval assembly (same partitioning) — at 100 TB the feed is
    shuffled once, and incremental runs only touch entities present in
    the new batch. Day-granular bounds keep the intervals identical
    across engine timestamp precisions."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type") == "signup")
    feed = ev.select("user_id", F.date_trunc("day", "ts").alias("d"),
                     "value", "event_id")
    w_dedup = Window.partitionBy("user_id", "d").orderBy(
        F.desc("event_id"))
    daily = (feed.withColumn("rn", F.row_number().over(w_dedup))
             .where(F.col("rn") == 1))
    w_lead = Window.partitionBy("user_id").orderBy("d")
    return (daily.select(
        "user_id", "value", F.col("d").alias("valid_from"),
        F.lead("d").over(w_lead).alias("valid_to"))
        .withColumn("is_current", F.col("valid_to").isNull())
        .orderBy("user_id", "valid_from")
        .limit(200))


# ---------------------------------------------------------------------------
# ts05: day-of-week seasonal decomposition
# ---------------------------------------------------------------------------

@register("ts05_seasonal_decomposition",
          "WITH daily AS (SELECT date_trunc('day', ts) AS d, "
          "  SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS tc "
          "  FROM events GROUP BY d) "
          "SELECT CAST(dayofweek(d) + 1 AS BIGINT) AS dow, "
          "COUNT(*) AS n_days, "
          "CAST((2 * SUM(tc) + COUNT(*)) // (2 * COUNT(*)) AS DOUBLE) "
          "/ 100.0 AS dow_mean, "
          "CAST(0.0 AS DOUBLE) AS mean_resid, "
          "ROUND(SQRT(CAST(COUNT(*) * SUM(CAST(tc AS HUGEINT) * tc) "
          "- CAST(SUM(tc) AS HUGEINT) * SUM(tc) AS DOUBLE) "
          "/ CAST(COUNT(*) * COUNT(*) AS DOUBLE)) / 100.0, 2) "
          "AS resid_stddev "
          "FROM daily GROUP BY dow ORDER BY dow")
# DuckDB dayofweek is 0-based (Sunday=0); +1 aligns to Spark's 1-based
# Sunday=1.
def ts05(spark, sf_dir):
    """Day-of-week seasonal decomposition: split the daily series into a
    weekday profile (the seasonal component) and residuals, reporting
    per-dow mean and residual spread — the seasonality diagnostic run
    before anomaly thresholds are set on a metric. The corpus collapses
    to |days| rows in the FIRST aggregation, so the rollup operates on
    calendar-bounded data — at 100 TB the only full scan is the one
    partial-agged daily rollup.

    Round 10: EXACT INTEGER-CENTS arithmetic end-to-end (ml02/t25's
    micro-unit move). The float form diverged from the oracle by one
    cent at sf0.001 (dow_mean 1562.75 vs 1562.76 — AVG over doubles
    sits on a half-cent boundary and partial-sum ORDER decides the
    side). Now: per-row cents are exact (value is 2dp by schema),
    daily totals are BIGINT sums, dow_mean is the half-up integer-cent
    division (2S+n) div (2n) — DuckDB ``//`` truncates toward zero and
    Spark ``div`` matches on the non-negative sums — and the residual
    stddev uses the algebraic identity stddev_pop(total − group_mean)
    = stddev_pop(total), computed from the exact integer moments
    n·Σtc² − (Σtc)² (decimal/HUGEINT — n·tc² overflows int64 past
    ~sf10) with one deterministic final sqrt. mean_resid is EXACTLY
    zero by construction — the residual of a group against its own
    unrounded mean — so both engines emit the constant rather than
    re-deriving 0 through a float path that can only wobble in the
    last ulp."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    daily = (ev.groupBy(F.date_trunc("day", "ts").alias("d"))
             .agg(F.sum(cents).alias("tc")))
    tcd = F.col("tc").cast("decimal(38,0)")
    g = (daily.groupBy(F.dayofweek("d").cast("bigint").alias("dow"))
         .agg(F.count(F.lit(1)).alias("n_days"),
              F.sum("tc").alias("s_c"),
              F.sum(tcd * tcd).alias("s2")))
    num = (F.col("n_days").cast("decimal(38,0)") * F.col("s2")
           - F.col("s_c").cast("decimal(38,0)") * F.col("s_c"))
    return (g.select(
        "dow", "n_days",
        (F.expr("div(2 * s_c + n_days, 2 * n_days)").cast("double")
         / 100.0).alias("dow_mean"),
        F.lit(0.0).alias("mean_resid"),
        F.round(
            F.sqrt(num.cast("double")
                   / (F.col("n_days") * F.col("n_days")).cast("double"))
            / 100.0, 2).alias("resid_stddev"))
        .coalesce(1).orderBy("dow"))


# ---------------------------------------------------------------------------
# ts06: CUSUM changepoint detection (recursive scan over the daily series)
# ---------------------------------------------------------------------------

_TS06_SQL = (
    "WITH RECURSIVE "
    "daily AS (SELECT event_type, date_trunc('day', ts) AS d, "
    "  CAST(ROUND(SUM(value) * 100, 0) AS BIGINT) AS total_c "
    "  FROM events GROUP BY event_type, date_trunc('day', ts)), "
    "stats AS (SELECT event_type, "
    "  CAST(FLOOR(CAST(SUM(total_c) AS DOUBLE) / COUNT(*)) AS BIGINT) "
    "  AS mu_c FROM daily GROUP BY event_type), "
    "rk AS (SELECT daily.*, ROW_NUMBER() OVER (PARTITION BY event_type "
    "  ORDER BY d) AS rn FROM daily), "
    "cus AS ("
    "  SELECT rk.event_type, rn, d, "
    "  GREATEST(CAST(0 AS BIGINT), total_c - mu_c - 10000) AS cusum_c "
    "  FROM rk JOIN stats ON stats.event_type = rk.event_type "
    "  WHERE rn = 1 "
    "  UNION ALL "
    "  SELECT rk.event_type, rk.rn, rk.d, "
    "  GREATEST(CAST(0 AS BIGINT), "
    "           cus.cusum_c + rk.total_c - s.mu_c - 10000) "
    "  FROM cus JOIN rk ON rk.event_type = cus.event_type "
    "  AND rk.rn = cus.rn + 1 "
    "  JOIN stats s ON s.event_type = rk.event_type) "
    "SELECT event_type, d, CAST(ROUND(cusum_c / 100.0, 2) AS DOUBLE) AS cusum "
    "FROM cus WHERE cusum_c > 0 ORDER BY event_type, d")


@register("ts06_cusum_changepoints", _TS06_SQL)
def ts06(spark, sf_dir):
    """CUSUM changepoint detection per event type: the one-sided
    cumulative-sum statistic Sᵢ = max(0, Sᵢ₋₁ + xᵢ − μ − k) flags days
    where the metric runs persistently above its mean plus the slack k
    — the classic sequential drift detector. The recursion is a SCAN
    (every prefix value matters, not just the final fold). The oracle
    spells it as a recursive CTE; the Spark side instead scans INSIDE
    the per-type day array with nested higher-order functions — the
    array is CALENDAR-BOUNDED, so the O(|days|²) fold is a few hundred
    codegen integer ops per type, where a per-level recursive join
    would pay ~|days| Spark stages of scheduling overhead for a 5-row
    frontier (measured 16.6 s recursive vs ~1 s scan at sf0.1 — 0.77-1.1 s warm across runs on this drifting host; the cold gap is one-time codegen of the nested fold). All state is exact
    INTEGER cents (daily totals and the per-type mean quantized): a
    float mean would accumulate last-bit drift across every step and
    land CUSUM values on rounding boundaries — integer state cannot
    drift. Cents convert to currency only in the final projection."""
    ev = load_table(spark, sf_dir, "events")
    daily = (ev.groupBy("event_type",
                        F.date_trunc("day", "ts").alias("d"))
             .agg(F.round(F.sum("value") * 100, 0).cast("bigint")
                  .alias("total_c")))
    per = (daily.groupBy("event_type")
           .agg(F.array_sort(F.collect_list(F.struct("d", "total_c")))
                .alias("arr"),
                F.floor(F.sum("total_c")
                        / F.count(F.lit(1)).cast("double"))
                .cast("bigint").alias("mu_c")))
    # prefix scan: cusum_i folds days 1..i — O(|days|²) integer codegen
    # ops per type, trivial because |days| is calendar-bounded; this
    # replaces a per-LEVEL recursive join (30 Spark stages of pure
    # scheduling overhead for a 5-row frontier)
    scan = F.transform(
        F.sequence(F.lit(1), F.size("arr")),
        lambda i: F.struct(
            F.element_at("arr", i)["d"].alias("d"),
            F.aggregate(
                F.slice("arr", 1, i), F.lit(0).cast("bigint"),
                lambda acc, x: F.greatest(
                    F.lit(0).cast("bigint"),
                    acc + x["total_c"] - F.col("mu_c") - 10000))
            .alias("cusum_c")))
    return (per.select("event_type", F.explode(scan).alias("s"))
            .where(F.col("s.cusum_c") > 0)
            .select("event_type", F.col("s.d").alias("d"),
                    F.round(F.col("s.cusum_c") / F.lit(100.0), 2)
                    .alias("cusum"))
            .orderBy("event_type", "d"))


# ---------------------------------------------------------------------------
# e05: PCA whitening audit (distributed moments + driver eigh + projection)
# ---------------------------------------------------------------------------

@register("e05_pca_whitening", None)  # driver-side eigh: no SQL oracle
def e05(spark, sf_dir):
    """PCA/ZCA whitening of the embedding corpus, then a self-audit: the
    whitened covariance must be ≈ identity. The pattern is the one a
    100 TB embedding pipeline uses before product quantization — corpus
    statistics as mapInPandas gram-matrix partials (one row per Arrow
    batch), a d×d eigendecomposition on the driver (trivial at any
    corpus size), and a vectorized matmul projection per batch. Output
    is the audit row (n, worst diagonal deviation from 1, worst
    off-diagonal residual); thresholds are test-asserted."""
    from ..operators.similarity import embedding_moments, pca_whitening

    import numpy as np
    emb = load_table(spark, sf_dir, "embeddings")
    whitened, _, _ = pca_whitening(emb)
    n, _, cov_w = embedding_moments(whitened)
    off = cov_w - np.diag(np.diag(cov_w))
    return local_frame(
        spark, [(n,
                 round(float(np.abs(np.diag(cov_w) - 1.0).max()), 4),
                 round(float(np.abs(off).max()), 4))],
        "n_vectors long, max_diag_dev double, max_offdiag double")


# ---------------------------------------------------------------------------
# t14: unigram-LM surprisal (the n-gram form of LM-based quality filtering)
# ---------------------------------------------------------------------------

@register("t14_unigram_surprisal",
          "WITH ex AS (SELECT doc_id, UNNEST("
          "  regexp_split_to_array(LOWER(text), '[^a-z]+')) AS token "
          "  FROM documents), "
          "tok AS (SELECT doc_id, token FROM ex WHERE token <> ''), "
          "lm AS (SELECT token, COUNT(*) AS c FROM tok GROUP BY token), "
          "tot AS (SELECT SUM(c) AS t FROM lm) "
          "SELECT doc_id, COUNT(*) AS n_toks, "
          "ROUND(AVG(-ln(c / t)), 4) AS surprisal "
          "FROM tok JOIN lm USING (token), tot "
          "GROUP BY doc_id ORDER BY surprisal DESC, doc_id LIMIT 10")
def t14(spark, sf_dir):
    """Unigram-LM surprisal scoring — the n-gram form of the LM quality
    filter (CCNet-style: score each document by its cross-entropy under
    a model trained on the corpus itself; rare-token-stuffed docs score
    high and get filtered/bucketed). One explode feeds BOTH the language
    model (token→count) and the scoring pass; the model join is
    dictionary-keyed (skewed on stopwords — exactly the shape AQE's
    skew-join split handles), the corpus total is a 1-row broadcast, and
    the output flows through TakeOrderedAndProject. The per-doc mean of
    -ln p(token) sums ~50 doubles whose order can differ between
    engines; at 4-dp rounding on O(1-10) values the 1e-14 drift is
    far inside the rounding granularity."""
    docs = load_table(spark, sf_dir, "documents")
    tok = (docs.select("doc_id",
                       F.explode(F.split(F.lower("text"), "[^a-z]+"))
                       .alias("token"))
           .where(F.col("token") != ""))
    # the LM is dictionary-sized: checkpointing it means the corpus is
    # exploded exactly twice (model build + scoring) instead of three
    # times, and the scalar total derives from the checkpoint for free
    lm = (tok.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
          .localCheckpoint(eager=False))
    tot = lm.agg(F.sum("c").alias("t"))
    return (tok.join(lm, "token")
            .crossJoin(F.broadcast(tot))
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_toks"),
                 F.round(F.avg(-F.log(F.col("c") / F.col("t"))), 4)
                 .alias("surprisal"))
            .orderBy(F.desc("surprisal"), "doc_id")
            .limit(10))


# ---------------------------------------------------------------------------
# a24/a25: mergeable sketch rollups (KLL quantiles, Theta set algebra)
# ---------------------------------------------------------------------------

@register("a24_kll_quantile_rollup", None)  # sketch bytes: no SQL oracle
def a24(spark, sf_dir):
    """Mergeable QUANTILE sketches (Datasketches KLL) — a21's pattern
    applied to percentiles, the re-aggregatable answer to a07/a14 at
    100 TB: per-group KLL states persist alongside a continuous
    aggregate, a new day of data sketches independently, and
    kll_merge_agg folds it in — history is never re-sorted or
    re-scanned for a percentile refresh. Returns per-event-type and
    merged-global median/p90 estimates; deterministic for fixed input,
    rank-error-bound-tested against exact percentiles in pytest."""
    ev = load_table(spark, sf_dir, "events")
    per = (ev.groupBy("event_type")
           .agg(F.kll_sketch_agg_double("value").alias("sk"),
                F.count(F.lit(1)).alias("n_events")))
    est = per.select(
        "event_type", "n_events",
        F.kll_sketch_get_quantile_double("sk", F.lit(0.5)).alias("p50"),
        F.kll_sketch_get_quantile_double("sk", F.lit(0.9)).alias("p90"))
    merged = (per.agg(F.kll_merge_agg_double("sk").alias("sk"),
                      F.sum("n_events").alias("n_events"))
              .select(F.lit("ALL").alias("event_type"), "n_events",
                      F.kll_sketch_get_quantile_double(
                          "sk", F.lit(0.5)).alias("p50"),
                      F.kll_sketch_get_quantile_double(
                          "sk", F.lit(0.9)).alias("p90")))
    return est.unionByName(merged).coalesce(1).orderBy("event_type")


@register("a25_theta_set_algebra", None)  # sketch bytes: no SQL oracle
def a25(spark, sf_dir):
    """Mergeable SET-ALGEBRA sketches (Datasketches Theta) — the
    capability HLL lacks: sketch the distinct USER sets per event type
    once, then answer intersection/difference questions ('how many
    clickers also purchased?') from the tiny sketch states without
    ever re-touching the event log. One conditional-aggregation scan
    builds both sketches; every estimate after is driver-side scalar
    math on kilobytes. Error-bound-tested against exact distinct
    counts in pytest."""
    ev = load_table(spark, sf_dir, "events")
    sks = ev.agg(
        F.theta_sketch_agg(
            F.when(F.col("event_type") == "click", F.col("user_id")))
        .alias("sk_click"),
        F.theta_sketch_agg(
            F.when(F.col("event_type") == "purchase", F.col("user_id")))
        .alias("sk_buy"))
    return sks.select(
        F.theta_sketch_estimate("sk_click").alias("clickers"),
        F.theta_sketch_estimate("sk_buy").alias("buyers"),
        F.theta_sketch_estimate(
            F.theta_intersection("sk_click", "sk_buy"))
        .alias("click_and_buy"),
        F.theta_sketch_estimate(
            F.theta_difference("sk_click", "sk_buy"))
        .alias("click_not_buy"))


# ---------------------------------------------------------------------------
# ts04: per-user EWMA via a bounded higher-order fold
# ---------------------------------------------------------------------------

@register("ts04_ewma",
          "WITH lastk AS (SELECT user_id, value, ROW_NUMBER() OVER ("
          "  PARTITION BY user_id "
          "  ORDER BY date_trunc('second', ts) DESC, event_id DESC) AS rn "
          "  FROM events), "
          "arr AS (SELECT user_id, COUNT(*) AS n_used, "
          "        list(value ORDER BY rn DESC) AS vs "
          "        FROM lastk WHERE rn <= 20 GROUP BY user_id) "
          "SELECT user_id, n_used, "
          "ROUND(list_reduce(vs, (acc, x) -> 0.4 * x + 0.6 * acc), 4) "
          "AS ewma FROM arr ORDER BY user_id")
def ts04(spark, sf_dir):
    """Per-user EWMA (α = 0.4) over the last 20 events — exponential
    smoothing is RECURSIVE (ewmaᵢ = α·xᵢ + (1-α)·ewmaᵢ₋₁), which no SQL
    window frame expresses; the idiomatic Spark form is a higher-order
    ``F.aggregate`` fold over an ordered array. The row_number pre-filter
    bounds the folded array to 20 elements per key BEFORE collect_list,
    so per-key state is O(1) no matter how long a user's history grows —
    the property that makes this safe on an unbounded 100 TB event log.
    Ordering truncates ts to seconds (sub-µs parquet precision differs
    between engines) with event_id as the exact tie-break, and both
    engines fold the identical IEEE sequence, so results are bit-equal
    before the display rounding."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.date_trunc("second", F.col("ts")).desc(), F.col("event_id").desc())
    lastk = (ev.select("user_id", "value", "event_id",
                       F.row_number().over(w).alias("rn"))
             .where(F.col("rn") <= 20))
    # rn DESC == chronological ASC within the kept window; sort the
    # (20-rn, value) structs so the fold walks oldest → newest.
    arr = (lastk.groupBy("user_id")
           .agg(F.count(F.lit(1)).alias("n_used"),
                F.array_sort(F.collect_list(
                    F.struct((-F.col("rn")).alias("ord"), "value")))
                .alias("sv")))
    vs = F.transform(F.col("sv"), lambda s: s["value"])
    ewma = F.aggregate(
        F.slice(vs, 2, F.greatest(F.size(vs) - 1, F.lit(0))),
        F.element_at(vs, 1),
        lambda acc, x: F.lit(0.4) * x + F.lit(0.6) * acc)
    return (arr.select("user_id", "n_used",
                       F.round(ewma, 4).alias("ewma"))
            .orderBy("user_id"))
