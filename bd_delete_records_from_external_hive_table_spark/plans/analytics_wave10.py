"""Tenth-wave queries (round 7, batch 3): the exact-threshold similarity
join, context-window chunking, and count-based classifier training —
three more first-class training-data-pipeline operations.

- d17 prefix-filter exact Jaccard join — the AllPairs/PPJoin-family
  similarity join (Bayardo, Ma & Srikant, WWW 2007, public): every pair
  with shingle-Jaccard ≥ 0.6, EXACT, without the quadratic pair space —
  document-frequency-ordered prefixes turn the candidate step into an
  equi-join on each document's RAREST shingles, and exact verification
  makes the filter lossless. d03 is the brute-force baseline (bounded
  panel, quadratic oracle); d17 runs the same contract over an
  SF-PROPORTIONAL corpus because its oracle replays the same
  near-linear algorithm instead of brute force. Equality vs the
  brute-force baseline is test-asserted; the driver hash-checks the
  prefix-filter pipeline itself at corpus scale.
- t24 context-window chunking — the RAG/pretraining sharding step:
  fixed 128-token windows at stride 96 (32-token overlap) over every
  document, emitted as (doc_id, chunk_id, start_tok, n_tok, chunk
  content hash). Chunk membership and boundaries are pure integer
  arithmetic; the content hash is the shared 28-bit md5, so the oracle
  certifies the exact chunk text, not just the counts. One scan, no
  shuffle — chunking is a generator projection.
- ml02 multinomial Naive Bayes source classifier — the count-based
  sibling of ml01's IRLS logistic regression, and unlike ml01 it is
  FULLY SQL-expressible, so the training + scoring pipeline gets a
  value-hash oracle, not a rows-only pass. Trains P(token|source) with
  add-one smoothing on the whole corpus, scores every document, and
  reports the source×predicted confusion matrix. All score arithmetic
  is micro-nat INTEGER sums (ln of exact integer counts quantized at
  1e6 before summing), so per-document argmax is order-independent and
  cross-engine stable — the g02/ts06 exact-integer lesson applied to
  log-likelihoods.

Reference anchor: widens the declared-query surface admitted by the
reference's SQL boundary (DeletionCriteria.java:40-63) as waves 1-9 do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import stable_hash28, ws_tokens
from ..operators import dedup
from ..sources.tables import load_table, spread
from .llm_ops import (_AUG_FULL_NEARDUP, _DUCK_HASH28, _DUCK_SHINGLES3,
                      _DUCK_TOKENS, _aug_full_neardup)
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# the SF-proportional planted-near-dup corpus (shared with d15/d16)
# lives in llm_ops next to its fixed-panel sibling _AUG_NEARDUP


@register("d17_prefix_filter_jaccard",
          f"WITH aug AS ({_AUG_FULL_NEARDUP}), "
          f"tok AS (SELECT doc_id, {_DUCK_TOKENS} AS ts FROM aug), "
          f"sh AS (SELECT doc_id, {_DUCK_SHINGLES3} AS s FROM tok), "
          "e AS (SELECT doc_id, len(s) AS n, unnest(s) AS g FROM sh), "
          "dfc AS (SELECT g, COUNT(*) AS df FROM e GROUP BY g), "
          "r AS (SELECT e.doc_id, e.n, e.g, ROW_NUMBER() OVER ("
          "  PARTITION BY e.doc_id ORDER BY dfc.df, e.g) AS rk "
          "  FROM e JOIN dfc USING (g)), "
          "p AS (SELECT doc_id, g FROM r "
          "  WHERE rk <= n - ((n * 6000 + 9999) // 10000) + 1), "
          "cand AS (SELECT DISTINCT pa.doc_id AS a, pb.doc_id AS b "
          "  FROM p pa JOIN p pb ON pa.g = pb.g "
          "  AND pa.doc_id < pb.doc_id), "
          "v AS (SELECT a, b, len(list_intersect(sa.s, sb.s)) AS i, "
          "  GREATEST(len(list_distinct(list_concat(sa.s, sb.s))), 1) AS u "
          "  FROM cand JOIN sh sa ON sa.doc_id = cand.a "
          "  JOIN sh sb ON sb.doc_id = cand.b) "
          "SELECT a, b, ROUND(CAST(i AS DOUBLE) / u, 4) AS jaccard "
          "FROM v WHERE i * 10000 >= u * 6000 ORDER BY a, b")
def d17(spark, sf_dir):
    """Exact Jaccard-0.6 similarity join over the FULL corpus (plus
    SF-proportional planted near-dup copies) via document-frequency-
    ordered prefix filtering — see
    ``operators/dedup.py:prefix_filter_jaccard_pairs``. The oracle
    replays the identical algorithm (same global (df, shingle) order,
    same integer prefix length, same cross-multiply verify), and the
    exact verify makes both pipelines equal to brute force by
    construction (test-asserted vs d03's baseline)."""
    return (dedup.prefix_filter_jaccard_pairs(
        _aug_full_neardup(spark, sf_dir), shingle_size=3, threshold=0.6)
        .orderBy("a", "b"))


_CHUNK, _STRIDE = 128, 96


@register("t24_context_chunking",
          f"WITH tok AS (SELECT doc_id, {_DUCK_TOKENS} AS ts "
          "FROM documents), "
          f"c AS (SELECT doc_id, ts, unnest(range(0, len(ts), {_STRIDE})) "
          "  AS s FROM tok WHERE len(ts) > 0), "
          "ch AS (SELECT doc_id, "
          f"  CAST(s // {_STRIDE} AS BIGINT) AS chunk_id, "
          "  CAST(s AS BIGINT) AS start_tok, "
          f"  ts[s + 1 : s + {_CHUNK}] AS ck FROM c) "
          "SELECT doc_id, chunk_id, start_tok, "
          "CAST(len(ck) AS BIGINT) AS n_tok, "
          + _DUCK_HASH28.format("array_to_string(ck, ' ')")
          + " AS chunk_h28 FROM ch ORDER BY doc_id, chunk_id")
def t24(spark, sf_dir):
    """Context-window chunking: 128-token windows at stride 96 over
    every document — the sharding step that feeds a context-bounded
    trainer or a RAG index. Chunk boundaries are integer arithmetic on
    the token array (sequence + slice, whole-stage codegen — one scan,
    zero shuffles) and the 28-bit content hash certifies the chunk TEXT
    cross-engine, so the oracle would catch an off-by-one in either
    engine's slicing. Output grows ~linearly with corpus tokens; at
    100 TB this is a generator projection feeding a sink, never the
    driver."""
    toks = ws_tokens(F.col("text"))
    d = (_t(spark, sf_dir, "documents")
         .select("doc_id", toks.alias("ts"))
         .where(F.size("ts") > 0))
    ck = F.slice("ts", F.col("start_tok").cast("int") + 1, _CHUNK)
    return (d.select(
        "doc_id", "ts",
        F.explode(F.sequence(F.lit(0), F.size("ts") - 1,
                             F.lit(_STRIDE))).alias("start_tok"))
        .select("doc_id",
                (F.col("start_tok") / _STRIDE).cast("long")
                .alias("chunk_id"),
                F.col("start_tok").cast("long").alias("start_tok"),
                ck.alias("ck"))
        .select("doc_id", "chunk_id", "start_tok",
                F.size("ck").cast("long").alias("n_tok"),
                stable_hash28(F.concat_ws(" ", "ck")).alias("chunk_h28"))
        .orderBy("doc_id", "chunk_id"))


# ---------------------------------------------------------------------------
# ml02: multinomial Naive Bayes source classifier (count-based training)
# ---------------------------------------------------------------------------

#: micro-nat quantization for log-likelihoods: ln of an exact integer,
#: rounded to an integer number of micro-nats BEFORE summing — so every
#: per-document score is an order-independent BIGINT sum and argmax can
#: never flip on float summation order (the g02/ts06/e12 exact-integer
#: lesson applied to log-space). Cross-engine risk is confined to ln()
#: itself on identical integer inputs landing within one ulp of a
#: 0.5-micro-nat boundary (~1e-9 per distinct count; test-swept).
_QLN = "CAST(ROUND(ln({0}) * 1000000, 0) AS BIGINT)"


def _qln(col):
    return F.round(F.log(col.cast("double")) * 1000000.0, 0).cast("long")


@register("ml02_naive_bayes_source",
          "WITH tok AS (SELECT doc_id, source, "
          f"  {_DUCK_TOKENS} AS ts FROM documents), "
          "nd AS (SELECT doc_id, source, CASE WHEN ts IS NULL THEN 0 "
          "  ELSE len(ts) END AS n_d FROM tok), "
          "tp AS (SELECT doc_id, source, unnest(ts) AS tok FROM tok), "
          "ctl AS (SELECT tok, source AS lab, COUNT(*) AS c "
          "  FROM tp GROUP BY 1, 2), "
          "tl AS (SELECT lab, SUM(c) AS t FROM ctl GROUP BY 1), "
          "v AS (SELECT COUNT(DISTINCT tok) AS vn FROM ctl), "
          "dl AS (SELECT source AS lab, COUNT(*) AS d_l FROM documents "
          "  GROUP BY 1), "
          "lc AS (SELECT dl.lab, "
          + _QLN.format("dl.d_l") + " - "
          + _QLN.format("(SELECT COUNT(*) FROM documents)")
          + " AS prior_q, "
          + _QLN.format(
              "GREATEST(COALESCE(tl.t, 0) + (SELECT vn FROM v), 1)")
          + " AS qtv FROM dl LEFT JOIN tl USING (lab)), "
          "s1 AS (SELECT tp.doc_id, ctl.lab, "
          "  SUM(" + _QLN.format("ctl.c + 1") + ") AS s1 "
          "  FROM tp JOIN ctl ON tp.tok = ctl.tok GROUP BY 1, 2), "
          "grid AS (SELECT nd.doc_id, nd.source, lc.lab, "
          "  lc.prior_q - nd.n_d * lc.qtv + COALESCE(s1.s1, 0) AS score "
          "  FROM nd CROSS JOIN lc LEFT JOIN s1 "
          "  ON s1.doc_id = nd.doc_id AND s1.lab = lc.lab), "
          "pred AS (SELECT source, lab, ROW_NUMBER() OVER ("
          "  PARTITION BY doc_id ORDER BY score DESC, lab) AS rn "
          "  FROM grid) "
          "SELECT source, lab AS pred_source, "
          "CAST(COUNT(*) AS BIGINT) AS n_docs FROM pred WHERE rn = 1 "
          "GROUP BY 1, 2 ORDER BY 1, 2")
def ml02(spark, sf_dir):
    """Multinomial Naive Bayes trained to predict a document's SOURCE
    from its tokens, reported as the source×predicted confusion matrix
    — the count-based mixture-separability audit (are my corpus slices
    distinguishable, and which pairs blur?), and the classical
    quality-classifier trainer that needs no ML library (Manning,
    Raghavan & Schütze, IIR ch. 13, public). ml01 fits a GLM by
    iterated aggregates; ml02's training IS one aggregation pass —
    P(token|source) with add-one smoothing — so unlike ml01 the whole
    train+score pipeline is SQL-expressible and value-hash oracled.

    Determinism: every score is a BIGINT micro-nat sum (``_QLN``), so
    per-document argmax is order-independent and cross-engine exact;
    ties break to the smaller label. Scale shape: token positions
    explode once (checkpointed — 4 consumers, 1 text scan), the
    dictionary join inflates positions by at most the #labels that
    contain the token, and the doc×label grid is a broadcast crossJoin
    against #labels rows. No collect anywhere; the confusion matrix is
    #labels² rows."""
    docs = _t(spark, sf_dir, "documents")
    toks = (docs.select("doc_id", "source",
                        ws_tokens(F.col("text")).alias("ts"))
            .localCheckpoint(eager=False))
    nd = toks.select("doc_id", "source",
                     F.coalesce(F.size("ts"), F.lit(0)).alias("n_d"))
    # round 11 (guide §2.3 "aggregate before you shuffle"): collapse
    # token OCCURRENCES to per-document counts (doc, tok, k) before
    # anything is joined — natural text repeats tokens, so every
    # downstream shuffle (the dictionary join, the per-(doc,label)
    # score aggregate) carries distinct (doc, tok) rows instead of
    # every position. Exact by integer algebra: a doc's k occurrences
    # of tok all contribute the same BIGINT micro-nat term, so
    # Σ_occurrences qln = k·qln (int64 multiply; ≤ 2·10¹⁵ per doc at
    # 10⁴ distinct tokens — 4000× headroom), and ctl's occurrence
    # count re-aggregates as Σk. Oracle unchanged and re-MATCHed.
    tpc = (toks.select("doc_id", "source", F.explode("ts").alias("tok"))
           .groupBy("doc_id", "source", "tok")
           .agg(F.count(F.lit(1)).alias("k"))
           .localCheckpoint(eager=False))
    ctl = (tpc.groupBy("tok", F.col("source").alias("lab"))
           .agg(F.sum("k").alias("c"))
           .localCheckpoint(eager=False))
    tl = ctl.groupBy("lab").agg(F.sum("c").alias("t"))
    v = ctl.agg(F.countDistinct("tok").alias("vn"))
    dl = docs.groupBy(F.col("source").alias("lab")) \
        .agg(F.count(F.lit(1)).alias("d_l"))
    dtot = docs.agg(F.count(F.lit(1)).alias("d"))
    lc = (dl.join(tl, "lab", "left")
          .crossJoin(F.broadcast(v)).crossJoin(F.broadcast(dtot))
          .select("lab",
                  (_qln(F.col("d_l")) - _qln(F.col("d"))).alias("prior_q"),
                  _qln(F.greatest(F.coalesce(F.col("t"), F.lit(0))
                                  + F.col("vn"), F.lit(1))).alias("qtv")))
    # the dictionary (vocab × labels) and the per-(doc, label) score
    # frame both GROW with the corpus, and the checkpoints upstream
    # leave Catalyst without size stats (Scan ExistingRDD) — unpinned,
    # the sf0.1 plan broadcast both (the d17 lesson, same round).
    # The scalar/label frames (v, dtot, lc) stay broadcast: they are
    # 1-row / |labels|-row by construction. shuffle_hash (round 11,
    # guide §3.1): same broadcast-proofing as the old merge pin but
    # without sort-merge's full sort of BOTH corpus-sized sides.
    s1 = (tpc.join(ctl.withColumnRenamed("tok", "_tok")
                   .hint("shuffle_hash"),
                   F.col("tok") == F.col("_tok"))
          .groupBy("doc_id", "lab")
          .agg(F.sum(F.col("k") * _qln(F.col("c") + 1)).alias("s1")))
    grid = (nd.crossJoin(F.broadcast(lc))
            .join(s1.hint("shuffle_hash"), ["doc_id", "lab"], "left")
            .select("doc_id", "source", "lab",
                    (F.col("prior_q") - F.col("n_d") * F.col("qtv")
                     + F.coalesce(F.col("s1"), F.lit(0))).alias("score")))
    # argmax as ONE hash aggregate (round 11): min(struct(-score, lab))
    # picks the max score and breaks ties to the smaller label — the
    # exact row_number()-over-(desc score, lab) semantics — without the
    # window's Sort, and with map-side partial aggregation collapsing
    # the doc×label grid before the doc_id shuffle. score is an exact
    # BIGINT micro-nat sum, so its negation is exact too.
    pred = (grid.groupBy("doc_id")
            .agg(F.first("source").alias("source"),
                 F.min(F.struct((-F.col("score")).alias("ns"),
                                F.col("lab"))).alias("_best")))
    return (pred.groupBy("source",
                         F.col("_best.lab").alias("pred_source"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
            .orderBy("source", "pred_source"))
