"""BPE tokenizer training at corpus scale.

The classic byte-pair-encoding trainer (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units") learns merges
from a WEIGHTED WORD DICTIONARY, not the raw corpus: the corpus is
scanned once to count words, and every merge iteration then runs on the
dictionary (|vocab| rows) — at 100 TB that is the difference between
iterating over ~10⁷ dictionary rows and re-scanning ~10¹² corpus tokens
per merge.

Spark mapping:
- word counting: explode + partial-agged groupBy (the one corpus scan);
- pair counting per round: ``arrays_zip(slice, slice)`` adjacent
  pairs → explode → freq-weighted partial-agg sum — all JVM codegen;
- candidate pairs: ``TakeOrderedAndProject(4*batch)`` with a total
  (count DESC, pair ASC) order, so ties break deterministically on any
  partitioning;
- merge application: a Pandas UDF folding each word's symbol array
  through the round's whole batch (words are short; the per-word loop
  is the inherently sequential part of BPE — Arrow batching keeps it
  vectorized across words);
- ``localCheckpoint`` per round truncates lineage the same way the
  d06 connected-components loop does, keeping the plan constant-size
  across rounds.

BATCHED merges — the scale move that decouples Spark-job count from
merge count: per round, the top-``batch`` FULLY-DISJOINT candidate
pairs (greedy scan of the (count DESC, pair ASC)-ordered top
``4*batch``; disjoint in both input symbols AND merged outputs — see
``_select_disjoint``) are accepted together and applied in ONE
single-pass rewrite. Full disjointness means no batch member can
consume or create a symbol another member touches, so the batch
result equals any sequential application order, and each pair's
pre-round count is still its exact corpus count. A real 32k–100k-merge tokenizer thus runs
O(merges/batch) Spark rounds instead of one job pair per merge;
``batch=1`` degenerates to the classic strictly-sequential trainer.
This batch rule is itself standard practice for distributed BPE (it is
how the Sennrich formulation parallelizes); the learned table differs
from strictly-sequential BPE only in that pairs accepted later in a
round don't see counts updated by earlier ones.

Determinism: all counts are exact integers and the candidate rule is
totally ordered, so the learned merge sequence is a pure function of
(corpus, num_merges, min_count, batch) — test-asserted equal to a
pure-Python reference trainer at 64 merges.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

__all__ = ["word_dictionary", "train_bpe", "reference_bpe",
           "encode_with_merges", "save_merges", "load_merges"]


def word_dictionary(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One corpus scan → (word, freq) dictionary with the word split
    into its character symbols. Every BPE iteration after this runs on
    the dictionary only."""
    words = (docs.select(F.explode(F.split(F.lower(text_col), "[^a-z]+"))
                         .alias("word"))
             .where(F.col("word") != "")
             .groupBy("word").agg(F.count(F.lit(1)).alias("freq")))
    return words.withColumn("symbols", F.split("word", ""))


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Freq-weighted adjacent-pair counts over the symbol arrays —
    arrays_zip of the array against its own shift, exploded, summed."""
    n = F.size("symbols")
    pairs = F.arrays_zip(
        F.slice("symbols", 1, F.greatest(n - 1, F.lit(0))).alias("a"),
        F.expr("slice(symbols, 2, greatest(size(symbols) - 1, 0))")
        .alias("b"))
    return (vocab.where(n >= 2)
            .select("freq", F.explode(pairs).alias("p"))
            .groupBy(F.col("p.a").alias("left"), F.col("p.b").alias("right"))
            .agg(F.sum("freq").alias("n")))


def _merge_word(symbols, left: str, right: str, merged: str):
    """Fold every adjacent (left, right) into the merged symbol — the
    sequential inner step of BPE, shared by the training and encoding
    UDFs (reference_bpe keeps its own copy on purpose: an independent
    implementation is what makes the parity test meaningful)."""
    out, i, m = [], 0, len(symbols)
    while i < m:
        if i + 1 < m and symbols[i] == left and symbols[i + 1] == right:
            out.append(merged)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return out


def _select_disjoint(cands, k: int):
    """Greedy scan of (count DESC, pair ASC)-ordered candidates:
    accept a pair only when neither its symbols NOR its merged output
    collides with any symbol or output already accepted this round.
    Full disjointness (inputs AND outputs) makes the batch truly
    commutative — no merge can consume or create a symbol another
    batch member consumes — so one left-to-right pass with a pair
    table applies the whole batch, and each accepted pair's pre-round
    count is its exact corpus count. (Input-only disjointness is NOT
    enough: accepting (a,b) and (ab,c) together would let the first
    merge mint new 'ab' symbols the second would then consume,
    reintroducing order dependence.) The first candidate is always
    accepted, so every round makes progress."""
    accepted, used = [], set()
    for left, right, n in cands:
        merged = left + right
        if left in used or right in used or merged in used:
            continue
        accepted.append((left, right, n))
        used.update((left, right, merged))
        if len(accepted) >= k:
            break
    return accepted


def _apply_merges(pairs):
    """Pandas UDF applying one fully-disjoint merge BATCH across words
    in a SINGLE left-to-right pass per word (parallel across words;
    the per-word fold is the inherently sequential part). Correct
    because _select_disjoint guarantees matches of different pairs
    can never overlap or feed each other; within-pair runs ('aaa' for
    pair (a,a)) resolve greedy-left exactly like the one-pair fold."""
    table = {(left, right): left + right for left, right, _ in pairs}

    @F.pandas_udf(ArrayType(StringType()))
    def apply(col: pd.Series) -> pd.Series:
        def one(syms):
            out, i, m = [], 0, len(syms)
            while i < m:
                if i + 1 < m and (syms[i], syms[i + 1]) in table:
                    out.append(table[(syms[i], syms[i + 1])])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            return out
        return col.map(one)

    return apply


def train_bpe(docs: DataFrame, text_col: str = "text",
              num_merges: int = 8, min_count: int = 2,
              batch: int = 16):
    """Learn ``num_merges`` BPE merges from the corpus in
    ``O(num_merges / batch)`` Spark rounds (see module docstring for
    the symbol-disjoint batch rule). Returns ``(merges, vocab_df)``
    where merges is a list of (rank, left, right, count) and vocab_df
    carries the final symbol arrays. Stops early when no candidate
    pair reaches ``min_count``. ``batch=1`` is the classic
    strictly-sequential trainer.

    Reproducibility contract: the learned table is a pure function of
    (corpus, num_merges, min_count, batch) — changing ``batch``
    changes the table, so a tokenizer trained under one batch setting
    must be re-used via :func:`save_merges`/:func:`load_merges`
    (encode from the artifact), never re-trained under another
    setting, when token boundaries must stay bit-stable."""
    # The dictionary is tiny relative to the corpus (|vocab| rows);
    # collapse it to a few partitions so each round schedules a
    # handful of tasks instead of one per core — per-round fixed
    # overhead is what dominates the loop.
    vocab = (word_dictionary(docs, text_col)
             .coalesce(4).localCheckpoint())
    merges: list[tuple[int, str, str, int]] = []
    while len(merges) < num_merges:
        k = min(batch, num_merges - len(merges))
        cand = (_pair_counts(vocab)
                .where(F.col("n") >= min_count)
                .orderBy(F.desc("n"), "left", "right")
                .limit(4 * batch).collect())
        accepted = _select_disjoint(
            [(r.left, r.right, int(r.n)) for r in cand], k)
        if not accepted:
            break
        for left, right, n in accepted:
            merges.append((len(merges) + 1, left, right, n))
        vocab = (vocab.withColumn(
            "symbols", _apply_merges(accepted)(F.col("symbols")))
            .localCheckpoint())
    return merges, vocab


def reference_bpe(word_freqs: dict[str, int], num_merges: int = 8,
                  min_count: int = 2, batch: int = 16):
    """Pure-Python reference trainer for test parity — the Sennrich
    pseudocode extended with the SAME batch rule as :func:`train_bpe`
    (top ``4*batch`` candidates by (count DESC, pair ASC); greedy
    symbol-disjoint acceptance of up to ``batch`` per round),
    implemented independently so the parity test is meaningful.
    ``batch=1`` is the classic strictly-sequential trainer."""
    vocab = {w: list(w) for w in word_freqs}
    merges: list[tuple[int, str, str, int]] = []
    while len(merges) < num_merges:
        counts: dict[tuple[str, str], int] = {}
        for w, syms in vocab.items():
            f = word_freqs[w]
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + f
        cand = sorted(counts.items(),
                      key=lambda kv: (-kv[1], kv[0]))[:4 * batch]
        accepted: list[tuple[str, str, int]] = []
        used: set[str] = set()
        k = min(batch, num_merges - len(merges))
        for (left, right), n in cand:
            if n < min_count:
                break  # sorted by count desc: nothing below qualifies
            if left in used or right in used or (left + right) in used:
                continue
            accepted.append((left, right, n))
            used.update((left, right, left + right))
            if len(accepted) >= k:
                break
        if not accepted:
            break
        for left, right, n in accepted:
            merges.append((len(merges) + 1, left, right, n))
            merged = left + right
            for w, syms in vocab.items():
                out, i, m = [], 0, len(syms)
                while i < m:
                    if (i + 1 < m and syms[i] == left
                            and syms[i + 1] == right):
                        out.append(merged)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                vocab[w] = out
    return merges, vocab


def encode_with_merges(words: DataFrame, merges) -> DataFrame:
    """Apply a learned merge sequence to a word dictionary: adds
    ``n_tokens`` (subword count per word). Encoding runs on DISTINCT
    words — the corpus itself is never re-tokenized; callers join the
    encoded dictionary back to exploded text on the word key."""
    merge_pairs = [(left, right) for _, left, right, _ in merges]

    @F.pandas_udf("int")
    def n_tokens(col: pd.Series) -> pd.Series:
        def one(word):
            syms = list(word)
            for left, right in merge_pairs:
                syms = _merge_word(syms, left, right, left + right)
            return len(syms)
        return col.map(one)

    return words.withColumn("n_tokens", n_tokens(F.col("word")))


def save_merges(spark, merges, path: str, mode: str = "error") -> None:
    """Persist a learned merge table as parquet — the tokenizer
    artifact: encode jobs load the merges instead of re-training, so
    token boundaries stay identical across the corpus's lifetime."""
    from ..sources.tables import local_frame
    (local_frame(
        spark, [(r, a, b, n) for r, a, b, n in merges],
        "rank long, left string, right string, n long")
     .coalesce(1).write.mode(mode).parquet(path))


def load_merges(spark, path: str):
    """Load merges saved by :func:`save_merges`, rank order restored —
    BPE merges MUST apply in training order."""
    rows = spark.read.parquet(path).orderBy("rank").collect()
    return [(r.rank, r.left, r.right, int(r.n)) for r in rows]
