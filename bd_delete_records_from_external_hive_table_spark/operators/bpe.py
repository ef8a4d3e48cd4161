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
- pair counting per iteration: ``arrays_zip(slice, slice)`` adjacent
  pairs → explode → freq-weighted partial-agg sum — all JVM codegen;
- top pair: ``TakeOrderedAndProject(1)`` with a total (count DESC,
  pair ASC) order, so ties break deterministically on any partitioning;
- merge application: a Pandas UDF folding each word's symbol array
  (words are short; the per-word loop is the inherently sequential part
  of BPE — Arrow batching keeps it vectorized across words);
- ``localCheckpoint`` per iteration truncates lineage the same way the
  d06 connected-components loop does, keeping the plan constant-size
  across merges.

Determinism: all counts are exact integers and the top-pair rule is
totally ordered, so the learned merge sequence is a pure function of
the corpus — test-asserted equal to a pure-Python reference trainer.
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


def _apply_merge(left: str, right: str):
    """Pandas UDF applying one merge across words (parallel; the
    per-word fold is the inherently sequential part)."""
    merged = left + right

    @F.pandas_udf(ArrayType(StringType()))
    def apply(col: pd.Series) -> pd.Series:
        return col.map(lambda syms: _merge_word(syms, left, right, merged))

    return apply


def train_bpe(docs: DataFrame, text_col: str = "text",
              num_merges: int = 8, min_count: int = 2):
    """Learn ``num_merges`` BPE merges from the corpus. Returns
    ``(merges, vocab_df)`` where merges is a list of
    (rank, left, right, count) and vocab_df carries the final symbol
    arrays. Stops early when the best pair drops under ``min_count``."""
    # The dictionary is tiny relative to the corpus (|vocab| rows);
    # collapse it to a few partitions so each of the num_merges
    # iterations schedules a handful of tasks instead of one per core —
    # per-iteration fixed overhead is what dominates the loop.
    vocab = (word_dictionary(docs, text_col)
             .coalesce(4).localCheckpoint())
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, num_merges + 1):
        top = (_pair_counts(vocab)
               .orderBy(F.desc("n"), "left", "right").limit(1).collect())
        if not top or top[0].n < min_count:
            break
        left, right, n = top[0].left, top[0].right, top[0].n
        merges.append((rank, left, right, int(n)))
        vocab = vocab.withColumn(
            "symbols", _apply_merge(left, right)(F.col("symbols")))
        # checkpoint every other round: lineage stays bounded (two udf
        # layers max) at half the materialization jobs
        if rank % 2 == 0 or rank == num_merges:
            vocab = vocab.localCheckpoint()
    return merges, vocab


def reference_bpe(word_freqs: dict[str, int], num_merges: int = 8,
                  min_count: int = 2):
    """Pure-Python reference trainer (the Sennrich pseudocode) for
    test parity — same tie-break: (count DESC, pair ASC)."""
    vocab = {w: list(w) for w in word_freqs}
    merges = []
    for rank in range(1, num_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in vocab.items():
            f = word_freqs[w]
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        (left, right), n = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < min_count:
            break
        merges.append((rank, left, right, n))
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
    (spark.createDataFrame(
        [(r, a, b, n) for r, a, b, n in merges],
        "rank long, left string, right string, n long")
     .coalesce(1).write.mode(mode).parquet(path))


def load_merges(spark, path: str):
    """Load merges saved by :func:`save_merges`, rank order restored —
    BPE merges MUST apply in training order."""
    rows = spark.read.parquet(path).orderBy("rank").collect()
    return [(r.rank, r.left, r.right, int(r.n)) for r in rows]
