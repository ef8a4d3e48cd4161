"""User-defined function surface (SURVEY §2l — the reference registers no
UDFs; this is the engine's extension surface).

The rule, demonstrated here: **builtins first**. ``sentence_split`` — the
real operator — is pure JVM (split + posexplode, whole-stage codegen).
``SentenceSplitter`` is the same logic as a Python UDTF, kept as the
template for logic that genuinely cannot be expressed with builtins; the
test suite asserts both produce identical rows. Arrow-optimized
(``useArrow=True``) scalar UDFs are the middle ground when a per-row
Python function is unavoidable but the logic is scalar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["SENT_RE", "sentence_split", "make_sentence_splitter_udtf"]

#: Sentence boundary: split on '.', '!', '?' followed by whitespace.
SENT_RE = r"(?<=[.!?])\s+"


def sentence_split(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """(id, sent_idx, sentence, n_tokens) — one row per sentence with at
    least one non-empty token. All JVM expressions: split → posexplode →
    filter. Tokens are counted as NON-EMPTY split parts (a trim-based
    count disagrees between surfaces on exotic whitespace: F.trim strips
    only spaces, Python strip() strips all whitespace)."""
    parts = F.split(F.col(text_col), SENT_RE)
    toks = F.filter(F.split(F.col("sentence"), r"\s+"),
                    lambda x: x != "")
    return (df.select(F.col(id_col),
                      F.posexplode(parts).alias("sent_idx", "sentence"))
            .withColumn("n_tokens", F.size(toks).cast("long"))
            .where(F.col("n_tokens") > 0))


def make_sentence_splitter_udtf():
    """Python UDTF equivalent (lazy import so module import never requires
    a live session). Register with::

        spark.udtf.register("split_sentences", make_sentence_splitter_udtf())
        spark.sql("SELECT s.* FROM docs, LATERAL split_sentences(doc_id, text) s")
    """
    import re

    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id: long, sent_idx: int, sentence: string, "
                     "n_tokens: long")
    class SentenceSplitter:
        def eval(self, doc_id: int, text: str):
            if text is None:
                return
            idx = 0
            for raw in re.split(SENT_RE, text):
                # same token rule as the JVM path: non-empty split parts
                toks = [t for t in re.split(r"\s+", raw) if t]
                if toks:
                    yield doc_id, idx, raw, len(toks)
                idx += 1

    return SentenceSplitter
