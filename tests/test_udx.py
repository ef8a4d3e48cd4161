"""UDF/UDTF extension surface: builtin sentence_split vs the Python UDTF
must agree row-for-row; Arrow scalar UDF sanity."""

from __future__ import annotations

from pyspark.sql import functions as F

from bd_delete_records_from_external_hive_table_spark.functions.udx import (
    make_sentence_splitter_udtf,
    sentence_split,
)


def _corpus(spark):
    return spark.createDataFrame(
        [(1, "First sentence. Second one! Third? Trailing"),
         (2, "No punctuation at all"),
         (3, "Multiple   spaces.  After dot."),
         (4, "")],
        "doc_id long, text string")


def test_sentence_split_builtin(spark):
    rows = {(r.doc_id, r.sent_idx): (r.sentence, r.n_tokens)
            for r in sentence_split(_corpus(spark)).collect()}
    assert rows[(1, 0)] == ("First sentence.", 2)
    assert rows[(1, 1)] == ("Second one!", 2)
    assert rows[(1, 2)] == ("Third?", 1)
    assert rows[(1, 3)] == ("Trailing", 1)
    assert rows[(2, 0)] == ("No punctuation at all", 4)
    assert (4, 0) not in rows  # empty doc produces no rows


def test_udtf_agrees_with_builtin(spark):
    docs = _corpus(spark)
    spark.udtf.register("split_sentences", make_sentence_splitter_udtf())
    docs.createOrReplaceTempView("udx_docs")
    via_udtf = spark.sql(
        "SELECT s.* FROM udx_docs, "
        "LATERAL split_sentences(doc_id, text) s").collect()
    via_builtin = sentence_split(docs).collect()
    key = lambda r: (r.doc_id, r.sent_idx, r.sentence, r.n_tokens)
    assert sorted(map(key, via_udtf)) == sorted(map(key, via_builtin))


def test_arrow_scalar_udf(spark):
    """Arrow-optimized scalar UDF — the middle ground when per-row Python
    is unavoidable."""
    @F.udf("int", useArrow=True)
    def vowels(s: str) -> int:
        return sum(c in "aeiou" for c in (s or ""))

    got = {r.doc_id: r.v for r in
           _corpus(spark).select("doc_id",
                                 vowels("text").alias("v")).collect()}
    assert got[1] == sum(c in "aeiou"
                         for c in "First sentence. Second one! Third? Trailing")
    assert got[4] == 0
