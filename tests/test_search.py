"""Trigram substring-search tests."""

from __future__ import annotations

from pasta_pipeline_spark.operators.search import (
    char_ngrams,
    substring_search,
    trigram_index,
)


def test_search_matches_plain_scan(spark):
    from pyspark.sql import functions as F

    rows = [
        (1, "the quick brown fox"),
        (2, "quick silver lining"),
        (3, "no match here"),
        (4, "brown and quick"),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(r["doc_id"] for r in substring_search(df, "quick").collect())
    want = sorted(
        r["doc_id"] for r in df.filter(F.col("text").contains("quick")).collect()
    )
    assert got == want == [1, 2, 4]


def test_search_short_pattern_fallback(spark):
    df = spark.createDataFrame([(1, "ab cd"), (2, "xyz")], "doc_id long, text string")
    assert sorted(r["doc_id"] for r in substring_search(df, "ab").collect()) == [1]


def test_trigram_verification_kills_false_positives(spark):
    # doc 2 has all trigrams of "abcdef" but not the substring itself
    df = spark.createDataFrame(
        [(1, "xx abcdef yy"), (2, "abcd + bcde + cdef scrambled")],
        "doc_id long, text string",
    )
    got = [r["doc_id"] for r in substring_search(df, "abcdef").collect()]
    assert got == [1]


def test_char_ngrams_distinct(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([("aaaa",)], "t string")
    assert df.select(char_ngrams("t").alias("g")).collect()[0]["g"] == ["aaa"]
    assert df.select(F.size(char_ngrams(F.lit("ab"))).alias("n")).collect()[0]["n"] == 0


def test_prebuilt_index_reuse(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta gamma")], "doc_id long, text string"
    )
    idx = trigram_index(df)
    got = sorted(
        r["doc_id"] for r in substring_search(df, "beta", index=idx).collect()
    )
    assert got == [1, 2]
