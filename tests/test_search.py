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


class TestBm25:
    def test_ranking_favors_rare_term_and_tf(self, spark):
        rows = [
            (1, "spark join spark join spark"),      # heavy on both terms
            (2, "spark filler words here again"),     # one spark
            (3, "join only in this doc"),             # one join
            (4, "nothing relevant at all here"),      # no hits
            (5, "rareword spark"),                    # short doc, one spark
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        from pasta_pipeline_spark.operators.search import bm25_topk

        out = bm25_topk(df, ["spark", "join"], k=10).collect()
        ids = [r["doc_id"] for r in out]
        assert 4 not in ids  # no-hit docs never appear
        assert ids[0] == 1   # both terms, highest tf
        assert all(
            a["score_fp"] >= b["score_fp"] for a, b in zip(out, out[1:])
        )
        by_id = {r["doc_id"]: r for r in out}
        assert by_id[1]["n_hit_terms"] == 2
        assert by_id[5]["n_hit_terms"] == 1
        # shorter doc with same tf outscores the longer one (length norm)
        assert by_id[5]["score_fp"] > by_id[2]["score_fp"]

    def test_case_insensitive_query(self, spark):
        df = spark.createDataFrame(
            [(1, "Spark SPARK spark"), (2, "other text")],
            "doc_id long, text string",
        )
        from pasta_pipeline_spark.operators.search import bm25_topk

        out = bm25_topk(df, ["SPARK"], k=5).collect()
        assert [r["doc_id"] for r in out] == [1]


class TestPhraseSearch:
    def _run(self, spark, rows, phrase):
        df = spark.createDataFrame(rows, "doc_id long, text string")
        from pasta_pipeline_spark.operators.search import phrase_search

        return {r["doc_id"]: r for r in phrase_search(df, phrase).collect()}

    def test_consecutive_in_order_only(self, spark):
        rows = [
            (1, "big data window data big"),   # no "window data"? yes: pos 3-4
            (2, "data window"),                # reversed — no match
            (3, "window big data"),            # gap — no match
            (4, "window data window data"),    # two occurrences
        ]
        out = self._run(spark, rows, ["window", "data"])
        assert set(out) == {1, 4}
        assert out[1]["n_occurrences"] == 1 and out[1]["first_pos"] == 3
        assert out[4]["n_occurrences"] == 2 and out[4]["first_pos"] == 1

    def test_duplicate_term_phrase(self, spark):
        rows = [
            (1, "buffalo buffalo buffalo"),  # "buffalo buffalo" at 1 and 2
            (2, "buffalo alone"),
        ]
        out = self._run(spark, rows, ["buffalo", "buffalo"])
        assert set(out) == {1}
        assert out[1]["n_occurrences"] == 2 and out[1]["first_pos"] == 1

    def test_three_term_phrase_and_case(self, spark):
        rows = [(1, "The Quick Brown fox"), (2, "quick the brown")]
        out = self._run(spark, rows, ["the", "QUICK", "brown"])
        assert set(out) == {1}
        assert out[1]["first_pos"] == 1


class TestKwicSnippets:
    def test_snippet_window_and_clamp(self, spark):
        rows = [
            (1, "a b c window data d e f"),
            (2, "window data x y z q r s"),  # match at position 1 — clamp
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        from pasta_pipeline_spark.operators.search import (
            kwic_snippets,
            phrase_search,
        )

        hits = phrase_search(docs, ["window", "data"])
        out = {r["doc_id"]: r for r in kwic_snippets(docs, hits).collect()}
        # context window is [first_pos-3, first_pos+3] around the
        # phrase START: tokens 1..7
        assert out[1]["snippet"] == "a b c window data d e"
        # doc 2: start clamps to 1, window extends to first_pos+3
        assert out[2]["first_pos"] == 1
        assert out[2]["snippet"] == "window data x y"
