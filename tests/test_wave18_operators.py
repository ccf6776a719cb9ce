"""Wave-18 operator unit tests: BPE merge learning, DiD."""

from __future__ import annotations

import pytest


def test_bpe_learns_textbook_merges(spark):
    from pasta_pipeline_spark.operators.bpe import (
        bpe_learn_merges,
        word_freq_frame,
    )

    # classic toy corpus: "low" x5, "lower" x2, "newest" x6, "widest" x3
    text = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = [tuple(r) for r in bpe_learn_merges(word_freq_frame(df), k=3).collect()]
    # round 1: (e,s) count 9; round 2: (es,t) 9; round 3: (l,o) 7
    assert out[0] == (1, "e", "s", "es", 9)
    assert out[1] == (2, "es", "t", "est", 9)
    assert out[2] == (3, "l", "o", "lo", 7)


def test_bpe_merge_is_greedy_left_to_right(spark):
    from pasta_pipeline_spark.operators.bpe import bpe_learn_merges

    # word 'aaaaa' x 1: pair (a,a) appears 4 times (adjacent count);
    # after merging greedy-LTR the word becomes [aa, aa, a]
    words = spark.createDataFrame(
        [("aaaaa", 1, list("aaaaa"))], "word string, cnt long, toks array<string>"
    )
    out = bpe_learn_merges(words, k=2).collect()
    assert (out[0]["a"], out[0]["b"], out[0]["pair_count"]) == ("a", "a", 4)
    # round 2 counts pairs on the REWRITTEN tokens [aa, aa, a]:
    # (aa,aa) x1 and (aa,a) x1 -> tie broken pair-asc -> (aa, a)
    assert (out[1]["a"], out[1]["b"], out[1]["pair_count"]) == ("aa", "a", 1)


def test_bpe_single_char_words_excluded(spark):
    from pasta_pipeline_spark.operators.bpe import (
        bpe_learn_merges,
        word_freq_frame,
    )

    df = spark.createDataFrame(
        [(1, "a a a ab")], "doc_id long, text string"
    )
    out = bpe_learn_merges(word_freq_frame(df), k=1).collect()
    # only 'ab' has an adjacent pair; the single-char 'a' words must
    # not fabricate pairs through a descending sequence()
    assert len(out) == 1
    assert (out[0]["a"], out[0]["b"], out[0]["pair_count"]) == ("a", "b", 1)


def test_bpe_rejects_bad_k(spark):
    from pasta_pipeline_spark.operators.bpe import bpe_learn_merges

    words = spark.createDataFrame(
        [("ab", 1, ["a", "b"])], "word string, cnt long, toks array<string>"
    )
    with pytest.raises(ValueError):
        bpe_learn_merges(words, k=0)


def test_did_recovers_injected_effect(spark):
    import datetime as dt

    from pasta_pipeline_spark.operators.stat_tests import did_report
    from pasta_pipeline_spark.operators.sampling import sample_bucket  # noqa: F401

    # construct: everyone has baseline 10 pre; post adds +2 secular
    # drift for all, plus +5 treatment effect for arm-1 users.
    # DiD must recover ~5 regardless of the drift.
    import pyspark.sql.functions as F

    users = list(range(1, 201))
    spark_df = spark.createDataFrame([(u,) for u in users], "user_id long")
    arms = {
        r["user_id"]: r["arm"]
        for r in spark_df.select(
            "user_id",
            sample_bucket(F.col("user_id"), 2).alias("arm"),
        ).collect()
    }
    rows = []
    eid = 0
    for u in users:
        for day, post in ((5, 0), (25, 1)):
            eid += 1
            val = 10.0 + (2.0 if post else 0.0) + (
                5.0 if post and arms[u] == 1 else 0.0
            )
            rows.append((eid, dt.datetime(2024, 1, day, 9, 0, 0), u, "view", val))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    r = did_report(df).collect()[0]
    # value bridge scale 100, report scale 1e4 -> effect 5.0 == 5000000
    assert r["did_sc"] == 5 * 100 * 10000
    # zero within-cell variance -> se 0 -> z NULL (fail closed)
    assert r["se_sc"] == 0 and r["z_sc"] is None


def test_did_empty_cell_fails_closed(spark):
    import datetime as dt

    from pasta_pipeline_spark.operators.stat_tests import did_report

    # all events pre-boundary: post cells empty -> NULL statistics
    rows = [
        (i, dt.datetime(2024, 1, 2, 9, 0, 0), i, "view", 1.0)
        for i in range(1, 30)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    r = did_report(df).collect()[0]
    assert r["n_treat_post"] == 0 and r["n_ctrl_post"] == 0
    assert r["did_sc"] is None and r["z_sc"] is None
