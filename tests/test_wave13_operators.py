"""Wave-13 operator unit tests: ensemble scoring, quality-aware
survivorship, source dedup funnel."""

from __future__ import annotations

from pyspark.sql import functions as F

from pasta_pipeline_spark.operators.ensemble import (
    W_CHARS,
    W_MEANLEN,
    W_PUNCT,
    W_STOP,
    quality_dedup_survivors,
    quality_ensemble_deciles,
    quality_score,
    source_dedup_funnel,
)


def test_quality_score_components(spark):
    # "the cat runs." : 13 chars, tokens [the, cat, runs.] mean len
    # floor(11*1e4/3)=36666, stop hits {the}=1, punct runs 1
    df = spark.createDataFrame([(1, "the cat runs.")], "doc_id long, text string")
    got = df.select(quality_score("text").alias("s")).collect()[0]["s"]
    assert got == 13 * W_CHARS + 1 * W_STOP + 36666 * W_MEANLEN + 1 * W_PUNCT
    # empty doc: only the zero-guard path
    empty = spark.createDataFrame([(1, "")], "doc_id long, text string")
    assert empty.select(quality_score("text").alias("s")).collect()[0]["s"] == 0


def test_ensemble_deciles_equal_depth(spark):
    rows = [(i, ("word " * (i + 1)).strip()) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = quality_ensemble_deciles(df).collect()
    assert [r["decile"] for r in out] == list(range(1, 11))
    assert all(r["n_docs"] == 4 for r in out)
    # monotone: higher deciles hold higher scores
    mins = [r["score_min"] for r in out]
    maxs = [r["score_max"] for r in out]
    assert mins == sorted(mins) and maxs == sorted(maxs)
    assert all(a <= b for a, b in zip(mins, maxs))


def test_quality_survivors_elect_highest_score(spark):
    lede = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, lede + " short tail."),
        (2, lede + " a much longer higher quality body. the the it is for that."),
        (3, "completely different text with no shared lede"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = quality_dedup_survivors(df).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_members"] == 2
    assert r["survivor_id"] == 2  # longer, stopword-rich body scores higher
    assert r["runner_up_id"] == 1
    # determinism: exact ties elect the smaller id
    tie = spark.createDataFrame(
        [(5, lede + " same body."), (4, lede + " same body.")],
        "doc_id long, text string",
    )
    t = quality_dedup_survivors(tie).collect()[0]
    assert t["survivor_id"] == 4 and t["runner_up_id"] == 5


def test_source_funnel_charges_losing_source(spark):
    rows = [
        (1, "unique text one", "feed_a"),
        (2, "Copied   Article", "feed_a"),   # normalized twin of 3
        (3, "copied article", "feed_b"),     # exact-distinct, norm-dup, loses (id 3 > 2)
        (4, "copied article", "feed_b"),     # exact dup of 3, loses exact rung too
        (5, "unique text two", "feed_b"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r["source"]: r for r in source_dedup_funnel(df).collect()}
    a, b = got["feed_a"], got["feed_b"]
    assert a["n_raw"] == 2 and a["n_exact"] == 2 and a["n_norm"] == 2
    # feed_b: 3 raw; exact rung keeps 3 (min id of the 3/4 pair) and 5;
    # norm rung loses 3 to feed_a's 2 -> only 5 survives
    assert b["n_raw"] == 3 and b["n_exact"] == 2 and b["n_norm"] == 1
    assert b["norm_share_sc"] == 333_333


def test_funnel_zero_survivor_source_keeps_row(spark):
    rows = [
        (1, "same story", "feed_a"),
        (2, "same story", "feed_b"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r["source"]: r for r in source_dedup_funnel(df).collect()}
    assert got["feed_b"]["n_exact"] == 0 and got["feed_b"]["n_norm"] == 0
    assert got["feed_b"]["norm_share_sc"] == 0
    assert got["feed_a"]["n_exact"] == 1
