"""hash_split, bigram transitions, token co-occurrence, Q13/Q22 shapes."""

from __future__ import annotations

from pyspark.sql import functions as F

from pasta_pipeline_spark.operators.sampling import hash_split, sample_bucket
from pasta_pipeline_spark.operators.text_analysis import (
    bigram_transitions,
    token_cooccurrence,
)


def test_hash_split_is_stable_and_partitioned(spark):
    df = spark.createDataFrame([(i,) for i in range(2000)], "doc_id long")
    out = hash_split(df, "doc_id")
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    # ~80/10/10 with md5 uniformity; generous tolerance on 2000 ids
    assert counts["train"] > 1400
    assert counts["val"] + counts["test"] < 600
    # stability: same assignment on a second run and under repartition
    again = hash_split(df.repartition(7), "doc_id")
    assert out.exceptAll(again).count() == 0 and again.exceptAll(out).count() == 0


def test_hash_split_matches_bucket_thresholds(spark):
    df = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    rows = (
        hash_split(df, "doc_id")
        .withColumn("b", sample_bucket("doc_id"))
        .collect()
    )
    for r in rows:
        expect = "train" if r["b"] < 8000 else ("val" if r["b"] < 9000 else "test")
        assert r["split"] == expect


def test_bigram_transitions_counts_and_probs(spark):
    docs = spark.createDataFrame(
        [(1, "a b a b c"), (2, "a b x"), (3, "solo")], "doc_id long, text string"
    )
    out = {(r["w1"], r["w2"]): r for r in bigram_transitions(docs, top_n=50).collect()}
    # bigrams: doc1: (a,b),(b,a),(a,b),(b,c); doc2: (a,b),(b,x); doc3 dropped
    assert out[("a", "b")]["n"] == 3
    assert out[("b", "a")]["n"] == 1
    assert out[("a", "b")]["n_first"] == 3  # 'a' opens 3 bigrams
    assert out[("b", "a")]["n_first"] == 3  # 'b' opens 3 bigrams
    assert out[("a", "b")]["prob_fp"] == 1_000_000
    assert out[("b", "c")]["prob_fp"] == 333_333  # 1*1e6 div 3, truncated


def test_token_cooccurrence_pairs(spark):
    docs = spark.createDataFrame(
        [(1, "x y z"), (2, "x y"), (3, "x q")], "doc_id long, text string"
    )
    out = {(r["t1"], r["t2"]): r["n_docs"] for r in token_cooccurrence(docs, vocab_n=3).collect()}
    # vocab by count: x(3), y(2), then tie q/z broken by token asc -> q
    assert out[("x", "y")] == 2
    assert out[("q", "x")] == 1
    assert ("x", "z") not in out  # z not in top-3 vocab
    # pairs are ordered t1 < t2 and never self-paired
    assert all(t1 < t2 for (t1, t2) in out)


def test_token_cooccurrence_bounded_per_doc(spark):
    # one doc with every vocab token: exactly C(n,2) pairs, each count 1
    docs = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    out = token_cooccurrence(docs, vocab_n=4).collect()
    assert len(out) == 6
    assert all(r["n_docs"] == 1 for r in out)
