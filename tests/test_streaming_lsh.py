"""Incremental MinHash-LSH dedup index tests (batch step + streaming e2e)."""

from __future__ import annotations

import json
import os

from pasta_pipeline_spark.sources.tables import TableStore
from pasta_pipeline_spark.streaming.dedup import incremental_lsh_dedup, lsh_index_batch

TEXT_A = "the quick brown fox jumps over the lazy dog and then runs far away home"
TEXT_B = "completely different content about spark shuffles and partition pruning strategies"


def test_lsh_index_batch_detects_cross_batch_dups(spark, tmp_table_dir):
    store = TableStore(spark, f"{tmp_table_dir}/lshidx")
    b1 = spark.createDataFrame(
        [(1, TEXT_A), (2, TEXT_B)], "doc_id long, text string"
    )
    p1 = lsh_index_batch(b1, store).collect()
    assert p1 == []  # no dups within batch 1

    # doc 100 duplicates doc 1 (exact text), doc 101 is novel
    b2 = spark.createDataFrame(
        [(100, TEXT_A), (101, "yet another unrelated set of words entirely")],
        "doc_id long, text string",
    )
    p2 = {(r["doc_a"], r["doc_b"]): r["agree_fp"] for r in lsh_index_batch(b2, store).collect()}
    assert (1, 100) in p2
    assert p2[(1, 100)] == 10000  # identical text -> all hashes agree
    assert all(a == 1 and b == 100 for (a, b) in p2)

    # index now holds all four signatures
    assert store.read().count() == 4


def test_lsh_index_batch_redelivery_is_noop_on_index(spark, tmp_table_dir):
    store = TableStore(spark, f"{tmp_table_dir}/lshr")
    b = spark.createDataFrame([(1, TEXT_A), (2, TEXT_B)], "doc_id long, text string")
    lsh_index_batch(b, store)
    n1 = store.read().count()
    pairs = lsh_index_batch(b, store).collect()  # replay of the same batch
    assert store.read().count() == n1  # merge keyed on doc: no growth
    # a doc never pairs with itself; replay emits nothing new here
    assert pairs == []


def test_incremental_lsh_dedup_streaming_e2e(spark, tmp_table_dir):
    src = f"{tmp_table_dir}/src"
    os.makedirs(src)
    with open(f"{src}/b1.json", "w", encoding="utf-8") as f:
        f.write(json.dumps({"doc_id": 1, "text": TEXT_A}) + "\n")
        f.write(json.dumps({"doc_id": 2, "text": TEXT_B}) + "\n")

    store = TableStore(spark, f"{tmp_table_dir}/idx")
    pairs_dir = f"{tmp_table_dir}/pairs"
    stream = spark.readStream.schema("doc_id long, text string").json(src)
    q = incremental_lsh_dedup(
        stream, store, pairs_dir, checkpoint_dir=f"{tmp_table_dir}/ckpt"
    )
    q.awaitTermination(120)
    assert store.read().count() == 2

    # second file arrives: duplicate of doc 1 across the restart
    with open(f"{src}/b2.json", "w", encoding="utf-8") as f:
        f.write(json.dumps({"doc_id": 50, "text": TEXT_A}) + "\n")
    stream2 = spark.readStream.schema("doc_id long, text string").json(src)
    q2 = incremental_lsh_dedup(
        stream2, store, pairs_dir, checkpoint_dir=f"{tmp_table_dir}/ckpt"
    )
    q2.awaitTermination(120)

    assert store.read().count() == 3
    got = {(r["doc_a"], r["doc_b"]) for r in spark.read.parquet(pairs_dir).collect()}
    assert (1, 50) in got
