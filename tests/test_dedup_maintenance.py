"""W1/W2 dedup direction + exemption, anti-join semantics, and the
maintenance composite (SURVEY.md §5.2/§5.3)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from pasta_pipeline_spark.operators.antijoin import null_out_orphans, select_unprocessed_links
from pasta_pipeline_spark.operators.dedup import dedup_content, keep_first, keep_latest

T1, T2, T3 = datetime(2024, 1, 1), datetime(2024, 2, 1), datetime(2024, 3, 1)


def test_keep_latest_direction(spark):
    df = spark.createDataFrame(
        [(1, "a", T1), (1, "b", T2), (2, "c", T1)], "k long, v string, ts timestamp"
    )
    got = sorted((r["k"], r["v"]) for r in keep_latest(df, "k", "ts").collect())
    assert got == [(1, "b"), (2, "c")]


def test_keep_first_direction_and_tiebreak(spark):
    df = spark.createDataFrame(
        [(1, "a", T1), (1, "b", T1), (1, "c", T2)], "k long, v string, ts timestamp"
    )
    # tie on ts resolves by the tiebreak column ascending — deterministic
    got = keep_first(df, "k", "ts", tiebreak="v").collect()
    assert [(r["k"], r["v"]) for r in got] == [(1, "a")]


def test_content_dedup_exempts_null_and_empty_hash(spark):
    """duplicate_remover.py:82-83 — hashless rows all survive."""
    df = spark.createDataFrame(
        [
            ("u1", "h", T1),
            ("u2", "h", T2),      # dup of u1, newer → dropped
            ("u3", None, T1),
            ("u4", None, T2),     # both null-hash rows survive
            ("u5", "", T1),
            ("u6", "", T2),       # both empty-hash rows survive
        ],
        "url string, content_hash string, processed_at timestamp",
    )
    got = sorted(r["url"] for r in dedup_content(df).collect())
    assert got == ["u1", "u3", "u4", "u5", "u6"]


def test_select_unprocessed_links_j1(spark):
    """J1: distinct + success-filter + anti-join + clean + validate +
    limit (telegraph_processor.py:81-91)."""
    messages = spark.createDataFrame(
        [
            (1, "https://telegra.ph/A"),
            (2, "https://telegra.ph/A"),          # duplicate → distinct
            (3, "{https://telegra.ph/B}"),        # braces cleaned
            (4, "https://telegra.ph/C"),          # already crawled OK
            (5, "https://telegra.ph/D"),          # crawled but failed → retry
            (6, "https://evil.example.com/X"),    # invalid → dropped
            (7, None),
            (8, ""),
        ],
        "message_id long, telegraph_link string",
    )
    content = spark.createDataFrame(
        [("https://telegra.ph/C", "success"), ("https://telegra.ph/D", "timeout")],
        "url string, status string",
    )
    got = sorted(
        r["telegraph_link"]
        for r in select_unprocessed_links(messages, content, limit=10).collect()
    )
    assert got == [
        "https://telegra.ph/A",
        "https://telegra.ph/B",
        "https://telegra.ph/D",
    ]


def test_null_out_orphans_j3(spark):
    messages = spark.createDataFrame(
        [(1, "u1"), (2, "u-gone"), (3, None)], "message_id long, telegraph_link string"
    )
    content = spark.createDataFrame([("u1",)], "url string")
    rows = {
        r["message_id"]: r["telegraph_link"]
        for r in null_out_orphans(messages, content).collect()
    }
    assert rows == {1: "u1", 2: None, 3: None}


def test_full_cleanup_composite(spark):
    """Lifecycle §3.2 — one pass with every cleanup triggering."""
    from pasta_pipeline_spark.operators.maintenance import run_full_cleanup

    now = F.lit(datetime(2024, 6, 1))
    messages = spark.createDataFrame(
        [
            (1, datetime(2024, 5, 20), "u1", T1),
            (1, datetime(2024, 5, 20), "u1", T2),      # W1 dup — keep latest
            (2, datetime(2023, 1, 1), None, T1),       # retention: too old
            (3, datetime(2024, 5, 25), "u-gone", T1),  # orphan link
        ],
        "message_id long, date timestamp, telegraph_link string, processed_at timestamp",
    )
    content = spark.createDataFrame(
        [
            ("u1", "h1", "success", 0, T2, T2),
            ("u1b", "h1", "success", 0, T3, T3),   # W2 dup (same hash, newer) — dropped
            ("u2", "h2", "timeout", 5, T1, T1),    # failed, exhausted, stale — dropped
            ("u3", "h3", "error", 1, datetime(2023, 1, 1), T3),  # old + not success — dropped
        ],
        "url string, content_hash string, status string, retry_count int, "
        "processed_at timestamp, last_checked timestamp",
    )
    res = run_full_cleanup(messages, content, retention_days=90, now=now)
    assert res.stats["deleted_messages"] == 1
    assert res.stats["deleted_content"] == 1
    assert res.stats["deleted_failed"] == 1
    assert res.stats["deleted_old_messages"] == 1
    assert res.stats["deleted_old_content"] == 1
    assert res.stats["cleaned_links"] == 1
    assert res.stats["total_cleaned"] == 6
    assert sorted(r["url"] for r in res.content.collect()) == ["u1"]
    msgs = {r["message_id"]: r["telegraph_link"] for r in res.messages.collect()}
    assert msgs == {1: "u1", 3: None}


def test_full_cleanup_compacts_lsh_index(spark, tmp_table_dir):
    """One maintenance job covers tables AND streaming state: with an
    lsh_index_store passed, run_full_cleanup compacts the signature
    store (file count bounded to ~one per bucket), pair detection
    against the compacted index is unchanged, and the file metrics
    ride in the stats WITHOUT inflating total_cleaned."""
    from pasta_pipeline_spark.operators.maintenance import (
        _live_data_file_count,
        run_full_cleanup,
    )
    from pasta_pipeline_spark.sources.tables import TableStore
    from pasta_pipeline_spark.streaming.dedup import lsh_index_batch

    store = TableStore(spark, f"{tmp_table_dir}/maint_lsh")
    buckets = 4
    text = "the quick brown fox jumps over the lazy dog and runs far away home"
    for i in range(4):  # micro-batches accrete files per touched bucket
        b = spark.createDataFrame(
            [(i * 10 + j, f"batch {i} doc {j} unique words {i}-{j} " + text)
             for j in range(3)],
            "doc_id long, text string",
        )
        lsh_index_batch(b, store, index_buckets=buckets)

    # AQE coalesces each local-scale merge to ~one file per bucket;
    # simulate real-scale fragmentation (one file per shuffle task per
    # touched bucket) so the test exercises what compaction exists for.
    store.overwrite(store.read().repartition(12), partition_by=["__bkt"])

    messages = spark.createDataFrame(
        [(1, datetime(2024, 5, 20), "u1", T1)],
        "message_id long, date timestamp, telegraph_link string, processed_at timestamp",
    )
    content = spark.createDataFrame(
        [("u1", "h1", "success", 0, T1, T1)],
        "url string, content_hash string, status string, retry_count int, "
        "processed_at timestamp, last_checked timestamp",
    )
    res = run_full_cleanup(
        messages, content, retention_days=3650, now=F.lit(datetime(2024, 6, 1)),
        lsh_index_store=store, lsh_index_buckets=buckets,
    )
    assert res.stats["index_files_before"] > buckets
    assert res.stats["index_files_after"] <= buckets
    assert res.stats["total_cleaned"] == 0  # file metrics excluded
    assert _live_data_file_count(store) == res.stats["index_files_after"]

    # detection against the compacted index is unchanged: a duplicate
    # of an indexed doc is still caught
    dup = spark.createDataFrame(
        [(999, "batch 0 doc 0 unique words 0-0 " + text)], "doc_id long, text string"
    )
    pairs = {(r["doc_a"], r["doc_b"]) for r in lsh_index_batch(dup, store, index_buckets=buckets).collect()}
    assert (0, 999) in pairs
    # and the post-compaction merge stayed differential (__bkt layout)
    assert store.read().count() == 13
