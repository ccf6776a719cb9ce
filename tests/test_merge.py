"""Merge/upsert property tests (SURVEY.md §5.4): idempotence,
last-writer-wins, accumulate semantics, partial SET lists."""

from __future__ import annotations

from pyspark.sql import functions as F

from pasta_pipeline_spark.operators.merge import merge_upsert, upsert_accumulate


def _events(spark, rows):
    return spark.createDataFrame(rows, "id long, val string, ts timestamp")


def _collect(df):
    return sorted((r["id"], r["val"]) for r in df.collect())


def test_updates_win_on_conflict(spark):
    target = _events(spark, [(1, "old", None), (2, "keep", None)])
    updates = _events(spark, [(1, "new", None), (3, "ins", None)])
    got = _collect(merge_upsert(target, updates, key="id", order_col="ts"))
    assert got == [(1, "new"), (2, "keep"), (3, "ins")]


def test_idempotence(spark):
    """Applying the same batch twice == once (the reference's
    at-least-once absorption, db_loader.py:166-181)."""
    target = _events(spark, [(1, "old", None)])
    updates = _events(spark, [(1, "new", None), (2, "b", None)])
    once = merge_upsert(target, updates, key="id", order_col="ts")
    twice = merge_upsert(once, updates, key="id", order_col="ts")
    assert _collect(once) == _collect(twice)


def test_within_batch_newest_wins(spark):
    from datetime import datetime

    target = _events(spark, [])
    updates = _events(
        spark,
        [
            (1, "early", datetime(2024, 1, 1)),
            (1, "late", datetime(2024, 2, 1)),
        ],
    )
    got = _collect(merge_upsert(target, updates, key="id", order_col="ts"))
    assert got == [(1, "late")]


def test_set_on_update_stamps_only_updated_rows(spark):
    from datetime import datetime

    stamp = datetime(2030, 1, 1)
    target = _events(spark, [(1, "old", None), (2, "keep", None)])
    updates = _events(spark, [(1, "new", None)])
    out = merge_upsert(
        target, updates, key="id", order_col="ts",
        set_on_update={"ts": F.lit(stamp)},
    )
    rows = {r["id"]: r["ts"] for r in out.collect()}
    assert rows[1] == stamp and rows[2] is None


def test_accumulate_increment_and_insert(spark):
    """S9 parity (telegraph_processor.py:308-315): conflict increments,
    insert starts at 1, untouched rows keep their count."""
    target = spark.createDataFrame(
        [(1, "success", 0, "kept"), (2, "error", 2, "kept2")],
        "url long, status string, retry_count int, content string",
    )
    updates = spark.createDataFrame(
        [(2, "timeout"), (3, "error")], "url long, status string"
    )
    out = upsert_accumulate(
        target, updates, key="url", accumulate={"retry_count": "increment"}
    )
    rows = {r["url"]: r for r in out.collect()}
    assert rows[1]["retry_count"] == 0 and rows[1]["status"] == "success"
    assert rows[2]["retry_count"] == 3 and rows[2]["status"] == "timeout"
    assert rows[3]["retry_count"] == 1 and rows[3]["status"] == "error"
    # partial SET list: columns not in the batch keep their old values
    assert rows[2]["content"] == "kept2"
    assert rows[3]["content"] is None
