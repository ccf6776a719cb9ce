"""Statistics aggregates — A2/A3/A4/A6 in SURVEY.md §2.4.

Parity source: get_cleanup_statistics
(/root/reference/dags/processors/duplicate_remover.py:236-311) — three
single-scan aggregate queries plus derived arithmetic.

Scale notes: each stat is one scan with map-side partial aggregation;
``countDistinct`` is exact (matching the reference); callers at the
100 TB tier can pass ``approx=True`` to switch to HyperLogLog
``approx_count_distinct`` (the documented scale variant, SURVEY.md A2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def message_stats(messages: DataFrame, approx: bool = False) -> DataFrame:
    """COUNT(*), COUNT(DISTINCT message_id), COUNT(telegraph_link),
    derived duplicate count — one scan (duplicate_remover.py:246-252)."""
    cd = (
        F.approx_count_distinct("message_id")
        if approx
        else F.countDistinct("message_id")
    )
    return messages.agg(
        F.count(F.lit(1)).alias("total_messages"),
        cd.alias("unique_messages"),
        F.count("telegraph_link").alias("messages_with_links"),
    ).withColumn(
        "duplicate_messages", F.col("total_messages") - F.col("unique_messages")
    )


def content_stats(content: DataFrame, approx: bool = False) -> DataFrame:
    """Conditional aggregates over the content table
    (duplicate_remover.py:259-266)."""
    cd = (
        F.approx_count_distinct("content_hash")
        if approx
        else F.countDistinct("content_hash")
    )
    return content.agg(
        F.count(F.lit(1)).alias("total_content"),
        F.count(F.when(F.col("status") == "success", 1)).alias("successful_content"),
        F.count(F.when(F.col("status") != "success", 1)).alias("failed_content"),
        cd.alias("unique_hashes"),
    )


def status_breakdown(content: DataFrame) -> DataFrame:
    """Per-status row counts — the grouped-aggregate surface implied by
    the stats report (SURVEY.md §2.4)."""
    return content.groupBy("status").agg(F.count(F.lit(1)).alias("n")).orderBy("status")


def cleanup_summary(parts: dict[str, int]) -> dict:
    """A6 — sum per-task deleted-row counts into total_cleaned
    (duplicate_remover.py:335-348). Driver-side arithmetic over already
    collected scalars; no DataFrame work."""
    total = sum(v for v in parts.values() if isinstance(v, int))
    return {**parts, "total_cleaned": total}
