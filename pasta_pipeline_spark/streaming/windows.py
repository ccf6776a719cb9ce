"""Event-time windows — batch/streaming-polymorphic builders.

Each function takes either a static or a streaming DataFrame (the
DataFrame API is identical; Catalyst plans the incremental version for
streams). The batch forms are oracle-checked in the query catalog
(tumbling_window / sliding_window / session_window); the streaming
forms are exercised in tests via the rate/memory sources.

Late data: pass ``watermark=`` to bound state — events older than the
watermark relative to the stream's max event time are dropped by the
engine (the streaming analog of the reference's 7-day lookback cut,
message_scraper.py:97-100).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_watermark(df: DataFrame, ts_col: str = "ts", delay: str = "7 days") -> DataFrame:
    """Watermark wrapper (no-op on batch DataFrames)."""
    return df.withWatermark(ts_col, delay) if df.isStreaming else df


def tumbling_counts(
    df: DataFrame,
    ts_col: str = "ts",
    width: str = "1 hour",
    watermark: str | None = None,
) -> DataFrame:
    """Per-window count + value sum over non-overlapping windows."""
    src = with_watermark(df, ts_col, watermark) if watermark else df
    return (
        src.groupBy(F.window(ts_col, width).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(
    df: DataFrame,
    ts_col: str = "ts",
    width: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """Overlapping windows: each event lands in width/slide windows."""
    src = with_watermark(df, ts_col, watermark) if watermark else df
    return (
        src.groupBy(F.window(ts_col, width, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


def session_counts(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """Per-key session windows (gap-merged; half-open — a gap of
    exactly ``gap`` starts a new session). Returns one row per session
    with its span and event count."""
    src = with_watermark(df, ts_col, watermark) if watermark else df
    return (
        src.groupBy(F.col(key_col), F.session_window(ts_col, gap).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )
