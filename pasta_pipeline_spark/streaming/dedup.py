"""Streaming ingest deduplication (SURVEY.md §2.9 extension).

The batch dedup ladder (operators/dedup.py, operators/text_dedup.py)
removes duplicates already in the table; this is the *ingest-time*
form: re-delivered artifacts (at-least-once sources re-send scrape
batches; the reference tolerates this via ON CONFLICT upserts) are
dropped before they ever reach the sink.

``dropDuplicatesWithinWatermark`` keys the state on the dedup columns
and evicts entries older than the watermark — bounded state at any
scale, which plain streaming ``dropDuplicates`` (state grows forever)
cannot promise. The guarantee: two rows with equal keys whose event
times fall within the watermark horizon of each other dedup to one;
re-deliveries farther apart than the horizon are the table-side
merge's job (idempotent by key — streaming/sink.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_stream(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Drop re-delivered rows by key within the watermark horizon.
    Batch DataFrames fall back to plain ``dropDuplicates`` (the whole
    frame is the horizon)."""
    if df.isStreaming:
        return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            key_cols
        )
    return df.dropDuplicates(key_cols)
