"""Structured Streaming surface — SURVEY.md §2.9.

The reference is batch-scheduled but streaming-shaped: incremental
tail-consume with a time bound, at-least-once delivery absorbed by an
idempotent upsert, and a retry state machine. This package restates
those semantics Spark-natively:

- ``windows``: tumbling / sliding / session event-time windows with
  watermarked late-data handling;
- ``sink``: the idempotent ``foreachBatch`` merge sink (the canonical
  Spark pattern for exactly-once-effective upserts into a table).
"""

from pasta_pipeline_spark.streaming.windows import (
    tumbling_counts,
    sliding_counts,
    session_counts,
    with_watermark,
)
from pasta_pipeline_spark.streaming.sink import foreach_batch_merge

__all__ = [
    "tumbling_counts",
    "sliding_counts",
    "session_counts",
    "with_watermark",
    "foreach_batch_merge",
]
