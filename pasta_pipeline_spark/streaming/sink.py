"""Idempotent streaming sink — foreachBatch + merge (SURVEY.md §2.9).

The reference absorbs at-least-once scrape overlap with a primary-key
upsert (db_loader.py:166-181). The Spark-native restatement: every
micro-batch merges into the target table through the same
``merge_upsert`` operator the batch pipeline uses, so replayed batches
are no-ops (last-writer-wins on the key) — exactly-once *effect* on
top of at-least-once delivery.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pasta_pipeline_spark.operators.merge import merge_upsert
from pasta_pipeline_spark.sources.tables import TableStore


def foreach_batch_merge(
    stream: DataFrame,
    store: TableStore,
    key: str | list[str],
    order_col: str,
    checkpoint_dir: str,
    trigger_once: bool = True,
):
    """Start a foreachBatch query merging each micro-batch into
    ``store``. Returns the StreamingQuery (caller awaits/stops)."""

    def merge_batch(batch: DataFrame, batch_id: int) -> None:
        merged = merge_upsert(store.read(), batch, key=key, order_col=order_col)
        store.overwrite(merged)

    writer = (
        stream.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(merge_batch)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
