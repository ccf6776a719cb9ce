"""Stream-stream and stream-static joins (SURVEY.md §2.9 extension).

The batch as-of/range joins (operators/asof.py, operators/rangejoin.py)
answer "what matched" after the fact; the streaming forms answer it
while data arrives. Spark's stream-stream inner join buffers both
sides in state — UNBOUNDED unless every side carries a watermark and
the join predicate carries a time-range constraint that lets the
engine evict state. These builders make the bounded form the only
expressible one: you cannot construct the state-leak variant through
this API.

State model (per Structured Streaming docs): with watermarks d_l, d_r
and the range ``r.ts BETWEEN l.ts - lookback AND l.ts``, each side's
buffer holds at most (watermark + lookback) of event time — constant
in stream length, linear in rate. That is the 100 TB posture: state
size is a deployment knob, not a function of uptime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    lookback: str,
    watermark_left: str,
    watermark_right: str,
    suffix: str = "_r",
) -> DataFrame:
    """Inner-join two event streams on an equi-key where the right
    event happened within ``lookback`` BEFORE (or exactly at) the left
    event: ``l.ts - lookback <= r.ts <= l.ts`` — e.g. "purchases with
    the ad click that preceded them".

    Both sides are watermarked here (required: Spark rejects a
    stream-stream join without watermark + time bound, and this
    builder passes the bound explicitly so state eviction is provable
    from the plan). Works identically on batch frames, where the
    watermark is a no-op — the batch form is the oracle surface.
    """
    lw = left.withWatermark(left_ts, watermark_left) if left.isStreaming else left
    rw = right.withWatermark(right_ts, watermark_right) if right.isStreaming else right

    overlap = (set(left.columns) & set(right.columns)) - {on}
    for c in overlap:
        rw = rw.withColumnRenamed(c, f"{c}{suffix}")
    r_ts = f"{right_ts}{suffix}" if right_ts in overlap else right_ts

    cond = (
        (lw[on] == rw[on])
        & (F.col(r_ts) <= F.col(left_ts))
        & (F.col(r_ts) >= F.col(left_ts) - F.expr(f"INTERVAL {lookback}"))
    )
    return lw.join(rw, cond, "inner").drop(rw[on])
