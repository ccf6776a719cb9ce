"""Bucketized range (interval-containment) join — SURVEY.md §2.3
time-series extension.

"Which points fall inside each time interval" expressed naively is a
join on ``p.ts BETWEEN i.start AND i.end`` — a non-equi predicate, so
Spark plans a BroadcastNestedLoopJoin (or a cartesian product): every
point is tested against every interval, O(|I|·|P|), which is exactly
the plan that melts down at 100 TB.

This operator converts the range predicate into an equi-join: quantize
the time axis into fixed-width bins, explode each interval onto the
bins it covers, map each point to its single containing bin, hash-join
on the bin id (plus any equi-keys), then re-check the exact range
predicate on the survivors. Each point lives in exactly ONE bin, so a
(point, interval) pair can only meet in one bucket — no duplicate
pairs, no post-dedup.

Cost model: one shuffle on (keys…, bin). The explosion factor is
``interval_length / bin_seconds + 1``; pick ``bin_seconds`` near the
typical interval length so intervals land in ~2 bins. Bursty periods
make hot bins — AQE skew-join splitting handles them, and an equi-key
(per-entity intervals) multiplies bucket cardinality for free.

All bin arithmetic is on ``unix_micros`` longs (exact integer div) —
never on double seconds, where 2^53 rounding could misplace a
boundary event at 100 TB timestamp magnitudes.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BIN = "__range_bin"


def interval_point_join(
    intervals: DataFrame,
    points: DataFrame,
    start_col: str,
    end_col: str,
    ts_col: str,
    bin_seconds: int,
    keys: Sequence[str] = (),
) -> DataFrame:
    """Inner-join ``points`` onto the ``intervals`` containing them
    (half-open containment: ``start <= ts < end``), optionally also
    matching equi-``keys``. Returns one row per (interval row, matched
    point row) with both sides' columns; overlapping column names on
    the point side get a ``_pt`` suffix.

    Empty or inverted intervals (``end <= start``) match nothing.
    """
    w_us = int(bin_seconds) * 1_000_000

    i = intervals.filter(F.col(end_col) > F.col(start_col)).withColumn(
        _BIN,
        F.explode(
            F.sequence(
                F.expr(f"unix_micros({start_col}) div {w_us}"),
                F.expr(f"(unix_micros({end_col}) - 1) div {w_us}"),
            )
        ),
    )

    overlap = set(intervals.columns) & set(points.columns) - set(keys)
    p = points
    for c in overlap:
        p = p.withColumnRenamed(c, f"{c}_pt")
    ts_p = f"{ts_col}_pt" if ts_col in overlap else ts_col
    p = p.withColumn(_BIN, F.expr(f"unix_micros({ts_p}) div {w_us}"))

    joined = i.join(p, on=[_BIN, *keys], how="inner")
    out = joined.filter(
        (F.col(ts_p) >= F.col(start_col)) & (F.col(ts_p) < F.col(end_col))
    )
    return out.drop(_BIN)


def interval_point_counts(
    intervals: DataFrame,
    points: DataFrame,
    interval_id: str,
    start_col: str,
    end_col: str,
    ts_col: str,
    bin_seconds: int,
    keys: Sequence[str] = (),
    count_alias: str = "n_points",
) -> DataFrame:
    """Per-interval count of contained points; intervals that contain
    nothing keep a 0 row (left semantics), which a bare inner
    join + groupBy would drop."""
    pairs = interval_point_join(
        intervals, points, start_col, end_col, ts_col, bin_seconds, keys
    )
    counts = pairs.groupBy(interval_id).agg(F.count(F.lit(1)).alias(count_alias))
    return (
        intervals.join(counts, interval_id, "left")
        .withColumn(count_alias, F.coalesce(F.col(count_alias), F.lit(0)))
    )
