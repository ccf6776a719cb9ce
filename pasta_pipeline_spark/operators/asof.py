"""As-of (nearest-event) join — time-series extension of SURVEY.md §2.3.

The reference's only temporal join is the incremental-scan predicate
(message_scraper.py:98-100: "stop at the first message older than the
watermark"); an engine serving the same event streams at scale needs
the general form — attach to every fact row the latest dimension row
at or before its event time (price as-of trade, status as-of event).

Spark has no ASOF JOIN operator, and expressing it as a range join
(``l.ts >= r.ts`` + keep-latest) degenerates to a nested-loop join.
This implementation is the union-of-streams form:

1. tag both inputs and union them into one stream,
2. one window over the join keys ordered by (event time, side) — the
   right row sorts first on ties, which is exactly the inclusive
   ``l.ts >= r.ts`` ASOF boundary,
3. ``last(<right-row struct>, ignorenulls=True)`` carries the most
   recent right row forward onto every left row,
4. keep the left rows, unpack the struct.

Cost model: ONE shuffle on the join keys (same as the sort-merge join
Spark would run for an equi-join on those keys) and a sequential
window scan per key partition — linear, no candidate explosion, no
nested loop, at any corpus size. The right row travels as a single
struct, so a NULL in one attribute of the matched row stays NULL
instead of reaching further back (per-column ``last(ignorenulls)``
would silently mix rows).

Skew note (100 TB): a mega-key serializes into one window task. The
escape hatch is the same as for any window: time-slice the key
(salt = date_trunc) and re-run the join on slice boundaries, or use
the tolerance variant which bounds how far state must look back.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TS = "__asof_ts"
_SIDE = "__asof_side"
_ROW = "__asof_row"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    direction: str = "backward",
    suffix: str = "_matched",
) -> DataFrame:
    """For each left row, attach ``value_cols`` (plus the matched
    timestamp, as ``<right_ts><suffix>``) from the latest right row
    with ``right.right_ts <= left.left_ts`` on the same ``on`` keys
    (``direction="backward"``; ``"forward"`` takes the earliest right
    row at-or-after instead). Unmatched left rows keep NULLs — LEFT
    ASOF JOIN semantics.

    Ties: a right row exactly at the left timestamp matches
    (inclusive). Callers wanting deterministic output must make the
    right side unique per (keys, timestamp) — same contract as
    DuckDB/pandas ``merge_asof``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    packed = F.struct(
        F.col(right_ts).alias(right_ts),
        *[F.col(c).alias(c) for c in value_cols],
    )
    r = right.select(
        *[F.col(k) for k in on],
        F.col(right_ts).alias(_TS),
        packed.alias(_ROW),
    )
    l = left.withColumn(_TS, F.col(left_ts))

    # On equal timestamps the right row must be visible to the left row:
    # backward scans ascending with right-first, forward scans ascending
    # with left-first and looks ahead.
    if direction == "backward":
        l = l.withColumn(_SIDE, F.lit(1))
        r = r.withColumn(_SIDE, F.lit(0))
    else:
        l = l.withColumn(_SIDE, F.lit(0))
        r = r.withColumn(_SIDE, F.lit(1))

    u = l.unionByName(r, allowMissingColumns=True)

    w = Window.partitionBy(*on).orderBy(_TS, _SIDE)
    if direction == "backward":
        w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        carried = F.last(_ROW, ignorenulls=True).over(w)
    else:
        w = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        carried = F.first(_ROW, ignorenulls=True).over(w)

    u = u.withColumn(_ROW, carried)
    out = u.filter(F.col(_SIDE) == (1 if direction == "backward" else 0))
    out = out.withColumn(f"{right_ts}{suffix}", F.col(_ROW)[right_ts])
    for c in value_cols:
        out = out.withColumn(f"{c}{suffix}", F.col(_ROW)[c])
    return out.drop(_TS, _SIDE, _ROW)


def asof_join_tolerance(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tolerance_seconds: int,
    suffix: str = "_matched",
) -> DataFrame:
    """Backward as-of join that only accepts matches within
    ``tolerance_seconds`` of the left timestamp (pandas
    ``merge_asof(tolerance=...)``): stale matches are nulled out, the
    left row survives."""
    out = asof_join(
        left, right, on, left_ts, right_ts, value_cols, "backward", suffix
    )
    matched = f"{right_ts}{suffix}"
    fresh = F.col(matched) >= F.col(left_ts) - F.expr(
        f"INTERVAL {int(tolerance_seconds)} SECONDS"
    )
    out = out.withColumn("__asof_fresh", F.coalesce(fresh, F.lit(False)))
    for c in [matched] + [f"{c}{suffix}" for c in value_cols]:
        out = out.withColumn(
            c, F.when(F.col("__asof_fresh"), F.col(c)).otherwise(F.lit(None))
        )
    return out.drop("__asof_fresh")
