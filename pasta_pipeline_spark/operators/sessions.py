"""Batch sessionization & funnel analysis (events-table extension
surface, SURVEY.md §7 M6).

The streaming side already has ``F.session_window`` (streaming/
windows.py); these are the batch analogs an analytics user expects:

- :func:`sessionize` — gap-based session assignment via lag + running
  sum (the classic sessionization idiom): a new session starts when
  the gap from the user's previous event exceeds the threshold.
- :func:`funnel_counts` — ordered-step completion counts: a user
  completes step k only with an event of step-k's type *strictly
  after* their step-(k-1) completion time (min-timestamp chaining).

Scale posture: sessionize is one window shuffle on the user key;
funnel is k-1 shuffles on the user key over frames that shrink at
every level (step-k candidates are a subset of step-(k-1) users), and
every join is an equi-join AQE can broadcast once levels get small.
All arithmetic is integer epoch-seconds — cross-engine exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str | None = None,
    gap_minutes: int = 30,
) -> DataFrame:
    """Append ``session_seq`` (1-based per-user session index) to every
    event: a session breaks when the epoch-second gap from the user's
    previous event exceeds ``gap_minutes``. ``order_tiebreak`` makes
    same-timestamp ordering deterministic (pass the event id)."""
    order = [F.asc(ts_col)] + ([F.asc(order_tiebreak)] if order_tiebreak else [])
    w = Window.partitionBy(user_col).orderBy(*order)
    sec = F.col(ts_col).cast("long")
    prev = F.lag(sec).over(w)
    new_session = F.when(
        prev.isNull() | ((sec - prev) > gap_minutes * 60), F.lit(1)
    ).otherwise(F.lit(0))
    return events.withColumn(
        "session_seq",
        F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def session_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str | None = None,
    gap_minutes: int = 30,
) -> DataFrame:
    """Per-session rollup over :func:`sessionize`: (user, session_seq,
    n_events, start_sec, end_sec, duration_sec) with epoch-second
    bounds (cross-engine-stable rendering)."""
    sec = F.col(ts_col).cast("long")
    return (
        sessionize(events, user_col, ts_col, order_tiebreak, gap_minutes)
        .groupBy(user_col, "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(sec).alias("start_sec"),
            F.max(sec).alias("end_sec"),
            (F.max(sec) - F.min(sec)).alias("duration_sec"),
        )
    )


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """One-row funnel: ``n_step_i`` = users whose step-i event occurs
    strictly after their step-(i-1) completion (min-ts chaining, the
    standard ordered-funnel semantics). Level frames shrink
    monotonically; each level is one equi-join + min-aggregate."""
    if not steps:
        raise ValueError("steps must be non-empty")
    levels: list[DataFrame] = []
    cur = (
        events.where(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t"))
    )
    levels.append(cur)
    for step in steps[1:]:
        nxt = (
            events.where(F.col(type_col) == step)
            .join(cur.select(F.col(user_col), F.col("t").alias("prev_t")), user_col)
            .where(F.col(ts_col) > F.col("prev_t"))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias("t"))
        )
        levels.append(nxt)
        cur = nxt
    out = None
    for i, lvl in enumerate(levels):
        agg = lvl.agg(F.count(F.lit(1)).alias(f"n_step{i + 1}"))
        out = agg if out is None else out.crossJoin(agg)
    return out


def cohort_retention(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    period_sec: int = 604800,
) -> DataFrame:
    """Cohort retention matrix over an event log: users are cohorted by
    the period (default: week) of their first event; each (cohort,
    offset) cell counts distinct users active ``offset`` periods after
    their cohort period. Periods are pure integer epoch arithmetic
    (unix_micros div period) — no calendar/timezone semantics to
    disagree on cross-engine.

    Shape: distinct on (user, period) + min-per-user + join + final
    agg — three shuffles, two of them on the user key (exchange
    reuse), none on raw events. The user×period distinct bounds state
    by active users, not event volume.
    """
    per = F.lit(period_sec * 1_000_000)
    wk = F.expr(f"unix_micros({ts_col}) div {period_sec * 1_000_000}")
    _ = per  # period enters via the expr above; kept for clarity
    activity = df.select(F.col(user_col).alias("u"), wk.alias("wk")).distinct()
    cohort = activity.groupBy("u").agg(F.min("wk").alias("cwk"))
    return (
        activity.join(cohort, "u")
        .groupBy(F.col("cwk").alias("cohort_week"), (F.col("wk") - F.col("cwk")).alias("week_offset"))
        .agg(F.countDistinct("u").cast("long").alias("n_users"))
    )
