"""User-engagement analytics over the event stream.

- ``dau_mau_stickiness`` — the product-health headline: per calendar
  month, average daily active users, monthly active users, and the
  DAU/MAU "stickiness" ratio. Pure distinct-count rollups; the month
  grain keeps every frame bounded (|days| and |months| rows).
- ``interarrival_profile`` — per event type, the distribution of
  per-user gaps between consecutive events (p50/p90/max seconds):
  the cadence profile behind session-timeout tuning and bot
  detection. Gaps come from one LAG over (user, type) partitions
  (each bounded by a user's own history); percentiles are exact
  closed-form picks over the per-type cumulative gap histogram — the
  bounded value-domain pattern (gaps are whole seconds), never an
  empty-OVER ntile.

Exactness: counts and gap seconds are int64 end to end; stickiness is
one fixed double division floored to 1e-6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dau_mau_stickiness(
    events: DataFrame, ts_col: str = "ts", user_col: str = "user_id"
) -> DataFrame:
    """Per-month engagement rollup.

    Returns (month, n_days, dau_sum, mau, dau_avg_sc, stickiness_sc)
    ordered by month, where dau_sum is the sum of daily distinct-user
    counts, dau_avg = dau_sum / n_days, and stickiness =
    dau_sum / (n_days · mau).
    """
    base = events.select(
        F.to_date(F.date_trunc("month", F.col(ts_col))).alias("month"),
        F.to_date(F.col(ts_col)).alias("day"),
        F.col(user_col).alias("uid"),
    )
    daily = base.groupBy("month", "day").agg(
        F.count_distinct("uid").alias("dau")
    )
    per_month_daily = daily.groupBy("month").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("dau").alias("dau_sum"),
    )
    mau = base.groupBy("month").agg(F.count_distinct("uid").alias("mau"))
    joined = per_month_daily.join(mau, "month")
    dau_avg = F.col("dau_sum").cast("double") / F.col("n_days").cast("double")
    stick = F.col("dau_sum").cast("double") / (
        F.col("n_days") * F.col("mau")
    ).cast("double")
    return joined.select(
        "month",
        "n_days",
        "dau_sum",
        "mau",
        F.floor(dau_avg * 1000000).cast("long").alias("dau_avg_sc"),
        F.floor(stick * 1000000).cast("long").alias("stickiness_sc"),
    ).orderBy("month")


def dau_mau_oracle_sql(
    table: str = "events", ts_col: str = "ts", user_col: str = "user_id"
) -> str:
    """DuckDB twin of :func:`dau_mau_stickiness`."""
    return f"""
    WITH base AS (
      SELECT CAST(date_trunc('month', {ts_col}) AS DATE) AS month,
             CAST({ts_col} AS DATE) AS day, {user_col} AS uid
      FROM {table}
    ), daily AS (
      SELECT month, day, COUNT(DISTINCT uid) AS dau FROM base GROUP BY 1, 2
    ), pm AS (
      SELECT month, COUNT(*) AS n_days, CAST(SUM(dau) AS BIGINT) AS dau_sum
      FROM daily GROUP BY 1
    ), mm AS (
      SELECT month, COUNT(DISTINCT uid) AS mau FROM base GROUP BY 1
    )
    SELECT pm.month, pm.n_days, pm.dau_sum, mm.mau,
      CAST(FLOOR(CAST(dau_sum AS DOUBLE) / CAST(n_days AS DOUBLE) * 1000000) AS BIGINT) AS dau_avg_sc,
      CAST(FLOOR(CAST(dau_sum AS DOUBLE) / CAST(n_days * mau AS DOUBLE) * 1000000) AS BIGINT) AS stickiness_sc
    FROM pm JOIN mm USING (month) ORDER BY month
    """


def interarrival_profile(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-type inter-arrival gap distribution.

    Gap = seconds between a user's consecutive events of the same
    type (LAG over the (user, type) partition, event_id tiebreak for
    simultaneous rows). Percentile contract: p-th percentile is the
    SMALLEST gap whose cumulative count ·100 >= n·p — exact integer
    arithmetic over the per-type (gap, count) histogram.

    Returns per type: n_gaps, p50_s, p90_s, max_s.
    """
    w = Window.partitionBy(user_col, type_col).orderBy(
        F.col(ts_col).asc(), F.col("event_id").asc()
    )
    # exact epoch-microsecond diff floored to whole seconds — second-
    # granularity timestamps would round differently across engines
    gaps = (
        events.withColumn("__us", F.unix_micros(F.col(ts_col)))
        .withColumn("__prev_us", F.lag(F.col("__us")).over(w))
        .where(F.col("__prev_us").isNotNull())
        .select(
            F.col(type_col).alias("etype"),
            F.expr("(__us - __prev_us) div 1000000").alias("gap_s"),
        )
    )
    hist = gaps.groupBy("etype", "gap_s").agg(F.count(F.lit(1)).alias("c"))
    wc = (
        Window.partitionBy("etype")
        .orderBy("gap_s")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wt = Window.partitionBy("etype")
    cum = (
        hist.withColumn("cum", F.sum("c").over(wc))
        .withColumn("n", F.sum("c").over(wt))
        .withColumn("mx", F.max("gap_s").over(wt))
    )
    pick = lambda p: F.min(  # noqa: E731
        F.when(F.col("cum") * 100 >= F.col("n") * p, F.col("gap_s"))
    )
    return (
        cum.groupBy("etype")
        .agg(
            F.max("n").alias("n_gaps"),
            pick(50).alias("p50_s"),
            pick(90).alias("p90_s"),
            F.max("mx").alias("max_s"),
        )
        .orderBy("etype")
    )


def interarrival_oracle_sql(table: str = "events") -> str:
    """DuckDB twin of :func:`interarrival_profile` (exact epoch_us
    diff floored to seconds; same smallest-gap-at-cum-threshold
    percentile)."""
    return f"""
    WITH gaps AS (
      SELECT event_type AS etype,
             (epoch_us(ts) - epoch_us(LAG(ts) OVER (
                PARTITION BY user_id, event_type ORDER BY ts, event_id)))
               // 1000000 AS gap_s
      FROM {table}
    ), g AS (
      SELECT etype, gap_s FROM gaps WHERE gap_s IS NOT NULL
    ), hist AS (
      SELECT etype, gap_s, COUNT(*) AS c FROM g GROUP BY 1, 2
    ), cum AS (
      SELECT etype, gap_s, c,
             SUM(c) OVER (PARTITION BY etype ORDER BY gap_s
                          ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(c) OVER (PARTITION BY etype) AS n,
             MAX(gap_s) OVER (PARTITION BY etype) AS mx
      FROM hist
    )
    SELECT etype, CAST(MAX(n) AS BIGINT) AS n_gaps,
           MIN(CASE WHEN cum * 100 >= n * 50 THEN gap_s END) AS p50_s,
           MIN(CASE WHEN cum * 100 >= n * 90 THEN gap_s END) AS p90_s,
           MAX(mx) AS max_s
    FROM cum GROUP BY etype ORDER BY etype
    """


def bot_cadence_report(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    max_p50_gap_s: int = 2,
    min_events: int = 20,
) -> DataFrame:
    """Per-user cadence screen for automation (r8): a user whose
    MEDIAN inter-event gap is machine-fast over a meaningful event
    count is flagged. Robust by construction — a bot can't hide a
    sub-second median behind a few long pauses the way it hides a
    mean.

    Per user: n_events, span_s (first→last), p50_gap_s (exact
    closed-form pick over the per-user gap histogram — partitions
    bounded by a user's own distinct gaps), events_per_hour_sc over
    the active span, is_bot flag. Single-event users have no gaps and
    are excluded.

    Returns (user_id, n_events, span_s, p50_gap_s, events_per_hour_sc,
    is_bot) ordered by user.
    """
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col("event_id").asc()
    )
    base = events.withColumn("__us", F.unix_micros(F.col(ts_col)))
    gaps = (
        base.withColumn("__prev_us", F.lag(F.col("__us")).over(w))
        .where(F.col("__prev_us").isNotNull())
        .select(
            F.col(user_col).alias("uid"),
            F.expr("(__us - __prev_us) div 1000000").alias("gap_s"),
        )
    )
    hist = gaps.groupBy("uid", "gap_s").agg(F.count(F.lit(1)).alias("c"))
    wc = (
        Window.partitionBy("uid")
        .orderBy("gap_s")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wt = Window.partitionBy("uid")
    med = (
        hist.withColumn("cum", F.sum("c").over(wc))
        .withColumn("n", F.sum("c").over(wt))
        .groupBy("uid")
        .agg(
            F.min(
                F.when(F.col("cum") * 2 >= F.col("n"), F.col("gap_s"))
            ).alias("p50_gap_s")
        )
    )
    spans = base.groupBy(F.col(user_col).alias("uid")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.expr("(max(__us) - min(__us)) div 1000000").alias("span_s"),
    )
    joined = spans.join(med, "uid")
    eph = F.when(
        F.col("span_s") > 0,
        F.col("n_events").cast("double") * 3600.0
        / F.col("span_s").cast("double"),
    )
    flag = (F.col("p50_gap_s") <= max_p50_gap_s) & (
        F.col("n_events") >= min_events
    )
    return joined.select(
        F.col("uid").alias("user_id"),
        "n_events",
        "span_s",
        "p50_gap_s",
        F.floor(eph * 1000000).cast("long").alias("events_per_hour_sc"),
        flag.alias("is_bot"),
    ).orderBy("user_id")


def bot_cadence_oracle_sql(
    table: str = "events", max_p50_gap_s: int = 2, min_events: int = 20
) -> str:
    """DuckDB twin of :func:`bot_cadence_report`."""
    return f"""
    WITH base AS (
      SELECT user_id AS uid, epoch_us(ts) AS us, event_id FROM {table}
    ), gaps AS (
      SELECT uid,
             (us - LAG(us) OVER (PARTITION BY uid ORDER BY us, event_id))
               // 1000000 AS gap_s
      FROM base
    ), hist AS (
      SELECT uid, gap_s, COUNT(*) AS c FROM gaps
      WHERE gap_s IS NOT NULL GROUP BY 1, 2
    ), med AS (
      SELECT uid,
             MIN(CASE WHEN cum * 2 >= n THEN gap_s END) AS p50_gap_s
      FROM (
        SELECT uid, gap_s,
               SUM(c) OVER (PARTITION BY uid ORDER BY gap_s
                            ROWS UNBOUNDED PRECEDING) AS cum,
               SUM(c) OVER (PARTITION BY uid) AS n
        FROM hist
      ) GROUP BY uid
    ), spans AS (
      SELECT uid, COUNT(*) AS n_events,
             (MAX(us) - MIN(us)) // 1000000 AS span_s
      FROM base GROUP BY uid
    )
    SELECT s.uid AS user_id, s.n_events, CAST(s.span_s AS BIGINT) AS span_s,
           CAST(m.p50_gap_s AS BIGINT) AS p50_gap_s,
           CASE WHEN s.span_s > 0 THEN CAST(FLOOR(
             CAST(s.n_events AS DOUBLE) * 3600.0
             / CAST(s.span_s AS DOUBLE) * 1000000) AS BIGINT) END AS events_per_hour_sc,
           m.p50_gap_s <= {max_p50_gap_s} AND s.n_events >= {min_events} AS is_bot
    FROM spans s JOIN med m USING (uid) ORDER BY user_id
    """
