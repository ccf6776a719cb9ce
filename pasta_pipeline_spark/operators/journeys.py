"""Temporal behavior analytics: journeys, conversion lag, fulfilment lag.

Three verbs the funnel/cohort/session tiers don't cover:

- ``user_journey_paths`` — the top event-type PREFIX paths (each
  user's first ``path_len`` events joined ``a->b->c``), the classic
  user-journey sankey input.
- ``conversion_lag_profile`` — purchase-to-preceding-view latency
  histogram with cumulative share: the as-of join (operators/asof.py)
  turned into a time-to-convert distribution.
- ``shipping_lag_quartiles`` — order-to-ship day-gap quartiles per
  priority, computed EXACTLY over the bounded gap domain with the
  weighted-median cumulative-counts idiom (no fact-scale sort, no
  approx_percentile).

Scale posture: per-user windows are millions-of-small-groups; every
distribution collapses the fact table to a bounded (value, group)
count frame before any window; shares/ratios are fixed double trees
over int64 counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .asof import asof_join


def user_journey_paths(
    events: DataFrame,
    path_len: int = 4,
    top_k: int = 20,
) -> DataFrame:
    """Top-``top_k`` first-``path_len``-event paths by user count.

    Returns (path, n_users, share_sc) ordered by (n_users DESC, path);
    ties deterministic. Users with fewer than ``path_len`` events keep
    their shorter full path.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    firsts = (
        events.select("user_id", "ts", "event_id", "event_type")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= path_len)
    )
    paths = firsts.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                lambda s: s["event_type"],
            ),
            "->",
        ).alias("path")
    )
    counts = paths.groupBy("path").agg(F.count(F.lit(1)).alias("n_users"))
    total = counts.agg(F.sum("n_users").alias("__total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "path",
            "n_users",
            F.floor(
                F.col("n_users").cast("double") / F.col("__total").cast("double") * 1000000
            )
            .cast("long")
            .alias("share_sc"),
        )
        .orderBy(F.col("n_users").desc(), "path")
        .limit(top_k)
    )


def journey_paths_oracle_sql(path_len: int = 4, top_k: int = 20) -> str:
    """DuckDB twin of :func:`user_journey_paths`."""
    return f"""
    WITH firsts AS (
      SELECT user_id, event_type, rn FROM (
        SELECT user_id, event_type,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events
      ) WHERE rn <= {path_len}
    ), paths AS (
      SELECT user_id, string_agg(event_type, '->' ORDER BY rn) AS path
      FROM firsts GROUP BY user_id
    ), counts AS (
      SELECT path, COUNT(*) AS n_users FROM paths GROUP BY path
    ), tot AS (SELECT CAST(SUM(n_users) AS BIGINT) AS t FROM counts)
    SELECT path, n_users,
           CAST(FLOOR(CAST(n_users AS DOUBLE) / CAST(t AS DOUBLE) * 1000000) AS BIGINT) AS share_sc
    FROM counts CROSS JOIN tot
    ORDER BY n_users DESC, path
    LIMIT {top_k}
    """


def conversion_lag_profile(events: DataFrame) -> DataFrame:
    """Hours from a user's latest prior view to each purchase.

    Returns (lag_hours, n, cum_share_sc) over the bounded lag domain;
    purchases with no prior view land at lag_hours = -1. The
    cumulative share window runs over the bounded per-hour frame.
    """
    purchases = events.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    views = (
        events.where(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.count(F.lit(1)).alias("__n"))
        .select("user_id", "ts")
    )
    joined = asof_join(
        purchases,
        views,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        value_cols=[],
        suffix="_v",
    )
    lag = F.when(
        F.col("ts_v").isNull(), F.lit(-1)
    ).otherwise(
        F.floor(
            (F.unix_timestamp("ts").cast("long") - F.unix_timestamp("ts_v").cast("long"))
            / 3600
        )
    )
    hist = (
        joined.select(lag.cast("long").alias("lag_hours"))
        .groupBy("lag_hours")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w_cum = Window.orderBy("lag_hours").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    return (
        hist.withColumn("__cum", F.sum("n").over(w_cum))
        .withColumn("__tot", F.sum("n").over(w_all))
        .select(
            "lag_hours",
            "n",
            F.floor(
                F.col("__cum").cast("double") / F.col("__tot").cast("double") * 1000000
            )
            .cast("long")
            .alias("cum_share_sc"),
        )
        .orderBy("lag_hours")
    )


def conversion_lag_oracle_sql() -> str:
    """DuckDB twin: ASOF LEFT JOIN + bounded cumulative window."""
    return """
    WITH p AS (
      SELECT user_id, ts FROM events WHERE event_type = 'purchase'
    ), v AS (
      SELECT DISTINCT user_id, ts FROM events WHERE event_type = 'view'
    ), lagged AS (
      SELECT CASE WHEN v.ts IS NULL THEN -1
                  ELSE CAST(FLOOR((CAST(FLOOR(epoch(p.ts)) AS BIGINT)
                                   - CAST(FLOOR(epoch(v.ts)) AS BIGINT)) / 3600) AS BIGINT)
             END AS lag_hours
      FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
    ), hist AS (
      SELECT lag_hours, COUNT(*) AS n FROM lagged GROUP BY lag_hours
    )
    SELECT lag_hours, n,
           CAST(FLOOR(CAST(SUM(n) OVER (ORDER BY lag_hours
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                / CAST(SUM(n) OVER () AS DOUBLE) * 1000000) AS BIGINT) AS cum_share_sc
    FROM hist ORDER BY lag_hours
    """


def shipping_lag_quartiles(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Exact order-to-ship day-gap quartiles per order priority.

    The join shuffles on the order key; the gap domain is bounded
    (TPC-H ships within ~4 months), so quartiles come from cumulative
    per-(priority, gap) counts — the weighted-median idiom — never a
    fact-scale sort. Returns (o_orderpriority, n, q1_days,
    median_days, q3_days, max_days).
    """
    gaps = (
        lineitem.select("l_orderkey", "l_shipdate")
        .join(
            orders.select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            "o_orderpriority",
            F.datediff(F.col("l_shipdate"), F.col("o_orderdate")).cast("long").alias("gap"),
        )
    )
    counts = gaps.groupBy("o_orderpriority", "gap").agg(
        F.count(F.lit(1)).alias("c")
    )
    w_cum = Window.partitionBy("o_orderpriority").orderBy("gap")
    w_all = Window.partitionBy("o_orderpriority")
    cum = counts.withColumn("cum", F.sum("c").over(w_cum)).withColumn(
        "tot", F.sum("c").over(w_all)
    )
    return (
        cum.groupBy("o_orderpriority")
        .agg(
            F.max("tot").alias("n"),
            F.min(F.when(F.col("cum") * 4 >= F.col("tot"), F.col("gap"))).alias("q1_days"),
            F.min(F.when(F.col("cum") * 2 >= F.col("tot"), F.col("gap"))).alias("median_days"),
            F.min(F.when(F.col("cum") * 4 >= F.col("tot") * 3, F.col("gap"))).alias("q3_days"),
            F.max("gap").alias("max_days"),
        )
        .orderBy("o_orderpriority")
    )


def shipping_lag_oracle_sql() -> str:
    """DuckDB twin of :func:`shipping_lag_quartiles`."""
    return """
    WITH gaps AS (
      SELECT o.o_orderpriority,
             CAST(date_diff('day', o.o_orderdate, l.l_shipdate) AS BIGINT) AS gap
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ), counts AS (
      SELECT o_orderpriority, gap, COUNT(*) AS c
      FROM gaps GROUP BY o_orderpriority, gap
    ), cum AS (
      SELECT o_orderpriority, gap, c,
             SUM(c) OVER (PARTITION BY o_orderpriority ORDER BY gap) AS cum,
             SUM(c) OVER (PARTITION BY o_orderpriority) AS tot
      FROM counts
    )
    SELECT o_orderpriority,
           CAST(MAX(tot) AS BIGINT) AS n,
           MIN(CASE WHEN cum * 4 >= tot THEN gap END) AS q1_days,
           MIN(CASE WHEN cum * 2 >= tot THEN gap END) AS median_days,
           MIN(CASE WHEN cum * 4 >= tot * 3 THEN gap END) AS q3_days,
           MAX(gap) AS max_days
    FROM cum GROUP BY o_orderpriority ORDER BY o_orderpriority
    """
