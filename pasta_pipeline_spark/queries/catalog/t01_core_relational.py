"""Catalog tier: core relational: scans, aggregations, joins, window dedup, merge/upsert, event-time windows.

Split verbatim from the r8 catalog monolith (r8 verdict ask #4).
Registration order is preserved by the package __init__ import
order; registration stays APPEND-ONLY — new queries go at the end
of the LAST tier module (or a new one imported last).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import SparkSession
from pasta_pipeline_spark.queries.catalog._core import _t, _xsum, register

# ---------------------------------------------------------------------------
# Scans / filters / work selection (S-group, P-group, J1, L1)
# ---------------------------------------------------------------------------


@register(
    "work_selection",
    """
    SELECT DISTINCT o_orderkey
    FROM orders
    WHERE o_orderstatus <> 'F'
      AND o_orderkey NOT IN (SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R')
    ORDER BY o_orderkey
    LIMIT 1000
    """,
    doc="Flagship J1+A1+P6+L1 work-selection shape (telegraph_processor.py:81-91): "
    "open orders with no returned lineitem yet — 'what do we crawl next'.",
)
def q_work_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")
    processed = lineitem.where(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        orders.where(F.col("o_orderstatus") != "F")
        .select("o_orderkey")
        .distinct()
        .join(processed, F.col("o_orderkey") == processed["l_orderkey"], "left_anti")
        .orderBy("o_orderkey")
        .limit(1000)
    )


@register(
    "incremental_scan",
    """
    SELECT event_id, user_id
    FROM events
    WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL 7 DAY
    """,
    doc="S2 incremental time-bounded scan (message_scraper.py:97-100): watermark "
    "predicate relative to the stream head (current_timestamp is frozen to max(ts) "
    "for determinism, F13 policy).",
)
def q_incremental_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    head = events.agg(F.max("ts").alias("__head"))
    return (
        events.crossJoin(F.broadcast(head))
        .where(F.col("ts") >= F.col("__head") - F.expr("INTERVAL 7 DAYS"))
        .select("event_id", "user_id")
    )


# ---------------------------------------------------------------------------
# Aggregations (A-group)
# ---------------------------------------------------------------------------


@register(
    "message_stats",
    """
    SELECT count(*)                         AS total_events,
           count(DISTINCT user_id)          AS unique_users,
           count(props)                     AS events_with_props,
           count(*) - count(DISTINCT user_id) AS duplicate_events
    FROM events
    """,
    doc="A2 count-star + count-distinct + count-non-null in one scan "
    "(duplicate_remover.py:246-252), on the events table.",
)
def q_message_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    return events.agg(
        F.count(F.lit(1)).alias("total_events"),
        F.countDistinct("user_id").alias("unique_users"),
        F.count("props").alias("events_with_props"),
    ).withColumn("duplicate_events", F.col("total_events") - F.col("unique_users"))


@register(
    "conditional_agg",
    """
    SELECT count(CASE WHEN o_orderstatus = 'F' THEN 1 END)  AS n_final,
           count(CASE WHEN o_orderstatus <> 'F' THEN 1 END) AS n_open,
           count(DISTINCT o_orderpriority)                  AS n_priorities
    FROM orders
    """,
    doc="A3 conditional aggregates (duplicate_remover.py:259-266).",
)
def q_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return orders.agg(
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_final"),
        F.count(F.when(F.col("o_orderstatus") != "F", 1)).alias("n_open"),
        F.countDistinct("o_orderpriority").alias("n_priorities"),
    )


@register(
    "anti_join_count",
    """
    SELECT count(*) AS n_orphans
    FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
    doc="A4/J2 anti-join count (duplicate_remover.py:273-283): customers with no "
    "orders. o_custkey is non-null so NOT IN == left_anti.",
)
def q_anti_join_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    orphans = customer.join(
        orders.select("o_custkey"), customer["c_custkey"] == F.col("o_custkey"), "left_anti"
    )
    return orphans.agg(F.count(F.lit(1)).alias("n_orphans"))


@register(
    "group_by_status",
    """
    SELECT o_orderstatus, count(*) AS n,
           SUM(CAST(FLOOR(o_totalprice * 10000) AS BIGINT)) / 10000.0 AS total_price
    FROM orders GROUP BY o_orderstatus
    """,
    doc="Grouped aggregate surface implied by the stats report (SURVEY.md §2.4); "
    "fixed-point-bridged SUM for cross-engine determinism.",
)
def q_group_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        _xsum(F.col("o_totalprice")).alias("total_price"),
    )


@register(
    "pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           SUM(CAST(FLOOR(l_quantity * 10000) AS BIGINT)) / 10000.0      AS sum_qty,
           SUM(CAST(FLOOR(l_extendedprice * 10000) AS BIGINT)) / 10000.0 AS sum_base_price,
           SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) / 10000.0 AS sum_disc_price,
           SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 10000) AS BIGINT)) / 10000.0 AS sum_charge,
           SUM(CAST(FLOOR(l_quantity * 10000) AS BIGINT)) / 10000.0 / count(*)      AS avg_qty,
           SUM(CAST(FLOOR(l_extendedprice * 10000) AS BIGINT)) / 10000.0 / count(*) AS avg_price,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1-shaped pricing summary — the headline scan+agg benchmark query; "
    "exercises predicate pushdown, map-side partial agg, fixed-point-bridge exactness.",
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc * (1 + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _xsum(F.col("l_quantity")).alias("sum_qty"),
            _xsum(F.col("l_extendedprice")).alias("sum_base_price"),
            _xsum(disc).alias("sum_disc_price"),
            _xsum(charge).alias("sum_charge"),
            (_xsum(F.col("l_quantity")) / F.count(F.lit(1))).alias("avg_qty"),
            (_xsum(F.col("l_extendedprice")) / F.count(F.lit(1))).alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Joins (J-group)
# ---------------------------------------------------------------------------


@register(
    "semi_join",
    """
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 200000)
    """,
    doc="J4 semi-join: customers having at least one large order.",
)
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    big = orders.where(F.col("o_totalprice") > 200000).select("o_custkey")
    return customer.join(
        big, customer["c_custkey"] == big["o_custkey"], "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "orphan_rewrite",
    """
    SELECT o_orderkey,
           CASE WHEN o_custkey IS NOT NULL
                 AND o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_acctbal > 0)
                THEN NULL ELSE o_custkey END AS o_custkey
    FROM orders
    """,
    doc="J3 anti-join-driven UPDATE (duplicate_remover.py:120-129): null out keys "
    "pointing at no surviving dimension row (dimension filtered to c_acctbal>0).",
)
def q_orphan_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.antijoin import null_out_orphans

    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer").where(F.col("c_acctbal") > 0)
    rewritten = null_out_orphans(orders, customer, link_col="o_custkey", url_col="c_custkey")
    return rewritten.select("o_orderkey", "o_custkey")


@register(
    "join_agg_nation_revenue",
    """
    SELECT n_name,
           SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) / 10000.0 AS revenue,
           count(*) AS n_items
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = (SELECT min(r_name) FROM region)
    GROUP BY n_name
    """,
    doc="TPC-H Q5-shaped multi-join: fact-to-fact shuffle join plus broadcast "
    "dimension joins (nation/region auto-broadcast under Catalyst).",
)
def q_join_agg_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    r0 = region.agg(F.min("r_name").alias("r0"))
    region_f = region.join(F.broadcast(r0), region["r_name"] == F.col("r0")).drop("r0")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region_f), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            _xsum(disc).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# Windows (W-group), sorts/limits (L-group)
# ---------------------------------------------------------------------------


@register(
    "keep_latest_dedup",
    """
    SELECT user_id, event_id, event_type
    FROM (
      SELECT user_id, event_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    doc="W1 keep-latest dedup (duplicate_remover.py:28-47) with the engine's "
    "deterministic tiebreak: latest event per user.",
)
def q_keep_latest_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.dedup import keep_latest

    events = _t(spark, sf_dir, "events")
    return keep_latest(events, "user_id", "ts", tiebreak="event_id").select(
        "user_id", "event_id", "event_type"
    )


@register(
    "keep_first_dedup_exempt",
    """
    SELECT user_id, event_id FROM (
      SELECT user_id, event_id,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS rn
      FROM events WHERE event_type <> 'signup'
    ) WHERE rn = 1
    UNION ALL
    SELECT user_id, event_id FROM events WHERE event_type = 'signup'
    """,
    doc="W2 keep-first dedup with exemption (duplicate_remover.py:74-95): first "
    "event per user; 'signup' rows are exempt and all preserved (the reference "
    "exempts null/empty content_hash).",
)
def q_keep_first_dedup_exempt(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.dedup import keep_first

    events = _t(spark, sf_dir, "events")
    exempt = F.col("event_type") == "signup"
    return keep_first(
        events, "user_id", "ts", tiebreak="event_id", exempt=exempt
    ).select("user_id", "event_id")


@register(
    "top_orders",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10
    """,
    doc="L3 top-k (message_scraper.py:87-100 newest-first cap) — compiles to "
    "TakeOrderedAndProject, no global sort.",
)
def q_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.topk import top_k

    orders = _t(spark, sf_dir, "orders")
    return top_k(orders, [F.desc("o_totalprice"), F.asc("o_orderkey")], 10).select(
        "o_orderkey", "o_totalprice"
    )


# ---------------------------------------------------------------------------
# Merge / upsert (S7/S9)
# ---------------------------------------------------------------------------

_MERGE_ORACLE = """
    WITH t AS (
      SELECT event_id, user_id, value, ts, 0 AS prio FROM events WHERE event_id % 3 <> 0
    ), u AS (
      SELECT event_id, user_id, value + 1000 AS value, ts, 1 AS prio FROM events WHERE event_id % 2 = 0
    ), unioned AS (
      SELECT * FROM u UNION ALL SELECT * FROM t
    ), ranked AS (
      SELECT event_id, user_id, value,
             ROW_NUMBER() OVER (PARTITION BY event_id ORDER BY prio DESC, ts DESC, event_id DESC) AS rn
      FROM unioned
    )
    SELECT event_id, user_id, value FROM ranked WHERE rn = 1
"""


@register(
    "merge_upsert",
    _MERGE_ORACLE,
    doc="S7 last-writer-wins upsert (db_loader.py:166-181) as union+window-dedup: "
    "target = events with id%3<>0, updates = events with id%2=0 and value+1000; "
    "updates win on conflict.",
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.merge import merge_upsert

    events = _t(spark, sf_dir, "events").select("event_id", "user_id", "value", "ts")
    target = events.where(F.col("event_id") % 3 != 0)
    updates = events.where(F.col("event_id") % 2 == 0).withColumn(
        "value", F.col("value") + 1000
    )
    merged = merge_upsert(target, updates, key="event_id", order_col="ts")
    return merged.select("event_id", "user_id", "value")


@register(
    "upsert_accumulate",
    """
    SELECT COALESCE(u.event_id, t.event_id) AS event_id,
           CASE WHEN u.event_id IS NOT NULL THEN COALESCE(t.retry_count, 0) + 1
                ELSE t.retry_count END AS retry_count
    FROM (SELECT event_id, 0 AS retry_count FROM events WHERE event_id % 3 <> 0) t
    FULL OUTER JOIN (SELECT event_id FROM events WHERE event_id % 2 = 0) u
      ON t.event_id = u.event_id
    """,
    doc="S9 accumulate upsert (telegraph_processor.py:308-315): retry_count "
    "increments on conflict instead of last-writer-wins; inserts start at 1.",
)
def q_upsert_accumulate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.merge import upsert_accumulate

    events = _t(spark, sf_dir, "events")
    target = events.where(F.col("event_id") % 3 != 0).select(
        "event_id", F.lit(0).alias("retry_count")
    )
    updates = events.where(F.col("event_id") % 2 == 0).select("event_id")
    merged = upsert_accumulate(
        target, updates, key="event_id", accumulate={"retry_count": "increment"}
    )
    return merged.select("event_id", "retry_count")


# ---------------------------------------------------------------------------
# Event-time windows (§2.9 streaming surface, batch-checkable)
# ---------------------------------------------------------------------------


@register(
    "tumbling_window",
    """
    SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS window_start,
           count(*) AS n_events,
           SUM(CAST(FLOOR(value * 10000) AS BIGINT)) / 10000.0 AS sum_value
    FROM events
    GROUP BY 1
    """,
    doc="Tumbling event-time window (1h) — F.window; start surfaced as epoch "
    "seconds for timezone-proof comparison.",
)
def q_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _xsum(F.col("value")).alias("sum_value"),
        )
        .select(
            F.col("w.start").cast("long").alias("window_start"), "n_events", "sum_value"
        )
    )


@register(
    "sliding_window",
    """
    SELECT CAST(FLOOR(epoch(ts) / 1800) * 1800 - off AS BIGINT) AS window_start,
           count(*) AS n_events
    FROM events CROSS JOIN (SELECT unnest([0, 1800]) AS off) offsets
    GROUP BY 1
    """,
    doc="Sliding window (1h every 30m) — F.window with slide; each event lands in "
    "exactly two buckets.",
)
def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").cast("long").alias("window_start"), "n_events")
    )


@register(
    "session_window",
    """
    SELECT user_id, count(*) AS n_sessions
    FROM (
      SELECT user_id,
             CASE WHEN prev_ts IS NULL OR ts - prev_ts >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS session_start
      FROM (
        SELECT user_id, ts,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM events
      )
    ) WHERE session_start = 1
    GROUP BY user_id
    """,
    doc="Session windows (30m gap) — F.session_window batch form vs the "
    "gaps-and-islands SQL oracle. Spark sessions are half-open: a gap of exactly "
    "30m starts a new session.",
)
def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    sessions = events.groupBy(
        "user_id", F.session_window("ts", "30 minutes").alias("w")
    ).agg(F.count(F.lit(1)).alias("n"))
    return sessions.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_sessions"))


