"""Named queries + DuckDB oracles over the driver testdata.

Each entry exercises one operator family from SURVEY.md §2 against the
TPC-H-ish tables (FIXTURES.md §B mapping). Conventions that make the
driver's order-insensitive value-hash comparison deterministic:

- **Fixed-point bridge for float aggregates.** Double summation order
  is nondeterministic in both engines, and double→decimal casts round
  differently (Spark converts via exact BigDecimal + HALF_UP; DuckDB
  scales in double arithmetic), so any SUM over doubles goes through
  ``FLOOR(x * 10000)`` → int64: per-row double multiply is
  IEEE-identical in Spark and DuckDB, FLOOR is unambiguous, and int64
  addition is exact and order-free — both engines produce bit-identical
  sums, surfaced as ``sum/10000.0`` DOUBLE. Averages divide the exact
  sum by the count.
- **Epoch-second integers for windows.** Timestamp rendering and
  session timezones differ across engines; window starts are returned
  as BIGINT epoch seconds.
- **Deterministic LIMIT.** Every LIMIT carries a total ORDER BY with a
  unique tiebreak column.
- **NOT IN only over provably non-null keys** (J1 null-semantics note,
  SURVEY.md §2.3).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pasta_pipeline_spark.operators.similarity import DEFAULT_BUCKET_CAP
from pasta_pipeline_spark.schemas import load_table


@dataclass(frozen=True)
class QuerySpec:
    """One catalog entry: the Spark implementation and (when
    SQL-expressible) the equivalent DuckDB oracle."""

    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    def wrap(fn):
        # registration is append-only (the driver's correctness window
        # keys on position): a duplicate name would silently SHADOW an
        # earlier query's implementation and oracle — fail loud instead
        if name in REGISTRY:
            raise ValueError(f"duplicate catalog query name: {name!r}")
        REGISTRY[name] = QuerySpec(spark_fn=fn, oracle=oracle, doc=doc)
        return fn

    return wrap


def spark_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.spark_fn for name, spec in REGISTRY.items()}


def oracle_queries() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


def _tp(spark, sf_dir, name):
    """Like _t, but guarantees session-level parallelism: the per-row
    compute-heavy queries (HOF/regex expression chains over documents)
    would otherwise run as wide as the parquet row-group count — one
    task for the single-row-group local test files. No-op when the
    input already has enough partitions (the real-scale case)."""
    from pasta_pipeline_spark.operators.util import ensure_parallelism

    return ensure_parallelism(load_table(spark, sf_dir, name))


#: Fixed-point sum scale — see module docstring.
_XS = 10000


def _xsum(expr):
    """Cross-engine-exact SUM of a double expression (fixed-point
    bridge). SQL twin: ``SUM(CAST(FLOOR(x * 10000) AS BIGINT)) / 10000.0``."""
    return F.sum(F.floor(expr * F.lit(_XS)).cast("long")) / F.lit(float(_XS))


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


# ---------------------------------------------------------------------------
# Extension surface: text analysis (SURVEY.md §7 M6)
# ---------------------------------------------------------------------------


@register(
    "doc_hashes",
    """
    SELECT doc_id,
           CASE WHEN text IS NULL OR text = '' THEN '' ELSE md5(text) END AS content_hash
    FROM documents
    """,
    doc="F4 content hashing (telegraph_processor.py:128-132) over documents; "
    "null/empty → '' like the reference.",
)
def q_doc_hashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.functions.hashing import md5_or_empty

    docs = _tp(spark, sf_dir, "documents")
    return docs.select("doc_id", md5_or_empty("text").alias("content_hash"))


@register(
    "doc_word_count",
    """
    SELECT doc_id,
           CAST(COALESCE(len(list_filter(regexp_split_to_array(text, '\\s+'), y -> y <> '')), 0) AS BIGINT) AS n_words
    FROM documents
    """,
    doc="F6/A5 word count (telegraph_processor.py:142-146): Python str.split() "
    "semantics — whitespace runs, no empty tokens.",
)
def q_doc_word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.functions.text import word_count

    docs = _tp(spark, sf_dir, "documents")
    return docs.select("doc_id", word_count("text").cast("long").alias("n_words"))


@register(
    "extract_pattern_tokens",
    """
    SELECT doc_id,
           CAST(COALESCE(len(list_distinct(regexp_extract_all(text, '(s[a-z]+)', 1))), 0) AS BIGINT) AS n_matches,
           list_extract(regexp_extract_all(text, '(s[a-z]+)', 1), 1) AS first_match
    FROM documents
    """,
    doc="F1/F2 extraction machinery (utils.py:4-33) exercised on real data: "
    "regexp_extract_all group capture + order-preserving dedup + first match.",
)
def q_extract_pattern_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _tp(spark, sf_dir, "documents")
    matches = F.regexp_extract_all(F.col("text"), F.lit("(s[a-z]+)"), 1)
    return docs.select(
        "doc_id",
        F.coalesce(F.size(F.array_distinct(matches)), F.lit(0)).cast("long").alias("n_matches"),
        F.get(matches, 0).alias("first_match"),
    )


@register(
    "doc_fingerprint",
    """
    SELECT doc_id,
           md5(array_to_string(list_filter(regexp_split_to_array(lower(text), '\\s+'), y -> y <> ''), ' ')) AS fingerprint
    FROM documents
    """,
    doc="Normalized document fingerprint (extension tier 1 of the dedup ladder): "
    "md5 over lowercased, whitespace-normalized token join.",
)
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.functions.hashing import content_fingerprint

    docs = _tp(spark, sf_dir, "documents")
    return docs.select("doc_id", content_fingerprint("text").alias("fingerprint"))


@register(
    "lang_stats",
    """
    SELECT lang, source, count(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(n_chars) * 10000 // count(*) AS BIGINT) / 10000.0 AS avg_chars
    FROM documents
    GROUP BY lang, source
    """,
    doc="Grouped text-corpus statistics (per-language/source profile). "
    "total_chars is cast to BIGINT in the oracle (DuckDB SUM(INT) yields "
    "HUGEINT, which pandas renders as float64); avg_chars goes through the "
    "int64 fixed-point bridge so both engines divide the same int64 by "
    "10000.0 — bitwise-identical doubles (NOTES.md playbook #1).",
)
def q_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        (F.expr("(sum(n_chars) * 10000L) div count(1)") / F.lit(10000.0)).alias(
            "avg_chars"
        ),
    )


_LANG_ID_ORACLE = """
    WITH scored AS (
      SELECT doc_id, text,
             len(list_filter(list_filter(regexp_split_to_array(lower(text), '\\s+'), y -> y <> ''),
                 x -> x IN ('the','a','and','of','to','in','is','it','that','for'))) AS h_en,
             len(list_filter(list_filter(regexp_split_to_array(lower(text), '\\s+'), y -> y <> ''),
                 x -> x IN ('der','die','das','und','ist','nicht','ein','mit','auf','zu'))) AS h_de,
             len(list_filter(list_filter(regexp_split_to_array(lower(text), '\\s+'), y -> y <> ''),
                 x -> x IN ('le','la','les','et','est','un','une','dans','pour','que'))) AS h_fr,
             len(list_filter(list_filter(regexp_split_to_array(lower(text), '\\s+'), y -> y <> ''),
                 x -> x IN ('el','la','los','las','es','un','una','en','por','para'))) AS h_es
      FROM documents
    )
    SELECT doc_id,
           CASE WHEN regexp_matches(text, '[Ѐ-ӿ]') THEN 'ru'
                WHEN regexp_matches(text, '[一-鿿]') THEN 'zh'
                WHEN greatest(h_en, h_de, h_fr, h_es) <= 0 THEN 'und'
                WHEN h_en = greatest(h_en, h_de, h_fr, h_es) THEN 'en'
                WHEN h_de = greatest(h_en, h_de, h_fr, h_es) THEN 'de'
                WHEN h_fr = greatest(h_en, h_de, h_fr, h_es) THEN 'fr'
                WHEN h_es = greatest(h_en, h_de, h_fr, h_es) THEN 'es'
                ELSE 'und' END AS detected_lang
    FROM scored
"""


@register(
    "lang_id",
    _LANG_ID_ORACLE,
    doc="Deterministic language-ID heuristic (extension): script detection "
    "(Cyrillic/CJK regex) + stopword-profile argmax with fixed tie order.",
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.text_analysis import detect_language

    docs = _tp(spark, sf_dir, "documents")
    return docs.select("doc_id", detect_language("text").alias("detected_lang"))


_QUALITY_ORACLE = """
    WITH base AS (
      SELECT doc_id, text,
             len(list_filter(regexp_split_to_array(lower(text), '\\s+'), y -> y <> '')) AS n_tok,
             length(regexp_replace(text, '\\s+', '', 'g')) AS n_nonspace,
             length(regexp_replace(text, '[^A-Za-zА-Яа-я一-鿿]+', '', 'g')) AS n_alpha,
             len(list_filter(list_filter(regexp_split_to_array(lower(text), '\\s+'), y -> y <> ''),
                 x -> x IN ('the','a','and','of','to','in','is','it','that','for'))) AS h_en
      FROM documents
    )
    SELECT doc_id,
           CASE WHEN text IS NULL OR trim(text) = '' THEN 0.0 ELSE
             (least(CAST(n_tok AS DOUBLE) / 64.0, 1.0)
              + (CASE WHEN n_nonspace > 0 THEN CAST(n_alpha AS DOUBLE) / CAST(n_nonspace AS DOUBLE) ELSE 0.0 END)
              + (CASE WHEN n_tok > 0 THEN least(4.0 * CAST(h_en AS DOUBLE) / CAST(n_tok AS DOUBLE), 1.0) ELSE 0.0 END)
              + (CASE WHEN n_tok > 0
                       AND CAST(n_nonspace AS DOUBLE) / CAST(n_tok AS DOUBLE) >= 3.0
                       AND CAST(n_nonspace AS DOUBLE) / CAST(n_tok AS DOUBLE) <= 12.0
                      THEN 1.0 ELSE 0.0 END)
             ) / 4.0
           END AS score
    FROM base
"""


@register(
    "quality_score",
    _QUALITY_ORACLE,
    doc="Deterministic document-quality heuristic (extension): length, alpha "
    "ratio, stopword ratio, mean-token-length components — all derived from "
    "integer counts so the double math is cross-engine exact.",
)
def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.text_analysis import quality_score

    docs = _tp(spark, sf_dir, "documents")
    return docs.select("doc_id", quality_score("text").alias("score"))


@register(
    "token_count_lexical",
    """
    SELECT doc_id,
           CAST(COALESCE(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')), 0) AS BIGINT) AS n_lexical
    FROM documents
    """,
    doc="BPE-ish lexical token count (extension): letter runs + digit runs + "
    "punctuation marks, a deterministic subword-budget proxy.",
)
def q_token_count_lexical(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.text_analysis import token_count_lexical

    docs = _tp(spark, sf_dir, "documents")
    return docs.select("doc_id", token_count_lexical("text").alias("n_lexical"))


# ---------------------------------------------------------------------------
# Extension surface: dedup ladder (SURVEY.md §7 M6)
# ---------------------------------------------------------------------------


@register(
    "dedup_exact",
    """
    SELECT md5(text) AS text_hash, count(*) AS n_copies, min(doc_id) AS keep_id
    FROM documents GROUP BY md5(text)
    """,
    doc="Dedup tier 0 — exact hash-groupBy (content_hash generalized, "
    "duplicate_remover.py:74-95): survivor = smallest doc_id.",
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.text_dedup import exact_duplicate_groups

    docs = _t(spark, sf_dir, "documents")
    return exact_duplicate_groups(docs, "doc_id", "text")


@register(
    "dedup_fingerprint",
    """
    SELECT md5(array_to_string(list_filter(regexp_split_to_array(lower(text), '\\s+'), y -> y <> ''), ' ')) AS fingerprint,
           count(*) AS n_copies, min(doc_id) AS keep_id
    FROM documents GROUP BY 1
    """,
    doc="Dedup tier 1 — whitespace/case-normalized fingerprint groups.",
)
def q_dedup_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.text_dedup import fingerprint_duplicate_groups

    docs = _t(spark, sf_dir, "documents")
    return fingerprint_duplicate_groups(docs, "doc_id", "text")


_JACCARD_ORACLE = """
    WITH toks AS (
      SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\\s+'), y -> y <> '') AS t FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id,
             CASE WHEN len(t) >= 3 THEN t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                  ELSE array_to_string(t, ' ') END AS s
      FROM (SELECT doc_id, t, unnest(generate_series(1, greatest(len(t) - 2, 1))) AS i FROM toks)
    ), sizes AS (
      SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
    ), common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(n_common AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE) AS jaccard
    FROM common
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(n_common AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE) >= 0.5
"""


@register(
    "ngram_jaccard_pairs",
    _JACCARD_ORACLE,
    doc="Dedup tier 3 — exact 3-gram shingle-set Jaccard >= 0.5 via explode + "
    "self-equi-join on shingle (cost tracks true overlap, not n²); docs shorter "
    "than 3 tokens contribute their whole text as one shingle.",
)
def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.text_dedup import jaccard_pairs

    docs = _t(spark, sf_dir, "documents")
    return jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5)


_SIMHASH_ORACLE = """
    WITH toks AS (
      SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'), y -> y <> '')) AS tok
      FROM documents
    ), h AS (
      SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM toks
    ), bits AS (
      SELECT doc_id, b,
             SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
      FROM h CROSS JOIN (SELECT unnest(generate_series(0, 59)) AS b) bs
      GROUP BY doc_id, b
    ), sig AS (
      SELECT doc_id, SUM(CASE WHEN s > 0 THEN (1::BIGINT << b) ELSE 0::BIGINT END) AS simhash
      FROM bits GROUP BY doc_id
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""


@register(
    "simhash_pairs",
    _SIMHASH_ORACLE,
    doc="Dedup tier 2 — 60-bit SimHash (md5-derived token hashes, cross-engine "
    "exact), pairs within Hamming distance 3. Spark prunes candidates by 15-bit "
    "chunk pigeonhole (no n² scan); the oracle brute-forces — identical result "
    "set because hamming<=3 implies a shared chunk.",
)
def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.text_dedup import simhash_pairs

    docs = _t(spark, sf_dir, "documents")
    return simhash_pairs(docs, "doc_id", "text", max_hamming=3)


@register(
    "minhash_lsh_pairs",
    _JACCARD_ORACLE,  # LSH can miss pairs in general (inherent false
    # negatives), but with 64 perms / 16 bands at J>=0.5 its recall on this
    # corpus is exactly 1.0 and the operator is fully deterministic — so its
    # output provably equals the exact tier-3 answer, which this oracle is.
    # Verified at sf0.001 and sf0.01 (pairs and jaccard values identical).
    doc="Dedup tier 4 — MinHash (64 perms) banded LSH (16 bands) candidate "
    "generation + exact-Jaccard verification at >= 0.5; output matches the "
    "exact n-gram oracle on this corpus (recall 1.0, deterministic).",
)
def q_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.text_dedup import minhash_lsh_pairs

    docs = _t(spark, sf_dir, "documents")
    return minhash_lsh_pairs(docs, "doc_id", "text", n=3, num_hashes=64, bands=16, threshold=0.5)


# ---------------------------------------------------------------------------
# Extension surface: embedding similarity search (SURVEY.md §7 M6)
# ---------------------------------------------------------------------------

_COSINE_TOPK_ORACLE = """
    WITH q AS (
      SELECT embedding::DOUBLE[] AS qv FROM embeddings
      WHERE vec_id = (SELECT min(vec_id) FROM embeddings)
    )
    SELECT vec_id,
           list_dot_product(embedding::DOUBLE[], qv)
             / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                * sqrt(list_dot_product(qv, qv))) AS sim
    FROM embeddings, q
    ORDER BY sim DESC, vec_id ASC
    LIMIT 10
"""


@register(
    "cosine_topk",
    _COSINE_TOPK_ORACLE,
    doc="Similarity search — exact brute-force cosine top-10 for the lowest "
    "vec_id's embedding. Bit-identical across engines: float→double casts "
    "before arithmetic + sequential fold (matches DuckDB list_dot_product).",
)
def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.similarity import cosine_topk

    emb = _t(spark, sf_dir, "embeddings")
    query = emb.orderBy("vec_id").limit(1).select(F.col("embedding").alias("qv"))
    return cosine_topk(emb, query, k=10)


_KNN_ORACLE = """
    WITH q AS (
      SELECT vec_id AS qid, embedding::DOUBLE[] AS qv FROM embeddings
      ORDER BY vec_id LIMIT 5
    ), scored AS (
      SELECT q.qid, e.vec_id,
             list_dot_product(e.embedding::DOUBLE[], q.qv)
               / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                  * sqrt(list_dot_product(q.qv, q.qv))) AS sim
      FROM embeddings e CROSS JOIN q
    )
    SELECT qid, vec_id, sim FROM (
      SELECT qid, vec_id, sim,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id ASC) AS rn
      FROM scored
    ) WHERE rn <= 5
"""


@register(
    "knn_join",
    _KNN_ORACLE,
    doc="Similarity search — exact 5-NN join for the 5 lowest vec_ids: one "
    "corpus scan with the query side broadcast, per-query window ranking.",
)
def q_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.similarity import knn_join

    emb = _t(spark, sf_dir, "embeddings")
    queries = (
        emb.orderBy("vec_id")
        .limit(5)
        .select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qv"))
    )
    return knn_join(emb, queries, k=5)


def _cosine_sql(vec: str, q: str) -> str:
    """DuckDB cosine twin of similarity.cosine (list_dot_product folds
    sequentially like F.aggregate, so the doubles are bit-identical)."""
    return (
        f"list_dot_product({vec}, {q}) / "
        f"(sqrt(list_dot_product({vec}, {vec})) * sqrt(list_dot_product({q}, {q})))"
    )


def _ann_lsh_oracle(dim: int = 64, num_planes: int = 6, k: int = 10) -> str:
    """Exact DuckDB twin of q_ann_lsh_topk: the hyperplanes are
    deterministic (splitmix64-mixed indices, similarity._hyperplane), so
    the 'approximate' path is reproducible — inline the plane constants
    as a VALUES list (same technique as _LANG_ID_ORACLE) and replay the
    bucket assignment + 1-bit multiprobe + exact rerank in SQL."""
    from pasta_pipeline_spark.operators.similarity import _hyperplane

    plane_rows = ",\n        ".join(
        f"({p}, [{', '.join(repr(c) for c in _hyperplane(dim, p))}]::DOUBLE[])"
        for p in range(num_planes)
    )
    probes = ", ".join(
        ["qbucket"] + [f"xor(qbucket, {1 << p})" for p in range(num_planes)]
    )
    return f"""
    WITH planes(pidx, pv) AS (VALUES
        {plane_rows}),
    q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings ORDER BY vec_id LIMIT 1),
    eb AS (
      SELECT vec_id, embedding,
             CAST(SUM(CASE WHEN list_dot_product(embedding::DOUBLE[], pv) >= 0
                           THEN 1::BIGINT << pidx ELSE 0 END) AS BIGINT) AS bucket
      FROM embeddings CROSS JOIN planes GROUP BY vec_id, embedding
    ),
    qb AS (
      SELECT qv,
             CAST(SUM(CASE WHEN list_dot_product(qv, pv) >= 0
                           THEN 1::BIGINT << pidx ELSE 0 END) AS BIGINT) AS qbucket
      FROM q CROSS JOIN planes GROUP BY qv
    ),
    probed AS (SELECT qv, unnest([{probes}]) AS bucket FROM qb)
    SELECT vec_id, {_cosine_sql('embedding::DOUBLE[]', 'qv')} AS sim
    FROM eb JOIN probed USING (bucket)
    ORDER BY sim DESC, vec_id ASC LIMIT {k}
    """


@register(
    "ann_lsh_topk",
    _ann_lsh_oracle(),
    doc="Similarity search — sign-LSH (6 deterministic hyperplanes → 64 "
    "buckets) ANN top-10 with 1-bit multiprobe; the 100 TB scale path (bucket "
    "join instead of full scan). Plane count scales with corpus size in a real "
    "deployment. The planes are deterministic, so the oracle replays the "
    "identical bucket assignment in DuckDB with inlined plane constants.",
)
def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.similarity import ann_topk_lsh

    emb = _t(spark, sf_dir, "embeddings")
    query = emb.orderBy("vec_id").limit(1).select(F.col("embedding").alias("qv"))
    dim = 64
    return ann_topk_lsh(emb, query, dim=dim, k=10, num_planes=6)


# ---------------------------------------------------------------------------
# Extension surface: multimodal column plumbing (SURVEY.md §7 M6)
# ---------------------------------------------------------------------------

_MEDIA_ORACLE = """
    SELECT doc_id AS media_id,
           'text' AS media_type,
           CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
           md5(text) AS content_md5,
           CAST(('0x' || substr(md5(text), 1, 4))::BIGINT % 1920 + 1 AS INT) AS width,
           CAST(('0x' || substr(md5(text), 5, 4))::BIGINT % 1080 + 1 AS INT) AS height,
           CAST(NULL AS BIGINT) AS duration_ms,
           CAST(NULL AS INT) AS sample_rate
    FROM documents
"""


@register(
    "media_features",
    _MEDIA_ORACLE,
    doc="Multimodal plumbing — binary payload column (documents.text encoded to "
    "bytes) through the Arrow-batched mapInPandas decode stub: byte length, "
    "content md5, deterministic pseudo-dimensions. The Python stage is real; "
    "the codec is stubbed (no image libs in this container).",
)
def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.multimodal import extract_media_features

    docs = _tp(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text").alias("media_type"),
        F.col("text").cast("binary").alias("payload"),
    )
    return extract_media_features(media, decode="stub")


_MEDIA_REAL_ORACLE = """
    SELECT doc_id AS media_id,
           CASE WHEN doc_id % 2 = 0 THEN 'audio/wav' ELSE 'image/ppm' END AS media_type,
           CAST(CASE WHEN doc_id % 2 = 0
                THEN 44 + (400 + (doc_id % 97) * 8) * (1 + (doc_id // 2) % 2) * 2
                ELSE 9 + length(CAST(16 + doc_id % 64 AS VARCHAR))
                       + length(CAST(16 + (doc_id // 3) % 48 AS VARCHAR))
                       + 3 * (16 + doc_id % 64) * (16 + (doc_id // 3) % 48)
           END AS BIGINT) AS n_bytes,
           CAST(CASE WHEN doc_id % 2 = 1 THEN 16 + doc_id % 64 END AS INT) AS width,
           CAST(CASE WHEN doc_id % 2 = 1 THEN 16 + (doc_id // 3) % 48 END AS INT) AS height,
           CAST(CASE WHEN doc_id % 2 = 0
                THEN (400 + (doc_id % 97) * 8) * 1000 // (8000 + ((doc_id // 2) % 5) * 2000)
           END AS BIGINT) AS duration_ms,
           CAST(CASE WHEN doc_id % 2 = 0
                THEN 8000 + ((doc_id // 2) % 5) * 2000
           END AS INT) AS sample_rate
    FROM documents
"""




@register(
    "latest_events_topk",
    """
    SELECT event_id, user_id, ts
    FROM events
    ORDER BY ts DESC, event_id DESC
    LIMIT 1000
    """,
    doc="L2/L3 — the reference's scrape order: newest-first capped at 1000 "
    "(message_scraper.py:87-100); compiles to TakeOrderedAndProject (per-"
    "partition heap + driver merge of k rows, no global sort).",
)
def q_latest_events_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.topk import top_k

    events = _t(spark, sf_dir, "events")
    return top_k(events, [F.desc("ts"), F.desc("event_id")], 1000).select(
        "event_id", "user_id", "ts"
    )


@register(
    "retention_filter",
    """
    SELECT event_id
    FROM events
    WHERE NOT (ts < (SELECT max(ts) FROM events) - INTERVAL 14 DAY
               AND event_type <> 'purchase')
    """,
    doc="P9 retention delete (duplicate_remover.py:205-211): drop rows older "
    "than the retention window unless protected by status — expressed as the "
    "surviving set; 'now' frozen to max(ts) for determinism.",
)
def q_retention_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    head = events.agg(F.max("ts").alias("__head"))
    doomed = (
        F.col("ts") < F.col("__head") - F.expr("INTERVAL 14 DAYS")
    ) & (F.col("event_type") != "purchase")
    return (
        events.crossJoin(F.broadcast(head))
        .filter(~F.coalesce(doomed, F.lit(False)))
        .select("event_id")
    )


@register(
    "status_breakdown",
    """
    SELECT event_type AS status, count(*) AS n
    FROM events GROUP BY event_type ORDER BY status
    """,
    doc="P8 status predicates + per-status grouped counts (the stats surface, "
    "duplicate_remover.py:259-266 / SURVEY.md §2.4).",
)
def q_status_breakdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    return (
        events.groupBy(F.col("event_type").alias("status"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("status")
    )


@register(
    "salted_group_agg",
    """
    SELECT user_id, count(*) AS n_events,
           SUM(CAST(FLOOR(value * 10000) AS BIGINT)) / 10000.0 AS total_value
    FROM events GROUP BY user_id
    """,
    doc="Skew-resilient two-phase salted aggregation (SURVEY.md §4 posture): "
    "group by (key, salt) then recombine by key — bit-identical to a plain "
    "GROUP BY for decomposable aggregates, which is exactly what the oracle "
    "checks.",
)
def q_salted_group_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.skew import salted_agg

    events = _t(spark, sf_dir, "events")
    pre = events.select(
        "user_id", F.floor(F.col("value") * 10000).cast("long").alias("value_fp")
    )
    out = salted_agg(
        pre,
        keys=["user_id"],
        aggs={"n_events": ("count", ""), "total_fp": ("sum", "value_fp")},
        salt_buckets=16,
    )
    return out.select(
        "user_id", "n_events", (F.col("total_fp") / 10000.0).alias("total_value")
    )


@register(
    "top_revenue_orders",
    """
    SELECT o_orderkey, o_orderdate,
           SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) / 10000.0 AS revenue
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = (SELECT min(c_mktsegment) FROM customer)
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate  > TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY o_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderkey ASC
    LIMIT 10
    """,
    doc="TPC-H Q3-shaped shipping-priority query: selective dimension filter, "
    "two joins, grouped revenue, global top-k — the canonical join+agg+topk "
    "benchmark shape.",
)
def q_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")
    seg = customer.agg(F.min("c_mktsegment").alias("seg"))
    cust = customer.join(F.broadcast(seg), customer["c_mktsegment"] == F.col("seg")).select(
        "c_custkey"
    )
    disc_fp = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
    ).cast("long")
    return (
        orders.where(F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            lineitem.where(
                F.col("l_shipdate") > F.lit("1996-01-01 00:00:00").cast("timestamp")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderkey", "o_orderdate")
        .agg((F.sum(disc_fp) / 10000.0).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


def _banded_planes_sql(dim: int, num_planes: int, num_bands: int) -> str:
    """VALUES rows (band, pidx, pv) for the banded sign-LSH oracle —
    band b's plane p is the deterministic global hyperplane
    b*num_planes + p, exactly similarity.with_lsh_bands."""
    from pasta_pipeline_spark.operators.similarity import _hyperplane

    return ",\n        ".join(
        f"({band}, {p}, "
        f"[{', '.join(repr(c) for c in _hyperplane(dim, band * num_planes + p))}]"
        "::DOUBLE[])"
        for band in range(num_bands)
        for p in range(num_planes)
    )


def _banded_eb_sql(bucket_cap: int | None = None) -> str:
    """The banded-bucket CTE, optionally wrapped in the hot-bucket cap
    rank (similarity.cap_band_buckets' DuckDB twin: row_number over
    (band, bucket) ordered by md5 of the id's decimal rendering, id
    tiebreak). With ``bucket_cap`` set, the oracle replays the exact
    membership the Spark gate keeps, so the cap is hash-checked end to
    end at any scale, binding or not."""
    from pasta_pipeline_spark.operators.similarity import bucket_cap_rank_sql

    base = """
    eb0 AS (
      SELECT vec_id, embedding, band,
             CAST(SUM(CASE WHEN list_dot_product(embedding::DOUBLE[], pv) >= 0
                           THEN 1::BIGINT << pidx ELSE 0 END) AS BIGINT) AS bucket
      FROM embeddings CROSS JOIN planes GROUP BY vec_id, embedding, band
    )"""
    if bucket_cap is None:
        return base.replace("eb0 AS", "eb AS")
    return (
        base
        + f""",
    eb AS (
      SELECT vec_id, embedding, band, bucket FROM (
        SELECT vec_id, embedding, band, bucket,
               row_number() OVER (PARTITION BY band, bucket
                 ORDER BY {bucket_cap_rank_sql('vec_id')}) AS bkrn
        FROM eb0)
      WHERE bkrn <= {bucket_cap}
    )"""
    )


_BANDED_EB_SQL = _banded_eb_sql()


def _cosine_dup_lsh_oracle(
    dim: int = 64,
    num_planes: int = 4,
    num_bands: int = 2,
    threshold: float = 0.4,
    bucket_cap: int | None = DEFAULT_BUCKET_CAP,
) -> str:
    """Exact DuckDB twin of the banded-LSH near-dup path: the exact
    all-pairs join *restricted to sign-LSH band-bucket collisions*
    (OR over bands, deduped), with the deterministic plane constants
    inlined. The band restriction makes the 'approximate' result
    exactly reproducible, so the hash check covers both the banding
    and the cosine arithmetic."""
    cos = _cosine_sql("a.embedding::DOUBLE[]", "b.embedding::DOUBLE[]")
    return f"""
    WITH planes(band, pidx, pv) AS (VALUES
        {_banded_planes_sql(dim, num_planes, num_bands)}),{_banded_eb_sql(bucket_cap)},
    cand AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM eb a JOIN eb b
        ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id
    )
    SELECT c.id_a, c.id_b, {cos} AS sim
    FROM cand c
    JOIN embeddings a ON a.vec_id = c.id_a
    JOIN embeddings b ON b.vec_id = c.id_b
    WHERE {cos} >= {threshold}
    """


@register(
    "cosine_dup_pairs",
    _cosine_dup_lsh_oracle(),
    doc="Embedding-cosine near-dup pairs (vector tier of the dedup ladder), "
    "banded-LSH scale path: OR of 2 independent 4-plane sign-LSH bands "
    "gates the pair join (similarity.with_lsh_bands) — near-linear at "
    "100 TB instead of the O(n²) exact self-join, and recall GROWS with "
    "bands (1-(1-q^4)^2) so scale-up tunes bands, not planes. The oracle "
    "replays the identical banding in DuckDB, so every emitted pair is "
    "hash-checked end to end; use_lsh=False is the exact baseline.",
)
def q_cosine_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.similarity import cosine_dup_pairs

    emb = _t(spark, sf_dir, "embeddings")
    return cosine_dup_pairs(
        emb, threshold=0.4, use_lsh=True, dim=64, num_planes=4, num_bands=2
    )


@register(
    "embedding_centroids",
    """
    WITH exploded AS (
      SELECT label, unnest(generate_series(1, len(embedding))) AS pos1, embedding
      FROM embeddings
    )
    SELECT label, pos1 - 1 AS pos,
           SUM(CAST(FLOOR(embedding[pos1]::DOUBLE * 10000000) AS BIGINT)) / 10000000.0 / count(*) AS centroid
    FROM exploded GROUP BY label, pos1
    """,
    doc="Per-label centroid, one row per (label, dimension) via posexplode + "
    "fixed-point mean — grouped vector aggregation without UDFs.",
)
def q_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.similarity import label_centroids

    emb = _t(spark, sf_dir, "embeddings")
    return label_centroids(emb)


@register(
    "json_extract_agg",
    """
    SELECT event_type,
           CAST(SUM(try_cast(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
           count(try_cast(json_extract_string(props, '$.k') AS INT)) AS n_with_k
    FROM events GROUP BY event_type
    """,
    doc="JSON column surface (the reactions-JSONB analog, SURVEY.md §1.2): "
    "path extraction from the events.props JSON string + grouped aggregation. "
    "Oracle uses json_extract_string (unquoted, like Spark get_json_object) "
    "with try_cast, and casts SUM to BIGINT (DuckDB HUGEINT renders as "
    "float64 through pandas, breaking the value hash).",
)
def q_json_extract_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return events.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"), F.count(k).alias("n_with_k")
    )


_ZSCORE_ORACLE = """
    WITH ex AS (
      SELECT label, vec_id, CAST(pos1 - 1 AS INT) AS pos,
             CAST(FLOOR(embedding[pos1]::DOUBLE * 10000000) AS BIGINT) AS fp
      FROM (SELECT label, vec_id, embedding,
                   unnest(generate_series(1, len(embedding))) AS pos1
            FROM embeddings)
    ), st AS (
      SELECT label, pos, SUM(fp) AS sfp, SUM(fp * fp) AS sfp2, count(*) AS n
      FROM ex GROUP BY label, pos
    )
    SELECT ex.vec_id, ex.label, ex.pos,
           (ex.fp / 10000000.0 - sfp / 10000000.0 / n)
             / sqrt(greatest(sfp2 / 100000000000000.0 / n
                             - (sfp / 10000000.0 / n) * (sfp / 10000000.0 / n), 0.0)) AS z
    FROM ex JOIN st ON ex.label = st.label AND ex.pos = st.pos
"""


@register(
    "zscore_normalize",
    _ZSCORE_ORACLE,
    doc="Per-group normalization via grouped-map applyInPandas (one Arrow "
    "frame per label group): z-score each embedding dimension within its "
    "label. Means/variances come from exact int64 fixed-point sums inside "
    "the pandas worker, so the doubles match the SQL oracle bit-for-bit.",
)
def q_zscore_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.normalize import zscore_by_label

    emb = _t(spark, sf_dir, "embeddings")
    return zscore_by_label(emb)


def _ann_ivf_oracle(n_cells: int = 16, n_probe: int = 4, k: int = 10) -> str:
    """Exact DuckDB twin of q_ann_ivf_topk: seeding, cell assignment and
    probing are all deterministic, so the whole IVF pipeline replays in
    SQL — lowest-id seed centroids, argmax-cosine assignment (cell_id
    tiebreak), n_probe nearest cells, exact rerank."""
    cos_cv = _cosine_sql("e.embedding::DOUBLE[]", "c.cv")
    cos_qc = _cosine_sql("q.qv", "c.cv")
    cos_final = _cosine_sql("cand.embedding::DOUBLE[]", "q.qv")
    return f"""
    WITH cent AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id ASC) - 1 AS INT) AS cell_id,
             embedding::DOUBLE[] AS cv
      FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id ASC LIMIT {n_cells})
    ),
    q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings ORDER BY vec_id LIMIT 1),
    assigned AS (
      SELECT vec_id, embedding, cell_id FROM (
        SELECT e.vec_id, e.embedding, c.cell_id,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                  ORDER BY {cos_cv} DESC, c.cell_id ASC) AS rk
        FROM embeddings e CROSS JOIN cent c
      ) WHERE rk = 1
    ),
    qcells AS (
      SELECT cell_id FROM (
        SELECT c.cell_id, {cos_qc} AS csim FROM q CROSS JOIN cent c
      ) ORDER BY csim DESC, cell_id ASC LIMIT {n_probe}
    ),
    cand AS (SELECT a.vec_id, a.embedding FROM assigned a JOIN qcells USING (cell_id))
    SELECT cand.vec_id, {cos_final} AS sim
    FROM cand CROSS JOIN q
    ORDER BY sim DESC, cand.vec_id ASC LIMIT {k}
    """


@register(
    "ann_ivf_topk",
    _ann_ivf_oracle(),
    doc="IVF-flavored ANN top-10: deterministic seed centroids, one-scan "
    "cell assignment, n_probe-cell search — the partition-pruned scale "
    "path; k-means training slots in without changing the query. Fully "
    "deterministic, so the oracle replays seed/assign/probe/rerank in SQL.",
)
def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.similarity import ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    query = emb.orderBy("vec_id").limit(1).select(F.col("embedding").alias("qv"))
    return ivf_topk(emb, query, k=10, n_cells=16, n_probe=4)


@register(
    "brand_revenue",
    """
    SELECT p_brand,
           count(*) AS n_items,
           SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) / 10000.0 AS revenue,
           SUM(CAST(FLOOR(p_retailprice * 10000) AS BIGINT)) / 10000.0 AS retail_value
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
    doc="Fact-to-dimension join + grouped revenue per brand (part dimension "
    "broadcast; completes scan coverage of the part table).",
)
def q_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    disc_fp = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
    ).cast("long")
    retail_fp = F.floor(F.col("p_retailprice") * 10000).cast("long")
    return (
        lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            (F.sum(disc_fp) / 10000.0).alias("revenue"),
            (F.sum(retail_fp) / 10000.0).alias("retail_value"),
        )
    )


@register(
    "supplier_nation_balance",
    """
    SELECT n_name,
           count(*) AS n_suppliers,
           SUM(CAST(FLOOR(s_acctbal * 10000) AS BIGINT)) / 10000.0 AS total_balance
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
    """,
    doc="Supplier-dimension rollup by nation (completes scan coverage of the "
    "supplier table; both sides broadcast-small).",
)
def q_supplier_nation_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    bal_fp = F.floor(F.col("s_acctbal") * 10000).cast("long")
    return (
        supplier.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            (F.sum(bal_fp) / 10000.0).alias("total_balance"),
        )
    )


@register(
    "doc_rolling_hash",
    """
    SELECT doc_id,
           list_reduce(
             list_prepend(0::BIGINT,
               list_transform(list_filter(regexp_split_to_array(lower(text), '\\s+'), y -> y <> ''),
                              t -> ('0x' || substr(md5(t), 1, 7))::BIGINT)),
             (acc, x) -> (acc * 1000003 + x) % 2147483647) AS rhash
    FROM documents
    """,
    doc="Order-sensitive polynomial rolling-hash fingerprint over the token "
    "stream (incremental-update-friendly; the streaming fingerprint tier), "
    "exact int64 arithmetic in both engines.",
)
def q_doc_rolling_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.functions.hashing import rolling_hash

    docs = _tp(spark, sf_dir, "documents")
    return docs.select("doc_id", rolling_hash("text").alias("rhash"))


@register(
    "url_validation",
    """
    SELECT doc_id, url,
           (url LIKE 'https://telegra.ph/%' AND length(url) > length('https://telegra.ph/')) AS is_valid
    FROM (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN 'https://telegra.ph/' || source || '-' || doc_id
                  WHEN doc_id % 3 = 1 THEN 'https://example.com/' || doc_id
                  ELSE 'http://telegra.ph/' || doc_id END AS url
      FROM documents
    )
    """,
    doc="P7/F8 URL validation (telegraph_processor.py:117-125) over constructed "
    "URLs: scheme https + host telegra.ph + non-trivial path. The Spark side "
    "uses try_parse_url components; the oracle the equivalent string predicate "
    "(identical on well-formed inputs by construction).",
)
def q_url_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.functions.urls import is_valid_telegraph_url

    docs = _t(spark, sf_dir, "documents")
    url = (
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit("https://telegra.ph/"), F.col("source"), F.lit("-"), F.col("doc_id")),
        )
        .when(F.col("doc_id") % 3 == 1, F.concat(F.lit("https://example.com/"), F.col("doc_id")))
        .otherwise(F.concat(F.lit("http://telegra.ph/"), F.col("doc_id")))
    )
    return docs.select(
        "doc_id", url.alias("url"), is_valid_telegraph_url(url).alias("is_valid")
    )


_CLUSTERS_ORACLE = """
    WITH RECURSIVE pairs AS (
""" + _JACCARD_ORACLE.replace("documents", "documents", 1) + """
    ), edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM pairs
    ), cc(node, lbl) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.dst, c.lbl FROM cc c JOIN edges e ON c.node = e.src
    )
    SELECT node AS doc_id, min(lbl) AS cluster_id,
           (node = min(lbl)) AS is_survivor
    FROM cc GROUP BY node
"""


@register(
    "dedup_clusters",
    _CLUSTERS_ORACLE,
    doc="Duplicate-cluster assignment: connected components over the "
    "near-dup pair graph (3-gram Jaccard >= 0.5), labeled by the smallest "
    "member id = the deterministic survivor. Spark runs iterative min-label "
    "propagation (join-based CC, the 100 TB-scale form); the oracle computes "
    "the same closure with a recursive CTE.",
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.text_dedup import duplicate_clusters, jaccard_pairs
    from pasta_pipeline_spark.operators.util import release_cached_deps

    docs = _t(spark, sf_dir, "documents")
    pairs = jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5)
    out = duplicate_clusters(docs, pairs)
    # duplicate_clusters materialized the pair plan in its fixpoint
    # loop, so the shingle cache jaccard_pairs attached can go now
    release_cached_deps(pairs)
    return out


@register(
    "cheapest_part_per_type",
    """
    SELECT p.p_partkey, p.p_type, p.p_retailprice
    FROM part p
    WHERE p.p_retailprice = (SELECT min(p2.p_retailprice) FROM part p2 WHERE p2.p_type = p.p_type)
    ORDER BY p.p_partkey
    """,
    doc="TPC-H Q2-shaped correlated-min: parts priced at their type's minimum. "
    "Spark expresses the correlated scalar subquery as a window min — one "
    "shuffle instead of a rewritten join.",
)
def q_cheapest_part_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    w = Window.partitionBy("p_type")
    return (
        part.withColumn("__min_price", F.min("p_retailprice").over(w))
        .where(F.col("p_retailprice") == F.col("__min_price"))
        .select("p_partkey", "p_type", "p_retailprice")
        .orderBy("p_partkey")
    )


@register(
    "late_order_priority",
    """
    SELECT o_orderpriority, count(*) AS n_late
    FROM orders
    WHERE EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 60 DAY
    )
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4-shaped exists-aggregate: orders with any lineitem shipped "
    "60+ days after the order date, counted per priority — semi-join feeding "
    "an aggregation.",
)
def q_late_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    late = orders.join(lineitem, cond, "left_semi")
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_late"))


@register(
    "supplier_count_per_brand",
    """
    SELECT p_brand, count(DISTINCT l_suppkey) AS n_suppliers
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
    doc="TPC-H Q16-shaped distinct-count per group: supplier diversity per "
    "brand — grouped COUNT(DISTINCT) over a dimension join (two-phase "
    "aggregation under the hood).",
)
def q_supplier_count_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(F.countDistinct("l_suppkey").alias("n_suppliers"))
    )


@register(
    "user_event_history",
    """
    SELECT user_id,
           array_to_string(list_sort(list(event_type)), ',') AS history
    FROM events GROUP BY user_id
    """,
    doc="collect_list aggregation surface: per-user event-type multiset, "
    "sorted and joined to a scalar so the comparison is deterministic and "
    "hash-friendly (array-typed outputs render differently across engines).",
)
def q_user_event_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    return events.groupBy("user_id").agg(
        F.array_join(F.array_sort(F.collect_list("event_type")), ",").alias("history")
    )


@register(
    "pivot_event_counts",
    """
    SELECT user_id,
           count(CASE WHEN event_type = 'click'    THEN 1 END) AS n_click,
           count(CASE WHEN event_type = 'view'     THEN 1 END) AS n_view,
           count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
           count(CASE WHEN event_type = 'signup'   THEN 1 END) AS n_signup,
           count(CASE WHEN event_type = 'error'    THEN 1 END) AS n_error
    FROM events GROUP BY user_id
    """,
    doc="Pivot surface: per-user counts spread across a fixed event-type "
    "column set (explicit value list keeps the output schema deterministic; "
    "Spark compiles pivot to the same conditional-aggregate form the oracle "
    "spells out).",
)
def q_pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    kinds = ["click", "view", "purchase", "signup", "error"]
    pivoted = (
        events.groupBy("user_id")
        .pivot("event_type", kinds)
        .agg(F.count(F.lit(1)))
    )
    out = pivoted.select(
        "user_id", *[F.coalesce(F.col(k), F.lit(0)).alias(f"n_{k}") for k in kinds]
    )
    return out


@register(
    "set_ops_active_users",
    """
    SELECT user_id FROM (
      SELECT user_id FROM events WHERE ts <  TIMESTAMP '2024-01-15 00:00:00'
      INTERSECT
      SELECT user_id FROM events WHERE ts >= TIMESTAMP '2024-01-15 00:00:00'
    )
    EXCEPT
    SELECT user_id FROM events
    WHERE event_type = 'error' AND ts < TIMESTAMP '2024-01-03 00:00:00'
    """,
    doc="Set-operation surface (SURVEY.md §2.7): users active in both halves "
    "of the month (INTERSECT) minus those who errored in the first two days "
    "(EXCEPT).",
)
def q_set_ops_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    cut = F.lit("2024-01-15 00:00:00").cast("timestamp")
    first_half = events.where(F.col("ts") < cut).select("user_id")
    second_half = events.where(F.col("ts") >= cut).select("user_id")
    erroring = events.where(
        (F.col("event_type") == "error")
        & (F.col("ts") < F.lit("2024-01-03 00:00:00").cast("timestamp"))
    ).select("user_id")
    return first_half.intersect(second_half).exceptAll(erroring.distinct())


@register(
    "rollup_revenue",
    """
    SELECT r_name, n_name,
           CAST(GROUPING(r_name) * 2 + GROUPING(n_name) AS INT) AS gid,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP(r_name, n_name)
    """,
    doc="ROLLUP subtotal surface: revenue at (region, nation), per-region "
    "subtotal, and grand total in ONE aggregation pass — Spark plans a "
    "single Expand + hash aggregate, not three scans; grouping id "
    "disambiguates genuine NULL keys from subtotal rows. Fixed-point "
    "cents keep every level hash-exact. Dims broadcast; one fact "
    "shuffle.",
)
def q_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    j = (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(nation, cust["c_nationkey"] == nation["n_nationkey"])
        .join(region, nation["n_regionkey"] == region["r_regionkey"])
    )
    cents = F.floor(F.col("o_totalprice") * 100).cast("long")
    return (
        j.rollup("r_name", "n_name")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.sum(cents).cast("long").alias("revenue_cents"),
            F.count(F.lit(1)).cast("long").alias("n_orders"),
        )
        .select("r_name", "n_name", "gid", "revenue_cents", "n_orders")
    )


@register(
    "edit_distance_pairs",
    """
    WITH src AS (SELECT doc_id AS doc, lower(substr(text, 1, 40)) AS pfx FROM documents),
    blocks AS (
      SELECT doc, CAST(i AS VARCHAR) || ':' || substr(pfx, i*8+1, 8) AS bk
      FROM src CROSS JOIN (SELECT unnest(generate_series(0, 4)) AS i) g
      WHERE substr(pfx, i*8+1, 8) <> ''
    ),
    cand AS (SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
             FROM blocks a JOIN blocks b ON a.bk = b.bk AND a.doc < b.doc)
    SELECT c.doc_a, c.doc_b, levenshtein(sa.pfx, sb.pfx) AS dist
    FROM cand c JOIN src sa ON c.doc_a = sa.doc JOIN src sb ON c.doc_b = sb.doc
    WHERE levenshtein(sa.pfx, sb.pfx) <= 15
    """,
    doc="Edit-distance fuzzy matching (character-level dedup tier) over the "
    "whole corpus — block-gated, no id cap, no cross join: candidates must "
    "share one of 5 fixed-position 8-char slices of the lowercased 40-char "
    "prefix (inverted-index generation, hot-block fallback), then exact "
    "Levenshtein verifies. Recall is pigeonhole-exact for <= 4 "
    "substitutions; the oracle replays the identical blocking.",
)
def q_edit_distance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.text_dedup import edit_distance_pairs

    docs = _t(spark, sf_dir, "documents")
    return edit_distance_pairs(
        docs, "doc_id", "text", prefix_len=40, max_dist=15, n_chunks=5
    )


# ---------------------------------------------------------------------------
# Extension surface: deterministic sampling, packing, sessions, funnels
# ---------------------------------------------------------------------------


@register(
    "stratified_sample",
    """
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 10000 <
          CASE lang WHEN 'en' THEN 5000 WHEN 'zh' THEN 10000 ELSE 2000 END
    """,
    doc="Deterministic stratified corpus sampling (domain-mixing weights): "
    "keep 50% of en, 100% of zh, 20% of everything else — membership is a "
    "pure md5 function of doc_id, so the sample is reproducible across "
    "runs, partitionings and engines (no RNG, no shuffle; unlike "
    "DataFrame.sample's partition-seeded draw, this is oracle-checkable).",
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.sampling import stratified_sample

    docs = _t(spark, sf_dir, "documents")
    return stratified_sample(
        docs.select("doc_id", "lang", "n_chars"),
        id_col="doc_id",
        fractions={"en": 0.5, "zh": 1.0},
        strata_col="lang",
        default_fraction=0.2,
    )


@register(
    "pack_sequences",
    """
    WITH t AS (
      SELECT doc_id, lang,
             COALESCE(len(list_filter(regexp_split_to_array(text, '\\s+'), y -> y <> '')), 0) AS n
      FROM documents
    ), s AS (
      SELECT doc_id, lang, n,
             CAST(COALESCE(SUM(n) OVER (PARTITION BY lang ORDER BY doc_id
                                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                           0) AS BIGINT) AS start_offset
      FROM t
    )
    SELECT doc_id, lang, start_offset,
           CAST(FLOOR(start_offset / 512) AS BIGINT) AS bin,
           (n > 0 AND FLOOR((start_offset + GREATEST(n, 1) - 1) / 512) > FLOOR(start_offset / 512)) AS crosses_boundary
    FROM s
    """,
    doc="Concat-and-chunk sequence packing for training batches: documents "
    "laid out per-lang in doc_id order, context-window boundaries every 512 "
    "tokens; each doc gets its window index (start_offset // 512) and a "
    "boundary-straddle flag. One window shuffle; exact integer arithmetic.",
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.functions.text import word_count
    from pasta_pipeline_spark.operators.sampling import pack_sequences

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "lang", word_count("text").cast("long").alias("n_words")
    )
    return pack_sequences(
        docs, id_col="doc_id", tokens_col="n_words", budget=512, partition_col="lang"
    ).select("doc_id", "lang", "start_offset", "bin", "crosses_boundary")


@register(
    "session_stats",
    """
    WITH e AS (
      SELECT user_id, event_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec FROM events
    ), lagged AS (
      SELECT user_id, event_id, sec,
             LAG(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id) AS prev
      FROM e
    ), marked AS (
      SELECT user_id, event_id, sec,
             CASE WHEN prev IS NULL OR sec - prev > 1800 THEN 1 ELSE 0 END AS new_s
      FROM lagged
    ), assigned AS (
      SELECT user_id, sec,
             CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY sec, event_id
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
      FROM marked
    )
    SELECT user_id, session_seq,
           count(*) AS n_events,
           min(sec) AS start_sec,
           max(sec) AS end_sec,
           max(sec) - min(sec) AS duration_sec
    FROM assigned GROUP BY user_id, session_seq
    """,
    doc="Batch gap-based sessionization (30-min gap) + per-session rollup: "
    "lag + running-sum session assignment (the batch analog of the "
    "streaming session_window), epoch-second integer arithmetic, one "
    "window shuffle on the user key.",
)
def q_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.sessions import session_stats

    events = _t(spark, sf_dir, "events").select(
        "user_id", "event_id", F.col("ts").cast("long").alias("sec")
    )
    return session_stats(
        events, user_col="user_id", ts_col="sec",
        order_tiebreak="event_id", gap_minutes=30,
    )


@register(
    "funnel_steps",
    """
    WITH s1 AS (SELECT user_id, min(ts) AS t FROM events
                WHERE event_type = 'signup' GROUP BY user_id),
    s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s1 ON e.user_id = s1.user_id
           WHERE e.event_type = 'view' AND e.ts > s1.t GROUP BY e.user_id),
    s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s2 ON e.user_id = s2.user_id
           WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY e.user_id)
    SELECT (SELECT count(*) FROM s1) AS n_step1,
           (SELECT count(*) FROM s2) AS n_step2,
           (SELECT count(*) FROM s3) AS n_step3
    """,
    doc="Ordered funnel completion (signup → view → purchase): a user "
    "advances only with an event strictly after their previous step's "
    "completion time (min-ts chaining). Level frames shrink per step; "
    "equi-joins AQE can broadcast once levels get small.",
)
def q_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.sessions import funnel_counts

    events = _t(spark, sf_dir, "events")
    return funnel_counts(events, ["signup", "view", "purchase"])


@register(
    "price_quantiles",
    """
    SELECT l_returnflag,
           quantile_cont(l_extendedprice, 0.25) AS p25,
           quantile_cont(l_extendedprice, 0.5)  AS p50,
           quantile_cont(l_extendedprice, 0.9)  AS p90
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Grouped exact percentiles: Spark `percentile` and DuckDB "
    "`quantile_cont` share the SQL-standard interpolation (pos = p*(n-1), "
    "linear between neighbors), verified bit-identical — no fixed-point "
    "bridge needed. Exact percentile is a full sort per group; at 100 TB "
    "swap in approx_percentile (t-digest) where tolerance allows.",
)
def q_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.25)").alias("p25"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
        F.expr("percentile(l_extendedprice, 0.9)").alias("p90"),
    )


@register(
    "cube_revenue",
    """
    SELECT l_returnflag, l_linestatus,
           count(*) AS n_items,
           SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) / 10000.0 AS revenue
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="CUBE grouping sets (all 2^2 rollup combinations in one pass — "
    "completes the ROLLUP/grouping-sets family): per flag x status revenue "
    "plus both marginals and the grand total, fixed-point sums.",
)
def q_cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc_fp = F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000).cast("long")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_items"),
        (F.sum(disc_fp) / 10000.0).alias("revenue"),
    )


@register(
    "rank_windows",
    """
    SELECT o_custkey, o_orderkey,
           CAST(rank()       OVER w AS BIGINT) AS rnk,
           CAST(dense_rank() OVER w AS BIGINT) AS drnk,
           CAST(ntile(4)     OVER w AS BIGINT) AS quartile,
           percent_rank()    OVER w            AS prnk
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
    """,
    doc="Ranking-window family (rank / dense_rank / ntile / percent_rank) "
    "per customer by order value — deterministic total order via the "
    "o_orderkey tiebreak; percent_rank's (rank-1)/(n-1) double is "
    "cross-engine exact.",
)
def q_rank_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.percent_rank().over(w).alias("prnk"),
    )


@register(
    "asof_join_events",
    """
    WITH p AS (
      SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
    ), v AS (
      SELECT user_id, ts, value FROM (
        SELECT user_id, ts, value,
               row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type = 'view'
      ) WHERE rn = 1
    )
    SELECT p.event_id, p.user_id,
           CAST(FLOOR(epoch(p.ts)) AS BIGINT) AS ts_s,
           CAST(FLOOR(epoch(v.ts)) AS BIGINT) AS view_ts_s,
           v.value AS view_value
    FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
    doc="As-of join (operators/asof.py): each purchase picks up the user's "
    "latest view at-or-before it — DuckDB ASOF LEFT JOIN is the oracle. The "
    "right side is pre-deduped per (user, ts) so the matched row is unique; "
    "matched doubles pass through unhashed arithmetic.",
)
def q_asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.asof import asof_join
    from pasta_pipeline_spark.operators.dedup import keep_latest

    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    views = (
        ev.filter(F.col("event_type") == "view")
        .select("user_id", "ts", "value", "event_id")
        .transform(lambda df: keep_latest(df, ["user_id", "ts"], "event_id"))
        .select("user_id", "ts", "value")
    )
    joined = asof_join(
        purchases,
        views,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        value_cols=["value"],
        suffix="_view",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("ts").cast("long").alias("ts_s"),
        F.col("ts_view").cast("long").alias("view_ts_s"),
        F.col("value_view").alias("view_value"),
    )


@register(
    "range_join_windows",
    """
    WITH e AS (
      SELECT event_id, ts FROM events WHERE event_type = 'error' AND user_id <= 15
    ), p AS (
      SELECT ts FROM events WHERE event_type = 'purchase'
    )
    SELECT e.event_id, CAST(FLOOR(epoch(e.ts)) AS BIGINT) AS ts_s,
           CAST(count(p.ts) AS BIGINT) AS n_purchases
    FROM e LEFT JOIN p
      ON p.ts >= e.ts AND p.ts < e.ts + INTERVAL 15 MINUTE
    GROUP BY e.event_id, e.ts
    """,
    doc="Bucketized range join (operators/rangejoin.py): purchases falling "
    "inside each error's 15-minute incident window, keyless (the hard case "
    "— with no equi-key a naive BETWEEN join is a nested loop). The bin "
    "equi-join plan is asserted cartesian-free in test_asof_range.py; the "
    "DuckDB oracle runs the inequality join directly.",
)
def q_range_join_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.rangejoin import interval_point_counts

    ev = _t(spark, sf_dir, "events")
    errors = (
        ev.filter((F.col("event_type") == "error") & (F.col("user_id") <= 15))
        .select("event_id", "ts")
        .withColumn("w_end", F.col("ts") + F.expr("INTERVAL 15 MINUTES"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("ts").alias("p_ts")
    )
    counted = interval_point_counts(
        errors,
        purchases,
        interval_id="event_id",
        start_col="ts",
        end_col="w_end",
        ts_col="p_ts",
        bin_seconds=900,
        count_alias="n_purchases",
    )
    return counted.select(
        "event_id",
        F.col("ts").cast("long").alias("ts_s"),
        F.col("n_purchases").cast("long").alias("n_purchases"),
    )


@register(
    "chunk_documents",
    """
    WITH t AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(text, '\\s+'), y -> y <> '') AS toks
      FROM documents
    ), d AS (
      SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) > 0
    ), s AS (
      SELECT doc_id, toks,
             unnest(generate_series(1, n, 48)) AS start_token
      FROM d
    )
    SELECT doc_id,
           CAST((start_token - 1) / 48 AS BIGINT) AS chunk_idx,
           CAST(start_token AS BIGINT) AS start_token,
           CAST(len(toks[start_token : start_token + 63]) AS BIGINT) AS n_tokens,
           array_to_string(toks[start_token : start_token + 63], ' ') AS chunk_text
    FROM s
    """,
    doc="Overlapping token-window chunking for LLM training "
    "(operators/chunking.py): 64-token chunks every 48 tokens, all array "
    "expressions in one scan — sequence starts, posexplode, slice; no UDF, "
    "no shuffle. The oracle mirrors it with generate_series + inclusive "
    "list slicing.",
)
def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.chunking import chunk_documents

    docs = _tp(spark, sf_dir, "documents")
    return chunk_documents(
        docs, id_col="doc_id", text_col="text", chunk_size=64, stride=48
    )


@register(
    "tfidf_top_terms",
    """
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'), y -> y <> '')) AS term
      FROM documents
    ), tf AS (
      SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
    ), df AS (
      SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY term
    ), n AS (
      SELECT count(*) AS n FROM documents
    ), scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, df.df,
             CAST(FLOOR(tf.tf * ln(CAST(n.n AS DOUBLE) / df.df) * 10000) AS BIGINT) AS score_fp
      FROM tf JOIN df USING (term) CROSS JOIN n
    )
    SELECT doc_id, CAST(rnk AS BIGINT) AS rnk, term,
           CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df, score_fp
    FROM (
      SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score_fp DESC, term ASC) AS rnk
      FROM scored
    ) WHERE rnk <= 5
    """,
    doc="Top-5 TF-IDF terms per document (operators/text_analysis.py): "
    "textbook tf*ln(N/df), fixed-point-bridged score, (score, term) total "
    "order for a deterministic top-k. ln() verified bit-identical between "
    "the JVM and DuckDB on this domain.",
)
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.text_analysis import tfidf_top_terms

    docs = _tp(spark, sf_dir, "documents")
    return tfidf_top_terms(docs, id_col="doc_id", text_col="text", k=5)


@register(
    "quantize_int8",
    """
    WITH m AS (
      SELECT vec_id, embedding,
             list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS mx
      FROM embeddings
    ), s AS (
      SELECT vec_id, embedding,
             CASE WHEN mx > 0 THEN 127.0 / mx END AS scale
      FROM m
    )
    SELECT vec_id,
           CAST(i - 1 AS BIGINT) AS pos,
           CAST(round(CAST(embedding[i] AS DOUBLE) * COALESCE(scale, 0.0)) AS INTEGER) AS q,
           CAST(FLOOR(scale * 10000) AS BIGINT) AS scale_fp
    FROM s, unnest(generate_series(1, len(embedding))) t(i)
    """,
    doc="Symmetric int8 scalar quantization (operators/similarity.py): "
    "scale = 127/max|v|, round-half-away (verified identical in both "
    "engines on doubles), posexploded to exact-integer rows; the scale "
    "crosses the fixed-point bridge.",
)
def q_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.similarity import quantize_embeddings_int8

    emb = _t(spark, sf_dir, "embeddings")
    return quantize_embeddings_int8(emb, id_col="vec_id", vec_col="embedding")


@register(
    "resample_locf",
    """
    WITH b AS (
      SELECT user_id, date_trunc('hour', min(ts)) AS h0, date_trunc('hour', max(ts)) AS h1
      FROM events GROUP BY user_id
    ), grid AS (
      SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS slot FROM b
    ), agg AS (
      SELECT user_id, date_trunc('hour', ts) AS slot,
             count(*) AS n,
             CAST(SUM(CAST(FLOOR(value * 10000) AS BIGINT)) AS BIGINT) AS vfp
      FROM events GROUP BY 1, 2
    )
    SELECT g.user_id,
           CAST(epoch(g.slot) AS BIGINT) AS slot_s,
           CAST(COALESCE(a.n, 0) AS BIGINT) AS n_events,
           (a.n IS NULL) AS is_gap,
           a.vfp AS slot_value,
           CAST(last_value(a.vfp IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.slot
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS slot_value_locf
    FROM grid g LEFT JOIN agg a ON g.user_id = a.user_id AND g.slot = a.slot
    """,
    doc="Gap-fill / resample to an hourly per-user grid with "
    "last-observation-carried-forward (operators/timeseries.py): "
    "sequence()+explode manufactures each key's grid from its own bounds, "
    "one window pass fills gaps; fixed-point slot sums.",
)
def q_resample_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.timeseries import resample_locf

    ev = _t(spark, sf_dir, "events")
    out = resample_locf(
        ev,
        key_col="user_id",
        ts_col="ts",
        value_fp_agg=F.sum(F.floor(F.col("value") * 10000).cast("long")),
        slot="1 hour",
        trunc_unit="hour",
    )
    return out.select(
        "user_id",
        F.col("slot").cast("long").alias("slot_s"),
        "n_events",
        "is_gap",
        "slot_value",
        "slot_value_locf",
    )


@register(
    "price_histogram",
    """
    WITH h AS (
      SELECT CAST(FLOOR(l_extendedprice / 5000) AS BIGINT) AS bucket,
             count(*) AS n,
             CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM lineitem GROUP BY 1
    )
    SELECT bucket, CAST(n AS BIGINT) AS n, cents,
           CAST(SUM(n) OVER (ORDER BY bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n
    FROM h
    """,
    doc="Fixed-width histogram + cumulative distribution of lineitem "
    "prices: bucket = FLOOR(price/5000) (identical IEEE ops both engines; "
    "DuckDB 1.0 has no width_bucket, so the shared arithmetic IS the "
    "contract), fixed-point cents sums, running count over the global "
    "bucket order (a handful of rows — the one window where a global "
    "ORDER BY is fine).",
)
def q_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    h = li.groupBy(
        F.floor(F.col("l_extendedprice") / 5000).cast("long").alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.floor(F.col("l_extendedprice") * 100).cast("long")).alias("cents"),
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return h.select(
        "bucket", "n", "cents", F.sum("n").over(w).cast("long").alias("cum_n")
    )


@register(
    "pagerank_parts",
    """
    WITH pairs AS (
      SELECT DISTINCT l_partkey * 2 AS l, l_suppkey * 2 + 1 AS r FROM lineitem
    ), edges AS (
      SELECT l AS src, r AS dst FROM pairs
      UNION ALL
      SELECT r AS src, l AS dst FROM pairs
    ), deg AS (
      SELECT src, count(*) AS outdeg FROM edges GROUP BY src
    ), r0 AS (
      SELECT DISTINCT src AS id, CAST(1000000 AS BIGINT) AS r FROM edges
    ), it1 AS (
      SELECT e.dst AS id,
             CAST(150000 + (85 * CAST(SUM(x.r // d.outdeg) AS BIGINT)) // 100 AS BIGINT) AS r
      FROM edges e JOIN r0 x ON e.src = x.id JOIN deg d ON d.src = e.src
      GROUP BY e.dst
    ), it2 AS (
      SELECT e.dst AS id,
             CAST(150000 + (85 * CAST(SUM(x.r // d.outdeg) AS BIGINT)) // 100 AS BIGINT) AS r
      FROM edges e JOIN it1 x ON e.src = x.id JOIN deg d ON d.src = e.src
      GROUP BY e.dst
    ), it3 AS (
      SELECT e.dst AS id,
             CAST(150000 + (85 * CAST(SUM(x.r // d.outdeg) AS BIGINT)) // 100 AS BIGINT) AS r
      FROM edges e JOIN it2 x ON e.src = x.id JOIN deg d ON d.src = e.src
      GROUP BY e.dst
    )
    SELECT id, r AS rank_fp FROM it3
    """,
    doc="Fixed-point PageRank, 3 iterations, over the part↔supplier "
    "co-occurrence graph (operators/graph.py): iterative join+groupBy "
    "rounds in pure int64 arithmetic — bit-identical across engines and "
    "partitionings, so even an iterative algorithm carries an exact "
    "oracle (three chained CTEs).",
)
def q_pagerank_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.graph import bipartite_edges, pagerank_fixed

    li = _t(spark, sf_dir, "lineitem")
    edges = bipartite_edges(li, "l_partkey", "l_suppkey")
    return pagerank_fixed(edges, iterations=3)


@register(
    "repetition_metrics",
    """
    WITH t AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '\\s+'), y -> y <> '') AS tk
      FROM documents
    ), b AS (
      SELECT doc_id, tk[i] || ' ' || tk[i+1] AS g
      FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 1)) AS i
            FROM t WHERE len(tk) >= 2)
    ), c AS (
      SELECT doc_id, g, count(*) AS cnt FROM b GROUP BY doc_id, g
    ), m AS (
      SELECT doc_id,
             CAST(SUM(cnt) AS BIGINT) AS total,
             CAST(MAX(cnt) AS BIGINT) AS top,
             CAST(count(*) AS BIGINT) AS dist
      FROM c GROUP BY doc_id
    )
    SELECT doc_id, total AS n_bigrams,
           CAST((10000 * top) // total AS BIGINT) AS top2_frac_fp,
           CAST((10000 * (total - dist)) // total AS BIGINT) AS dup2_frac_fp
    FROM m
    """,
    doc="Gopher-style repetition filters (operators/text_analysis.py): "
    "top-bigram fraction and duplicate-bigram fraction per document, exact "
    "integer ratios — the within-document complement of the dedup ladder.",
)
def q_repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.text_analysis import repetition_metrics

    docs = _tp(spark, sf_dir, "documents")
    return repetition_metrics(docs)


@register(
    "contamination_check",
    """
    WITH toks AS (
      SELECT doc_id, source,
             list_filter(regexp_split_to_array(lower(text), '\\s+'), y -> y <> '') AS t
      FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id, source,
             CASE WHEN len(t) >= 5
                  THEN t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4]
                  ELSE array_to_string(t, ' ') END AS g
      FROM (SELECT doc_id, source, t,
                   unnest(generate_series(1, greatest(len(t) - 4, 1))) AS i
            FROM toks)
    ), bench AS (
      SELECT DISTINCT g FROM sh WHERE source = 'src0'
    ), corpus AS (
      SELECT doc_id, g FROM sh WHERE source <> 'src0'
    ), sizes AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams FROM corpus GROUP BY doc_id
    ), hits AS (
      SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_contaminated
      FROM corpus c JOIN bench b ON c.g = b.g
      GROUP BY c.doc_id
    )
    SELECT s.doc_id, s.n_grams,
           CAST(COALESCE(h.n_contaminated, 0) AS BIGINT) AS n_contaminated,
           CAST((10000 * COALESCE(h.n_contaminated, 0)) // s.n_grams AS BIGINT) AS contam_frac_fp
    FROM sizes s LEFT JOIN hits h ON s.doc_id = h.doc_id
    """,
    doc="Benchmark-contamination scan (operators/text_analysis.py): distinct "
    "5-token shingles of each corpus doc (source<>'src0') probed against the "
    "'benchmark' set (source='src0') — the eval-leakage check a training "
    "pipeline runs before ingest. Zero-hit docs stay in the output.",
)
def q_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.text_analysis import contamination_check

    docs = _tp(spark, sf_dir, "documents")
    return contamination_check(
        docs.filter(F.col("source") != "src0"),
        docs.filter(F.col("source") == "src0"),
        n=5,
    )


def _zorder_oracle() -> str:
    from pasta_pipeline_spark.operators.layout import zvalue2_sql

    return f"""
    SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
           CAST({zvalue2_sql("l_partkey", "l_suppkey")} AS BIGINT) AS z
    FROM lineitem
    """


@register(
    "zorder_values",
    _zorder_oracle(),
    doc="Z-order clustering key (operators/layout.py): bit-interleave of "
    "(l_partkey, l_suppkey) — the sort key whose range-partitioned layout "
    "gives two-dimensional data skipping. The oracle SQL is GENERATED from "
    "the same bit recipe (zvalue2_sql), so engine and oracle cannot drift.",
)
def q_zorder_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.layout import zvalue2

    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        F.col("l_linenumber").cast("long").alias("l_linenumber"),
        zvalue2("l_partkey", "l_suppkey").cast("long").alias("z"),
    )


@register(
    "temperature_sample",
    """
    WITH c AS (
      SELECT source, count(*) AS n FROM documents GROUP BY source
    ), s AS (
      SELECT source, n,
             CAST(FLOOR(sqrt(CAST(n AS DOUBLE)) * 1000000) AS BIGINT) AS sqrt_fp
      FROM c
    ), t AS (
      SELECT CAST(SUM(sqrt_fp) AS BIGINT) AS tot FROM s
    ), quota AS (
      SELECT source, LEAST(n, (200 * sqrt_fp) // tot) AS m FROM s CROSS JOIN t
    ), ranked AS (
      SELECT doc_id, source, lang,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rnk
      FROM documents
    )
    SELECT r.doc_id, r.source, r.lang
    FROM ranked r JOIN quota q ON r.source = q.source
    WHERE r.rnk <= q.m
    """,
    doc="Temperature-based source mixing (operators/sampling.py): per-source "
    "quotas ∝ √n via integer arithmetic on fixed-point √n (√ is correctly "
    "rounded in both engines; no float sums anywhere), rows chosen by "
    "md5-rank within source — exact quota sizes, no RNG.",
)
def q_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.sampling import temperature_sample

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "lang")
    return temperature_sample(docs, id_col="doc_id", source_col="source", target_total=200)


@register(
    "edit_distance_shift_pairs",
    """
    WITH s AS (
      SELECT doc_id, lower(substr(text, 1, 40)) AS p
      FROM documents
      WHERE text IS NOT NULL
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(levenshtein(a.p, b.p) AS BIGINT) AS dist
    FROM s a JOIN s b
      ON a.doc_id < b.doc_id
     AND abs(length(a.p) - length(b.p)) <= 2
     AND levenshtein(a.p, b.p) <= 2
    """,
    doc="PassJoin-style shifted-segment edit-distance join "
    "(text_dedup.edit_distance_pairs_shifted): complete for <=2 edits "
    "INCLUDING indels, so the oracle is the ground-truth all-pairs filter "
    "over EVERY input string — ultrashort strings (< tau+1 chars) are "
    "covered by the length-windowed supplement, not excluded — and the "
    "engine's blocking must find every true pair, not just replay "
    "itself. (The DuckDB side may brute-force at sf0.01; the Spark side "
    "never does.)",
)
def q_edit_distance_shift_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.text_dedup import edit_distance_pairs_shifted

    docs = _t(spark, sf_dir, "documents")
    return edit_distance_pairs_shifted(docs, "doc_id", "text", prefix_len=40, tau=2)


@register(
    "shipping_priority",
    """
    SELECT l.l_orderkey,
           SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT)) / 10000.0
             AS revenue,
           CAST(epoch(o.o_orderdate) AS BIGINT) AS orderdate_s,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey ASC
    LIMIT 10
    """,
    doc="TPC-H Q3 analog (shipping priority): 3-way join with selective "
    "filters on every input — customer dim broadcasts, both date filters "
    "push to the parquet scans, fixed-point revenue, deterministic top-10.",
)
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    cutoff = "1995-03-15 00:00:00"
    rev_fp = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
    ).cast("long")
    return (
        li.where(F.col("l_shipdate") > F.lit(cutoff).cast("timestamp"))
        .join(
            orders.where(F.col("o_orderdate") < F.lit(cutoff).cast("timestamp")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(cust.where(F.col("c_mktsegment") == "BUILDING")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg((F.sum(rev_fp) / 10000.0).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            # o_orderdate is TIMESTAMP_NTZ; session tz is UTC so the
            # NTZ→timestamp hop is identity, then epoch seconds
            F.col("o_orderdate").cast("timestamp").cast("long").alias("orderdate_s"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "above_avg_orders",
    """
    WITH w AS (
      SELECT o_orderkey, o_custkey,
             CAST(FLOOR(o_totalprice * 10000) AS BIGINT) AS price_fp,
             CAST(SUM(CAST(FLOOR(o_totalprice * 10000) AS BIGINT))
                  OVER (PARTITION BY o_custkey) AS BIGINT) AS sum_fp,
             CAST(count(*) OVER (PARTITION BY o_custkey) AS BIGINT) AS n
      FROM orders
    )
    SELECT o_orderkey, o_custkey, price_fp
    FROM w
    WHERE n > 1 AND price_fp * n > sum_fp
    """,
    doc="Correlated 'above this customer's average' filter, decorrelated "
    "into one window pass (the subquery a SQL user would write as "
    "o_totalprice > (SELECT avg ... WHERE same custkey)); the comparison "
    "is cross-multiplied into exact integer arithmetic — no division.",
)
def q_above_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    price_fp = F.floor(F.col("o_totalprice") * 10000).cast("long")
    return (
        orders.withColumn("price_fp", price_fp)
        .withColumn("sum_fp", F.sum("price_fp").over(w))
        .withColumn("n", F.count(F.lit(1)).over(w))
        .where((F.col("n") > 1) & (F.col("price_fp") * F.col("n") > F.col("sum_fp")))
        .select("o_orderkey", "o_custkey", "price_fp")
    )


@register(
    "char_entropy",
    """
    WITH ch AS (
      SELECT doc_id, substr(text, i, 1) AS c
      FROM (SELECT doc_id, text, unnest(generate_series(1, length(text))) AS i
            FROM documents WHERE length(text) > 0)
    ), cc AS (
      SELECT doc_id, c, count(*) AS cnt FROM ch GROUP BY doc_id, c
    ), m AS (
      SELECT doc_id,
             CAST(SUM(cnt) AS BIGINT) AS n,
             CAST(SUM(cnt * CAST(FLOOR(ln(CAST(cnt AS DOUBLE)) * 1000000000) AS BIGINT)) AS BIGINT) AS s
      FROM cc GROUP BY doc_id
    )
    SELECT doc_id, n AS n_chars_seen,
           CAST((n * CAST(FLOOR(ln(CAST(n AS DOUBLE)) * 1000000000) AS BIGINT) - s) // n AS BIGINT)
             AS entropy_fp
    FROM m
    """,
    doc="Character-entropy quality proxy (operators/text_analysis.py): "
    "H = ln(n) - sum(cnt*ln cnt)/n in nats via fixed-point ln (1e9 scale) "
    "so every sum is order-free int64; substr(i,1) explode is the "
    "engine-portable char split.",
)
def q_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.text_analysis import char_entropy

    docs = _tp(spark, sf_dir, "documents")
    return char_entropy(docs)


def _aspect_oracle() -> str:
    from pasta_pipeline_spark.operators.multimodal import aspect_bucket_sql

    return f"""
    WITH m AS (
      SELECT CAST(('0x' || substr(md5(text), 1, 4))::BIGINT % 1920 + 1 AS BIGINT) AS width,
             CAST(('0x' || substr(md5(text), 5, 4))::BIGINT % 1080 + 1 AS BIGINT) AS height
      FROM documents
    )
    SELECT {aspect_bucket_sql("width", "height")} AS bucket,
           count(*) AS n_media,
           CAST(MIN((100 * width) // height) AS BIGINT) AS min_ap,
           CAST(MAX((100 * width) // height) AS BIGINT) AS max_ap
    FROM m
    GROUP BY 1
    """


@register(
    "aspect_buckets",
    _aspect_oracle(),
    doc="Aspect-ratio bucketing for image-batch training "
    "(operators/multimodal.py): the mapInPandas decode stage feeds integer "
    "dimensions; buckets assign via (100*w) div h against fixed ladder cuts "
    "— pure integer arithmetic, SQL twin generated from the same ladder.",
)
def q_aspect_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.multimodal import (
        aspect_bucket,
        extract_media_features,
    )

    docs = _tp(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text").alias("media_type"),
        F.col("text").cast("binary").alias("payload"),
    )
    feats = extract_media_features(media, decode="stub").select(
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
    )
    ap = F.expr("(100 * width) div height")
    return (
        feats.withColumn("bucket", aspect_bucket("width", "height"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.min(ap).cast("long").alias("min_ap"),
            F.max(ap).cast("long").alias("max_ap"),
        )
    )


@register(
    "salted_join_revenue",
    """
    SELECT p.p_brand,
           count(*) AS n_items,
           SUM(CAST(FLOOR(l.l_extendedprice * 10000) AS BIGINT)) / 10000.0 AS gross
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    """,
    doc="Skew-proof salted join (operators/skew.py): big side salted via "
    "pmod(hash(row), 16), small dim replicated per salt, join on "
    "(key, salt) — row-identical to the plain join (the oracle), so the "
    "skew escape hatch is itself correctness-gated.",
)
def q_salted_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.skew import salted_join

    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    joined = salted_join(
        li.select(F.col("l_partkey").alias("p_partkey"), "l_extendedprice"),
        part,
        on=["p_partkey"],
        salt_buckets=16,
    )
    return joined.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_items"),
        _xsum(F.col("l_extendedprice")).alias("gross"),
    )


@register(
    "training_corpus",
    """
    WITH wc AS (
      SELECT doc_id, source, text,
             COALESCE(len(list_filter(regexp_split_to_array(text, '\\s+'), y -> y <> '')), 0) AS n_words
      FROM documents WHERE source <> 'src0'
    ), tk AS (
      SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\\s+'), y -> y <> '') AS tk
      FROM documents WHERE source <> 'src0'
    ), bg AS (
      SELECT doc_id, tk[i] || ' ' || tk[i+1] AS g
      FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 1)) AS i
            FROM tk WHERE len(tk) >= 2)
    ), bgc AS (
      SELECT doc_id, g, count(*) AS cnt FROM bg GROUP BY doc_id, g
    ), rep AS (
      SELECT doc_id,
             CAST((10000 * (SUM(cnt) - count(*))) // SUM(cnt) AS BIGINT) AS dup2
      FROM bgc GROUP BY doc_id
    ), quality AS (
      SELECT w.doc_id, w.source, w.text, CAST(w.n_words AS BIGINT) AS n_words
      FROM wc w LEFT JOIN rep r ON w.doc_id = r.doc_id
      WHERE w.n_words >= 20 AND COALESCE(r.dup2, 0) <= 6000
    ), dedup AS (
      SELECT doc_id, source, text, n_words FROM (
        SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        FROM quality
      ) WHERE rn = 1
    ), ctk AS (
      SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\\s+'), y -> y <> '') AS t
      FROM dedup
    ), csh AS (
      SELECT DISTINCT doc_id,
             CASE WHEN len(t) >= 5
                  THEN t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4]
                  ELSE array_to_string(t, ' ') END AS g
      FROM (SELECT doc_id, t, unnest(generate_series(1, greatest(len(t) - 4, 1))) AS i FROM ctk)
    ), btk AS (
      SELECT list_filter(regexp_split_to_array(lower(text), '\\s+'), y -> y <> '') AS t
      FROM documents WHERE source = 'src0'
    ), bsh AS (
      SELECT DISTINCT
             CASE WHEN len(t) >= 5
                  THEN t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4]
                  ELSE array_to_string(t, ' ') END AS g
      FROM (SELECT t, unnest(generate_series(1, greatest(len(t) - 4, 1))) AS i FROM btk)
    ), hits AS (
      SELECT DISTINCT c.doc_id FROM csh c JOIN bsh b ON c.g = b.g
    ), clean AS (
      SELECT * FROM dedup WHERE doc_id NOT IN (SELECT doc_id FROM hits)
    ), cs AS (
      SELECT source, count(*) AS n FROM clean GROUP BY source
    ), sq AS (
      SELECT source, n, CAST(FLOOR(sqrt(CAST(n AS DOUBLE)) * 1000000) AS BIGINT) AS sfp FROM cs
    ), tt AS (
      SELECT CAST(SUM(sfp) AS BIGINT) AS tot FROM sq
    ), quota AS (
      SELECT source, LEAST(n, (150 * sfp) // tot) AS m FROM sq CROSS JOIN tt
    ), ranked AS (
      SELECT doc_id, source, n_words,
             row_number() OVER (PARTITION BY source
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rnk
      FROM clean
    )
    SELECT r.doc_id, r.source, r.n_words
    FROM ranked r JOIN quota q ON r.source = q.source
    WHERE r.rnk <= q.m
    """,
    doc="END-TO-END training-data preparation (plans/training_data.py): "
    "quality gate (length + repetition) → exact keep-first dedup → "
    "benchmark decontamination → √n temperature mixing, as ONE lazy plan "
    "with ONE DuckDB oracle — the whole pipeline is correctness-gated, "
    "not just its stages.",
)
def q_training_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.plans.training_data import prepare_training_corpus

    docs = _tp(spark, sf_dir, "documents")
    return prepare_training_corpus(
        docs.filter(F.col("source") != "src0"),
        docs.filter(F.col("source") == "src0"),
        min_words=20,
        max_dup2_frac_fp=6000,
        target_total=150,
    )


@register(
    "constraint_checks",
    """
    WITH base AS (
      SELECT CAST(count(*) AS BIGINT) AS n_rows,
             CAST(SUM(CASE WHEN NOT COALESCE(o_totalprice > 0, FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS positive_price,
             CAST(SUM(CASE WHEN NOT COALESCE(o_orderstatus IN ('O','F','P'), FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS valid_status,
             CAST(SUM(CASE WHEN NOT COALESCE(o_custkey IS NOT NULL, FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS custkey_not_null
      FROM orders
    ), dups AS (
      SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) AS n_violations
      FROM (SELECT count(*) AS c FROM orders GROUP BY o_orderkey HAVING count(*) > 1)
    )
    SELECT 'positive_price' AS rule, positive_price AS n_violations, n_rows FROM base
    UNION ALL
    SELECT 'valid_status', valid_status, n_rows FROM base
    UNION ALL
    SELECT 'custkey_not_null', custkey_not_null, n_rows FROM base
    UNION ALL
    SELECT 'unique_orderkey', d.n_violations, b.n_rows FROM dups d CROSS JOIN base b
    """,
    doc="Declarative constraint checking (operators/quality_checks.py): the "
    "lake-side replacement for the reference's Postgres DDL constraints — "
    "all CHECK rules fold into one scan, uniqueness is its own shuffle, "
    "output is one (rule, n_violations, n_rows) row per rule.",
)
def q_constraint_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.quality_checks import check_constraints

    orders = _t(spark, sf_dir, "orders")
    return check_constraints(
        orders,
        rules={
            "positive_price": F.col("o_totalprice") > 0,
            "valid_status": F.col("o_orderstatus").isin("O", "F", "P"),
            "custkey_not_null": F.col("o_custkey").isNotNull(),
        },
        unique_keys={"unique_orderkey": ["o_orderkey"]},
    )


# ---------------------------------------------------------------------------
# Sub-document dedup (extension §2.12): line-level + content-defined chunks
# ---------------------------------------------------------------------------


@register(
    "line_dedup_docs",
    """
    WITH lines AS (
      SELECT doc_id, unnest(ls) AS line, generate_subscripts(ls, 1) AS pos
      FROM (SELECT doc_id, string_split(text, ' table ') AS ls
            FROM documents WHERE text IS NOT NULL)
    ), freq AS (
      SELECT line, count(*) AS c FROM lines GROUP BY line
    ), flagged AS (
      SELECT l.doc_id, l.pos, l.line,
             (f.c <= 1 OR trim(l.line) = '') AS kept
      FROM lines l JOIN freq f USING (line)
    )
    SELECT doc_id,
           coalesce(string_agg(CASE WHEN kept THEN line END, ' table ' ORDER BY pos), '')
             AS text_kept,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(SUM(CASE WHEN kept THEN 0 ELSE 1 END) AS BIGINT) AS n_removed
    FROM flagged GROUP BY doc_id
    """,
    doc="Corpus-level line dedup (operators/subdoc_dedup.py, CCNet-style): "
    "drop segments whose global frequency exceeds 1, reassemble documents "
    "in original order. The synthetic corpus has no newlines, so the "
    "catalog instance segments on the common token ' table ' — ~160 of "
    "1358 segments repeat, exercising both the removal and the "
    "reassembly path cross-engine; pytest covers real multi-line docs.",
)
def q_line_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.subdoc_dedup import remove_duplicated_lines

    docs = _tp(spark, sf_dir, "documents")
    return remove_duplicated_lines(docs, delimiter=" table ", max_freq=1)


@register(
    "cdc_chunk_dedup",
    """
    WITH tok AS (
      SELECT doc_id, unnest(ts) AS tok, generate_subscripts(ts, 1) AS pos
      FROM (SELECT doc_id,
                   list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS ts
            FROM documents WHERE text IS NOT NULL)
    ), fl AS (
      SELECT doc_id, pos, tok,
             CASE WHEN CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) % 16 = 0
                  THEN 1 ELSE 0 END AS b
      FROM tok
    ), ch AS (
      SELECT doc_id, pos, tok,
             SUM(b) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - b AS cid
      FROM fl
    ), agg AS (
      SELECT doc_id, CAST(cid AS BIGINT) AS chunk_id,
             CAST(count(*) AS BIGINT) AS n_tokens,
             md5(string_agg(tok, ' ' ORDER BY pos)) AS chunk_hash
      FROM ch GROUP BY doc_id, cid
    ), cc AS (
      SELECT chunk_hash, CAST(count(*) AS BIGINT) AS n_copies
      FROM agg GROUP BY chunk_hash
    )
    SELECT a.doc_id, a.chunk_id, a.n_tokens, a.chunk_hash, c.n_copies
    FROM agg a JOIN cc c USING (chunk_hash)
    """,
    doc="Content-defined chunking dedup (operators/subdoc_dedup.py): token-"
    "granularity CDC — boundary after every token with hash60 % 16 == 0, "
    "chunk id = exclusive prefix sum, chunk md5 counted corpus-wide. "
    "Boundaries re-synchronize after edits (shift-resync pytest), which "
    "is what fixed-width windows cannot do.",
)
def q_cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.subdoc_dedup import cdc_chunks

    docs = _tp(spark, sf_dir, "documents")
    return cdc_chunks(docs, avg_tokens=16)


@register(
    "vocab_top_tokens",
    """
    WITH tok AS (
      SELECT doc_id,
             unnest(list_transform(
               list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> ''),
               x -> lower(x))) AS token
      FROM documents WHERE text IS NOT NULL
    ), c AS (
      SELECT token, CAST(count(*) AS BIGINT) AS n_occurrences,
             CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
      FROM tok GROUP BY token
    ), top AS (
      SELECT * FROM c ORDER BY n_occurrences DESC, token LIMIT 30
    )
    SELECT CAST(row_number() OVER (ORDER BY n_occurrences DESC, token) AS BIGINT)
             AS token_id,
           token, n_occurrences, n_docs
    FROM top
    """,
    doc="Corpus vocabulary build (operators/text_analysis.py build_vocab): "
    "top-N tokens with contiguous 1-based ids in (count desc, token asc) "
    "total order — the tokenizer-training precursor. Top-N via "
    "distributed take-ordered; only the id row_number runs single-task, "
    "over the already-limited N rows.",
)
def q_vocab_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.text_analysis import build_vocab

    return build_vocab(_tp(spark, sf_dir, "documents"), top_n=30)


@register(
    "unigram_nll",
    """
    WITH tok AS (
      SELECT doc_id,
             unnest(list_transform(
               list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> ''),
               x -> lower(x))) AS token
      FROM documents WHERE text IS NOT NULL
    ), c AS (
      SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY token
    ), tt AS (
      SELECT CAST(SUM(cnt) AS BIGINT) AS T FROM c
    ), pd AS (
      SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(SUM(CAST(FLOOR(ln(CAST(c.cnt AS DOUBLE)) * 1000000000) AS BIGINT)) AS BIGINT) AS s
      FROM tok t JOIN c USING (token) GROUP BY t.doc_id
    )
    SELECT doc_id, n_tokens,
           CAST((n_tokens * CAST(FLOOR(ln(CAST(T AS DOUBLE)) * 1000000000) AS BIGINT) - s)
                // n_tokens AS BIGINT) AS nll_fp
    FROM pd CROSS JOIN tt
    """,
    doc="Unigram negative log-likelihood quality proxy (operators/"
    "text_analysis.py unigram_nll): per-doc mean -ln p(token) under the "
    "corpus's own unigram model, fixed-point ln (1e9) so every sum is "
    "order-free int64 and the numerator stays nonnegative (no negative "
    "integer-division divergence).",
)
def q_unigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.text_analysis import unigram_nll

    return unigram_nll(_tp(spark, sf_dir, "documents"))


@register(
    "qty_price_regression",
    None,  # generated below — single source of truth in operators/moments.py
    doc="Exact-moment correlation + OLS of extended price on quantity per "
    "return flag (operators/moments.py): five int64 moment sums over "
    "floored inputs (order-free), derived r/slope/intercept from one "
    "shared SQL recipe so both engines evaluate the identical IEEE "
    "expression. One shuffle of six longs per group.",
)
def q_qty_price_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.moments import correlation_regression

    li = _t(spark, sf_dir, "lineitem")
    return correlation_regression(
        li, "l_quantity", "l_extendedprice", group_by=["l_returnflag"]
    )


def _qty_price_regression_oracle() -> str:
    from pasta_pipeline_spark.operators.moments import moments_oracle_sql

    return moments_oracle_sql(
        "lineitem", "l_quantity", "l_extendedprice", group_by="l_returnflag"
    )


REGISTRY["qty_price_regression"] = QuerySpec(
    spark_fn=REGISTRY["qty_price_regression"].spark_fn,
    oracle=_qty_price_regression_oracle(),
    doc=REGISTRY["qty_price_regression"].doc,
)


# ---------------------------------------------------------------------------
# Robust stats + exact integer EWMA (extension §2.12)
# ---------------------------------------------------------------------------


@register(
    "ewma_value",
    """
    WITH RECURSIVE e AS (
      SELECT user_id, event_id,
             CAST(FLOOR(epoch(ts)) AS BIGINT) AS ts_sec,
             CAST(FLOOR(value * 10000) AS BIGINT) AS value_fp,
             CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
                  AS BIGINT) AS seq
      FROM events
    ), r AS (
      SELECT user_id, event_id, ts_sec, value_fp, seq, value_fp AS ewma_fp
      FROM e WHERE seq = 1
      UNION ALL
      SELECT e.user_id, e.event_id, e.ts_sec, e.value_fp, e.seq,
             (r.ewma_fp * 9 + e.value_fp * 1) // 10
      FROM r JOIN e ON e.user_id = r.user_id AND e.seq = r.seq + 1
    )
    SELECT user_id, seq, event_id, ts_sec, value_fp, ewma_fp FROM r
    """,
    doc="Exact integer EWMA per user (operators/timeseries.py ewma_fold): "
    "alpha=1/10 smoothing as a sequential int64 fold over each key's "
    "time-sorted events — aggregate() HOF Spark-side, recursive CTE "
    "DuckDB-side, bit-identical because every step is truncating "
    "integer arithmetic (determinism playbook #10: iterative algorithms "
    "CAN be exactly oracled if every step is int64).",
)
def q_ewma_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.timeseries import ewma_fold

    ev = _t(spark, sf_dir, "events")
    return ewma_fold(ev, "user_id", "ts", "event_id", "value", num=9, den=10)


@register(
    "winsorize_prices",
    """
    WITH p AS (
      SELECT l_returnflag,
             quantile_cont(l_extendedprice, 0.05) AS p_lo,
             quantile_cont(l_extendedprice, 0.95) AS p_hi
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag, l.l_extendedprice,
           p.p_lo, p.p_hi,
           least(greatest(l.l_extendedprice, p.p_lo), p.p_hi) AS l_extendedprice_w,
           l.l_extendedprice < p.p_lo AS clamped_low,
           l.l_extendedprice > p.p_hi AS clamped_high
    FROM lineitem l JOIN p USING (l_returnflag)
    """,
    doc="Per-group winsorization (operators/robust.py): clamp prices into "
    "the exact [p05, p95] percentile band per return flag. Percentile "
    "interpolation is bit-identical across engines, so the clamped "
    "doubles hash-match raw. One grouped-percentile pass + one broadcast "
    "rejoin — the row axis never shuffles.",
)
def q_winsorize_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.robust import winsorize

    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice"
    )
    return winsorize(li, "l_extendedprice", ["l_returnflag"], 0.05, 0.95)


@register(
    "mad_outlier_stats",
    """
    WITH med AS (
      SELECT l_returnflag, quantile_cont(l_extendedprice, 0.5) AS med
      FROM lineitem GROUP BY l_returnflag
    ), dev AS (
      SELECT l.l_returnflag, m.med, abs(l.l_extendedprice - m.med) AS d
      FROM lineitem l JOIN med m USING (l_returnflag)
    ), mad AS (
      SELECT l_returnflag, quantile_cont(d, 0.5) AS mad FROM dev GROUP BY l_returnflag
    )
    SELECT dev.l_returnflag,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN dev.d > 3.0 * mad.mad THEN 1 ELSE 0 END) AS BIGINT)
             AS n_outliers,
           min(dev.med) AS med,
           min(mad.mad) AS mad
    FROM dev JOIN mad USING (l_returnflag)
    GROUP BY dev.l_returnflag
    """,
    doc="MAD-based robust outlier summary (operators/robust.py): median + "
    "median-absolute-deviation per return flag, rows beyond 3*MAD "
    "counted. 50% breakdown point — wild rows cannot poison the "
    "threshold, unlike stddev z-scores. Three partial-agg scans, group "
    "frames rejoin by broadcast.",
)
def q_mad_outlier_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.robust import mad_outliers

    li = _t(spark, sf_dir, "lineitem")
    return mad_outliers(li, "l_extendedprice", ["l_returnflag"], k=3.0)


# ---------------------------------------------------------------------------
# Relational depth II: Q13/Q22-flavored shapes + cumulative windows
# ---------------------------------------------------------------------------


@register(
    "customer_order_distribution",
    """
    WITH per_cust AS (
      SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
    )
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM per_cust GROUP BY c_count
    """,
    doc="TPC-H Q13 shape: order count per customer INCLUDING zero-order "
    "customers (left join + count of the nullable side), then the "
    "distribution of those counts. Two shuffles: join on custkey (the "
    "first groupBy reuses that partitioning), then the tiny histogram "
    "agg. The left join keeps dormant customers — an inner join would "
    "silently drop the c_count=0 bucket.",
)
def q_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "dormant_rich_customers",
    """
    WITH avg_bal AS (
      SELECT CAST(SUM(CAST(FLOOR(c_acctbal * 10000) AS BIGINT)) AS BIGINT) AS total_fp,
             CAST(count(*) AS BIGINT) AS n
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_custkey, c.c_mktsegment,
           CAST(FLOOR(c.c_acctbal * 10000) AS BIGINT) AS acctbal_fp
    FROM customer c CROSS JOIN avg_bal a
    WHERE CAST(FLOOR(c.c_acctbal * 10000) AS BIGINT) * a.n > a.total_fp
      AND c.c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
    ORDER BY c.c_custkey
    """,
    doc="TPC-H Q22 shape: customers with above-average positive balance "
    "and no currently-open order — scalar-subquery threshold + anti-join. The "
    "mean comparison is exact: bal > sum/n rewritten as bal_fp*n > "
    "sum_fp in int64, so no double division enters the predicate. The "
    "one-row aggregate broadcasts (literal-sized cross join); the "
    "anti-join shuffles on custkey only.",
)
def q_dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    bal_fp = F.floor(F.col("c_acctbal") * 10000).cast("long")
    avg_bal = (
        cust.where(F.col("c_acctbal") > 0.0)
        .agg(F.sum(bal_fp).alias("total_fp"), F.count(F.lit(1)).alias("n"))
    )
    return (
        cust.withColumn("acctbal_fp", bal_fp)
        .crossJoin(F.broadcast(avg_bal))
        .where(F.col("acctbal_fp") * F.col("n") > F.col("total_fp"))
        .join(
            orders.where(F.col("o_orderstatus") == "O").select("o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .select("c_custkey", "c_mktsegment", "acctbal_fp")
        .orderBy("c_custkey")
    )


@register(
    "cumulative_revenue",
    """
    SELECT o_custkey, o_orderkey,
           CAST(FLOOR(epoch(o_orderdate)) AS BIGINT) AS order_sec,
           CAST(row_number() OVER w AS BIGINT) AS order_seq,
           CAST(SUM(CAST(FLOOR(o_totalprice * 10000) AS BIGINT)) OVER w AS BIGINT)
             AS cum_revenue_fp
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    doc="Per-customer running lifetime spend: cumulative window sum over "
    "fixed-point totals with a (date, orderkey) deterministic order. One "
    "shuffle on custkey; the running sum is a single ordered pass per "
    "partition — the canonical 'customer lifetime value so far' query.",
)
def q_cumulative_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.unix_timestamp("o_orderdate").cast("long").alias("order_sec"),
        F.row_number().over(w).cast("long").alias("order_seq"),
        F.sum(F.floor(F.col("o_totalprice") * 10000).cast("long")).over(w).alias("cum_revenue_fp"),
    )


# ---------------------------------------------------------------------------
# Training-corpus statistics II: splits, bigrams, co-occurrence
# ---------------------------------------------------------------------------


@register(
    "train_split_assign",
    """
    SELECT doc_id, source,
           CASE WHEN b < 8000 THEN 'train'
                WHEN b < 9000 THEN 'val'
                ELSE 'test' END AS split
    FROM (SELECT doc_id, source,
                 ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 10000 AS b
          FROM documents)
    """,
    doc="Deterministic train/val/test split (operators/sampling.py "
    "hash_split): split membership is a pure md5 function of doc_id — "
    "stable across runs, engines and repartitionings, so eval sets never "
    "leak when the corpus grows. Scan-local, zero shuffle.",
)
def q_train_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.sampling import hash_split

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    return hash_split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})


@register(
    "bigram_transitions",
    """
    WITH tok AS (
      SELECT ts FROM (
        SELECT list_filter(list_transform(regexp_split_to_array(text, '\\s+'),
                                          x -> lower(x)), x -> x <> '') AS ts
        FROM documents WHERE text IS NOT NULL
      ) WHERE len(ts) >= 2
    ), bg AS (
      SELECT t.ts[i] AS w1, t.ts[i + 1] AS w2
      FROM (SELECT ts, unnest(generate_series(1, len(ts) - 1)) AS i FROM tok) t
    ), c AS (
      SELECT w1, w2, CAST(count(*) AS BIGINT) AS n FROM bg GROUP BY w1, w2
    ), f AS (
      SELECT w1, w2, n, CAST(SUM(n) OVER (PARTITION BY w1) AS BIGINT) AS n_first
      FROM c
    )
    SELECT w1, w2, n, n_first, CAST(n * 1000000 // n_first AS BIGINT) AS prob_fp
    FROM f ORDER BY n DESC, w1, w2 LIMIT 50
    """,
    doc="Token bigram transition table (operators/text_analysis.py "
    "bigram_transitions): adjacent-pair counts + integer-exact "
    "P(w2|w1) — the Markov-model precursor behind boilerplate "
    "predictability filters. Bigrams are built inside the row "
    "(slice+transform, no positional self-join); the w1 window runs "
    "over the aggregated pair table only.",
)
def q_bigram_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.text_analysis import bigram_transitions

    return bigram_transitions(_tp(spark, sf_dir, "documents"), top_n=50)


@register(
    "token_cooccurrence",
    """
    WITH tok AS (
      SELECT doc_id,
             unnest(list_filter(list_transform(regexp_split_to_array(text, '\\s+'),
                                               x -> lower(x)), x -> x <> '')) AS token
      FROM documents WHERE text IS NOT NULL
    ), v AS (
      SELECT token FROM (
        SELECT token, count(*) AS n FROM tok GROUP BY token
        ORDER BY n DESC, token LIMIT 20
      )
    ), dt AS (
      SELECT DISTINCT doc_id, token FROM tok JOIN v USING (token)
    )
    SELECT a.token AS t1, b.token AS t2, CAST(count(*) AS BIGINT) AS n_docs
    FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.token < b.token
    GROUP BY a.token, b.token
    """,
    doc="Top-vocabulary document co-occurrence (operators/text_analysis.py "
    "token_cooccurrence): for the 20 most frequent tokens, in how many "
    "documents each unordered pair co-appears. The vocabulary cap bounds "
    "the quadratic at C(20,2) pairs per doc BY CONTRACT; pairs generate "
    "inside the row from the sorted per-doc token set (no positional "
    "self-join), vocab joins by broadcast.",
)
def q_token_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.text_analysis import token_cooccurrence

    return token_cooccurrence(_tp(spark, sf_dir, "documents"), vocab_n=20)


# ---------------------------------------------------------------------------
# Temporal intervals (SCD2 / gaps-and-islands) + graph triangles
# ---------------------------------------------------------------------------


@register(
    "status_run_intervals",
    """
    WITH f AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(event_type) OVER w IS NULL
                    OR lag(event_type) OVER w <> event_type
                  THEN 1 ELSE 0 END AS chg
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), r AS (
      SELECT *, SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
      FROM f
    ), runs AS (
      SELECT user_id, run, min(event_type) AS event_type, min(ts) AS f0,
             CAST(count(*) AS BIGINT) AS n_events
      FROM r GROUP BY user_id, run
    )
    SELECT user_id, CAST(run AS BIGINT) AS run_seq, event_type,
           CAST(FLOOR(epoch(f0)) AS BIGINT) AS valid_from_sec,
           CAST(FLOOR(epoch(lead(f0) OVER (PARTITION BY user_id ORDER BY run)))
                AS BIGINT) AS valid_to_sec,
           n_events
    FROM runs
    """,
    doc="SCD-Type-2 validity intervals (operators/timeseries.py "
    "status_intervals): collapse each user's event stream into maximal "
    "runs of equal event_type with [valid_from, valid_to) epoch-second "
    "bounds (NULL valid_to = current run) — gaps-and-islands via "
    "lag+cumsum run numbering, run ends chained by lead over the "
    "aggregated runs (no correlated self-join).",
)
def q_status_run_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.timeseries import status_intervals

    ev = _t(spark, sf_dir, "events")
    return status_intervals(ev, "user_id", "ts", "event_type", "event_id")


@register(
    "part_triangle_count",
    """
    WITH op AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), e AS (
      SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
      FROM op a JOIN op b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    )
    SELECT CAST(count(*) AS BIGINT) AS n_triangles
    FROM e e1 JOIN e e2 ON e2.a = e1.b JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    """,
    doc="Exact triangle count (operators/graph.py triangle_count) over the "
    "part co-purchase graph (parts sharing an order). Compact-forward "
    "orientation by (degree, id): wedge fan-out per node is bounded by "
    "oriented out-degree = O(sqrt(E)) even for hub parts — the naive "
    "id-ordered wedge join would hand a celebrity node its full degree. "
    "Oracle is the plain a<b<c three-way join (small-sf only).",
)
def q_part_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.graph import triangle_count

    li = _t(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    o2 = op.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("p2"))
    edges = (
        op.join(o2, (op["l_orderkey"] == o2["k"]) & (op["l_partkey"] < o2["p2"]))
        .select(F.col("l_partkey").alias("src"), F.col("p2").alias("dst"))
    )
    return triangle_count(edges)


# ---------------------------------------------------------------------------
# TPC-H-shape relational depth, round 2: Q7/Q8/Q14/Q18/Q19/Q21 adaptations
# (the testdata lacks partsupp/commitdate/shipmode, so Q9/Q12/Q21-as-written
# are out of reach; Q21's exists/not-exists shape is re-derived from
# l_shipdate vs o_orderdate instead).
# ---------------------------------------------------------------------------


@register(
    "volume_shipping",
    """
    SELECT sn.n_name AS supp_nation,
           cn.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INT) AS l_year,
           SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) / 10000.0
             AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
        OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1, 2, 3
    """,
    doc="TPC-H Q7 shape: bilateral trade volume between two nations by ship "
    "year. Two broadcast copies of nation, disjunctive cross-nation "
    "predicate evaluated after both dim joins; fact-side date filter is "
    "pushed to the lineitem scan.",
)
def q_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("l_year"))
        .agg(_xsum(disc).alias("revenue"))
    )


@register(
    "market_share",
    """
    WITH rev AS (
      SELECT CAST(year(o_orderdate) AS INT) AS o_year,
             CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT) AS rev_x,
             sn.n_name AS supp_nation
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      JOIN region   ON cn.n_regionkey = r_regionkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      WHERE r_name = 'ASIA'
    )
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_5' THEN rev_x ELSE 0 END) AS BIGINT)
             AS nation_rev_x,
           CAST(SUM(rev_x) AS BIGINT) AS total_rev_x,
           CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_5' THEN rev_x ELSE 0 END) AS BIGINT)
             * 10000 // CAST(SUM(rev_x) AS BIGINT) AS BIGINT) AS share_bp
    FROM rev GROUP BY o_year
    """,
    doc="TPC-H Q8 shape: NATION_5 suppliers' share of revenue to ASIA "
    "customers per order year. The share is exact integer basis points "
    "(int64 fixed-point numerator/denominator, floor division) so the "
    "ratio is hash-stable cross-engine; numerator and denominator are "
    "also emitted raw.",
)
def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    asia = region.filter(F.col("r_name") == "ASIA")
    rev_x = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * F.lit(_XS)
    ).cast("long")
    nation_rev = F.sum(
        F.when(F.col("supp_nation") == "NATION_5", rev_x).otherwise(F.lit(0))
    )
    total_rev = F.sum(rev_x)
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(asia), F.col("cn_region") == F.col("r_regionkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(nation_rev.alias("nation_rev_x"), total_rev.alias("total_rev_x"))
        .withColumn("share_bp", F.expr("nation_rev_x * 10000 div total_rev_x"))
    )


@register(
    "promo_revenue_share",
    """
    SELECT CAST(year(l_shipdate) AS INT) AS l_year,
           CAST(SUM(CASE WHEN p_type = 'PROMO'
                    THEN CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS promo_rev_x,
           CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT)
             AS total_rev_x,
           CAST(CAST(SUM(CASE WHEN p_type = 'PROMO'
                    THEN CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)
                    ELSE 0 END) AS BIGINT) * 10000
             // CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT)
             AS BIGINT) AS promo_share_bp
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY l_year
    """,
    doc="TPC-H Q14 shape: PROMO-type parts' share of yearly revenue. "
    "Broadcast part join; share as exact integer basis points.",
)
def q_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    rev_x = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * F.lit(_XS)
    ).cast("long")
    promo_x = F.when(F.col("p_type") == "PROMO", rev_x).otherwise(F.lit(0))
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.year("l_shipdate").cast("int").alias("l_year"))
        .agg(F.sum(promo_x).alias("promo_rev_x"), F.sum(rev_x).alias("total_rev_x"))
        .withColumn("promo_share_bp", F.expr("promo_rev_x * 10000 div total_rev_x"))
    )


@register(
    "large_orders",
    """
    SELECT c_custkey, c_name, o_orderkey,
           CAST(epoch(o_orderdate) AS BIGINT) AS o_epoch,
           CAST(FLOOR(o_totalprice * 10000) AS BIGINT) AS totalprice_x,
           CAST(SUM(CAST(FLOOR(l_quantity * 10000) AS BIGINT)) AS BIGINT) AS qty_x
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(FLOOR(l_quantity * 10000) AS BIGINT)) > 150 * 10000
    )
    GROUP BY 1, 2, 3, 4, 5
    """,
    doc="TPC-H Q18 shape (large-volume orders): orders whose total quantity "
    "exceeds 150, with customer attribution. The HAVING subquery becomes "
    "a semi-join against the aggregated keys; quantities ride the "
    "fixed-point bridge end to end.",
)
def q_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    li = _t(spark, sf_dir, "lineitem")
    qty_x = F.floor(F.col("l_quantity") * F.lit(_XS)).cast("long")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(qty_x).alias("qty_x"))
        .filter(F.col("qty_x") > 150 * _XS)
        .select("l_orderkey", "qty_x")
    )
    return (
        orders.join(big, F.col("o_orderkey") == big["l_orderkey"])
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("timestamp").cast("long").alias("o_epoch"),
            F.floor(F.col("o_totalprice") * F.lit(_XS)).cast("long").alias("totalprice_x"),
            "qty_x",
        )
    )


@register(
    "disjunctive_part_revenue",
    """
    SELECT SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) / 10000.0
             AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 20)
       OR (p_brand = 'Brand#22' AND p_size BETWEEN 10 AND 30
           AND l_quantity >= 10 AND l_quantity <= 35)
       OR (p_brand = 'Brand#15' AND p_size BETWEEN 20 AND 50
           AND l_quantity >= 25 AND l_quantity <= 50)
    """,
    doc="TPC-H Q19 shape: disjunction of brand/size/quantity conjunctions. "
    "Catalyst splits the OR into a part-side residual (brand+size — "
    "evaluated inside the broadcast join) and keeps the mixed "
    "lineitem+part terms as a post-join filter; the common l_quantity "
    "range [1,50] is not pre-filterable, which is exactly the Q19 "
    "stress.",
)
def q_disjunctive_part_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    q = F.col("l_quantity")
    s = F.col("p_size")
    pred = (
        ((F.col("p_brand") == "Brand#11") & s.between(1, 15) & q.between(1, 20))
        | ((F.col("p_brand") == "Brand#22") & s.between(10, 30) & q.between(10, 35))
        | ((F.col("p_brand") == "Brand#15") & s.between(20, 50) & q.between(25, 50))
    )
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(pred)
        .agg(_xsum(disc).alias("revenue"), F.count(F.lit(1)).cast("long").alias("n_items"))
    )


@register(
    "waiting_suppliers",
    """
    WITH lo AS (
      SELECT l_orderkey, l_suppkey,
             max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 180 DAY
                      THEN 1 ELSE 0 END) AS late
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1, 2
    ), ord AS (
      SELECT l_orderkey,
             count(*) AS n_supp,
             SUM(late) AS n_late_supp
      FROM lo GROUP BY 1
    )
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM lo
    JOIN ord USING (l_orderkey)
    JOIN supplier ON lo.l_suppkey = s_suppkey
    WHERE lo.late = 1 AND ord.n_supp >= 2 AND ord.n_late_supp = 1
    GROUP BY s_name
    """,
    doc="TPC-H Q21 shape re-derived without l_commitdate: a supplier 'kept "
    "the order waiting' when it is the ONLY supplier on a multi-supplier "
    "order that shipped >180 days after the order date. The classic "
    "EXISTS / NOT EXISTS pair collapses into one per-(order,supplier) "
    "aggregate plus a per-order window over the SAME partitioning — the "
    "fact table is scanned once; the orders join's shuffle on "
    "l_orderkey is reused by the grouped agg and the window (no "
    "correlated self-joins, no second scan); supplier dim is broadcast.",
)
def q_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    supplier = _t(spark, sf_dir, "supplier")
    late = F.max(
        F.when(
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 180 DAYS"),
            F.lit(1),
        ).otherwise(F.lit(0))
    ).alias("late")
    lo = (
        li.join(orders.select("o_orderkey", "o_orderdate"),
                F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(late)
    )
    w = Window.partitionBy("l_orderkey")
    return (
        lo.withColumn("n_supp", F.count(F.lit(1)).over(w))
        .withColumn("n_late_supp", F.sum("late").over(w))
        .filter((F.col("late") == 1) & (F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
    )


# ---------------------------------------------------------------------------
# Corpus hygiene, round 2: PII redaction, encoding profile, n-gram novelty
# ---------------------------------------------------------------------------

#: Deterministic PII augmentation shared by the Spark query and the
#: oracle: the synthetic documents contain no organic PII, so both
#: engines graft identical synthetic emails/phones/IPs onto a doc_id-
#: keyed subset — detection and redaction then operate on real,
#: varied text with known-nonzero match counts.
_PII_AUG_SQL = """
    text
    || CASE WHEN doc_id % 3 = 0
            THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
            ELSE '' END
    || CASE WHEN doc_id % 4 = 0
            THEN ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
            ELSE '' END
    || CASE WHEN doc_id % 5 = 0
            THEN ' host 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                 || '.' || CAST(doc_id * 7 % 256 AS VARCHAR)
            ELSE '' END
"""


def _pii_aug_spark():
    did = F.col("doc_id")
    return F.concat(
        F.col("text"),
        F.when(
            did % 3 == 0,
            F.concat(F.lit(" contact user"), did.cast("string"), F.lit("@example.com")),
        ).otherwise(F.lit("")),
        F.when(
            did % 4 == 0,
            F.concat(
                F.lit(" call +1-555-"),
                F.lpad((did % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            did % 5 == 0,
            F.concat(
                F.lit(" host 10.0."),
                (did % 256).cast("string"),
                F.lit("."),
                ((did * 7) % 256).cast("string"),
            ),
        ).otherwise(F.lit("")),
    )


from pasta_pipeline_spark.operators.pii import (  # noqa: E402
    EMAIL_PATTERN,
    IPV4_PATTERN,
    PHONE_PATTERN,
)

_PII_ORACLE = f"""
    WITH aug AS (
      SELECT doc_id, {_PII_AUG_SQL} AS t FROM documents
    ), red AS (
      SELECT doc_id, t,
             regexp_replace(regexp_replace(regexp_replace(t,
                '{EMAIL_PATTERN}', '<EMAIL>', 'g'),
                '{PHONE_PATTERN}', '<PHONE>', 'g'),
                '{IPV4_PATTERN}', '<IP>', 'g') AS r
      FROM aug
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '{EMAIL_PATTERN}')) AS BIGINT) AS n_email,
           CAST(len(regexp_extract_all(t, '{PHONE_PATTERN}')) AS BIGINT) AS n_phone,
           CAST(len(regexp_extract_all(t, '{IPV4_PATTERN}')) AS BIGINT) AS n_ipv4,
           md5(r) AS redacted_md5,
           CAST(length(r) AS BIGINT) AS n_redacted_chars
    FROM red
"""


@register(
    "pii_scan",
    _PII_ORACLE,
    doc="PII detection + redaction (operators/pii.py): portable "
    "RE2/Java/Python regexes, fixed redaction order, all native "
    "expressions. The redacted text itself is hash-compared (md5), "
    "not just the counts — a replacement-order bug cannot hide.",
)
def q_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.pii import scan_pii

    docs = _tp(spark, sf_dir, "documents").withColumn("aug", _pii_aug_spark())
    return (
        scan_pii(docs, "doc_id", "aug")
        .select(
            "doc_id",
            F.col("n_email"),
            F.col("n_phone"),
            F.col("n_ipv4"),
            F.md5("redacted").alias("redacted_md5"),
            F.length("redacted").cast("long").alias("n_redacted_chars"),
        )
    )


@register(
    "encoding_quality",
    """
    WITH toks AS (
      SELECT doc_id, text,
             list_filter(regexp_split_to_array(text, '\\s+'), y -> y <> '') AS t
      FROM documents
    )
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS n_digits,
           CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS BIGINT) AS n_punct,
           CAST(len(regexp_extract_all(text, '[ \t\n\r]')) AS BIGINT) AS n_ws,
           CAST(len(regexp_extract_all(text, '[ \t\n\r]+')) AS BIGINT) AS n_ws_runs,
           CAST(len(regexp_extract_all(text, '[^\\x00-\\x7f]')) AS BIGINT) AS n_nonascii,
           CAST(len(regexp_extract_all(text, '�')) AS BIGINT) AS n_replacement,
           CAST(coalesce(list_max(list_transform(t, y -> length(y))), 0) AS BIGINT)
             AS max_token_chars
    FROM toks
    """,
    doc="Encoding/mojibake hygiene profile (text_analysis.encoding_profile): "
    "per-doc character-class counts, whitespace runs, U+FFFD decode-error "
    "markers, longest-token blob detector — all portable-regex native "
    "expressions.",
)
def q_encoding_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.text_analysis import encoding_profile

    docs = _tp(spark, sf_dir, "documents")
    prof = encoding_profile("text")
    return docs.select("doc_id", *[c.alias(name) for name, c in prof.items()])


@register(
    "ngram_novelty",
    """
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '\\s+'), y -> y <> '') AS t
      FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id,
             CASE WHEN len(t) >= 5
                  THEN t[i]||' '||t[i+1]||' '||t[i+2]||' '||t[i+3]||' '||t[i+4]
                  ELSE array_to_string(t, ' ') END AS s
      FROM (SELECT doc_id, t,
                   unnest(generate_series(1, greatest(len(t) - 4, 1))) AS i
            FROM toks)
    ), dfreq AS (
      SELECT s, count(*) AS df FROM sh GROUP BY s
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
           CAST(CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) * 10000
             // CAST(count(*) AS BIGINT) AS BIGINT) AS novelty_bp
    FROM sh JOIN dfreq USING (s)
    GROUP BY doc_id
    """,
    doc="Per-document 5-gram novelty (text_dedup.shingle_novelty): share of "
    "a doc's distinct shingles occurring in no other document — the "
    "global-boilerplate complement to pairwise dedup. Inverted-index "
    "skeleton without the pair explosion; exact integer basis points.",
)
def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.text_dedup import shingle_novelty

    docs = _tp(spark, sf_dir, "documents")
    return shingle_novelty(docs, "doc_id", "text", n=5)


def _semantic_dedup_oracle(
    dim: int = 64,
    num_planes: int = 4,
    num_bands: int = 2,
    threshold: float = 0.4,
    bucket_cap: int | None = DEFAULT_BUCKET_CAP,
) -> str:
    """DuckDB twin of semantic_dedup: same inlined deterministic
    banded planes as _cosine_dup_lsh_oracle, then NOT EXISTS over the
    smaller-id band-colliding neighbors."""
    cos = _cosine_sql("a.embedding::DOUBLE[]", "b.embedding::DOUBLE[]")
    return f"""
    WITH planes(band, pidx, pv) AS (VALUES
        {_banded_planes_sql(dim, num_planes, num_bands)}),{_banded_eb_sql(bucket_cap)},
    cand AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM eb a JOIN eb b
        ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id
    ),
    drops AS (
      SELECT DISTINCT c.id_b AS vec_id
      FROM cand c
      JOIN embeddings a ON a.vec_id = c.id_a
      JOIN embeddings b ON b.vec_id = c.id_b
      WHERE {cos} >= {threshold}
    )
    SELECT e.vec_id,
           CAST(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS INT) AS kept
    FROM embeddings e LEFT JOIN drops d ON e.vec_id = d.vec_id
    """


@register(
    "semantic_dedup",
    _semantic_dedup_oracle(),
    doc="SemDedup-style embedding-level dedup (similarity.semantic_dedup): "
    "smallest id of every near-dup group survives; OR-of-2-bands sign-LSH "
    "gates the pair join so the contract is deterministic AND the plan is "
    "near-linear with recall that grows as bands are added. Oracle "
    "replays the banding + NOT EXISTS in DuckDB.",
)
def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.similarity import semantic_dedup

    emb = _t(spark, sf_dir, "embeddings")
    return semantic_dedup(emb, threshold=0.4, dim=64, num_planes=4, num_bands=2)


# ---------------------------------------------------------------------------
# Round 2: time-based rolling frames and weighted sampling
# ---------------------------------------------------------------------------


@register(
    "rolling_hour_stats",
    """
    SELECT user_id,
           CAST(epoch_us(ts) AS BIGINT) AS ts_us,
           value,
           CAST(count(*) OVER w AS BIGINT) AS n_win,
           CAST(SUM(CAST(FLOOR(value * 10000) AS BIGINT)) OVER w AS BIGINT) AS sum_x,
           CAST(CAST(SUM(CAST(FLOOR(value * 10000) AS BIGINT)) OVER w AS BIGINT)
                // CAST(count(*) OVER w AS BIGINT) AS BIGINT) AS avg_x
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY CAST(epoch_us(ts) AS BIGINT)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
    doc="Trailing-1h rolling count/sum/mean per user over irregular events "
    "(timeseries.rolling_range_agg): a RANGE frame on epoch-microsecond "
    "ordering — time-distance peers, not row counts, so irregular spacing "
    "and simultaneous events behave identically cross-engine. Single "
    "sorted pass per key, no self-join; mean is exact integer fixed-point.",
)
def q_rolling_hour_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.timeseries import rolling_range_agg

    ev = _t(spark, sf_dir, "events")
    return rolling_range_agg(ev, "user_id", "ts", "value", window_sec=3600)


@register(
    "weighted_sample",
    """
    WITH scored AS (
      SELECT doc_id, lang, n_chars,
             ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT + 1)
                / 1152921504606846976.0)
               / CAST(n_chars AS DOUBLE) AS score
      FROM documents
      WHERE n_chars IS NOT NULL AND n_chars > 0
    )
    SELECT doc_id, lang, n_chars, rk FROM (
      SELECT doc_id, lang, n_chars,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY score DESC, doc_id ASC) AS rk
      FROM scored
    ) WHERE rk <= 5
    """,
    doc="Deterministic weighted sampling without replacement (sampling."
    "weighted_sample_topk, Efraimidis-Spirakis A-ES): 5 docs per language "
    "weighted by length, u = md5-uniform(doc_id), score = ln(u)/w. No RNG "
    "state — reproducible across runs and engines; ln on (0,1] is "
    "bit-stable (determinism playbook #7).",
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.sampling import weighted_sample_topk

    docs = _t(spark, sf_dir, "documents")
    return weighted_sample_topk(
        docs.select("doc_id", "lang", "n_chars"), "doc_id", "n_chars", k=5, group_col="lang"
    )


# ---------------------------------------------------------------------------
# Round 2: CDC apply, snapshot diff, cohort retention
# ---------------------------------------------------------------------------

_ORDER_COLS = "o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority"


@register(
    "cdc_apply",
    f"""
    WITH changes AS (
      SELECT {_ORDER_COLS}, 'D' AS op, 1 AS seq FROM orders WHERE o_orderkey % 10 = 0
      UNION ALL
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice + 1000, o_orderdate,
             o_orderpriority, 'U' AS op, 2 AS seq
      FROM orders WHERE o_orderkey % 7 = 0
      UNION ALL
      SELECT o_orderkey + 1000000, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
             o_orderpriority, 'I' AS op, 3 AS seq
      FROM orders WHERE o_orderkey % 13 = 0
    ), latest AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey ORDER BY seq DESC) AS rn
        FROM changes
      ) WHERE rn = 1
    ), survivors AS (
      SELECT o.* FROM orders o
      WHERE NOT EXISTS (SELECT 1 FROM latest l
                        WHERE l.o_orderkey = o.o_orderkey AND l.op = 'D')
    ), merged AS (
      SELECT {_ORDER_COLS} FROM latest WHERE op <> 'D'
      UNION ALL
      SELECT {_ORDER_COLS} FROM survivors s
      WHERE NOT EXISTS (SELECT 1 FROM latest l
                        WHERE l.o_orderkey = s.o_orderkey AND l.op <> 'D')
    )
    SELECT o_orderkey, o_custkey, o_orderstatus,
           CAST(epoch(o_orderdate) AS BIGINT) AS o_epoch,
           CAST(FLOOR(o_totalprice * 10000) AS BIGINT) AS totalprice_x
    FROM merged
    """,
    doc="CDC log apply (merge.apply_cdc): I/U/D change log collapses to the "
    "latest op per key, deletes drop the key, the rest last-writer-wins — "
    "equivalent to row-by-row replay in seq order; the upsert family "
    "member ON CONFLICT cannot express. Window + anti-join + merge, all "
    "on the same key. The log here is derived deterministically from "
    "orders (D for keys %10, U with bumped price for %7, I of shifted "
    "keys for %13 — overlaps exercise the seq collapse).",
)
def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.merge import apply_cdc

    orders = _t(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    d = orders.filter(k % 10 == 0).withColumn("op", F.lit("D")).withColumn("seq", F.lit(1))
    u = (
        orders.filter(k % 7 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") + 1000)
        .withColumn("op", F.lit("U"))
        .withColumn("seq", F.lit(2))
    )
    i = (
        orders.filter(k % 13 == 0)
        .withColumn("o_orderkey", k + 1000000)
        .withColumn("op", F.lit("I"))
        .withColumn("seq", F.lit(3))
    )
    changes = d.unionByName(u).unionByName(i)
    merged = apply_cdc(orders, changes, "o_orderkey")
    return merged.select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.col("o_orderdate").cast("timestamp").cast("long").alias("o_epoch"),
        F.floor(F.col("o_totalprice") * F.lit(_XS)).cast("long").alias("totalprice_x"),
    )


@register(
    "snapshot_diff_orders",
    """
    WITH old AS (
      SELECT * FROM orders WHERE o_orderkey % 97 <> 0
    ), new AS (
      SELECT o_orderkey, o_custkey, o_orderstatus,
             CASE WHEN o_orderkey % 89 = 0 THEN o_totalprice + 1 ELSE o_totalprice END
               AS o_totalprice,
             o_orderdate, o_orderpriority
      FROM orders WHERE o_orderkey % 83 <> 0
    )
    SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
           CASE WHEN o.o_orderkey IS NULL THEN 'added'
                WHEN n.o_orderkey IS NULL THEN 'removed'
                WHEN o.o_custkey IS NOT DISTINCT FROM n.o_custkey
                 AND o.o_orderstatus IS NOT DISTINCT FROM n.o_orderstatus
                 AND o.o_totalprice IS NOT DISTINCT FROM n.o_totalprice
                 AND o.o_orderdate IS NOT DISTINCT FROM n.o_orderdate
                 AND o.o_orderpriority IS NOT DISTINCT FROM n.o_orderpriority
                THEN 'unchanged'
                ELSE 'changed' END AS diff_status
    FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
    """,
    doc="Snapshot diff (merge.snapshot_diff): per-key added/removed/changed/"
    "unchanged between two table versions — the audit complement to the "
    "merge family (TableStore keeps the predecessor snapshot for exactly "
    "this). One full-outer join, null-safe column conjunction. Old/new "
    "are derived deterministically from orders (%97 removed from old, "
    "%83 removed from new, %89 price-bumped).",
)
def q_snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.merge import snapshot_diff

    orders = _t(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    old = orders.filter(k % 97 != 0)
    new = orders.filter(k % 83 != 0).withColumn(
        "o_totalprice",
        F.when(k % 89 == 0, F.col("o_totalprice") + 1).otherwise(F.col("o_totalprice")),
    )
    return snapshot_diff(old, new, "o_orderkey")


@register(
    "cohort_retention",
    """
    WITH activity AS (
      SELECT DISTINCT user_id,
             CAST(epoch_us(ts) // 604800000000 AS BIGINT) AS wk
      FROM events
    ), cohorts AS (
      SELECT user_id, MIN(wk) AS cwk FROM activity GROUP BY user_id
    )
    SELECT c.cwk AS cohort_week, a.wk - c.cwk AS week_offset,
           CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
    FROM activity a JOIN cohorts c ON a.user_id = c.user_id
    GROUP BY 1, 2
    """,
    doc="Cohort retention matrix (sessions.cohort_retention): users "
    "cohorted by the epoch-week of their first event; cells count "
    "distinct users active N weeks later. Integer epoch weeks — no "
    "calendar semantics to diverge cross-engine; state bounded by "
    "user x week distinct, not event volume.",
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.sessions import cohort_retention

    ev = _t(spark, sf_dir, "events")
    return cohort_retention(ev, "user_id", "ts")


# ---------------------------------------------------------------------------
# Round 2: event-gap stats, Zipf rank-frequency slope, dedup savings report
# ---------------------------------------------------------------------------


@register(
    "event_gap_stats",
    """
    WITH g AS (
      SELECT user_id,
             CAST(epoch_us(ts) AS BIGINT)
               - lag(CAST(epoch_us(ts) AS BIGINT))
                 OVER (PARTITION BY user_id ORDER BY CAST(epoch_us(ts) AS BIGINT), event_id)
               AS gap
      FROM events
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(gap) AS BIGINT) AS n_gaps,
           CAST(min(gap) AS BIGINT) AS min_gap_us,
           CAST(max(gap) AS BIGINT) AS max_gap_us,
           CASE WHEN count(gap) > 0
                THEN CAST(CAST(SUM(gap) AS BIGINT) // CAST(count(gap) AS BIGINT) AS BIGINT)
                ELSE NULL END AS avg_gap_us
    FROM g GROUP BY user_id
    """,
    doc="Inter-event gap profile per user: lag over (epoch-micros, event_id) "
    "ordering — the deterministic-tiebreak lag idiom — then integer "
    "min/max/mean. One window + one agg on the same key partitioning; "
    "single-event users surface NULL gaps, not fabricated zeros.",
)
def q_event_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy(us, F.col("event_id"))
    gap = us - F.lag(us).over(w)
    return (
        ev.select("user_id", gap.alias("gap"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count("gap").alias("n_gaps"),
            F.min("gap").alias("min_gap_us"),
            F.max("gap").alias("max_gap_us"),
            F.sum("gap").alias("_sum_gap"),
        )
        .withColumn(
            "avg_gap_us",
            F.when(F.col("n_gaps") > 0, F.expr("_sum_gap div n_gaps")).otherwise(
                F.lit(None).cast("long")
            ),
        )
        .drop("_sum_gap")
    )


@register(
    "zipf_slope",
    """
    WITH tok AS (
      SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'), y -> y <> ''))
               AS token
      FROM documents
    ), freq AS (
      SELECT token, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY token
    ), ranked AS (
      SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, token ASC) AS rk FROM freq
    ), terms AS (
      SELECT CAST(FLOOR(ln(CAST(rk AS DOUBLE)) * 1000000) AS BIGINT) AS x,
             CAST(FLOOR(ln(CAST(n AS DOUBLE)) * 1000000) AS BIGINT) AS y
      FROM ranked WHERE rk <= 100
    )
    SELECT CAST(count(*) AS BIGINT) AS n_terms,
           CAST(CAST(count(*) AS BIGINT) * CAST(SUM(x * y) AS BIGINT)
                - CAST(SUM(x) AS BIGINT) * CAST(SUM(y) AS BIGINT) AS BIGINT) AS slope_num,
           CAST(CAST(count(*) AS BIGINT) * CAST(SUM(x * x) AS BIGINT)
                - CAST(SUM(x) AS BIGINT) * CAST(SUM(x) AS BIGINT) AS BIGINT) AS slope_den,
           CAST(CAST(count(*) AS BIGINT) * CAST(SUM(x * y) AS BIGINT)
                - CAST(SUM(x) AS BIGINT) * CAST(SUM(y) AS BIGINT) AS DOUBLE)
             / CAST(CAST(count(*) AS BIGINT) * CAST(SUM(x * x) AS BIGINT)
                - CAST(SUM(x) AS BIGINT) * CAST(SUM(x) AS BIGINT) AS DOUBLE) AS slope
    FROM terms
    """,
    doc="Zipf rank-frequency slope of the corpus: OLS of ln(freq) on "
    "ln(rank) over the top-100 vocabulary (text_analysis.build_vocab "
    "ranks). A healthy natural corpus slopes ~-1; word salad flattens — "
    "a one-number corpus-health probe. Every moment sum is int64 "
    "(floor-scaled ln terms, exact integer products), so the final "
    "double is one division of two identical BIGINTs — hash-stable.",
)
def q_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.text_analysis import build_vocab

    docs = _tp(spark, sf_dir, "documents")
    vocab = build_vocab(docs, top_n=100)
    x = F.floor(F.log(F.col("token_id").cast("double")) * F.lit(1000000)).cast("long")
    y = F.floor(F.log(F.col("n_occurrences").cast("double")) * F.lit(1000000)).cast("long")
    agg = vocab.select(x.alias("x"), y.alias("y")).agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.sum(F.col("x") * F.col("y")).alias("_sxy"),
        F.sum("x").alias("_sx"),
        F.sum("y").alias("_sy"),
        F.sum(F.col("x") * F.col("x")).alias("_sxx"),
    )
    return (
        agg.withColumn("slope_num", F.expr("n_terms * _sxy - _sx * _sy"))
        .withColumn("slope_den", F.expr("n_terms * _sxx - _sx * _sx"))
        .withColumn(
            "slope", F.col("slope_num").cast("double") / F.col("slope_den").cast("double")
        )
        .select("n_terms", "slope_num", "slope_den", "slope")
    )


_DEDUP_SAVINGS_ORACLE = """
    WITH RECURSIVE pairs AS (
""" + _JACCARD_ORACLE + """
    ), edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM pairs
    ), cc(node, lbl) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.dst, c.lbl FROM cc c JOIN edges e ON c.node = e.src
    ), clusters AS (
      SELECT node AS doc_id, min(lbl) AS cluster_id FROM cc GROUP BY node
    )
    SELECT c.cluster_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(CAST(d.n_chars AS BIGINT)) AS BIGINT) AS bytes_total,
           CAST(SUM(CASE WHEN c.doc_id <> c.cluster_id THEN CAST(d.n_chars AS BIGINT)
                         ELSE 0 END) AS BIGINT) AS bytes_saved
    FROM clusters c JOIN documents d ON c.doc_id = d.doc_id
    GROUP BY c.cluster_id
    HAVING count(*) > 1
"""


@register(
    "dedup_savings",
    _DEDUP_SAVINGS_ORACLE,
    doc="Dedup savings report: per near-dup cluster (3-gram Jaccard >= 0.5 "
    "connected components), member count, total bytes, and the bytes "
    "removed when only the smallest-id survivor is kept — the number a "
    "pipeline owner actually acts on. Composition of duplicate_clusters "
    "+ one broadcast-sized join + one agg; singleton clusters are "
    "excluded (they save nothing).",
)
def q_dedup_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.text_dedup import duplicate_clusters, jaccard_pairs
    from pasta_pipeline_spark.operators.util import release_cached_deps

    docs = _t(spark, sf_dir, "documents")
    pairs = jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5)
    clusters = duplicate_clusters(docs, pairs)
    release_cached_deps(pairs)
    nchars = docs.select("doc_id", F.col("n_chars").cast("long").alias("nc"))
    return (
        clusters.join(nchars, "doc_id")
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nc").alias("bytes_total"),
            F.sum(F.when(F.col("doc_id") != F.col("cluster_id"), F.col("nc")).otherwise(0)).alias(
                "bytes_saved"
            ),
        )
        .filter(F.col("n_docs") > 1)
    )


# ---------------------------------------------------------------------------
# Round 2: mergeable summaries and scalable sequential ids
# ---------------------------------------------------------------------------


@register(
    "mergeable_summary",
    """
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_x,
           CAST(MIN(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS min_x,
           CAST(MAX(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS max_x,
           CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)
                    * CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sumsq_x,
           CAST(CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) / 100.0 AS mean,
           (CAST(CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)
                          * CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS DOUBLE)
               / CAST(count(*) AS DOUBLE)
            - (CAST(CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS DOUBLE)
               / CAST(count(*) AS DOUBLE))
              * (CAST(CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS DOUBLE)
               / CAST(count(*) AS DOUBLE)))
           / 10000.0 AS variance
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Mergeable-summary contract (operators/summaries.py): the engine "
    "builds per-flag summaries over the even and odd halves of lineitem "
    "SEPARATELY, merges them, and finalizes — the oracle aggregates the "
    "whole table directly. A hash match proves the merge is exact "
    "(int64 state, no merge-order sensitivity): the foundation of "
    "incremental rollups, where a daily summary folds into a lifetime "
    "summary without re-reading history.",
)
def q_mergeable_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.summaries import (
        finalize_summary,
        merge_summaries,
        partial_summary,
    )

    li = _t(spark, sf_dir, "lineitem")
    even = partial_summary(li.filter(F.col("l_orderkey") % 2 == 0), "l_returnflag", "l_extendedprice")
    odd = partial_summary(li.filter(F.col("l_orderkey") % 2 == 1), "l_returnflag", "l_extendedprice")
    return finalize_summary(merge_summaries(even, odd, "l_returnflag"))


@register(
    "sequential_ids",
    """
    SELECT doc_id, lang,
           CAST(ROW_NUMBER() OVER (ORDER BY lang, doc_id) AS BIGINT) AS seq_id
    FROM documents
    """,
    doc="Scalable global row numbering (operators/ids.py): range-partition "
    "by the order key, per-partition counts prefix-summed on the driver "
    "(P numbers, metadata scale), broadcast offsets + within-partition "
    "rank — exactly row_number() over a total order with NO "
    "single-task global sort. The oracle is the naive global window.",
)
def q_sequential_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.ids import assign_sequential_ids

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    return assign_sequential_ids(docs, ["lang", "doc_id"])


@register(
    "shard_manifest",
    """
    WITH ranked AS (
      SELECT n_chars,
             CAST(ROW_NUMBER() OVER (ORDER BY lang, doc_id) AS BIGINT) AS seq,
             CAST(count(*) OVER () AS BIGINT) AS total
      FROM documents
    )
    SELECT CAST((seq - 1) * 8 // total AS INT) AS shard,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(min(seq) AS BIGINT) AS min_seq,
           CAST(max(seq) AS BIGINT) AS max_seq,
           CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS total_size
    FROM ranked GROUP BY 1
    """,
    doc="Training-output sharding (ids.shard_manifest): equal-depth "
    "contiguous shards from scalable global ranks — ntile semantics "
    "without ntile's single-task empty-OVER() sort — plus the per-shard "
    "manifest (counts, byte sums, rank ranges) a writer publishes so "
    "readers can verify shard completeness without listing files.",
)
def q_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.ids import shard_manifest

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return shard_manifest(docs, ["lang", "doc_id"], n_shards=8, size_col="n_chars")


@register(
    "cross_contamination_pairs",
    """
    WITH tr AS (SELECT * FROM documents WHERE doc_id % 2 = 0),
    ev AS (SELECT * FROM documents WHERE doc_id % 2 = 1),
    ttoks AS (
      SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\\s+'), y -> y <> '') AS t FROM tr
    ), tsh AS (
      SELECT DISTINCT doc_id,
             CASE WHEN len(t) >= 3 THEN t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                  ELSE array_to_string(t, ' ') END AS s
      FROM (SELECT doc_id, t, unnest(generate_series(1, greatest(len(t) - 2, 1))) AS i FROM ttoks)
    ), etoks AS (
      SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\\s+'), y -> y <> '') AS t FROM ev
    ), esh AS (
      SELECT DISTINCT doc_id,
             CASE WHEN len(t) >= 3 THEN t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                  ELSE array_to_string(t, ' ') END AS s
      FROM (SELECT doc_id, t, unnest(generate_series(1, greatest(len(t) - 2, 1))) AS i FROM etoks)
    ), tsz AS (SELECT doc_id, count(*) AS n_l FROM tsh GROUP BY doc_id),
    esz AS (SELECT doc_id, count(*) AS n_r FROM esh GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS left_id, b.doc_id AS right_id, count(*) AS n_common
      FROM tsh a JOIN esh b ON a.s = b.s GROUP BY 1, 2
    )
    SELECT left_id, right_id,
           CAST(n_common AS DOUBLE) / CAST(t.n_l + e.n_r - n_common AS DOUBLE) AS jaccard
    FROM common
    JOIN tsz t ON t.doc_id = left_id
    JOIN esz e ON e.doc_id = right_id
    WHERE CAST(n_common AS DOUBLE) / CAST(t.n_l + e.n_r - n_common AS DOUBLE) >= 0.5
    """,
    doc="Pair-level cross-corpus contamination (text_dedup."
    "cross_jaccard_pairs): bipartite 3-gram Jaccard between a 'train' "
    "half and an 'eval' half (doc_id parity split) — names WHICH train "
    "doc leaks into WHICH eval doc, where contamination_check only "
    "flags documents. Inverted-index join across corpora; no "
    "within-corpus pairs ever materialize.",
)
def q_cross_contamination_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.text_dedup import cross_jaccard_pairs

    docs = _t(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 2 == 0)
    eval_ = docs.filter(F.col("doc_id") % 2 == 1)
    return cross_jaccard_pairs(train, eval_, "doc_id", "text", n=3, threshold=0.5)


@register(
    "price_deciles",
    """
    SELECT l_returnflag, decile,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(MIN(CAST(FLOOR(l_extendedprice * 10000) AS BIGINT)) AS BIGINT) AS min_price_x,
           CAST(MAX(CAST(FLOOR(l_extendedprice * 10000) AS BIGINT)) AS BIGINT) AS max_price_x
    FROM (
      SELECT l_returnflag, l_extendedprice,
             NTILE(10) OVER (PARTITION BY l_returnflag
                             ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS decile
      FROM lineitem
    ) GROUP BY 1, 2
    """,
    doc="Grouped equi-depth deciles via NTILE partitioned by return flag — "
    "scalable because the window partitions by the group (no empty OVER() "
    "single-task sort); ordering carries the (orderkey, linenumber) "
    "tiebreak so bucket boundaries are deterministic cross-engine.",
)
def q_price_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    px = F.floor(F.col("l_extendedprice") * F.lit(_XS)).cast("long")
    return (
        li.withColumn("decile", F.ntile(10).over(w))
        .groupBy("l_returnflag", "decile")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.min(px).alias("min_price_x"),
            F.max(px).alias("max_price_x"),
        )
    )


@register(
    "forecast_revenue_change",
    """
    SELECT SUM(CAST(FLOOR(l_extendedprice * l_discount * 10000) AS BIGINT)) / 10000.0
             AS revenue_delta,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape (forecast revenue change): pure scan-filter-agg — "
    "every predicate reaches the parquet scan (row-group pruning on "
    "shipdate min/max does the heavy lifting at scale), fixed-point sum "
    "of price*discount.",
)
def q_forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    pred = (
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.filter(pred).agg(
        _xsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue_delta"),
        F.count(F.lit(1)).cast("long").alias("n_items"),
    )


@register(
    "top_supplier_revenue",
    """
    WITH rev AS (
      SELECT l_suppkey,
             CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))
               AS BIGINT) AS total_rev_x
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1997-07-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_rev_x
    FROM rev JOIN supplier ON l_suppkey = s_suppkey
    WHERE total_rev_x = (SELECT max(total_rev_x) FROM rev)
    """,
    doc="TPC-H Q15 shape (top supplier): per-supplier revenue for one "
    "quarter-half, then the max via a scalar subquery — Spark expresses "
    "the view + correlated max as one aggregate reused for both the "
    "ranking and the threshold (no second scan of lineitem); supplier "
    "dim broadcast. The empty-OVER max runs on the aggregated "
    "per-supplier frame (|suppliers| rows), so its single partition is "
    "bounded by the dimension, never the fact table.",
)
def q_top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    supplier = _t(spark, sf_dir, "supplier")
    rev_x = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * F.lit(_XS)
    ).cast("long")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(rev_x).alias("total_rev_x"))
    )
    w = Window.partitionBy()
    top = rev.withColumn("__max", F.max("total_rev_x").over(w)).filter(
        F.col("total_rev_x") == F.col("__max")
    )
    return top.join(
        F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey")
    ).select("s_suppkey", "s_name", "total_rev_x")


# ---------------------------------------------------------------------------
# TPC-H-shape relational depth, round 3: Q9/Q10/Q11/Q12/Q17/Q20 adaptations
# (partsupp/shipmode/commitdate don't exist in the testdata; supply cost is
# proxied as half the retail price, ship mode is derived deterministically
# from the line number, and Q20's availqty test becomes a majority-share
# test over each part's shipped quantity).
# ---------------------------------------------------------------------------


@register(
    "product_profit",
    """
    SELECT n_name AS nation,
           CAST(year(o_orderdate) AS INT) AS o_year,
           CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)
                  - CAST(FLOOR(p_retailprice * l_quantity * 0.5 * 10000) AS BIGINT))
             AS BIGINT) AS profit_x
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN orders   ON l_orderkey = o_orderkey
    WHERE p_name LIKE '%red%'
    GROUP BY 1, 2
    """,
    doc="TPC-H Q9 shape (product-type profit): revenue minus a supply-cost "
    "proxy (half retail price x quantity — the testdata has no partsupp), "
    "grouped by supplier nation and order year. Both cost terms are "
    "floored to int64 PER ROW before the subtraction so the profit sum "
    "is exact and order-free in both engines; part/supplier/nation "
    "dims broadcast, one shuffle join against orders.",
)
def q_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders")
    rev_x = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * F.lit(_XS)
    ).cast("long")
    cost_x = F.floor(
        F.col("p_retailprice") * F.col("l_quantity") * F.lit(0.5) * F.lit(_XS)
    ).cast("long")
    return (
        li.join(F.broadcast(part.filter(F.col("p_name").like("%red%"))),
                F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.sum(rev_x - cost_x).alias("profit_x"))
    )


@register(
    "returned_item_customers",
    """
    SELECT c_custkey, c_name, n_name AS nation,
           CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))
             AS BIGINT) AS revenue_x
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-07-01'
    GROUP BY 1, 2, 3
    ORDER BY revenue_x DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 shape (returned-item reporting): revenue lost to "
    "returns per customer for one half-year, top 20. Selective order-date "
    "predicate pushed to the orders scan; nation broadcast; the LIMIT "
    "rides a total order with the customer key as tiebreak "
    "(TakeOrderedAndProject, no global sort).",
)
def q_returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    rev_x = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * F.lit(_XS)
    ).cast("long")
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(F.sum(rev_x).alias("revenue_x"))
        .orderBy(F.desc("revenue_x"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "important_parts",
    """
    WITH v AS (
      SELECT l_partkey AS p_key,
             CAST(SUM(CAST(FLOOR(l_extendedprice * l_quantity * 10000) AS BIGINT))
               AS BIGINT) AS value_x
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      WHERE s_nationkey = 1
      GROUP BY l_partkey
    )
    SELECT p_key, value_x
    FROM v
    WHERE value_x * (SELECT CAST(count(*) AS BIGINT) FROM v)
          > 3 * (SELECT CAST(SUM(value_x) AS BIGINT) FROM v)
    """,
    doc="TPC-H Q11 shape (important stock): per-part shipped value from "
    "one nation's suppliers, keeping parts worth more than 3x the MEAN "
    "part value — partsupp's availqty x supplycost becomes quantity x "
    "price over lineitem, and Q11's fixed fraction-of-total threshold "
    "becomes a multiple-of-mean so the predicate keeps selecting rows "
    "as the part count grows with scale. The HAVING-over-grand-total "
    "is the benign 1-row scalar handoff (the per-part agg is computed "
    "once and reused for the total, the count, and the filter); the "
    "share test is an exact int64 cross-multiplication, no division.",
)
def q_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    supplier = _t(spark, sf_dir, "supplier")
    val_x = F.floor(
        F.col("l_extendedprice") * F.col("l_quantity") * F.lit(_XS)
    ).cast("long")
    v = (
        li.join(
            F.broadcast(supplier.filter(F.col("s_nationkey") == 1)),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy(F.col("l_partkey").alias("p_key"))
        .agg(F.sum(val_x).alias("value_x"))
    )
    total = v.agg(
        F.sum("value_x").cast("long").alias("__total"),
        F.count(F.lit(1)).cast("long").alias("__nparts"),
    )
    return (
        v.crossJoin(F.broadcast(total))
        .filter(F.col("value_x") * F.col("__nparts") > F.lit(3) * F.col("__total"))
        .select("p_key", "value_x")
    )


@register(
    "shipmode_priority",
    """
    SELECT CASE l_linenumber % 3 WHEN 0 THEN 'MAIL' WHEN 1 THEN 'SHIP'
           ELSE 'AIR' END AS ship_mode,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= o_orderdate + INTERVAL 60 DAY
    GROUP BY 1
    """,
    doc="TPC-H Q12 shape (shipping modes vs priority): high/low-priority "
    "line counts per ship mode for slow shipments (>=60 days after the "
    "order date — the testdata has no shipmode or receiptdate, so the "
    "mode derives deterministically from the line number). Exact "
    "timestamp interval arithmetic and integer counts in both engines.",
)
def q_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    mode = (
        F.when(F.col("l_linenumber") % 3 == 0, "MAIL")
        .when(F.col("l_linenumber") % 3 == 1, "SHIP")
        .otherwise("AIR")
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy(mode.alias("ship_mode"))
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(is_high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


@register(
    "small_quantity_revenue",
    """
    WITH w AS (
      SELECT l_partkey, p_brand,
             CAST(FLOOR(l_quantity * 10000) AS BIGINT) AS qty_x,
             CAST(FLOOR(l_extendedprice * 10000) AS BIGINT) AS price_x,
             CAST(SUM(CAST(FLOOR(l_quantity * 10000) AS BIGINT))
                  OVER (PARTITION BY l_partkey) AS BIGINT) AS sum_qty_x,
             CAST(count(*) OVER (PARTITION BY l_partkey) AS BIGINT) AS n
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      WHERE p_brand = 'Brand#3'
    )
    SELECT CAST(SUM(price_x) AS BIGINT) AS total_x,
           CAST(SUM(price_x) // 7 AS BIGINT) AS avg_yearly_x
    FROM w
    WHERE 5 * qty_x * n < sum_qty_x
    """,
    doc="TPC-H Q17 shape (small-quantity-order revenue): revenue from "
    "lineitems under 20% of their part's average quantity, one brand. "
    "The correlated AVG subquery decorrelates into a window over the "
    "SAME l_partkey partitioning (one shuffle, no self-join), and the "
    "20%-of-average test cross-multiplies in exact int64 "
    "(5*qty*n < sum) — no division anywhere until the final int-div "
    "by 7.",
)
def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    qty_x = F.floor(F.col("l_quantity") * F.lit(_XS)).cast("long")
    price_x = F.floor(F.col("l_extendedprice") * F.lit(_XS)).cast("long")
    w = Window.partitionBy("l_partkey")
    base = (
        li.join(
            F.broadcast(part.filter(F.col("p_brand") == "Brand#3")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .withColumn("qty_x", qty_x)
        .withColumn("price_x", price_x)
        .withColumn("sum_qty_x", F.sum("qty_x").over(w))
        .withColumn("n", F.count(F.lit(1)).over(w))
    )
    return (
        base.filter(F.lit(5) * F.col("qty_x") * F.col("n") < F.col("sum_qty_x"))
        .agg(F.sum("price_x").cast("long").alias("total_x"))
        .select(
            "total_x",
            F.expr("total_x div 7").cast("long").alias("avg_yearly_x"),
        )
    )


@register(
    "excess_shippers",
    """
    WITH sq AS (
      SELECT l_suppkey, l_partkey,
             CAST(SUM(CAST(FLOOR(l_quantity * 10000) AS BIGINT)) AS BIGINT) AS sup_qty_x
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      WHERE p_name LIKE 'red%'
        AND l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
      GROUP BY 1, 2
    ), tot AS (
      SELECT l_suppkey, l_partkey, sup_qty_x,
             CAST(SUM(sup_qty_x) OVER (PARTITION BY l_partkey) AS BIGINT) AS part_qty_x
      FROM sq
    )
    SELECT DISTINCT s_suppkey, s_name
    FROM tot JOIN supplier ON l_suppkey = s_suppkey
    WHERE 2 * sup_qty_x > part_qty_x
    """,
    doc="TPC-H Q20 shape (excess-stock suppliers): suppliers who shipped "
    "a MAJORITY of some red part's 1997 volume — partsupp's "
    "availqty > half-of-shipped test becomes a majority-share test over "
    "the shipped quantity itself. Per-(supplier,part) agg, then a "
    "window over the same part key (shuffle reused), exact int64 "
    "cross-multiplication, distinct supplier projection.",
)
def q_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    supplier = _t(spark, sf_dir, "supplier")
    qty_x = F.floor(F.col("l_quantity") * F.lit(_XS)).cast("long")
    sq = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(
            F.broadcast(part.filter(F.col("p_name").like("red%"))),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(qty_x).alias("sup_qty_x"))
    )
    w = Window.partitionBy("l_partkey")
    return (
        sq.withColumn("part_qty_x", F.sum("sup_qty_x").over(w))
        .filter(F.lit(2) * F.col("sup_qty_x") > F.col("part_qty_x"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name")
        .distinct()
    )


from pasta_pipeline_spark.operators.quality_filters import gopher_rules_sql as _gr_sql


@register(
    "gopher_quality_rules",
    _gr_sql(),
    doc="Gopher/C4-style rule-set quality gate (Rae et al. 2021 §A1.1): one "
    "named boolean per cleaning rule (word-count bounds, mean word length, "
    "symbol ratio, bullet/ellipsis line shares, alpha-word share, stopword "
    "gate) plus the overall pass flag — the auditable form of document "
    "filtering, complementing the blended quality_score. Single codegen "
    "projection, no shuffle; every ratio is an integer "
    "cross-multiplication; the oracle SQL is generated from the same "
    "thresholds so the two sides cannot drift.",
)
def q_gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.quality_filters import gopher_rules

    docs = _tp(spark, sf_dir, "documents")
    return gopher_rules(docs)


@register(
    "domain_blocklist_stats",
    """
    WITH u AS (
      SELECT doc_id,
             CASE doc_id % 5
               WHEN 0 THEN 'https://telegra.ph/' || source || '-' || doc_id
               WHEN 1 THEN 'https://example.com/page/' || doc_id
               WHEN 2 THEN 'https://spam.tracker.net/x?id=' || doc_id
               WHEN 3 THEN 'https://cdn.assets.example.com/obj/' || doc_id
               ELSE 'https://docs.wiki.org/a/' || doc_id END AS url
      FROM documents
    ), d AS (
      SELECT doc_id,
             regexp_extract(regexp_extract(url, '^[a-z]+://([^/:]+)', 1),
                            '([^.]+\\.[^.]+)$', 1) AS domain
      FROM u
    )
    SELECT domain,
           domain IN ('tracker.net') AS blocked,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) * 10000 // (SELECT CAST(count(*) AS BIGINT) FROM d) AS BIGINT)
             AS share_bp
    FROM d
    GROUP BY 1, 2
    """,
    doc="Per-domain corpus curation stats: registrable-domain extraction "
    "(last-two-labels; cdn.assets.example.com folds into example.com), "
    "doc counts, exact integer share in basis points, and the blocklist "
    "verdict — the site-level view a crawl pipeline filters and budgets "
    "by. URLs are constructed deterministically (url_validation's "
    "technique); Spark parses with try_parse_url(HOST), the oracle with "
    "an equivalent regex (identical on well-formed constructed input by "
    "construction). The grand total is the benign 1-row scalar handoff.",
)
def q_domain_blocklist_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.functions.urls import registrable_domain, url_host

    docs = _t(spark, sf_dir, "documents")
    url = (
        F.when(F.col("doc_id") % 5 == 0,
               F.concat(F.lit("https://telegra.ph/"), F.col("source"), F.lit("-"), F.col("doc_id")))
        .when(F.col("doc_id") % 5 == 1,
              F.concat(F.lit("https://example.com/page/"), F.col("doc_id")))
        .when(F.col("doc_id") % 5 == 2,
              F.concat(F.lit("https://spam.tracker.net/x?id="), F.col("doc_id")))
        .when(F.col("doc_id") % 5 == 3,
              F.concat(F.lit("https://cdn.assets.example.com/obj/"), F.col("doc_id")))
        .otherwise(F.concat(F.lit("https://docs.wiki.org/a/"), F.col("doc_id")))
    )
    d = docs.select(
        "doc_id", registrable_domain(url_host(url)).alias("domain")
    )
    total = d.agg(F.count(F.lit(1)).cast("long").alias("__total"))
    return (
        d.groupBy("domain")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .withColumn("blocked", F.col("domain").isin("tracker.net"))
        .crossJoin(F.broadcast(total))
        .select(
            "domain",
            "blocked",
            "n_docs",
            F.expr("n_docs * 10000 div __total").cast("long").alias("share_bp"),
        )
    )


@register(
    "bloom_prejoin_revenue",
    """
    SELECT s_suppkey, s_name,
           CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))
             AS BIGINT) AS revenue_x
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    WHERE s_acctbal >= 8000
    GROUP BY 1, 2
    """,
    doc="Approximate-membership pre-join reduction (the explicit form of "
    "Spark's runtime bloom filter): the fact side is prefiltered by a "
    "broadcast semi-join on coarse xxhash64 bucket ids built from the "
    "selective supplier subset, then the real join runs on the "
    "survivors. The bucket test has no false negatives, so the result "
    "is EXACTLY the plain join the oracle runs — the prefilter only "
    "sheds dead shuffle volume. operators/prejoin.py.",
)
def q_bloom_prejoin_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.prejoin import reduced_join

    li = _t(spark, sf_dir, "lineitem")
    supplier = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") >= 8000)
    build = supplier.select(
        F.col("s_suppkey").alias("l_suppkey"), "s_name"
    )
    rev_x = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * F.lit(_XS)
    ).cast("long")
    return (
        reduced_join(li, build, on="l_suppkey")
        .groupBy(F.col("l_suppkey").alias("s_suppkey"), F.col("s_name"))
        .agg(F.sum(rev_x).alias("revenue_x"))
    )


from pasta_pipeline_spark.operators.multimodal import chunk_manifest_sql as _cm_sql

_MEDIA_LEN_SQL = "(n_chars * 400 + (doc_id % 7) * 1000)"


@register(
    "media_chunk_manifest",
    _cm_sql(
        table=f"(SELECT doc_id, {_MEDIA_LEN_SQL} AS duration_ms FROM documents)",
        id_col="doc_id",
        length_col="duration_ms",
    ).replace("""SELECT id,
           CAST(chunk_idx AS BIGINT)""",
             """SELECT id AS doc_id,
           CAST(chunk_idx AS BIGINT)"""),
    doc="Audio/video chunk-manifest planning table: media lengths "
    "(synthesized deterministically from document stats — the container "
    "has no codecs) explode into fixed 30 s windows with 1 s overlap, "
    "exact integer chunk counts/offsets, end clamped to the length. The "
    "manifest is what the decode stage partitions on, so one long video "
    "never pins one task; the oracle SQL is generated from the same "
    "arithmetic (generate_series twin). operators/multimodal.py.",
)
def q_media_chunk_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.multimodal import chunk_manifest

    docs = _t(spark, sf_dir, "documents")
    media = docs.select(
        "doc_id",
        (F.col("n_chars") * 400 + (F.col("doc_id") % 7) * 1000).alias("duration_ms"),
    )
    return chunk_manifest(media, id_col="doc_id", length_col="duration_ms").withColumnRenamed("id", "doc_id")


# Adversarial adornments for the normalization query, shared by engine
# and oracle (playbook: one recipe generates both sides). Index = doc_id % 4.
_NORM_ADORN = [
    "",
    " café decomposed",          # e + COMBINING ACUTE -> NFC composes
    " ctrl\x07bell and\x1f unit",      # control chars stripped
    "  wide   gaps\tand\ttabs  ",      # whitespace collapse + trim
]


def _norm_adorn_sql() -> str:
    cases = []
    for i, s in enumerate(_NORM_ADORN):
        esc = "".join(f"\\x{ord(ch):02x}" if ord(ch) < 32 else ch for ch in s)
        esc = esc.replace("'", "''").replace("́", "' || chr(769) || '")
        cases.append(f"WHEN {i} THEN e'{esc}'")
    return "CASE doc_id % 4 " + " ".join(cases) + " ELSE '' END"


@register(
    "text_normalization",
    f"""
    WITH adorned AS (
      SELECT doc_id, text || {_norm_adorn_sql()} AS raw FROM documents
    )
    SELECT doc_id,
           {{clean}} AS norm_text,
           ({{clean}} IS DISTINCT FROM raw) AS changed
    FROM adorned
    """,
    doc="Unicode NFC + cleanup normalization (pre-tokenization hygiene): "
    "composed/decomposed unification via an Arrow-batched "
    "unicodedata.normalize stage (sanctioned Python stage; DuckDB twin "
    "nfc_normalize implements the same Unicode standard), then pure-"
    "expression control-char strip, whitespace collapse, trim. Inputs "
    "are adorned deterministically with decomposed accents, control "
    "bytes, and whitespace floods so every rule is exercised. "
    "operators/normalize_text.py.",
)
def q_text_normalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.normalize_text import normalize_documents

    docs = _tp(spark, sf_dir, "documents")
    adorn = F.element_at(
        F.array(*[F.lit(s) for s in _NORM_ADORN]),
        (F.col("doc_id") % 4 + 1).cast("int"),
    )
    adorned = docs.select(
        "doc_id", F.concat(F.col("text"), adorn).alias("raw")
    )
    return normalize_documents(adorned, text_col="raw", out_col="norm_text").select(
        "doc_id", "norm_text", "changed"
    )


# inject the generated clean-SQL into the oracle template
from pasta_pipeline_spark.operators.normalize_text import clean_text_sql as _ct_sql

REGISTRY["text_normalization"] = QuerySpec(
    spark_fn=REGISTRY["text_normalization"].spark_fn,
    oracle=REGISTRY["text_normalization"].oracle.replace(
        "{clean}", _ct_sql("nfc_normalize(raw)")
    ),
    doc=REGISTRY["text_normalization"].doc,
)


@register(
    "cluster_survivors",
    f"""
    SELECT c.doc_id, c.cluster_id,
           (row_number() OVER (PARTITION BY c.cluster_id
                               ORDER BY d.n_chars DESC, c.doc_id) = 1)
             AS is_survivor
    FROM ( {_CLUSTERS_ORACLE} ) c
    JOIN documents d ON c.doc_id = d.doc_id
    """,
    doc="Policy-driven dedup survivor selection: duplicate clusters "
    "(3-gram Jaccard >= 0.5 connected components) re-ranked so the "
    "LONGEST member survives (n_chars desc, id tiebreak) instead of "
    "the smallest id — the curation policy real pipelines want. One "
    "window over the cluster id. operators/text_dedup.py "
    "select_survivors.",
)
def q_cluster_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.text_dedup import (
        duplicate_clusters,
        jaccard_pairs,
        select_survivors,
    )
    from pasta_pipeline_spark.operators.util import release_cached_deps

    docs = _t(spark, sf_dir, "documents")
    pairs = jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5)
    clusters = duplicate_clusters(docs, pairs)
    release_cached_deps(pairs)
    return select_survivors(clusters, docs, score_col="n_chars")


@register(
    "byte_budget_sample",
    """
    WITH ranked AS (
      SELECT doc_id, source, n_chars,
             CAST(SUM(n_chars) OVER (PARTITION BY source
                    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_size
      FROM documents
    )
    SELECT doc_id, source, n_chars, cum_size
    FROM ranked
    WHERE cum_size - n_chars < 30000
    """,
    doc="Per-source byte-budget sampling (the training mix's token "
    "budget as an operator): docs taken in md5-shuffled order until "
    "each source's running size total passes 30 kB; a row is kept iff "
    "the total BEFORE it is under budget, so every source keeps at "
    "least one doc and overshoot is bounded by one row. One window "
    "shuffle on the source key. operators/sampling.py budget_sample.",
)
def q_byte_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.sampling import budget_sample

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    return budget_sample(
        docs, id_col="doc_id", size_col="n_chars", budget=30_000, group_col="source"
    )


@register(
    "trigram_search",
    """
    SELECT doc_id FROM documents WHERE contains(text, 'merge batch')
    """,
    doc="Index-accelerated substring search: candidates from a "
    "character-trigram inverted index (a doc can only match if it has "
    "EVERY trigram of the pattern — posting-list intersection as a "
    "gram bucket join), then exact contains() verification, so results "
    "are EXACTLY the full-scan LIKE the oracle runs. At scale the "
    "index persists partitioned by gram and the scan cost drops from "
    "corpus bytes to candidate bytes. operators/search.py.",
)
def q_trigram_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.search import substring_search

    docs = _tp(spark, sf_dir, "documents")
    return substring_search(docs, "merge batch")


@register(
    "embedding_outliers",
    """
    WITH cent AS (
      SELECT label, pos1 - 1 AS pos,
             SUM(CAST(FLOOR(embedding[pos1]::DOUBLE * 10000000) AS BIGINT)) / 10000000.0 / count(*) AS centroid
      FROM (SELECT label, unnest(generate_series(1, len(embedding))) AS pos1, embedding
            FROM embeddings)
      GROUP BY label, pos1
    ), dev AS (
      SELECT e.vec_id, e.label,
             CAST(FLOOR((e.embedding[c.pos + 1]::DOUBLE - c.centroid)
                        * (e.embedding[c.pos + 1]::DOUBLE - c.centroid)
                        * 10000000) AS BIGINT) AS d_fp
      FROM (SELECT vec_id, label, embedding FROM embeddings) e
      JOIN cent c ON e.label = c.label
    ), dist AS (
      SELECT vec_id, label, CAST(SUM(d_fp) AS BIGINT) AS dist_fp
      FROM dev GROUP BY vec_id, label
    )
    SELECT vec_id, label, dist_fp, rk FROM (
      SELECT vec_id, label, dist_fp,
             CAST(row_number() OVER (PARTITION BY label
                    ORDER BY dist_fp DESC, vec_id) AS BIGINT) AS rk
      FROM dist
    ) WHERE rk <= 5
    """,
    doc="Embedding-space outlier gate: the 5 vectors farthest from "
    "their label centroid per label (mislabeled/garbage detection). "
    "Exact fixed-point centroid reused from embedding_centroids; each "
    "dimension's squared deviation floors to int64 before the "
    "order-free sum; top-k rides (dist desc, id) — hash-stable. "
    "operators/similarity.py embedding_outliers.",
)
def q_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.similarity import embedding_outliers

    emb = _t(spark, sf_dir, "embeddings")
    return embedding_outliers(emb, k=5)


_QUALITY_WITH_SOURCE = _QUALITY_ORACLE.replace(
    "SELECT doc_id, text,", "SELECT doc_id, source, text,", 1
).replace(
    "SELECT doc_id,\n           CASE WHEN", "SELECT doc_id, source,\n           CASE WHEN", 1
)


@register(
    "quality_top_quartile",
    f"""
    WITH scored AS (
      SELECT doc_id, source, score,
             percent_rank() OVER (PARTITION BY source ORDER BY score, doc_id) AS pr
      FROM ( {_QUALITY_WITH_SOURCE} )
    )
    SELECT doc_id, source, score FROM scored WHERE pr >= 0.75
    """,
    doc="Adaptive per-source quality threshold: keep each source's top "
    "quartile by quality score (percent_rank >= 0.75 over (score, id)) "
    "— the mixing-aware alternative to one global cutoff, which would "
    "empty low-scoring sources entirely. percent_rank is "
    "(rank-1)/(n-1): integer-derived, so the double compares "
    "identically in both engines. One window shuffle on source.",
)
def q_quality_top_quartile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.text_analysis import quality_score

    docs = _tp(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", "source", quality_score("text").alias("score")
    )
    w = Window.partitionBy("source").orderBy(F.asc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("pr", F.percent_rank().over(w))
        .filter(F.col("pr") >= 0.75)
        .select("doc_id", "source", "score")
    )


@register(
    "key_skew_profile",
    """
    WITH c AS (
      SELECT l_suppkey AS key, CAST(count(*) AS BIGINT) AS n
      FROM lineitem GROUP BY l_suppkey
    ), m AS (
      SELECT CAST(SUM(n) AS BIGINT) AS total,
             CAST(MAX(n) AS BIGINT) AS max_n,
             CAST(count(*) AS BIGINT) AS n_keys
      FROM c
    )
    SELECT key, n,
           CAST(n * 10000 // total AS BIGINT) AS share_bp,
           CAST(max_n * n_keys * 10000 // total AS BIGINT) AS skew_x10000
    FROM c, m
    ORDER BY n DESC, key LIMIT 10
    """,
    doc="Shuffle-key skew profiler (the diagnostic behind choosing "
    "salting/AQE skew handling): top-10 hottest keys with exact integer "
    "share basis points, plus the skew factor max/mean x10000 "
    "(max_n * n_keys / total — >>10000 means one key dominates and a "
    "plain shuffle join will straggle). The grand total is the benign "
    "1-row scalar handoff; the top-10 rides TakeOrderedAndProject.",
)
def q_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    c = li.groupBy(F.col("l_suppkey").alias("key")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    m = c.agg(
        F.sum("n").cast("long").alias("total"),
        F.max("n").cast("long").alias("max_n"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
    )
    return (
        c.crossJoin(F.broadcast(m))
        .select(
            "key",
            "n",
            F.expr("n * 10000 div total").cast("long").alias("share_bp"),
            F.expr("max_n * n_keys * 10000 div total").cast("long").alias("skew_x10000"),
        )
        .orderBy(F.desc("n"), F.asc("key"))
        .limit(10)
    )


@register(
    "global_budget_sample",
    """
    WITH ranked AS (
      SELECT doc_id, n_chars,
             CAST(SUM(n_chars) OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_size
      FROM documents
    )
    SELECT doc_id, n_chars, cum_size
    FROM ranked
    WHERE cum_size - n_chars < 100000
    """,
    doc="Corpus-global size-budget sampling WITHOUT a single-task "
    "global sort: the running total decomposes into range partitions "
    "on the md5 order key + a driver prefix-sum of P partition totals "
    "(the sequential-ids idiom) — the oracle's single global window is "
    "exactly what this operator exists to avoid at scale. Keep rule: "
    "total BEFORE the row under 100 kB. operators/sampling.py "
    "budget_sample_global.",
)
def q_global_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.sampling import budget_sample_global

    docs = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return budget_sample_global(docs, id_col="doc_id", size_col="n_chars", budget=100_000)


def _cross_embedding_oracle(
    dim: int = 64,
    num_planes: int = 4,
    num_bands: int = 2,
    threshold: float = 0.4,
    bucket_cap: int | None = DEFAULT_BUCKET_CAP,
) -> str:
    """DuckDB twin of cross_corpus_cosine_pairs over the even/odd
    vec_id split — inlined banded plane constants, (band, bucket)
    equi-join BETWEEN the halves deduped across bands, exact cosine
    filter (cosine_dup_pairs technique)."""
    cos = _cosine_sql("t.embedding::DOUBLE[]", "e.embedding::DOUBLE[]")
    return f"""
    WITH planes(band, pidx, pv) AS (VALUES
        {_banded_planes_sql(dim, num_planes, num_bands)}),{_banded_eb_sql(bucket_cap)},
    cand AS (
      SELECT DISTINCT t.vec_id AS train_id, e.vec_id AS eval_id
      FROM eb t JOIN eb e ON t.band = e.band AND t.bucket = e.bucket
      WHERE t.vec_id % 2 = 0 AND e.vec_id % 2 = 1
    )
    SELECT c.train_id, c.eval_id, {cos} AS sim
    FROM cand c
    JOIN embeddings t ON t.vec_id = c.train_id
    JOIN embeddings e ON e.vec_id = c.eval_id
    WHERE {cos} >= {threshold}
    """


@register(
    "cross_embedding_contamination",
    _cross_embedding_oracle(),
    doc="Embedding-level train-vs-eval contamination: (train, eval) "
    "pairs with cosine >= 0.4, OR-of-2-bands sign-LSH gated BETWEEN the "
    "corpora (even/odd vec_id split stands in for the two corpora) — "
    "the semantic complement to the shingle-based contamination_check "
    "(paraphrased leakage shares no n-grams but lands in the same "
    "embedding neighborhood). Deterministic banded planes inlined in "
    "the oracle; every emitted pair hash-checked end to end. "
    "operators/similarity.py cross_corpus_cosine_pairs.",
)
def q_cross_embedding_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.similarity import cross_corpus_cosine_pairs

    emb = _t(spark, sf_dir, "embeddings")
    train = emb.filter(F.col("vec_id") % 2 == 0)
    ev = emb.filter(F.col("vec_id") % 2 == 1)
    return cross_corpus_cosine_pairs(
        train, ev, threshold=0.4, dim=64, num_planes=4, num_bands=2
    )


_CONTAINMENT_ORACLE = """
    WITH toks AS (
      SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\\s+'), y -> y <> '') AS t FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id,
             CASE WHEN len(t) >= 3 THEN t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                  ELSE array_to_string(t, ' ') END AS s
      FROM (SELECT doc_id, t, unnest(generate_series(1, greatest(len(t) - 2, 1))) AS i FROM toks)
    ), sizes AS (
      SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
    ), common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ), both_dirs AS (
      SELECT doc_a AS doc_inner, doc_b AS doc_outer,
             CAST(n_common AS DOUBLE) / CAST(sa.n_sh AS DOUBLE) AS containment
      FROM common JOIN sizes sa ON sa.doc_id = doc_a
      UNION ALL
      SELECT doc_b AS doc_inner, doc_a AS doc_outer,
             CAST(n_common AS DOUBLE) / CAST(sb.n_sh AS DOUBLE) AS containment
      FROM common JOIN sizes sb ON sb.doc_id = doc_b
    )
    SELECT doc_inner, doc_outer, containment
    FROM both_dirs WHERE containment >= 0.8
"""


@register(
    "containment_pairs",
    _CONTAINMENT_ORACLE,
    doc="Directed shingle-containment near-dups (|A∩B|/|A| >= 0.8): the "
    "asymmetric tier Jaccard misses — a short doc wholly embedded in a "
    "long one (quote inclusion, boilerplate wrapping) scores ~1.0 on "
    "the contained side. Same inverted-index pair generation and "
    "hot-shingle fallback as ngram_jaccard_pairs; only the denominator "
    "changes, per direction. operators/text_dedup.py containment_pairs.",
)
def q_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.text_dedup import containment_pairs

    docs = _t(spark, sf_dir, "documents")
    # shingle cache rides on the frame; the runner releases it after
    # materializing (util.release_cached_deps)
    return containment_pairs(docs, "doc_id", "text", n=3, threshold=0.8)


@register(
    "mergeable_quantiles",
    """
    WITH hist AS (
      SELECT l_returnflag,
             least(greatest((CAST(FLOOR(l_extendedprice * 100) AS BIGINT) - 0)
                   // 171875, 0), 63) AS bin,
             CAST(count(*) AS BIGINT) AS bin_n
      FROM lineitem WHERE l_extendedprice IS NOT NULL GROUP BY 1, 2
    ), ranked AS (
      SELECT l_returnflag, bin, bin_n,
             CAST(SUM(bin_n) OVER (PARTITION BY l_returnflag ORDER BY bin
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n,
             CAST(SUM(bin_n) OVER (PARTITION BY l_returnflag) AS BIGINT) AS total
      FROM hist
    ), q AS (
      SELECT l_returnflag, bin AS q_bin, cum_n, total,
             row_number() OVER (PARTITION BY l_returnflag ORDER BY bin) AS rk
      FROM ranked
      WHERE cum_n >= CAST(ceil(total * 9500 / 10000.0) AS BIGINT)
    )
    SELECT l_returnflag, q_bin, cum_n, total FROM q WHERE rk = 1
    """,
    doc="Mergeable fixed-bin quantile state (t-digest's role, exactly "
    "reproducible): per-returnflag price p95 located by integer rank "
    "over a 64-bin histogram whose state merges by addition — the "
    "incrementally-maintainable quantile for streaming/100 TB, where "
    "the exact percentile would rescan the corpus. Bin width "
    "hard-coded to (110000-0)*100/64 = 171875 fixed-point units in "
    "both engines. operators/summaries.py partial_histogram / "
    "histogram_quantile_bin.",
)
def q_mergeable_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.summaries import (
        histogram_quantile_bin,
        partial_histogram,
    )

    li = _t(spark, sf_dir, "lineitem")
    hist = partial_histogram(
        li, "l_returnflag", "l_extendedprice", lo=0.0, hi=110_000.0, n_bins=64
    )
    return histogram_quantile_bin(hist, "l_returnflag", p_bp=9500)


@register(
    "heavy_hitter_state",
    """
    WITH counts AS (
      SELECT l_returnflag, l_suppkey AS item, CAST(count(*) AS BIGINT) AS n
      FROM lineitem WHERE l_suppkey IS NOT NULL GROUP BY 1, 2
    ), ranked AS (
      SELECT l_returnflag, item, n,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY n DESC, item ASC) AS rk
      FROM counts
    )
    SELECT l_returnflag, item, n FROM ranked WHERE rk <= 16
    UNION ALL
    SELECT l_returnflag, CAST(NULL AS BIGINT) AS item,
           CAST(SUM(n) AS BIGINT) AS n
    FROM ranked WHERE rk > 16 GROUP BY l_returnflag
    """,
    doc="Mergeable truncated-counter heavy-hitter state "
    "(sketches.partial_heavy_hitters): per returnflag, the 16 most "
    "frequent suppliers with exact counts plus one NULL-item row "
    "carrying the truncated mass — the travelling error bound that "
    "makes the state mergeable across batches/tables (merge contract "
    "pytest-verified; this query hash-checks the state production: "
    "deterministic (count DESC, item ASC) truncation, NULL items "
    "excluded so the sentinel is unambiguous). Pins the EXACT mode "
    "(partition_cap=None) so the state is hash-comparable; the "
    "bounded default path has its own oracle (heavy_hitter_bounded) "
    "and bound pytest.",
)
def q_heavy_hitter_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.sketches import partial_heavy_hitters

    li = _t(spark, sf_dir, "lineitem")
    return partial_heavy_hitters(
        li, "l_returnflag", "l_suppkey", m=16, partition_cap=None
    )


@register(
    "duplicated_spans",
    """
    WITH toks AS (
      SELECT doc_id AS doc,
             list_filter(regexp_split_to_array(lower(text), '\\s+'), y -> y <> '') AS t
      FROM documents
    ), src AS (
      SELECT doc, t, len(t) AS n FROM toks WHERE len(t) >= 10
    ), wins AS (
      SELECT doc, CAST(i AS BIGINT) AS start, CAST(i + 9 AS BIGINT) AS "end",
             ('0x' || substr(md5(array_to_string(t[i:i+9], ' ')), 1, 15))::BIGINT AS wh
      FROM (SELECT doc, t, unnest(generate_series(1, n - 9)) AS i FROM src)
    ), dup AS (
      SELECT wh FROM wins GROUP BY wh HAVING count(*) >= 2
    ), dwin AS (
      SELECT w.doc, w.start, w."end" FROM wins w JOIN dup USING (wh)
    ), marked AS (
      SELECT doc, start, "end",
             CASE WHEN start > COALESCE(MAX("end") OVER (
                    PARTITION BY doc ORDER BY start
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -2) + 1
                  THEN 1 ELSE 0 END AS brk
      FROM dwin
    ), isl AS (
      SELECT doc, start, "end",
             SUM(brk) OVER (PARTITION BY doc ORDER BY start
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      FROM marked
    )
    SELECT doc, CAST(MIN(start) AS BIGINT) AS span_start,
           CAST(MAX("end") AS BIGINT) AS span_end,
           CAST(count(*) AS BIGINT) AS n_windows
    FROM isl GROUP BY doc, island
    """,
    doc="Exact duplicated-substring spans (Lee et al. ExactSubstr, "
    "distributed): maximal token ranges covered by 10-token windows "
    "occurring >= 2 times corpus-wide — the sub-document tier that cuts "
    "repeated boilerplate/quotes without dropping documents. Window-hash "
    "count + gaps-and-islands merge: two linear shuffles, no pair "
    "generation, cheaper than any pairwise tier at 100 TB. "
    "operators/subdoc_dedup.py duplicated_spans.",
)
def q_duplicated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.subdoc_dedup import duplicated_spans

    docs = _t(spark, sf_dir, "documents")
    return duplicated_spans(docs, "doc_id", "text", w=10, min_count=2)


@register(
    "span_cut_rewrite",
    """
    WITH toks AS (
      SELECT doc_id AS doc,
             list_filter(regexp_split_to_array(lower(text), '\\s+'), y -> y <> '') AS t
      FROM documents
    ), tok AS (
      SELECT doc, CAST(i AS BIGINT) AS pos, t[i] AS tok
      FROM (SELECT doc, t, unnest(generate_series(1, len(t))) AS i FROM toks)
      WHERE len(t) > 0
    ), src AS (
      SELECT doc, t, len(t) AS n FROM toks WHERE len(t) >= 10
    ), wins AS (
      SELECT doc, CAST(i AS BIGINT) AS start, CAST(i + 9 AS BIGINT) AS "end",
             ('0x' || substr(md5(array_to_string(t[i:i+9], ' ')), 1, 15))::BIGINT AS wh
      FROM (SELECT doc, t, unnest(generate_series(1, n - 9)) AS i FROM src)
    ), dup AS (
      SELECT wh FROM wins GROUP BY wh HAVING count(*) >= 2
    ), dwin AS (
      SELECT w.doc, w.start, w."end" FROM wins w JOIN dup USING (wh)
    ), kept AS (
      SELECT tk.doc, tk.pos, tk.tok
      FROM tok tk
      WHERE NOT EXISTS (
        SELECT 1 FROM dwin d
        WHERE d.doc = tk.doc AND tk.pos BETWEEN d.start AND d."end"
      )
    ), totals AS (
      SELECT doc, CAST(count(*) AS BIGINT) AS n_tokens FROM tok GROUP BY doc
    ), re AS (
      SELECT doc, string_agg(tok, ' ' ORDER BY pos) AS text_kept,
             CAST(count(*) AS BIGINT) AS n_kept
      FROM kept GROUP BY doc
    )
    SELECT t.doc, COALESCE(r.text_kept, '') AS text_kept, t.n_tokens,
           CAST(t.n_tokens - COALESCE(r.n_kept, 0) AS BIGINT) AS n_removed
    FROM totals t LEFT JOIN re r ON t.doc = r.doc
    """,
    doc="The cut pass over duplicated_spans: every document rewritten "
    "with its duplicated 10-token spans removed (kept token stream, "
    "original order; fully-duplicated docs survive as empty strings so "
    "corpus row count is stable). Per-doc range anti-join of token "
    "positions against span ranges + in-array reassembly — linear in "
    "token mass, zero pair generation. "
    "operators/subdoc_dedup.py remove_duplicated_spans.",
)
def q_span_cut_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.subdoc_dedup import remove_duplicated_spans

    docs = _t(spark, sf_dir, "documents")
    return remove_duplicated_spans(docs, "doc_id", "text", w=10, min_count=2)


@register(
    "pivot_status_by_region",
    """
    SELECT r_name,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
    doc="PIVOT surface: order-status counts spread to columns per region. "
    "The value list is DECLARED (pivot('o_orderstatus', [...])) so Spark "
    "skips the extra distinct-values job a blind pivot needs — at 100 TB "
    "that implicit first pass is a full scan; declaring values makes the "
    "pivot one conditional aggregation (identical plan to the CASE-WHEN "
    "oracle).",
)
def q_pivot_status_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    j = (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(nation, cust["c_nationkey"] == nation["n_nationkey"])
        .join(region, nation["n_regionkey"] == region["r_regionkey"])
    )
    piv = (
        j.groupBy("r_name")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "r_name",
        F.coalesce(F.col("F"), F.lit(0)).cast("long").alias("n_f"),
        F.coalesce(F.col("O"), F.lit(0)).cast("long").alias("n_o"),
        F.coalesce(F.col("P"), F.lit(0)).cast("long").alias("n_p"),
    )


@register(
    "cluster_rollup",
    f"""
    SELECT c.cluster_id,
           CAST(MIN(c.doc_id) AS BIGINT) AS canonical_id,
           CAST(count(*) AS BIGINT) AS n_members,
           CAST(SUM(CAST(d.n_chars AS BIGINT)) AS BIGINT) AS sum_n_chars
    FROM ( {_CLUSTERS_ORACLE} ) c
    JOIN documents d ON c.doc_id = d.doc_id
    GROUP BY c.cluster_id
    """,
    doc="Duplicate-cluster attribute rollup: per 3-gram-Jaccard cluster, "
    "the canonical (smallest) member id, member count, and accumulated "
    "byte mass — the post-dedup merge that lets the surviving record "
    "carry the GROUP's metadata (the reference's accumulate-upsert idea "
    "at cluster granularity). One doc-id join + one cluster groupBy. "
    "operators/text_dedup.py cluster_rollup.",
)
def q_cluster_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.text_dedup import (
        cluster_rollup,
        duplicate_clusters,
        jaccard_pairs,
    )
    from pasta_pipeline_spark.operators.util import release_cached_deps

    docs = _t(spark, sf_dir, "documents")
    pairs = jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5)
    clusters = duplicate_clusters(docs.select("doc_id"), pairs, id_col="doc_id")
    # the fixpoint loop materialized the pair plan — release its cache
    release_cached_deps(pairs)
    return cluster_rollup(clusters, docs.select("doc_id", "n_chars"), ["n_chars"])


@register(
    "quantized_topk",
    """
    WITH qsrc AS (
      SELECT embedding AS qv FROM embeddings ORDER BY vec_id LIMIT 1
    ), qm AS (
      SELECT qv, list_max(list_transform(qv, x -> abs(CAST(x AS DOUBLE)))) AS mx
      FROM qsrc
    ), qq AS (
      SELECT list_transform(qv, x ->
               CAST(round(CAST(x AS DOUBLE) * (127.0 / mx)) AS BIGINT)) AS qq
      FROM qm
    ), cm AS (
      SELECT vec_id, embedding,
             list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS mx
      FROM embeddings
    ), cq AS (
      SELECT vec_id,
             list_transform(embedding, x ->
               CAST(round(CAST(x AS DOUBLE) * (127.0 / mx)) AS BIGINT)) AS cq,
             CAST(greatest(1, FLOOR((127.0 / mx) * 10000)) AS BIGINT) AS scale_fp
      FROM cm WHERE mx > 0
    ), dots AS (
      SELECT c.vec_id, c.scale_fp,
             CAST(list_sum(list_transform(generate_series(1, len(c.cq)),
                    i -> c.cq[i] * qq.qq[i])) AS BIGINT) AS qdot
      FROM cq c, qq
    )
    SELECT vec_id, qdot, scale_fp,
           CAST(qdot * 10000 // scale_fp AS BIGINT) AS score_fp
    FROM dots
    WHERE scale_fp IS NOT NULL AND scale_fp > 0
    ORDER BY score_fp DESC, vec_id
    LIMIT 10
    """,
    doc="INT8-quantized top-k (similarity.quantized_topk) — the memory-"
    "bandwidth similarity tier: symmetric int8 quantization both sides, "
    "exact int64 dot product, integer rescale by the corpus vector's "
    "scale (qdot*10000 div scale_fp; both engines truncate toward zero). "
    "The one approximate tier whose ENTIRE ranking path is hash-exact "
    "integers — quantization, dot, rescale replayed bit-for-bit in the "
    "oracle. Same one-scan broadcast plan as cosine_topk.",
)
def q_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.similarity import quantized_topk

    emb = _t(spark, sf_dir, "embeddings")
    query = emb.orderBy("vec_id").limit(1).select(F.col("embedding").alias("qv"))
    return quantized_topk(emb, query, k=10)


_URL_VARIANTS_SQL = """
      SELECT doc_id,
             CASE doc_id % 4
               WHEN 0 THEN 'https://Example.COM/path' || (doc_id // 4) || '/?utm_source=x&b=2&a=1#frag'
               WHEN 1 THEN 'https://example.com/path' || (doc_id // 4) || '?a=1&b=2'
               WHEN 2 THEN 'https://example.com:443/path' || (doc_id // 4) || '/#section'
               ELSE 'http://other.net:80/p' || doc_id
             END AS url
      FROM documents
"""


@register(
    "url_dedup",
    f"""
    WITH src AS ({_URL_VARIANTS_SQL}),
    canon AS (
      SELECT doc_id,
             CASE WHEN regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1) <> ''
                   AND regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1) <> ''
             THEN
               lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) || '://' ||
               (CASE lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
                  WHEN 'https' THEN regexp_replace(lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)), ':443$', '')
                  WHEN 'http' THEN regexp_replace(lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)), ':80$', '')
                  ELSE lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1))
                END) ||
               regexp_replace(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1), '/+$', '') ||
               (CASE WHEN array_to_string(list_sort(list_filter(string_split(regexp_extract(url, '\\?([^#]*)', 1), '&'),
                       p -> p <> '' AND NOT regexp_matches(p, '^(utm_[^=]*|fbclid|gclid|ref_src|ref_url|mc_cid|mc_eid)='))), '&') <> ''
                 THEN '?' || array_to_string(list_sort(list_filter(string_split(regexp_extract(url, '\\?([^#]*)', 1), '&'),
                       p -> p <> '' AND NOT regexp_matches(p, '^(utm_[^=]*|fbclid|gclid|ref_src|ref_url|mc_cid|mc_eid)='))), '&')
                 ELSE '' END)
             END AS canonical_url
      FROM src
    )
    SELECT canonical_url,
           CAST(count(*) AS BIGINT) AS n_variants,
           CAST(MIN(doc_id) AS BIGINT) AS keep_id
    FROM canon GROUP BY canonical_url
    """,
    doc="URL-level dedup (the tier BEFORE text dedup in a web-corpus "
    "pipeline): crawl variants of the same page — tracking params, "
    "fragments, case-variant hosts, default ports, trailing slashes, "
    "permuted query params — collapse to one canonical URL "
    "(functions/urls.py canonicalize_url, pure expressions), then "
    "keep-first by id. Variant URLs are synthesized deterministically "
    "from doc ids so the oracle replays canonicalization bit-for-bit.",
)
def q_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.functions.urls import canonicalize_url

    docs = _t(spark, sf_dir, "documents")
    url = (
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(F.lit("https://Example.COM/path"), F.expr("doc_id div 4"),
                     F.lit("/?utm_source=x&b=2&a=1#frag")),
        )
        .when(
            F.col("doc_id") % 4 == 1,
            F.concat(F.lit("https://example.com/path"), F.expr("doc_id div 4"),
                     F.lit("?a=1&b=2")),
        )
        .when(
            F.col("doc_id") % 4 == 2,
            F.concat(F.lit("https://example.com:443/path"), F.expr("doc_id div 4"),
                     F.lit("/#section")),
        )
        .otherwise(F.concat(F.lit("http://other.net:80/p"), F.col("doc_id")))
    )
    canon = docs.select(
        "doc_id", canonicalize_url(url).alias("canonical_url")
    )
    return canon.groupBy("canonical_url").agg(
        F.count(F.lit(1)).cast("long").alias("n_variants"),
        F.min("doc_id").cast("long").alias("keep_id"),
    )


@register(
    "pseudonymize_join",
    """
    WITH c AS (
      SELECT substr(sha256('r4:' || CAST(c_custkey AS VARCHAR)), 1, 16) AS pid,
             c_acctbal
      FROM customer
    ), o AS (
      SELECT substr(sha256('r4:' || CAST(o_custkey AS VARCHAR)), 1, 16) AS pid,
             CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    )
    SELECT c.pid,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(SUM(o.cents) AS BIGINT) AS revenue_cents
    FROM c JOIN o ON c.pid = o.pid
    GROUP BY c.pid
    """,
    doc="Keyed pseudonymization that PRESERVES joins: customer and order "
    "ids are replaced by salted sha256 pseudonyms (operators/pii.py "
    "pseudonymize — JVM sha2 == DuckDB sha256 bit-for-bit) and the "
    "revenue join/aggregate still works on the pseudonymized keys — the "
    "governance contract (no raw IDs downstream, same relational "
    "algebra). One projection per side; join/agg unchanged.",
)
def q_pseudonymize_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.pii import pseudonymize

    cust = _t(spark, sf_dir, "customer").select(
        pseudonymize("c_custkey", "r4").alias("pid")
    )
    orders = _t(spark, sf_dir, "orders").select(
        pseudonymize("o_custkey", "r4").alias("pid"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    return cust.join(orders, "pid").groupBy("pid").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("cents").cast("long").alias("revenue_cents"),
    )


@register(
    "grouping_sets_revenue",
    """
    SELECT r_name, o_orderstatus,
           CAST(GROUPING(r_name) * 2 + GROUPING(o_orderstatus) AS INT) AS gid,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY GROUPING SETS ((r_name), (o_orderstatus))
    """,
    doc="Explicit GROUPING SETS (the general form ROLLUP/CUBE "
    "specialize): per-region revenue AND per-status revenue in one "
    "Expand + hash-aggregate pass — two independent breakdowns for one "
    "fact scan, the 100 TB argument for grouping sets over two "
    "queries. Spark 4 groupingSets DataFrame API; grouping-id "
    "disambiguates which set a row belongs to.",
)
def q_grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    j = (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(nation, cust["c_nationkey"] == nation["n_nationkey"])
        .join(region, nation["n_regionkey"] == region["r_regionkey"])
    )
    cents = F.floor(F.col("o_totalprice") * 100).cast("long")
    return (
        j.groupingSets([["r_name"], ["o_orderstatus"]], "r_name", "o_orderstatus")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.sum(cents).cast("long").alias("revenue_cents"),
        )
        .select("r_name", "o_orderstatus", "gid", "revenue_cents")
    )


@register(
    "dedup_weights",
    f"""
    WITH sizes AS (
      SELECT cluster_id, CAST(count(*) AS BIGINT) AS csize
      FROM ( {_CLUSTERS_ORACLE} ) GROUP BY cluster_id
    )
    SELECT c.doc_id, c.cluster_id, s.csize,
           CAST(10000 // s.csize AS BIGINT) AS weight_bp
    FROM ( {_CLUSTERS_ORACLE} ) c JOIN sizes s USING (cluster_id)
    """,
    doc="Soft dedup: instead of DROPPING duplicates, every member of a "
    "near-dup cluster gets sampling weight 1/cluster_size (integer "
    "basis points) so the GROUP contributes one document's worth of "
    "training mass while keeping variant coverage — the down-weighting "
    "alternative the SemDedup/DataComp ablations compare against "
    "hard removal. Cluster sizes from one groupBy over the connected "
    "components; weight arithmetic is integer division (both engines "
    "truncate).",
)
def q_dedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.text_dedup import (
        duplicate_clusters,
        jaccard_pairs,
    )
    from pasta_pipeline_spark.operators.util import release_cached_deps

    docs = _t(spark, sf_dir, "documents")
    pairs = jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5)
    clusters = duplicate_clusters(docs.select("doc_id"), pairs, id_col="doc_id")
    release_cached_deps(pairs)
    sizes = clusters.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("csize")
    )
    return (
        clusters.select("doc_id", "cluster_id")
        .join(sizes, "cluster_id")
        .select(
            "doc_id",
            "cluster_id",
            "csize",
            F.expr("10000 div csize").cast("long").alias("weight_bp"),
        )
    )


@register(
    "media_real_decode",
    _MEDIA_REAL_ORACLE,
    doc="REAL media decode, end-to-end hash-checked: synthesize_media "
    "builds true RIFF/WAVE files (even ids) and binary PPM images (odd "
    "ids) whose format parameters are integer functions of the id; "
    "extract_media_features(decode='real') parses the actual bytes back "
    "— WAV fmt/data chunk walk for sample rate/channels/duration, PPM "
    "header scan for dimensions — and the oracle computes the expected "
    "features from the ids alone. A decoder bug (wrong chunk offset, "
    "wrong block-align handling, header misparse) breaks the hash. "
    "operators/multimodal.py decode_wav / decode_ppm.",
)
def q_media_real_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.multimodal import (
        extract_media_features,
        synthesize_media,
    )

    docs = _tp(spark, sf_dir, "documents").select(F.col("doc_id"))
    media = synthesize_media(docs, id_col="doc_id")
    return extract_media_features(media, decode="real").select(
        "media_id", "media_type", "n_bytes", "width", "height",
        "duration_ms", "sample_rate",
    )


@register(
    "heavy_hitter_bounded",
    """
    WITH counts AS (
      SELECT l_linestatus, l_suppkey AS item, CAST(count(*) AS BIGINT) AS n
      FROM lineitem WHERE l_suppkey IS NOT NULL GROUP BY 1, 2
    ), ranked AS (
      SELECT l_linestatus, item, n,
             row_number() OVER (PARTITION BY l_linestatus
                                ORDER BY n DESC, item ASC) AS rk
      FROM counts
    )
    SELECT l_linestatus, item, n FROM ranked WHERE rk <= 8
    UNION ALL
    SELECT l_linestatus, CAST(NULL AS BIGINT) AS item,
           CAST(SUM(n) AS BIGINT) AS n
    FROM ranked WHERE rk > 8 GROUP BY l_linestatus
    """,
    doc="Heavy hitters through the BOUNDED-shuffle path (the "
    "sketches.partial_heavy_hitters default): the Arrow-batched "
    "per-partition truncation stage runs with a cap high enough that "
    "no truncation occurs at test scale, so the result is provably "
    "identical to the exact groupBy — which hash-checks the pandas "
    "counting stage itself (local count merge, per-key emission, "
    "dropped-mass sentinel plumbing) against plain SQL. The "
    "truncation *bound* under small caps is pytest-verified "
    "(test_heavy_hitter_partition_cap_bounds_shuffle).",
)
def q_heavy_hitter_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.sketches import partial_heavy_hitters

    li = _t(spark, sf_dir, "lineitem")
    return partial_heavy_hitters(
        li, "l_linestatus", "l_suppkey", m=8, partition_cap=1_000_000
    )


_MEDIA_CONTAINER_ORACLE = """
    SELECT doc_id AS media_id,
           CASE WHEN doc_id % 2 = 0 THEN 'image/png' ELSE 'audio/flac' END AS media_type,
           CAST(CASE WHEN doc_id % 2 = 0
                THEN 107 + doc_id % 100
                ELSE 72 + doc_id % 70
           END AS BIGINT) AS n_bytes,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 32 + doc_id % 256 END AS INT) AS width,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 32 + (doc_id // 5) % 128 END AS INT) AS height,
           CAST(CASE WHEN doc_id % 2 = 1
                THEN (10000 + (doc_id % 89) * 100) * 1000
                     // (8000 + (doc_id % 5) * 4000)
           END AS BIGINT) AS duration_ms,
           CAST(CASE WHEN doc_id % 2 = 1
                THEN 8000 + (doc_id % 5) * 4000
           END AS INT) AS sample_rate
    FROM documents
"""


@register(
    "media_container_decode",
    _MEDIA_CONTAINER_ORACLE,
    doc="REAL compressed-container header decode, end-to-end "
    "hash-checked: synthesize_media(variant='containers') builds PNG "
    "files with true IHDR chunks + CRC32s (even ids) and FLAC streams "
    "with a true STREAMINFO metadata block (odd ids), parameters "
    "integer functions of the id; extract_media_features(decode='real') "
    "parses the actual bytes back — big-endian IHDR walk for "
    "dimensions, STREAMINFO bit-unpack (20-bit rate / 36-bit total "
    "samples) for rate and duration — and the oracle computes the "
    "expected features from the ids alone. Only the pixel/frame DATA "
    "of these formats needs a codec library; the headers don't, so "
    "this is the honest no-dependency real tier for compressed "
    "containers. operators/multimodal.py decode_png / decode_flac.",
)
def q_media_container_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.multimodal import (
        extract_media_features,
        synthesize_media,
    )

    docs = _tp(spark, sf_dir, "documents").select(F.col("doc_id"))
    media = synthesize_media(docs, id_col="doc_id", variant="containers")
    return extract_media_features(media, decode="real").select(
        "media_id", "media_type", "n_bytes", "width", "height",
        "duration_ms", "sample_rate",
    )


_VIDEO_FRAME_ORACLE = """
    WITH geo AS (
      SELECT doc_id AS media_id,
             16 + (doc_id % 8) * 2 AS w,
             16 + ((doc_id // 7) % 8) * 2 AS h,
             5 + doc_id % 10 AS fps,
             3 + doc_id % 12 AS nf
      FROM documents
    ), g2 AS (
      SELECT media_id, w, h, fps, nf, nf * 1000 // fps AS dur FROM geo
    ), ts AS (
      SELECT media_id, w, h, fps, nf,
             unnest(generate_series(0, dur - 1, 500)) AS frame_ts_ms
      FROM g2
    ), fr AS (
      SELECT media_id, w, h,
             CAST(frame_ts_ms AS BIGINT) AS frame_ts_ms,
             least(frame_ts_ms * fps // 1000, nf - 1) AS frame_idx
      FROM ts
    ), px AS (
      SELECT media_id, frame_ts_ms, frame_idx,
             unnest(generate_series(0, w * h - 1)) AS i
      FROM fr
    )
    SELECT media_id, frame_ts_ms, CAST(frame_idx AS BIGINT) AS frame_idx,
           CAST(SUM((i * 13 + media_id + frame_idx * 31) % 256) AS BIGINT) AS luma_sum
    FROM px
    GROUP BY media_id, frame_ts_ms, frame_idx
"""


@register(
    "video_frame_sample",
    _VIDEO_FRAME_ORACLE,
    doc="REAL video frame sampling, end-to-end hash-checked: "
    "synthesize_media(variant='video') builds true YUV4MPEG2 streams "
    "(the standard uncompressed video container) with id-derived "
    "geometry/rate/frame-count and per-frame luma bytes; "
    "sample_video_frames parses the header, seeks to the frame "
    "covering each 500 ms grid point, and DECODES that frame's luma "
    "plane — the emitted luma_sum comes from the actual bytes at the "
    "actual frame offset, and the oracle recomputes it from the id "
    "recipe alone, so a seek, stride, or plane-order bug breaks the "
    "hash. The honesty upgrade frame_sample_stub documents: sampled "
    "frames are decoded, not stubbed. operators/multimodal.py "
    "decode_y4m / sample_video_frames.",
)
def q_video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.multimodal import (
        sample_video_frames,
        synthesize_media,
    )

    docs = _tp(spark, sf_dir, "documents").select(F.col("doc_id"))
    media = synthesize_media(docs, id_col="doc_id", variant="video")
    return sample_video_frames(media, every_ms=500).select(
        "media_id", "frame_ts_ms", "frame_idx", "luma_sum"
    )


@register(
    "cluster_merge_text",
    f"""
    WITH j AS (
      SELECT c.doc_id, c.cluster_id, d.n_chars, d.text
      FROM ( {_CLUSTERS_ORACLE} ) c
      JOIN documents d ON c.doc_id = d.doc_id
    ), r AS (
      SELECT *, row_number() OVER (PARTITION BY cluster_id
                                   ORDER BY n_chars DESC, doc_id) AS rk
      FROM j
    ), s AS (
      SELECT cluster_id, CAST(doc_id AS BIGINT) AS canonical_id,
             text AS canonical_text
      FROM r WHERE rk = 1
    ), m AS (
      SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members,
             CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS sum_n_chars
      FROM j GROUP BY cluster_id
    )
    SELECT s.cluster_id, s.canonical_id, s.canonical_text,
           m.n_members, m.sum_n_chars
    FROM s JOIN m USING (cluster_id)
    """,
    doc="Per-cluster survivor TEXT merge — the dedup ladder's "
    "write-back record in one pass: each 3-gram-Jaccard cluster "
    "collapses to a canonical row carrying the policy-chosen "
    "survivor's text (longest member, id tiebreak) AND the group's "
    "merged metadata (member count, byte mass). Fused into a single "
    "groupBy via max_by over a (score, -id) ordering struct — one "
    "shuffle where composing select_survivors + cluster_rollup + "
    "re-join costs three. The oracle computes the same record with a "
    "window + groupBy + join, so the fused plan is hash-checked "
    "against the composition it replaces. operators/text_dedup.py "
    "cluster_merge_text.",
)
def q_cluster_merge_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.text_dedup import (
        cluster_merge_text,
        duplicate_clusters,
        jaccard_pairs,
    )
    from pasta_pipeline_spark.operators.util import release_cached_deps

    docs = _t(spark, sf_dir, "documents")
    pairs = jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5)
    clusters = duplicate_clusters(docs.select("doc_id"), pairs, id_col="doc_id")
    release_cached_deps(pairs)
    return cluster_merge_text(
        clusters, docs.select("doc_id", "n_chars", "text"),
        score_col="n_chars", sum_cols=["n_chars"],
    )


def _psl_oracle() -> str:
    from pasta_pipeline_spark.functions.urls import PSL_MULTI_SUFFIXES

    two = ", ".join(f"'{s}'" for s in PSL_MULTI_SUFFIXES if s.count(".") == 1)
    three = ", ".join(f"'{s}'" for s in PSL_MULTI_SUFFIXES if s.count(".") == 2)
    return f"""
    WITH u AS (
      SELECT doc_id,
             CASE doc_id % 7
               WHEN 0 THEN 'news.bbc.co.uk'
               WHEN 1 THEN 'shop.books.com.au'
               WHEN 2 THEN 'cdn.assets.example.com'
               WHEN 3 THEN 'example.org'
               WHEN 4 THEN 'www.site' || CAST(doc_id // 6 AS VARCHAR) || '.co.jp'
               WHEN 5 THEN 'www.hillside.act.edu.au'
               ELSE 'deep.sub.docs.wiki.org' END AS host
      FROM documents
    ), l AS (
      SELECT doc_id, host, string_split(host, '.') AS ls, len(string_split(host, '.')) AS n
      FROM u
    )
    SELECT CASE
             WHEN n >= 4 AND array_to_string(ls[n-2:n], '.') IN ({three})
               THEN array_to_string(ls[n-3:n], '.')
             WHEN n >= 3 AND array_to_string(ls[n-1:n], '.') IN ({two})
                  AND NOT (n = 3 AND host IN ({three}))
               THEN array_to_string(ls[n-2:n], '.')
             ELSE regexp_extract(host, '([^.]+\\.[^.]+)$', 1)
           END AS domain,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM l
    GROUP BY 1
    """


@register(
    "domain_stats_psl",
    _psl_oracle(),
    doc="Public-suffix-aware registrable-domain stats — the precision "
    "upgrade over the last-two-labels rule (functions/urls.py "
    "registrable_domain_psl): news.bbc.co.uk folds into bbc.co.uk, "
    "not co.uk, so per-site crawl budgets and blocklists aggregate at "
    "the true registrant boundary. The multi-label suffix subset "
    "(publicsuffix.org, public data) is inlined into scan predicates "
    "— zero joins; the full-list path is a broadcast join "
    "(registrable_domain_join, pytest). The oracle inlines the SAME "
    "suffix list from the same constant, so the two sides cannot "
    "drift. Hosts synthesized deterministically from doc ids.",
)
def q_domain_stats_psl(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.functions.urls import registrable_domain_psl

    docs = _t(spark, sf_dir, "documents")
    host = (
        F.when(F.col("doc_id") % 7 == 0, F.lit("news.bbc.co.uk"))
        .when(F.col("doc_id") % 7 == 1, F.lit("shop.books.com.au"))
        .when(F.col("doc_id") % 7 == 2, F.lit("cdn.assets.example.com"))
        .when(F.col("doc_id") % 7 == 3, F.lit("example.org"))
        .when(
            F.col("doc_id") % 7 == 4,
            F.concat(F.lit("www.site"), F.expr("doc_id div 6"), F.lit(".co.jp")),
        )
        .when(F.col("doc_id") % 7 == 5, F.lit("www.hillside.act.edu.au"))
        .otherwise(F.lit("deep.sub.docs.wiki.org"))
    )
    return (
        docs.select(registrable_domain_psl(host).alias("domain"))
        .groupBy("domain")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )


@register(
    "pair_ttl_report",
    """
    WITH h AS (
      SELECT doc_id AS a, doc_id + 1000000 AS b, CAST(doc_id % 7 AS BIGINT) AS bt
      FROM documents
      UNION ALL
      SELECT doc_id, doc_id + 1000000,
             CAST(doc_id % 7 + 1 + doc_id % 4 AS BIGINT)
      FROM documents
    ), det AS (
      SELECT DISTINCT a, b, bt FROM h
    ), fb AS (
      SELECT a, b, bt, MIN(bt) OVER (PARTITION BY a, b) AS first_b FROM det
    ), bs AS (
      SELECT bt,
             SUM(CASE WHEN first_b = bt THEN 1 ELSE 0 END) AS n_new,
             SUM(CASE WHEN first_b < bt THEN 1 ELSE 0 END) AS n_redetected
      FROM fb GROUP BY 1
    ), marked AS (
      SELECT a, b, bt,
             CASE WHEN bt > COALESCE(MAX(bt + 2) OVER (
                    PARTITION BY a, b ORDER BY bt
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -9999) + 1
                  THEN 1 ELSE 0 END AS brk
      FROM det
    ), isl AS (
      SELECT a, b, bt,
             SUM(brk) OVER (PARTITION BY a, b ORDER BY bt
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      FROM marked
    ), iv AS (
      SELECT a, b, island, MIN(bt) AS s, MAX(bt) + 2 AS e
      FROM isl GROUP BY 1, 2, 3
    ), deltas AS (
      SELECT s AS bt, 1 AS d FROM iv
      UNION ALL
      SELECT e + 1, -1 FROM iv
    ), dsum AS (
      SELECT bt, SUM(d) AS d FROM deltas GROUP BY 1
    ), spine AS (
      SELECT unnest(generate_series((SELECT MIN(bt) FROM det),
                                    (SELECT MAX(bt) FROM det))) AS bt
    ), act AS (
      SELECT spine.bt,
             SUM(COALESCE(dsum.d, 0)) OVER (ORDER BY spine.bt
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_active
      FROM spine LEFT JOIN dsum ON spine.bt = dsum.bt
    )
    SELECT CAST(act.bt AS BIGINT) AS batch_id,
           CAST(COALESCE(bs.n_new, 0) AS BIGINT) AS n_new,
           CAST(COALESCE(bs.n_redetected, 0) AS BIGINT) AS n_redetected,
           CAST(act.n_active AS BIGINT) AS n_active
    FROM act LEFT JOIN bs ON act.bt = bs.bt
    """,
    doc="Dedup-pair lifecycle report under a TTL (operators/pair_ttl.py "
    "pair_history_report — the batch consumer of the streaming LSH "
    "index's pair history): per batch, NEW pairs, re-confirmations, "
    "and the TTL-active working set. Active counts are delta-encoded "
    "— per-pair alive-intervals merge via gaps-and-islands (the "
    "duplicated_spans idiom), each island emits +1/-1 boundary deltas, "
    "and a running sum over the batch SPINE (time-range-bounded "
    "metadata, not corpus mass) produces the counts — no detection×TTL "
    "explosion, no range join. History synthesized deterministically: "
    "two detections per pair at id-derived batches, ttl=3, so islands "
    "both merge and split.",
)
def q_pair_ttl_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.pair_ttl import pair_history_report

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    h1 = docs.select(
        F.col("doc_id").alias("doc_a"),
        (F.col("doc_id") + 1000000).alias("doc_b"),
        (F.col("doc_id") % 7).cast("long").alias("batch_id"),
    )
    h2 = docs.select(
        F.col("doc_id").alias("doc_a"),
        (F.col("doc_id") + 1000000).alias("doc_b"),
        (F.col("doc_id") % 7 + 1 + F.col("doc_id") % 4).cast("long").alias("batch_id"),
    )
    # cached det table stays attached; the harness releases after
    # materializing (the standard attach_cached_deps contract)
    return pair_history_report(h1.unionByName(h2), ttl=3)


def _divergence_oracle() -> str:
    from pasta_pipeline_spark.operators.divergence import js_excl_sql, js_term_sql

    return f"""
    WITH toks AS (
      SELECT source,
             unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                y -> y <> '')) AS tok
      FROM documents WHERE text IS NOT NULL
    ), cnts AS (
      SELECT source, tok, CAST(count(*) AS BIGINT) AS c
      FROM toks GROUP BY 1, 2
    ), tots AS (
      SELECT source, CAST(SUM(c) AS BIGINT) AS t FROM cnts GROUP BY 1
    ), d AS (
      SELECT c.source, c.tok, c.c, t.t FROM cnts c JOIN tots t USING (source)
    ), inter AS (
      SELECT a.source AS source_a, b.source AS source_b, a.t AS ta, b.t AS tb,
             CAST(SUM(CAST({js_term_sql().replace('ca', 'a.c').replace('cb', 'b.c').replace('/ta', '/a.t').replace('/tb', '/b.t')} AS BIGINT)) AS BIGINT) AS inner_fp,
             CAST(SUM(a.c) AS BIGINT) AS inter_a,
             CAST(SUM(b.c) AS BIGINT) AS inter_b,
             CAST(count(*) AS BIGINT) AS n_common_tokens
      FROM d a JOIN d b ON a.tok = b.tok AND a.source < b.source
      GROUP BY 1, 2, 3, 4
    )
    SELECT source_a, source_b, n_common_tokens,
           CAST(inner_fp + CAST({js_excl_sql()} AS BIGINT) AS BIGINT) AS js_fp
    FROM inter
    """


@register(
    "source_divergence",
    _divergence_oracle(),
    doc="Pairwise Jensen-Shannon divergence between source token "
    "distributions (operators/divergence.py) — the statistical corpus "
    "comparison a training-mix designer uses to spot redundant or "
    "drifting sources. Intersection terms come from one token "
    "equi-join (inverted-index skeleton); exclusive-vocabulary mass "
    "folds in closed form (0.5·ln2·mass) so no outer join and no "
    "union-vocab explosion. Per-token JS terms floor to fixed point "
    "BEFORE the sum (int64, order-independent) and the formula is one "
    "shared expression string — hash-exact across engines despite ln "
    "and double ratios.",
)
def q_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.divergence import source_token_divergence

    docs = _t(spark, sf_dir, "documents")
    return source_token_divergence(docs)


@register(
    "shard_rebalance",
    """
    WITH shards16 AS (
      SELECT unnest(generate_series(0, 15)) AS s
    ), shards17 AS (
      SELECT unnest(generate_series(0, 16)) AS s
    ), w16 AS (
      SELECT d.doc_id, s.s,
             ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':' || CAST(s.s AS VARCHAR)), 1, 15))::BIGINT AS wt
      FROM documents d CROSS JOIN shards16 s
    ), a16 AS (
      SELECT doc_id, s AS shard16 FROM (
        SELECT doc_id, s, row_number() OVER (PARTITION BY doc_id ORDER BY wt DESC, s) AS rk
        FROM w16
      ) WHERE rk = 1
    ), w17 AS (
      SELECT d.doc_id, s.s,
             ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':' || CAST(s.s AS VARCHAR)), 1, 15))::BIGINT AS wt
      FROM documents d CROSS JOIN shards17 s
    ), a17 AS (
      SELECT doc_id, s AS shard17 FROM (
        SELECT doc_id, s, row_number() OVER (PARTITION BY doc_id ORDER BY wt DESC, s) AS rk
        FROM w17
      ) WHERE rk = 1
    )
    SELECT CAST(a16.shard16 AS INT) AS shard_before,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(SUM(CASE WHEN a16.shard16 <> a17.shard17 THEN 1 ELSE 0 END) AS BIGINT) AS n_moved,
           CAST(SUM(CASE WHEN a16.shard16 <> a17.shard17 THEN 1 ELSE 0 END) * 10000
                // count(*) AS BIGINT) AS moved_bp
    FROM a16 JOIN a17 USING (doc_id)
    GROUP BY 1
    """,
    doc="Rendezvous-sharding resize impact (operators/sharding.py): "
    "per old shard, keys moved when growing 16 -> 17 shards under "
    "highest-random-weight assignment — ~1/17 of each shard moves, "
    "the deterministic minimum, vs ~16/17 under hash-mod-N (a "
    "full-corpus rewrite). Spark side is one array expression per row "
    "(transform + array_max, no explode/join/shuffle); the oracle "
    "replays the same md5-based 60-bit weights via an explicit "
    "shard cross join + window argmax — same assignment, different "
    "plan, hash-identical.",
)
def q_shard_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.sharding import shard_rebalance_report

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    return shard_rebalance_report(docs, "doc_id", n_before=16, n_after=17)


@register(
    "equidepth_histogram",
    """
    WITH ranked AS (
      SELECT l_extendedprice,
             ntile(8) OVER (ORDER BY l_extendedprice, l_orderkey, l_linenumber)
               AS bucket
      FROM lineitem
    )
    SELECT CAST(bucket AS INT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(FLOOR(MIN(l_extendedprice) * 100) AS BIGINT) AS lo_cents,
           CAST(FLOOR(MAX(l_extendedprice) * 100) AS BIGINT) AS hi_cents
    FROM ranked GROUP BY bucket
    """,
    doc="Equi-DEPTH histogram (each bucket holds ~the same row count; "
    "bucket BOUNDARIES adapt to the data) — the complement of the "
    "fixed-width price_histogram and the mergeable-quantile state: "
    "this is the shape ANALYZE-style statistics and range-partition "
    "planners consume. The oracle states the contract as ntile(8) "
    "over a TOTAL order (value + key tiebreaks, deterministic "
    "cross-engine); the Spark side does NOT run ntile's "
    "empty-OVER() window (which funnels the whole fact table through "
    "ONE task — the r6 verdict's lone scale-killer): global ranks "
    "come from ids.assign_sequential_ids (range partition + "
    "driver prefix-sum over P counts) and the bucket is ntile's "
    "closed-form quotient over (rank, total) — first n%k buckets "
    "get ceil(n/k) rows, the rest floor(n/k). Fixed-point cent "
    "boundaries.",
)
def q_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.ids import assign_sequential_ids
    from pasta_pipeline_spark.operators.util import attach_cached_deps

    n_buckets = 8
    li = _t(spark, sf_dir, "lineitem").select(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    ranked = assign_sequential_ids(
        li, ["l_extendedprice", "l_orderkey", "l_linenumber"], out_col="__seq"
    )
    total = ranked.agg(F.count(F.lit(1)).alias("__n"))
    # ntile(k) closed form: q = n div k rows in the tail buckets, the
    # first n mod k buckets take one extra row each (cut = rem*(q+1)
    # ranks); CaseWhen branches are lazy so the q=0 divisor is guarded.
    bucket = F.expr(
        f"""CAST(CASE
              WHEN __seq <= (__n % {n_buckets}) * (__n div {n_buckets} + 1)
              THEN (__seq - 1) div (__n div {n_buckets} + 1)
              ELSE (__n % {n_buckets})
                   + (__seq - (__n % {n_buckets}) * (__n div {n_buckets} + 1) - 1)
                     div greatest(__n div {n_buckets}, 1)
            END + 1 AS INT)"""
    )
    out = (
        ranked.crossJoin(F.broadcast(total))
        .withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.floor(F.min("l_extendedprice") * 100).cast("long").alias("lo_cents"),
            F.floor(F.max("l_extendedprice") * 100).cast("long").alias("hi_cents"),
        )
        .select("bucket", "n_rows", "lo_cents", "hi_cents")
    )
    return attach_cached_deps(out, getattr(ranked, "_pasta_cached_deps", []))


def _pq_oracle(n_subspaces: int = 4, n_codes: int = 16, k: int = 10) -> str:
    """Exact DuckDB twin of q_pq_topk: seed codebooks, L2² via the
    dot-product decomposition (list_dot_product folds sequentially
    like F.aggregate — bit-identical doubles), per-entry fixed-point
    floor, integer ADC sum."""
    sub = 64 // n_subspaces

    def l2fp(a, b):
        return (
            f"CAST(FLOOR((list_dot_product({a}, {a}) - 2 * list_dot_product({a}, {b})"
            f" + list_dot_product({b}, {b})) * 10000000) AS BIGINT)"
        )

    return f"""
    WITH ms AS (
      SELECT unnest(generate_series(0, {n_subspaces - 1})) AS m
    ), cb_src AS (
      SELECT vec_id, embedding::DOUBLE[] AS v
      FROM embeddings ORDER BY vec_id LIMIT {n_codes}
    ), cb0 AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS code, v
      FROM cb_src
    ), cb AS (
      SELECT code, m, v[(m*{sub}+1):(m*{sub}+{sub})] AS cv
      FROM cb0 CROSS JOIN ms
    ), corpus AS (
      SELECT vec_id, m, (embedding::DOUBLE[])[(m*{sub}+1):(m*{sub}+{sub})] AS sv
      FROM embeddings CROSS JOIN ms
    ), l2 AS (
      SELECT c.vec_id, c.m, b.code, {l2fp('c.sv', 'b.cv')} AS fp
      FROM corpus c JOIN cb b USING (m)
    ), enc AS (
      SELECT vec_id, m, code FROM (
        SELECT vec_id, m, code,
               ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY fp, code) AS rk
        FROM l2
      ) WHERE rk = 1
    ), q AS (
      SELECT embedding::DOUBLE[] AS qv FROM embeddings ORDER BY vec_id LIMIT 1
    ), qm AS (
      SELECT m, qv[(m*{sub}+1):(m*{sub}+{sub})] AS sv FROM q CROSS JOIN ms
    ), dt AS (
      SELECT b.m, b.code, {l2fp('qm.sv', 'b.cv')} AS qfp
      FROM qm JOIN cb b USING (m)
    )
    SELECT e.vec_id, CAST(SUM(d.qfp) AS BIGINT) AS adc_fp
    FROM enc e JOIN dt d ON e.m = d.m AND e.code = d.code
    GROUP BY e.vec_id
    ORDER BY adc_fp ASC, e.vec_id ASC LIMIT {k}
    """


@register(
    "pq_topk",
    _pq_oracle(),
    doc="Product-quantization ANN top-k (similarity.pq_topk, Jégou et "
    "al. TPAMI'11) — the memory tier below int8: 4 code bytes per "
    "64-dim vector (64x less scanned than f32) and ADC scoring (one "
    "table lookup per subspace, no per-vector dot product). Seed "
    "codebooks (first n_codes vectors' subvectors; Lloyd's slots in "
    "like ivf_topk); subspace L2² via the a·a - 2a·b + b·b "
    "decomposition (sequential folds, bit-identical to "
    "list_dot_product), floored to fixed point PER TABLE ENTRY so "
    "code assignment, the distance table, and the int64 ADC ranking "
    "all replay hash-exactly in SQL.",
)
def q_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.similarity import pq_topk

    emb = _t(spark, sf_dir, "embeddings")
    query = emb.orderBy("vec_id").limit(1).select(F.col("embedding").alias("qv"))
    return pq_topk(emb, query, k=10)



def _quality_lang_oracle() -> str:
    from pasta_pipeline_spark.operators.text_analysis import STOPWORDS

    hit_cols = []
    for lg, words in STOPWORDS.items():
        lst = ", ".join(f"'{w}'" for w in words)
        hit_cols.append(
            f"len(list_filter(toks, x -> x IN ({lst}))) AS h_{lg}"
        )
    case = " ".join(f"WHEN lang = '{lg}' THEN h_{lg}" for lg in STOPWORDS)
    best = "greatest(" + ", ".join(f"h_{lg}" for lg in STOPWORDS) + ")"
    return f"""
    WITH base AS (
      SELECT doc_id, lang, text,
             list_filter(regexp_split_to_array(lower(text), '\\s+'), y -> y <> '') AS toks
      FROM documents
    ), counted AS (
      SELECT doc_id, lang, text,
             len(toks) AS n_tok,
             length(regexp_replace(text, '\\s+', '', 'g')) AS n_nonspace,
             length(regexp_replace(text, '[^A-Za-zА-Яа-я一-鿿]+', '', 'g')) AS n_alpha,
             {", ".join(hit_cols)}
      FROM base
    ), hits AS (
      SELECT *, CASE {case} ELSE {best} END AS h FROM counted
    )
    SELECT doc_id, lang,
           CASE WHEN text IS NULL OR trim(text) = '' THEN 0.0 ELSE
             (least(CAST(n_tok AS DOUBLE) / 64.0, 1.0)
              + (CASE WHEN n_nonspace > 0 THEN CAST(n_alpha AS DOUBLE) / CAST(n_nonspace AS DOUBLE) ELSE 0.0 END)
              + (CASE WHEN n_tok > 0 THEN least(4.0 * CAST(h AS DOUBLE) / CAST(n_tok AS DOUBLE), 1.0) ELSE 0.0 END)
              + (CASE WHEN n_tok > 0
                       AND CAST(n_nonspace AS DOUBLE) / CAST(n_tok AS DOUBLE) >= 3.0
                       AND CAST(n_nonspace AS DOUBLE) / CAST(n_tok AS DOUBLE) <= 12.0
                      THEN 1.0 ELSE 0.0 END)
             ) / 4.0
           END AS score
    FROM hits
    """


@register(
    "quality_score_lang",
    _quality_lang_oracle(),
    doc="Language-aware quality score (text_analysis.quality_score_lang): "
    "the stopword component counts the DOCUMENT'S language profile "
    "instead of assuming English — the multilingual-curation fix for "
    "the classic bug where an English-stopword gate rejects every "
    "non-English document. Unprofiled languages (zh in the driver "
    "data) fall back to the best hit count across profiles. Per-lang "
    "CASE generated from the same STOPWORDS constant in both engines.",
)
def q_quality_score_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.text_analysis import quality_score_lang

    docs = _tp(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", "lang", quality_score_lang("text", "lang").alias("score")
    )


_SPLIT_SQL = (
    "(CASE WHEN ('0x' || substr(md5(CAST({c} AS VARCHAR)), 1, 15))::BIGINT % 10000 < 1000 "
    "THEN 'holdout' ELSE 'train' END)"
)


@register(
    "split_leakage",
    f"""
    WITH pairs AS ({_JACCARD_ORACLE})
    SELECT doc_a, doc_b,
           {_SPLIT_SQL.format(c='doc_a')} AS split_a,
           {_SPLIT_SQL.format(c='doc_b')} AS split_b
    FROM pairs
    WHERE {_SPLIT_SQL.format(c='doc_a')} <> {_SPLIT_SQL.format(c='doc_b')}
    """,
    doc="Train/holdout LEAKAGE measurement (operators/splits.py): "
    "near-dup pairs (3-gram Jaccard >= 0.5) whose sides land in "
    "different splits of a deterministic 10% id-hash holdout — each "
    "row is a document whose near-copy leaks across the evaluation "
    "boundary, the failure that silently inflates benchmark numbers. "
    "Split membership is the package's md5 bucket (pure function of "
    "the id, replayed exactly in SQL).",
)
def q_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.splits import split_leakage
    from pasta_pipeline_spark.operators.text_dedup import jaccard_pairs

    docs = _t(spark, sf_dir, "documents")
    pairs = jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5)
    # shingle cache attached by jaccard_pairs; harness releases it
    return split_leakage(pairs, holdout_frac=0.1)


@register(
    "cluster_split",
    f"""
    WITH clusters AS ({_CLUSTERS_ORACLE})
    SELECT doc_id, cluster_id,
           {_SPLIT_SQL.format(c='cluster_id')} AS split
    FROM clusters
    """,
    doc="Leakage-FREE split assignment (operators/splits.py "
    "cluster_split): the holdout hash is taken on the duplicate-"
    "CLUSTER id, so every member of a cluster — and therefore both "
    "sides of every near-dup pair — inherits the same split by "
    "construction (the fix for split_leakage's finding; "
    "zero-crossing property pytest-pinned). Singleton clusters "
    "degrade to the per-document split.",
)
def q_cluster_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.splits import cluster_split
    from pasta_pipeline_spark.operators.text_dedup import (
        duplicate_clusters,
        jaccard_pairs,
    )
    from pasta_pipeline_spark.operators.util import release_cached_deps

    docs = _t(spark, sf_dir, "documents")
    pairs = jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5)
    clusters = duplicate_clusters(docs.select("doc_id"), pairs, id_col="doc_id")
    release_cached_deps(pairs)
    return cluster_split(clusters, holdout_frac=0.1)


_MEDIA_CODEC_ORACLE = """
    SELECT doc_id AS media_id,
           CASE WHEN doc_id % 2 = 0 THEN 'image/jpeg' ELSE 'video/mp4' END AS media_type,
           CAST(CASE WHEN doc_id % 2 = 0
                THEN 47 + doc_id % 50
                ELSE 150 + doc_id % 80
           END AS BIGINT) AS n_bytes,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 64 + doc_id % 512 END AS INT) AS width,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 48 + (doc_id // 3) % 256 END AS INT) AS height,
           CAST(CASE WHEN doc_id % 2 = 1
                THEN (3000 + (doc_id % 77) * 100) * 1000
                     // (1000 + (doc_id % 4) * 500)
           END AS BIGINT) AS duration_ms
    FROM documents
"""


@register(
    "media_codec_headers",
    _MEDIA_CODEC_ORACLE,
    doc="REAL codec-container header decode, end-to-end hash-checked: "
    "synthesize_media(variant='codecs') builds JPEGs with a true SOF0 "
    "frame header behind a COM segment (even ids) and MP4/ISO-BMFF "
    "files with a true moov/mvhd box (odd ids); "
    "extract_media_features(decode='real') walks the actual marker/"
    "box structure back — SOF big-endian dims, mvhd "
    "timescale/duration — and the oracle computes expected features "
    "from the ids alone. With PNG/FLAC/Y4M this completes the "
    "header-level real tier for every major container; only "
    "entropy-coded PIXEL/SAMPLE decode still needs the codec "
    "library. operators/multimodal.py decode_jpeg / decode_mp4.",
)
def q_media_codec_headers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.multimodal import (
        extract_media_features,
        synthesize_media,
    )

    docs = _tp(spark, sf_dir, "documents").select(F.col("doc_id"))
    media = synthesize_media(docs, id_col="doc_id", variant="codecs")
    return extract_media_features(media, decode="real").select(
        "media_id", "media_type", "n_bytes", "width", "height", "duration_ms"
    )


#: Crawl-policy fixture shared by the robots_admission query and its
#: oracle: (host, agent, rule, pattern).
_ROBOTS_RULES = (
    ("host0.com", "*", "disallow", "/private/"),
    ("host0.com", "*", "allow", "/private/pub*"),
    ("host0.com", "*", "disallow", "/*.json$"),
    ("host1.com", "*", "disallow", "/tmp/"),
    ("host1.com", "goodbot", "disallow", "/"),
)


def _robots_oracle() -> str:
    from pasta_pipeline_spark.operators.robots import robots_pattern_regex

    rule_rows = ", ".join(
        f"('{h}', '{a}', '{r}', '{robots_pattern_regex(p)}', {len(p)})"
        for h, a, r, p in _ROBOTS_RULES
    )
    return f"""
    WITH rules(host, agent, rule, rx, spec_len) AS (
      VALUES {rule_rows}
    ), urls AS (
      SELECT 'host' || CAST(doc_id % 3 AS VARCHAR) || '.com' AS host,
             CASE doc_id % 5
               WHEN 0 THEN '/private/doc' || CAST(doc_id AS VARCHAR)
               WHEN 1 THEN '/private/pub/doc' || CAST(doc_id AS VARCHAR)
               WHEN 2 THEN '/tmp/doc' || CAST(doc_id AS VARCHAR)
               WHEN 3 THEN '/api/doc' || CAST(doc_id AS VARCHAR) || '.json'
               ELSE '/page/doc' || CAST(doc_id AS VARCHAR) END AS path
      FROM documents
    ), applicable AS (
      -- agent='*' resolution: the exact group IS the star group, so
      -- the Spark side's has_exact branching collapses to this filter
      SELECT host, rule, rx, spec_len FROM rules WHERE agent = '*'
    ), j AS (
      SELECT u.host, u.path, a.rule, a.rx, a.spec_len,
             (a.rx IS NOT NULL AND regexp_matches(u.path, a.rx)) AS hit
      FROM urls u LEFT JOIN applicable a ON u.host = a.host
    ), ranked AS (
      SELECT host, path, rule, hit,
             ROW_NUMBER() OVER (
               PARTITION BY host, path
               ORDER BY hit DESC, spec_len DESC,
                        (rule = 'disallow') ASC
             ) AS rk
      FROM j
    )
    SELECT host, path,
           (NOT (hit AND rule = 'disallow')) AS allowed
    FROM ranked WHERE rk = 1
    """


@register(
    "robots_admission",
    _robots_oracle(),
    doc="Crawl-frontier admission under RFC 9309 robots rules "
    "(operators/robots.py robots_verdict): the whole URL frontier is "
    "admitted/denied in ONE broadcast join against the parsed rules "
    "table — longest-pattern match wins, allow beats disallow on "
    "specificity ties, wildcard * and $ anchors honored, no-rule "
    "hosts allow. The oracle inlines regexes from an independent "
    "Python twin of the SQL pattern conversion, so a drift in either "
    "implementation breaks the hash. The parse side (UA-group "
    "reconstruction via windows over line numbers) is pytest-covered "
    "with a real robots.txt fixture.",
)
def q_robots_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.robots import robots_verdict

    rules = spark.createDataFrame(
        [(h, a, r, p, len(p)) for h, a, r, p in _ROBOTS_RULES],
        "host string, agent string, rule string, pattern string, spec_len long",
    )
    docs = _t(spark, sf_dir, "documents")
    urls = docs.select(
        F.concat(F.lit("host"), (F.col("doc_id") % 3).cast("string"), F.lit(".com")).alias("host"),
        F.when(F.col("doc_id") % 5 == 0,
               F.concat(F.lit("/private/doc"), F.col("doc_id").cast("string")))
        .when(F.col("doc_id") % 5 == 1,
              F.concat(F.lit("/private/pub/doc"), F.col("doc_id").cast("string")))
        .when(F.col("doc_id") % 5 == 2,
              F.concat(F.lit("/tmp/doc"), F.col("doc_id").cast("string")))
        .when(F.col("doc_id") % 5 == 3,
              F.concat(F.lit("/api/doc"), F.col("doc_id").cast("string"), F.lit(".json")))
        .otherwise(F.concat(F.lit("/page/doc"), F.col("doc_id").cast("string"))).alias("path"),
    )
    return robots_verdict(urls, rules, agent="*")


@register(
    "crawl_budget",
    """
    WITH w AS (
      SELECT source AS key, CAST(count(*) AS BIGINT) AS weight
      FROM documents GROUP BY source
    ), tot AS (
      SELECT CAST(SUM(weight) AS BIGINT) AS W FROM w
    ), base AS (
      SELECT key, weight,
             (100000 * weight) // W AS q,
             (100000 * weight) % W AS r
      FROM w CROSS JOIN tot
    ), ranked AS (
      SELECT key, weight, q, r,
             ROW_NUMBER() OVER (ORDER BY r DESC, key ASC) AS rk,
             (SELECT 100000 - SUM(q) FROM base) AS leftover
      FROM base
    )
    SELECT key, weight,
           CAST(q + (CASE WHEN rk <= leftover THEN 1 ELSE 0 END) AS BIGINT) AS budget
    FROM ranked
    """,
    doc="Crawl/token budget apportionment by largest remainder "
    "(Hamilton's method; operators/sharding.py allocate_budget): "
    "100k fetch slots split across sources proportionally to doc "
    "counts, floor quota + leftover units to the largest integer "
    "remainders (key tiebreak) — every unit assigned, zero "
    "fractional drift, all int64, SUM(budget) == total exactly. The "
    "window runs over the KEY table (sources/hosts — metadata "
    "scale), never corpus rows.",
)
def q_crawl_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.sharding import allocate_budget

    docs = _t(spark, sf_dir, "documents")
    w = docs.groupBy(F.col("source").alias("key")).agg(
        F.count(F.lit(1)).cast("long").alias("weight")
    )
    return allocate_budget(w, total=100_000)


@register(
    "sitemap_frontier",
    """
    WITH bodies AS (
      SELECT 'host' || CAST(doc_id % 4 AS VARCHAR) || '.com' AS host,
             '<?xml version="1.0"?><urlset>' ||
             '<url><loc>https://h.com/p/' || CAST(doc_id AS VARCHAR) ||
             '</loc><lastmod>2026-0' || CAST(1 + doc_id % 9 AS VARCHAR) ||
             '-01</lastmod></url>' ||
             '<url><loc> https://h.com/q/' || CAST(doc_id AS VARCHAR) ||
             ' </loc></url>' ||
             CASE WHEN doc_id % 3 = 0
               THEN '<url><lastmod>2026-01-01</lastmod></url>' ELSE '' END ||
             '</urlset>' AS sitemap_xml
      FROM documents
    ), entries AS (
      SELECT host, unnest(regexp_extract_all(sitemap_xml,
               '(?s)<(?:url|sitemap)>(.*?)</(?:url|sitemap)>', 1)) AS entry
      FROM bodies
    )
    SELECT host,
           regexp_extract(entry, '(?s)<loc>\\s*(.*?)\\s*</loc>', 1) AS loc,
           CASE WHEN regexp_extract(entry, '(?s)<lastmod>\\s*(.*?)\\s*</lastmod>', 1) <> ''
                THEN regexp_extract(entry, '(?s)<lastmod>\\s*(.*?)\\s*</lastmod>', 1)
           END AS lastmod
    FROM entries
    WHERE regexp_extract(entry, '(?s)<loc>\\s*(.*?)\\s*</loc>', 1) <> ''
    """,
    doc="Sitemap-protocol frontier ingestion (operators/sitemaps.py "
    "parse_sitemap): sitemap bodies (synthesized deterministically "
    "from doc ids — entries with lastmod, without, whitespace-padded "
    "locs, and loc-less entries that must be dropped) explode into "
    "(host, loc, lastmod) rows via portable dotall regexes — no XML "
    "library, no UDF. The discovery half of the crawl frontier; "
    "feeds canonicalize_url -> robots_verdict -> work-selection "
    "anti-join.",
)
def q_sitemap_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.sitemaps import parse_sitemap

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id").cast("string")
    xml = F.concat(
        F.lit('<?xml version="1.0"?><urlset>'),
        F.lit("<url><loc>https://h.com/p/"), d,
        F.lit("</loc><lastmod>2026-0"),
        (F.lit(1) + F.col("doc_id") % 9).cast("string"),
        F.lit("-01</lastmod></url>"),
        F.lit("<url><loc> https://h.com/q/"), d, F.lit(" </loc></url>"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.lit("<url><lastmod>2026-01-01</lastmod></url>"),
        ).otherwise(F.lit("")),
        F.lit("</urlset>"),
    )
    bodies = docs.select(
        F.concat(F.lit("host"), (F.col("doc_id") % 4).cast("string"), F.lit(".com")).alias("host"),
        xml.alias("sitemap_xml"),
    )
    return parse_sitemap(bodies)


@register(
    "data_expectations",
    """
    WITH agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n_rows,
             CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_nn,
             CAST(SUM(CASE WHEN l_quantity < 1 THEN 1 ELSE 0 END) AS BIGINT) AS v_min,
             CAST(SUM(CASE WHEN l_discount > 0.08 THEN 1 ELSE 0 END) AS BIGINT) AS v_max,
             CAST(SUM(CASE WHEN l_returnflag IS NOT NULL
                            AND l_returnflag NOT IN ('A','N','R') THEN 1 ELSE 0 END) AS BIGINT) AS v_set,
             CAST(SUM(CASE WHEN NOT COALESCE(l_shipdate >= l_orderdate_proxy, FALSE)
                           THEN 1 ELSE 0 END) AS BIGINT) AS v_pred,
             CAST(count(l_orderkey) - count(DISTINCT l_orderkey) AS BIGINT) AS v_uni
      FROM (SELECT l.*, TIMESTAMP '1992-01-01 00:00:00' AS l_orderdate_proxy
            FROM lineitem l)
    )
    SELECT r.rule, a.n_rows, r.n_violations, (r.n_violations = 0) AS passed
    FROM agg a CROSS JOIN LATERAL (VALUES
      ('in_set_l_returnflag', a.v_set),
      ('max_l_discount', a.v_max),
      ('min_l_quantity', a.v_min),
      ('not_null_l_orderkey', a.v_nn),
      ('ship_after_epoch', a.v_pred),
      ('unique_l_orderkey', a.v_uni)
    ) AS r(rule, n_violations)
    ORDER BY r.rule
    """,
    doc="Declarative data-quality expectations in ONE shared "
    "conditional-aggregate scan (+1 distinct pass for uniqueness) — "
    "the audit step of write-audit-publish "
    "(operators/expectations.py): not-null, range, set-membership, "
    "cross-column predicate, and uniqueness rules over lineitem with "
    "per-rule violation counts and verdicts. Rules are chosen so "
    "both passing and failing verdicts appear in the result "
    "(discount > 0.08 and duplicate comments DO occur).",
)
def q_data_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators import expectations as E

    li = _t(spark, sf_dir, "lineitem").withColumn(
        "l_orderdate_proxy", F.lit("1992-01-01 00:00:00").cast("timestamp")
    )
    rules = [
        E.not_null("l_orderkey"),
        E.min_value("l_quantity", 1),
        E.max_value("l_discount", 0.08),
        E.in_set("l_returnflag", ["A", "N", "R"]),
        E.predicate("l_shipdate >= l_orderdate_proxy", "ship_after_epoch"),
        E.unique("l_orderkey"),
    ]
    return E.check_expectations(li, rules)


def _main_text_oracle() -> str:
    from pasta_pipeline_spark.operators.main_text import (
        _BLOCK_TAG_RE,
        _ENTITIES,
        _SUBTREE_TAGS,
    )

    def clean(col: str) -> str:
        c = f"regexp_replace({col}, '<[^>]*>', ' ', 'g')"
        for ent, rep in _ENTITIES:
            rep_sql = rep.replace("'", "''")
            c = f"replace({c}, '{ent}', '{rep_sql}')"
        return f"trim(regexp_replace({c}, '\\s+', ' ', 'g'))"

    seg = "html"
    for t in _SUBTREE_TAGS:
        seg = f"regexp_replace({seg}, '(?is)<{t}[^>]*>.*?</{t}>', ' ', 'g')"
    seg = f"regexp_replace({seg}, '{_BLOCK_TAG_RE}', chr(10), 'g')"

    return f"""
    WITH pages AS (
      SELECT doc_id,
             '<html><head><script>ignore("x")</script></head><body>' ||
             '<nav><a href="/">Home</a> <a href="/a">About</a> <a href="/b">More</a></nav>' ||
             '<p>' || text || '</p>' ||
             '<div><a>T</a> <a>P</a></div></body></html>' AS html
      FROM documents WHERE text IS NOT NULL
    ), seg AS (
      SELECT doc_id, string_split({seg}, chr(10)) AS ls FROM pages
    ), lines AS (
      SELECT doc_id, i AS pos, ls[i] AS raw
      FROM (SELECT doc_id, ls, unnest(generate_series(1, len(ls))) AS i FROM seg)
    ), scored AS (
      SELECT doc_id, pos, {clean('raw')} AS text,
             COALESCE(list_sum(list_transform(
               regexp_extract_all(raw, '(?is)<a[^>]*>(.*?)</a>', 1),
               s -> length({clean('s')}))), 0) AS link_chars
      FROM lines
    ), kept AS (
      SELECT doc_id, pos, text,
             (length(text) >= 40 AND
              link_chars * 10000 <= 3000 * greatest(length(text), 1)) AS keep
      FROM scored WHERE text <> ''
    )
    SELECT doc_id,
           COALESCE(string_agg(text, chr(10) ORDER BY pos)
                      FILTER (WHERE keep), '') AS main_text,
           CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_blocks_kept,
           CAST(count(*) AS BIGINT) AS n_blocks_total
    FROM kept GROUP BY doc_id
    """


@register(
    "main_text_extraction",
    _main_text_oracle(),
    doc="Main-text extraction (boilerpipe/jusText heuristic as pure "
    "expressions; operators/main_text.py): script/style subtree "
    "removal, block segmentation on structural tags, per-block link "
    "density (anchor char mass, integer basis points) and length "
    "gates, kept blocks reassembled in document order. Pages "
    "synthesized around documents.text with nav/footer link "
    "boilerplate that must be dropped and an article block that must "
    "survive; the oracle replays the ENTIRE pipeline — subtree "
    "removal, segmentation, entity decode, density gate, ordered "
    "reassembly — from the same regex/entity constants, so any drift "
    "breaks the hash. Backreference-free regexes (RE2-portable); no "
    "UDF, no HTML parser dependency.",
)
def q_main_text_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.main_text import extract_main_text

    docs = _tp(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    pages = docs.select(
        "doc_id",
        F.concat(
            F.lit('<html><head><script>ignore("x")</script></head><body>'),
            F.lit('<nav><a href="/">Home</a> <a href="/a">About</a> <a href="/b">More</a></nav>'),
            F.lit("<p>"), F.col("text"), F.lit("</p>"),
            F.lit("<div><a>T</a> <a>P</a></div></body></html>"),
        ).alias("html"),
    )
    return extract_main_text(pages)


def _script_mix_oracle() -> str:
    from pasta_pipeline_spark.operators.text_analysis import SCRIPT_RANGES

    cnt_cols = ", ".join(
        f"length(regexp_replace(adorned, '[^{rng}]+', '', 'g')) AS c_{name}"
        for name, rng in SCRIPT_RANGES
    )
    total = " + ".join(f"c_{name}" for name, _ in SCRIPT_RANGES)
    shares = ", ".join(
        f"CAST(CASE WHEN total > 0 THEN c_{name} * 10000 // total ELSE 0 END AS BIGINT)"
        f" AS {name}_bp"
        for name, _ in SCRIPT_RANGES
    )
    return f"""
    WITH src AS (
      SELECT doc_id,
             text || CASE doc_id % 3
               WHEN 0 THEN ' Привет мир спам'
               WHEN 1 THEN ' 世界和平文本'
               ELSE '' END AS adorned
      FROM documents WHERE text IS NOT NULL
    ), counted AS (
      SELECT doc_id, {cnt_cols} FROM src
    ), tot AS (
      SELECT doc_id, *, {total} AS total FROM counted
    )
    SELECT doc_id, CAST(total AS BIGINT) AS n_script_chars, {shares}
    FROM tot
    """


@register(
    "script_mix",
    _script_mix_oracle(),
    doc="Unicode-script mix histogram (text_analysis.script_mix): "
    "per-document share of letter mass per script in integer basis "
    "points — catches mixed-script spam and transliteration "
    "artifacts that whole-document language ID misses (a Latin page "
    "with a Cyrillic spam footer keeps lang='en' but shows nonzero "
    "cyrillic_bp). Documents adorned deterministically with Cyrillic "
    "and CJK tails so every range is exercised; ranges shared as one "
    "constant between engine and oracle.",
)
def q_script_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.text_analysis import script_mix

    docs = _tp(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    adorned = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 3 == 0, F.lit(" Привет мир спам"))
            .when(F.col("doc_id") % 3 == 1, F.lit(" 世界和平文本"))
            .otherwise(F.lit("")),
        ).alias("adorned"),
    )
    return adorned.select("doc_id", *script_mix("adorned"))


@register(
    "ingest_anomaly",
    """
    WITH batched AS (
      SELECT source, doc_id % 7 AS batch, CAST(count(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY source, doc_id % 7
    ), hist AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_hist,
             CAST(SUM(n_docs) AS BIGINT) AS sx,
             CAST(SUM(n_docs * n_docs) AS BIGINT) AS sx2
      FROM batched WHERE batch < 6 GROUP BY source
    ), cur AS (
      SELECT source,
             CAST(n_docs + CASE WHEN source LIKE '%0' THEN 40 ELSE 0 END AS BIGINT)
               AS cur_count
      FROM batched WHERE batch = 6
    ), j AS (
      SELECT c.source, h.n_hist, h.sx, h.sx2, c.cur_count,
             h.n_hist * c.cur_count - h.sx AS dev,
             h.n_hist * (h.n_hist * h.sx2 - h.sx * h.sx) AS radicand
      FROM cur c LEFT JOIN hist h USING (source)
    )
    SELECT source,
           CAST(COALESCE(n_hist, 0) AS BIGINT) AS n_hist,
           CAST(COALESCE(sx, 0) AS BIGINT) AS hist_total,
           cur_count,
           CAST(COALESCE(dev, 0) AS BIGINT) AS dev,
           CAST(CASE WHEN n_hist >= 2 AND radicand > 0
                THEN FLOOR(dev * 10000 / sqrt(CAST(radicand AS DOUBLE)))
           END AS BIGINT) AS z_fp,
           CASE WHEN n_hist >= 2 AND radicand > 0
                THEN abs(CAST(FLOOR(dev * 10000 / sqrt(CAST(radicand AS DOUBLE))) AS BIGINT)) > 30000
           END AS is_anomaly
    FROM j
    """,
    doc="Per-source ingest-rate anomaly report "
    "(operators/anomaly.py ingest_anomaly): the newest batch's row "
    "count z-scored against that source's own batch history using "
    "exact int64 moment sums — numerator and radicand pure integers, "
    "sqrt bit-identical, one floor at the end (the package's moments "
    "recipe). Batches derived from doc_id % 7 (history = 0..5, "
    "current = 6); sources ending in '0' get +40 injected into the "
    "current batch so both anomalous and normal verdicts appear; "
    "degenerate histories yield NULL z, never divide-by-zero.",
)
def q_ingest_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.anomaly import ingest_anomaly

    docs = _t(spark, sf_dir, "documents")
    batched = docs.groupBy(
        "source", (F.col("doc_id") % 7).alias("batch")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    hist = batched.where(F.col("batch") < 6)
    cur = batched.where(F.col("batch") == 6).select(
        "source",
        (
            F.col("n_docs")
            + F.when(F.col("source").endswith("0"), F.lit(40)).otherwise(F.lit(0))
        ).alias("n_docs"),
    )
    return ingest_anomaly(hist, cur)


@register(
    "cms_estimates",
    """
    WITH src AS (
      SELECT l_suppkey AS item FROM lineitem WHERE l_suppkey IS NOT NULL
    ), rs AS (
      SELECT unnest(generate_series(0, 3)) AS r
    ), cells AS (
      SELECT r, ('0x' || substr(md5(CAST(r AS VARCHAR) || ':' || CAST(item AS VARCHAR)), 1, 15))::BIGINT % 64 AS bucket
      FROM src CROSS JOIN rs
    ), sk AS (
      SELECT r AS row_idx, bucket, CAST(count(*) AS BIGINT) AS cnt
      FROM cells GROUP BY 1, 2
    ), probes AS (
      SELECT DISTINCT l_suppkey AS item FROM lineitem
      WHERE l_suppkey IS NOT NULL ORDER BY 1 LIMIT 20
    ), pb AS (
      SELECT item, r,
             ('0x' || substr(md5(CAST(r AS VARCHAR) || ':' || CAST(item AS VARCHAR)), 1, 15))::BIGINT % 64 AS bucket
      FROM probes CROSS JOIN rs
    )
    SELECT p.item, CAST(MIN(COALESCE(s.cnt, 0)) AS BIGINT) AS est
    FROM pb p LEFT JOIN sk s ON p.r = s.row_idx AND p.bucket = s.bucket
    GROUP BY p.item
    """,
    doc="Count-min sketch point queries (sketches.count_min_sketch / "
    "cms_estimate, Cormode-Muthukrishnan): supplier counts folded "
    "into a 4x64-cell int64 sketch (fixed memory at ANY distinct "
    "count; state merges by addition — the mergeable-sketch family's "
    "point-query member), then 20 probe items estimated as the min "
    "across rows. The md5-based bucket hash is the package's "
    "cross-engine recipe, so construction AND estimation replay "
    "exactly in SQL — unlike the engine-internal HLL/quantile "
    "sketches, this one IS hash-oracle-able. Overestimate-only and "
    "merge==direct properties are pytest-pinned.",
)
def q_cms_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.sketches import cms_estimate, count_min_sketch

    li = _t(spark, sf_dir, "lineitem")
    sketch = count_min_sketch(li, "l_suppkey", width=64, depth=4)
    probes = (
        li.where(F.col("l_suppkey").isNotNull())
        .select(F.col("l_suppkey").alias("item"))
        .distinct()
        .orderBy("item")
        .limit(20)
    )
    return cms_estimate(sketch, probes, width=64, depth=4)


def _hll_oracle(m: int = 64, cap: int = 36) -> str:
    """Exact DuckDB twin of q_hll_distinct: md5 registers, MAX merge,
    integer harmonic sum, fixed-point alpha, linear-counting branch —
    the CASE expressions are generated by the SAME functions the Spark
    operator uses (sketches.hll_rho_case_sql / hll_pow2_case_sql), so
    the two engines cannot drift."""
    from pasta_pipeline_spark.operators.sketches import (
        _hll_alpha_fp,
        hll_pow2_case_sql,
        hll_rho_case_sql,
    )

    num = _hll_alpha_fp(m) * m * m * (1 << cap)
    rho = hll_rho_case_sql(f"h // {m}", cap)
    pow2 = hll_pow2_case_sql("r", cap)
    return f"""
    WITH h AS (
      SELECT l_returnflag,
             ('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15))::BIGINT AS h
      FROM lineitem WHERE l_partkey IS NOT NULL
    ), b AS (
      SELECT l_returnflag, h % {m} AS bucket, {rho} AS rho FROM h
    ), st AS (
      SELECT l_returnflag, bucket, MAX(rho) AS r FROM b GROUP BY 1, 2
    ), ag AS (
      SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS filled_buckets,
             CAST(SUM({pow2}) AS BIGINT) AS sum_pow
      FROM st GROUP BY 1
    ), es AS (
      SELECT l_returnflag, filled_buckets, {m} - filled_buckets AS v,
             CAST({num} // (10000 * (sum_pow + ({m} - filled_buckets) * {1 << cap})) AS BIGINT) AS est_raw
      FROM ag
    )
    SELECT l_returnflag, filled_buckets, est_raw,
           CAST(CASE WHEN v > 0 AND 2 * est_raw <= {5 * m}
                THEN CAST(FLOOR({m}.0 * ln({m}.0 / v)) AS BIGINT)
                ELSE est_raw END AS BIGINT) AS est
    FROM es
    """


@register(
    "hll_distinct",
    _hll_oracle(),
    doc="HyperLogLog distinct-count estimates (sketches.hll_state / "
    "hll_estimate, Flajolet et al. AofA'07): per-returnflag distinct "
    "part counts from 64 md5-derived registers — state is <= 64 "
    "(bucket, max-rho) rows per key at ANY cardinality, merges by "
    "idempotent MAX (re-delivery-proof, stronger than the additive "
    "CMS contract), and the estimator (integer harmonic sum, "
    "fixed-point alpha, ln-of-int-ratio linear-counting branch) "
    "hash-replays in SQL. The error-bound contract vs exact "
    "countDistinct is pytest-pinned; this query pins the sketch "
    "pipeline itself bit-for-bit.",
)
def q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.sketches import hll_estimate, hll_state

    li = _t(spark, sf_dir, "lineitem")
    state = hll_state(li, "l_partkey", keys=["l_returnflag"], m=64)
    return hll_estimate(state, keys=["l_returnflag"], m=64)


_MIXTURE_ORACLE = """
    WITH dom AS (
      SELECT source AS key,
             CAST(CAST(right(source, 1) AS INT) % 4 AS BIGINT) AS weight,
             CAST(SUM(n_chars) AS BIGINT) AS avail
      FROM documents GROUP BY 1
    ), tt AS (
      SELECT CAST((SUM(avail) * 6) // 10 AS BIGINT) AS total FROM dom
    ), pos AS (
      SELECT * FROM dom WHERE weight > 0
    ), ws AS (
      SELECT CAST(SUM(weight) AS BIGINT) AS w_all FROM pos
    ), ordered AS (
      SELECT p.key, p.weight, p.avail, t.total, w.w_all,
             COALESCE(SUM(p.avail) OVER (
               ORDER BY p.avail * 1.0 / p.weight, p.key
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cap,
             COALESCE(SUM(p.weight) OVER (
               ORDER BY p.avail * 1.0 / p.weight, p.key
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cwp
      FROM pos p CROSS JOIN ws w CROSS JOIN tt t
    ), sat AS (
      SELECT *,
             MIN(CASE WHEN avail * (w_all - cwp) <= (total - cap) * weight
                 THEN 1 ELSE 0 END) OVER (
               ORDER BY avail * 1.0 / weight, key
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1 AS saturated
      FROM ordered
    ), rem AS (
      SELECT CAST(MAX(total) - COALESCE(SUM(CASE WHEN saturated THEN avail END), 0) AS BIGINT) AS b_rem,
             CAST(MAX(w_all) - COALESCE(SUM(CASE WHEN saturated THEN weight END), 0) AS BIGINT) AS w_rem
      FROM sat
    ), unsat AS (
      SELECT s.key, s.weight, s.avail, s.saturated,
             CASE WHEN r.w_rem > 0 THEN (r.b_rem * s.weight) // r.w_rem END AS q,
             CASE WHEN r.w_rem > 0 THEN (r.b_rem * s.weight) % r.w_rem END AS rr,
             r.b_rem
      FROM sat s CROSS JOIN rem r WHERE NOT s.saturated
    ), ua AS (
      SELECT key, weight, avail, saturated,
             CAST(COALESCE(q + CASE WHEN ROW_NUMBER() OVER (ORDER BY rr DESC, key)
                                        <= b_rem - SUM(q) OVER () THEN 1 ELSE 0 END,
                           0) AS BIGINT) AS alloc
      FROM unsat
    )
    SELECT key, weight, avail, saturated, CAST(avail AS BIGINT) AS alloc
    FROM sat WHERE saturated
    UNION ALL
    SELECT key, weight, avail, saturated, alloc FROM ua
    UNION ALL
    SELECT key, weight, avail, FALSE AS saturated, CAST(0 AS BIGINT) AS alloc
    FROM dom WHERE weight <= 0
    """


@register(
    "mixture_allocation",
    _MIXTURE_ORACLE,
    doc="Training-mixture water-filling (operators/mixture.py "
    "mixture_allocation): target per-source shares (weights derived "
    "from the source id's last digit, including zero-weight sources) "
    "against per-source available character mass, budget = 60% of "
    "total availability (sf-stable). Saturated sources are the "
    "PREFIX of the avail/weight order found by one cross-multiplied "
    "int64 predicate over running sums (prefix-AND enforced); the "
    "remainder is Hamilton-apportioned among unsaturated sources — "
    "SUM(alloc) == min(total, SUM(avail)) exactly, every decision "
    "integer, whole cascade hash-replayed in SQL. Invariants "
    "(cap-respect, exact total, proportionality within 1 unit) are "
    "pytest-pinned.",
)
def q_mixture_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.mixture import mixture_allocation

    docs = _t(spark, sf_dir, "documents")
    doms = docs.groupBy(F.col("source").alias("key")).agg(
        F.sum("n_chars").cast("long").alias("avail")
    ).withColumn(
        "weight",
        (F.expr("CAST(right(key, 1) AS INT)") % 4).cast("long"),
    )
    # 1-row metadata handoff: the budget is 60% of total availability
    # (sf-stable by construction, mirrored exactly in the oracle)
    total = int(doms.agg(F.sum("avail")).collect()[0][0] * 6 // 10)
    return mixture_allocation(doms, total, "key", "weight", "avail")


@register(
    "politeness_schedule",
    """
    WITH frontier AS (
      SELECT 'h' || CAST(doc_id % 7 AS VARCHAR) || '.example' AS host,
             'https://h' || CAST(doc_id % 7 AS VARCHAR) || '.example/p'
               || CAST(doc_id AS VARCHAR) AS url,
             CAST(n_chars AS BIGINT) AS priority,
             CAST(1 + (doc_id % 7) % 3 AS BIGINT) AS delay_s
      FROM documents
    ), ranked AS (
      SELECT host, url, priority, delay_s,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY host ORDER BY priority DESC, url ASC
             ) AS BIGINT) AS host_rank
      FROM frontier
    )
    SELECT host, url, priority, delay_s, host_rank,
           CAST((host_rank - 1) // 2 AS BIGINT) AS wave,
           CAST(100 + ((host_rank - 1) // 2) * delay_s AS BIGINT) AS fetch_at_s
    FROM ranked
    """,
    doc="Per-host politeness scheduling (operators/politeness.py "
    "politeness_schedule): admitted URLs (synthesized hosts from "
    "doc_id, priority = n_chars, per-host crawl-delay 1-3s) get "
    "deterministic fetch timestamps — rank within host by priority, "
    "wave = rank div concurrency(2), fetch_at = start + wave * delay "
    "— turning the reference crawler's operational ~1 req/s sleep "
    "loop (message_scraper.py envelope) into planned schedule DATA a "
    "worker fleet executes coordination-free. One window per host, "
    "all integer arithmetic, full-hash SQL replay.",
)
def q_politeness_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.politeness import politeness_schedule

    docs = _t(spark, sf_dir, "documents")
    frontier = docs.select(
        F.concat(F.lit("h"), (F.col("doc_id") % 7).cast("string"), F.lit(".example")).alias("host"),
        F.concat(
            F.lit("https://h"), (F.col("doc_id") % 7).cast("string"),
            F.lit(".example/p"), F.col("doc_id").cast("string"),
        ).alias("url"),
        F.col("n_chars").cast("long").alias("priority"),
        (F.lit(1) + (F.col("doc_id") % 7) % 3).cast("long").alias("delay_s"),
    )
    return politeness_schedule(
        frontier,
        delay_col="delay_s",
        per_host_concurrency=2,
        priority_col="priority",
        start_ts_s=100,
    )


def _confusable_oracle() -> str:
    """DuckDB twin of q_confusable_spoof: the skeleton map is a
    replace() chain generated from the SAME CONFUSABLE_CYR2LAT
    constant the Spark operator translates with; token predicates are
    the same RE2-portable regex constants."""
    from pasta_pipeline_spark.operators.text_analysis import (
        CONFUSABLE_CYR2LAT,
        HAS_CYRILLIC_RE,
        HAS_LATIN_RE,
        PURE_LATIN_RE,
    )

    skel = "x"
    for cyr, lat in CONFUSABLE_CYR2LAT.items():
        skel = f"replace({skel}, '{cyr}', '{lat}')"
    inject = (
        "text || CASE WHEN doc_id % 10 = 0 THEN ' pаypal оffer' "
        "WHEN doc_id % 10 = 5 THEN ' словоmix' ELSE '' END"
    )
    return f"""
    WITH src AS (
      SELECT doc_id, {inject} AS t FROM documents
    ), lists AS (
      SELECT doc_id,
             list_filter(string_split_regex(t, '\\s+'), x -> x <> '') AS toks
      FROM src
    ), cls AS (
      SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_ws_tokens,
             list_filter(toks, x -> regexp_matches(x, '{HAS_LATIN_RE}')
                                AND regexp_matches(x, '{HAS_CYRILLIC_RE}')) AS mixed
      FROM lists
    )
    SELECT doc_id, n_ws_tokens,
           CAST(len(mixed) AS BIGINT) AS n_mixed_script,
           CAST(len(list_filter(mixed, x -> regexp_matches({skel}, '{PURE_LATIN_RE}')))
             AS BIGINT) AS n_spoofable,
           CAST(CASE WHEN n_ws_tokens > 0
                THEN (len(list_filter(mixed, x -> regexp_matches({skel}, '{PURE_LATIN_RE}')))
                      * 10000) // n_ws_tokens
                ELSE 0 END AS BIGINT) AS spoof_bp
    FROM cls
    """


@register(
    "confusable_spoof",
    _confusable_oracle(),
    doc="Homoglyph-spoof detection (text_analysis.confusable_stats, "
    "UTS #39 confusables): per-document counts of mixed-script "
    "tokens and of SPOOFABLE tokens — mixed tokens whose Cyrillic "
    "letters are all Latin lookalikes, so the skeleton map folds "
    "them to pure Latin ('pаypal' flags, a real Russian word does "
    "not). Injected spoof/mixed tokens on a doc_id stride make both "
    "classes appear at any sf. Expression-only (split + HOF filters "
    "+ one translate; no explode/shuffle/UDF); skeleton map and "
    "regexes shared with the oracle, which replays token "
    "classification with a generated replace() chain.",
)
def q_confusable_spoof(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.text_analysis import confusable_stats

    docs = _tp(spark, sf_dir, "documents")
    t2 = F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 10 == 0, F.lit(" pаypal оffer"))
        .when(F.col("doc_id") % 10 == 5, F.lit(" словоmix"))
        .otherwise(F.lit("")),
    )
    return docs.select("doc_id", t2.alias("t")).select(
        "doc_id", *confusable_stats("t")
    )


_PSL_FULL_LINES = [
    "// ===BEGIN ICANN DOMAINS===",
    "",
    "com",
    "co.uk",
    "jp",
    "*.ck",
    "!www.ck",
    "*.kobe.jp",
    "!city.kobe.jp",
]


@register(
    "psl_full_domains",
    """
    WITH hosts AS (
      SELECT doc_id,
             CASE doc_id % 8
               WHEN 0 THEN 'a' || CAST(doc_id AS VARCHAR) || '.shop.com'
               WHEN 1 THEN 'b' || CAST(doc_id AS VARCHAR) || '.x.co.uk'
               WHEN 2 THEN 'c' || CAST(doc_id AS VARCHAR) || '.that.ck'
               WHEN 3 THEN 'www.ck'
               WHEN 4 THEN 'd' || CAST(doc_id AS VARCHAR) || '.www.ck'
               WHEN 5 THEN 'e' || CAST(doc_id AS VARCHAR) || '.y.kobe.jp'
               WHEN 6 THEN 'f' || CAST(doc_id AS VARCHAR) || '.city.kobe.jp'
               ELSE 'g' || CAST(doc_id AS VARCHAR) || '.unknowntld'
             END AS host
      FROM documents
    ), t AS (
      SELECT doc_id, host, string_split(host, '.') AS sp,
             len(string_split(host, '.')) AS n
      FROM hosts
    )
    SELECT doc_id, host,
      CASE
        WHEN host = 'www.ck' OR host LIKE '%.www.ck' THEN 'www.ck'
        WHEN host = 'city.kobe.jp' OR host LIKE '%.city.kobe.jp' THEN 'city.kobe.jp'
        WHEN n >= 3 AND array_to_string(list_slice(sp, n - 1, n), '.') = 'kobe.jp'
          THEN array_to_string(list_slice(sp, greatest(n - 3, 1), n), '.')
        WHEN n >= 2 AND array_to_string(list_slice(sp, n - 1, n), '.') = 'co.uk'
          THEN array_to_string(list_slice(sp, greatest(n - 2, 1), n), '.')
        WHEN n >= 2 AND sp[n] = 'ck'
          THEN array_to_string(list_slice(sp, greatest(n - 2, 1), n), '.')
        ELSE array_to_string(list_slice(sp, greatest(n - 1, 1), n), '.')
      END AS domain
    FROM t
    """,
    doc="Complete publicsuffix.org algorithm end-to-end "
    "(functions/urls.py parse_psl_lines + "
    "registrable_domain_psl_full): the raw .dat format (comments, "
    "blanks, literal / *.wildcard / !exception rules) parses in one "
    "projection, and hosts synthesized over every rule class "
    "(literal 1- and 2-label suffixes, wildcard-consumed labels, "
    "exceptions at and below the exception host, unknown-TLD "
    "fallback) resolve eTLD+1 through a chain of broadcast joins — "
    "no corpus shuffle. The oracle replays the prevailing-rule "
    "semantics as a priority CASE over the same rule constants; the "
    "spec's ck / kobe.jp worked examples are pytest-pinned.",
)
def q_psl_full_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.functions.urls import (
        parse_psl_lines,
        registrable_domain_psl_full,
    )

    docs = _t(spark, sf_dir, "documents")
    ds = F.col("doc_id").cast("string")
    host = (
        F.when(F.col("doc_id") % 8 == 0, F.concat(F.lit("a"), ds, F.lit(".shop.com")))
        .when(F.col("doc_id") % 8 == 1, F.concat(F.lit("b"), ds, F.lit(".x.co.uk")))
        .when(F.col("doc_id") % 8 == 2, F.concat(F.lit("c"), ds, F.lit(".that.ck")))
        .when(F.col("doc_id") % 8 == 3, F.lit("www.ck"))
        .when(F.col("doc_id") % 8 == 4, F.concat(F.lit("d"), ds, F.lit(".www.ck")))
        .when(F.col("doc_id") % 8 == 5, F.concat(F.lit("e"), ds, F.lit(".y.kobe.jp")))
        .when(F.col("doc_id") % 8 == 6, F.concat(F.lit("f"), ds, F.lit(".city.kobe.jp")))
        .otherwise(F.concat(F.lit("g"), ds, F.lit(".unknowntld")))
    )
    lines = spark.createDataFrame([(x,) for x in _PSL_FULL_LINES], "value string")
    rules = parse_psl_lines(lines)
    hosts = docs.select("doc_id", host.alias("host"))
    return registrable_domain_psl_full(hosts, "host", rules)


def _bloom_oracle(n_words: int = 2, k: int = 2) -> str:
    """DuckDB twin of q_bloom_contamination: build + probe replayed
    from the same md5 slot recipe and 63-bit word layout."""
    nbits = n_words * 63

    def slot(i: int, src: str) -> tuple[str, str]:
        bit = f"(('0x' || substr(md5('{i}:' || {src}), 1, 15))::BIGINT % {nbits})"
        return (
            f"CAST({bit} // 63 AS INTEGER)",
            f"(CAST(1 AS BIGINT) << CAST({bit} % 63 AS INTEGER))",
        )

    slot_rows = " UNION ALL ".join(
        f"SELECT {slot(i, 'text')[0]} AS word_idx, {slot(i, 'text')[1]} AS mask FROM ev"
        for i in range(k)
    )
    tests = []
    joins = []
    for i in range(k):
        widx, mask = slot(i, "p.text")
        joins.append(f"LEFT JOIN words w{i} ON w{i}.word_idx = {widx}")
        tests.append(f"(w{i}.word IS NOT NULL AND (w{i}.word & {mask}) = {mask})")
    return f"""
    WITH ev AS (
      SELECT DISTINCT text FROM documents WHERE doc_id % 97 = 0 AND text IS NOT NULL
    ), slots AS (
      {slot_rows}
    ), words AS (
      SELECT word_idx, CAST(bit_or(mask) AS BIGINT) AS word FROM slots GROUP BY 1
    )
    SELECT p.doc_id,
           {" AND ".join(tests)} AS maybe_member,
           e.text IS NOT NULL AS is_member
    FROM documents p
    {" ".join(joins)}
    LEFT JOIN ev e ON p.text = e.text
    """


@register(
    "bloom_contamination",
    _bloom_oracle(),
    doc="Bloom-filter decontamination prefilter (sketches.bloom_build "
    "/ bloom_probe): the eval set (doc_id % 97 stride) folds into a "
    "2x63-bit filter that BROADCASTS to the corpus scan — k broadcast "
    "joins + bit tests, no shuffle of the probe side — and only bloom "
    "hits would proceed to the exact verification join. The width is "
    "deliberately tiny so false positives APPEAR in the result next "
    "to the exact is_member column: the one-sided contract "
    "(maybe_member is TRUE for every true member; FPs exist, FNs "
    "never) is visible in the hash-checked output and pytest-pinned; "
    "construction and probing replay bit-for-bit in SQL.",
)
def q_bloom_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.sketches import bloom_build, bloom_probe

    docs = _t(spark, sf_dir, "documents")
    ev = docs.where((F.col("doc_id") % 97 == 0) & F.col("text").isNotNull()).select(
        "text"
    )
    bl = bloom_build(ev, "text", n_words=2, k=2)
    probed = bloom_probe(
        docs.select("doc_id", "text"), "text", bl, n_words=2, k=2
    )
    ev_d = ev.distinct().withColumnRenamed("text", "__evt")
    return (
        probed.join(F.broadcast(ev_d), probed["text"] == F.col("__evt"), "left")
        .select(
            "doc_id",
            "maybe_member",
            F.col("__evt").isNotNull().alias("is_member"),
        )
    )


@register(
    "media_png_pixels",
    """
    WITH ids AS (
      SELECT doc_id AS media_id,
             4 + doc_id % 12 AS w,
             4 + (doc_id // 3) % 10 AS h
      FROM documents
    ), xs AS (
      SELECT media_id, w, h, unnest(generate_series(0, w - 1)) AS x FROM ids
    ), ys AS (
      SELECT media_id, w, h, x, unnest(generate_series(0, h - 1)) AS y FROM xs
    ), cs AS (
      SELECT media_id, x, y, unnest([0, 1, 2]) AS c FROM ys
    ), vals AS (
      SELECT media_id, c,
             (media_id * 7 + y * 31 + x * 13 + c * 5) % 256 AS v
      FROM cs
    )
    SELECT i.media_id,
           CAST(i.w AS INTEGER) AS width,
           CAST(i.h AS INTEGER) AS height,
           CAST(i.w * i.h AS BIGINT) AS n_pixels,
           CAST(SUM(v) AS BIGINT) AS pixel_sum,
           CAST(SUM((CASE c WHEN 0 THEN 299 WHEN 1 THEN 587 ELSE 114 END) * v)
             AS BIGINT) AS luma_sum
    FROM vals JOIN ids i USING (media_id)
    GROUP BY 1, 2, 3, 4
    """,
    doc="FULL PNG pixel decode (multimodal.decode_image_pixels / "
    "decode_png_pixels): complete valid PNGs — real zlib DEFLATE "
    "IDAT, scanline filter y % 5 so all five spec filters incl. "
    "Paeth round-trip — synthesized from the doc_id recipe, then "
    "decoded end-to-end (chunk walk, inflate, unfilter) to integer "
    "pixel and Rec.601 luma sums. The oracle computes the SAME sums "
    "from the closed-form pixel recipe WITHOUT touching a byte, so "
    "any inflate/stride/predictor bug hash-mismatches. The last "
    "honesty upgrade for compressed media: DEFLATE is stdlib; the "
    "non-stdlib entropy coders followed (GIF LZW in media_gif_pixels, "
    "baseline JPEG in media_jpeg_pixels); only video codecs (H.264) "
    "still stop at header level.",
)
def q_media_png_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.multimodal import (
        decode_image_pixels,
        synthesize_media,
    )

    docs = _tp(spark, sf_dir, "documents")
    media = synthesize_media(
        docs.select(F.col("doc_id").alias("media_id")), variant="png_full"
    )
    return decode_image_pixels(media)


def _mojibake_oracle() -> str:
    from pasta_pipeline_spark.operators.normalize_text import mojibake_repair_sql

    inject = (
        "text || CASE WHEN doc_id % 6 = 0"
        " THEN ' It\u00e2\u20ac\u2122s d\u00c3\u00a9j\u00c3\u00a0 vu"
        " \u00e2\u20ac\u201d na\u00c3\u00afve caf\u00c3\u00a9 \u00e2\u201a\u00ac9'"
        " WHEN doc_id % 6 = 3 THEN ' \u00c3\u00bcber sch\u00c3\u00b6n \u00c3\u00a7ig'"
        " ELSE '' END"
    )
    rep = mojibake_repair_sql("t")
    return f"""
    WITH src AS (
      SELECT doc_id, {inject} AS t FROM documents
    )
    SELECT doc_id,
           CAST(length(t) AS BIGINT) AS len_before,
           CAST(length({rep}) AS BIGINT) AS len_after,
           md5({rep}) AS repaired_md5
    FROM src
    """


_MOJIBAKE_INJECT_A = (
    " It\u00e2\u20ac\u2122s d\u00c3\u00a9j\u00c3\u00a0 vu"
    " \u00e2\u20ac\u201d na\u00c3\u00afve caf\u00c3\u00a9 \u00e2\u201a\u00ac9"
)
_MOJIBAKE_INJECT_B = " \u00c3\u00bcber sch\u00c3\u00b6n \u00c3\u00a7ig"


@register(
    "mojibake_repair",
    _mojibake_oracle(),
    doc="cp1252 mojibake repair (normalize_text.repair_mojibake, the "
    "ftfy headline case): the repair table is COMPUTED - each target "
    "character's corrupt form is its utf-8-bytes-decoded-as-cp1252 "
    "round trip - and both the Spark replace chain and the SQL twin "
    "generate from those same pairs, longest sequences first so "
    "3-char punctuation never loses its prefix to a 2-char accent "
    "rule. Corrupt fragments injected on doc_id strides; clean text "
    "passes through byte-identical (len_before == len_after and an "
    "unchanged md5 on unstrided rows). Pure expressions, no UDF.",
)
def q_mojibake_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.normalize_text import repair_mojibake

    docs = _tp(spark, sf_dir, "documents")
    t = F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 6 == 0, F.lit(_MOJIBAKE_INJECT_A))
        .when(F.col("doc_id") % 6 == 3, F.lit(_MOJIBAKE_INJECT_B))
        .otherwise(F.lit("")),
    )
    rep = repair_mojibake(t)
    return docs.select(
        "doc_id",
        F.length(t).cast("long").alias("len_before"),
        F.length(rep).cast("long").alias("len_after"),
        F.md5(rep.cast("binary")).alias("repaired_md5"),
    )


@register(
    "bigram_nll",
    """
    WITH base AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS tk
      FROM documents WHERE text IS NOT NULL
    ), bigx AS (
      SELECT doc_id, unnest(generate_series(1, len(tk) - 1)) AS i, tk FROM base
    ), big AS (
      SELECT doc_id, tk[i] AS w1, tk[i + 1] AS w2 FROM bigx
    ), mbase AS (
      SELECT tk FROM base WHERE doc_id % 5 <> 0
    ), mbigx AS (
      SELECT unnest(generate_series(1, len(tk) - 1)) AS i, tk FROM mbase
    ), mbig AS (
      SELECT tk[i] AS w1, tk[i + 1] AS w2 FROM mbigx
    ), uni AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS c2
      FROM (SELECT unnest(tk) AS w FROM mbase) GROUP BY 1
    ), totals AS (
      SELECT CAST(SUM(c2) + COUNT(*) AS BIGINT) AS TV FROM uni
    ), c12t AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12 FROM mbig GROUP BY 1, 2
    ), c1t AS (
      SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1 FROM mbig GROUP BY 1
    ), scored AS (
      SELECT b.doc_id,
             c1t.c1 IS NULL AS oov,
             CASE WHEN c1t.c1 IS NOT NULL THEN
               CAST(FLOOR(ln(CAST(10 * c1t.c1 * t.TV AS DOUBLE)) * 1000000000) AS BIGINT)
               - CAST(FLOOR(ln(CAST(7 * COALESCE(c12t.c12, 0) * t.TV
                   + 3 * (COALESCE(u2.c2, 0) + 1) * c1t.c1 AS DOUBLE)) * 1000000000) AS BIGINT)
             END AS tt
      FROM big b
      LEFT JOIN c1t ON b.w1 = c1t.w1
      LEFT JOIN c12t ON b.w1 = c12t.w1 AND b.w2 = c12t.w2
      LEFT JOIN uni u2 ON b.w2 = u2.w
      CROSS JOIN totals t
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(CASE WHEN oov THEN 1 ELSE 0 END) AS BIGINT) AS n_oov_openers,
           CAST(CASE WHEN COUNT(tt) > 0 THEN SUM(tt) // COUNT(tt) END AS BIGINT) AS nll2_fp
    FROM scored GROUP BY 1
    """,
    doc="Interpolated bigram LM scoring (text_analysis.bigram_nll, "
    "the CCNet perplexity-filter shape): the model fits on the "
    "reference slice (doc_id % 5 != 0) and scores EVERY document "
    "against it — p(w2|w1) = 0.7*c12/c1 + 0.3*(c2+1)/(T+V) with "
    "add-one continuation smoothing, each -ln p a difference of two "
    "fixed-point lns of int64 products (the unigram_nll playbook), "
    "so the whole cross-fit score replays exactly in SQL. "
    "OOV-opener bigrams are excluded from the mean but counted. "
    "Conforming-vs-shuffled discrimination is pytest-pinned.",
)
def q_bigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.text_analysis import bigram_nll

    docs = _tp(spark, sf_dir, "documents")
    model = docs.where(F.col("doc_id") % 5 != 0)
    return bigram_nll(docs, model_docs=model)


@register(
    "pii_luhn_cards",
    r"""
    WITH src AS (
      SELECT doc_id,
             text || CASE doc_id % 7
               WHEN 0 THEN ' card 4111111111111111 ok'
               WHEN 2 THEN ' num 4111111111111112 bad'
               WHEN 4 THEN ' pay 4111 1111 1111 1111 now'
               ELSE '' END AS t
      FROM documents
    ), ex AS (
      SELECT doc_id,
             regexp_extract_all(t, '\b[0-9](?:[ -]?[0-9]){12,18}\b') AS cands
      FROM src
    )
    SELECT doc_id,
           CAST(len(cands) AS BIGINT) AS n_cc_candidates,
           CAST(len(list_filter(cands, s ->
             length(regexp_replace(s, '[^0-9]', '', 'g')) BETWEEN 13 AND 19
             AND list_sum(list_transform(
                   generate_series(1, length(regexp_replace(s, '[^0-9]', '', 'g'))),
                   i -> CASE WHEN i % 2 = 1
                        THEN ascii(substr(regexp_replace(s, '[^0-9]', '', 'g'),
                             length(regexp_replace(s, '[^0-9]', '', 'g')) - i + 1, 1)) - 48
                        ELSE CASE WHEN (ascii(substr(regexp_replace(s, '[^0-9]', '', 'g'),
                             length(regexp_replace(s, '[^0-9]', '', 'g')) - i + 1, 1)) - 48) * 2 > 9
                             THEN (ascii(substr(regexp_replace(s, '[^0-9]', '', 'g'),
                                  length(regexp_replace(s, '[^0-9]', '', 'g')) - i + 1, 1)) - 48) * 2 - 9
                             ELSE (ascii(substr(regexp_replace(s, '[^0-9]', '', 'g'),
                                  length(regexp_replace(s, '[^0-9]', '', 'g')) - i + 1, 1)) - 48) * 2
                        END END)) % 10 = 0
           )) AS BIGINT) AS n_cc_valid
    FROM ex
    """,
    doc="Credit-card detection with Luhn validation (operators/pii.py "
    "scan_credit_cards): 13-19 digit candidates from the word-bounded "
    "regex, then the ISO/IEC 7812 checksum as a HOF "
    "transform+aggregate — no UDF, no explode — separating real card "
    "numbers (injected Visa/spaced-Visa test numbers) from "
    "checksum-failing near-misses and arbitrary long ids. The SQL "
    "twin replays the checksum with list_transform/list_sum; "
    "candidate-vs-valid behavior is pytest-pinned.",
)
def q_pii_luhn_cards(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.pii import scan_credit_cards

    docs = _tp(spark, sf_dir, "documents")
    t = F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 7 == 0, F.lit(" card 4111111111111111 ok"))
        .when(F.col("doc_id") % 7 == 2, F.lit(" num 4111111111111112 bad"))
        .when(F.col("doc_id") % 7 == 4, F.lit(" pay 4111 1111 1111 1111 now"))
        .otherwise(F.lit("")),
    )
    return scan_credit_cards(
        docs.select("doc_id", t.alias("t")), "doc_id", "t"
    )


@register(
    "boilerplate_lines",
    """
    WITH src AS (
      SELECT doc_id, source,
             text || chr(10) || 'Footer of ' || source ||
             CASE WHEN doc_id % 4 = 0
                  THEN chr(10) || 'Promo ' || source ELSE '' END AS t
      FROM documents WHERE text IS NOT NULL
    ), lines AS (
      SELECT doc_id, source, unnest(ls) AS line, generate_subscripts(ls, 1) AS pos
      FROM (SELECT doc_id, source, string_split(t, chr(10)) AS ls FROM src)
    ), dpl AS (
      SELECT source, line, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS d
      FROM lines GROUP BY 1, 2
    ), gs AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS nd FROM src GROUP BY 1
    ), bp AS (
      SELECT dpl.source, dpl.line
      FROM dpl JOIN gs USING (source)
      WHERE dpl.d * 10000 >= 5000 * gs.nd AND dpl.d >= 3
    ), flagged AS (
      SELECT l.doc_id, l.source, l.pos, l.line,
             (bp.line IS NULL OR trim(l.line) = '') AS kept
      FROM lines l
      LEFT JOIN bp ON l.source = bp.source AND l.line = bp.line
    )
    SELECT doc_id, source,
           coalesce(string_agg(CASE WHEN kept THEN line END, chr(10) ORDER BY pos), '')
             AS text_kept,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(SUM(CASE WHEN kept THEN 0 ELSE 1 END) AS BIGINT) AS n_removed
    FROM flagged GROUP BY 1, 2
    """,
    doc="Group-scoped template removal (subdoc_dedup.py "
    "remove_boilerplate_lines, the RefinedWeb companion to corpus "
    "line dedup): a line is boilerplate when it appears in >= 50% of "
    "its OWN source's documents (and >= 3 docs) — the site-footer / "
    "nav-menu class that global frequency rules miss. Injected "
    "per-source footers (100% of docs -> removed) and promo lines "
    "(25% -> kept) exercise both verdicts; membership is "
    "per-document so repetition inside one doc cannot convict. "
    "Reassembly preserves order; integer basis-point decision "
    "hash-replays in SQL.",
)
def q_boilerplate_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.subdoc_dedup import remove_boilerplate_lines

    docs = _tp(spark, sf_dir, "documents")
    t = F.concat(
        F.col("text"), F.lit("\n"), F.lit("Footer of "), F.col("source"),
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(F.lit("\n"), F.lit("Promo "), F.col("source")),
        ).otherwise(F.lit("")),
    )
    return remove_boilerplate_lines(
        docs.where(F.col("text").isNotNull()).select(
            "doc_id", "source", t.alias("t")
        ),
        text_col="t",
        frac_bp=5000,
        min_docs=3,
    )


_ANCHOR_SQL_PATTERN = (
    "$re$(?s)<a\\s[^>]*href\\s*=\\s*[\"']([^\"']*)[\"'][^>]*>(.*?)</a>$re$"
)


@register(
    "anchor_graph",
    f"""
    WITH src AS (
      SELECT doc_id,
             '<p>' || text || '</p><a href="https://t' || (doc_id % 5)
             || '.example/p' || (doc_id % 11) || '">go <b>t' || (doc_id % 5)
             || '</b> page</a>'
             || CASE WHEN doc_id % 3 = 0
                  THEN '<a class="x" href="https://hub.example/h' || (doc_id % 4)
                       || '">hub  ' || (doc_id % 4) || '</a>'
                  ELSE '' END AS h
      FROM documents WHERE text IS NOT NULL
    ), ex AS (
      SELECT doc_id,
             regexp_extract_all(h, {_ANCHOR_SQL_PATTERN}, 1) AS hrefs,
             regexp_extract_all(h, {_ANCHOR_SQL_PATTERN}, 2) AS bodies
      FROM src
    ), z AS (
      SELECT doc_id, unnest(hrefs) AS href, unnest(bodies) AS body FROM ex
    ), a AS (
      SELECT doc_id, href,
             trim(regexp_replace(regexp_replace(body, '<[^>]+>', '', 'g'),
                                 '\\s+', ' ', 'g')) AS anchor
      FROM z
    )
    SELECT href,
           CAST(COUNT(*) AS BIGINT) AS n_links,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           MIN(anchor) AS top_anchor
    FROM a GROUP BY 1
    """,
    doc="Anchor-text link graph (functions/urls.py extract_anchors): "
    "outlinks WITH their anchor text pulled from synthesized HTML by "
    "two group-extractions of one dotall pattern zipped positionally "
    "— no HTML parser, no UDF, one projection — then aggregated per "
    "target (in-link count, distinct referrers, alphabetically-first "
    "anchor). Inner markup stripped and whitespace collapsed in both "
    "engines; the raw material of PageRank and anchor-relevance "
    "signals.",
)
def q_anchor_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.functions.urls import extract_anchors

    docs = _tp(spark, sf_dir, "documents")
    h = F.concat(
        F.lit("<p>"), F.col("text"), F.lit("</p><a href=\"https://t"),
        (F.col("doc_id") % 5).cast("string"), F.lit(".example/p"),
        (F.col("doc_id") % 11).cast("string"), F.lit("\">go <b>t"),
        (F.col("doc_id") % 5).cast("string"), F.lit("</b> page</a>"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit("<a class=\"x\" href=\"https://hub.example/h"),
                (F.col("doc_id") % 4).cast("string"),
                F.lit("\">hub  "), (F.col("doc_id") % 4).cast("string"),
                F.lit("</a>"),
            ),
        ).otherwise(F.lit("")),
    )
    exploded = (
        docs.where(F.col("text").isNotNull())
        .select("doc_id", F.explode(extract_anchors(h)).alias("a"))
        .select("doc_id", F.col("a.href").alias("href"), F.col("a.anchor").alias("anchor"))
    )
    return exploded.groupBy("href").agg(
        F.count(F.lit(1)).cast("long").alias("n_links"),
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
        F.min("anchor").alias("top_anchor"),
    )


def _domain_authority_oracle() -> str:
    it = """, it{n} AS (
      SELECT e.dst AS id,
             CAST(150000 + (85 * CAST(SUM(x.r // d.outdeg) AS BIGINT)) // 100 AS BIGINT) AS r
      FROM edges e JOIN it{p} x ON e.src = x.id JOIN deg d ON d.src = e.src
      GROUP BY e.dst
    )"""
    iters = "".join(it.format(n=i, p=i - 1 if i > 1 else 0) for i in (1, 2, 3)).replace(
        "it0", "r0"
    )
    hid = "('0x' || substr(md5({c}), 1, 15))::BIGINT"
    return f"""
    WITH src AS (
      SELECT doc_id,
             '<a href="https://t' || (doc_id % 5) || '.example/p' || (doc_id % 11)
             || '">x</a>'
             || CASE WHEN doc_id % 3 = 0
                  THEN '<a href="https://hub.example/h' || (doc_id % 4) || '">y</a>'
                  ELSE '' END AS h
      FROM documents WHERE text IS NOT NULL
    ), z AS (
      SELECT doc_id, unnest(regexp_extract_all(h, 'href="([^"]*)"', 1)) AS href
      FROM src
    ), pairs AS (
      SELECT DISTINCT 's' || (doc_id % 6) || '.example' AS src_host,
             regexp_extract(href, '^https://([^/]+)', 1) AS dst_host
      FROM z WHERE regexp_extract(href, '^https://([^/]+)', 1) <> ''
    ), edges AS (
      SELECT {hid.format(c="src_host")} AS src, {hid.format(c="dst_host")} AS dst
      FROM pairs
      UNION ALL
      SELECT {hid.format(c="dst_host")} AS src, {hid.format(c="src_host")} AS dst
      FROM pairs
    ), deg AS (
      SELECT src, count(*) AS outdeg FROM edges GROUP BY src
    ), r0 AS (
      SELECT DISTINCT src AS id, CAST(1000000 AS BIGINT) AS r FROM edges
    ){iters}, names AS (
      SELECT DISTINCT dst_host AS host, {hid.format(c="dst_host")} AS id FROM pairs
    )
    SELECT n.host, x.r AS rank_fp FROM it3 x JOIN names n USING (id)
    """


@register(
    "domain_authority",
    _domain_authority_oracle(),
    doc="Crawl-side authority capstone: anchor hrefs (extract_anchors "
    "recipe) become a host co-link edge set — distinct pairs CLOSED "
    "with their reverse edges (the bipartite_edges construction: the "
    "raw referrer->target set is all-sources-to-all-sinks, where "
    "directed rank mass dies after one round) — ranked by 3 rounds "
    "of fixed-point PageRank (operators/graph.py) and joined back to "
    "host names, the signal crawl prioritization and source "
    "weighting consume. The oracle chains the iterations as CTEs "
    "like pagerank_parts; host derivation shares the regex with the "
    "SQL twin.",
)
def q_domain_authority(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.functions.urls import extract_anchors
    from pasta_pipeline_spark.operators.graph import pagerank_fixed

    docs = _tp(spark, sf_dir, "documents")
    h = F.concat(
        F.lit('<a href="https://t'), (F.col("doc_id") % 5).cast("string"),
        F.lit(".example/p"), (F.col("doc_id") % 11).cast("string"),
        F.lit('">x</a>'),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit('<a href="https://hub.example/h'),
                (F.col("doc_id") % 4).cast("string"), F.lit('">y</a>'),
            ),
        ).otherwise(F.lit("")),
    )
    hrefs = (
        docs.where(F.col("text").isNotNull())
        .select("doc_id", F.explode(extract_anchors(h)).alias("a"))
        .select("doc_id", F.col("a.href").alias("href"))
    )
    dst = F.regexp_extract("href", r"^https://([^/]+)", 1)
    pairs = (
        hrefs.select(
            F.concat(
                F.lit("s"), (F.col("doc_id") % 6).cast("string"), F.lit(".example")
            ).alias("src_host"),
            dst.alias("dst_host"),
        )
        .where(F.col("dst_host") != "")
        .distinct()
    )

    def hid(c):
        return F.conv(F.substring(F.md5(F.col(c)), 1, 15), 16, 10).cast("long")

    fwd = pairs.select(hid("src_host").alias("src"), hid("dst_host").alias("dst"))
    rev = pairs.select(hid("dst_host").alias("src"), hid("src_host").alias("dst"))
    edges = fwd.unionByName(rev)
    ranks = pagerank_fixed(edges, iterations=3)
    names = pairs.select(
        F.col("dst_host").alias("host"), hid("dst_host").alias("id")
    ).distinct()
    return ranks.join(names, "id").select("host", "rank_fp")


@register(
    "sitemap_refresh",
    """
    WITH disc AS (
      SELECT 'h' || (doc_id % 7) AS host,
             'https://h' || (doc_id % 7) || '.ex/p' || doc_id AS url,
             CASE WHEN doc_id % 5 = 4 THEN NULL
                  WHEN doc_id % 2 = 0 THEN '2026-02-15'
                  ELSE '2026-01-05T06:07:08Z' END AS lastmod
      FROM documents
    ), d AS (
      SELECT host, url,
             CASE WHEN length(lastmod) >= 10 THEN
               COALESCE(
                 CAST(epoch(TRY_CAST(substr(lastmod, 1, 19) AS TIMESTAMP)) AS BIGINT),
                 CAST(epoch(TRY_CAST(substr(lastmod, 1, 10) AS TIMESTAMP)) AS BIGINT))
             END AS lastmod_s
      FROM disc
    ), log AS (
      SELECT 'https://h' || (doc_id % 7) || '.ex/p' || doc_id AS url,
             CAST(1768867200 AS BIGINT) AS fetched_at_s
      FROM documents WHERE doc_id % 3 <> 1
    ), j AS (
      SELECT d.host, d.url, d.lastmod_s, l.fetched_at_s,
             CASE WHEN l.fetched_at_s IS NULL THEN 'new'
                  WHEN d.lastmod_s IS NOT NULL AND d.lastmod_s > l.fetched_at_s
                  THEN 'stale' END AS reason
      FROM d LEFT JOIN log l USING (url)
    )
    SELECT host, url, lastmod_s, fetched_at_s, reason FROM j
    WHERE reason IS NOT NULL
    """,
    doc="Sitemap-freshness re-crawl selection (operators/sitemaps.py "
    "refresh_selection) — the crawl-side instance of the reference's "
    "incremental time-bounded scan (S2): discovered URLs refetch "
    "when NEW (no fetch record) or STALE (lastmod newer than the "
    "recorded fetch). Synthesized lastmods cover full ISO "
    "timestamps, date-only entries (midnight UTC), and NULLs; the "
    "fetch log (2026-01-20) splits Jan lastmods (fresh, excluded) "
    "from Feb (stale). try_-parsing both engines; one URL-keyed "
    "left join.",
)
def q_sitemap_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.sitemaps import refresh_selection

    docs = _t(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://h"), (F.col("doc_id") % 7).cast("string"),
        F.lit(".ex/p"), F.col("doc_id").cast("string"),
    )
    disc = docs.select(
        F.concat(F.lit("h"), (F.col("doc_id") % 7).cast("string")).alias("host"),
        url.alias("loc"),
        F.when(F.col("doc_id") % 5 == 4, F.lit(None).cast("string"))
        .when(F.col("doc_id") % 2 == 0, F.lit("2026-02-15"))
        .otherwise(F.lit("2026-01-05T06:07:08Z"))
        .alias("lastmod"),
    )
    log = docs.where(F.col("doc_id") % 3 != 1).select(
        url.alias("url"), F.lit(1768867200).cast("long").alias("fetched_at_s")
    )
    return refresh_selection(disc, log)


@register(
    "source_concentration",
    """
    WITH groups AS (
      SELECT source AS g, CAST(COUNT(*) AS BIGINT) AS w
      FROM documents GROUP BY 1
    ), ranked AS (
      SELECT g, w,
             CAST(ROW_NUMBER() OVER (ORDER BY w ASC, g ASC) AS BIGINT) AS i
      FROM groups WHERE w > 0
    ), t AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
             CAST(SUM(w) AS BIGINT) AS total_w,
             CAST(SUM(w * CAST(FLOOR(ln(CAST(w AS DOUBLE)) * 1000000000) AS BIGINT))
               AS BIGINT) AS swl,
             CAST(SUM(i * w) AS BIGINT) AS siw
      FROM ranked
    ), h AS (
      SELECT CAST(SUM(((w * 10000) // t.total_w) * ((w * 10000) // t.total_w))
               AS BIGINT) AS hhi_bp2
      FROM ranked, t
    )
    SELECT t.n_groups, t.total_w, h.hhi_bp2,
           CAST(CAST(FLOOR(ln(CAST(t.total_w AS DOUBLE)) * 1000000000) AS BIGINT)
                - (t.swl // t.total_w) AS BIGINT) AS entropy_fp,
           CAST(CASE WHEN t.n_groups > 1
                THEN ((2 * t.siw - (t.n_groups + 1) * t.total_w) * 10000)
                     // (t.n_groups * t.total_w)
                ELSE 0 END AS BIGINT) AS gini_bp
    FROM t, h
    """,
    doc="Corpus concentration audit (operators/stats.py "
    "source_concentration): one row of diversity measures over the "
    "source distribution — Herfindahl index (sum of squared "
    "basis-point shares), Shannon entropy in fixed-point nats "
    "(ln(W) - SUM(w*lnfp(w))/W, the unigram_nll playbook), and Gini "
    "via the sorted-cumulative formula with deterministic tiebreaks "
    "— the 'is this corpus secretly one site?' gate before a mix "
    "trains. The rank window runs over the SOURCE table "
    "(metadata-scale); all-equal and monopoly extremes are "
    "pytest-pinned against hand math.",
)
def q_source_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.stats import source_concentration

    return source_concentration(_t(spark, sf_dir, "documents"))


@register(
    "calibration_report",
    """
    WITH scored AS (
      SELECT (doc_id * 37) % 10000 AS s,
             CASE WHEN (doc_id * 91) % 10000 <
                       least((doc_id * 37) % 10000 + 2000, 10000)
                  THEN 1 ELSE 0 END AS y
      FROM documents
    ), b AS (
      SELECT least((s * 10) // 10000, 9) AS bin, s, y FROM scored
    ), agg AS (
      SELECT bin,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(s) // COUNT(*) AS BIGINT) AS mean_score_bp,
             CAST((SUM(y) * 10000) // COUNT(*) AS BIGINT) AS pos_rate_bp
      FROM b GROUP BY 1
    )
    SELECT CAST(bin AS BIGINT) AS bin, n, mean_score_bp, pos_rate_bp,
           CAST(abs(mean_score_bp - pos_rate_bp) AS BIGINT) AS gap_bp
    FROM agg
    """,
    doc="Classifier-calibration audit (operators/quality_checks.py "
    "calibration_report): reliability-diagram bins for a basis-point "
    "score vs binary labels — mean score, observed positive rate, "
    "and their gap per equal-width bin, the n-weighted average being "
    "ECE (calibration_ece). The synthetic labels are deliberately "
    "MIScalibrated (+2000bp overconfidence, clamped) so the gap "
    "column carries signal. All integer arithmetic; one scan, one "
    "groupBy; hash-exact. A near-calibrated synthetic's small ECE is "
    "pytest-pinned.",
)
def q_calibration_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.quality_checks import calibration_report

    docs = _t(spark, sf_dir, "documents")
    scored = docs.select(
        ((F.col("doc_id") * 37) % 10000).alias("score_bp"),
        F.when(
            (F.col("doc_id") * 91) % 10000
            < F.least((F.col("doc_id") * 37) % 10000 + 2000, F.lit(10000)),
            F.lit(1),
        ).otherwise(F.lit(0)).alias("label"),
    )
    return calibration_report(scored, "score_bp", "label")


@register(
    "classifier_auc",
    """
    WITH scored AS (
      SELECT (doc_id * 37) % 10000 AS s,
             CASE WHEN (doc_id * 91) % 10000 <
                       least((doc_id * 37) % 10000 + 2000, 10000)
                  THEN 1 ELSE 0 END AS y
      FROM documents
    ), per_score AS (
      SELECT s, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS n_pos
      FROM scored GROUP BY 1
    ), ranked AS (
      SELECT n, n_pos,
             CAST(2 * SUM(n) OVER (ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n + 1
               AS BIGINT) AS avg2
      FROM per_score
    )
    SELECT CAST(SUM(n_pos) AS BIGINT) AS n_pos,
           CAST(SUM(n) - SUM(n_pos) AS BIGINT) AS n_neg,
           CAST(CASE WHEN SUM(n_pos) > 0 AND SUM(n) - SUM(n_pos) > 0 THEN
             ((SUM(n_pos * avg2) - SUM(n_pos) * (SUM(n_pos) + 1)) * 10000)
             // (2 * SUM(n_pos) * (SUM(n) - SUM(n_pos))) END AS BIGINT) AS auc_bp
    FROM ranked
    """,
    doc="Exact ROC AUC via the Mann-Whitney rank-sum identity with "
    "tie-averaged ranks (quality_checks.auc_report) — discrimination "
    "as the complement of the calibration audit, over the same "
    "synthetic score/label recipe. Doubled average ranks keep "
    "everything int64; the window runs over DISTINCT scores (the "
    "score's resolution, not corpus rows). Perfect / reversed / "
    "all-tied / single-class extremes are pytest-pinned at 10000 / 0 "
    "/ 5000 / NULL.",
)
def q_classifier_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.quality_checks import auc_report

    docs = _t(spark, sf_dir, "documents")
    scored = docs.select(
        ((F.col("doc_id") * 37) % 10000).alias("score_bp"),
        F.when(
            (F.col("doc_id") * 91) % 10000
            < F.least((F.col("doc_id") * 37) % 10000 + 2000, F.lit(10000)),
            F.lit(1),
        ).otherwise(F.lit(0)).alias("label"),
    )
    return auc_report(scored, "score_bp", "label")


@register(
    "lexical_diversity",
    """
    WITH base AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS tk
      FROM documents WHERE text IS NOT NULL
    ), m AS (
      SELECT doc_id, tk, len(tk) AS n,
             CASE WHEN len(tk) > 0
                  THEN (len(list_distinct(tk)) * 10000) // len(tk) END AS ttr_bp
      FROM base
    )
    SELECT doc_id, CAST(n AS BIGINT) AS n_tokens, CAST(ttr_bp AS BIGINT) AS ttr_bp,
           CAST(CASE WHEN n >= 25 THEN FLOOR(
               list_sum(list_transform(generate_series(1, n - 24),
                 s -> FLOOR(len(list_distinct(list_slice(tk, s, s + 24))) * 10000 / 25)))
               / (n - 24))
             ELSE ttr_bp END AS BIGINT) AS mattr_bp
    FROM m
    """,
    doc="Lexical diversity (text_analysis.lexical_diversity): raw "
    "type-token ratio plus MATTR (Covington-McFall moving-average "
    "TTR over 25-token windows — the length-bias-free form), both in "
    "basis points. Window TTRs are exact (slice + array_distinct, "
    "expression-only, no explode-shuffle); per-window floors sum "
    "exactly in doubles and the mean floors once — hash-exact. "
    "Short documents fall back to whole-document TTR. The "
    "keyword-stuffing/template signal repetition counts miss.",
)
def q_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.text_analysis import lexical_diversity

    return lexical_diversity(_tp(spark, sf_dir, "documents"), window=25)


@register(
    "corpus_datacard",
    """
    WITH base AS (
      SELECT doc_id, text, source, lang FROM documents WHERE text IS NOT NULL
    ), vol AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
             CAST(SUM(length(text)) AS BIGINT) AS total_chars,
             CAST(SUM(length(text)) // COUNT(*) AS BIGINT) AS mean_chars,
             CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
      FROM base
    ), tops AS (
      SELECT CAST((MAX(n) * 10000) // SUM(n) AS BIGINT) AS top_source_bp
      FROM (SELECT COUNT(*) AS n FROM base GROUP BY source)
    ), dup AS (
      SELECT CAST(SUM(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT) AS dup_docs,
             CAST(SUM(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_texts
      FROM (SELECT COUNT(*) AS n FROM base GROUP BY md5(text))
    ), groups AS (
      SELECT source AS g, CAST(COUNT(*) AS BIGINT) AS w FROM base GROUP BY 1
    ), ranked AS (
      SELECT g, w, CAST(ROW_NUMBER() OVER (ORDER BY w ASC, g ASC) AS BIGINT) AS i
      FROM groups WHERE w > 0
    ), t AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
             CAST(SUM(w) AS BIGINT) AS total_w,
             CAST(SUM(w * CAST(FLOOR(ln(CAST(w AS DOUBLE)) * 1000000000) AS BIGINT))
               AS BIGINT) AS swl,
             CAST(SUM(i * w) AS BIGINT) AS siw
      FROM ranked
    ), conc AS (
      SELECT (SELECT CAST(SUM(((w * 10000) // t.total_w) * ((w * 10000) // t.total_w))
                       AS BIGINT) FROM ranked, t) AS hhi_bp2,
             CAST(CAST(FLOOR(ln(CAST(t.total_w AS DOUBLE)) * 1000000000) AS BIGINT)
                  - (t.swl // t.total_w) AS BIGINT) AS entropy_fp,
             CAST(CASE WHEN t.n_groups > 1
                  THEN ((2 * t.siw - (t.n_groups + 1) * t.total_w) * 10000)
                       // (t.n_groups * t.total_w) ELSE 0 END AS BIGINT) AS gini_bp
      FROM t
    )
    SELECT u.metric, u.value FROM vol, tops, dup, conc,
    LATERAL (VALUES
      ('n_docs', n_docs), ('n_sources', n_sources),
      ('total_chars', total_chars), ('mean_chars', mean_chars),
      ('n_langs', n_langs), ('top_source_bp', top_source_bp),
      ('dup_docs', dup_docs), ('dup_texts', dup_texts),
      ('hhi_bp2', hhi_bp2), ('entropy_fp', entropy_fp),
      ('gini_bp', gini_bp)) AS u(metric, value)
    """,
    doc="The corpus data card (operators/stats.py corpus_datacard): "
    "one skinny (metric, value) frame of corpus-level facts — "
    "volume (docs/sources/chars/mean length), diversity (languages, "
    "top-source share, HHI/entropy/Gini concentration), exact "
    "duplication mass — every value int64 so the whole card "
    "hash-replays; metric is a stable key, so cards from two corpus "
    "versions diff like any keyed table. One corpus scan + the "
    "metadata-scale concentration window.",
)
def q_corpus_datacard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.stats import corpus_datacard

    return corpus_datacard(_t(spark, sf_dir, "documents"))


def _datacard_cte(src_pred: str, prefix: str) -> str:
    """One full data-card computation as chained CTEs over documents
    filtered by ``src_pred`` — instantiated twice by the diff oracle
    (names prefixed to avoid collisions)."""
    P = prefix
    return f"""
    {P}base AS (
      SELECT doc_id, text, source, lang FROM documents
      WHERE text IS NOT NULL AND ({src_pred})
    ), {P}vol AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
             CAST(SUM(length(text)) AS BIGINT) AS total_chars,
             CAST(SUM(length(text)) // COUNT(*) AS BIGINT) AS mean_chars,
             CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
      FROM {P}base
    ), {P}tops AS (
      SELECT CAST((MAX(n) * 10000) // SUM(n) AS BIGINT) AS top_source_bp
      FROM (SELECT COUNT(*) AS n FROM {P}base GROUP BY source)
    ), {P}dup AS (
      SELECT CAST(SUM(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT) AS dup_docs,
             CAST(SUM(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_texts
      FROM (SELECT COUNT(*) AS n FROM {P}base GROUP BY md5(text))
    ), {P}groups AS (
      SELECT source AS g, CAST(COUNT(*) AS BIGINT) AS w FROM {P}base GROUP BY 1
    ), {P}ranked AS (
      SELECT g, w, CAST(ROW_NUMBER() OVER (ORDER BY w ASC, g ASC) AS BIGINT) AS i
      FROM {P}groups WHERE w > 0
    ), {P}t AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
             CAST(SUM(w) AS BIGINT) AS total_w,
             CAST(SUM(w * CAST(FLOOR(ln(CAST(w AS DOUBLE)) * 1000000000) AS BIGINT))
               AS BIGINT) AS swl,
             CAST(SUM(i * w) AS BIGINT) AS siw
      FROM {P}ranked
    ), {P}conc AS (
      SELECT (SELECT CAST(SUM(((w * 10000) // {P}t.total_w) * ((w * 10000) // {P}t.total_w))
                       AS BIGINT) FROM {P}ranked, {P}t) AS hhi_bp2,
             CAST(CAST(FLOOR(ln(CAST({P}t.total_w AS DOUBLE)) * 1000000000) AS BIGINT)
                  - ({P}t.swl // {P}t.total_w) AS BIGINT) AS entropy_fp,
             CAST(CASE WHEN {P}t.n_groups > 1
                  THEN ((2 * {P}t.siw - ({P}t.n_groups + 1) * {P}t.total_w) * 10000)
                       // ({P}t.n_groups * {P}t.total_w) ELSE 0 END AS BIGINT) AS gini_bp
      FROM {P}t
    ), {P}card AS (
      SELECT u.metric, u.value FROM {P}vol, {P}tops, {P}dup, {P}conc,
      LATERAL (VALUES
        ('n_docs', n_docs), ('n_sources', n_sources),
        ('total_chars', total_chars), ('mean_chars', mean_chars),
        ('n_langs', n_langs), ('top_source_bp', top_source_bp),
        ('dup_docs', dup_docs), ('dup_texts', dup_texts),
        ('hhi_bp2', hhi_bp2), ('entropy_fp', entropy_fp),
        ('gini_bp', gini_bp)) AS u(metric, value)
    )"""


@register(
    "datacard_diff",
    f"""
    WITH {_datacard_cte("TRUE", "a_")},
    mean_len AS (
      SELECT SUM(length(text)) // COUNT(*) AS m FROM documents WHERE text IS NOT NULL
    ),
    {_datacard_cte("length(text) >= (SELECT m FROM mean_len)", "b_")}
    SELECT a.metric,
           a.value AS before_value,
           b.value AS after_value,
           CAST(b.value - a.value AS BIGINT) AS delta
    FROM a_card a JOIN b_card b USING (metric)
    """,
    doc="Data-card DIFF — what a curation pass changed, metric by "
    "metric: the card before vs after a keep-long-documents filter "
    "(threshold = mean length, sf-stable) joined on the metric key "
    "with integer deltas. This is the review artifact a filtering "
    "PR ships; the oracle instantiates the full card computation "
    "twice via a shared CTE generator so the two sides cannot "
    "drift. All int64, full-hash.",
)
def q_datacard_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.stats import corpus_datacard

    docs = _t(spark, sf_dir, "documents")
    base = docs.where(F.col("text").isNotNull())
    mean_len = base.agg(
        F.expr("sum(length(text)) div count(1)").alias("m")
    )
    filtered = base.crossJoin(F.broadcast(mean_len)).where(
        F.length("text") >= F.col("m")
    ).drop("m")
    before = corpus_datacard(base)
    after = corpus_datacard(filtered)
    return (
        before.withColumnRenamed("value", "before_value")
        .join(after.withColumnRenamed("value", "after_value"), "metric")
        .select(
            "metric",
            "before_value",
            "after_value",
            (F.col("after_value") - F.col("before_value")).cast("long").alias("delta"),
        )
    )


@register(
    "score_rank_normalize",
    """
    WITH scored AS (
      SELECT doc_id, source, CAST(n_chars AS BIGINT) AS score
      FROM documents WHERE n_chars IS NOT NULL
    ), per AS (
      SELECT doc_id, source, score,
             CAST(RANK() OVER (PARTITION BY source ORDER BY score ASC) AS BIGINT) AS rk,
             CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n
      FROM scored
    )
    SELECT doc_id, source, score,
           CAST(CASE WHEN n > 1 THEN ((rk - 1) * 10000) // (n - 1)
                ELSE 0 END AS BIGINT) AS rank_bp
    FROM per
    """,
    doc="Per-source percentile-rank score normalization "
    "(operators/normalize.py rank_normalize): the integer twin of "
    "percent_rank() — (rank-1)*10000 div (n-1) with RANK tie "
    "semantics per source — so 'keep the top 30%' means the same "
    "thing on every site instead of silently reweighting sources "
    "through one global threshold. One window per group; NULL "
    "scores pass through NULL (window NULL-ordering pitfall "
    "pytest-pinned).",
)
def q_score_rank_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.normalize import rank_normalize

    docs = _t(spark, sf_dir, "documents").where(F.col("n_chars").isNotNull())
    return rank_normalize(
        docs.select("doc_id", "source", F.col("n_chars").cast("long").alias("score")),
        "score",
        "source",
    )


@register(
    "brier_score",
    """
    WITH scored AS (
      SELECT (doc_id * 37) % 10000 AS s,
             CASE WHEN (doc_id * 91) % 10000 <
                       least((doc_id * 37) % 10000 + 2000, 10000)
                  THEN 1 ELSE 0 END AS y
      FROM documents
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM((s - 10000 * y) * (s - 10000 * y)) // COUNT(*) AS BIGINT)
             AS brier_e8
    FROM scored
    """,
    doc="Brier score (quality_checks.brier_score) — the proper "
    "scoring rule completing the filter-audit triple over the same "
    "synthetic score/label recipe as calibration_report and "
    "classifier_auc: mean squared basis-point error scaled by 1e8, "
    "pure int64 in one aggregate. Perfect / coin-flip / inverted "
    "extremes pytest-pinned at 0 / 2.5e7 / 1e8.",
)
def q_brier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.quality_checks import brier_score

    docs = _t(spark, sf_dir, "documents")
    scored = docs.select(
        ((F.col("doc_id") * 37) % 10000).alias("score_bp"),
        F.when(
            (F.col("doc_id") * 91) % 10000
            < F.least((F.col("doc_id") * 37) % 10000 + 2000, F.lit(10000)),
            F.lit(1),
        ).otherwise(F.lit(0)).alias("label"),
    )
    return brier_score(scored, "score_bp", "label")


@register(
    "media_gif_pixels",
    """
    WITH ids AS (
      SELECT doc_id AS media_id,
             4 + doc_id % 10 AS w,
             4 + (doc_id // 3) % 8 AS h
      FROM documents
    ), xs AS (
      SELECT media_id, w, h, unnest(generate_series(0, w - 1)) AS x FROM ids
    ), ys AS (
      SELECT media_id, w, h, x, unnest(generate_series(0, h - 1)) AS y FROM xs
    ), px AS (
      SELECT media_id, (media_id + x * 3 + y * 5) % 4 AS i FROM ys
    ), mapped AS (
      SELECT media_id,
             (media_id * 5 + i * 7) % 256 AS r,
             (media_id * 11 + i * 13) % 256 AS g,
             (media_id * 17 + i * 19) % 256 AS b
      FROM px
    )
    SELECT m.media_id,
           CAST(i.w AS INTEGER) AS width,
           CAST(i.h AS INTEGER) AS height,
           CAST(i.w * i.h AS BIGINT) AS n_pixels,
           CAST(SUM(r + g + b) AS BIGINT) AS pixel_sum,
           CAST(SUM(299 * r + 587 * g + 114 * b) AS BIGINT) AS luma_sum
    FROM mapped m JOIN ids i USING (media_id)
    GROUP BY 1, 2, 3, 4
    """,
    doc="FULL GIF pixel decode (multimodal.decode_gif_pixels): "
    "complete valid GIF89a fixtures whose LZW code streams are "
    "produced by a REAL spec-conformant encoder (variable-width "
    "3..12-bit codes, clear/EOI, KwKwK round-trip stress-tested), "
    "decoded end-to-end — de-sub-block, LZW dictionary decode, "
    "palette map — to the same integer pixel/Rec.601-luma contract "
    "as the PNG path. The oracle computes the sums from the "
    "closed-form palette+index recipe without touching a byte; with "
    "PNG/DEFLATE this makes TWO compressed pixel formats genuinely "
    "decoded, one with the entropy coder written out in full.",
)
def q_media_gif_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.multimodal import (
        decode_image_pixels,
        synthesize_media,
    )

    docs = _tp(spark, sf_dir, "documents")
    media = synthesize_media(
        docs.select(F.col("doc_id").alias("media_id")), variant="gif_full"
    )
    return decode_image_pixels(media)


@register(
    "schedule_compliance",
    """
    WITH log AS (
      SELECT 'h' || CAST(user_id % 7 AS VARCHAR) AS host,
             CAST(epoch_us(ts) // 1000000 AS BIGINT) AS fetched_at_s
      FROM events
    ), g AS (
      SELECT host,
             fetched_at_s - lag(fetched_at_s)
               OVER (PARTITION BY host ORDER BY fetched_at_s) AS gap
      FROM log
    )
    SELECT host,
           CAST(count(*) AS BIGINT) AS n_fetches,
           CAST(count(gap) AS BIGINT) AS n_gaps,
           CAST(min(gap) AS BIGINT) AS min_gap_s,
           CAST(SUM(CASE WHEN gap IS NOT NULL AND gap < 60 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_violations,
           CAST(MAX(CASE WHEN gap IS NOT NULL AND gap < 60 THEN 60 - gap END)
             AS BIGINT) AS worst_deficit_s
    FROM g GROUP BY host
    """,
    doc="Politeness compliance audit (operators/politeness.py "
    "schedule_compliance): consecutive-fetch gaps per host (events "
    "grouped into 7 hosts, epoch-second timestamps) checked against "
    "a 60s required delay — violation counts and the worst deficit. "
    "Gap values are diffs of the per-host SORTED timestamp multiset, "
    "so ties cannot make them nondeterministic. The monitoring "
    "counterpart of politeness_schedule: the schedule plans "
    "politeness, this proves the fleet obeyed it.",
)
def q_schedule_compliance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.politeness import schedule_compliance

    ev = _t(spark, sf_dir, "events")
    log = ev.select(
        F.concat(F.lit("h"), (F.col("user_id") % 7).cast("string")).alias("host"),
        F.expr("unix_micros(ts) div 1000000").cast("long").alias("fetched_at_s"),
    )
    return schedule_compliance(log, required_delay_s=60)


@register(
    "robots_sitemaps",
    """
    WITH robots AS (
      SELECT 'h' || (doc_id % 9) AS host,
             'User-agent: *' || chr(10) ||
             'Disallow: /x' || chr(10) ||
             'Sitemap: https://h' || (doc_id % 9) || '.ex/sitemap'
               || (doc_id % 4) || '.xml' || chr(10) ||
             CASE WHEN doc_id % 2 = 0
                  THEN 'sitemap: https://h' || (doc_id % 9) || '.ex/news.xml # note'
                  ELSE '' END AS robots_txt
      FROM documents
    ), lines AS (
      SELECT host, trim(regexp_replace(unnest(string_split(robots_txt, chr(10))),
                                       '#.*$', '')) AS l
      FROM robots
    )
    SELECT DISTINCT host,
           trim(regexp_extract(l, '^[Ss][Ii][Tt][Ee][Mm][Aa][Pp]\\s*:(.*)$', 1))
             AS sitemap_url
    FROM lines
    WHERE trim(regexp_extract(l, '^[Ss][Ii][Tt][Ee][Mm][Aa][Pp]\\s*:(.*)$', 1)) <> ''
    """,
    doc="Sitemap-directive extraction (robots.parse_sitemap_directives): "
    "robots.txt advertises its sitemaps globally (sitemaps.org "
    "protocol — the directive is NOT user-agent-scoped), so a flat "
    "case-insensitive line parse with comment stripping and "
    "duplicate collapse yields the (host, sitemap_url) discovery "
    "table that seeds build_frontier. Synthesized robots bodies "
    "cover mixed case, comments, and multi-directive hosts.",
)
def q_robots_sitemaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.robots import parse_sitemap_directives

    docs = _t(spark, sf_dir, "documents")
    nl = F.lit("\n")
    robots = docs.select(
        F.concat(F.lit("h"), (F.col("doc_id") % 9).cast("string")).alias("host"),
        F.concat(
            F.lit("User-agent: *"), nl,
            F.lit("Disallow: /x"), nl,
            F.lit("Sitemap: https://h"), (F.col("doc_id") % 9).cast("string"),
            F.lit(".ex/sitemap"), (F.col("doc_id") % 4).cast("string"),
            F.lit(".xml"), nl,
            F.when(
                F.col("doc_id") % 2 == 0,
                F.concat(
                    F.lit("sitemap: https://h"), (F.col("doc_id") % 9).cast("string"),
                    F.lit(".ex/news.xml # note"),
                ),
            ).otherwise(F.lit("")),
        ).alias("robots_txt"),
    )
    return parse_sitemap_directives(robots)


@register(
    "winsorized_prices",
    """
    WITH src AS (
      SELECT l_returnflag AS g,
             CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS v
      FROM lineitem WHERE l_extendedprice IS NOT NULL
    ), ranked AS (
      SELECT g, v,
             CAST(ROW_NUMBER() OVER (PARTITION BY g ORDER BY v ASC) AS BIGINT) AS rn,
             CAST(COUNT(*) OVER (PARTITION BY g) AS BIGINT) AS n
      FROM src
    ), marked AS (
      SELECT g, v, rn, n,
             greatest(1, (500 * n) // 10000) AS lo_rk,
             greatest(1, (9500 * n) // 10000) AS hi_rk
      FROM ranked
    ), bounds AS (
      SELECT g,
             MIN(CASE WHEN rn = lo_rk THEN v END) AS lo_bound,
             MIN(CASE WHEN rn = hi_rk THEN v END) AS hi_bound
      FROM marked GROUP BY g
    ), clipped AS (
      SELECT s.g, s.v, b.lo_bound, b.hi_bound,
             CASE WHEN s.v < b.lo_bound THEN b.lo_bound
                  WHEN s.v > b.hi_bound THEN b.hi_bound ELSE s.v END AS cv
      FROM src s JOIN bounds b USING (g)
    )
    SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(lo_bound) AS BIGINT) AS lo_bound,
           CAST(MIN(hi_bound) AS BIGINT) AS hi_bound,
           CAST(SUM(CASE WHEN v < lo_bound THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_lo,
           CAST(SUM(CASE WHEN v > hi_bound THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_hi,
           CAST(SUM(cv) // COUNT(*) AS BIGINT) AS wmean
    FROM clipped GROUP BY g
    """,
    doc="Winsorized robust mean (operators/robust.py "
    "winsorized_stats): per-returnflag price statistics with exact "
    "p5/p95 percentile-disc bounds (value at sorted position "
    "max(1, bp*n div 10000) — duplicate-safe row_number order), "
    "values clamped and the integer mean taken over the clamped "
    "column — the mean a skewed metric needs before outliers drive "
    "it. Fixed-point cents; one rank window per group plus a "
    "group-cardinality broadcast joinback; full-hash SQL replay.",
)
def q_winsorized_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.robust import winsorized_stats

    li = _t(spark, sf_dir, "lineitem")
    src = li.where(F.col("l_extendedprice").isNotNull()).select(
        F.col("l_returnflag").alias("g"),
        F.floor(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    return winsorized_stats(src, "cents", "g")


@register(
    "peak_concurrency",
    """
    WITH iv AS (
      SELECT event_type AS g,
             CAST(epoch_us(ts) // 1000000 AS BIGINT) AS s,
             CAST(epoch_us(ts) // 1000000 + 600 AS BIGINT) AS e
      FROM events
    ), deltas AS (
      SELECT g, s AS t, 1 AS d FROM iv
      UNION ALL
      SELECT g, e AS t, -1 AS d FROM iv
    ), per_t AS (
      SELECT g, t, CAST(SUM(d) AS BIGINT) AS d FROM deltas GROUP BY 1, 2
    ), cum AS (
      SELECT g, t,
             CAST(SUM(d) OVER (PARTITION BY g ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c
      FROM per_t
    )
    SELECT g, CAST(MAX(c) AS BIGINT) AS peak,
           CAST(MIN(CASE WHEN c = (SELECT MAX(c2.c) FROM cum c2 WHERE c2.g = cum.g)
                    THEN t END) AS BIGINT) AS at_ts
    FROM cum GROUP BY g
    """,
    doc="Peak interval concurrency (operators/timeseries.py "
    "peak_concurrency): events become 10-minute half-open activity "
    "intervals per type, and the classic +1/-1 boundary sweep — "
    "deltas aggregated PER TIMESTAMP before the running sum, so "
    "touching endpoints never double-count — yields each type's "
    "maximum simultaneous count and the earliest time it is reached. "
    "The window runs over boundary cardinality, not interval mass "
    "(the pair-TTL delta-encode idiom). Half-open and tie semantics "
    "pytest-pinned.",
)
def q_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.timeseries import peak_concurrency

    ev = _t(spark, sf_dir, "events")
    iv = ev.select(
        F.col("event_type").alias("g"),
        F.expr("unix_micros(ts) div 1000000").cast("long").alias("s"),
        (F.expr("unix_micros(ts) div 1000000") + 600).cast("long").alias("e"),
    )
    return peak_concurrency(iv, "s", "e", "g")


@register(
    "media_jpeg_pixels",
    """
    WITH ids AS (
      SELECT doc_id AS media_id,
             8 * (1 + doc_id % 3) AS w,
             8 * (1 + (doc_id // 3) % 2) AS h
      FROM documents
    ), blocks AS (
      SELECT media_id, w, h,
             unnest(generate_series(0, (w // 8) * (h // 8) - 1)) AS b
      FROM ids
    ), ycc AS (
      SELECT media_id, w, h,
             128 + (media_id * 7 + b * 13) % 200 - 100 AS y,
             (media_id * 5 + b * 11) % 120 - 60 AS cb,
             (media_id * 3 + b * 17) % 120 - 60 AS cr
      FROM blocks
    ), rgb AS (
      SELECT media_id, w, h,
        GREATEST(0, LEAST(255,
          y + ((91881 * cr + 32768 + 16777216) // 65536 - 256))) AS r,
        GREATEST(0, LEAST(255,
          y - ((22554 * cb + 46802 * cr + 32768 + 33554432) // 65536 - 512))) AS g,
        GREATEST(0, LEAST(255,
          y + ((116130 * cb + 32768 + 16777216) // 65536 - 256))) AS bl
      FROM ycc
    )
    SELECT media_id,
           CAST(w AS INTEGER) AS width,
           CAST(h AS INTEGER) AS height,
           CAST(w * h AS BIGINT) AS n_pixels,
           CAST(64 * SUM(r + g + bl) AS BIGINT) AS pixel_sum,
           CAST(64 * SUM(299 * r + 587 * g + 114 * bl) AS BIGINT) AS luma_sum
    FROM rgb
    GROUP BY 1, 2, 3, 4
    """,
    doc="FULL baseline-JPEG pixel decode (multimodal.decode_image_pixels"
    " / decode_jpeg_pixels, ITU-T T.81): complete valid JPEGs — real "
    "Huffman entropy-coded scans with Annex K tables in actual DHT "
    "segments, differential DC, EOB'd AC, byte unstuffing — "
    "synthesized from the doc_id recipe with DC-only blocks and an "
    "all-ones quant table so the dequant+IDCT+YCbCr->RGB cascade is "
    "integer-exact (a DC-only block IDCTs to the flat value DC/8). "
    "The oracle computes the SAME decoded RGB pixel/Rec.601 luma "
    "sums from the closed form (16.16 fixed-point color transform "
    "replicated with a nonnegative-bias //) without touching a byte, "
    "so any Huffman, predictor, dequant, IDCT, or color-math bug "
    "hash-mismatches. The general AC/IDCT path is differentially "
    "pytest-pinned (arbitrary blocks FDCT'd, entropy-coded, and "
    "reconstructed within the T.81 accuracy envelope). Closes the "
    "last first-class image stub: JPEG is the dominant web image "
    "format, and the decoder now covers PNG + GIF + JPEG pixels.",
)
def q_media_jpeg_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.multimodal import (
        decode_image_pixels,
        synthesize_media,
    )

    docs = _tp(spark, sf_dir, "documents")
    media = synthesize_media(
        docs.select(F.col("doc_id").alias("media_id")), variant="jpeg_full"
    )
    return decode_image_pixels(media)


def _ivfpq_oracle(
    n_cells: int = 16,
    n_probe: int = 4,
    n_subspaces: int = 4,
    n_codes: int = 16,
    dim: int = 64,
    k: int = 10,
) -> str:
    """Exact DuckDB twin of q_ivf_pq_topk — the full IVFADC cascade
    replayed in SQL: seed centroids, argmax-cosine cell assignment,
    element-wise residual subtraction (list_transform over an index
    list — per-element IEEE double ops, bit-identical to Spark's
    zip_with), residual seed codebooks, fixed-point L2² encode,
    n_probe cell ranking, per-cell query residual distance tables,
    int64 ADC sum."""
    sub = dim // n_subspaces
    cos_cv = _cosine_sql("e.embedding::DOUBLE[]", "c.cv")
    cos_qc = _cosine_sql("q.qv", "c.cv")

    def l2fp(a, b):
        return (
            f"CAST(FLOOR((list_dot_product({a}, {a}) - 2 * list_dot_product({a}, {b})"
            f" + list_dot_product({b}, {b})) * 10000000) AS BIGINT)"
        )

    return f"""
    WITH ms AS (
      SELECT unnest(generate_series(0, {n_subspaces - 1})) AS m
    ), cent AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id ASC) - 1 AS INT) AS cell_id,
             embedding::DOUBLE[] AS cv
      FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id ASC LIMIT {n_cells})
    ), q AS (
      SELECT embedding::DOUBLE[] AS qv FROM embeddings ORDER BY vec_id LIMIT 1
    ), assigned AS (
      SELECT vec_id, v, cell_id FROM (
        SELECT e.vec_id, e.embedding::DOUBLE[] AS v, c.cell_id,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                  ORDER BY {cos_cv} DESC, c.cell_id ASC) AS rk
        FROM embeddings e CROSS JOIN cent c
      ) WHERE rk = 1
    ), res AS (
      SELECT a.vec_id, a.cell_id,
             list_transform(generate_series(1, {dim}), i -> a.v[i] - c.cv[i]) AS rv
      FROM assigned a JOIN cent c USING (cell_id)
    ), cb_src AS (
      SELECT vec_id, rv FROM res ORDER BY vec_id LIMIT {n_codes}
    ), cb0 AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS code, rv
      FROM cb_src
    ), cb AS (
      SELECT code, m, rv[(m*{sub}+1):(m*{sub}+{sub})] AS cv
      FROM cb0 CROSS JOIN ms
    ), corpus AS (
      SELECT vec_id, cell_id, m, rv[(m*{sub}+1):(m*{sub}+{sub})] AS sv
      FROM res CROSS JOIN ms
    ), l2 AS (
      SELECT c.vec_id, c.cell_id, c.m, b.code, {l2fp('c.sv', 'b.cv')} AS fp
      FROM corpus c JOIN cb b USING (m)
    ), enc AS (
      SELECT vec_id, cell_id, m, code FROM (
        SELECT vec_id, cell_id, m, code,
               ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY fp, code) AS rk
        FROM l2
      ) WHERE rk = 1
    ), qcells AS (
      SELECT cell_id, cv FROM (
        SELECT c.cell_id, c.cv, {cos_qc} AS csim FROM q CROSS JOIN cent c
      ) ORDER BY csim DESC, cell_id ASC LIMIT {n_probe}
    ), qres AS (
      SELECT qc.cell_id,
             list_transform(generate_series(1, {dim}), i -> q.qv[i] - qc.cv[i]) AS qr
      FROM q CROSS JOIN qcells qc
    ), qm AS (
      SELECT cell_id, m, qr[(m*{sub}+1):(m*{sub}+{sub})] AS sv
      FROM qres CROSS JOIN ms
    ), dt AS (
      SELECT qm.cell_id, b.m, b.code, {l2fp('qm.sv', 'b.cv')} AS qfp
      FROM qm JOIN cb b USING (m)
    )
    SELECT e.vec_id, CAST(SUM(d.qfp) AS BIGINT) AS adc_fp
    FROM enc e JOIN dt d
      ON e.cell_id = d.cell_id AND e.m = d.m AND e.code = d.code
    GROUP BY e.vec_id
    ORDER BY adc_fp ASC, e.vec_id ASC LIMIT {k}
    """


@register(
    "ivf_pq_topk",
    _ivfpq_oracle(),
    doc="IVF-PQ composite ANN (similarity.ivf_pq_topk — the FAISS "
    "IVFADC production shape, Jégou et al. TPAMI'11 §V): coarse IVF "
    "cells prune the search to n_probe/n_cells of the index, and the "
    "pruned scan reads RESIDUAL product-quantization codes scored by "
    "ADC (per-cell distance tables over the query residual) — at "
    "100 TB the scan is n_probe cell partitions of 4-small-int rows, "
    "never float vectors (write_ivfpq_index partitions the codes by "
    "cell, pruning pytest-verified via PartitionFilters). Residual "
    "encoding is what lets ONE shared codebook cover all cells. "
    "Deterministic end to end — double zip_with residuals, "
    "fixed-point L2² per table entry, int64 ADC — so the whole "
    "cascade (assign -> residual -> encode -> probe -> per-cell "
    "tables -> ADC rank) hash-replays in SQL; recall vs exact top-k "
    "pytest-pinned on a clustered fixture. Lloyd's training for both "
    "quantizers slots in via train_iterations without changing the "
    "query shape.",
)
def q_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.similarity import ivf_pq_topk

    emb = _t(spark, sf_dir, "embeddings")
    query = emb.orderBy("vec_id").limit(1).select(F.col("embedding").alias("qv"))
    return ivf_pq_topk(emb, query, k=10)


#: deterministic multi-line injection — the driver's synthetic texts
#: carry no newlines or punctuation, which would leave C4's line
#:  filter unexercised; both engines append the SAME id-keyed lines
#: (kept sentence / short line / brace page / lorem page).
_C4_INJECT_SQL = (
    "text || CASE doc_id % 5"
    " WHEN 0 THEN chr(10) || 'This is a proper sentence with enough words here.'"
    "   || chr(10) || 'short line.'"
    "   || chr(10) || 'Another full sentence that also ends with punctuation today!'"
    "   || chr(10) || 'And a third complete sentence closes out the page nicely.'"
    " WHEN 1 THEN chr(10) || 'nav menu home about contact'"
    "   || chr(10) || 'One single proper sentence with enough words here.'"
    " WHEN 2 THEN chr(10) || 'var x = { a: 1 } and some trailing words to read.'"
    " WHEN 3 THEN chr(10) || 'Lorem ipsum dolor sit amet is the classic filler text.'"
    " ELSE '' END"
)


def _c4_oracle() -> str:
    from pasta_pipeline_spark.operators.quality_filters import c4_line_clean_sql

    inner = c4_line_clean_sql("src", "doc_id", "t").replace(
        "WITH base AS", ", base AS", 1
    )
    return f"WITH src AS (SELECT doc_id, {_C4_INJECT_SQL} AS t FROM documents)\n{inner}"


def _c4_inject_spark():
    """Spark twin of _C4_INJECT_SQL — the same id-keyed multi-line
    injection, shared by every line-level query."""
    nl = "\n"
    return F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.lit(
                nl + "This is a proper sentence with enough words here."
                + nl + "short line."
                + nl + "Another full sentence that also ends with punctuation today!"
                + nl + "And a third complete sentence closes out the page nicely."
            ),
        )
        .when(
            F.col("doc_id") % 5 == 1,
            F.lit(
                nl + "nav menu home about contact"
                + nl + "One single proper sentence with enough words here."
            ),
        )
        .when(
            F.col("doc_id") % 5 == 2,
            F.lit(nl + "var x = { a: 1 } and some trailing words to read."),
        )
        .when(
            F.col("doc_id") % 5 == 3,
            F.lit(nl + "Lorem ipsum dolor sit amet is the classic filler text."),
        )
        .otherwise(F.lit("")),
    )


@register(
    "c4_line_clean",
    _c4_oracle(),
    doc="C4 line-level cleaning (quality_filters.c4_line_clean, Raffel "
    "et al. 2020 §2.2): keep lines ending in terminal punctuation with "
    ">= 5 words, then page verdicts — no 'lorem ipsum', no '{', >= 3 "
    "sentences in the CLEANED text — the famous line tier BELOW the "
    "gopher_rules page table (navigation crumbs and cookie banners "
    "die per line; template pages per page). One projection, nested "
    "higher-order functions, no explode/shuffle; the oracle SQL is "
    "generated from the same constants so thresholds cannot drift; "
    "cleaned text itself is part of the hash.",
)
def q_c4_line_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.quality_filters import c4_line_clean

    docs = _tp(spark, sf_dir, "documents")
    src = docs.select("doc_id", _c4_inject_spark().alias("t"))
    return c4_line_clean(src, "doc_id", "t")


@register(
    "robots_refetch",
    """
    WITH hosts AS (
      SELECT DISTINCT 'h' || CAST(doc_id % 9 AS VARCHAR) || '.example' AS host
      FROM documents
    ), cache AS (
      SELECT 'h' || CAST(doc_id % 9 AS VARCHAR) || '.example' AS host,
             CAST(1000 + (doc_id * 37) % 500 AS BIGINT) AS fetched_at_s
      FROM documents WHERE doc_id % 9 < 6
    ), latest AS (
      SELECT host, MAX(fetched_at_s) AS last_fetch_s FROM cache GROUP BY host
    )
    SELECT h.host, l.last_fetch_s,
           CAST(1600 - l.last_fetch_s AS BIGINT) AS age_s,
           (l.last_fetch_s IS NULL OR 1600 - l.last_fetch_s > 300) AS stale
    FROM hosts h LEFT JOIN latest l USING (host)
    """,
    doc="robots.txt cache staleness audit (robots.robots_refetch_list, "
    "RFC 9309 §2.4 '24 hours' caching): which frontier hosts need a "
    "robots (re)fetch before the next wave — never-fetched hosts and "
    "entries older than max_age. Completes the crawl stack's "
    "admission-is-current contract: robots_verdict assumes fresh "
    "rules; this is what keeps them fresh. Host-cardinality frames, "
    "one broadcast-friendly left join, full-hash replay.",
)
def q_robots_refetch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.robots import robots_refetch_list

    docs = _t(spark, sf_dir, "documents")
    hosts = docs.select(
        F.concat(F.lit("h"), (F.col("doc_id") % 9).cast("string"), F.lit(".example")).alias("host")
    )
    cache = docs.where(F.col("doc_id") % 9 < 6).select(
        F.concat(F.lit("h"), (F.col("doc_id") % 9).cast("string"), F.lit(".example")).alias("host"),
        (F.lit(1000) + (F.col("doc_id") * 37) % 500).cast("long").alias("fetched_at_s"),
    )
    return robots_refetch_list(hosts, cache, now_s=1600, max_age_s=300)


@register(
    "recrawl_schedule",
    """
    WITH obs AS (
      SELECT 'https://e.example/p' || CAST(event_id % 50 AS VARCHAR) AS url,
             CAST(epoch_us(ts) // 1000000 AS BIGINT) AS lastmod_s
      FROM events
    ), agg AS (
      SELECT url,
             CAST(COUNT(DISTINCT lastmod_s) AS BIGINT) AS n_obs,
             MIN(lastmod_s) AS first_s,
             MAX(lastmod_s) AS last_s
      FROM obs GROUP BY url
    ), est AS (
      SELECT url, n_obs, last_s,
             CASE WHEN n_obs >= 2
                  THEN GREATEST((last_s - first_s) // (n_obs - 1), 3600)
                  ELSE 604800 END AS interval_s
      FROM agg
    )
    SELECT url, n_obs,
           CAST(last_s AS BIGINT) AS last_change_s,
           CAST(interval_s AS BIGINT) AS interval_s,
           CAST(last_s + interval_s AS BIGINT) AS next_due_s,
           (last_s + interval_s) <= 1500000000 AS due_now
    FROM est
    """,
    doc="Change-rate recrawl scheduling (sitemaps.recrawl_schedule): "
    "per-URL mean change interval from the observed lastmod trail "
    "(span div (n_obs-1), the uniform-rate estimator a Poisson change "
    "model reduces to), politeness-floored, with next-due timestamps "
    "and a due-now verdict — the freshness economics of a 100 TB "
    "crawl (daily refetch wastes budget on dead pages; rate "
    "estimation fixes it). One groupBy over the observation history, "
    "URL-cardinality output, pure integer arithmetic, full-hash "
    "replay.",
)
def q_recrawl_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.sitemaps import recrawl_schedule

    ev = _t(spark, sf_dir, "events")
    obs = ev.select(
        F.concat(F.lit("https://e.example/p"), (F.col("event_id") % 50).cast("string")).alias("url"),
        F.expr("unix_micros(ts) div 1000000").cast("long").alias("lastmod_s"),
    )
    return recrawl_schedule(obs, now_s=1_500_000_000)


@register(
    "url_spam_features",
    """
    WITH urls AS (
      SELECT doc_id,
             'https://sub' || CAST(doc_id % 3 AS VARCHAR) || '.h' ||
             CAST(doc_id % 97 AS VARCHAR) ||
             repeat('-a', doc_id % 4) || '.example.com/p/x/' ||
             CAST(doc_id AS VARCHAR) ||
             CASE WHEN doc_id % 4 = 0 THEN '?a=1&b=%20x&c=%2Fy' ELSE '' END AS url
      FROM documents
    ), parts AS (
      SELECT doc_id, url,
             regexp_replace(regexp_replace(
               lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)),
               '^[^@]*@', ''), ':[0-9]+$', '') AS host,
             regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+(/[^?#]*)', 1) AS path,
             regexp_extract(url, '\\?([^#]*)', 1) AS q
      FROM urls
    ), feats AS (
      SELECT doc_id, url, host,
             CAST(length(host) AS BIGINT) AS host_len,
             CAST(length(host) - length(regexp_replace(host, '[0-9]', '', 'g')) AS BIGINT) AS n_host_digits,
             CAST(length(host) - length(regexp_replace(host, '-', '', 'g')) AS BIGINT) AS n_host_hyphens,
             CAST(CASE WHEN host = '' THEN 0 ELSE len(str_split(host, '.')) END AS BIGINT) AS n_labels,
             CAST(length(path) - length(regexp_replace(path, '/', '', 'g')) AS BIGINT) AS path_depth,
             CAST(CASE WHEN q = '' THEN 0 ELSE len(str_split(q, '&')) END AS BIGINT) AS n_params,
             CAST(len(regexp_extract_all(url, '%[0-9A-Fa-f][0-9A-Fa-f]')) AS BIGINT) AS n_pct
      FROM parts
    )
    SELECT doc_id, url, host, host_len, n_host_digits, n_host_hyphens,
           n_labels, path_depth, n_params, n_pct,
           CAST(2 * n_host_digits + 3 * n_host_hyphens
                + CASE WHEN n_labels > 4 THEN 5 ELSE 0 END
                + CASE WHEN host_len > 40 THEN 5 ELSE 0 END
                + n_params + 2 * n_pct AS BIGINT) AS spam_points
    FROM feats
    """,
    doc="URL spam/trap heuristics for frontier prioritization "
    "(functions/urls.url_features, IRLbot-style): digit- and "
    "hyphen-stuffed hosts, deep subdomain chains, long hosts, "
    "parameter farms, heavy percent-encoding — integer feature "
    "columns + a weighted spam_points score a crawl budget can rank "
    "on before any content exists. Host extracted by PORTABLE regex "
    "(not engine URL functions) so the SQL twin is exact; pure "
    "expressions, one projection, weights shared via module "
    "constants.",
)
def q_url_spam_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.functions.urls import url_features

    docs = _t(spark, sf_dir, "documents")
    urls = docs.select(
        "doc_id",
        F.concat(
            F.lit("https://sub"), (F.col("doc_id") % 3).cast("string"),
            F.lit(".h"), (F.col("doc_id") % 97).cast("string"),
            F.expr("repeat('-a', CAST(doc_id % 4 AS INT))"),
            F.lit(".example.com/p/x/"), F.col("doc_id").cast("string"),
            F.when(F.col("doc_id") % 4 == 0, F.lit("?a=1&b=%20x&c=%2Fy")).otherwise(F.lit("")),
        ).alias("url"),
    )
    return url_features(urls, "url")


@register(
    "prefix_jaccard_pairs",
    _JACCARD_ORACLE,
    doc="Dedup tier 3b — the SAME exact 3-gram Jaccard >= 0.5 contract "
    "as ngram_jaccard_pairs, via PREFIX FILTERING (Chaudhuri/"
    "Bayardo/Xiao PPJoin lineage): tokens globally ordered by "
    "ascending document frequency, only each set's |x|-ceil(t|x|)+1 "
    "prefix indexed and joined (rare tokens generate the candidates; "
    "hot boilerplate shingles never do), conservative-integer prefix "
    "and length bounds so float rounding can never lose a pair, then "
    "exact intersection verify over candidate sets only. The better "
    "candidate generator at 100 TB — the inverted index's cost tracks "
    "its HOTTEST key, prefix filtering's tracks its rarest. Shares "
    "the brute-force oracle (two algorithms, one contract); "
    "equivalence with jaccard_pairs also pytest-pinned.",
)
def q_prefix_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.text_dedup import prefix_jaccard_pairs

    docs = _t(spark, sf_dir, "documents")
    return prefix_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5)


# ---------------------------------------------------------------------------
# DSIR importance-resampling data selection (extension §2.12, r6)
# ---------------------------------------------------------------------------


def _dsir_oracle() -> str:
    from pasta_pipeline_spark.operators.dsir import dsir_oracle_sql

    return dsir_oracle_sql(
        target_where="source IN ('src0', 'src1', 'src2', 'src3')", k=100
    )


@register(
    "dsir_selection",
    None,  # generated below — single source of truth in operators/dsir.py
    doc="DSIR data selection (operators/dsir.py, Xie et al. arXiv:"
    "2302.03169): hashed bag-of-words importance weights — add-one-"
    "smoothed bucket multinomials fit on a target slice vs the raw "
    "corpus, per-doc log-likelihood ratio in fixed-point ln (order-"
    "free int64), deterministic top-k (zero-temperature resampling). "
    "Model state is m=4096 buckets regardless of corpus size; the "
    "only fact-scale shuffle is the per-doc aggregation; global top-k "
    "via TakeOrderedAndProject. Oracle generated from the same "
    "constants (playbook #11). No reference analog — public "
    "literature.",
)
def q_dsir_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.dsir import dsir_select

    docs = _tp(spark, sf_dir, "documents")
    return dsir_select(
        docs, F.col("source").isin("src0", "src1", "src2", "src3"), k=100
    )


REGISTRY["dsir_selection"] = QuerySpec(
    spark_fn=REGISTRY["dsir_selection"].spark_fn,
    oracle=_dsir_oracle(),
    doc=REGISTRY["dsir_selection"].doc,
)


def _greedy_pack_oracle() -> str:
    from pasta_pipeline_spark.operators.sampling import greedy_pack_oracle_sql

    return greedy_pack_oracle_sql(
        table="documents",
        id_col="doc_id",
        size_sql="len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> ''))",
        budget=256,
        group_col="source",
    )


@register(
    "greedy_pack",
    None,  # generated below — single source of truth in operators/sampling.py
    doc="NO-SPLIT greedy sequence packing (operators/sampling.py "
    "greedy_pack; Ding et al. arXiv:2404.10830 motivation): documents "
    "packed whole into 256-token context windows per source shard, "
    "next-fit with reset — a cumulative sum WITH RESET, the textbook "
    "not-window-expressible recurrence, run as ONE sanctioned Arrow "
    "applyInPandas per shard (state = one (fill,pack) pair) and "
    "replayed exactly by a per-group recursive CTE in the oracle. "
    "Oversize docs isolate; empty docs occupy zero width.",
)
def q_greedy_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.functions.text import tokenize_ws
    from pasta_pipeline_spark.operators.sampling import greedy_pack

    docs = _t(spark, sf_dir, "documents").withColumn(
        "__n_tok", F.size(tokenize_ws(F.col("text")))
    )
    return greedy_pack(docs, "doc_id", "__n_tok", budget=256, group_col="source")


REGISTRY["greedy_pack"] = QuerySpec(
    spark_fn=REGISTRY["greedy_pack"].spark_fn,
    oracle=_greedy_pack_oracle(),
    doc=REGISTRY["greedy_pack"].doc,
)


@register(
    "perplexity_buckets",
    """
    WITH tok AS (
      SELECT doc_id,
             unnest(list_transform(
               list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> ''),
               x -> lower(x))) AS token
      FROM documents WHERE text IS NOT NULL
    ), c AS (
      SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY token
    ), tt AS (
      SELECT CAST(SUM(cnt) AS BIGINT) AS T FROM c
    ), pd AS (
      SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(SUM(CAST(FLOOR(ln(CAST(c.cnt AS DOUBLE)) * 1000000000) AS BIGINT)) AS BIGINT) AS s
      FROM tok t JOIN c USING (token) GROUP BY t.doc_id
    ), nll AS (
      SELECT doc_id, n_tokens,
             CAST((n_tokens * CAST(FLOOR(ln(CAST(T AS DOUBLE)) * 1000000000) AS BIGINT) - s)
                  // n_tokens AS BIGINT) AS nll_fp
      FROM pd CROSS JOIN tt
    )
    SELECT d.doc_id, d.lang, n.n_tokens, n.nll_fp,
           CASE ntile(3) OVER (PARTITION BY d.lang ORDER BY n.nll_fp ASC, d.doc_id ASC)
                WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
    FROM documents d JOIN nll n USING (doc_id)
    """,
    doc="CCNet perplexity tiering (operators/text_analysis.py "
    "perplexity_buckets; Wenzek et al. arXiv:1911.00359): per-language "
    "head/middle/tail thirds by the corpus-fit unigram LM score — "
    "ntile(3) over a TOTAL order (nll_fp, doc_id) so the cut is "
    "deterministic and engine-identical; one per-language window "
    "shuffle, no global sort.",
)
def q_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.text_analysis import perplexity_buckets

    return perplexity_buckets(_tp(spark, sf_dir, "documents"))


def _curation_funnel_oracle() -> str:
    from pasta_pipeline_spark.operators.quality_filters import curation_funnel_sql

    return curation_funnel_sql()


@register(
    "curation_funnel",
    None,  # generated below — single source of truth in operators/quality_filters.py
    doc="Curation-funnel attrition report (operators/quality_filters.py "
    "curation_funnel): the FineWeb/RefinedWeb-style ablation table — "
    "per stage (non_empty -> Gopher word bounds -> full Gopher "
    "conjunction -> exact-dup survivor) documents in / out / dropped, "
    "as CUMULATIVE conjunctions so the report reads as the pipeline "
    "executes. One scan + one conditional aggregate; 4-row metadata "
    "output inlined from the scalar row; oracle generated from the "
    "same gopher SQL builder.",
)
def q_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.quality_filters import curation_funnel

    return curation_funnel(_tp(spark, sf_dir, "documents"))


REGISTRY["curation_funnel"] = QuerySpec(
    spark_fn=REGISTRY["curation_funnel"].spark_fn,
    oracle=_curation_funnel_oracle(),
    doc=REGISTRY["curation_funnel"].doc,
)


def _ks_drift_oracle() -> str:
    from pasta_pipeline_spark.operators.divergence import ks_drift_oracle_sql

    return ks_drift_oracle_sql(
        table="documents",
        value_sql="n_chars",
        group_a_where="source IN ('src0','src1','src2','src3','src4',"
        "'src5','src6','src7','src8','src9')",
    )


@register(
    "length_drift_ks",
    None,  # generated below — single source of truth in operators/divergence.py
    doc="EXACT two-sample Kolmogorov-Smirnov drift statistic "
    "(operators/divergence.py ks_drift): did the document-length "
    "distribution move between two corpus slices? Sup-distance "
    "evaluated at observed values with CROSS-MULTIPLIED integer "
    "ECDFs (|ca*n_b - cb*n_a| — no doubles to diverge), smallest "
    "argmax as deterministic tie-break, ks_fp in basis points via "
    "integer div. Cumulative window runs over the DISTINCT-value "
    "frame only (metadata scale), never the fact table.",
)
def q_length_drift_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.divergence import ks_drift

    docs = _t(spark, sf_dir, "documents")
    pred = F.col("source").isin(*[f"src{i}" for i in range(10)])
    return ks_drift(docs, "n_chars", pred)


REGISTRY["length_drift_ks"] = QuerySpec(
    spark_fn=REGISTRY["length_drift_ks"].spark_fn,
    oracle=_ks_drift_oracle(),
    doc=REGISTRY["length_drift_ks"].doc,
)


@register(
    "balanced_label_sample",
    """
    WITH counts AS (
      SELECT label, CAST(count(*) AS BIGINT) AS c FROM embeddings GROUP BY label
    ), floor_row AS (
      SELECT CAST(MIN(c) AS BIGINT) AS m FROM counts
    ), ranked AS (
      SELECT vec_id, label,
             CAST(row_number() OVER (
               PARTITION BY label
               ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC
             ) AS BIGINT) AS rk
      FROM embeddings
    )
    SELECT vec_id, label, rk
    FROM ranked CROSS JOIN floor_row
    WHERE rk <= m
    """,
    doc="Class-balanced downsampling (operators/sampling.py "
    "balanced_label_sample): every label keeps exactly min(class "
    "count) rows, survivors chosen in md5-shuffled order (id "
    "tiebreak) so the take is deterministic, engine-identical, and "
    "uncorrelated with data columns. Min count is a 1-row broadcast "
    "scalar; one per-label rank window is the only fact shuffle.",
)
def q_balanced_label_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.sampling import balanced_label_sample

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "label")
    return balanced_label_sample(emb, "vec_id", "label").select(
        "vec_id", "label", "rk"
    )


def _pack_efficiency_oracle() -> str:
    from pasta_pipeline_spark.operators.sampling import greedy_pack_oracle_sql

    inner = greedy_pack_oracle_sql(
        table="documents",
        id_col="doc_id",
        size_sql="len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> ''))",
        budget=256,
        group_col="source",
    )
    return f"""
    WITH packed_out AS ({inner}),
    per_pack AS (
      SELECT source, pack_id,
             CAST(SUM(n_units) AS BIGINT) AS pack_units,
             CAST(count(*) AS BIGINT) AS n_docs
      FROM packed_out GROUP BY source, pack_id
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_packs,
           CAST(SUM(n_docs) AS BIGINT) AS n_docs,
           CAST(SUM(pack_units) AS BIGINT) AS total_units,
           CAST(SUM(CASE WHEN pack_units < 256 THEN 256 - pack_units ELSE 0 END) AS BIGINT) AS padding_units,
           CAST(SUM(CASE WHEN pack_units > 256 THEN 1 ELSE 0 END) AS BIGINT) AS n_oversize,
           CAST(SUM(pack_units) * 10000 // (count(*) * 256) AS BIGINT) AS efficiency_bp
    FROM per_pack GROUP BY source
    """


@register(
    "pack_efficiency",
    None,  # generated below — single source of truth in operators/sampling.py
    doc="Packing-efficiency report over greedy_pack output (the metric "
    "Ding et al. 2404.10830 grade packing on): per source shard, "
    "packs / docs / payload units / padding waste / oversize count "
    "and occupancy in basis points — integer arithmetic end-to-end "
    "on top of the same Arrow packing stage and recursive-CTE oracle.",
)
def q_pack_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.functions.text import tokenize_ws
    from pasta_pipeline_spark.operators.sampling import greedy_pack

    docs = _t(spark, sf_dir, "documents").withColumn(
        "__n_tok", F.size(tokenize_ws(F.col("text")))
    )
    packed = greedy_pack(docs, "doc_id", "__n_tok", budget=256, group_col="source")
    per_pack = packed.groupBy("source", "pack_id").agg(
        F.sum("n_units").cast("long").alias("pack_units"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
    )
    return per_pack.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_packs"),
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.sum("pack_units").cast("long").alias("total_units"),
        F.sum(F.when(F.col("pack_units") < 256, 256 - F.col("pack_units")).otherwise(0))
        .cast("long")
        .alias("padding_units"),
        F.sum(F.when(F.col("pack_units") > 256, 1).otherwise(0))
        .cast("long")
        .alias("n_oversize"),
        F.expr("CAST(SUM(pack_units) * 10000 div (count(1) * 256) AS BIGINT)").alias(
            "efficiency_bp"
        ),
    )


REGISTRY["pack_efficiency"] = QuerySpec(
    spark_fn=REGISTRY["pack_efficiency"].spark_fn,
    oracle=_pack_efficiency_oracle(),
    doc=REGISTRY["pack_efficiency"].doc,
)


def _jl_projection_oracle() -> str:
    from pasta_pipeline_spark.operators.similarity import jl_project_oracle_sql

    return jl_project_oracle_sql("embeddings", "vec_id", "embedding")


@register(
    "jl_projection",
    None,  # generated below — single source of truth in operators/similarity.py
    doc="Johnson-Lindenstrauss sign projection (operators/similarity.py "
    "jl_project; Achlioptas 2003 Rademacher form): 64-dim embeddings "
    "to 16 int64 components via an md5-derived plan-literal +-1 "
    "matrix — the cheap dim-reduction tier in front of ANN and "
    "clustering. PURE per-row expressions: no shuffle, no join, no "
    "UDF; fixed-point floor keeps both engines bit-identical; oracle "
    "generated from the same sign matrix.",
)
def q_jl_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.similarity import jl_project

    emb = _tp(spark, sf_dir, "embeddings")
    return jl_project(emb, "vec_id", "embedding")


REGISTRY["jl_projection"] = QuerySpec(
    spark_fn=REGISTRY["jl_projection"].spark_fn,
    oracle=_jl_projection_oracle(),
    doc=REGISTRY["jl_projection"].doc,
)


def _bm25_oracle() -> str:
    from pasta_pipeline_spark.operators.search import bm25_oracle_sql

    return bm25_oracle_sql(["spark", "join", "window"], k=10)


@register(
    "bm25_topk",
    None,  # generated below — single source of truth in operators/search.py
    doc="Okapi BM25 top-k retrieval (operators/search.py bm25_topk; "
    "Robertson & Zaragoza 2009): the production keyword-search "
    "scoring function as one declarative plan — query-term posting "
    "lists are the only fact rows shuffled, doc-frequency and corpus "
    "totals ride in as broadcasts, per-term contributions FLOOR to "
    "int64 before the per-doc sum (order-free, hash-exact; shared "
    "formula string renders into both engines), global top-k via "
    "TakeOrderedAndProject.",
)
def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.search import bm25_topk

    docs = _tp(spark, sf_dir, "documents")
    return bm25_topk(docs, ["spark", "join", "window"], k=10)


REGISTRY["bm25_topk"] = QuerySpec(
    spark_fn=REGISTRY["bm25_topk"].spark_fn,
    oracle=_bm25_oracle(),
    doc=REGISTRY["bm25_topk"].doc,
)


def _phrase_search_oracle() -> str:
    from pasta_pipeline_spark.operators.search import phrase_search_oracle_sql

    return phrase_search_oracle_sql(["window", "data"])


@register(
    "phrase_search",
    None,  # generated below — single source of truth in operators/search.py
    doc="Exact positional phrase search (operators/search.py "
    "phrase_search): consecutive in-order term matching via set-based "
    "slot alignment — every occurrence rebases to its would-be phrase "
    "start and an occurrence exists where all distinct slots check in "
    "(duplicate-term phrases handled). One posexplode scan filtered "
    "to the phrase's posting lists; plan size independent of phrase "
    "length.",
)
def q_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.search import phrase_search

    docs = _tp(spark, sf_dir, "documents")
    return phrase_search(docs, ["window", "data"])


REGISTRY["phrase_search"] = QuerySpec(
    spark_fn=REGISTRY["phrase_search"].spark_fn,
    oracle=_phrase_search_oracle(),
    doc=REGISTRY["phrase_search"].doc,
)


@register(
    "event_cusum",
    """
    WITH pb AS (
      -- NB: cast to BIGINT BEFORE the //: DuckDB's // on a DOUBLE is
      -- plain division (not floor div) and the outer CAST would ROUND
      SELECT event_type, CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400 AS bucket,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ), kf AS (
      SELECT event_type, bucket, x,
             CAST((SUM(x) OVER (PARTITION BY event_type) * 10000)
                  // COUNT(x) OVER (PARTITION BY event_type) AS BIGINT) AS k_fp
      FROM pb
    ), cum AS (
      SELECT event_type, bucket,
             CAST(SUM(x * 10000 - k_fp) OVER (PARTITION BY event_type
                  ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c_fp
      FROM kf
    ), s AS (
      SELECT event_type, bucket,
             CAST(c_fp - least(MIN(c_fp) OVER (PARTITION BY event_type
                  ORDER BY bucket ROWS UNBOUNDED PRECEDING), 0) AS BIGINT) AS s_fp
      FROM cum
    ), peak AS (
      SELECT event_type, CAST(MAX(s_fp) AS BIGINT) AS s_max_fp,
             CAST(count(*) AS BIGINT) AS n_buckets
      FROM s GROUP BY event_type
    )
    SELECT s.event_type, n_buckets, s_max_fp,
           CAST(MIN(bucket) AS BIGINT) AS bucket_at_max
    FROM s JOIN peak ON s.event_type = peak.event_type AND s.s_fp = peak.s_max_fp
    GROUP BY s.event_type, n_buckets, s_max_fp
    """,
    doc="CUSUM drift chart over daily event volumes (operators/"
    "anomaly.py cusum_drift; Page 1954): the upward-drift detector an "
    "ingest monitor runs per event type. The max(0, S+y) recurrence "
    "is evaluated in CLOSED FORM — running cumsum minus running min — "
    "so two stacked windows replace what looks like a sequential "
    "reset; allowance defaults to the per-group mean in fixed point; "
    "pure int64 end-to-end. Windows partition by event type over "
    "bucket-scale series.",
)
def q_event_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.anomaly import cusum_drift

    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.expr("CAST(ts AS LONG) div 86400").cast("long").alias("day"),
        F.lit(1).cast("long").alias("one"),
    )
    return cusum_drift(ev, "day", "one", ["event_type"])


@register(
    "kwic_snippets",
    """
    WITH toks AS (
      SELECT doc_id,
             list_transform(
               list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> ''),
               x -> lower(x)) AS t
      FROM documents WHERE text IS NOT NULL
    ), posed AS (
      SELECT doc_id, unnest(generate_series(1, len(t))) AS pos, t FROM toks
    ), terms AS (
      SELECT doc_id, pos, t[pos] AS term FROM posed
    ), slotted AS (
      SELECT doc_id, pos,
             unnest(list_filter([CASE WHEN term = 'window' THEN 0 END,
                                 CASE WHEN term = 'data' THEN 1 END],
                                x -> x IS NOT NULL)) AS i
      FROM terms WHERE term IN ('window', 'data')
    ), m AS (
      SELECT doc_id, pos - i AS start, i FROM slotted WHERE pos - i >= 1
    ), occ AS (
      SELECT doc_id, start FROM m
      GROUP BY doc_id, start HAVING count(DISTINCT i) = 2
    ), hits AS (
      SELECT doc_id, CAST(MIN(start) AS BIGINT) AS first_pos FROM occ GROUP BY doc_id
    )
    SELECT h.doc_id, h.first_pos,
           array_to_string(
             list_slice(tk.t, greatest(h.first_pos - 3, 1), h.first_pos + 3),
             ' ') AS snippet
    FROM hits h JOIN toks tk USING (doc_id)
    """,
    doc="Keyword-in-context snippets (operators/search.py "
    "kwic_snippets) over phrase_search hits for 'window data': the "
    "search results page as an operator — hits (small side) broadcast "
    "back onto the corpus, token-window slice with a greatest() clamp "
    "(Spark slice throws on start<=0), space-join. NOTE the snippet "
    "is over the LOWERCASED token stream (the index's view).",
)
def q_kwic_snippets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.functions.text import tokenize_ws
    from pasta_pipeline_spark.operators.search import kwic_snippets, phrase_search

    docs = _tp(spark, sf_dir, "documents")
    hits = phrase_search(docs, ["window", "data"])
    lowered = docs.select("doc_id", F.array_join(tokenize_ws(F.col("text")), " ").alias("text"))
    return kwic_snippets(lowered, hits)


@register(
    "media_flac_samples",
    """
    WITH ids AS (
      SELECT doc_id AS media_id,
             32 + (doc_id % 5) * 8 AS n,
             doc_id % 3 AS v
      FROM documents
    ), const AS (
      SELECT media_id, n, (media_id % 3001) - 1500 AS c FROM ids WHERE v = 0
    ), samp AS (
      SELECT media_id, n, unnest(generate_series(0, n - 1)) AS i
      FROM ids WHERE v <> 0
    ), vals AS (
      SELECT media_id, n, (media_id * 31 + i * 17) % 4001 - 2000 AS s FROM samp
    ), varying AS (
      SELECT media_id, n, SUM(s) AS ssum, MIN(s) AS smin, MAX(s) AS smax
      FROM vals GROUP BY media_id, n
    )
    SELECT media_id, CAST(n AS BIGINT) AS n_samples,
           CAST(8000 AS BIGINT) AS sample_rate,
           CAST(n * c AS BIGINT) AS sample_sum,
           CAST(c AS BIGINT) AS sample_min, CAST(c AS BIGINT) AS sample_max
    FROM const
    UNION ALL
    SELECT media_id, CAST(n AS BIGINT), CAST(8000 AS BIGINT),
           CAST(ssum AS BIGINT), CAST(smin AS BIGINT), CAST(smax AS BIGINT)
    FROM varying
    """,
    doc="FULL FLAC sample decode (multimodal.decode_audio_samples / "
    "decode_flac_samples, RFC 9639): complete valid one-frame FLAC "
    "streams — CONSTANT, VERBATIM and Rice-coded FIXED-order-1 "
    "subframes cycling by id, real CRC-8 header and CRC-16 frame "
    "checksums VERIFIED during decode — synthesized from the doc_id "
    "recipe; the oracle computes the same decoded sample sums/extrema "
    "from the closed form without touching a byte, so any Rice, "
    "prediction, bit-order or CRC bug hash-mismatches. Extends the "
    "from-spec entropy-coder family (DEFLATE, LZW, T.81 Huffman) to "
    "compressed audio.",
)
def q_media_flac_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.multimodal import (
        decode_audio_samples,
        synthesize_media,
    )

    docs = _tp(spark, sf_dir, "documents")
    media = synthesize_media(
        docs.select(F.col("doc_id").alias("media_id")), variant="flac_full"
    )
    return decode_audio_samples(media)


@register(
    "image_dhash_pairs",
    """
    WITH ids AS (
      SELECT doc_id AS media_id,
             4 + doc_id % 12 AS w,
             4 + (doc_id // 3) % 10 AS h
      FROM documents
    ), comp AS (
      SELECT media_id, w, h,
             unnest(generate_series(0, least((w - 1) * h, 60) - 1)) AS i
      FROM ids
    ), pos AS (
      SELECT media_id, w, h, i, i % (w - 1) AS x, i // (w - 1) AS y
      FROM comp
    ), bits AS (
      SELECT media_id, w, h, i,
             CASE WHEN
               299 * ((media_id * 7 + y * 31 + x * 13) % 256)
               + 587 * ((media_id * 7 + y * 31 + x * 13 + 5) % 256)
               + 114 * ((media_id * 7 + y * 31 + x * 13 + 10) % 256)
               >
               299 * ((media_id * 7 + y * 31 + (x + 1) * 13) % 256)
               + 587 * ((media_id * 7 + y * 31 + (x + 1) * 13 + 5) % 256)
               + 114 * ((media_id * 7 + y * 31 + (x + 1) * 13 + 10) % 256)
             THEN 1 ELSE 0 END AS bit
      FROM pos
    ), hashes AS (
      SELECT media_id, w, h,
             CAST(SUM(bit * (CAST(1 AS BIGINT) << i)) AS BIGINT) AS dhash
      FROM bits GROUP BY media_id, w, h
    )
    SELECT a.media_id AS id_a, b.media_id AS id_b,
           CAST(bit_count(xor(a.dhash, b.dhash)) AS BIGINT) AS hamming
    FROM hashes a
    JOIN hashes b ON a.w = b.w AND a.h = b.h AND a.media_id < b.media_id
    WHERE bit_count(xor(a.dhash, b.dhash)) <= 5
    """,
    doc="Image near-duplicate pairs by perceptual dHash over REAL "
    "decoded pixels (multimodal.image_dhash / image_dhash_pairs): "
    "complete PNGs decode through DEFLATE + all five filters, the "
    "60-bit difference hash compares adjacent luma at native "
    "resolution, and pairs come from 6x10-bit BANDED equi-joins "
    "(pigeonhole: Hamming<=5 forces a shared band) with exact "
    "bit_count verify — the simhash discipline applied to pixels; "
    "no all-pairs join at any scale. The oracle computes every hash "
    "from the pixel-recipe closed form, so a decode bug anywhere in "
    "the inflate/filter cascade flips bits and hash-mismatches.",
)
def q_image_dhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.multimodal import (
        image_dhash,
        image_dhash_pairs,
        synthesize_media,
    )

    docs = _tp(spark, sf_dir, "documents")
    media = synthesize_media(
        docs.select(F.col("doc_id").alias("media_id")), variant="png_full"
    )
    return image_dhash_pairs(image_dhash(media))


@register(
    "video_scene_cuts",
    """
    WITH ids AS (
      SELECT doc_id AS media_id,
             16 + (doc_id % 8) * 2 AS w,
             16 + ((doc_id // 7) % 8) * 2 AS h,
             3 + doc_id % 12 AS n_frames
      FROM documents
    ), trans AS (
      SELECT media_id, w, h, w * h AS npx,
             unnest(generate_series(1, n_frames - 1)) AS f
      FROM ids
    ), px AS (
      SELECT media_id, f, npx,
             unnest(generate_series(0, npx - 1)) AS i
      FROM trans
    ), diffs AS (
      SELECT media_id, f, npx,
             abs((i * 13 + media_id + f * 31) % 256
                 - (i * 13 + media_id + (f - 1) * 31) % 256) AS d
      FROM px
    )
    SELECT media_id, CAST(f AS BIGINT) AS frame_idx,
           CAST(npx AS BIGINT) AS n_pixels,
           CAST(SUM(d) AS BIGINT) AS sad,
           (SUM(d) > 55 * npx) AS is_cut
    FROM diffs GROUP BY media_id, f, npx
    """,
    doc="Shot-boundary detection over REAL decoded video frames "
    "(multimodal.video_scene_cuts): consecutive Y4M luma planes "
    "compared by SAD — the standard scene-cut metric a frame-sampling "
    "pipeline thresholds — flagged at 55/pixel in pure integers. "
    "Pixel-scale input reduces to a frames-scale cut list inside the "
    "Arrow stage, so the operator runs where the bytes are and ships "
    "almost nothing. The oracle recomputes every SAD from the luma "
    "recipe closed form (per-pixel mod-256 wraparound included).",
)
def q_video_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.multimodal import (
        synthesize_media,
        video_scene_cuts,
    )

    docs = _tp(spark, sf_dir, "documents")
    media = synthesize_media(
        docs.select(F.col("doc_id").alias("media_id")), variant="video"
    )
    return video_scene_cuts(media)


def _winnowing_oracle() -> str:
    from pasta_pipeline_spark.operators.text_dedup import winnowing_oracle_sql

    return winnowing_oracle_sql()


@register(
    "winnowing_pairs",
    None,  # generated below — single source of truth in operators/text_dedup.py
    doc="Winnowing fingerprint near-dup pairs (operators/text_dedup.py "
    "winnowing_pairs; Schleimer/Wilkerson/Aiken SIGMOD 2003 — the "
    "MOSS algorithm): per-window minimum k-gram hash with rightmost "
    "tie-break selected via a plain int64 argmin encoding (no "
    "structs), giving the winnowing guarantee — any shared substring "
    "of w+k-1 tokens shares a fingerprint — at ~2/(w+1) selection "
    "density. Hot fingerprints capped before the equi-join (no "
    "quadratic boilerplate blowup).",
)
def q_winnowing_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.text_dedup import winnowing_pairs

    docs = _tp(spark, sf_dir, "documents")
    return winnowing_pairs(docs)


REGISTRY["winnowing_pairs"] = QuerySpec(
    spark_fn=REGISTRY["winnowing_pairs"].spark_fn,
    oracle=_winnowing_oracle(),
    doc=REGISTRY["winnowing_pairs"].doc,
)


@register(
    "audio_fingerprint_pairs",
    """
    WITH ids AS (
      SELECT doc_id AS media_id, 32 + (doc_id % 5) * 8 AS n, doc_id % 3 AS v
      FROM documents
    ), bits AS (
      SELECT media_id, n, unnest(generate_series(0, least(n - 1, 60) - 1)) AS i
      FROM ids WHERE v <> 0
    ), vals AS (
      SELECT media_id, n, i,
             CASE WHEN (media_id * 31 + (i + 1) * 17) % 4001
                       > (media_id * 31 + i * 17) % 4001
                  THEN 1 ELSE 0 END AS bit
      FROM bits
    ), hashes AS (
      SELECT media_id, n,
             CAST(SUM(bit * (CAST(1 AS BIGINT) << i)) AS BIGINT) AS afp
      FROM vals GROUP BY media_id, n
      UNION ALL
      SELECT media_id, n, CAST(0 AS BIGINT) FROM ids WHERE v = 0
    )
    SELECT a.media_id AS id_a, b.media_id AS id_b,
           CAST(bit_count(xor(a.afp, b.afp)) AS BIGINT) AS hamming
    FROM hashes a JOIN hashes b ON a.n = b.n AND a.media_id < b.media_id
    WHERE bit_count(xor(a.afp, b.afp)) <= 5
    """,
    doc="Audio near-duplicate pairs over FULLY DECODED FLAC "
    "(multimodal.audio_fingerprint / audio_fingerprint_pairs): the "
    "Rice/prediction/CRC cascade reconstructs the waveform, a "
    "delta-sign signature (gain- and DC-invariant) summarizes it, and "
    "pairs come from the shared banded-Hamming LSH "
    "(banded_hamming_pairs — pigeonhole equi-joins, exact bit_count "
    "verify). With this the near-dup ladder covers text, images and "
    "audio under one discipline. Oracle replays fingerprints from the "
    "sample recipe closed form — a decode bug anywhere flips bits.",
)
def q_audio_fingerprint_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.multimodal import (
        audio_fingerprint,
        audio_fingerprint_pairs,
        synthesize_media,
    )

    docs = _tp(spark, sf_dir, "documents")
    media = synthesize_media(
        docs.select(F.col("doc_id").alias("media_id")), variant="flac_full"
    )
    return audio_fingerprint_pairs(audio_fingerprint(media))


@register(
    "media_dedup_survivors",
    """
    WITH RECURSIVE ids AS (
      SELECT doc_id AS media_id,
             4 + doc_id % 12 AS w,
             4 + (doc_id // 3) % 10 AS h
      FROM documents
    ), comp AS (
      SELECT media_id, w, h,
             unnest(generate_series(0, least((w - 1) * h, 60) - 1)) AS i
      FROM ids
    ), pos AS (
      SELECT media_id, w, h, i, i % (w - 1) AS x, i // (w - 1) AS y FROM comp
    ), bits AS (
      SELECT media_id, w, h, i,
             CASE WHEN
               299 * ((media_id * 7 + y * 31 + x * 13) % 256)
               + 587 * ((media_id * 7 + y * 31 + x * 13 + 5) % 256)
               + 114 * ((media_id * 7 + y * 31 + x * 13 + 10) % 256)
               >
               299 * ((media_id * 7 + y * 31 + (x + 1) * 13) % 256)
               + 587 * ((media_id * 7 + y * 31 + (x + 1) * 13 + 5) % 256)
               + 114 * ((media_id * 7 + y * 31 + (x + 1) * 13 + 10) % 256)
             THEN 1 ELSE 0 END AS bit
      FROM pos
    ), hashes AS (
      SELECT media_id, w, h,
             CAST(SUM(bit * (CAST(1 AS BIGINT) << i)) AS BIGINT) AS dhash
      FROM bits GROUP BY media_id, w, h
    ), pairs AS (
      SELECT a.media_id AS doc_a, b.media_id AS doc_b
      FROM hashes a JOIN hashes b
        ON a.w = b.w AND a.h = b.h AND a.media_id < b.media_id
      WHERE bit_count(xor(a.dhash, b.dhash)) <= 5
    ), edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM pairs
    ), cc(node, lbl) AS (
      SELECT media_id, media_id FROM hashes
      UNION
      SELECT e.dst, c.lbl FROM cc c JOIN edges e ON c.node = e.src
    )
    SELECT node AS media_id, CAST(min(lbl) AS BIGINT) AS cluster_id,
           (node = min(lbl)) AS is_survivor
    FROM cc GROUP BY node
    """,
    doc="Multimodal dedup CAPSTONE: complete PNGs decode through the "
    "real DEFLATE + filter cascade, perceptual dHash pairs feed the "
    "SAME min-label connected-components operator the text ladder "
    "uses (duplicate_clusters), and every image lands in a cluster "
    "with its smallest-id survivor — image near-dup dedup end-to-end "
    "under one full-hash oracle (closed-form hashes + recursive-CTE "
    "transitive closure).",
)
def q_media_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.multimodal import (
        image_dhash,
        image_dhash_pairs,
        synthesize_media,
    )
    from pasta_pipeline_spark.operators.text_dedup import duplicate_clusters

    docs = _tp(spark, sf_dir, "documents")
    media = synthesize_media(
        docs.select(F.col("doc_id").alias("media_id")), variant="png_full"
    )
    hashes = image_dhash(media)
    pairs = image_dhash_pairs(hashes).select(
        F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b")
    )
    # image near-dup components can chain (same-geometry template
    # families), and the ladder runs this at sf0.1 inside a long-lived
    # session — truncate fixpoint lineage so the plan never compounds
    clusters = duplicate_clusters(
        hashes.select(F.col("media_id").alias("doc_id")), pairs,
        checkpoint_every=2, doubling=True,
    )
    return clusters.select(
        F.col("doc_id").alias("media_id"),
        F.col("cluster_id").cast("long").alias("cluster_id"),
        "is_survivor",
    )


def _pretrain_pipeline_oracle() -> str:
    from pasta_pipeline_spark.operators.dsir import dsir_oracle_sql
    from pasta_pipeline_spark.operators.quality_filters import gopher_rules_sql
    from pasta_pipeline_spark.operators.sampling import greedy_pack_oracle_sql

    dsir_sub = dsir_oracle_sql(
        target_where="source IN ('src0', 'src1', 'src2', 'src3')",
        k=100,
        table="kept",
    )
    pack_sub = greedy_pack_oracle_sql(
        table="sized",
        id_col="doc_id",
        size_sql="len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> ''))",
        budget=256,
        group_col="source",
    )
    return f"""
    WITH g AS ({gopher_rules_sql()}),
    surv AS (
      SELECT doc_id,
             (row_number() OVER (PARTITION BY md5(text)
                                 ORDER BY doc_id ASC) = 1) AS sv
      FROM documents
    ),
    kept AS (
      SELECT d.* FROM documents d
      JOIN g USING (doc_id) JOIN surv USING (doc_id)
      WHERE g.pass_all AND surv.sv
    ),
    selected AS (SELECT * FROM ({dsir_sub})),
    sized AS (
      SELECT d.source, d.doc_id, d.text
      FROM kept d JOIN selected USING (doc_id)
    ),
    packed AS (SELECT * FROM ({pack_sub}))
    SELECT p.source, p.doc_id, p.n_units, p.pack_id, p.offset_in_pack,
           s.weight_fp
    FROM packed p JOIN selected s USING (doc_id)
    """


@register(
    "pretrain_pipeline",
    None,  # generated below — composed from the stage generators
    doc="Pretraining data-path CAPSTONE: the four stages a real corpus "
    "runs in order — Gopher quality gate, exact-dup keep-first "
    "survivorship, DSIR target-likeness selection (top 100), and "
    "NO-SPLIT greedy packing into 256-token windows per source — as "
    "ONE composed plan under ONE full-hash oracle (the stage oracle "
    "GENERATORS nest as CTE subqueries, so the composed contract "
    "cannot drift from the per-stage ones). Output: each selected "
    "document's pack assignment plus its selection weight.",
)
def q_pretrain_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from pasta_pipeline_spark.functions.text import tokenize_ws
    from pasta_pipeline_spark.operators.dsir import dsir_select
    from pasta_pipeline_spark.operators.quality_filters import gopher_rules
    from pasta_pipeline_spark.operators.sampling import greedy_pack

    docs = _tp(spark, sf_dir, "documents")
    g = gopher_rules(docs).select("doc_id", "pass_all")
    w = Window.partitionBy(F.md5(F.col("text").cast("binary"))).orderBy(
        F.asc("doc_id")
    )
    kept = (
        docs.withColumn("__sv", F.row_number().over(w) == 1)
        .join(g, "doc_id")
        .where(F.col("pass_all") & F.col("__sv"))
        .drop("pass_all", "__sv")
    )
    selected = dsir_select(
        kept, F.col("source").isin("src0", "src1", "src2", "src3"), k=100
    )
    sized = (
        kept.join(selected.select("doc_id"), "doc_id")
        .select(
            "source", "doc_id", F.size(tokenize_ws(F.col("text"))).alias("__n_tok")
        )
    )
    packed = greedy_pack(sized, "doc_id", "__n_tok", budget=256, group_col="source")
    return packed.join(selected.select("doc_id", "weight_fp"), "doc_id").select(
        "source", "doc_id", "n_units", "pack_id", "offset_in_pack", "weight_fp"
    )


REGISTRY["pretrain_pipeline"] = QuerySpec(
    spark_fn=REGISTRY["pretrain_pipeline"].spark_fn,
    oracle=_pretrain_pipeline_oracle(),
    doc=REGISTRY["pretrain_pipeline"].doc,
)


@register(
    "license_scan",
    """
    WITH headed AS (
      SELECT doc_id,
             CASE doc_id % 5
               WHEN 0 THEN 'SPDX-License-Identifier: MIT' || chr(10) || text
               WHEN 1 THEN '// Licensed under the Apache License, Version 2.0' || chr(10) || text
               WHEN 2 THEN '# This program is free software: GNU General Public License v3' || chr(10) || text
               WHEN 3 THEN 'Copyright (c) 2024 Example Corp. All rights reserved.' || chr(10) || text
               ELSE text
             END AS text
      FROM documents
    ), flags AS (
      SELECT doc_id,
             regexp_extract(text, 'SPDX-License-Identifier: *([A-Za-z0-9.+-]+)', 1) AS spdx,
             regexp_matches(text, 'Apache License') AS apache,
             regexp_matches(text, 'General Public License|GPL') AS gpl,
             regexp_matches(text, '(?i)all rights reserved') AS arr
      FROM headed
    )
    SELECT doc_id,
           CASE WHEN spdx <> '' THEN spdx
                WHEN apache THEN 'Apache-2.0'
                WHEN gpl THEN 'GPL'
                WHEN arr THEN 'proprietary'
                ELSE 'none' END AS license,
           CASE WHEN spdx = 'MIT' OR apache THEN 'permissive'
                WHEN gpl THEN 'copyleft'
                WHEN arr THEN 'restricted'
                ELSE 'unknown' END AS category
    FROM flags
    """,
    doc="License/SPDX scanning (code-corpus curation staple): detect "
    "SPDX identifiers, Apache/GPL license mentions and all-rights-"
    "reserved notices in document headers and classify permissive / "
    "copyleft / restricted — the admission gate a code-training "
    "corpus runs before anything else. Pure portable regexes (no "
    "backrefs/lookaround, playbook #13) over synthesized headers.",
)
def q_license_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    headed = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 5 == 0,
               F.concat(F.lit("SPDX-License-Identifier: MIT\n"), F.col("text")))
        .when(F.col("doc_id") % 5 == 1,
              F.concat(F.lit("// Licensed under the Apache License, Version 2.0\n"), F.col("text")))
        .when(F.col("doc_id") % 5 == 2,
              F.concat(F.lit("# This program is free software: GNU General Public License v3\n"), F.col("text")))
        .when(F.col("doc_id") % 5 == 3,
              F.concat(F.lit("Copyright (c) 2024 Example Corp. All rights reserved.\n"), F.col("text")))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    spdx = F.regexp_extract(F.col("text"), r"SPDX-License-Identifier: *([A-Za-z0-9.+-]+)", 1)
    apache = F.col("text").rlike("Apache License")
    gpl = F.col("text").rlike("General Public License|GPL")
    arr = F.col("text").rlike("(?i)all rights reserved")
    return headed.select(
        "doc_id",
        F.when(spdx != "", spdx)
        .when(apache, F.lit("Apache-2.0"))
        .when(gpl, F.lit("GPL"))
        .when(arr, F.lit("proprietary"))
        .otherwise(F.lit("none"))
        .alias("license"),
        F.when((spdx == "MIT") | apache, F.lit("permissive"))
        .when(gpl, F.lit("copyleft"))
        .when(arr, F.lit("restricted"))
        .otherwise(F.lit("unknown"))
        .alias("category"),
    )


@register(
    "lang_confusion_audit",
    _LANG_ID_ORACLE.replace(
        "SELECT doc_id,",
        "SELECT doc_id, lang,", 1
    ).replace(
        "FROM documents", "FROM documents", 1
    ).replace(
        """    SELECT doc_id,
           CASE WHEN regexp_matches(text, '[Ѐ-ӿ]') THEN 'ru'""",
        """    , det AS (
    SELECT doc_id,
           CASE WHEN regexp_matches(text, '[Ѐ-ӿ]') THEN 'ru'""",
    ).replace(
        """                ELSE 'und' END AS detected_lang
    FROM scored
""",
        """                ELSE 'und' END AS detected_lang
    FROM scored
    )
    SELECT d.lang AS labeled_lang, det.detected_lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           (d.lang <> det.detected_lang) AS is_mismatch
    FROM det JOIN documents d USING (doc_id)
    GROUP BY d.lang, det.detected_lang
""",
    ),
    doc="Language label-noise audit (metadata QA): the confusion "
    "matrix between the corpus's claimed lang column and the "
    "deterministic detector — per (labeled, detected) pair counts "
    "with a mismatch flag, the table a curation review reads before "
    "trusting per-language mixing weights. Reuses the lang_id oracle "
    "body verbatim (one detector, two queries — cannot drift).",
)
def q_lang_confusion_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.text_analysis import detect_language

    docs = _tp(spark, sf_dir, "documents")
    det = docs.select(
        "doc_id", "lang", detect_language("text").alias("detected_lang")
    )
    return det.groupBy(
        F.col("lang").alias("labeled_lang"), "detected_lang"
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
    ).withColumn("is_mismatch", F.col("labeled_lang") != F.col("detected_lang"))


@register(
    "url_template_mining",
    """
    WITH urls AS (
      SELECT doc_id,
             'h' || CAST(doc_id % 7 AS VARCHAR) || '.example.com' AS host,
             CASE doc_id % 3
               WHEN 0 THEN '/item/' || CAST(doc_id AS VARCHAR)
               WHEN 1 THEN '/page/' || CAST(doc_id AS VARCHAR) || '/view/'
                           || CAST(doc_id % 13 AS VARCHAR)
               ELSE '/static/about'
             END AS path
      FROM documents
    ), templated AS (
      SELECT host, path,
             regexp_replace(path, '[0-9]+', '{n}', 'g') AS template
      FROM urls
    )
    SELECT host, template,
           CAST(count(*) AS BIGINT) AS n_urls,
           CAST(count(DISTINCT path) AS BIGINT) AS n_distinct,
           (count(*) > 20) AS is_trap_candidate
    FROM templated GROUP BY host, template
    """,
    doc="URL template mining (crawl-trap detection, the IRLbot/Mercator "
    "lineage): collapse digit runs to '{n}' and count URLs per (host, "
    "template) — a template generating unboundedly many distinct URLs "
    "(calendars, session ids, faceted search) shows up as one hot row "
    "a frontier budget can cap BEFORE fetching, where per-URL spam "
    "scores cannot see the aggregate explosion. Pure expressions + "
    "one groupBy.",
)
def q_url_template_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    host = F.concat(F.lit("h"), (F.col("doc_id") % 7).cast("string"), F.lit(".example.com"))
    path = (
        F.when(F.col("doc_id") % 3 == 0,
               F.concat(F.lit("/item/"), F.col("doc_id").cast("string")))
        .when(F.col("doc_id") % 3 == 1,
              F.concat(F.lit("/page/"), F.col("doc_id").cast("string"),
                       F.lit("/view/"), (F.col("doc_id") % 13).cast("string")))
        .otherwise(F.lit("/static/about"))
    )
    t = docs.select(
        host.alias("host"),
        path.alias("path"),
        F.regexp_replace(path, "[0-9]+", "{n}").alias("template"),
    )
    return t.groupBy("host", "template").agg(
        F.count(F.lit(1)).cast("long").alias("n_urls"),
        F.countDistinct("path").cast("long").alias("n_distinct"),
        (F.count(F.lit(1)) > 20).alias("is_trap_candidate"),
    )


# ---------------------------------------------------------------------------
# Round 7
# ---------------------------------------------------------------------------


def _dsir_bigram_oracle() -> str:
    from pasta_pipeline_spark.operators.dsir import dsir_oracle_sql

    return dsir_oracle_sql(
        target_where="source IN ('src0', 'src1', 'src2', 'src3')",
        k=100,
        features="bigram",
    )


@register(
    "dsir_bigram_selection",
    None,  # generated below — single source of truth in operators/dsir.py
    doc="DSIR selection over the paper-faithful hashed BIGRAM feature "
    "space (operators/dsir.py features='bigram'; Xie et al. arXiv:"
    "2302.03169 §2.1 hashes n-grams, not unigrams): consecutive token "
    "pairs hash into the same m=4096 buckets, making the importance "
    "model word-ORDER-sensitive while keeping model state fixed-size. "
    "Same smoothing, fixed-point ln, and deterministic top-k as "
    "dsir_selection; documents under 2 tokens contribute no features "
    "(len-guarded in both engines — the winnowing short-doc lesson). "
    "Oracle generated from the same constants.",
)
def q_dsir_bigram_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.dsir import dsir_select

    docs = _tp(spark, sf_dir, "documents")
    return dsir_select(
        docs, F.col("source").isin("src0", "src1", "src2", "src3"), k=100,
        features="bigram",
    )


REGISTRY["dsir_bigram_selection"] = QuerySpec(
    spark_fn=REGISTRY["dsir_bigram_selection"].spark_fn,
    oracle=_dsir_bigram_oracle(),
    doc=REGISTRY["dsir_bigram_selection"].doc,
)


def _bm25f_oracle() -> str:
    from pasta_pipeline_spark.operators.search import bm25f_oracle_sql

    return bm25f_oracle_sql(["spark", "join", "window"], k=10)


@register(
    "bm25_fielded",
    None,  # generated below — single source of truth in operators/search.py
    doc="BM25F fielded retrieval (operators/search.py bm25f_topk; "
    "Robertson & Zaragoza 2009 §3.3): title-field occurrences (the "
    "document's first 5 tokens — deterministic positional fields, the "
    "corpus has no field columns) weigh 3x body occurrences, "
    "saturation runs over the COMBINED weighted tf (one k1 curve per "
    "term — the property that separates BM25F from summing per-field "
    "BM25 scores), and length normalization uses weighted lengths. "
    "Same posting-list scale shape as bm25_topk; int64-floored "
    "contributions; TakeOrderedAndProject top-k.",
)
def q_bm25_fielded(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.search import bm25f_topk

    docs = _tp(spark, sf_dir, "documents")
    return bm25f_topk(docs, ["spark", "join", "window"], k=10)


REGISTRY["bm25_fielded"] = QuerySpec(
    spark_fn=REGISTRY["bm25_fielded"].spark_fn,
    oracle=_bm25f_oracle(),
    doc=REGISTRY["bm25_fielded"].doc,
)


def _minhash_error_oracle() -> str:
    from pasta_pipeline_spark.operators.text_dedup import minhash_error_oracle_sql

    return minhash_error_oracle_sql(n=3, num_hashes=64, threshold=0.5)


@register(
    "minhash_error_report",
    None,  # generated below — single source of truth in operators/text_dedup.py
    doc="MinHash estimator audit (operators/text_dedup.py "
    "minhash_error_report; Broder 1997): for every TRUE near-dup pair "
    "(exact shingle Jaccard >= 0.5), the k=64 slot-agreement estimate "
    "vs the exact value in basis points — measure the estimator on "
    "the corpus's own near-dup population before trusting a new "
    "k/bands setting (expected std ~ sqrt(J(1-J)/64) ~ 6 points at "
    "J=0.5). Signatures are md5-derived here so the WHOLE report, "
    "signatures included, replays hash-exactly in SQL; one shingle "
    "scan feeds both the exact self-join and the signature "
    "aggregation.",
)
def q_minhash_error_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.text_dedup import minhash_error_report

    docs = _t(spark, sf_dir, "documents")
    return minhash_error_report(docs, "doc_id", "text", n=3, num_hashes=64, threshold=0.5)


REGISTRY["minhash_error_report"] = QuerySpec(
    spark_fn=REGISTRY["minhash_error_report"].spark_fn,
    oracle=_minhash_error_oracle(),
    doc=REGISTRY["minhash_error_report"].doc,
)


def _nb_confusion_oracle() -> str:
    from pasta_pipeline_spark.operators.dsir import nb_confusion_oracle_sql

    return nb_confusion_oracle_sql()


@register(
    "source_nb_confusion",
    None,  # generated below — single source of truth in operators/dsir.py
    doc="Source-separability audit (operators/dsir.py "
    "nb_source_confusion): one add-one-smoothed hashed-bow multinomial "
    "per SOURCE (the multi-class generalization of the DSIR importance "
    "models), max-likelihood classification of every document, "
    "confusion matrix out. Near-diagonal = sources are "
    "distributionally distinct (mixture weights mean something); "
    "off-diagonal mass = two sources duplicate each other or labels "
    "are noisy — the source-level counterpart of lang_confusion_audit. "
    "Fixed-point ln scores; per-doc argmax via a doc-partitioned "
    "window (S rows per partition, parallel).",
)
def q_source_nb_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.dsir import nb_source_confusion

    docs = _tp(spark, sf_dir, "documents")
    return nb_source_confusion(docs)


REGISTRY["source_nb_confusion"] = QuerySpec(
    spark_fn=REGISTRY["source_nb_confusion"].spark_fn,
    oracle=_nb_confusion_oracle(),
    doc=REGISTRY["source_nb_confusion"].doc,
)


def _label_centroid_oracle() -> str:
    from pasta_pipeline_spark.operators.similarity import label_centroid_oracle_sql

    return label_centroid_oracle_sql()


@register(
    "label_centroid_similarity",
    None,  # generated below — single source of truth in operators/similarity.py
    doc="Per-label embedding centroid similarity (operators/"
    "similarity.py label_centroid_similarity): pairwise cosine between "
    "label centroids — near-parallel centroids flag populations "
    "occupying the same embedding region (merge candidates, "
    "contamination, drift), the embedding-space counterpart of "
    "source_nb_confusion. Cosine of means == cosine of SUMS (1/n "
    "cancels), so state is |labels| x d int64 component sums from ONE "
    "posexplode scan; the final ratio is a shared sequential-fold "
    "double expression (playbook #5).",
)
def q_label_centroid_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.similarity import label_centroid_similarity

    emb = _t(spark, sf_dir, "embeddings")
    return label_centroid_similarity(emb)


REGISTRY["label_centroid_similarity"] = QuerySpec(
    spark_fn=REGISTRY["label_centroid_similarity"].spark_fn,
    oracle=_label_centroid_oracle(),
    doc=REGISTRY["label_centroid_similarity"].doc,
)


@register(
    "length_quartiles_by_source",
    """
    WITH ranked AS (
      SELECT source, n_chars, doc_id,
             ntile(4) OVER (PARTITION BY source
                            ORDER BY n_chars, doc_id) AS q
      FROM documents
    )
    SELECT source, CAST(q AS INT) AS quartile,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(MIN(n_chars) AS BIGINT) AS min_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars
    FROM ranked GROUP BY source, q
    """,
    doc="Per-source document-length quartiles — equal-depth "
    "per-GROUP statistics, the grouped form of equidepth_histogram. "
    "The oracle states the contract as ntile(4) PARTITION BY source; "
    "the Spark side runs NO per-source window task (the hot-group "
    "scale-killer the r6 verdict flagged on perplexity_buckets): "
    "ranks come from ids.assign_grouped_sequential_ids "
    "(range-partition by (source, length, id) + per-group driver "
    "prefix-sum) and the quartile is ntile's closed-form quotient "
    "over (rank, group total). Identical assignment, every task "
    "bounded by a range slice.",
)
def q_length_quartiles_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.ids import assign_grouped_sequential_ids
    from pasta_pipeline_spark.operators.util import attach_cached_deps

    docs = _t(spark, sf_dir, "documents").select("source", "n_chars", "doc_id")
    ranked = assign_grouped_sequential_ids(
        docs, "source", ["n_chars", "doc_id"], out_col="__rk", total_col="__n"
    )
    q = F.expr(
        """CAST(CASE
             WHEN __rk <= (__n % 4) * (__n div 4 + 1)
             THEN (__rk - 1) div (__n div 4 + 1)
             ELSE (__n % 4) + (__rk - (__n % 4) * (__n div 4 + 1) - 1)
                  div greatest(__n div 4, 1)
           END + 1 AS INT)"""
    )
    out = (
        ranked.withColumn("quartile", q)
        .groupBy("source", "quartile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("n_chars").cast("long").alias("min_chars"),
            F.max("n_chars").cast("long").alias("max_chars"),
        )
    )
    return attach_cached_deps(out, getattr(ranked, "_pasta_cached_deps", []))


def _line_dedup_oracle() -> str:
    from pasta_pipeline_spark.operators.text_dedup import (
        global_line_dedup_oracle_sql,
    )

    inner = global_line_dedup_oracle_sql(
        max_df=400, table="src", text_col="t"
    ).lstrip()
    assert inner.startswith("WITH ")
    return (
        f"WITH src AS (SELECT doc_id, {_C4_INJECT_SQL} AS t FROM documents), "
        + inner[len("WITH "):]
    )


@register(
    "line_dedup_rewrite",
    None,  # generated below — single source of truth in operators/text_dedup.py
    doc="CCNet corpus-GLOBAL duplicate-line removal (text_dedup."
    "global_line_dedup; Wenzek et al. 1911.00359 §3.1 — dedup every "
    "paragraph by hash across shards): lines whose normalized form "
    "appears in more than max_df distinct documents (cookie banners, "
    "nav chrome — the C4-injected boilerplate lines here) are cut "
    "from every document; docs are reassembled order-preserving via "
    "ONE array_sort groupBy, no window. State is linear in DISTINCT "
    "lines (the token_distribution scale class). Complement of the "
    "group-scoped boilerplate_lines.",
)
def q_line_dedup_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.text_dedup import global_line_dedup

    docs = _tp(spark, sf_dir, "documents")
    src = docs.select("doc_id", _c4_inject_spark().alias("t"))
    return global_line_dedup(src, "doc_id", "t", max_df=400)


REGISTRY["line_dedup_rewrite"] = QuerySpec(
    spark_fn=REGISTRY["line_dedup_rewrite"].spark_fn,
    oracle=_line_dedup_oracle(),
    doc=REGISTRY["line_dedup_rewrite"].doc,
)


def _stitch_oracle() -> str:
    from pasta_pipeline_spark.operators.text_dedup import stitch_pairs_oracle_sql

    return stitch_pairs_oracle_sql(k=3)


@register(
    "stitch_pairs",
    None,  # generated below — single source of truth in operators/text_dedup.py
    doc="Pagination-stitch detection (text_dedup.stitch_pairs): doc "
    "A's last 3 tokens == doc B's first 3 tokens — one logical page "
    "split across crawl records (pagination, load-more chunks, shard "
    "boundaries). One scan derives each doc's boundary grams; "
    "candidates from a plain equi-join on the gram. Feeds a "
    "concatenating repair or the dedup ladder.",
)
def q_stitch_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.text_dedup import stitch_pairs

    docs = _t(spark, sf_dir, "documents")
    return stitch_pairs(docs, "doc_id", "text", k=3)


REGISTRY["stitch_pairs"] = QuerySpec(
    spark_fn=REGISTRY["stitch_pairs"].spark_fn,
    oracle=_stitch_oracle(),
    doc=REGISTRY["stitch_pairs"].doc,
)


@register(
    "embedding_norm_audit",
    """
    WITH n AS (
      SELECT label,
             CAST(FLOOR(sqrt(list_dot_product(embedding::DOUBLE[],
                                              embedding::DOUBLE[])) * 10000)
                  AS BIGINT) AS norm_fp,
             len(embedding) AS dim
      FROM embeddings
    )
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(SUM(CASE WHEN dim <> 64 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_malformed,
           CAST(SUM(CASE WHEN norm_fp = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_zero,
           CAST(MIN(norm_fp) AS BIGINT) AS min_norm_fp,
           CAST(MAX(norm_fp) AS BIGINT) AS max_norm_fp,
           CAST(SUM(norm_fp) AS BIGINT) AS sum_norm_fp
    FROM n GROUP BY label
    """,
    doc="Embedding hygiene audit: per-label vector-norm profile — "
    "zero-norm vectors break cosine (NaN), malformed dimensions break "
    "zip_with silently (the JL lesson), and a norm range spanning "
    "orders of magnitude means the embedder mixed normalized and "
    "unnormalized outputs. Run BEFORE the similarity tier; one scan, "
    "pure expressions, fixed-point sqrt norm (sequential-fold dot, "
    "playbook #5).",
)
def q_embedding_norm_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.similarity import dot

    emb = _t(spark, sf_dir, "embeddings")
    norm_fp = F.floor(
        F.sqrt(dot(F.col("embedding"), F.col("embedding"))) * 10000
    ).cast("long")
    return (
        emb.select(
            "label",
            norm_fp.alias("norm_fp"),
            F.size("embedding").alias("dim"),
        )
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.sum((F.col("dim") != 64).cast("long")).cast("long").alias("n_malformed"),
            F.sum((F.col("norm_fp") == 0).cast("long")).cast("long").alias("n_zero"),
            F.min("norm_fp").cast("long").alias("min_norm_fp"),
            F.max("norm_fp").cast("long").alias("max_norm_fp"),
            F.sum("norm_fp").cast("long").alias("sum_norm_fp"),
        )
    )


@register(
    "dup_degree_profile",
    """
    WITH toks AS (
      SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\\s+'), y -> y <> '') AS t FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id,
             CASE WHEN len(t) >= 3 THEN t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                  ELSE array_to_string(t, ' ') END AS s
      FROM (SELECT doc_id, t, unnest(generate_series(1, greatest(len(t) - 2, 1))) AS i FROM toks)
    ), sizes AS (
      SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
    ), common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ), pairs AS (
      SELECT doc_a, doc_b FROM common
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE n_common * 2 >= (sa.n_sh + sb.n_sh - n_common)
    ), deg AS (
      SELECT d, CAST(count(*) AS BIGINT) AS degree FROM (
        SELECT doc_a AS d FROM pairs UNION ALL SELECT doc_b AS d FROM pairs
      ) GROUP BY d
    )
    SELECT degree, CAST(count(*) AS BIGINT) AS n_docs
    FROM deg GROUP BY degree
    """,
    doc="Near-dup graph degree profile: how many dup-partners each "
    "document has (exact Jaccard >= 0.5 pairs), histogrammed. The "
    "shape diagnoses the dedup workload BEFORE clustering: a long "
    "degree tail means template farms (one hub duplicating "
    "thousands — expect hot keys, pre-cluster with the banded "
    "tiers), near-uniform low degree means simple pairwise dedup "
    "suffices. Derived from the same shingle self-join as "
    "ngram_jaccard_pairs; integer cross-multiplied threshold.",
)
def q_dup_degree_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.text_dedup import jaccard_pairs

    docs = _t(spark, sf_dir, "documents")
    pairs = jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5).select(
        "doc_a", "doc_b"
    )
    deg = (
        pairs.select(F.col("doc_a").alias("d"))
        .unionAll(pairs.select(F.col("doc_b").alias("d")))
        .groupBy("d")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
    )
    return deg.groupBy("degree").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )


def _ann_recall_oracle(k: int = 10) -> str:
    return f"""
    WITH ann AS ({_ann_ivf_oracle(k=k)}),
    exact AS ({_COSINE_TOPK_ORACLE.replace("LIMIT 10", f"LIMIT {k}")})
    SELECT CAST({k} AS BIGINT) AS k,
           CAST(count(*) AS BIGINT) AS n_hits,
           CAST(count(*) * 10000 // {k} AS BIGINT) AS recall_bp
    FROM ann JOIN exact USING (vec_id)
    """


@register(
    "ann_recall_report",
    None,  # assembled below from the IVF and exact-cosine oracles
    doc="ANN quality evaluation as a first-class query: recall@10 of "
    "the IVF index (16 cells, 4 probes) against the exact cosine "
    "top-10 for the same query vector — the number an ANN deployment "
    "must report before its results are trusted, computed entirely "
    "in-engine (both rankings are deterministic, so even the RECALL "
    "is hash-oracle-able — no sampling, no tolerance). Composes the "
    "existing ivf_topk and cosine_topk plans; one join on vec_id.",
)
def q_ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.similarity import cosine_topk, ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    query = emb.orderBy("vec_id").limit(1).select(F.col("embedding").alias("qv"))
    k = 10
    ann = ivf_topk(emb, query, k=k, n_cells=16, n_probe=4).select("vec_id")
    exact = cosine_topk(emb, query, k=k).select("vec_id")
    return ann.join(exact, "vec_id").agg(
        F.lit(k).cast("long").alias("k"),
        F.count(F.lit(1)).cast("long").alias("n_hits"),
        F.expr(f"count(1) * 10000 div {k}").cast("long").alias("recall_bp"),
    )


REGISTRY["ann_recall_report"] = QuerySpec(
    spark_fn=REGISTRY["ann_recall_report"].spark_fn,
    oracle=_ann_recall_oracle(),
    doc=REGISTRY["ann_recall_report"].doc,
)


def _jl_ann_oracle() -> str:
    from pasta_pipeline_spark.operators.similarity import jl_ann_oracle_sql

    return jl_ann_oracle_sql()


@register(
    "jl_ann_topk",
    None,  # generated below — single source of truth in operators/similarity.py
    doc="JL-prefiltered ANN (operators/similarity.py jl_ann_topk): "
    "coarse squared-L2 ranking in the 16-dim sign projection (int64 "
    "expressions, 4x fewer multiplies, no floats) keeps 50 "
    "candidates; exact cosine reranks only those. The cheap-ANN "
    "composition of the JL tier — both stages deterministic, so the "
    "whole pipeline INCLUDING the prefilter is hash-oracle-able "
    "(no sampled-ANN tolerance games).",
)
def q_jl_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.similarity import jl_ann_topk

    emb = _t(spark, sf_dir, "embeddings")
    query = emb.orderBy("vec_id").limit(1).select(F.col("embedding").alias("qv"))
    return jl_ann_topk(emb, query, k=10, n_candidates=50)


REGISTRY["jl_ann_topk"] = QuerySpec(
    spark_fn=REGISTRY["jl_ann_topk"].spark_fn,
    oracle=_jl_ann_oracle(),
    doc=REGISTRY["jl_ann_topk"].doc,
)


def _sorted_pack_gain_oracle() -> str:
    from pasta_pipeline_spark.operators.sampling import greedy_pack_oracle_sql

    size_sql = "len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> ''))"
    arrival = greedy_pack_oracle_sql(
        table="documents", id_col="doc_id", size_sql=size_sql,
        budget=256, group_col="source",
    )
    srt_src = (
        "(SELECT source, doc_id, "
        f"CAST({size_sql} AS BIGINT) * 1000000 + doc_id AS ord_key, text "
        "FROM documents) srt"
    )
    by_len = greedy_pack_oracle_sql(
        table=srt_src, id_col="ord_key", size_sql=size_sql,
        budget=256, group_col="source",
    )
    eff = (
        "SELECT source, CAST(count(DISTINCT pack_id) AS BIGINT) AS n_packs, "
        "CAST(SUM(n_units) * 10000 // (count(DISTINCT pack_id) * 256) AS BIGINT)"
        " AS eff_bp FROM {src} GROUP BY source"
    )
    return f"""
    WITH arrival AS ({arrival}),
    by_len AS ({by_len}),
    ea AS ({eff.format(src="arrival")}),
    es AS ({eff.format(src="by_len")})
    SELECT ea.source,
           ea.n_packs AS n_packs_arrival, es.n_packs AS n_packs_sorted,
           ea.eff_bp AS eff_arrival_bp, es.eff_bp AS eff_sorted_bp,
           CAST(es.eff_bp - ea.eff_bp AS BIGINT) AS gain_bp
    FROM ea JOIN es USING (source)
    """


@register(
    "sorted_pack_gain",
    None,  # assembled below from the greedy_pack recursive-CTE oracle
    doc="Length-sorted packing gain (the curriculum/packing trick "
    "every training pipeline weighs): pack each source shard twice "
    "with the SAME next-fit rule — arrival order vs sorted by "
    "document length — and report packs saved and occupancy gained "
    "in basis points. Sorting feeds same-size runs to next-fit, "
    "cutting padding waste (Ding 2404.10830 discuss the trade "
    "against order randomness). Order is injected through the pack "
    "key (length-composite id), so the Arrow packing stage and the "
    "recursive-CTE oracle are both reused verbatim, twice.",
)
def q_sorted_pack_gain(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.functions.text import tokenize_ws
    from pasta_pipeline_spark.operators.sampling import greedy_pack

    docs = _t(spark, sf_dir, "documents").withColumn(
        "__n_tok", F.size(tokenize_ws(F.col("text"))).cast("long")
    )
    srt = docs.withColumn(
        "__ord", F.col("__n_tok") * 1000000 + F.col("doc_id")
    )

    def eff(packed):
        per_pack = packed.groupBy("source", "pack_id").agg(
            F.sum("n_units").cast("long").alias("pack_units")
        )
        return per_pack.groupBy("source").agg(
            F.count(F.lit(1)).cast("long").alias("n_packs"),
            F.expr(
                "CAST(SUM(pack_units) * 10000 div (count(1) * 256) AS BIGINT)"
            ).alias("eff_bp"),
        )

    ea = eff(greedy_pack(docs, "doc_id", "__n_tok", budget=256, group_col="source"))
    es = eff(greedy_pack(srt, "__ord", "__n_tok", budget=256, group_col="source"))
    return (
        ea.select(
            "source",
            F.col("n_packs").alias("n_packs_arrival"),
            F.col("eff_bp").alias("eff_arrival_bp"),
        )
        .join(
            es.select(
                "source",
                F.col("n_packs").alias("n_packs_sorted"),
                F.col("eff_bp").alias("eff_sorted_bp"),
            ),
            "source",
        )
        .select(
            "source", "n_packs_arrival", "n_packs_sorted",
            "eff_arrival_bp", "eff_sorted_bp",
            (F.col("eff_sorted_bp") - F.col("eff_arrival_bp"))
            .cast("long")
            .alias("gain_bp"),
        )
    )


REGISTRY["sorted_pack_gain"] = QuerySpec(
    spark_fn=REGISTRY["sorted_pack_gain"].spark_fn,
    oracle=_sorted_pack_gain_oracle(),
    doc=REGISTRY["sorted_pack_gain"].doc,
)


def _cdc_oracle() -> str:
    from pasta_pipeline_spark.operators.subdoc_dedup import cdc_chunks_oracle_sql

    return cdc_chunks_oracle_sql(avg_tokens=8)


@register(
    "cdc_chunks",
    None,  # generated below — single source of truth in operators/subdoc_dedup.py
    doc="Content-defined chunking (subdoc_dedup.cdc_chunks; the "
    "LBFS/rsync idea at token granularity, Muthitacharoen SOSP'01): "
    "a chunk closes after every token whose md5-60 hash is 0 mod "
    "avg_tokens, so boundaries follow CONTENT and an edit reshapes "
    "only chunks up to the next boundary (resynchronization pytest). "
    "Emits per-chunk md5 + corpus-wide copy counts — shared content "
    "at chunk granularity, between line-level and span-level dedup "
    "resolution. Doc-partitioned windows; chunk-hash count is the "
    "only cross-doc shuffle.",
)
def q_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.subdoc_dedup import cdc_chunks

    docs = _t(spark, sf_dir, "documents")
    return cdc_chunks(docs, avg_tokens=8)


REGISTRY["cdc_chunks"] = QuerySpec(
    spark_fn=REGISTRY["cdc_chunks"].spark_fn,
    oracle=_cdc_oracle(),
    doc=REGISTRY["cdc_chunks"].doc,
)


@register(
    "json_roundtrip_extract",
    """
    WITH src AS (
      SELECT doc_id,
             '{"id": ' || doc_id || ', "lang": "' || lang || '", "n": '
               || n_chars || '}' AS payload
      FROM documents
    )
    SELECT doc_id,
           CAST(json_extract(payload, '$.id') AS BIGINT) AS id2,
           CAST(json_extract_string(payload, '$.lang') AS VARCHAR) AS lang2,
           CAST(json_extract(payload, '$.n') AS BIGINT) AS n2,
           CAST(json_valid(payload) AS BOOLEAN) AS valid
    FROM src
    """,
    doc="JSON parse surface (SURVEY §2.8 P3/P4 — the reference "
    "serializes reactions/links as JSON strings; native MapType/"
    "ArrayType eliminated the need, and THIS query evidences the "
    "parse path for users who still carry JSON columns): an "
    "engine-shared JSON payload is built by one concat recipe, then "
    "Spark's from_json(explicit schema) and DuckDB's json_extract "
    "must agree field-for-field. Schema-on-read with explicit "
    "schema — never schema inference on a 100 TB scan.",
)
def q_json_roundtrip_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    payload = F.format_string(
        '{"id": %d, "lang": "%s", "n": %d}',
        F.col("doc_id"),
        F.col("lang"),
        F.col("n_chars"),
    )
    parsed = docs.select(
        "doc_id", F.from_json(payload, "id long, lang string, n long").alias("j"),
        payload.alias("p"),
    )
    return parsed.select(
        "doc_id",
        F.col("j.id").alias("id2"),
        F.col("j.lang").alias("lang2"),
        F.col("j.n").alias("n2"),
        F.col("j").isNotNull().alias("valid"),
    )


@register(
    "media_resize",
    """
    WITH ids AS (
      SELECT doc_id AS media_id,
             4 + doc_id % 12 AS w,
             4 + (doc_id // 3) % 10 AS h
      FROM documents
    ), txs AS (
      SELECT media_id, w, h, unnest(generate_series(0, 3)) AS tx FROM ids
    ), tys AS (
      SELECT media_id, w, h, tx, unnest(generate_series(0, 3)) AS ty FROM txs
    ), cs AS (
      SELECT media_id, w, h,
             (tx * w) // 4 AS x, (ty * h) // 4 AS y,
             unnest([0, 1, 2]) AS c
      FROM tys
    ), vals AS (
      SELECT media_id, w, h, c,
             (media_id * 7 + y * 31 + x * 13 + c * 5) % 256 AS v
      FROM cs
    )
    SELECT media_id,
           CAST(w AS INTEGER) AS src_width,
           CAST(h AS INTEGER) AS src_height,
           CAST(4 AS INTEGER) AS out_width,
           CAST(4 AS INTEGER) AS out_height,
           CAST(SUM(v) AS BIGINT) AS r_pixel_sum,
           CAST(SUM((CASE c WHEN 0 THEN 299 WHEN 1 THEN 587 ELSE 114 END) * v)
             AS BIGINT) AS r_luma_sum
    FROM vals GROUP BY 1, 2, 3
    """,
    doc="Image RESIZE over REAL decoded pixels (multimodal."
    "resize_image_pixels) — the preprocessing verb between decode and "
    "batching: nearest-neighbor to 4x4 with the exact floor mapping "
    "(tx*w div out_w), numpy gather per image inside one Arrow "
    "mapInPandas (no per-pixel Python). The oracle recomputes the "
    "resized pixel/luma sums from the closed-form id pixel recipe "
    "WITHOUT touching a byte — any decode/stride/mapping bug "
    "hash-mismatches (the media_png_pixels discipline, now through a "
    "geometric transform).",
)
def q_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.multimodal import (
        resize_image_pixels,
        synthesize_media,
    )

    docs = _tp(spark, sf_dir, "documents")
    media = synthesize_media(
        docs.select(F.col("doc_id").alias("media_id")), variant="png_full"
    )
    return resize_image_pixels(media, out_w=4, out_h=4)


# ---------------------------------------------------------------------------
# Wave 8: robust stats, AB testing, decayed counts, tokenizer/corpus audits,
# skyline, record linkage, in-plan PCA, bitext mining
# ---------------------------------------------------------------------------


@register(
    "weighted_median",
    """
    WITH w AS (
      SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS qty,
             SUM(CAST(FLOOR(l_extendedprice * 10000) AS BIGINT)) AS w
      FROM lineitem GROUP BY 1, 2
    ), c AS (
      SELECT l_returnflag, qty,
             SUM(w) OVER (PARTITION BY l_returnflag ORDER BY qty) AS cum,
             SUM(w) OVER (PARTITION BY l_returnflag) AS tot
      FROM w
    )
    SELECT l_returnflag, MIN(qty) AS weighted_median_qty
    FROM c WHERE cum * 2 >= tot
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc="Per-group WEIGHTED median (l_quantity weighted by extendedprice "
    "through the fixed-point bridge): the robust-stats verb price_quantiles "
    "and winsorize don't cover — each row votes with its weight. The value "
    "domain is BOUNDED (1..50), so the first shuffle collapses the fact "
    "table to |flags|x50 rows and the cumulative windows are metadata-scale "
    "— the scale-safe shape for weighted quantiles over discrete domains "
    "(continuous domains use the range-partition rank machinery instead, "
    "see equidepth_histogram).",
)
def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    w = li.groupBy(
        "l_returnflag", F.col("l_quantity").cast("long").alias("qty")
    ).agg(F.sum(F.floor(F.col("l_extendedprice") * 10000).cast("long")).alias("w"))
    win = Window.partitionBy("l_returnflag").orderBy("qty")
    tot = Window.partitionBy("l_returnflag")
    c = w.withColumn("cum", F.sum("w").over(win)).withColumn(
        "tot", F.sum("w").over(tot)
    )
    return (
        c.where(F.col("cum") * 2 >= F.col("tot"))
        .groupBy("l_returnflag")
        .agg(F.min("qty").alias("weighted_median_qty"))
        .orderBy("l_returnflag")
    )


@register(
    "proportion_ztest",
    """
    WITH g AS (
      SELECT
        SUM(CASE WHEN o_orderpriority < '3' THEN 1 ELSE 0 END) AS n1,
        SUM(CASE WHEN o_orderpriority < '3' AND o_orderstatus = 'F' THEN 1 ELSE 0 END) AS x1,
        SUM(CASE WHEN o_orderpriority >= '3' THEN 1 ELSE 0 END) AS n2,
        SUM(CASE WHEN o_orderpriority >= '3' AND o_orderstatus = 'F' THEN 1 ELSE 0 END) AS x2
      FROM orders
    )
    SELECT CAST(n1 AS BIGINT) AS n1, CAST(x1 AS BIGINT) AS x1,
      CAST(n2 AS BIGINT) AS n2, CAST(x2 AS BIGINT) AS x2,
      CAST(FLOOR(CAST(x1 AS DOUBLE) / n1 * 1000000) AS BIGINT) AS p1_sc,
      CAST(FLOOR(CAST(x2 AS DOUBLE) / n2 * 1000000) AS BIGINT) AS p2_sc,
      CAST(FLOOR(
        (CAST(x1 AS DOUBLE) / n1 - CAST(x2 AS DOUBLE) / n2)
        / sqrt((CAST(x1 + x2 AS DOUBLE) / (n1 + n2)) * (1 - CAST(x1 + x2 AS DOUBLE) / (n1 + n2))
               * (1.0 / n1 + 1.0 / n2)) * 1000000) AS BIGINT) AS z_sc
    FROM g
    """,
    doc="Two-proportion pooled z-test (A/B-test verb, the inferential "
    "counterpart of length_drift_ks): completion rate of high- vs "
    "low-priority orders in ONE conditional-agg scan. Every double is "
    "derived from int64 counts through a fixed expression tree "
    "(divisions + one sqrt, all IEEE-correctly-rounded), so the z "
    "statistic itself is bit-identical across engines — floored to fp "
    "only for rendering. At 100 TB the statistic needs four counters: "
    "trivially map-side-combined, no shuffle beyond one row.",
)
def q_proportion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    hi = (F.col("o_orderpriority") < "3").cast("long")
    lo = (F.col("o_orderpriority") >= "3").cast("long")
    fl = (F.col("o_orderstatus") == "F").cast("long")
    g = o.agg(
        F.sum(hi).alias("n1"),
        F.sum(hi * fl).alias("x1"),
        F.sum(lo).alias("n2"),
        F.sum(lo * fl).alias("x2"),
    )
    p1 = F.col("x1").cast("double") / F.col("n1")
    p2 = F.col("x2").cast("double") / F.col("n2")
    pp = (F.col("x1") + F.col("x2")).cast("double") / (F.col("n1") + F.col("n2"))
    z = (p1 - p2) / F.sqrt(pp * (1 - pp) * (1.0 / F.col("n1") + 1.0 / F.col("n2")))
    return g.select(
        "n1", "x1", "n2", "x2",
        F.floor(p1 * 1000000).cast("long").alias("p1_sc"),
        F.floor(p2 * 1000000).cast("long").alias("p2_sc"),
        F.floor(z * 1000000).cast("long").alias("z_sc"),
    )


@register(
    "trending_decay",
    """
    WITH mx AS (SELECT CAST(FLOOR(epoch(MAX(ts))) AS BIGINT) AS ref FROM events),
    w AS (
      SELECT event_type,
        1.0 / CAST(1::BIGINT << CAST(LEAST((mx.ref - CAST(FLOOR(epoch(ts)) AS BIGINT)) // 86400, 40) AS INT) AS DOUBLE) AS wt,
        value
      FROM events, mx
    )
    SELECT event_type,
      SUM(CAST(FLOOR(wt * 10000) AS BIGINT)) / 10000.0 AS decayed_count,
      SUM(CAST(FLOOR(value * wt * 10000) AS BIGINT)) / 10000.0 AS decayed_value
    FROM w GROUP BY event_type ORDER BY event_type
    """,
    doc="Exponentially time-decayed counts/sums per event type (trending "
    "detection, half-life = 1 day): weight = 2^-age_days built by INTEGER "
    "SHIFT (1::BIGINT << k), so the weight double is exact in both engines "
    "— no pow()/exp() last-ulp roulette — then through the fixed-point "
    "bridge. The reference timestamp is a 1-row broadcast scalar "
    "(allowlisted shape); ages are nonnegative so floor-div == trunc-div. "
    "One scan, one groupBy: decayed aggregation at 100 TB costs exactly "
    "what plain aggregation costs.",
)
def q_trending_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    mx = ev.agg(F.unix_timestamp(F.max("ts")).cast("long").alias("ref"))
    j = ev.crossJoin(F.broadcast(mx)).withColumn(
        "__k",
        F.least(
            F.floor(
                (F.col("ref") - F.unix_timestamp(F.col("ts")).cast("long")) / 86400
            ),
            F.lit(40),
        ).cast("int"),
    )
    wt = F.lit(1.0) / F.expr("shiftleft(CAST(1 AS BIGINT), __k)").cast("double")
    j = j.withColumn("__wt", wt)
    return (
        j.groupBy("event_type")
        .agg(
            (F.sum(F.floor(F.col("__wt") * 10000).cast("long")) / 10000.0).alias(
                "decayed_count"
            ),
            (
                F.sum(F.floor(F.col("value") * F.col("__wt") * 10000).cast("long"))
                / 10000.0
            ).alias("decayed_value"),
        )
        .orderBy("event_type")
    )


@register(
    "tokenizer_fertility",
    r"""
    WITH d AS (
      SELECT lang, n_chars,
             len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+')) AS n_tok,
             len(regexp_extract_all(text, '\S+')) AS n_words
      FROM documents
    )
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           CAST(SUM(n_words) AS BIGINT) AS n_words,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars,
           CAST(FLOOR(CAST(SUM(n_chars) AS DOUBLE) / GREATEST(SUM(n_tok), 1) * 10000) AS BIGINT) AS chars_per_token_sc,
           CAST(FLOOR(CAST(SUM(n_tok) AS DOUBLE) / GREATEST(SUM(n_words), 1) * 10000) AS BIGINT) AS tokens_per_word_sc
    FROM d GROUP BY lang ORDER BY lang
    """,
    doc="Tokenizer fertility audit per language: chars-per-token and "
    "tokens-per-whitespace-word under an alpha/digit-run pre-tokenizer "
    "(the GPT-2-regex family's coarse shape, ASCII classes only so Java "
    "regex and RE2 agree; whole-corpus chars come from the n_chars "
    "column, sidestepping UTF-16-vs-codepoint length divergence). "
    "Fertility drives token-budget planning — a lang whose "
    "chars-per-token drops is over-segmented and over-billed. Pure "
    "expression scan + one groupBy.",
)
def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _tp(spark, sf_dir, "documents")
    toks = F.size(
        F.regexp_extract_all(F.col("text"), F.lit(r"[A-Za-z]+|[0-9]+"), 0)
    ).cast("long")
    words = F.size(F.regexp_extract_all(F.col("text"), F.lit(r"\S+"), 0)).cast("long")
    g = (
        d.select("lang", "n_chars", toks.alias("n_tok"), words.alias("n_w"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
            F.sum("n_w").alias("n_words"),
            F.sum("n_chars").alias("n_chars"),
        )
    )
    cpt = F.col("n_chars").cast("double") / F.greatest(F.col("n_tokens"), F.lit(1))
    tpw = F.col("n_tokens").cast("double") / F.greatest(F.col("n_words"), F.lit(1))
    return g.select(
        "lang", "n_docs", "n_tokens", "n_words", "n_chars",
        F.floor(cpt * 10000).cast("long").alias("chars_per_token_sc"),
        F.floor(tpw * 10000).cast("long").alias("tokens_per_word_sc"),
    ).orderBy("lang")


@register(
    "oov_rate",
    """
    WITH toks AS (
      SELECT source, lower(t) AS tok
      FROM documents, UNNEST(regexp_extract_all(text, '[A-Za-z]+')) AS u(t)
    ), vocab AS (
      SELECT tok FROM (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok) tt
      ORDER BY c DESC, tok LIMIT 20
    )
    SELECT source, COUNT(*) AS total_tokens,
           CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS oov_tokens,
           CAST(FLOOR(CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
                      / COUNT(*) * 1000000) AS BIGINT) AS oov_rate_sc
    FROM toks LEFT JOIN vocab v USING (tok)
    GROUP BY source ORDER BY source
    """,
    doc="Out-of-vocabulary rate per source against a corpus-derived top-N "
    "vocabulary (N=20 so the synthetic ~31-token corpus yields a "
    "non-trivial OOV tail): the coverage audit run before freezing a "
    "tokenizer — a source with a high OOV rate will fragment into bytes. "
    "Tokens are extracted as ASCII alpha runs from the RAW text and "
    "lowercased per-token (lowercasing whole unicode text first would "
    "risk case-folding divergence between engines). Scale: the vocab is "
    "bounded (top-N via TakeOrdered) and broadcast; the token explode is "
    "linear; one groupBy per side. The token scan is persisted — read "
    "once for vocab, once for the join.",
)
def q_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.util import attach_cached_deps

    d = _tp(spark, sf_dir, "documents")
    toks = d.select(
        "source",
        F.explode(
            F.transform(
                F.regexp_extract_all(F.col("text"), F.lit(r"[A-Za-z]+"), 0),
                lambda t: F.lower(t),
            )
        ).alias("tok"),
    ).persist()
    vocab = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("tok"))
        .limit(20)
        .select("tok")
    )
    out = (
        toks.join(F.broadcast(vocab.withColumn("__in_v", F.lit(1))), "tok", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("total_tokens"),
            F.sum(F.when(F.col("__in_v").isNull(), 1).otherwise(0)).alias(
                "oov_tokens"
            ),
        )
    )
    rate = F.col("oov_tokens").cast("double") / F.col("total_tokens")
    out = out.select(
        "source", "total_tokens", "oov_tokens",
        F.floor(rate * 1000000).cast("long").alias("oov_rate_sc"),
    ).orderBy("source")
    return attach_cached_deps(out, [toks])


@register(
    "skyline_pareto",
    """
    WITH m AS (SELECT p_size, MIN(p_retailprice) AS mp FROM part GROUP BY p_size),
    s AS (
      SELECT p_size, mp,
             MIN(mp) OVER (ORDER BY p_size DESC
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mgt
      FROM m
    )
    SELECT p.p_partkey, p.p_size,
           CAST(FLOOR(p.p_retailprice * 100) AS BIGINT) AS price_c
    FROM part p JOIN s ON p.p_size = s.p_size
    WHERE NOT (p.p_retailprice > s.mp
               OR (s.mgt IS NOT NULL AND s.mgt <= p.p_retailprice))
    ORDER BY p.p_partkey
    """,
    doc="Skyline (Pareto frontier) query: parts not dominated on "
    "(minimize retailprice, maximize size) — the classic multi-criteria "
    "OLAP operator (Borzsony/Kossmann/Stocker ICDE'01). Scale-safe "
    "staircase form instead of the naive O(n^2) NOT-EXISTS self-join: "
    "one groupBy collapses the table to <=50 (size, min-price) rows, a "
    "metadata-scale running-min window builds the dominance staircase, "
    "and a broadcast join back applies the two dominance tests (same "
    "size, strictly cheaper: mp < p; strictly larger size, no more "
    "expensive: mgt <= p). Any bounded-domain criterion pair reduces the "
    "same way; continuous domains would bucket first.",
)
def q_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    m = p.groupBy("p_size").agg(F.min("p_retailprice").alias("mp"))
    w = Window.orderBy(F.desc("p_size")).rowsBetween(Window.unboundedPreceding, -1)
    s = m.withColumn("mgt", F.min("mp").over(w))  # <=50 rows: metadata-scale
    dominated = (F.col("p_retailprice") > F.col("mp")) | (
        F.col("mgt").isNotNull() & (F.col("mgt") <= F.col("p_retailprice"))
    )
    return (
        p.join(F.broadcast(s), "p_size")
        .where(~dominated)
        .select(
            "p_partkey",
            "p_size",
            F.floor(F.col("p_retailprice") * 100).cast("long").alias("price_c"),
        )
        .orderBy("p_partkey")
    )


@register(
    "embedding_truncation_audit",
    """
    WITH r AS (
      SELECT label,
        CAST(FLOOR(sqrt(list_dot_product(embedding[1:32]::DOUBLE[], embedding[1:32]::DOUBLE[]))
                   / sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                   * 1000000) AS BIGINT) AS e_sc
      FROM embeddings
      WHERE len(embedding) = 64
        AND list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0
    )
    SELECT label, COUNT(*) AS n_vecs,
           CAST(FLOOR(CAST(SUM(e_sc) AS DOUBLE) / COUNT(*)) AS BIGINT) AS avg_energy_sc,
           MIN(e_sc) AS min_energy_sc
    FROM r GROUP BY label ORDER BY label
    """,
    doc="Matryoshka (MRL) truncation audit: per label, the energy "
    "concentrated in the first 32 of 64 dims — by the cosine identity "
    "cos(full, zero-padded-truncation) = |trunc|/|full|, this IS the "
    "retrieval similarity an index built on truncated vectors preserves. "
    "Low avg/min energy => truncation unsafe for that population. "
    "Sequential-fold dot on the slice (bit-identical to DuckDB "
    "list_dot_product over DOUBLE[]), per-row fp floor, exact int "
    "aggregation; zero-norm and wrong-width vectors excluded in BOTH "
    "engines (the jl_projection hygiene rule). One scan, one groupBy.",
)
def q_embedding_truncation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.similarity import dot

    emb = _t(spark, sf_dir, "embeddings")
    d64 = dot(F.col("embedding"), F.col("embedding"))
    tr = F.slice(F.col("embedding"), 1, 32)
    d32 = dot(tr, tr)
    e_sc = F.floor(F.sqrt(d32) / F.sqrt(d64) * 1000000).cast("long")
    r = (
        emb.where((F.size("embedding") == 64) & (d64 > 0))
        .select("label", e_sc.alias("e_sc"))
    )
    return (
        r.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.floor(F.sum("e_sc").cast("double") / F.count(F.lit(1)))
            .cast("long")
            .alias("avg_energy_sc"),
            F.min("e_sc").alias("min_energy_sc"),
        )
        .orderBy("label")
    )


@register(
    "entity_resolution",
    """
    WITH p AS (
      SELECT p_partkey, split_part(p_name, ' ', 1) AS adj,
             split_part(p_name, ' ', 2) AS noun,
             p_brand, p_size, p_retailprice
      FROM part
    ), s AS (
      SELECT a.p_partkey AS a_key, b.p_partkey AS b_key,
        CAST(CASE WHEN levenshtein(a.adj, b.adj) <= 3 THEN 2 ELSE 0 END
           + CASE WHEN ABS(a.p_size - b.p_size) <= 2 THEN 2 ELSE 0 END
           + CASE WHEN ABS(a.p_retailprice - b.p_retailprice) <= 5.0 THEN 3 ELSE 0 END
           AS BIGINT) AS score
      FROM p a JOIN p b
        ON a.noun = b.noun AND a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
    )
    SELECT a_key, b_key, score FROM s WHERE score >= 5 ORDER BY a_key, b_key
    """,
    doc="Record linkage / entity resolution (operators/linkage.py "
    "part_linkage_pairs): Fellegi-Sunter-style blocked comparison — "
    "equi-join block on (noun-token, brand), then a weighted "
    "field-agreement score (fuzzy levenshtein on the first token, "
    "numeric tolerances on size/price) and a match threshold. The "
    "blocking join is a plain shuffle equi-join (no cartesian); block "
    "cardinality controls candidates, hot blocks cap like hot shingles. "
    "Distinct from the dedup tiers: multi-FIELD agreement over typed "
    "records, not single-text similarity.",
)
def q_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.linkage import part_linkage_pairs

    return part_linkage_pairs(_t(spark, sf_dir, "part"))


def _pca_power_oracle(dim: int = 64, iters: int = 8) -> str:
    """Unrolled-CTE DuckDB twin of similarity.pca_power_iteration: the
    Gram accumulation (per-row floor(x_i*x_j*1e6), int64 sums), the
    floor(S/n) normalization, and every integer iteration step are
    replayed exactly. CTEs are MATERIALIZED — DuckDB inlines CTEs by
    default and an inlined it{t} chain re-evaluates exponentially."""
    ctes = [
        f"""dims AS MATERIALIZED (SELECT unnest(generate_series(0, {dim - 1})) AS i),
    pairs AS MATERIALIZED (SELECT a.i AS i, b.i AS j FROM dims a CROSS JOIN dims b),
    valid AS MATERIALIZED (SELECT embedding FROM embeddings WHERE len(embedding) = {dim}),
    nn AS MATERIALIZED (SELECT COUNT(*) AS n FROM valid),
    s_raw AS MATERIALIZED (
      SELECT p.i, p.j,
             SUM(CAST(FLOOR(CAST(e.embedding[p.i + 1] AS DOUBLE)
                            * CAST(e.embedding[p.j + 1] AS DOUBLE)
                            * 1000000) AS BIGINT)) AS s
      FROM valid e CROSS JOIN pairs p GROUP BY p.i, p.j),
    s AS MATERIALIZED (SELECT i, j, CAST(FLOOR(CAST(s AS DOUBLE) / nn.n) AS BIGINT) AS s
          FROM s_raw, nn),
    it0 AS MATERIALIZED (SELECT i AS dim, CAST(1000000 AS BIGINT) AS v FROM dims)"""
    ]
    for t in range(1, iters + 1):
        ctes.append(
            f"""u{t} AS MATERIALIZED (SELECT s.i AS dim, CAST(SUM(s.s * p.v) AS BIGINT) AS u
             FROM s JOIN it{t - 1} p ON s.j = p.dim GROUP BY s.i),
    m{t} AS MATERIALIZED (SELECT MAX(ABS(u)) AS m FROM u{t}),
    it{t} AS MATERIALIZED (SELECT dim, CAST(FLOOR(CAST(u AS DOUBLE) * 1000000.0 / m.m) AS BIGINT) AS v
              FROM u{t}, m{t} m)"""
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f""",
    piv AS (SELECT v AS pv FROM it{iters}
            WHERE ABS(v) = (SELECT MAX(ABS(v)) FROM it{iters})
            ORDER BY dim LIMIT 1)
    SELECT f.dim, CASE WHEN p.pv < 0 THEN -f.v ELSE f.v END AS loading_sc,
           (SELECT m FROM m{iters}) AS lambda_sc
    FROM it{iters} f, piv p ORDER BY f.dim"""
    )


@register(
    "pca_power_iteration",
    _pca_power_oracle(),
    doc="Dominant principal direction of the embedding corpus "
    "(similarity.pca_power_iteration): distributed int64 Gram matrix "
    "via ONE linear mapInPandas scan with d^2 map-side state (shuffle = "
    "partitions x 4096 rows, never rows x 4096), then 8 all-integer "
    "power-iteration steps over the metadata-scale matrix (driver-side, "
    "the Lloyd's/BPE sanctioned-collect pattern). Every step is int64 "
    "or a fixed double expression, so the unrolled-CTE DuckDB oracle "
    "reproduces the loadings bit-for-bit — an ITERATIVE numerical "
    "algorithm under the full value-hash gate. Top-PC use: embedding "
    "whitening, all-but-the-top postprocessing, drift monitoring.",
)
def q_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.similarity import pca_power_iteration

    return pca_power_iteration(_t(spark, sf_dir, "embeddings"))


def _bitext_margin_oracle(
    dim: int = 64,
    num_planes: int = 4,
    num_bands: int = 4,
    k: int = 4,
    label_a: int = 0,
    label_b: int = 1,
    min_cos_sc: int = 300_000,
    min_margin_sc: int = 1_050_000,
    bucket_cap: int | None = DEFAULT_BUCKET_CAP,
) -> str:
    """DuckDB twin of similarity.bitext_margin_pairs: replays the banded
    sign-LSH gate (inlined deterministic planes, per-bucket membership
    bounded by the cap rank — similarity.cap_band_buckets' twin), the
    fp cosine, the per-side top-k averages, and the ratio margin.
    MATERIALIZED: scored is referenced three times."""
    cos = _cosine_sql("a.embedding::DOUBLE[]", "b.embedding::DOUBLE[]")
    margin = "CAST(FLOOR(CAST(cos_sc AS DOUBLE) / denom * 1000000) AS BIGINT)"
    return f"""
    WITH planes(band, pidx, pv) AS MATERIALIZED (VALUES
        {_banded_planes_sql(dim, num_planes, num_bands)}),
    va AS MATERIALIZED (SELECT vec_id, embedding FROM embeddings
           WHERE label = {label_a} AND len(embedding) = {dim}),
    vb AS MATERIALIZED (SELECT vec_id, embedding FROM embeddings
           WHERE label = {label_b} AND len(embedding) = {dim}),
    ab0 AS MATERIALIZED (SELECT vec_id, band,
             CAST(SUM(CASE WHEN list_dot_product(embedding::DOUBLE[], pv) >= 0
                           THEN 1::BIGINT << pidx ELSE 0 END) AS BIGINT) AS bucket
           FROM va CROSS JOIN planes GROUP BY vec_id, embedding, band),
    ab AS MATERIALIZED (SELECT vec_id, band, bucket FROM (
             SELECT vec_id, band, bucket,
                    row_number() OVER (PARTITION BY band, bucket
                      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS bkrn
             FROM ab0) WHERE bkrn <= {bucket_cap}),
    bb0 AS MATERIALIZED (SELECT vec_id, band,
             CAST(SUM(CASE WHEN list_dot_product(embedding::DOUBLE[], pv) >= 0
                           THEN 1::BIGINT << pidx ELSE 0 END) AS BIGINT) AS bucket
           FROM vb CROSS JOIN planes GROUP BY vec_id, embedding, band),
    bb AS MATERIALIZED (SELECT vec_id, band, bucket FROM (
             SELECT vec_id, band, bucket,
                    row_number() OVER (PARTITION BY band, bucket
                      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS bkrn
             FROM bb0) WHERE bkrn <= {bucket_cap}),
    cand AS MATERIALIZED (SELECT DISTINCT ab.vec_id AS a_id, bb.vec_id AS b_id
             FROM ab JOIN bb ON ab.band = bb.band AND ab.bucket = bb.bucket),
    scored AS MATERIALIZED (
      SELECT c.a_id, c.b_id, CAST(FLOOR(({cos}) * 1000000) AS BIGINT) AS cos_sc
      FROM cand c JOIN va a ON a.vec_id = c.a_id JOIN vb b ON b.vec_id = c.b_id),
    ra AS MATERIALIZED (SELECT a_id, SUM(cos_sc) AS sa, COUNT(*) AS ka FROM (
             SELECT a_id, cos_sc,
                    row_number() OVER (PARTITION BY a_id ORDER BY cos_sc DESC, b_id) AS rk
             FROM scored) t WHERE rk <= {k} GROUP BY a_id),
    rb AS MATERIALIZED (SELECT b_id, SUM(cos_sc) AS sb, COUNT(*) AS kb FROM (
             SELECT b_id, cos_sc,
                    row_number() OVER (PARTITION BY b_id ORDER BY cos_sc DESC, a_id) AS rk
             FROM scored) t WHERE rk <= {k} GROUP BY b_id),
    m AS MATERIALIZED (SELECT s.a_id, s.b_id, s.cos_sc,
             (CAST(ra.sa AS DOUBLE) / ra.ka + CAST(rb.sb AS DOUBLE) / rb.kb) / 2.0 AS denom
          FROM scored s JOIN ra ON ra.a_id = s.a_id JOIN rb ON rb.b_id = s.b_id)
    SELECT a_id, b_id, cos_sc, {margin} AS margin_sc
    FROM m
    WHERE denom > 0 AND cos_sc >= {min_cos_sc} AND {margin} >= {min_margin_sc}
    ORDER BY a_id, b_id
    """


@register(
    "bitext_margin_pairs",
    _bitext_margin_oracle(),
    doc="Margin-scored bitext mining between two corpora "
    "(similarity.bitext_margin_pairs; labels stand in for languages): "
    "the CCMatrix/LASER ratio-margin criterion margin = cos(x,y) / "
    "((avgk(x)+avgk(y))/2), which suppresses embedding-space hubs that "
    "raw cosine retrieval mis-mates (Artetxe & Schwenk). Candidates "
    "gated by shared sign-LSH band buckets (both sides banded with the "
    "same global planes), exact fp cosine on candidates, per-side top-k "
    "averages as bounded window frames. Corpus growth tunes bands, not "
    "planes — the with_lsh_bands scaling law. Margins are fixed "
    "expression trees over exact ints, so the replayed oracle "
    "hash-checks banding, cosine, top-k AND margin end to end.",
)
def q_bitext_margin_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.similarity import bitext_margin_pairs

    return bitext_margin_pairs(_t(spark, sf_dir, "embeddings"))

# ---------------------------------------------------------------------------
# Wave 9: association mining, inferential stats, readability, denoising
# examples, MDM survivorship, attribution, RFM segmentation
# ---------------------------------------------------------------------------

from pasta_pipeline_spark.operators.basket import basket_pair_lift_oracle_sql
from pasta_pipeline_spark.operators.stat_tests import (
    benford_oracle_sql,
    corr_matrix_oracle_sql,
    dow_oracle_sql,
    mann_whitney_oracle_sql,
)
from pasta_pipeline_spark.operators.readability import flesch_oracle_sql
from pasta_pipeline_spark.operators.denoising import span_corruption_oracle_sql
from pasta_pipeline_spark.operators.golden import golden_part_oracle_sql
from pasta_pipeline_spark.operators.attribution import last_touch_events_oracle_sql
from pasta_pipeline_spark.operators.rfm import rfm_oracle_sql


@register(
    "basket_lift",
    basket_pair_lift_oracle_sql("lineitem", "l_orderkey", "l_partkey"),
    doc="Market-basket association mining (operators/basket.py): top item "
    "pairs by lift over distinct (order, part) memberships. Pair "
    "generation is a self EQUI-join on the basket key bounded by basket "
    "size (never a cartesian); per-item counts are dimension-scale "
    "broadcasts and the basket total a 1-row scalar handoff. Lift is one "
    "exact double division of int64 products; deterministic "
    "(lift, pair) TakeOrdered top-k.",
)
def q_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.basket import basket_pair_lift

    return basket_pair_lift(_t(spark, sf_dir, "lineitem"), "l_orderkey", "l_partkey")


@register(
    "mann_whitney_qty",
    mann_whitney_oracle_sql(
        "lineitem", "l_quantity", "l_linestatus = 'O'", "l_linestatus = 'F'"
    ),
    doc="Mann-Whitney U rank-sum test (operators/stat_tests.py) between "
    "open and finished lineitems over the BOUNDED l_quantity domain: the "
    "fact table collapses to per-value conditional counts (<=50 rows), "
    "midranks come from cumulative counts DOUBLED so ties stay int64, "
    "and the tie-corrected normal z is a fixed double tree over exact "
    "counts. The nonparametric sibling of proportion_ztest — no "
    "fact-scale sort, no global rank window.",
)
def q_mann_whitney_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.stat_tests import mann_whitney_u

    return mann_whitney_u(
        _t(spark, sf_dir, "lineitem"),
        "l_quantity",
        F.col("l_linestatus") == "O",
        F.col("l_linestatus") == "F",
    )


@register(
    "benford_digit_test",
    benford_oracle_sql("orders", "o_totalprice"),
    doc="Benford first-significant-digit screen on order totals "
    "(operators/stat_tests.py): the fraud/anomaly test. Leading digit "
    "via decimal STRING rendering (no log10 on data); the nine expected "
    "proportions are shared literal constants so neither engine's "
    "transcendental library participates; chi-square contributions ride "
    "the fixed-point bridge and total over a bounded 9-row window. One "
    "conditional-agg scan at any scale.",
)
def q_benford_digit_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.stat_tests import benford_digit_test

    return benford_digit_test(_t(spark, sf_dir, "orders"), "o_totalprice")


@register(
    "dow_seasonality",
    dow_oracle_sql("orders", "o_orderdate", "o_totalprice"),
    doc="Day-of-week seasonality profile + chi-square uniformity test "
    "(operators/stat_tests.py): calendar heatmap row counts, exact cents "
    "revenue, share and chi-square contribution per weekday in ONE scan "
    "(7-row output, bounded window for the total). Oracle aligns "
    "DuckDB's 0-based dayofweek to Spark's 1=Sunday convention.",
)
def q_dow_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.stat_tests import dow_seasonality

    return dow_seasonality(_t(spark, sf_dir, "orders"), "o_orderdate", "o_totalprice")


@register(
    "corr_matrix",
    corr_matrix_oracle_sql(
        "lineitem",
        {
            "qty": "CAST(l_quantity AS BIGINT)",
            "price": "CAST(FLOOR(l_extendedprice) AS BIGINT)",
            "disc": "CAST(ROUND(l_discount * 100) AS BIGINT)",
            "tax": "CAST(ROUND(l_tax * 100) AS BIGINT)",
        },
    ),
    doc="Pairwise Pearson correlation matrix over integer-bridged "
    "lineitem measures (operators/stat_tests.py): ONE aggregate scan "
    "collects every sum/sum-sq/cross-product as exact int64 (the "
    "qty_price_regression moment discipline generalized to all 6 pairs), "
    "then each r is a fixed double tree — products taken in double so no "
    "int64 overflow at any n. Map-side combine only; a 100 TB corr "
    "matrix costs one count.",
)
def q_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.stat_tests import pearson_corr_matrix

    li = _t(spark, sf_dir, "lineitem")
    return pearson_corr_matrix(
        li,
        {
            "qty": F.col("l_quantity").cast("long"),
            "price": F.floor(F.col("l_extendedprice")).cast("long"),
            "disc": F.round(F.col("l_discount") * 100).cast("long"),
            "tax": F.round(F.col("l_tax") * 100).cast("long"),
        },
    )


@register(
    "readability_flesch",
    flesch_oracle_sql(),
    doc="Flesch reading-ease readability tiers per language "
    "(operators/readability.py): the FineWeb-Edu-shaped difficulty "
    "signal the quality ladder lacked — deterministic regex counting "
    "(\\S+ words, [.!?]+ sentences, vowel-group syllables), the classic "
    "206.835 formula as a fixed double tree over int64 counts, "
    "easy/standard/hard tier counts + fixed-point mean per lang. Pure "
    "map-side expressions, one |langs|-row shuffle.",
)
def q_readability_flesch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.readability import flesch_by_lang

    return flesch_by_lang(_tp(spark, sf_dir, "documents"))


@register(
    "span_corruption",
    span_corruption_oracle_sql(),
    doc="T5/UL2 span-corruption training examples "
    "(operators/denoising.py; Raffel et al. 1910.10683 §3.1.4): ~15% of "
    "token positions masked by the md5-deterministic uniform (sampling's "
    "idiom — regenerable bit-identically on any cluster layout), "
    "adjacent masks merged to spans via gaps-and-islands (pos − rank, no "
    "self-join), sentinel <extra_id_k> rewriting for input and target. "
    "All windows/groups are doc_id-partitioned (millions of small "
    "groups); three reusable doc_id shuffles. The oracle replays mask "
    "choice, span merge, and both reassembled strings.",
)
def q_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.denoising import span_corruption_examples

    return span_corruption_examples(_tp(spark, sf_dir, "documents"))


_ER_PAIRS_SQL = """
      SELECT a.p_partkey AS a_key, b.p_partkey AS b_key
      FROM (SELECT p_partkey, split_part(p_name, ' ', 1) AS adj,
                   split_part(p_name, ' ', 2) AS noun, p_brand, p_size,
                   p_retailprice FROM part) a
      JOIN (SELECT p_partkey, split_part(p_name, ' ', 1) AS adj,
                   split_part(p_name, ' ', 2) AS noun, p_brand, p_size,
                   p_retailprice FROM part) b
        ON a.noun = b.noun AND a.p_brand = b.p_brand
       AND a.p_partkey < b.p_partkey
      WHERE (CASE WHEN levenshtein(a.adj, b.adj) <= 3 THEN 2 ELSE 0 END
           + CASE WHEN ABS(a.p_size - b.p_size) <= 2 THEN 2 ELSE 0 END
           + CASE WHEN ABS(a.p_retailprice - b.p_retailprice) <= 5.0 THEN 3 ELSE 0 END) >= 5
"""


@register(
    "golden_records",
    golden_part_oracle_sql(_ER_PAIRS_SQL),
    doc="MDM golden-record survivorship (operators/golden.py): closes "
    "entity_resolution's matched pairs into clusters via the hardened "
    "min-label-propagation CC (text_dedup.duplicate_clusters), then "
    "elects canonical field values by (count DESC, value ASC) mode rank "
    "— match, cluster, survive. Clusters are blocking-key-bounded so "
    "every survivorship window is a handful of rows; the oracle replays "
    "the closure with the recursive-CTE CC pattern plus per-field mode "
    "election.",
)
def q_golden_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.golden import golden_part_records

    return golden_part_records(_t(spark, sf_dir, "part"))


@register(
    "attribution_last_touch",
    last_touch_events_oracle_sql(),
    doc="Last-touch marketing attribution (operators/attribution.py): "
    "each purchase event credits the user's latest non-purchase touch "
    "at-or-before it via the audited as-of join (union+window form, one "
    "user-key shuffle), '(none)' bucket keeps totals reconcilable, "
    "revenue rides the exact cents bridge and shares a 1-row scalar "
    "handoff. DuckDB ASOF LEFT JOIN is the oracle.",
)
def q_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.attribution import last_touch_attribution

    ev = _t(spark, sf_dir, "events")
    convs = ev.where(F.col("event_type") == "purchase")
    touches = ev.where(F.col("event_type") != "purchase")
    return last_touch_attribution(
        convs,
        touches,
        conv_user_col="user_id",
        conv_ts_col="ts",
        amount_col="value",
    )


@register(
    "rfm_segments",
    rfm_oracle_sql(),
    doc="RFM customer segmentation (operators/rfm.py): recency/frequency/"
    "monetary quintile scores concatenated to the classic 555-is-best "
    "segment code, rolled up with exact cents sums. The three quintile "
    "assignments reuse the range-partition + driver-prefix-sum rank "
    "machinery (ids.assign_sequential_ids) with the equidepth closed-form "
    "tile quotient in pure int64 `div` — NO empty-partition ntile window "
    "anywhere, so a 100 TB customer dimension never funnels through one "
    "task. Oracle uses plain ntile(5) over identical total orders.",
)
def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.rfm import rfm_segments

    return rfm_segments(_t(spark, sf_dir, "orders"))


# ---------------------------------------------------------------------------
# Wave 10: user journeys & temporal lags, RAKE keyphrases, contrastive
# data prep (hard negatives / nearest-centroid confusion), seasonal
# decomposition
# ---------------------------------------------------------------------------

from pasta_pipeline_spark.operators.journeys import (
    conversion_lag_oracle_sql,
    journey_paths_oracle_sql,
    shipping_lag_oracle_sql,
)
from pasta_pipeline_spark.operators.keywords import rake_oracle_sql
from pasta_pipeline_spark.operators.seasonal import weekly_seasonal_oracle_sql


@register(
    "journey_paths",
    journey_paths_oracle_sql(path_len=4, top_k=20),
    doc="Top first-4-event user-journey paths (operators/journeys.py): "
    "the sankey-input query. Per-user window is millions-of-small-groups "
    "(each user's first 4 events), then one vocabulary-scale path "
    "rollup; the grand total rides a 1-row broadcast scalar handoff. "
    "Shares floored to fixed point; ties broken by path text.",
)
def q_journey_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.journeys import user_journey_paths

    return user_journey_paths(_t(spark, sf_dir, "events"), path_len=4, top_k=20)


@register(
    "conversion_lag",
    conversion_lag_oracle_sql(),
    doc="Purchase-to-prior-view latency histogram (operators/journeys.py): "
    "the as-of join (operators/asof.py) turned into a time-to-convert "
    "distribution with cumulative share. The fact table collapses to a "
    "bounded per-hour count frame before any window; no-prior-view "
    "purchases land at lag -1. Oracle uses DuckDB's native ASOF LEFT "
    "JOIN against the same deduped view spine.",
)
def q_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.journeys import conversion_lag_profile

    return conversion_lag_profile(_t(spark, sf_dir, "events"))


@register(
    "shipping_lag_quartiles",
    shipping_lag_oracle_sql(),
    doc="Exact order-to-ship day-gap quartiles per priority "
    "(operators/journeys.py): the weighted-median cumulative-counts idiom "
    "over the bounded gap domain — the order-key join shuffles once, "
    "then quartiles come from per-(priority, gap) counts, never a "
    "fact-scale sort or approx_percentile.",
)
def q_shipping_lag_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.journeys import shipping_lag_quartiles

    return shipping_lag_quartiles(
        _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "lineitem")
    )


@register(
    "rake_keyphrases",
    rake_oracle_sql("documents", top_k=3),
    doc="RAKE keyphrase extraction (operators/keywords.py, Rose et al. "
    "2010): candidate phrases are stopword-delimited content runs "
    "(gaps-and-islands pos-minus-rank grouping), each word scores "
    "deg/freq over the corpus-level VOCABULARY-scale stats frame, and "
    "each doc keeps its top-3 phrases. Scores ride the fixed-point "
    "bridge (floor(deg*1e6/freq) int64 per occurrence) so both engines "
    "sum integers.",
)
def q_rake_keyphrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.keywords import rake_keyphrases

    return rake_keyphrases(_tp(spark, sf_dir, "documents"), top_k=3)


def _hard_negatives_oracle(
    dim: int = 64,
    k: int = 3,
    num_planes: int = 4,
    num_bands: int = 4,
    bucket_cap: int | None = DEFAULT_BUCKET_CAP,
    same_label: bool = False,
) -> str:
    """DuckDB twin of negatives.hard_negative_mining: replay the banded
    sign-LSH candidate gate (deterministic inlined planes, the
    _semantic_dedup_oracle technique) with the different-label
    restriction, then exact cosines and a per-anchor top-k."""
    cos = _cosine_sql("sa.embedding::DOUBLE[]", "sb.embedding::DOUBLE[]")
    return f"""
    WITH planes(band, pidx, pv) AS (VALUES
        {_banded_planes_sql(dim, num_planes, num_bands)}),
    src AS (
      SELECT vec_id, label, embedding FROM embeddings
      WHERE len(embedding) = {dim}
    ),
    eb0 AS (
      SELECT vec_id, band,
             CAST(SUM(CASE WHEN list_dot_product(embedding::DOUBLE[], pv) >= 0
                           THEN 1::BIGINT << pidx ELSE 0 END) AS BIGINT) AS bucket
      FROM src CROSS JOIN planes GROUP BY vec_id, embedding, band
    ),
    eb AS (
      SELECT vec_id, band, bucket FROM (
        SELECT vec_id, band, bucket,
               row_number() OVER (PARTITION BY band, bucket
                 ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS bkrn
        FROM eb0)
      WHERE bkrn <= {bucket_cap}
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS anchor_id, b.vec_id AS neg_id,
                      sb.label AS neg_label
      FROM eb a JOIN eb b ON a.band = b.band AND a.bucket = b.bucket
      JOIN src sa ON sa.vec_id = a.vec_id
      JOIN src sb ON sb.vec_id = b.vec_id
      WHERE {"sa.label = sb.label AND a.vec_id <> b.vec_id" if same_label else "sa.label <> sb.label"}
    ),
    scored AS (
      SELECT c.anchor_id, c.neg_id, c.neg_label,
             CAST(FLOOR({cos} * 1000000) AS BIGINT) AS cos_sc
      FROM cand c
      JOIN src sa ON sa.vec_id = c.anchor_id
      JOIN src sb ON sb.vec_id = c.neg_id
    )
    SELECT anchor_id, CAST(rnk AS BIGINT) AS rnk, neg_id, neg_label, cos_sc
    FROM (
      SELECT *, row_number() OVER (PARTITION BY anchor_id
                ORDER BY cos_sc DESC, neg_id ASC) AS rnk
      FROM scored
    ) WHERE rnk <= {k}
    ORDER BY anchor_id, rnk
    """


@register(
    "hard_negatives",
    _hard_negatives_oracle(),
    doc="Hard-negative mining for contrastive training "
    "(operators/negatives.py): per anchor, the top-3 most-similar "
    "DIFFERENT-label vectors, candidates gated by OR-of-4-bands "
    "sign-LSH bucket collisions (the semantic_dedup scaling structure — "
    "recall grows with bands, candidate volume stays near-linear, never "
    "a cartesian). Only candidates pay the exact fold cosine; the "
    "per-anchor top-k is an anchor-partitioned bounded window.",
)
def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.negatives import hard_negative_mining

    return hard_negative_mining(_t(spark, sf_dir, "embeddings"))


def _nearest_centroid_oracle(dim: int = 64) -> str:
    """DuckDB twin of negatives.nearest_centroid_report: same
    floor(v*1e7) int64 component sums per label, same sequential-fold
    double cosine of vector vs centroid-sum, same smallest-label tie
    break and row-share rendering."""
    return f"""
    WITH src AS (
      SELECT vec_id, label, embedding FROM embeddings
      WHERE len(embedding) = {dim}
    ),
    fp AS (
      SELECT vec_id, label,
             list_transform(embedding,
               v -> CAST(FLOOR(CAST(v AS DOUBLE) * 10000000) AS BIGINT)) AS vfp
      FROM src
    ),
    idx AS (
      SELECT label AS lbl, vfp, unnest(generate_series(1, len(vfp))) AS p
      FROM fp
    ),
    sums AS (
      SELECT lbl, p, CAST(SUM(vfp[p]) AS BIGINT) AS s
      FROM idx GROUP BY lbl, p
    ),
    cent AS (
      SELECT lbl AS clbl, array_agg(s ORDER BY p) AS carr
      FROM sums GROUP BY lbl
    ),
    scored AS (
      SELECT f.vec_id, f.label AS lbl, c.clbl,
             CASE WHEN sqrt(list_dot_product(f.vfp::DOUBLE[], f.vfp::DOUBLE[]))
                       * sqrt(list_dot_product(c.carr::DOUBLE[], c.carr::DOUBLE[])) > 0
                  THEN CAST(FLOOR(
                    list_dot_product(f.vfp::DOUBLE[], c.carr::DOUBLE[])
                    / (sqrt(list_dot_product(f.vfp::DOUBLE[], f.vfp::DOUBLE[]))
                       * sqrt(list_dot_product(c.carr::DOUBLE[], c.carr::DOUBLE[])))
                    * 1000000) AS BIGINT) END AS cos_sc
      FROM fp f CROSS JOIN cent c
    ),
    pred AS (
      SELECT lbl AS true_label, clbl AS pred_label
      FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                  ORDER BY cos_sc DESC, clbl ASC) AS rn
        FROM scored WHERE cos_sc IS NOT NULL
      ) WHERE rn = 1
    ),
    conf AS (
      SELECT true_label, pred_label, COUNT(*) AS n
      FROM pred GROUP BY true_label, pred_label
    )
    SELECT true_label, pred_label, n,
           CAST(FLOOR(CAST(n AS DOUBLE)
                / CAST(SUM(n) OVER (PARTITION BY true_label) AS DOUBLE)
                * 1000000) AS BIGINT) AS share_sc
    FROM conf ORDER BY true_label, pred_label
    """


@register(
    "nearest_centroid_confusion",
    _nearest_centroid_oracle(),
    doc="Nearest-centroid confusion matrix (operators/negatives.py): "
    "assign every vector to its nearest label centroid — cosine of "
    "SUMS, so centroid state is |labels| x d int64 fixed-point "
    "component sums broadcast back — and cross-tab predicted vs true "
    "label: the label-noise screen in embedding space "
    "(source_nb_confusion's counterpart). One explode-sum pass plus "
    "one broadcast-scored scan at any scale.",
)
def q_nearest_centroid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.negatives import nearest_centroid_report

    return nearest_centroid_report(_t(spark, sf_dir, "embeddings"))


@register(
    "weekly_seasonality",
    weekly_seasonal_oracle_sql(),
    doc="STL-lite additive seasonal decomposition of daily revenue "
    "(operators/seasonal.py): centered 7-day trend (kept x7 in int64, "
    "calendar-gap guarded), per-weekday seasonal index, residual "
    "z-outliers. The fact table collapses to per-day cents sums first, "
    "so every window is |days|-row metadata scale — the documented "
    "bounded-domain exemption to the no-empty-partition-window rule.",
)
def q_weekly_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.seasonal import weekly_seasonal_decomposition

    return weekly_seasonal_decomposition(_t(spark, sf_dir, "orders"))


# ---------------------------------------------------------------------------
# Wave 11 (r8): governance, engagement, periodicity, corpus stoplists
# ---------------------------------------------------------------------------

from pasta_pipeline_spark.operators.engagement import (  # noqa: E402
    dau_mau_oracle_sql,
    interarrival_oracle_sql,
)
from pasta_pipeline_spark.operators.governance import (  # noqa: E402
    four_fifths_oracle_sql,
    k_anonymity_oracle_sql,
)
from pasta_pipeline_spark.operators.text_analysis import (  # noqa: E402
    stopword_discovery_oracle_sql,
)
from pasta_pipeline_spark.operators.timeseries import (  # noqa: E402
    daily_acf_oracle_sql,
)


@register(
    "k_anonymity_audit",
    k_anonymity_oracle_sql("customer", ["c_nationkey", "c_mktsegment"], k=5),
    doc="k-anonymity re-identification audit (operators/governance.py, "
    "Sweeney 2002) over the (nation, market segment) quasi-identifiers "
    "of the customer table: equivalence-class size histogram with the "
    "at-risk (size < k) mass. One groupBy + a bounded distinct-size "
    "frame at any scale.",
)
def q_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.governance import k_anonymity_report

    cust = _t(spark, sf_dir, "customer")
    return k_anonymity_report(cust, ["c_nationkey", "c_mktsegment"], k=5)


@register(
    "quality_disparity",
    four_fifths_oracle_sql(
        "documents", "source", "n_chars >= 200 AND n_chars <= 20000"
    ),
    doc="Four-fifths adverse-impact screen (operators/governance.py) on "
    "a length quality gate per document source: selection rates, ratio "
    "to the best-rate source, and the EEOC 4/5 flag via the exact "
    "cross-multiplied integer test (5*pass*ref_n < 4*ref_pass*n) — the "
    "curation-bias audit for corpus filters. 1-row broadcast reference "
    "scalar (audited crossJoin handoff).",
)
def q_quality_disparity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.governance import four_fifths_disparity

    docs = _t(spark, sf_dir, "documents")
    return four_fifths_disparity(
        docs, "source", (F.col("n_chars") >= 200) & (F.col("n_chars") <= 20000)
    )


@register(
    "dau_mau_stickiness",
    dau_mau_oracle_sql(),
    doc="Per-month DAU/MAU engagement rollup (operators/engagement.py): "
    "average daily actives, monthly actives, and the stickiness ratio — "
    "pure distinct-count rollups at day/month grain, every frame "
    "bounded by the calendar.",
)
def q_dau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.engagement import dau_mau_stickiness

    return dau_mau_stickiness(_t(spark, sf_dir, "events"))


@register(
    "interarrival_profile",
    interarrival_oracle_sql(),
    doc="Per-event-type inter-arrival cadence profile (operators/"
    "engagement.py): exact epoch-microsecond gaps between a user's "
    "consecutive same-type events, p50/p90/max picked closed-form from "
    "the per-type cumulative gap histogram (bounded value-domain "
    "frames, never an empty-OVER ntile). Session-timeout tuning and "
    "bot-cadence detection.",
)
def q_interarrival_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.engagement import interarrival_profile

    return interarrival_profile(_t(spark, sf_dir, "events"))


@register(
    "acf_daily_revenue",
    daily_acf_oracle_sql("orders", "o_orderdate", "o_totalprice", max_lag=7),
    doc="Sample autocorrelation of daily revenue at calendar lags 1..7 "
    "(operators/timeseries.py): pairwise-complete Pearson r per lag via "
    "calendar-exact date_sub equi-joins of the |days|-row rollup "
    "against itself — the periodicity detector feeding "
    "weekly_seasonality. Co-moments in decimal(38,0), r as the fixed "
    "double tree.",
)
def q_acf_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.timeseries import daily_autocorrelation

    return daily_autocorrelation(
        _t(spark, sf_dir, "orders"), "o_orderdate", "o_totalprice", max_lag=7
    )


@register(
    "stopword_discovery",
    stopword_discovery_oracle_sql(),
    doc="Corpus-driven stopword candidates (operators/text_analysis.py): "
    "top-50 tokens by document frequency with df-ratio and per-doc "
    "burstiness, flagged at df >= 50% of the corpus — the language-"
    "agnostic stoplist the quality tiers would derive per language at "
    "100 TB. One explode, two term-grain groupBys, deterministic "
    "TakeOrdered.",
)
def q_stopword_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.text_analysis import stopword_discovery

    return stopword_discovery(_tp(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Wave 12 (r8): curriculum, concentration, bot cadence, contrastive positives
# ---------------------------------------------------------------------------

from pasta_pipeline_spark.operators.curriculum import (  # noqa: E402
    curriculum_oracle_sql,
)
from pasta_pipeline_spark.operators.engagement import (  # noqa: E402
    bot_cadence_oracle_sql,
)
from pasta_pipeline_spark.operators.stats import lorenz_oracle_sql  # noqa: E402


@register(
    "curriculum_phases",
    curriculum_oracle_sql(),
    doc="Equal-token-budget curriculum phases (operators/curriculum.py, "
    "Bengio et al. 2009 ordering with mean-token-length difficulty): "
    "corpus collapses to a bounded difficulty-grain histogram, "
    "cumulative token sums over that frame, closed-form phase "
    "quotient — phase 0 holds the easiest quarter of TOKENS. No "
    "fact-scale window.",
)
def q_curriculum_phases(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.curriculum import curriculum_phases

    return curriculum_phases(_tp(spark, sf_dir, "documents"))


@register(
    "revenue_lorenz_deciles",
    lorenz_oracle_sql(),
    doc="Customer-revenue Lorenz deciles (operators/stats.py): rank "
    "customers by spend via the range-partition + driver-prefix-sum id "
    "machinery (never an empty-OVER ntile), closed-form equal-depth "
    "decile quotient, per-decile + cumulative revenue shares over the "
    "10-row frame — the 80/20 concentration read.",
)
def q_revenue_lorenz_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.stats import revenue_lorenz_deciles

    return revenue_lorenz_deciles(_t(spark, sf_dir, "orders"))


@register(
    "bot_cadence",
    bot_cadence_oracle_sql(),
    doc="Per-user automation screen (operators/engagement.py): median "
    "inter-event gap from exact epoch-microsecond diffs (closed-form "
    "pick over per-user gap histograms — partitions bounded by a "
    "user's own history), events/hour over the active span, and the "
    "machine-cadence flag. Robust: a bot cannot hide a sub-second "
    "median behind long pauses.",
)
def q_bot_cadence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.engagement import bot_cadence_report

    return bot_cadence_report(_t(spark, sf_dir, "events"))


@register(
    "contrastive_positives",
    _hard_negatives_oracle(same_label=True),
    doc="Positive-pair mining for contrastive training (operators/"
    "negatives.py, same_label=True): per anchor the top-3 nearest "
    "SAME-label vectors (self excluded) through the identical capped "
    "sign-LSH gate as hard_negatives — the other half of an "
    "InfoNCE/SimCSE training set, hash-checked against the same "
    "replayed oracle with the label predicate flipped.",
)
def q_contrastive_positives(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.negatives import hard_negative_mining

    return hard_negative_mining(_t(spark, sf_dir, "embeddings"), same_label=True)


# ---------------------------------------------------------------------------
# Wave 13 (r8): curation prioritization — ensemble scoring, quality-aware
# survivorship, per-source dedup funnel
# ---------------------------------------------------------------------------

from pasta_pipeline_spark.operators.ensemble import (  # noqa: E402
    ensemble_deciles_oracle_sql,
    quality_survivors_oracle_sql,
    source_funnel_oracle_sql,
)


@register(
    "quality_ensemble_deciles",
    ensemble_deciles_oracle_sql(),
    doc="Fixed-weight quality-ensemble score deciles (operators/"
    "ensemble.py): portable int64 features (length, gate-stopword "
    "hits, mean token length via the shared floor-double tree, "
    "sentence punctuation) combined with frozen literal weights, "
    "bucketed equal-depth via the range-partition rank machinery — "
    "the hand-weighted stand-in for a FineWeb-style classifier score, "
    "riding the exact bucketing a learned score would use.",
)
def q_quality_ensemble_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.ensemble import quality_ensemble_deciles

    return quality_ensemble_deciles(_tp(spark, sf_dir, "documents"))


@register(
    "quality_dedup_survivors",
    quality_survivors_oracle_sql(),
    doc="Quality-aware near-dup survivorship (operators/ensemble.py): "
    "within each lede-fingerprint group (first 8 normalized tokens — "
    "the syndication/template shape) the highest-ensemble-score "
    "member survives (score desc, id asc); election above the exact "
    "rung, where raw-text scores actually differ — the curation "
    "counterpart of golden-record mode election. Survivor window "
    "partitions by content hash only.",
)
def q_quality_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.ensemble import quality_dedup_survivors

    return quality_dedup_survivors(_tp(spark, sf_dir, "documents"))


@register(
    "source_dedup_funnel",
    source_funnel_oracle_sql(),
    doc="Per-source dedup-ladder survival (operators/ensemble.py): raw "
    "-> exact-text -> normalized-text survivor counts with corpus-wide "
    "min-id survivorship, cross-source losses charged to the losing "
    "source — the ablation row that identifies the copy-farm feed. One "
    "groupBy per rung, left-joined so zero-survivor sources keep their "
    "row.",
)
def q_source_dedup_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.ensemble import source_dedup_funnel

    return source_dedup_funnel(_tp(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Wave 14 (r8): packing-waste accounting, dup-graph transitivity audit
# ---------------------------------------------------------------------------

from pasta_pipeline_spark.operators.chunking import (  # noqa: E402
    packing_waste_oracle_sql,
)
from pasta_pipeline_spark.operators.graph import (  # noqa: E402
    transitivity_oracle_sql,
)


@register(
    "packing_waste",
    packing_waste_oracle_sql(),
    doc="Context-window padding-waste accounting (operators/chunking.py): "
    "per source, pad tokens of the no-packing ceil(n_tok/512) baseline "
    "and the waste share — the number that justifies sequence packing "
    "(compare greedy_pack's efficiency). Pure integer arithmetic, one "
    "scan + one groupBy.",
)
def q_packing_waste(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.chunking import packing_waste_report

    return packing_waste_report(_tp(spark, sf_dir, "documents"))


@register(
    "dup_graph_transitivity",
    transitivity_oracle_sql(_JACCARD_ORACLE),
    doc="Dedup-threshold consistency audit (operators/graph.py): global "
    "transitivity 3*triangles/wedges of the exact 3-gram Jaccard>=0.5 "
    "near-dup graph. High = clean clusters (a~b, b~c implies a~c); low "
    "= chain components that transitive closure will over-merge. "
    "Triangles ride the degree-oriented wedge join (hub fan-out "
    "bounded O(sqrt(E))); final combine is two 1-row broadcast "
    "handoffs.",
)
def q_dup_graph_transitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.graph import transitivity_report
    from pasta_pipeline_spark.operators.text_dedup import jaccard_pairs

    docs = _tp(spark, sf_dir, "documents")
    pairs = jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5).select(
        "doc_a", "doc_b"
    )
    return transitivity_report(pairs)


# ---------------------------------------------------------------------------
# Wave 15 (r8): l-diversity, randomized response, term burstiness
# ---------------------------------------------------------------------------

from pasta_pipeline_spark.operators.governance import (  # noqa: E402
    l_diversity_oracle_sql,
    randomized_response_oracle_sql,
)
from pasta_pipeline_spark.operators.text_analysis import (  # noqa: E402
    term_burstiness_oracle_sql,
)


@register(
    "l_diversity_audit",
    l_diversity_oracle_sql(
        "customer",
        ["c_nationkey", "c_mktsegment"],
        "FLOOR(c_acctbal / 1000)",
        l=3,
    ),
    doc="l-diversity homogeneity-attack audit (operators/governance.py, "
    "Machanavajjhala 2007) over the same (nation, segment) "
    "quasi-identifiers as k_anonymity_audit, sensitive attribute = "
    "account-balance thousand band: per-class distinct-sensitive "
    "histogram with the at-risk (l < 3) disclosure mass — the screen "
    "k-anonymity misses when a big class is value-homogeneous. One "
    "groupBy + bounded distinct-level frame.",
)
def q_l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.governance import l_diversity_report

    cust = _t(spark, sf_dir, "customer").withColumn(
        "__sens", F.floor(F.col("c_acctbal") / 1000)
    )
    return l_diversity_report(
        cust, ["c_nationkey", "c_mktsegment"], "__sens", l=3
    )


@register(
    "randomized_response_counts",
    randomized_response_oracle_sql("events", "event_id", "event_type"),
    doc="Warner randomized-response mechanism + debias audit "
    "(operators/governance.py, Warner 1965 direct-encoding k-ary): "
    "each event reports its true type w.p. 3/4 else an md5-uniform "
    "other type; per-type noisy counts and the unbiased estimate "
    "n_hat = (c*den*(k-1) - (den-num)*n)/(num*(k-1) - (den-num)) with "
    "abs error vs truth — the local-DP utility curve, fully "
    "deterministic (noise is md5-derived) hence oracle-checkable. One "
    "broadcast spine join + one groupBy at any scale.",
)
def q_randomized_response_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.governance import (
        randomized_response_counts,
    )

    ev = _t(spark, sf_dir, "events")
    return randomized_response_counts(ev, "event_id", "event_type")


@register(
    "term_burstiness",
    term_burstiness_oracle_sql(),
    doc="Term burstiness / index of dispersion, zeros included "
    "(operators/text_analysis.py): variance-to-mean ratio of per-doc "
    "counts for the top-40 terms by collection frequency — separates "
    "bursty content words (D >> 1) from Poisson-like function words "
    "(D ~ 1); high-df high-D terms are template artifacts. int64 "
    "counts, decimal(38,0) sum-of-squares, TakeOrdered top-k, 1-row "
    "broadcast N handoff.",
)
def q_term_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.text_analysis import term_burstiness

    docs = _tp(spark, sf_dir, "documents")
    return term_burstiness(docs, "doc_id", "text", top_k=40)


# ---------------------------------------------------------------------------
# Wave 16 (r8): in-plan GD training, Kaplan-Meier survival, Holt forecast
# ---------------------------------------------------------------------------

from pasta_pipeline_spark.operators.mlplan import (  # noqa: E402
    logistic_gd_oracle_sql,
)
from pasta_pipeline_spark.operators.survival import (  # noqa: E402
    km_shipping_oracle_sql,
)
from pasta_pipeline_spark.operators.timeseries import (  # noqa: E402
    holt_revenue_oracle_sql,
)


@register(
    "logistic_quality_gd",
    logistic_gd_oracle_sql(steps=5, lr_num=2),
    doc="In-plan classifier training (operators/mlplan.py): full-batch "
    "gradient descent on a softsign-link quasi-logistic model imitating "
    "a length quality gate (the fastText-classifier distillation "
    "shape) — one moments scan standardizes features into clipped "
    "milli-sigma int64, then 5 unrolled GD steps, each one full-scan "
    "aggregate whose 1-row gradient broadcasts back. All-integer "
    "updates (decimal(38,0) accumulate, signed div parity) make the "
    "TRAINING RUN itself value-hash oracle-checkable; output is the "
    "learning curve (step, weights, accuracy: 51% -> 99%+).",
)
def q_logistic_quality_gd(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.mlplan import (
        doc_gate_features,
        logistic_gd_report,
        standardize_features,
    )

    docs = _tp(spark, sf_dir, "documents")
    feats = standardize_features(doc_gate_features(docs), ["f1", "f2"])
    return logistic_gd_report(feats, steps=5, lr_num=2)


@register(
    "kaplan_meier_shipping",
    km_shipping_oracle_sql(cutoff=90),
    doc="Kaplan-Meier product-limit survival curve (operators/"
    "survival.py, Kaplan & Meier 1958) over order-to-ship lag with "
    "administrative right-censoring at 90 days: per distinct duration "
    "the at-risk count, events, censored mass, and S(t) via the exact "
    "int64 fixed-point product fold (aggregate HOF over the bounded "
    "<=91-row frame; DuckDB twin is the same recurrence as a recursive "
    "CTE). Negative lags fail closed.",
)
def q_kaplan_meier_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.survival import (
        kaplan_meier,
        order_ship_durations,
    )

    li = _t(spark, sf_dir, "lineitem")
    od = _t(spark, sf_dir, "orders")
    return kaplan_meier(order_ship_durations(li, od), cutoff=90)


@register(
    "holt_revenue_forecast",
    holt_revenue_oracle_sql(),
    doc="Holt double exponential smoothing (operators/timeseries.py, "
    "Holt 1957): level+trend integer recurrence (alpha=3/10, "
    "beta=1/10) over daily order revenue in exact cents, one "
    "aggregate-HOF fold over the bounded day domain; returns the last "
    "30 days with level, trend, and the one-step-ahead forecast error "
    "— the ewma_fold upgrade that tracks drift. Signed truncating div "
    "agrees cross-engine; day as epoch-day BIGINT.",
)
def q_holt_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.timeseries import (
        daily_revenue_frame,
        holt_linear_fold,
    )

    od = _t(spark, sf_dir, "orders")
    return holt_linear_fold(daily_revenue_frame(od))


# ---------------------------------------------------------------------------
# Wave 17 (r8): shuffle-quality audit, CUPED, vocab coverage curve
# ---------------------------------------------------------------------------

from pasta_pipeline_spark.operators.shuffle_audit import (  # noqa: E402
    epoch_shuffle_oracle_sql,
)
from pasta_pipeline_spark.operators.stat_tests import (  # noqa: E402
    cuped_oracle_sql,
)
from pasta_pipeline_spark.operators.text_analysis import (  # noqa: E402
    vocab_coverage_oracle_sql,
)


@register(
    "epoch_shuffle_audit",
    epoch_shuffle_oracle_sql(),
    doc="Training-epoch shuffle-quality audit (operators/"
    "shuffle_audit.py): per-source run-length profile of the "
    "md5(epoch:id) read order vs the 1/(1-p) ideal-mixing expectation "
    "— long same-source runs mean correlated gradients. Both ranks "
    "ride the range-partition + driver-prefix-sum machinery "
    "(assign_sequential_ids / assign_grouped_sequential_ids), so no "
    "empty-OVER or hot-source window touches the fact table.",
)
def q_epoch_shuffle_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.shuffle_audit import epoch_shuffle_runs

    docs = _t(spark, sf_dir, "documents")
    return epoch_shuffle_runs(docs, "doc_id", "source", epoch=1)


@register(
    "cuped_adjustment",
    cuped_oracle_sql(),
    doc="CUPED variance-reduced A/B readout (operators/stat_tests.py, "
    "Deng/Xu/Kohavi/Walker 2013): per-user pre-period covariate X and "
    "post-period metric Y, pooled theta = cov/var, adjusted-metric "
    "means per md5-bucket arm, and the variance-reduction ratio. One "
    "groupBy(user) + one 1-row moment aggregate; all statistics are "
    "fixed double trees over int64/decimal sums; epoch-micros period "
    "boundary (NOTES #39).",
)
def q_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.stat_tests import cuped_report

    ev = _t(spark, sf_dir, "events")
    return cuped_report(ev)


@register(
    "vocab_coverage_curve",
    vocab_coverage_oracle_sql(),
    doc="Cumulative token-coverage curve (operators/text_analysis.py): "
    "share of all token occurrences covered by the top-k vocabulary "
    "terms at k in {10,100,1000,10000} — the Zipf-side vocab-size "
    "decision table. Global vocab rank via assign_sequential_ids "
    "(range partition + driver prefix-sum, no empty-OVER over the "
    "vocabulary), then one conditional-aggregate pass.",
)
def q_vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.text_analysis import (
        vocab_coverage_curve,
    )

    docs = _tp(spark, sf_dir, "documents")
    return vocab_coverage_curve(docs, "doc_id", "text")


# ---------------------------------------------------------------------------
# Wave 18 (r8): BPE merge learning, difference-in-differences
# ---------------------------------------------------------------------------

from pasta_pipeline_spark.operators.bpe import (  # noqa: E402
    bpe_merges_oracle_sql,
)
from pasta_pipeline_spark.operators.stat_tests import (  # noqa: E402
    did_oracle_sql,
)


@register(
    "bpe_merge_learning",
    bpe_merges_oracle_sql(k=4),
    doc="In-plan BPE merge learning (operators/bpe.py, Sennrich/"
    "Haddow/Birch 2016 §3.2): the first 4 merges learned from the "
    "corpus word-frequency frame — each round one vocabulary-scale "
    "pair-count groupBy, a 1-row elected-merge broadcast, and a "
    "greedy-LTR re-tokenization fold (aggregate HOF). The corpus is "
    "scanned ONCE; rounds iterate the vocab frame (the classic BPE "
    "trick). All-integer, value-hash oracle vs a positional "
    "run-parity DuckDB twin.",
)
def q_bpe_merge_learning(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.bpe import (
        bpe_learn_merges,
        word_freq_frame,
    )

    docs = _tp(spark, sf_dir, "documents")
    return bpe_learn_merges(word_freq_frame(docs), k=4)


@register(
    "did_estimator",
    did_oracle_sql(),
    doc="Difference-in-differences readout (operators/stat_tests.py, "
    "Card & Krueger 1994 design): 2x2 md5-arm x pre/post cell means, "
    "DiD estimate, large-sample SE and z — differences out secular "
    "drift that a naive post-only compare absorbs; the causal "
    "companion to cuped_adjustment. One conditional-aggregate scan "
    "(decimal(38,0) second moments); empty cells and zero SE fail "
    "closed to NULL on both engines.",
)
def q_did_estimator(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.stat_tests import did_report

    ev = _t(spark, sf_dir, "events")
    return did_report(ev)


# ---------------------------------------------------------------------------
# Wave 19 (r8): Poisson bootstrap CI, BPE compression curve
# ---------------------------------------------------------------------------

from pasta_pipeline_spark.operators.bootstrap import (  # noqa: E402
    bootstrap_mean_oracle_sql,
)
from pasta_pipeline_spark.operators.bpe import (  # noqa: E402
    bpe_compression_oracle_sql,
)


@register(
    "bootstrap_mean_ci",
    bootstrap_mean_oracle_sql(),
    doc="Poisson-bootstrap confidence interval (operators/bootstrap.py, "
    "Chamandy et al. 2012): 40 replicate weighted means of order value "
    "in ONE scan — per-row Poisson(1) weights from the md5-quantized "
    "inverse CDF (no exp/log), decimal(38,0) weighted sums, in-row "
    "sorted replicate vector, percentile band. THE at-scale CI "
    "technique: B is aggregation width, not a shuffle; the whole "
    "interval is value-hash oracle-checkable because the noise is "
    "deterministic.",
)
def q_bootstrap_mean_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.bootstrap import (
        poisson_bootstrap_mean_ci,
    )

    od = _t(spark, sf_dir, "orders")
    return poisson_bootstrap_mean_ci(od, "o_orderkey", "o_totalprice")


@register(
    "bpe_compression_curve",
    bpe_compression_oracle_sql(k=4),
    doc="BPE tokens-per-word compression curve (operators/bpe.py): "
    "corpus-weighted token totals at each of the first 4 learned "
    "merges (step 0 = character baseline) — how much context window "
    "the subword vocab buys; shares the learning loop and the "
    "CTE-chain oracle with bpe_merge_learning.",
)
def q_bpe_compression_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.bpe import (
        bpe_compression_report,
        word_freq_frame,
    )

    docs = _tp(spark, sf_dir, "documents")
    return bpe_compression_report(word_freq_frame(docs), k=4)


# ---------------------------------------------------------------------------
# Wave 20 (r8): HLL overlap audit, interpolated quantiles
# ---------------------------------------------------------------------------

from pasta_pipeline_spark.operators.exact_quantiles import (  # noqa: E402
    interpolated_quantiles_oracle_sql,
)
from pasta_pipeline_spark.operators.sketches import (  # noqa: E402
    hll_overlap_oracle_sql,
)


@register(
    "hll_overlap_audit",
    hll_overlap_oracle_sql(
        "events", "user_id", "event_type = 'purchase'", "event_type = 'click'"
    ),
    doc="Sketch-algebra audience overlap (operators/sketches.py): "
    "|A∩B| by inclusion-exclusion over three deterministic HLL "
    "estimates (purchase users, click users, register-wise-MAX "
    "union), audited against the exact one-groupBy overlap — the "
    "planning number for how noisy sketched intersections really "
    "are. All 1-row scalar handoffs; ≤m-row register states.",
)
def q_hll_overlap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.sketches import hll_overlap_audit

    ev = _t(spark, sf_dir, "events")
    return hll_overlap_audit(
        ev,
        "user_id",
        F.col("event_type") == "purchase",
        F.col("event_type") == "click",
    )


@register(
    "interpolated_quantiles",
    interpolated_quantiles_oracle_sql(
        "lineitem", "l_extendedprice", "l_orderkey"
    ),
    doc="Type-7 interpolated quantiles (operators/exact_quantiles.py, "
    "Hyndman & Fan 1996 — the numpy/R default) of extended price, "
    "WITHOUT a global sort task: ranks via assign_sequential_ids "
    "(range partition + driver prefix-sum), a bounded rank-grid frame "
    "broadcast-joined back, exact rational h = (n-1)p arithmetic, one "
    "interpolation double tree. Matches numpy.quantile bit-for-bit on "
    "the bridged values.",
)
def q_interpolated_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.exact_quantiles import (
        interpolated_quantiles,
    )

    li = _t(spark, sf_dir, "lineitem")
    return interpolated_quantiles(li, "l_extendedprice", "l_orderkey")


# ---------------------------------------------------------------------------
# Wave 21 (r8): isotonic calibration
# ---------------------------------------------------------------------------

from pasta_pipeline_spark.operators.isotonic import (  # noqa: E402
    isotonic_oracle_sql,
)


@register(
    "isotonic_calibration",
    isotonic_oracle_sql(
        "documents", "LEAST(n_chars // 40, 15)", "lang = 'en'"
    ),
    doc="Isotonic (PAVA) calibration of per-length-bin English rates "
    "(operators/isotonic.py, Zadrozny & Elkan 2002): best monotone "
    "step fit of empirical label rates over score bins, via the "
    "bounded maximin closed form max_j<=i min_k>=i avg(j..k) — no "
    "sequential stack, every step a bounded window/explode over the "
    "<=16-row bin frame after one fact-scan groupBy. The calibrator "
    "that turns a cheap quality score into a probability.",
)
def q_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.isotonic import isotonic_calibration

    docs = _t(spark, sf_dir, "documents")
    return isotonic_calibration(
        docs,
        F.least(F.expr("n_chars div 40"), F.lit(15)),
        F.col("lang") == "en",
    )


# ---------------------------------------------------------------------------
# Wave 22 (r8): delta-method ratio metric
# ---------------------------------------------------------------------------

from pasta_pipeline_spark.operators.stat_tests import (  # noqa: E402
    ratio_delta_oracle_sql,
)


@register(
    "ratio_metric_delta",
    ratio_delta_oracle_sql(),
    doc="Delta-method ratio-metric A/B readout (operators/"
    "stat_tests.py, Deng/Knoblich/Lu 2018): per-arm value-per-event "
    "ratio with the Taylor-expansion variance that respects USERS as "
    "the randomization unit (naive per-event variance is wrong for "
    "ratio metrics), diff, SE, z. One groupBy(user) + one "
    "conditional-moment scan; degenerate arms fail closed to NULL.",
)
def q_ratio_metric_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.stat_tests import ratio_metric_delta

    ev = _t(spark, sf_dir, "events")
    return ratio_metric_delta(ev)
