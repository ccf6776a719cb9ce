"""Marketing-touch attribution (last-touch model).

Joins the conversion stream (orders) to the behavioral stream (events)
and credits each conversion to the customer's LATEST touch at or before
the conversion time — the last-touch attribution model, i.e. an AS-OF
join (reusing ``operators/asof.py``) followed by a one-scan rollup of
credited conversions and revenue per touch type. Conversions with no
prior touch land in an explicit ``(none)`` bucket so totals reconcile.

Scale posture: the as-of join is the operator's already-audited
union+window form (one shuffle on the user key, no range explosion);
the rollup is a |touch types|-row aggregate. Revenue rides the exact
cents bridge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .asof import asof_join
from .dedup import keep_latest


def last_touch_attribution(
    orders: DataFrame,
    events: DataFrame,
    user_col: str = "user_id",
    conv_user_col: str = "o_custkey",
    conv_ts_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
    event_ts_col: str = "ts",
    touch_col: str = "event_type",
) -> DataFrame:
    """Credit each order to the user's latest event at-or-before it.

    Returns (touch_type, n_orders, revenue_cents, revenue_share_sc)
    with ``(none)`` for unattributed conversions; share is the exact
    cents ratio floored to 1e-6.
    """
    convs = orders.select(
        F.col(conv_user_col).alias("__user"),
        F.col(conv_ts_col).alias("__ts"),
        F.round(F.col(amount_col) * 100).cast("long").alias("__cents"),
    )
    touches = (
        events.select(
            F.col(user_col).alias("__user"),
            F.col(event_ts_col).alias("__ts"),
            F.col(touch_col).alias("__touch"),
        )
        # unique right key per (user, ts): latest-written touch wins,
        # ties broken by the largest touch label — deterministic
        .transform(lambda df: keep_latest(df, ["__user", "__ts"], "__touch"))
    )
    joined = asof_join(
        convs,
        touches,
        on=["__user"],
        left_ts="__ts",
        right_ts="__ts",
        value_cols=["__touch"],
        suffix="_t",
    )
    credited = joined.select(
        F.coalesce(F.col("__touch_t"), F.lit("(none)")).alias("touch_type"),
        F.col("__cents"),
    )
    agg = credited.groupBy("touch_type").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("__cents").alias("revenue_cents"),
    )
    total = agg.agg(F.sum("revenue_cents").alias("__total"))
    share = F.col("revenue_cents").cast("double") / F.col("__total").cast(
        "double"
    )
    return (
        agg.crossJoin(F.broadcast(total))
        .select(
            "touch_type",
            "n_orders",
            "revenue_cents",
            F.floor(share * 1000000).cast("long").alias("revenue_share_sc"),
        )
        .orderBy("touch_type")
    )


def last_touch_events_oracle_sql() -> str:
    """DuckDB twin of the catalog scenario: purchase events credited to
    the user's latest at-or-before non-purchase touch. ASOF LEFT JOIN
    against the per-(user, ts) deduped touch stream, same cents bridge
    and share tree."""
    return """
    WITH convs AS (
      SELECT user_id AS u, ts,
             CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ), touches AS (
      SELECT user_id AS u, ts, event_type AS touch FROM (
        SELECT user_id, ts, event_type,
               row_number() OVER (PARTITION BY user_id, ts
                                  ORDER BY event_type DESC) AS rn
        FROM events WHERE event_type <> 'purchase'
      ) WHERE rn = 1
    ), credited AS (
      SELECT COALESCE(t.touch, '(none)') AS touch_type, c.cents
      FROM convs c ASOF LEFT JOIN touches t
        ON c.u = t.u AND c.ts >= t.ts
    ), agg AS (
      SELECT touch_type, COUNT(*) AS n_orders,
             CAST(SUM(cents) AS BIGINT) AS revenue_cents
      FROM credited GROUP BY touch_type
    ), tot AS (
      SELECT CAST(SUM(revenue_cents) AS BIGINT) AS total FROM agg
    )
    SELECT touch_type, n_orders, revenue_cents,
           CAST(FLOOR(CAST(revenue_cents AS DOUBLE) / CAST(total AS DOUBLE)
                      * 1000000) AS BIGINT) AS revenue_share_sc
    FROM agg CROSS JOIN tot
    ORDER BY touch_type
    """
