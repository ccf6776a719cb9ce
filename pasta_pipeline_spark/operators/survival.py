"""Survival analysis — the Kaplan-Meier product-limit estimator
(Kaplan & Meier 1958) over right-censored durations.

The time-to-event tool a pipeline reaches for when not every subject
has finished: time-to-ship with open orders, time-to-conversion with
users still active, document age at recrawl. The estimator
S(t) = Π_{u<=t} (n_u − d_u)/n_u handles censoring correctly where a
naive mean/quantile over observed durations is biased.

Determinism contract: the product is inherently a sequential fold
(like EWMA/PageRank, integer division does not regroup), so it runs
as ONE ``aggregate`` HOF over the sorted per-duration frame — which
is BOUNDED (|distinct durations| <= censor cutoff + 1), so the fold
array is metadata-scale at any corpus size. All arithmetic is int64
fixed point: S_fp ← (S_fp · (n−d)) div n from S_fp = 1e6; values are
nonnegative so truncating div == floor on both engines, and
S_fp·(n−d) <= 1e6·n holds to ~9e12 at-risk rows before int64
overflow. The DuckDB twin is a recursive CTE on the same recurrence —
the whole estimator is value-hash oracle-checkable.

Scale shape: one groupBy(duration) over the fact scan (map-side
combined), one bounded descending-cumsum window, one single-task fold
over <= cutoff+1 rows. Nothing fact-scale crosses a window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: survival fixed-point scale
KM_SCALE = 1_000_000


def kaplan_meier(
    durations: DataFrame,
    dur_col: str = "dur",
    cutoff: int = 90,
) -> DataFrame:
    """Kaplan-Meier curve over ``durations(dur: long)`` with
    administrative right-censoring at ``cutoff``: a row with
    dur <= cutoff is an event at its duration; a row with
    dur > cutoff is censored at the cutoff (it stays in the at-risk
    set through every earlier time). Negative durations are excluded
    (fail closed — upstream data defects must not silently shift the
    curve).

    Returns one row per distinct observed time, ordered: t_day,
    n_risk, d_events, c_censored, surv_sc (S(t) fixed-point 1e6).
    """
    base = durations.select(F.col(dur_col).cast("long").alias("__d")).where(
        F.col("__d") >= 0
    )
    marked = base.select(
        F.least(F.col("__d"), F.lit(cutoff)).alias("t"),
        (F.col("__d") <= cutoff).cast("long").alias("__ev"),
    )
    per_t = marked.groupBy("t").agg(
        F.sum("__ev").alias("d"),
        F.sum(F.lit(1) - F.col("__ev")).alias("c"),
    )
    # at-risk at t = everyone whose event/censor time is >= t:
    # descending cumulative over the bounded (<= cutoff+1 row) frame
    w = Window.partitionBy().orderBy(F.desc("t")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    per_t = per_t.withColumn("n", F.sum(F.col("d") + F.col("c")).over(w))
    arr = per_t.agg(
        F.array_sort(
            F.collect_list(F.struct("t", "n", "d", "c"))
        ).alias("__a")
    )
    folded = arr.select(
        F.expr(
            f"""
            aggregate(
              __a,
              struct(
                CAST({KM_SCALE} AS BIGINT) AS s,
                CAST(array() AS
                  ARRAY<STRUCT<t: BIGINT, n: BIGINT, d: BIGINT,
                               c: BIGINT, surv: BIGINT>>) AS out
              ),
              (acc, e) -> struct(
                (acc.s * (e.n - e.d)) div e.n AS s,
                array_append(acc.out, struct(
                  e.t AS t, e.n AS n, e.d AS d, e.c AS c,
                  (acc.s * (e.n - e.d)) div e.n AS surv)) AS out
              ),
              acc -> acc.out
            ) AS __rows
            """
        )
    )
    return (
        folded.select(F.explode("__rows").alias("r"))
        .select(
            F.col("r.t").alias("t_day"),
            F.col("r.n").alias("n_risk"),
            F.col("r.d").alias("d_events"),
            F.col("r.c").alias("c_censored"),
            F.col("r.surv").alias("surv_sc"),
        )
        .orderBy("t_day")
    )


def order_ship_durations(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """Order-to-ship lag in days per lineitem — the time-to-fulfilment
    duration frame for :func:`kaplan_meier`. One broadcast-or-SMJ
    equi-join on the order key."""
    return lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"]).select(
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")).cast("long").alias("dur")
    )


def km_shipping_oracle_sql(cutoff: int = 90) -> str:
    """DuckDB twin of order_ship_durations + kaplan_meier: the same
    integer recurrence as a recursive CTE over the bounded
    per-duration frame."""
    return f"""
    WITH RECURSIVE durs AS (
      SELECT datediff('day', o.o_orderdate::DATE, l.l_shipdate::DATE) AS d
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ), marked AS (
      SELECT LEAST(d, {cutoff}) AS t,
             CASE WHEN d <= {cutoff} THEN 1 ELSE 0 END AS ev
      FROM durs WHERE d >= 0
    ), per_t AS (
      SELECT t, CAST(SUM(ev) AS BIGINT) AS d,
             CAST(SUM(1 - ev) AS BIGINT) AS c
      FROM marked GROUP BY t
    ), ord AS (
      SELECT t, d, c,
             CAST(SUM(d + c) OVER (ORDER BY t DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n,
             ROW_NUMBER() OVER (ORDER BY t ASC) AS seq
      FROM per_t
    ), km AS (
      SELECT seq, t, n, d, c,
             CAST(({KM_SCALE} * (n - d)) // n AS BIGINT) AS surv
      FROM ord WHERE seq = 1
      UNION ALL
      SELECT o.seq, o.t, o.n, o.d, o.c,
             CAST((km.surv * (o.n - o.d)) // o.n AS BIGINT)
      FROM km JOIN ord o ON o.seq = km.seq + 1
    )
    SELECT CAST(t AS BIGINT) AS t_day, n AS n_risk, d AS d_events,
           c AS c_censored, surv AS surv_sc
    FROM km ORDER BY t_day
    """
