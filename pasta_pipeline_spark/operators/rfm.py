"""RFM customer segmentation (recency / frequency / monetary).

The classic CRM scoring: each customer gets 1-5 quintile scores on how
recently they ordered, how often, and how much they spent; the
concatenated "RFM" code (555 = best) drives retention/campaign
routing. Segment rollups feed the dashboard.

Scale posture: the per-customer profile is one groupBy over orders; the
three quintile assignments deliberately AVOID ``ntile() OVER (ORDER BY
metric)`` — an empty-partition window = the canonical single-task sort
— and instead reuse the range-partition + driver-prefix-sum rank
machinery (``operators/ids.assign_sequential_ids``) with the
equidepth closed-form tile quotient, so a 100 TB customer dimension
never funnels through one task. The reference timestamp is a 1-row
broadcast scalar.

Exact arithmetic: monetary is int64 cents; recency is whole days;
every rank order carries the customer key as the final tiebreaker so
the quintile assignment is a deterministic total order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .ids import assign_sequential_ids
from .util import attach_cached_deps


def _tile5(rank_col: str, total: int) -> Column:
    """ntile(5) closed form over (1-based rank, known total): the
    first n%5 tiles take n div 5 + 1 rows each (the equidepth
    arithmetic) — pure int64 `div`, no doubles."""
    big = total % 5
    size_big = total // 5 + 1
    size_small = max(total // 5, 1)
    return F.expr(
        f"""CASE WHEN {rank_col} <= {big * size_big}
             THEN ({rank_col} - 1) div {size_big}
             ELSE {big} + ({rank_col} - {big * size_big} - 1) div {size_small}
           END + 1"""
    )


def rfm_segments(orders: DataFrame, ref_ts: Column | None = None) -> DataFrame:
    """Quintile-score customers and roll up segments.

    Returns (segment, n_customers, monetary_cents_sum, avg_monetary_sc)
    where segment is the "RFM" three-digit code (5 = most recent /
    most frequent / highest spend).
    """
    base = orders.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderdate").alias("ts"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    ref = base.agg(F.max("ts").alias("__ref"))
    profile = (
        base.groupBy("custkey")
        .agg(
            F.max("ts").alias("__last_ts"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum("cents").alias("monetary_cents"),
        )
        .crossJoin(F.broadcast(ref))
        .select(
            "custkey",
            F.datediff(F.col("__ref"), F.col("__last_ts")).cast("long").alias(
                "recency_days"
            ),
            "frequency",
            "monetary_cents",
        )
        .persist()
    )
    n_total = profile.count()

    def _score(df: DataFrame, order_cols: list, out: str, invert: bool) -> DataFrame:
        ranked = assign_sequential_ids(df, order_cols, out_col="__rk")
        tile = _tile5("__rk", n_total)
        score = (6 - tile) if invert else tile
        res = ranked.withColumn(out, score.cast("long")).drop("__rk")
        return attach_cached_deps(res, getattr(ranked, "_pasta_cached_deps", []))

    # recency: smaller days = better → rank ascending, tile 1 (earliest
    # = most recent) must score 5 → invert
    scored = _score(profile, ["recency_days", "custkey"], "r_score", invert=True)
    # frequency/monetary: larger = better → rank ascending, tile 5 = top
    scored = _score(scored, ["frequency", "custkey"], "f_score", invert=False)
    scored = _score(scored, ["monetary_cents", "custkey"], "m_score", invert=False)

    seg = F.concat(
        F.col("r_score").cast("string"),
        F.col("f_score").cast("string"),
        F.col("m_score").cast("string"),
    )
    out = (
        scored.withColumn("segment", seg)
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("monetary_cents").alias("monetary_cents_sum"),
        )
        .withColumn(
            "avg_monetary_sc",
            F.floor(
                F.col("monetary_cents_sum").cast("double")
                / F.col("n_customers").cast("double")
            ).cast("long"),
        )
        .orderBy("segment")
    )
    return attach_cached_deps(
        out, [profile, *getattr(scored, "_pasta_cached_deps", [])]
    )


def rfm_oracle_sql() -> str:
    """DuckDB twin: plain ntile(5) windows (oracle scale doesn't need
    the distributed rank) over identical (metric, custkey) total
    orders; 6−ntile on the ascending recency rank mirrors the invert."""
    return """
    WITH base AS (
      SELECT o_custkey AS custkey, o_orderdate AS ts,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ), ref AS (SELECT MAX(ts) AS r FROM base),
    profile AS (
      SELECT custkey,
             date_diff('day', MAX(ts), (SELECT r FROM ref)) AS recency_days,
             COUNT(*) AS frequency,
             CAST(SUM(cents) AS BIGINT) AS monetary_cents
      FROM base GROUP BY custkey
    ), scored AS (
      SELECT custkey, monetary_cents,
             6 - ntile(5) OVER (ORDER BY recency_days, custkey) AS r_score,
             ntile(5) OVER (ORDER BY frequency, custkey) AS f_score,
             ntile(5) OVER (ORDER BY monetary_cents, custkey) AS m_score
      FROM profile
    )
    SELECT CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
             || CAST(m_score AS VARCHAR) AS segment,
           COUNT(*) AS n_customers,
           CAST(SUM(monetary_cents) AS BIGINT) AS monetary_cents_sum,
           CAST(FLOOR(CAST(SUM(monetary_cents) AS DOUBLE)
                      / CAST(COUNT(*) AS DOUBLE)) AS BIGINT) AS avg_monetary_sc
    FROM scored GROUP BY 1 ORDER BY 1
    """
