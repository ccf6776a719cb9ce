"""Calendar seasonal decomposition of a revenue series (STL-lite).

Classical additive decomposition of the daily-revenue series:
trend = centered 7-day moving average, weekly seasonal index = the
per-weekday mean deviation from trend, residual = observed − trend −
seasonal, with residual outliers flagged at |z| > 2. The
moving-average + seasonal-index recipe is the textbook first stage of
STL / X-11 — enough for revenue anomaly triage without an iterative
loess fit.

Cross-engine exactness: the fact table collapses to per-DAY cents
sums first (metadata scale — a decade is ~3.7k rows), so every window
below is bounded; the 7-day trend is kept ×7 in int64
(``trend7_x7`` = sum of the 7 neighbor days) and only the final
seasonal/residual/z expressions go through fixed double trees.
Edge days without a full 7-day neighborhood are excluded from the
seasonal fit and carry NULL decomposition (count-guarded window).

Scale posture: one groupBy(day) over the fact table; everything after
is |days|-row arithmetic. At 100 TB the day rollup is the only
fact-scale stage — map-side combined, one shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def weekly_seasonal_decomposition(
    orders: DataFrame,
    ts_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
) -> DataFrame:
    """Decompose daily revenue into trend/seasonal/residual.

    Returns per-day rows (day, dow, cents, trend_sc, seasonal_sc,
    resid_sc, is_outlier) ordered by day; the first/last 3 days have
    NULL decomposition.
    """
    daily = (
        orders.select(
            F.to_date(F.col(ts_col)).alias("day"),
            F.round(F.col(amount_col) * 100).cast("long").alias("__cents"),
        )
        .groupBy("day")
        .agg(F.sum("__cents").alias("cents"))
        .withColumn("dow", F.dayofweek(F.col("day")).cast("int"))
    )
    # bounded |days|-row frame: the unpartitioned windows below are
    # metadata-scale by construction
    w7 = Window.orderBy("day").rowsBetween(-3, 3)
    with_trend = daily.withColumn(
        "trend7_x7",
        F.when(F.count(F.lit(1)).over(w7) == 7, F.sum("cents").over(w7)),
    )
    # calendar gaps would make a 7-ROW window span more than 7 days;
    # the synthetic series is dense, but guard anyway: the window must
    # cover exactly day-3 .. day+3
    epoch_day = F.unix_date(F.col("day"))
    with_trend = with_trend.withColumn(
        "trend7_x7",
        F.when(
            (F.max(epoch_day).over(w7) - F.min(epoch_day).over(w7)) == 6,
            F.col("trend7_x7"),
        ),
    )
    dev = (F.col("cents") * 7 - F.col("trend7_x7")).alias("dev_x7")
    with_dev = with_trend.withColumn("dev_x7", dev)
    w_dow = Window.partitionBy("dow")
    w_all = Window.partitionBy()
    # seasonal index per weekday: mean deviation (double, fixed tree)
    seasonal = (
        F.sum("dev_x7").over(w_dow).cast("double")
        / (F.count("dev_x7").over(w_dow) * 7).cast("double")
    )
    with_seasonal = with_dev.withColumn(
        "seasonal", F.when(F.col("dev_x7").isNotNull(), seasonal)
    )
    resid = (
        F.col("cents").cast("double")
        - F.col("trend7_x7").cast("double") / 7.0
        - F.col("seasonal")
    )
    with_resid = with_seasonal.withColumn("resid", resid)
    # z-score over residuals: moments from cents-floored ints; the
    # sum of squares rides decimal(38) so no int64 overflow at any sf
    rfl = F.floor(F.col("resid")).cast("long")
    n = F.count("resid").over(w_all)
    s1 = F.sum(rfl).over(w_all)
    s2 = F.sum(rfl.cast("decimal(19,0)") * rfl.cast("decimal(19,0)")).over(w_all)
    mean_c = s1.cast("double") / n.cast("double")
    var_c = s2.cast("double") / n.cast("double") - mean_c * mean_c
    z = (F.col("resid") - mean_c) / F.sqrt(var_c)
    out = with_resid.withColumn(
        "z", F.when(F.col("resid").isNotNull() & (var_c > 0), z)
    )
    return out.select(
        "day",
        "dow",
        "cents",
        F.floor(F.col("trend7_x7").cast("double") / 7.0 * 100).cast("long").alias("trend_sc"),
        F.floor(F.col("seasonal") * 100).cast("long").alias("seasonal_sc"),
        F.floor(F.col("resid") * 100).cast("long").alias("resid_sc"),
        F.when(F.col("z").isNotNull(), F.abs(F.col("z")) > 2.0).alias("is_outlier"),
    ).orderBy("day")


def weekly_seasonal_oracle_sql(table: str = "orders") -> str:
    """DuckDB twin of :func:`weekly_seasonal_decomposition`."""
    return """
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM orders GROUP BY 1
    ), dd AS (
      SELECT day, cents, dayofweek(day) + 1 AS dow FROM daily
    ), tr AS (
      SELECT day, cents, dow,
        CASE WHEN COUNT(*) OVER w7 = 7
              AND epoch(MAX(day) OVER w7) - epoch(MIN(day) OVER w7) = 6 * 86400
             THEN CAST(SUM(cents) OVER w7 AS BIGINT) END AS trend7_x7
      FROM dd
      WINDOW w7 AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ), dv AS (
      SELECT *, cents * 7 - trend7_x7 AS dev_x7 FROM tr
    ), se AS (
      SELECT *,
        CASE WHEN dev_x7 IS NOT NULL THEN
          CAST(SUM(dev_x7) OVER (PARTITION BY dow) AS DOUBLE)
          / CAST(COUNT(dev_x7) OVER (PARTITION BY dow) * 7 AS DOUBLE) END AS seasonal
      FROM dv
    ), rs AS (
      SELECT *,
        CAST(cents AS DOUBLE) - CAST(trend7_x7 AS DOUBLE) / 7.0 - seasonal AS resid
      FROM se
    ), zs AS (
      SELECT *,
        CAST(SUM(CAST(FLOOR(resid) AS BIGINT)) OVER () AS DOUBLE)
          / CAST(COUNT(resid) OVER () AS DOUBLE) AS mean_c,
        CAST(SUM(CAST(FLOOR(resid) AS DECIMAL(19,0))
                 * CAST(FLOOR(resid) AS DECIMAL(19,0))) OVER () AS DOUBLE)
          / CAST(COUNT(resid) OVER () AS DOUBLE) AS m2_c
      FROM rs
    )
    SELECT day, CAST(dow AS INT) AS dow, cents,
      CAST(FLOOR(CAST(trend7_x7 AS DOUBLE) / 7.0 * 100) AS BIGINT) AS trend_sc,
      CAST(FLOOR(seasonal * 100) AS BIGINT) AS seasonal_sc,
      CAST(FLOOR(resid * 100) AS BIGINT) AS resid_sc,
      CASE WHEN resid IS NOT NULL AND (m2_c - mean_c * mean_c) > 0
           THEN ABS((resid - mean_c)
                    / sqrt(m2_c - mean_c * mean_c)) > 2.0 END AS is_outlier
    FROM zs ORDER BY day
    """
