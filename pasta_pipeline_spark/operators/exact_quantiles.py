"""Exact interpolated quantiles (Hyndman & Fan 1996 Type 7 — the
NumPy/Excel/R default) at corpus scale, without a global sort task.

``price_quantiles``-style discrete quantiles pick an existing value;
Type 7 interpolates between the two bracketing order statistics:
h = (n−1)·p, q = v[⌊h⌋+1] + (h−⌊h⌋)·(v[⌈h⌉+1] − v[⌊h⌋+1]) (1-based
ranks). Exactness across engines: p is a rational num/den, so
lo = ((n−1)·num) div den and the fraction (n−1)·num mod den / den are
exact integers; values are int64 fixed point; the one interpolation
is a single double tree.

Scale shape — the reason this module exists: global order statistics
WITHOUT ``ORDER BY`` through one task. Ranks come from
``assign_sequential_ids`` (range partition + driver prefix-sum); the
grid of needed ranks (2 per quantile) is a bounded frame built from
the 1-row n, broadcast and equi-joined against the ranked corpus —
only 2·|grid| rows survive the join. Compare ntile/percentile_cont,
which funnel the whole column through one sorted partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: default quantile grid as (numerator, denominator) rationals
DEFAULT_GRID = ((1, 4), (1, 2), (3, 4), (9, 10), (99, 100))


def interpolated_quantiles(
    df: DataFrame,
    value_col: str,
    id_col: str,
    grid: tuple = DEFAULT_GRID,
    value_scale: int = 100,
) -> DataFrame:
    """Type-7 quantiles of ``value_col`` (bridged to int64 at
    ``value_scale``). Returns one row per grid point, ordered:
    p_sc (p·1e6), n, lo_rank, hi_rank, q_sc (quantile at the value
    scale, floored 1e4)."""
    from pasta_pipeline_spark.operators.ids import assign_sequential_ids

    v = F.floor(F.col(value_col) * value_scale).cast("long")
    base = df.select(v.alias("__v"), F.col(id_col).alias("__id"))
    ranked = assign_sequential_ids(base, ["__v", "__id"], out_col="__rnk")
    n_row = base.agg(F.count(F.lit(1)).alias("__n"))
    targets = n_row.select(
        "__n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(num).cast("long").alias("num"),
                        F.lit(den).cast("long").alias("den"),
                    )
                    for num, den in grid
                ]
            )
        ).alias("g"),
    ).select(
        "__n",
        F.col("g.num").alias("__num"),
        F.col("g.den").alias("__den"),
        (F.expr("((__n - 1) * g.num) div g.den") + 1).alias("__lo"),
        # ceil(h) + 1 == lo + 1 unless h is integral
        F.when(
            F.expr("((__n - 1) * g.num) % g.den") == 0,
            F.expr("((__n - 1) * g.num) div g.den") + 1,
        )
        .otherwise(F.expr("((__n - 1) * g.num) div g.den") + 2)
        .alias("__hi"),
    )
    lo_j = ranked.join(
        F.broadcast(targets), ranked["__rnk"] == targets["__lo"]
    ).select("__num", "__den", "__n", "__lo", "__hi", F.col("__v").alias("__vlo"))
    hi_j = ranked.join(
        F.broadcast(
            targets.select(
                F.col("__num").alias("__num2"),
                F.col("__den").alias("__den2"),
                "__hi",
            )
        ),
        ranked["__rnk"] == F.col("__hi"),
    ).select("__num2", "__den2", F.col("__v").alias("__vhi"))
    # key on the full (num, den) rational — numerators repeat (1/4, 1/2)
    both = lo_j.join(
        F.broadcast(hi_j),
        (lo_j["__num"] == hi_j["__num2"]) & (lo_j["__den"] == hi_j["__den2"]),
    )
    frac = (
        F.expr("((__n - 1) * __num) % __den").cast("double")
        / F.col("__den").cast("double")
    )
    q = F.col("__vlo").cast("double") + frac * (
        F.col("__vhi") - F.col("__vlo")
    ).cast("double")
    return both.select(
        F.expr("(__num * 1000000) div __den").cast("long").alias("p_sc"),
        F.col("__n").cast("long").alias("n"),
        F.col("__lo").cast("long").alias("lo_rank"),
        F.col("__hi").cast("long").alias("hi_rank"),
        F.floor(q * 10000).cast("long").alias("q_sc"),
    ).orderBy("p_sc")


def interpolated_quantiles_oracle_sql(
    table: str,
    value_sql: str,
    id_sql: str,
    grid: tuple = DEFAULT_GRID,
    value_scale: int = 100,
) -> str:
    """DuckDB twin of :func:`interpolated_quantiles`."""
    grid_rows = ", ".join(f"({num}, {den})" for num, den in grid)
    return f"""
    WITH base AS (
      SELECT CAST(FLOOR({value_sql} * {value_scale}) AS BIGINT) AS v,
             {id_sql} AS id
      FROM {table}
    ), ranked AS (
      SELECT v, ROW_NUMBER() OVER (ORDER BY v, id) AS rnk FROM base
    ), n AS (SELECT COUNT(*) AS n FROM base),
    grid(num, den) AS (VALUES {grid_rows}),
    targets AS (
      SELECT num, den, n,
             ((n - 1) * num) // den + 1 AS lo,
             CASE WHEN ((n - 1) * num) % den = 0
               THEN ((n - 1) * num) // den + 1
               ELSE ((n - 1) * num) // den + 2 END AS hi
      FROM grid CROSS JOIN n
    )
    SELECT CAST((t.num * 1000000) // t.den AS BIGINT) AS p_sc,
      CAST(t.n AS BIGINT) AS n,
      CAST(t.lo AS BIGINT) AS lo_rank, CAST(t.hi AS BIGINT) AS hi_rank,
      CAST(FLOOR((CAST(rl.v AS DOUBLE)
        + (CAST(((t.n - 1) * t.num) % t.den AS DOUBLE)
           / CAST(t.den AS DOUBLE))
          * CAST(rh.v - rl.v AS DOUBLE)) * 10000) AS BIGINT) AS q_sc
    FROM targets t
    JOIN ranked rl ON rl.rnk = t.lo
    JOIN ranked rh ON rh.rnk = t.hi
    ORDER BY p_sc
    """
