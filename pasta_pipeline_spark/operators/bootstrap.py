"""Poisson bootstrap — uncertainty for massive data in ONE scan
(Chamandy, Muralidharan, Najmi & Naidu, "Estimating Uncertainty for
Massive Data Streams", Google 2012).

The classical bootstrap resamples n rows WITH replacement B times —
impossible to coordinate across a cluster. The Poisson bootstrap
replaces the multinomial replicate weights with independent
Poisson(1) weights per (row, replicate): each row computes its B
weights locally from its own id, every replicate statistic becomes a
weighted aggregate, and ALL B replicates ride one scan as one wide
conditional aggregation — the at-scale standard for confidence
intervals.

Determinism contract: the Poisson(1) draw is the md5 bucket of
(id:replicate) pushed through the QUANTIZED Poisson CDF (literal
integer thresholds at 1e-4 resolution — no exp/log anywhere), so
every replicate is bit-identical across engines and reruns and the
whole CI is value-hash oracle-checkable. Weighted sums accumulate in
decimal(38,0) (weights <= 5, NOTES #40); replicate means are single
double divisions; the B-vector sorts as a bounded in-row array.

Scale shape: one scan, 2B+2 aggregate columns, a 1-row output. B is a
constant (default 40) — the aggregation width, not a shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Poisson(1) CDF quantized to 1e-4: P(X<=k) for k = 0..4; weight 5
#: beyond (P(X>=6) < 6e-5 — negligible and deterministic).
POISSON1_CDF_SC = (3679, 7358, 9197, 9810, 9963)


def poisson1_weight(id_col: Column, replicate: int) -> Column:
    """Deterministic Poisson(1) weight for (row, replicate): md5
    bucket in [0, 10000) through the quantized inverse CDF."""
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    id_col.cast("string"), F.lit(f":r{replicate}")
                ).cast("binary")
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    u = h % 10000
    w = F.lit(5)
    for k in range(len(POISSON1_CDF_SC) - 1, -1, -1):
        w = F.when(u < POISSON1_CDF_SC[k], F.lit(k)).otherwise(w)
    return w.cast("long")


def poisson_bootstrap_mean_ci(
    df: DataFrame,
    id_col: str,
    value_col: str,
    b: int = 40,
    value_scale: int = 100,
    alpha_lo_idx: int = 2,
) -> DataFrame:
    """Percentile-bootstrap CI for the mean of ``value_col``: B
    replicate weighted means in one scan, sorted in-row; the CI is
    [sorted(alpha_lo_idx), sorted(B+1-alpha_lo_idx)] (1-based) — with
    the defaults (B=40, idx 2) the empirical 2.5%/97.5% band.

    Returns ONE row: n, mean_sc (unweighted point estimate),
    ci_lo_sc, ci_hi_sc, width_sc. Replicates that draw an all-zero
    weight vector (impossible beyond toy sizes) yield NULL means and
    sort last; the CI is NULL then — fail closed.
    """
    if b < 4:
        raise ValueError("b must be >= 4")
    v = F.floor(F.col(value_col) * value_scale).cast("long")
    base = df.select(F.col(id_col).alias("__id"), v.alias("__v"))
    aggs = [
        F.count(F.lit(1)).alias("__n"),
        F.sum("__v").alias("__s"),
    ]
    for r in range(b):
        w = poisson1_weight(F.col("__id"), r)
        aggs.append(
            F.sum((w * F.col("__v")).cast("decimal(38,0)")).alias(f"__ws_{r}")
        )
        aggs.append(F.sum(w).alias(f"__ww_{r}"))
    m = base.agg(*aggs)
    means = F.array_sort(
        F.array(
            *[
                F.when(
                    F.col(f"__ww_{r}") > 0,
                    F.col(f"__ws_{r}").cast("double")
                    / F.col(f"__ww_{r}").cast("double"),
                )
                for r in range(b)
            ]
        )
    )
    lo = F.element_at(means, alpha_lo_idx)
    hi = F.element_at(means, b + 1 - alpha_lo_idx)
    return m.select(
        F.col("__n").cast("long").alias("n"),
        F.floor(
            F.col("__s").cast("double") / F.col("__n").cast("double") * 10000
        )
        .cast("long")
        .alias("mean_sc"),
        F.floor(lo * 10000).cast("long").alias("ci_lo_sc"),
        F.floor(hi * 10000).cast("long").alias("ci_hi_sc"),
        F.floor((hi - lo) * 10000).cast("long").alias("width_sc"),
    )


def bootstrap_mean_oracle_sql(
    table: str = "orders",
    id_sql: str = "o_orderkey",
    value_sql: str = "o_totalprice",
    b: int = 40,
    value_scale: int = 100,
    alpha_lo_idx: int = 2,
) -> str:
    """DuckDB twin of :func:`poisson_bootstrap_mean_ci`."""
    t = POISSON1_CDF_SC

    def w_expr(r: int) -> str:
        u = (
            f"(('0x' || substr(md5(CAST({id_sql} AS VARCHAR) || ':r{r}'),"
            f" 1, 15))::BIGINT % 10000)"
        )
        return (
            f"(CASE WHEN {u} < {t[0]} THEN 0 WHEN {u} < {t[1]} THEN 1"
            f" WHEN {u} < {t[2]} THEN 2 WHEN {u} < {t[3]} THEN 3"
            f" WHEN {u} < {t[4]} THEN 4 ELSE 5 END)"
        )

    sums = ",\n             ".join(
        f"SUM({w_expr(r)} * v) AS ws_{r}, CAST(SUM({w_expr(r)}) AS BIGINT) AS ww_{r}"
        for r in range(b)
    )
    mean_list = ", ".join(
        f"CASE WHEN ww_{r} > 0 THEN CAST(ws_{r} AS DOUBLE)"
        f" / CAST(ww_{r} AS DOUBLE) END"
        for r in range(b)
    )
    return f"""
    WITH base AS (
      SELECT {id_sql}, CAST(FLOOR({value_sql} * {value_scale}) AS BIGINT) AS v
      FROM {table}
    ), m AS (
      SELECT COUNT(*) AS n, CAST(SUM(v) AS BIGINT) AS s,
             {sums}
      FROM base
    ), arr AS (
      SELECT n, s, list_sort([{mean_list}]) AS means FROM m
    )
    SELECT CAST(n AS BIGINT) AS n,
      CAST(FLOOR(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) * 10000) AS BIGINT)
        AS mean_sc,
      CAST(FLOOR(means[{alpha_lo_idx}] * 10000) AS BIGINT) AS ci_lo_sc,
      CAST(FLOOR(means[{b + 1 - alpha_lo_idx}] * 10000) AS BIGINT) AS ci_hi_sc,
      CAST(FLOOR((means[{b + 1 - alpha_lo_idx}] - means[{alpha_lo_idx}])
        * 10000) AS BIGINT) AS width_sc
    FROM arr
    """
