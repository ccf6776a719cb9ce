"""Exact-moment statistics: Pearson correlation + OLS fit per group.

``F.corr`` / ``REGR_SLOPE`` exist in both engines but accumulate
doubles in shuffle order — their last bits are nondeterministic run to
run, which fails the cross-engine value-hash gate. This module instead
computes the five raw moments as EXACT int64 sums over fixed-point
inputs (order-free), then derives r / slope / intercept in double
arithmetic whose expression text is GENERATED ONCE here and shared by
the Spark plan and the DuckDB oracle (the ``zvalue2_sql`` technique) —
identical int64 inputs + identical IEEE expression ⇒ identical
doubles ⇒ stable fixed-point outputs.

Overflow envelope: with |xf| <= Mx, |yf| <= My, the largest int64 sum
is ``SUM(yf*yf) <= n*My^2``; for the catalog instance (yf = floored
order price <= 1e5, so My^2 = 1e10) that stays inside int64 to
n ≈ 9e8 rows — beyond TPC-H sf100 lineitem. Callers with wider values
pick a smaller fixed-point scale; the derived step itself is
double-based and cannot overflow.

Scale shape: one select (per-row fixed-pointing) + one partial-agg
groupBy — a single shuffle of six longs per group, no window, no
second pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: fixed-point scale of the derived (double) outputs
OUT_SCALE = 1_000_000


def derived_exprs(out_scale: int = OUT_SCALE) -> dict[str, str]:
    """SQL text for the derived statistics over the moment columns
    ``(n, sx, sy, sxy, sxx, syy)``. Used verbatim by BOTH engines —
    never inline a variant of these formulas elsewhere."""
    num = "CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)"
    denx = "CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)"
    deny = "CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)"
    return {
        "corr_fp": f"CAST(FLOOR(({num}) / NULLIF(sqrt(({denx}) * ({deny})), 0.0) * {out_scale}) AS BIGINT)",
        "slope_fp": f"CAST(FLOOR(({num}) / NULLIF({denx}, 0.0) * {out_scale}) AS BIGINT)",
        "intercept_fp": (
            f"CAST(FLOOR((CAST(sy AS DOUBLE) - ({num}) / NULLIF({denx}, 0.0)"
            f" * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) * {out_scale}) AS BIGINT)"
        ),
    }


def correlation_regression(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_by: list[str] | None = None,
    x_scale: int = 1,
    y_scale: int = 1,
    out_scale: int = OUT_SCALE,
) -> DataFrame:
    """Per-group ``(n, corr_fp, slope_fp, intercept_fp)`` for
    ``y ~ x``. Inputs are floored to int64 at ``x_scale``/``y_scale``
    (the statistic is DEFINED over the floored values — a documented
    contract, not a lossy approximation of the double statistic).
    Constant-``x`` or constant-``y`` groups yield NULLs (NULLIF'd zero
    denominators) instead of inf/NaN."""
    xf = F.floor(F.col(x_col) * F.lit(x_scale)).cast("long")
    yf = F.floor(F.col(y_col) * F.lit(y_scale)).cast("long")
    base = df.where(F.col(x_col).isNotNull() & F.col(y_col).isNotNull()).select(
        *(group_by or []), xf.alias("__x"), yf.alias("__y")
    )
    moments = (
        base.groupBy(*(group_by or []))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("__x").cast("long").alias("sx"),
            F.sum("__y").cast("long").alias("sy"),
            F.sum(F.col("__x") * F.col("__y")).cast("long").alias("sxy"),
            F.sum(F.col("__x") * F.col("__x")).cast("long").alias("sxx"),
            F.sum(F.col("__y") * F.col("__y")).cast("long").alias("syy"),
        )
    )
    d = derived_exprs(out_scale)
    return moments.select(
        *(group_by or []),
        "n",
        F.expr(d["corr_fp"]).alias("corr_fp"),
        F.expr(d["slope_fp"]).alias("slope_fp"),
        F.expr(d["intercept_fp"]).alias("intercept_fp"),
    )


def moments_oracle_sql(
    table: str,
    x_sql: str,
    y_sql: str,
    group_by: str | None = None,
    where: str | None = None,
    out_scale: int = OUT_SCALE,
) -> str:
    """DuckDB twin generated from the SAME derived expressions."""
    d = derived_exprs(out_scale)
    grp_sel = f"{group_by}, " if group_by else ""
    grp_cl = f"GROUP BY {group_by}" if group_by else ""
    where_cl = f"WHERE {where}" if where else ""
    return f"""
    WITH m AS (
      SELECT {grp_sel}
             CAST(count(*) AS BIGINT) AS n,
             CAST(SUM(xf) AS BIGINT) AS sx,
             CAST(SUM(yf) AS BIGINT) AS sy,
             CAST(SUM(xf * yf) AS BIGINT) AS sxy,
             CAST(SUM(xf * xf) AS BIGINT) AS sxx,
             CAST(SUM(yf * yf) AS BIGINT) AS syy
      FROM (SELECT {grp_sel}
                   CAST(FLOOR({x_sql}) AS BIGINT) AS xf,
                   CAST(FLOOR({y_sql}) AS BIGINT) AS yf
            FROM {table} {where_cl}) t
      {grp_cl}
    )
    SELECT {grp_sel} n,
           {d['corr_fp']} AS corr_fp,
           {d['slope_fp']} AS slope_fp,
           {d['intercept_fp']} AS intercept_fp
    FROM m
    """
