"""Mergeable aggregation summaries — incremental rollup state.

The scale idiom behind every incremental pipeline: instead of
re-aggregating the full corpus each run, keep a per-key SUMMARY
(count / fixed-point sum / min / max / sum-of-squares) that is
(a) computable per batch, (b) mergeable associatively — combining two
summaries equals summarizing the union — and (c) finalizable into
mean/variance at read time. This is the algebraic-aggregate contract
Spark's own partial aggregation uses inside a single query
(map-side combine); these operators expose it ACROSS runs and tables,
so a daily batch summary folds into a lifetime summary with
metadata-scale work.

All state is int64 (fixed-point sums, integer squares), so merge
order cannot change a bit and summaries are oracle-exact; finalize's
doubles are single divisions of int64s.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Fixed-point scale for values; squares use scale² implicitly.
SCALE = 100


def partial_summary(
    df: DataFrame, keys: list[str] | str, value_col: str, scale: int = SCALE
) -> DataFrame:
    """Per-key mergeable summary of ``value_col``:
    (keys..., n, sum_x, min_x, max_x, sumsq_x) with x = FLOOR(value*scale)
    as int64. ``sumsq_x`` is the exact integer sum of x² — variance
    derives at finalize time without a second pass (the textbook
    E[x²]-E[x]² form is numerically safe here because the terms are
    exact integers, not rounded doubles)."""
    ks = [keys] if isinstance(keys, str) else list(keys)
    x = F.floor(F.col(value_col) * F.lit(scale)).cast("long")
    return df.groupBy(*ks).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sum_x"),
        F.min(x).alias("min_x"),
        F.max(x).alias("max_x"),
        F.sum(x * x).alias("sumsq_x"),
    )


def merge_summaries(a: DataFrame, b: DataFrame, keys: list[str] | str) -> DataFrame:
    """Combine two summary tables: per key, counts and sums add,
    min/max fold. Keys present in only one side pass through — the
    identity element is absence. Associative and commutative by
    construction (int64 adds), so any merge tree gives the same
    table."""
    ks = [keys] if isinstance(keys, str) else list(keys)
    return (
        a.unionByName(b)
        .groupBy(*ks)
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_x").alias("sum_x"),
            F.min("min_x").alias("min_x"),
            F.max("max_x").alias("max_x"),
            F.sum("sumsq_x").alias("sumsq_x"),
        )
    )


def finalize_summary(summary: DataFrame, scale: int = SCALE) -> DataFrame:
    """Derive the readable stats: mean and population variance as
    divisions of exact int64s (bit-stable cross-engine), plus the raw
    integer state for further merging."""
    n = F.col("n").cast("double")
    sx = F.col("sum_x").cast("double")
    ssq = F.col("sumsq_x").cast("double")
    s = float(scale)
    mean = sx / n / F.lit(s)
    var = (ssq / n - (sx / n) * (sx / n)) / F.lit(s * s)
    return summary.select(
        *[c for c in summary.columns],
        mean.alias("mean"),
        var.alias("variance"),
    )
