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

from pyspark.sql import DataFrame, Window
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


def partial_histogram(
    df: DataFrame,
    keys: list[str] | str,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 64,
    scale: int = SCALE,
) -> DataFrame:
    """Per-key fixed-bin histogram — the MERGEABLE quantile state
    (t-digest's role, but exactly reproducible): values quantize to
    ``FLOOR(v*scale)`` int64, the [lo, hi) range splits into
    ``n_bins`` equal integer-width bins, under/overflow clamp to the
    edge bins. State per key = n_bins int64 counts — tiny, and two
    states merge by elementwise addition (:func:`merge_histograms`),
    so quantiles stay maintainable incrementally where the exact
    percentile would rescan the corpus.

    One groupBy (partial aggregation does the work map-side);
    everything integer — bin assignment uses int64 `div`, never a
    double round-trip, so offsets beyond 2^53 (byte-size histograms at
    100 TB) still bin exactly and Spark == DuckDB. NULL values are
    excluded (they belong to no bin; counting them would put engine-
    dependent NULL rows in the state).
    """
    ks = [keys] if isinstance(keys, str) else list(keys)
    lo_x = int(lo * scale)
    hi_x = int(hi * scale)
    width = max((hi_x - lo_x) // n_bins, 1)
    # `div` is int64 division (truncating); x - lo_x can only be
    # negative for underflow values, where truncation vs floor both
    # land <= 0 and the greatest() clamp maps them to bin 0.
    raw = F.expr(
        f"(CAST(FLOOR(`{value_col}` * {scale}) AS BIGINT) - {lo_x}L) div {width}L"
    )
    bin_ = F.least(F.greatest(raw, F.lit(0)), F.lit(n_bins - 1)).cast("long")
    return (
        df.filter(F.col(value_col).isNotNull())
        .withColumn("__bin", bin_)
        .groupBy(*ks, "__bin")
        .agg(F.count(F.lit(1)).cast("long").alias("bin_n"))
        .withColumnRenamed("__bin", "bin")
    )


def merge_histograms(a: DataFrame, b: DataFrame, keys: list[str] | str) -> DataFrame:
    """Elementwise-add two histogram states (same binning config by
    contract). Associative and commutative — any merge tree agrees."""
    ks = [keys] if isinstance(keys, str) else list(keys)
    return (
        a.unionByName(b)
        .groupBy(*ks, "bin")
        .agg(F.sum("bin_n").cast("long").alias("bin_n"))
    )


def histogram_quantile_bin(
    hist: DataFrame, keys: list[str] | str, p_bp: int
) -> DataFrame:
    """The bin containing the p-th percentile (``p_bp`` in basis
    points: 5000 = median) per key: smallest bin whose cumulative
    count reaches ``ceil(p * total)``. All-integer rank arithmetic —
    hash-stable; resolution is the bin width (the fixed-bin trade).
    One window over (key, bin) — bounded by n_bins per key.
    """
    ks = [keys] if isinstance(keys, str) else list(keys)
    w = (
        Window.partitionBy(*ks)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy(*ks)
    ranked = (
        hist.withColumn("cum_n", F.sum("bin_n").over(w).cast("long"))
        .withColumn("total", F.sum("bin_n").over(wt).cast("long"))
        .withColumn(
            "target", F.expr(f"CAST(ceil(total * {p_bp} / 10000.0) AS BIGINT)")
        )
    )
    qual = ranked.filter(F.col("cum_n") >= F.col("target"))
    wmin = Window.partitionBy(*ks).orderBy("bin")
    return (
        qual.withColumn("__rk", F.row_number().over(wmin))
        .filter(F.col("__rk") == 1)
        .select(*ks, F.col("bin").alias("q_bin"), "cum_n", "total")
    )
