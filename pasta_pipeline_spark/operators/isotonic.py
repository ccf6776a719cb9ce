"""Isotonic regression calibration (PAVA) over score bins.

The standard calibrator for a cheap quality/ranking score (Zadrozny &
Elkan 2002): fit the best MONOTONE step function of empirical label
rates over score bins — where the raw per-bin rates wiggle (noise, or
a genuinely miscalibrated score), the isotonic fit pools them. The
classic algorithm is the pool-adjacent-violators stack, which is
sequential; at scale this module uses the equivalent closed form

    fit[i] = max_{j<=i} min_{k>=i} avg(y over bins j..k)

over the BOUNDED bin frame — every step is a bounded window or a
bounded explode, nothing sequential, nothing driver-side:

1. one fact-scan groupBy(bin) → (n, sum_y) per bin (map-side
   combined);
2. dense re-rank + prefix sums over the <= n_bins-row frame;
3. interval averages for all (j, k) pairs via an in-row
   ``sequence(j, B)`` explode (O(B²) bounded rows, NO cartesian
   join);
4. running min over k (descending window per j) gives
   m(j, i) = min_{k>=i} avg(j..k) at each row k = i;
5. groupBy(i) max over j <= i (every surviving row has j <= i by
   construction) = the isotonic fit.

Exactness: interval averages are single double divisions of exact
int64 prefix sums; min/max/floor over those doubles are
order-independent — the whole fit is value-hash oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def isotonic_bin_moments(
    df: DataFrame,
    score_bin: Column,
    label: Column,
) -> DataFrame:
    """The SUFFICIENT STATISTICS of the isotonic fit: per-bin (n, s)
    int64 moments — one map-side-combined groupBy over the fact scan.
    Additively mergeable (any batch boundaries give the same state),
    which is what makes the streaming twin
    (streaming/sink.py incremental_isotonic_sink) exact."""
    return df.select(
        score_bin.cast("long").alias("bin"), label.cast("long").alias("y")
    ).groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").cast("long").alias("s")
    )


def isotonic_calibration(
    df: DataFrame,
    score_bin: Column,
    label: Column,
) -> DataFrame:
    """Isotonic fit of ``label`` (0/1) rates over ``score_bin``
    (int64, ordered). Returns one row per non-empty bin, ordered:
    bin, n, rate_sc (raw empirical rate), iso_sc (monotone fit),
    pooled (fit != raw — this bin was averaged with a violator).
    """
    return isotonic_fit_from_bins(isotonic_bin_moments(df, score_bin, label))


def isotonic_fit_from_bins(bins: DataFrame) -> DataFrame:
    """The PAVA closed form over a ``(bin, n, s)`` moment frame —
    shared by the batch operator (which computes the bins from a fact
    scan) and the streaming report (which reads them from maintained
    sink state), so maintained == batch is structural."""
    w_ord = Window.partitionBy().orderBy("bin")  # bounded: n_bins rows
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked = bins.select(
        "bin",
        "n",
        "s",
        F.row_number().over(w_ord).alias("r"),
        # cumulative names avoid n/s: Spark resolution is
        # case-insensitive, so "N" would collide with "n"
        F.sum("n").over(w_cum).alias("cum_n"),
        F.sum("s").over(w_cum).alias("cum_s"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n_bins"),
    )
    prefix = ranked.select(
        F.col("r").alias("pr"),
        F.col("cum_n").alias("p_n"),
        F.col("cum_s").alias("p_s"),
    )
    # all intervals starting at j = this row's rank: k in [j, n_bins]
    pairs = ranked.select(
        F.col("r").alias("j"),
        (F.col("cum_n") - F.col("n")).alias("n0"),  # prefix before j
        (F.col("cum_s") - F.col("s")).alias("s0"),
        F.explode(F.expr("sequence(r, n_bins)")).alias("k"),
    )
    pairs = pairs.join(F.broadcast(prefix), pairs["k"] == prefix["pr"]).select(
        "j",
        "k",
        (
            (F.col("p_s") - F.col("s0")).cast("double")
            / (F.col("p_n") - F.col("n0")).cast("double")
        ).alias("avg"),
    )
    # m(j, i) = min over k >= i of avg(j..k), materialized at row k = i
    w_min = Window.partitionBy("j").orderBy(F.desc("k")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    m = pairs.withColumn("m", F.min("avg").over(w_min))
    fit = m.groupBy(F.col("k").alias("r")).agg(F.max("m").alias("iso"))
    out = ranked.join(fit, "r").select(
        "bin",
        F.col("n").cast("long").alias("n"),
        F.floor(F.col("s").cast("double") / F.col("n").cast("double") * 1000000)
        .cast("long")
        .alias("rate_sc"),
        F.floor(F.col("iso") * 1000000).cast("long").alias("iso_sc"),
    )
    return out.withColumn(
        "pooled", F.col("iso_sc") != F.col("rate_sc")
    ).orderBy("bin")


def isotonic_oracle_sql(
    table: str, bin_sql: str, label_sql: str
) -> str:
    """DuckDB twin of :func:`isotonic_calibration`."""
    return f"""
    WITH bins AS (
      SELECT {bin_sql} AS bin, COUNT(*) AS n,
             SUM(CASE WHEN {label_sql} THEN 1 ELSE 0 END) AS s
      FROM {table} GROUP BY 1
    ), ranked AS (
      -- cum_n/cum_s, NOT "N"/"S": DuckDB identifier resolution is
      -- case-insensitive too, N would silently shadow n (NOTES #49)
      SELECT bin, n, s,
             ROW_NUMBER() OVER (ORDER BY bin) AS r,
             SUM(n) OVER (ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n,
             SUM(s) OVER (ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_s,
             COUNT(*) OVER () AS n_bins
      FROM bins
    ), pairs AS (
      SELECT j, k,
             CAST(p.cum_s - s0 AS DOUBLE) / CAST(p.cum_n - n0 AS DOUBLE) AS avg
      FROM (
        SELECT r AS j, cum_n - n AS n0, cum_s - s AS s0,
               unnest(range(r, n_bins + 1)) AS k
        FROM ranked
      ) iv JOIN (SELECT r, cum_n, cum_s FROM ranked) p ON p.r = iv.k
    ), mins AS (
      SELECT j, k, MIN(avg) OVER (PARTITION BY j ORDER BY k DESC
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m
      FROM pairs
    ), fit AS (
      SELECT k AS r, MAX(m) AS iso FROM mins GROUP BY k
    )
    SELECT bin, CAST(n AS BIGINT) AS n,
      CAST(FLOOR(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) * 1000000)
        AS BIGINT) AS rate_sc,
      CAST(FLOOR(iso * 1000000) AS BIGINT) AS iso_sc,
      CAST(FLOOR(iso * 1000000) AS BIGINT)
        <> CAST(FLOOR(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) * 1000000)
             AS BIGINT) AS pooled
    FROM ranked JOIN fit USING (r) ORDER BY bin
    """
