"""Robust statistics — winsorization and MAD-based outlier flags.

Training-data pipelines clamp or drop extreme numeric features before
they reach a model (quality scores, doc lengths, prices); dashboards
need outlier counts that a single wild row cannot poison. Both
operators build on exact grouped percentiles, which Spark
``percentile`` and DuckDB ``quantile_cont`` evaluate with the
identical SQL-standard interpolation (verified bit-identical by the
``price_quantiles`` catalog row) — so even the derived doubles here
hash-match cross-engine without a fixed-point bridge.

Spark-first shape: percentiles are one partial-aggregated groupBy over
the group keys; the per-row pass rejoins them via broadcast (group
cardinality is small by construction — it is a GROUP BY result), so
the data table is scanned exactly twice (once for quantiles, once for
the row pass) and never shuffled on the row axis. At 100 TB swap
``percentile`` for ``approx_percentile`` (t-digest, one pass, merge-
able sketches) where tolerance allows — signature stays the same.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def winsorize(
    df: DataFrame,
    value_col: str,
    group_by: Sequence[str],
    lower: float = 0.05,
    upper: float = 0.95,
) -> DataFrame:
    """Clamp ``value_col`` into its per-group [lower, upper] exact
    percentile range. Adds ``<value_col>_w`` (clamped), ``clamped_low``
    / ``clamped_high`` flags, and the group bounds ``p_lo`` / ``p_hi``.

    The clamped value is either the original double or a percentile
    bound — both bit-identical across engines, so downstream hashes
    agree with the DuckDB twin (least/greatest over quantile_cont).
    """
    keys = list(group_by)
    pcts = df.groupBy(*keys).agg(
        F.expr(f"percentile({value_col}, {lower!r})").alias("p_lo"),
        F.expr(f"percentile({value_col}, {upper!r})").alias("p_hi"),
    )
    joined = df.join(F.broadcast(pcts), keys)
    v = F.col(value_col)
    return joined.select(
        *df.columns,
        "p_lo",
        "p_hi",
        F.least(F.greatest(v, F.col("p_lo")), F.col("p_hi")).alias(f"{value_col}_w"),
        (v < F.col("p_lo")).alias("clamped_low"),
        (v > F.col("p_hi")).alias("clamped_high"),
    )


def mad_outliers(
    df: DataFrame,
    value_col: str,
    group_by: Sequence[str],
    k: float = 3.0,
) -> DataFrame:
    """Per-group robust outlier summary: median, MAD (median absolute
    deviation), and the count of rows with ``|x - med| > k * MAD``.

    Two grouped exact-percentile passes (median of x, then median of
    |x - med|) and one counting pass — three scans, each a plain
    partial-agg groupBy; the tiny group-level frames rejoin by
    broadcast. Unlike stddev-based z-scores, a handful of wild rows
    cannot inflate the threshold (50% breakdown point), which is what
    makes this the quality-gate form for corpus features.

    Returns one row per group: ``n_rows``, ``n_outliers``, ``med``,
    ``mad`` — all cross-engine exact (medians interpolate identically;
    the comparison operates on bit-identical doubles).
    """
    keys = list(group_by)
    med = df.groupBy(*keys).agg(F.expr(f"percentile({value_col}, 0.5)").alias("med"))
    dev = df.join(F.broadcast(med), keys).withColumn(
        "__dev", F.abs(F.col(value_col) - F.col("med"))
    )
    mad = dev.groupBy(*keys).agg(F.expr("percentile(__dev, 0.5)").alias("mad"))
    flagged = dev.join(F.broadcast(mad), keys)
    return flagged.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum((F.col("__dev") > F.lit(k) * F.col("mad")).cast("long")).alias(
            "n_outliers"
        ),
        F.min("med").alias("med"),
        F.min("mad").alias("mad"),
    )


def winsorized_stats(
    df,
    value_col: str,
    group_col: str | None = None,
    lo_bp: int = 500,
    hi_bp: int = 9500,
):
    """Winsorized summary per group — the robust mean a skewed metric
    (doc length, price, score) needs before outliers drive the
    average: exact percentile bounds at ``lo_bp``/``hi_bp`` basis
    points (percentile-disc semantics: the value at sorted position
    ``max(1, (bp·n) div 10000)``, deterministic duplicate-safe
    row_number order), values clamped to [lo, hi], and the clamped
    integer mean.

    Returns ``(group?, n, lo_bound, hi_bound, n_clipped_lo,
    n_clipped_hi, wmean)`` — all int64 (pass an integer value column;
    fixed-point upstream if needed). One rank window per group + a
    group-cardinality join back; NULL values excluded."""
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    if not (0 <= lo_bp < hi_bp <= 10000):
        raise ValueError("need 0 <= lo_bp < hi_bp <= 10000")
    gs = [group_col] if group_col else []
    v = F.col(value_col).cast("long")
    src = df.where(v.isNotNull()).select(*gs, v.alias("v"))
    w = Window.partitionBy(*gs).orderBy(F.asc("v"))
    wn = Window.partitionBy(*gs)
    ranked = src.withColumn("rn", F.row_number().over(w).cast("long")).withColumn(
        "n", F.count(F.lit(1)).over(wn).cast("long")
    )
    lo_rank = F.greatest(F.lit(1).cast("long"), F.expr(f"({lo_bp} * n) div 10000"))
    hi_rank = F.greatest(F.lit(1).cast("long"), F.expr(f"({hi_bp} * n) div 10000"))
    marked = ranked.withColumn("lo_rk", lo_rank).withColumn("hi_rk", hi_rank)
    bounds = marked.groupBy(*gs).agg(
        F.min(F.when(F.col("rn") == F.col("lo_rk"), F.col("v"))).alias("lo_bound"),
        F.min(F.when(F.col("rn") == F.col("hi_rk"), F.col("v"))).alias("hi_bound"),
    )
    joined = (
        src.join(F.broadcast(bounds), gs)
        if gs
        else src.crossJoin(F.broadcast(bounds))
    )
    clipped = F.when(F.col("v") < F.col("lo_bound"), F.col("lo_bound")).when(
        F.col("v") > F.col("hi_bound"), F.col("hi_bound")
    ).otherwise(F.col("v"))
    return joined.select(
        *gs, "v", "lo_bound", "hi_bound", clipped.alias("cv")
    ).groupBy(*gs).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min("lo_bound").cast("long").alias("lo_bound"),
        F.min("hi_bound").cast("long").alias("hi_bound"),
        F.sum((F.col("v") < F.col("lo_bound")).cast("long")).cast("long").alias("n_clipped_lo"),
        F.sum((F.col("v") > F.col("hi_bound")).cast("long")).cast("long").alias("n_clipped_hi"),
        F.expr("sum(cv) div count(1)").cast("long").alias("wmean"),
    )
