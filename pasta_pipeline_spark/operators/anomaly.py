"""Ingest-rate anomaly detection — the ops monitor for acquisition.

A crawl/ingest pipeline fails quietly: a source's feed breaks (counts
collapse), or a spam burst floods it (counts spike). The standard
monitor is a z-score of the current batch's row count against that
source's own history. Expressed relationally: one groupBy over the
history for exact int64 moment sums (n, Σx, Σx²), one join with the
current batch's counts, and a fixed-point z computed the
cross-engine-exact way (the zscore/moments recipe this package uses
everywhere):

    z_fp = FLOOR( (n·cur − Σx) · 10000 / sqrt(n·(n·Σx² − Σx²̲)) )

— numerator and the radicand are pure int64; ``sqrt`` on an exact
integer double is bit-identical across engines; one floor at the end.
Degenerate histories (fewer than 2 batches, or zero variance) yield
NULL z — flagged separately via the exact deviation, never a
divide-by-zero.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ingest_anomaly(
    history: DataFrame,
    current: DataFrame,
    key_col: str = "source",
    count_col: str = "n_docs",
    z_threshold_fp: int = 30000,
) -> DataFrame:
    """Per-key batch-count anomaly report.

    ``history``: one row per (key, past batch) with the batch's row
    count; ``current``: one row per key with the newest batch's count
    (keys with no history row pass through with NULL z and
    ``is_anomaly`` NULL — a NEW source is a policy question, not a
    statistical one). Returns ``(key, n_hist, hist_total, cur_count,
    dev, z_fp, is_anomaly)`` where ``dev = n·cur − Σx`` (the exact
    scaled deviation), ``z_fp`` the fixed-point z (1e4 units, NULL on
    degenerate history), and ``is_anomaly = |z_fp| > z_threshold_fp``
    (default 3σ)."""
    stats = history.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).cast("long").alias("n_hist"),
        F.sum(F.col(count_col)).cast("long").alias("sx"),
        F.sum(F.col(count_col) * F.col(count_col)).cast("long").alias("sx2"),
    )
    cur = current.select(
        F.col(key_col).alias("key"), F.col(count_col).cast("long").alias("cur_count")
    )
    j = cur.join(F.broadcast(stats), "key", "left")
    dev = F.col("n_hist") * F.col("cur_count") - F.col("sx")
    radicand = F.col("n_hist") * (
        F.col("n_hist") * F.col("sx2") - F.col("sx") * F.col("sx")
    )
    z_fp = F.when(
        (F.col("n_hist") >= 2) & (radicand > 0),
        F.floor(dev * F.lit(10000) / F.sqrt(radicand.cast("double"))).cast("long"),
    )
    return j.select(
        F.col("key").alias(key_col),
        F.coalesce(F.col("n_hist"), F.lit(0)).cast("long").alias("n_hist"),
        F.coalesce(F.col("sx"), F.lit(0)).cast("long").alias("hist_total"),
        "cur_count",
        F.coalesce(dev, F.lit(0)).cast("long").alias("dev"),
        z_fp.alias("z_fp"),
        F.when(
            z_fp.isNotNull(), F.abs(z_fp) > F.lit(z_threshold_fp)
        ).alias("is_anomaly"),
    )


def cusum_drift(
    df: DataFrame,
    bucket_col: str,
    value_col: str,
    group_cols: list[str],
    allowance_fp: int | None = None,
    fp_scale: int = 10_000,
) -> DataFrame:
    """One-sided CUSUM drift detection over a bucketed series — "when
    did this source's volume start drifting upward?" as the classic
    Page (1954) cumulative-sum chart.

    The textbook recurrence ``S_t = max(0, S_{t-1} + (x_t - k))``
    looks like another cumsum-with-reset (greedy_pack territory), but
    has a CLOSED FORM windows express exactly:

        S_t = C_t - min(0, min_{j<=t} C_j),  C = running sum of (x_t - k)

    so no Arrow stage and no recursion — two stacked windows per
    group. ``k`` (the allowance) defaults to the per-group mean so a
    flat series scores ~0; everything runs in fixed point (values
    scaled by ``fp_scale``, the mean via integer division) — pure
    int64, engine-exact.

    Emits per group: max statistic ``s_max_fp``, the bucket where it
    peaks (smallest on ties), and ``n_buckets``. Windows partition by
    group — each group's series is bucket-scale (days/hours, not
    rows), and groups parallelize; the raw rows reduce to buckets in
    the first aggregate.
    """
    if not group_cols:
        raise ValueError("cusum_drift requires group_cols (per-series charts)")
    per_bucket = df.groupBy(*group_cols, F.col(bucket_col).alias("bucket")).agg(
        F.sum(F.col(value_col).cast("long")).cast("long").alias("x")
    )
    from pyspark.sql import Window

    wg = Window.partitionBy(*group_cols)
    wcum = wg.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    scaled = per_bucket.withColumn("x_fp", (F.col("x") * fp_scale).cast("long"))
    if allowance_fp is None:
        scaled = (
            scaled.withColumn("__n", F.count("x").over(wg))
            .withColumn("__s", F.sum("x").over(wg))
            .withColumn("k_fp", F.expr(f"(__s * {fp_scale}) div __n").cast("long"))
        )
    else:
        scaled = scaled.withColumn("k_fp", F.lit(allowance_fp).cast("long"))
    cum = scaled.withColumn(
        "c_fp", F.sum(F.col("x_fp") - F.col("k_fp")).over(wcum).cast("long")
    )
    s = cum.withColumn(
        "s_fp",
        (F.col("c_fp") - F.least(F.min("c_fp").over(wcum), F.lit(0))).cast("long"),
    )
    peak = s.groupBy(*group_cols).agg(
        F.max("s_fp").cast("long").alias("s_max_fp"),
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
    )
    return (
        s.join(F.broadcast(peak), group_cols)
        .where(F.col("s_fp") == F.col("s_max_fp"))
        .groupBy(*group_cols, "s_max_fp", "n_buckets")
        .agg(F.min("bucket").alias("bucket_at_max"))
        .select(*group_cols, "n_buckets", "s_max_fp", "bucket_at_max")
    )
