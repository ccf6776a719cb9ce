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
