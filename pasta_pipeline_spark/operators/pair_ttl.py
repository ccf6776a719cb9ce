"""Dedup-pair lifecycle analytics over the streaming pair history.

The incremental LSH index (streaming/dedup.py) appends every detected
near-dup pair to a history directory, batch after batch. Operations
questions follow immediately: how many NEW duplicate pairs does each
batch bring in (is the crawl re-fetching old content?), how many
detections are re-confirmations, and how many pairs are ACTIVE under a
TTL (seen within the last N batches — the working set a downstream
suppression filter must hold)?

The active-count is the interesting one at scale. The naive plan
explodes each detection into the ``ttl`` batches it keeps the pair
alive for (detection mass × ttl rows) or runs a range join (batch
spine × pair intervals). Instead the implementation delta-encodes:

1. per pair, overlapping alive-intervals ``[batch, batch+ttl-1]``
   merge into islands (the same gaps-and-islands idiom as
   subdoc_dedup.duplicated_spans — one window over the pair key);
2. each island emits two deltas: ``+1`` at its start batch, ``-1``
   just past its end;
3. the per-batch active count is the running sum of deltas over the
   batch spine.

Detection mass is touched once; the only non-linear structure is the
final cumulative sum over the BATCH SPINE, which is bounded by the
time range (thousands of batches), not the corpus — a metadata-scale
single-partition window, the same class as a 1-row aggregate handoff.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pair_history_report(
    history: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    batch_col: str = "batch_id",
    ttl: int = 3,
) -> DataFrame:
    """Per-batch pair lifecycle report over a detection history:
    ``(batch_id, n_new, n_redetected, n_active)`` where

    - ``n_new``: distinct pairs whose FIRST detection is this batch;
    - ``n_redetected``: distinct pairs detected this batch that were
      already known (first seen earlier);
    - ``n_active``: pairs whose most recent detection is within
      ``ttl`` batches (inclusive window ``[b - ttl + 1, b]`` — a pair
      detected at ``d`` stays active through ``d + ttl - 1``).

    Every batch in the observed ``[min, max]`` range appears, including
    batches with no detections (active pairs can span them).
    """
    if ttl < 1:
        raise ValueError("ttl must be >= 1")
    from pyspark.sql import Window

    det = (
        history.select(
            F.col(a_col).alias("a"),
            F.col(b_col).alias("b"),
            F.col(batch_col).cast("long").alias("bt"),
        )
        .distinct()
        .persist()
    )

    # new / re-detected per batch: one window for the pair's first
    # sighting, one groupBy on the batch
    wp = Window.partitionBy("a", "b")
    fb = det.withColumn("first_b", F.min("bt").over(wp))
    batch_stats = fb.groupBy("bt").agg(
        F.sum((F.col("first_b") == F.col("bt")).cast("long")).alias("n_new"),
        F.sum((F.col("first_b") < F.col("bt")).cast("long")).alias("n_redetected"),
    )

    # alive-interval islands per pair (gaps-and-islands): interval
    # [bt, bt + ttl - 1]; a detection extends the island if it starts
    # before the running max end + 1
    wo = Window.partitionBy("a", "b").orderBy("bt")
    prev_max_end = F.max(F.col("bt") + F.lit(ttl - 1)).over(
        wo.rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = det.withColumn(
        "brk",
        (F.col("bt") > F.coalesce(prev_max_end, F.lit(-(1 << 60))) + 1).cast("long"),
    )
    isl = marked.withColumn(
        "island",
        F.sum("brk").over(wo.rowsBetween(Window.unboundedPreceding, 0)),
    )
    intervals = isl.groupBy("a", "b", "island").agg(
        F.min("bt").alias("s"), (F.max("bt") + F.lit(ttl - 1)).alias("e")
    )
    deltas = intervals.select(F.col("s").alias("bt"), F.lit(1).alias("d")).unionByName(
        intervals.select((F.col("e") + 1).alias("bt"), F.lit(-1).alias("d"))
    )
    dsum = deltas.groupBy("bt").agg(F.sum("d").alias("d"))

    # batch spine from the observed range (1-row aggregate handoff)
    rng = det.agg(
        F.min("bt").alias("__lo"), F.max("bt").alias("__hi")
    )
    spine = rng.select(
        F.explode(F.sequence(F.col("__lo"), F.col("__hi"))).alias("bt")
    )
    active = (
        spine.join(dsum, "bt", "left")
        .withColumn(
            "n_active",
            F.sum(F.coalesce(F.col("d"), F.lit(0))).over(
                Window.orderBy("bt").rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .select("bt", "n_active")
    )

    out = (
        active.join(batch_stats, "bt", "left")
        .select(
            F.col("bt").alias("batch_id"),
            F.coalesce(F.col("n_new"), F.lit(0)).cast("long").alias("n_new"),
            F.coalesce(F.col("n_redetected"), F.lit(0)).cast("long").alias("n_redetected"),
            F.col("n_active").cast("long").alias("n_active"),
        )
    )
    from pasta_pipeline_spark.operators.util import attach_cached_deps

    return attach_cached_deps(out, [det])
