"""Operator-internal utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition when the input arrives with fewer
    partitions than the session's parallelism.

    Small dimension files (one parquet row group) arrive as a single
    partition; a compute-heavy operator (shingling, hashing, Python
    stages) would then run on one core no matter how wide the cluster
    is — a single unsplittable row group cannot be parallelized by
    ``maxPartitionBytes``. The repartition shuffle is tiny relative to
    the compute it unlocks. At real scale inputs already have many
    partitions and this is a no-op.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
