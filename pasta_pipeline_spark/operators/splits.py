"""Train/eval splits that respect near-duplicate structure.

The classic training-data failure: split documents into train and
holdout by row id, and every near-duplicate pair that straddles the
boundary silently leaks training text into evaluation — benchmark
numbers inflate and nobody can tell. Two operators:

- :func:`split_leakage` MEASURES it: given the near-dup pair frame
  (any dedup tier's output) and a deterministic id-hash split, emit
  every pair whose sides land in different splits;
- :func:`cluster_split` ELIMINATES it: assign the split on the
  duplicate-CLUSTER id instead of the document id, so every member of
  a cluster (and therefore both sides of every within-threshold pair)
  inherits the same split by construction. Zero crossing pairs, and
  the holdout fraction still concentrates to the target because
  cluster ids hash like any other key.

Both use the package's deterministic md5 bucket (sampling.py
``sample_bucket`` — membership is a pure function of the id, stable
across runs, engines, and partitionings; no RNG, no shuffle for the
assignment itself).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pasta_pipeline_spark.operators.sampling import (
    SAMPLE_DENOMINATOR,
    sample_bucket,
)


def assign_split(
    key: Column | str,
    holdout_frac: float = 0.1,
    denominator: int = SAMPLE_DENOMINATOR,
) -> Column:
    """``'holdout'`` iff the key's md5 bucket falls under
    ``holdout_frac``, else ``'train'`` — deterministic, join-free."""
    thr = int(holdout_frac * denominator)
    return F.when(
        sample_bucket(key, denominator) < thr, F.lit("holdout")
    ).otherwise(F.lit("train"))


def split_leakage(
    pairs: DataFrame,
    holdout_frac: float = 0.1,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
) -> DataFrame:
    """Near-dup pairs that STRADDLE an id-hash split — each is a
    document whose near-copy sits on the other side of the
    train/holdout boundary (evaluation leakage). Returns
    ``(doc_a, doc_b, split_a, split_b)`` for crossing pairs only;
    a pure projection + filter over the pair frame."""
    return (
        pairs.select(
            F.col(a_col).alias("doc_a"),
            F.col(b_col).alias("doc_b"),
            assign_split(F.col(a_col), holdout_frac).alias("split_a"),
            assign_split(F.col(b_col), holdout_frac).alias("split_b"),
        )
        .where(F.col("split_a") != F.col("split_b"))
    )


def cluster_split(
    clusters: DataFrame,
    holdout_frac: float = 0.1,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
) -> DataFrame:
    """Leakage-free split assignment: hash the CLUSTER id, members
    inherit — no near-dup pair inside any cluster can cross the
    boundary, by construction (singleton clusters behave exactly like
    a per-document split). Returns ``(doc_id, cluster_id, split)``;
    one projection over the cluster table, no joins."""
    return clusters.select(
        F.col(id_col),
        F.col(cluster_col),
        assign_split(F.col(cluster_col), holdout_frac).alias("split"),
    )
