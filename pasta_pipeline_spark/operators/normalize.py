"""Per-group normalization — the grouped-map (applyInPandas) pattern
(SURVEY.md §2.10 extension surface).

``zscore_by_label`` standardizes embedding dimensions within each
label group: z = (v - mean) / std. The group computation runs as an
Arrow-batched grouped-map UDF — the canonical applyInPandas shape
(one pandas frame per group in, one out).

Numeric discipline: means/variances are computed from fixed-point
int64 sums (numpy int64 addition is exact and order-free), then the
final z-score is a handful of IEEE double ops on exact inputs — so the
result is bit-reproducible and matches a SQL oracle that uses the
same fixed-point bridge.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

_SCALE = 10_000_000  # 1e7: float32 inputs keep full precision at this scale

ZSCORE_SCHEMA = StructType(
    [
        StructField("vec_id", LongType(), False),
        StructField("label", IntegerType(), True),
        StructField("pos", IntegerType(), False),
        StructField("z", DoubleType(), True),
    ]
)


def _zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
    label = pdf["label"].iloc[0]
    mat = np.stack([np.asarray(e, dtype=np.float64) for e in pdf["embedding"]])
    fp = np.floor(mat * _SCALE).astype(np.int64)  # exact per-element
    n = fp.shape[0]
    sum_fp = fp.sum(axis=0)  # int64: exact, order-free
    mean = sum_fp / _SCALE / n
    # population variance from exact integer sums of squares
    sq_fp = fp.astype(object) ** 2  # object ints: no int64 overflow on squares
    sum_sq = np.array([int(x) for x in sq_fp.sum(axis=0)], dtype=np.float64)
    var = sum_sq / (_SCALE * _SCALE) / n - mean * mean
    std = np.sqrt(np.maximum(var, 0.0))
    z = (fp / _SCALE - mean) / np.where(std == 0.0, np.nan, std)
    out = pd.DataFrame(
        {
            "vec_id": np.repeat(pdf["vec_id"].to_numpy(), mat.shape[1]),
            "label": label,
            "pos": np.tile(np.arange(mat.shape[1], dtype=np.int32), n),
            "z": z.ravel(),
        }
    )
    return out


def zscore_by_label(
    embeddings: DataFrame,
    label_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Standardize every embedding dimension within its label group.
    Output: one row per (vec_id, pos) with the z-scored value."""
    from pasta_pipeline_spark.operators.util import ensure_package_on_workers, ensure_parallelism

    ensure_package_on_workers(embeddings.sparkSession)
    src = ensure_parallelism(
        embeddings.select(
            F.col(id_col).alias("vec_id"),
            F.col(label_col).alias("label"),
            F.col(vec_col).alias("embedding"),
        )
    )
    return src.groupBy("label").applyInPandas(_zscore_group, ZSCORE_SCHEMA)


def rank_normalize(
    df: DataFrame,
    score_col: str,
    group_col: str,
    out_col: str = "rank_bp",
) -> DataFrame:
    """Per-group percentile-rank normalization of a score, in integer
    basis points: ``(rank - 1) * 10000 div (n - 1)`` with SQL RANK
    semantics (ties share a rank), 0 for single-row groups — the
    integer twin of ``percent_rank()``.

    Why a curation pipeline needs it: absolute quality scores are not
    comparable across sources (a mediocre doc on a great site can
    outscore a great doc on a weak site), so a single global
    threshold silently reweights sources; rank-normalizing within
    source first makes 'keep the top 30%' mean the same thing
    everywhere. One window per group; NULL scores pass through with
    NULL ranks."""
    from pyspark.sql import Window

    # rank over the NON-NULL slice only (NULLs sort first in an
    # ascending window and would inflate every real rank), then union
    # the NULL-score rows back with a NULL normalized value
    scored = df.where(F.col(score_col).isNotNull())
    nulls = df.where(F.col(score_col).isNull()).withColumn(
        out_col, F.lit(None).cast("long")
    )
    w = Window.partitionBy(group_col).orderBy(F.col(score_col).asc())
    n = F.count(F.lit(1)).over(Window.partitionBy(group_col))
    rk = F.rank().over(w)
    # integer `div`, not float `/` + cast: double division can round an
    # exact integer quotient across the truncation boundary for huge
    # groups, diverging from the oracle's integer `//`
    scored = scored.withColumn("__rk", rk.cast("long")).withColumn(
        "__n", n.cast("long")
    )
    norm = F.when(
        F.col("__n") > 1,
        F.expr("((__rk - 1) * 10000) div (__n - 1)").cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    return (
        scored.withColumn(out_col, norm)
        .drop("__rk", "__n")
        .unionByName(nulls)
    )
