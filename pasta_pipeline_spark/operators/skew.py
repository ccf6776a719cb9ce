"""Skew-resilient aggregation — the salting pattern (SURVEY.md §4).

AQE's skew-join splitting covers joins, but a single pathologically
hot *group key* in an aggregation still lands on one reducer. The
classic fix is two-phase salted aggregation:

    phase 1: group by (key, salt)  — hot key spreads over S reducers
    phase 2: group by key          — S partial rows combine

Only decomposable aggregates survive this (count/sum/min/max — the
partials combine by the same function). The result is bit-identical
for integer aggregates, so the operator is oracle-checkable against a
plain GROUP BY.

In practice Spark's map-side partial aggregation already absorbs most
group-by skew; this operator is the explicit escape hatch for the
cases it can't (very high key cardinality disables hash-agg partials,
or partials spill).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"

#: phase-2 combiner per aggregate kind
_COMBINE = {
    "count": F.sum,
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation over ``keys``.

    ``aggs`` maps output-column → (kind, input-column) with kind in
    {count, sum, min, max}; for count the input column is ignored.
    The salt is deterministic (hash of the full row's key + a uniform
    bucket from crc32 of a monotonic id is NOT reproducible across
    retries — so we salt on ``pmod(hash(all columns), S)``, which is
    stable for identical rows and spreads hot keys as long as non-key
    attributes vary).
    """
    salt = F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(salt_buckets))
    phase1_exprs = []
    for out, (kind, col) in aggs.items():
        if kind == "count":
            phase1_exprs.append(F.count(F.lit(1)).alias(out))
        elif kind in ("sum", "min", "max"):
            phase1_exprs.append(getattr(F, kind)(col).alias(out))
        else:
            raise ValueError(f"non-decomposable aggregate kind {kind!r}")
    phase1 = df.withColumn(_SALT, salt).groupBy(*keys, _SALT).agg(*phase1_exprs)
    phase2_exprs = [
        _COMBINE[kind](out).alias(out) for out, (kind, _) in aggs.items()
    ]
    return phase1.groupBy(*keys).agg(*phase2_exprs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join: salt the big side, replicate the small
    side across every salt bucket, join on (keys…, salt).

    A hot join key (the reference analog: one channel contributing
    most messages) lands all its rows on one sort-merge task; salting
    spreads it over ``salt_buckets`` tasks at the cost of replicating
    the SMALL side S times — the right trade exactly when small is
    broadcast-ish but the join must shuffle anyway (e.g. the big side
    is already hash-partitioned, or small exceeds the broadcast
    threshold). AQE's skew-join split is the first line of defense;
    this is the explicit form for when AQE can't help (skewed
    AGGREGATE after the join, or a non-splittable downstream stage).

    The salt on the big side is ``pmod(hash(all columns), S)`` —
    deterministic per row (retry-stable), uniform as long as non-key
    attributes vary. Result is row-identical to the plain join, so the
    operator is oracle-checkable. Only inner/left joins make sense
    (right/full would multiply unmatched small rows); enforced.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salted_big = big.withColumn(
        _SALT, F.pmod(F.hash(*[F.col(c) for c in big.columns]), F.lit(salt_buckets))
    )
    replicated = small.withColumn(
        _SALT,
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))),
    )
    return salted_big.join(replicated, [*on, _SALT], how).drop(_SALT)
