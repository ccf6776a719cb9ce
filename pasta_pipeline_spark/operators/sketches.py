"""Approximate sketches — the 100 TB stats path.

Every exact aggregate in the catalog (countDistinct, percentile,
top-k) has a sketch twin that trades bounded error for one-pass,
mergeable, fixed-memory execution — the form you actually run over
100 TB when a 2% error band is acceptable:

- ``approx_count_distinct`` — HyperLogLog++ (relative error ~ rsd),
- ``approx_percentile`` — quantile sketch with a tunable accuracy
  knob (1/accuracy relative rank error),
- frequent items via a two-level count-and-prune (exact counts over a
  hashed candidate space — the groupBy stays bounded by pruning low
  counts early at the partial-aggregation level).

These are deliberately NOT in the DuckDB oracle gate: the two engines'
sketch implementations differ by design, so cross-engine hash equality
is the wrong contract. The contract here is the error bound, enforced
by differential pytest against the exact aggregates on the driver
testdata (tests/test_extensions2.py) — approximate operators are
verified by tolerance, exact operators by hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct(
    df: DataFrame, col: str, group_by: list[str] | None = None, rsd: float = 0.02
) -> DataFrame:
    """HyperLogLog++ distinct count (per group). Fixed memory per
    group (~1.5KB at 2% rsd) vs the exact countDistinct's
    shuffle-every-value cost — the difference between a metadata query
    and a full re-shuffle at 100 TB."""
    agg = F.approx_count_distinct(col, rsd=rsd).alias(f"approx_distinct_{col}")
    if group_by:
        return df.groupBy(*group_by).agg(agg)
    return df.agg(agg)


def approx_quantiles(
    df: DataFrame,
    col: str,
    probabilities: list[float],
    group_by: list[str] | None = None,
    accuracy: int = 10000,
) -> DataFrame:
    """One-pass mergeable percentile sketch (error <= 1/accuracy in
    rank). The exact `percentile` is a full sort per group — O(n log n)
    shuffle at 100 TB; this is O(n) with constant state."""
    probs = "array(" + ", ".join(str(p) for p in probabilities) + ")"
    agg = F.expr(f"approx_percentile({col}, {probs}, {accuracy})").alias("quantiles")
    if group_by:
        return df.groupBy(*group_by).agg(agg)
    return df.agg(agg)


def frequent_items(
    df: DataFrame,
    col: str,
    min_count: int,
    k: int | None = None,
) -> DataFrame:
    """Heavy hitters: all values of ``col`` appearing >= ``min_count``
    times (optionally capped to the top ``k``). The groupBy's partial
    (map-side) aggregation means each executor emits at most its local
    distinct set — the post-shuffle count table is then pruned by the
    threshold, so the full value histogram never sits in one place.
    Deterministic (count DESC, value ASC) ordering."""
    counts = (
        df.groupBy(F.col(col).alias("value"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= min_count)
        .orderBy(F.desc("cnt"), F.asc("value"))
    )
    return counts.limit(k) if k else counts
