"""Training-mixture allocation: target domain shares vs availability.

A training run specifies the CORPUS MIX it wants — "w_d of the tokens
from domain d" — but domains don't hold unlimited data: a small
high-quality source saturates long before the big crawl does. The
standard resolution (used by every data-mixture paper's sampling
stage) is water-filling: give every domain its proportional share of
the requested total; domains whose availability falls short are
capped at what they have, and their unmet demand redistributes
proportionally across the domains that still have headroom —
recursively, until no cap is violated.

The closed form avoids iteration: sort domains by the saturation
ratio ``avail_d / w_d`` ascending. Saturated domains form a PREFIX of
that order (a domain saturates only if every tighter domain already
did), and the prefix is identified by one cross-multiplied integer
predicate per row over running sums — no doubles in any decision,
so the whole allocation is hash-exact and oracle-replayable. The
unsaturated remainder is apportioned by largest remainder (Hamilton —
the same exact-integer scheme as sharding.allocate_budget), so
``SUM(alloc) == min(total, SUM(avail))`` holds EXACTLY.

Cost: one metadata-scale window over the DOMAIN table (tens to
thousands of rows — never corpus rows) plus 1-row aggregate handoffs;
the corpus itself is only touched upstream, where ``avail`` is
measured. Bounds: ``avail_d * W`` and ``(total - cum_avail) * w_d``
must fit int64 — with basis-point weights (W <= 1e6) that allows
~9e12 tokens per domain; rescale weights down if your domains are
bigger.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def mixture_allocation(
    domains: DataFrame,
    total: int,
    key_col: str = "key",
    weight_col: str = "weight",
    avail_col: str = "avail",
) -> DataFrame:
    """Allocate ``total`` units across domains with target integer
    weights and integer availability caps, by exact water-filling.

    Returns ``(key, weight, avail, saturated, alloc)`` where
    ``alloc <= avail`` everywhere, saturated domains get exactly
    ``avail``, unsaturated domains split the remaining budget
    proportionally to weight (largest-remainder exact), and
    ``SUM(alloc) == min(total, SUM(avail))``. Zero-weight domains are
    never demanded (alloc 0); zero availability saturates trivially.
    Deterministic: the water-fill order is the double ratio
    ``avail/weight`` (an IEEE-identical int64 ratio) with key
    tiebreak, and every DECISION is integer arithmetic."""
    if total < 0:
        raise ValueError("total must be >= 0")
    d = domains.select(
        F.col(key_col).alias("key"),
        F.col(weight_col).cast("long").alias("weight"),
        F.col(avail_col).cast("long").alias("avail"),
    )
    zero_w = d.filter(F.col("weight") <= 0).select(
        "key",
        "weight",
        "avail",
        F.lit(False).alias("saturated"),
        F.lit(0).cast("long").alias("alloc"),
    )
    pos = d.filter(F.col("weight") > 0)
    tot_w = pos.agg(F.sum("weight").cast("long").alias("__W"))
    ordered = pos.crossJoin(F.broadcast(tot_w)).withColumn(
        "__ratio", F.col("avail").cast("double") / F.col("weight").cast("double")
    )
    w_sorted = Window.orderBy(F.asc("__ratio"), F.asc("key"))
    w_prev = w_sorted.rowsBetween(Window.unboundedPreceding, -1)
    marked = (
        ordered.withColumn(
            "__cum_avail_prev",
            F.coalesce(F.sum("avail").over(w_prev), F.lit(0)).cast("long"),
        )
        .withColumn(
            "__cum_w_prev",
            F.coalesce(F.sum("weight").over(w_prev), F.lit(0)).cast("long"),
        )
        .withColumn(
            # this domain saturates, GIVEN every tighter domain did:
            # avail * remaining_weight <= remaining_budget * weight
            "__pred",
            (
                F.col("avail") * (F.col("__W") - F.col("__cum_w_prev"))
                <= (F.lit(total) - F.col("__cum_avail_prev")) * F.col("weight")
            ).cast("int"),
        )
        .withColumn(
            # saturation is prefix-closed in ratio order; enforce it
            # structurally with a prefix-AND so integer edge cases can
            # never produce a gapped saturation set
            "saturated",
            (
                F.min("__pred").over(w_sorted.rowsBetween(Window.unboundedPreceding, 0))
                == 1
            ),
        )
    )
    rem = marked.agg(
        (
            F.lit(total)
            - F.coalesce(
                F.sum(F.when(F.col("saturated"), F.col("avail"))), F.lit(0)
            )
        ).cast("long").alias("__B"),
        (
            F.max("__W")
            - F.coalesce(
                F.sum(F.when(F.col("saturated"), F.col("weight"))), F.lit(0)
            )
        ).cast("long").alias("__Wrem"),
    )
    with_rem = marked.crossJoin(F.broadcast(rem))
    unsat = with_rem.filter(~F.col("saturated")).select(
        "key",
        "weight",
        "avail",
        "saturated",
        F.expr("CASE WHEN __Wrem > 0 THEN (__B * weight) div __Wrem END")
        .cast("long")
        .alias("__q"),
        F.expr("CASE WHEN __Wrem > 0 THEN (__B * weight) % __Wrem END")
        .cast("long")
        .alias("__r"),
        F.col("__B"),
    )
    w_all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    unsat_alloc = (
        unsat.withColumn("__left", F.col("__B") - F.sum("__q").over(w_all))
        .withColumn(
            "__rk", F.row_number().over(Window.orderBy(F.desc("__r"), F.asc("key")))
        )
        .select(
            "key",
            "weight",
            "avail",
            "saturated",
            F.coalesce(
                F.col("__q") + (F.col("__rk") <= F.col("__left")).cast("long"),
                F.lit(0),
            ).cast("long").alias("alloc"),
        )
    )
    sat_alloc = with_rem.filter(F.col("saturated")).select(
        "key", "weight", "avail", "saturated", F.col("avail").alias("alloc")
    )
    return sat_alloc.unionByName(unsat_alloc).unionByName(zero_w)
