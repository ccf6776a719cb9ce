"""Rendezvous (highest-random-weight) sharding — stable data layout.

The 100 TB write-layout problem: route keys to N shards so that
changing N (adding storage, splitting a hot shard) moves as little
data as possible. ``hash(key) % N`` moves ~``1 - 1/max(N,M)`` of ALL
keys on any resize — a full-corpus rewrite. Rendezvous hashing
(Thaler & Ravishankar, 1996 — the public scheme behind most
consistent-routing systems) assigns ``shard = argmax_s h(key, s)``:
on a resize from N to N+1 only the keys whose argmax IS the new shard
move — exactly ``~1/(N+1)`` of the corpus, the provable minimum for a
deterministic scheme.

Implementation is one array expression per row (transform + array_max
over (weight, shard) structs) — no explode, no join, no shuffle; the
weight is the md5-based 60-bit hash every cross-engine-exact operator
in this package uses, so shard assignment is hash-identical in the
DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def rendezvous_shard(key: Column | str, n_shards: int) -> Column:
    """Shard id in ``[0, n_shards)`` for ``key`` (cast to string for
    hashing): the shard with the highest-random-weight
    ``h60(md5(key || ':' || shard))``, ties broken by the smaller
    shard id (struct ordering). Pure expression — usable directly in
    ``partitionBy``/``repartition`` pipelines."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    k = (F.col(key) if isinstance(key, str) else key).cast("string")
    pairs = F.transform(
        F.sequence(F.lit(0), F.lit(n_shards - 1)),
        lambda s: F.struct(
            F.conv(
                F.substring(F.md5(F.concat(k, F.lit(":"), s.cast("string"))), 1, 15),
                16,
                10,
            ).cast("long").alias("w"),
            # negate: array_max picks max weight, then the SMALLEST
            # shard id on weight ties (max of -s = min s)
            (-s).alias("ns"),
        ),
    )
    return (-F.array_max(pairs).getField("ns")).cast("int")


def shard_rebalance_report(
    df: DataFrame,
    key_col: str,
    n_before: int,
    n_after: int,
) -> DataFrame:
    """Per-shard resize impact: for each OLD shard, how many keys stay
    and how many move when the shard count changes — the planning
    table for a storage resize (expected: ~``1/n_after`` of each
    shard moves when growing, vs ~everything under mod-N).

    Returns ``(shard_before, n_keys, n_moved, moved_bp)``; one
    projection + one groupBy, no joins."""
    before = rendezvous_shard(F.col(key_col), n_before)
    after = rendezvous_shard(F.col(key_col), n_after)
    return (
        df.select(
            before.alias("shard_before"),
            (before != after).cast("long").alias("__moved"),
        )
        .groupBy("shard_before")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.sum("__moved").cast("long").alias("n_moved"),
        )
        .select(
            "shard_before",
            "n_keys",
            "n_moved",
            F.expr("n_moved * 10000 div n_keys").cast("long").alias("moved_bp"),
        )
    )


def allocate_budget(
    weights: DataFrame,
    total: int,
    key_col: str = "key",
    weight_col: str = "weight",
) -> DataFrame:
    """Integer budget apportionment by largest remainder (Hamilton's
    method — the public apportionment standard): split ``total``
    units (fetch slots, token quotas, sampling budgets) across keys
    proportionally to integer ``weight_col``, with every unit
    assigned and no fractional drift. Each key gets
    ``floor(total * w / W)``; the leftover units go to the largest
    fractional remainders (``total * w mod W``, ties by key
    ascending) — all int64 arithmetic, so the allocation is exact,
    deterministic, and hash-comparable.

    Returns ``(key, weight, budget)`` with ``SUM(budget) == total``
    exactly. One 1-row aggregate handoff (the weight total) + one
    metadata-scale window over the KEY table (hosts/sources — not
    corpus rows). Degenerate all-zero weights yield budget 0 for
    every key (integer div by a zero total is NULL → coalesced),
    never an error mid-pipeline."""
    w_total = weights.agg(
        F.sum(F.col(weight_col)).cast("long").alias("__W")
    )
    base = (
        weights.select(
            F.col(key_col), F.col(weight_col).cast("long").alias("weight")
        )
        .crossJoin(F.broadcast(w_total))
        .select(
            key_col,
            "weight",
            # ANSI mode: div/% by a zero total throws — guard so the
            # degenerate case yields NULL→0 budgets instead
            F.expr(f"CASE WHEN __W > 0 THEN ({total} * weight) div __W END")
            .cast("long").alias("__q"),
            F.expr(f"CASE WHEN __W > 0 THEN ({total} * weight) % __W END")
            .cast("long").alias("__r"),
            F.col("__W"),
        )
    )
    from pyspark.sql import Window

    leftover = F.lit(total) - F.sum("__q").over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    ranked = base.withColumn(
        "__rk",
        F.row_number().over(Window.orderBy(F.desc("__r"), F.asc(key_col))),
    ).withColumn("__left", leftover)
    return ranked.select(
        key_col,
        "weight",
        F.coalesce(
            F.col("__q") + (F.col("__rk") <= F.col("__left")).cast("long"),
            F.lit(0),
        ).cast("long").alias("budget"),
    )
