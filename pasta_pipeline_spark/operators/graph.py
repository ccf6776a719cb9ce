"""Iterative graph algorithms as DataFrame joins — PageRank.

Companion to the connected-components labeller in
``operators/text_dedup.py`` (duplicate clusters): where that answers
"which docs are the same", PageRank answers "which nodes matter" —
centrality over, e.g., the near-dup graph (canonical-document
election: keep the most-linked copy) or any entity graph extracted
from the corpus.

Spark-first shape: one iteration = join(ranks, edges) → groupBy(dst)
— the canonical distributed PageRank; every step is a shuffle on the
node id, partial-aggregated map-side. No GraphX, no RDDs, no driver
state beyond the loop counter.

Determinism contract: all arithmetic is int64 fixed-point —
ranks start at ``scale``, each iteration computes
``base + (d_num * sum(r div outdeg)) div d_den`` in pure integer ops,
so results are bit-identical across engines, partitionings, and runs,
and a DuckDB twin is three chained CTEs. (Float PageRank would be
summation-order-dependent — unhashable.) The cost of truncating
integer division is bounded: each node loses < 1/scale per neighbor
per round, immaterial for ranking at scale = 1e6.

Scale: iterations are O(diameter-ish) chained shuffles; lineage grows
per round, so pass ``checkpoint_every`` for deep runs (same policy as
duplicate_clusters). Dangling nodes (no out-edges) would leak rank
mass; callers must pass a closed edge set (the bipartite
both-directions construction below guarantees it) or accept the leak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank_fixed(
    edges: DataFrame,
    iterations: int = 3,
    scale: int = 1_000_000,
    d_num: int = 85,
    d_den: int = 100,
    checkpoint_every: int | None = None,
) -> DataFrame:
    """Fixed-point PageRank over ``edges(src: long, dst: long)``.

    Returns (id, rank_fp) for every node that receives at least one
    in-edge, after ``iterations`` rounds from a uniform ``scale``
    start. Damping d = d_num/d_den; teleport term
    ``base = (scale * (d_den - d_num)) div d_den``.

    Contract detail for asymmetric graphs: after round 1 the rank set
    is the in-edge-receiving nodes; a node with out-edges but NO
    in-edges therefore contributes only in round 1 and nothing after —
    its mass decays out instead of being re-teleported. On a closed
    symmetric edge set (``bipartite_edges``) the distinction is moot;
    callers with source-only nodes who want them to keep contributing
    should add self-loops.
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    base = (scale * (d_den - d_num)) // d_den

    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ranks = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("r", F.lit(scale).cast("long"))
    )
    for i in range(iterations):
        contrib = (
            edges.join(ranks, edges["src"] == ranks["id"])
            .join(deg, "src")
            .select(F.col("dst"), F.expr("r div outdeg").alias("c"))
        )
        ranks = contrib.groupBy("dst").agg(
            (F.lit(base) + F.expr(f"({d_num} * sum(c)) div {d_den}"))
            .cast("long")
            .alias("r")
        ).select(F.col("dst").alias("id"), "r")
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select("id", F.col("r").alias("rank_fp"))


def bipartite_edges(
    df: DataFrame, left_col: str, right_col: str
) -> DataFrame:
    """Closed directed edge set for a bipartite co-occurrence graph:
    each distinct (left, right) pair yields both directions, with ids
    namespaced onto one long axis (left → 2k, right → 2k+1) so the two
    partitions cannot collide. Every node has out-edges, so the edge
    set is dangling-free by construction."""
    pairs = df.select(
        (F.col(left_col) * 2).alias("l"), (F.col(right_col) * 2 + 1).alias("r")
    ).distinct()
    fwd = pairs.select(F.col("l").alias("src"), F.col("r").alias("dst"))
    rev = pairs.select(F.col("r").alias("src"), F.col("l").alias("dst"))
    return fwd.unionByName(rev)
