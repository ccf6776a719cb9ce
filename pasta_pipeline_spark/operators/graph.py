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


def triangle_count(edges: DataFrame) -> DataFrame:
    """Exact global triangle count over an undirected edge set
    ``edges(src: long, dst: long)`` (direction and duplicates are
    normalized away internally).

    Compact-forward orientation: every undirected edge is stored once,
    oriented from its lower-(degree, id) endpoint to the higher one.
    Each triangle then exists as exactly one directed wedge
    ``a→b, a→c`` closed by ``b→c``, so the count is one self-join on
    the wedge apex plus one semi-join against the oriented edge table
    — and, crucially, the wedge fan-out per node is bounded by its
    *oriented* out-degree, which orientation-by-degree caps at
    O(sqrt(|E|)) even for hub nodes. That bound is the whole point at
    100 TB: a naive a<b ordering would give a celebrity node its full
    degree as fan-out; degree orientation provably cannot.

    Returns a single row ``(n_triangles: long)``. All joins shuffle on
    node ids; the degree table is a groupBy result that AQE broadcasts
    when small.
    """
    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    both = und.unionByName(und.select(F.col("b").alias("a"), F.col("a").alias("b")))
    deg = both.groupBy("a").agg(F.count(F.lit(1)).alias("d")).withColumnRenamed("a", "n")

    # total order for orientation AND wedge ordering: the sortable key
    # (degree, id) — using the same order for both is what guarantees a
    # triangle's closing edge is stored in the orientation the wedge
    # expects (id order alone would disagree with degree order).
    da = deg.select(F.col("n"), F.struct(F.col("d"), F.col("n").alias("id")).alias("ka"))
    db = deg.select(
        F.col("n").alias("n2"), F.struct(F.col("d"), F.col("n").alias("id")).alias("kb")
    )
    keyed = (
        und.join(da, und["a"] == da["n"])
        .join(db, und["b"] == db["n2"])
        .select(
            F.when(F.col("ka") < F.col("kb"), F.col("ka")).otherwise(F.col("kb")).alias("u"),
            F.when(F.col("ka") < F.col("kb"), F.col("kb")).otherwise(F.col("ka")).alias("v"),
        )
    )
    w1 = keyed.select(F.col("u").alias("apex"), F.col("v").alias("x"))
    w2 = keyed.select(F.col("u").alias("apex"), F.col("v").alias("y"))
    wedges = w1.join(w2, "apex").where(F.col("x") < F.col("y"))
    closed = wedges.join(
        keyed.select(F.col("u").alias("x"), F.col("v").alias("y")),
        ["x", "y"],
        "left_semi",
    )
    return closed.agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))


def transitivity_report(edges: DataFrame) -> DataFrame:
    """Global transitivity (clustering coefficient) of an undirected
    graph (r8): ``3·triangles / wedges`` where wedges = Σ_v deg(v)
    choose 2. Applied to a near-dup pair graph this audits the dedup
    THRESHOLD itself — high transitivity means "a~b and b~c usually
    implies a~c" (clean clusters, threshold consistent); low
    transitivity means chain-shaped components that transitive cluster
    closure will over-merge.

    Input: (doc_a, doc_b) with doc_a < doc_b, one row per edge.
    Returns one row: n_nodes, n_edges, wedges, n_triangles,
    transitivity_sc (floored 1e-6; NULL when the graph has no wedge).

    Scale: degree rollup + one int64 sum for wedges; triangles via
    :func:`triangle_count` (oriented wedge equi-joins); the final
    combine is a 1-row broadcast scalar handoff.
    """
    from pasta_pipeline_spark.operators.util import attach_cached_deps

    # the edge set feeds three consumers (degrees, edge count, the
    # triangle join) — persist the (possibly expensive) upstream pair
    # generation once; the caller releases via release_cached_deps
    e = (
        edges.select(F.col("doc_a").alias("x"), F.col("doc_b").alias("y"))
        .distinct()
        .persist()
    )
    both = e.unionByName(e.select(F.col("y").alias("x"), F.col("x").alias("y")))
    deg = both.groupBy("x").agg(F.count(F.lit(1)).alias("d"))
    summary = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        (F.sum(F.col("d") * (F.col("d") - 1)) / 2).cast("long").alias("wedges"),
    )
    n_edges = e.agg(F.count(F.lit(1)).alias("n_edges"))
    tri = triangle_count(e.select(F.col("x").alias("src"), F.col("y").alias("dst")))
    joined = summary.crossJoin(F.broadcast(n_edges)).crossJoin(F.broadcast(tri))
    trans = F.when(
        F.col("wedges") > 0,
        F.col("n_triangles").cast("double") * 3.0
        / F.col("wedges").cast("double"),
    )
    out = joined.select(
        "n_nodes",
        "n_edges",
        "wedges",
        "n_triangles",
        F.floor(trans * 1000000).cast("long").alias("transitivity_sc"),
    )
    return attach_cached_deps(out, [e])


def transitivity_oracle_sql(pairs_sql: str) -> str:
    """DuckDB twin of :func:`transitivity_report`. ``pairs_sql`` must
    yield (doc_a, doc_b) with doc_a < doc_b."""
    return f"""
    WITH pairs AS ({pairs_sql}),
    eu AS (SELECT DISTINCT doc_a AS x, doc_b AS y FROM pairs),
    both_dir AS (
      SELECT x, y FROM eu UNION ALL SELECT y AS x, x AS y FROM eu
    ),
    deg AS (SELECT x, COUNT(*) AS d FROM both_dir GROUP BY x),
    s AS (
      SELECT COUNT(*) AS n_nodes,
             CAST(SUM(d * (d - 1)) / 2 AS BIGINT) AS wedges
      FROM deg
    ),
    ne AS (SELECT COUNT(*) AS n_edges FROM eu),
    tri AS (
      SELECT COUNT(*) AS n_triangles
      FROM eu ab
      JOIN eu ac ON ab.x = ac.x AND ab.y < ac.y
      JOIN eu bc ON bc.x = ab.y AND bc.y = ac.y
    )
    SELECT s.n_nodes, ne.n_edges, s.wedges,
           CAST(tri.n_triangles AS BIGINT) AS n_triangles,
           CASE WHEN s.wedges > 0 THEN CAST(FLOOR(
             CAST(tri.n_triangles AS DOUBLE) * 3.0
             / CAST(s.wedges AS DOUBLE) * 1000000) AS BIGINT) END
             AS transitivity_sc
    FROM s CROSS JOIN ne CROSS JOIN tri
    """
