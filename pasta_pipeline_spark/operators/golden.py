"""Golden-record construction (MDM survivorship).

Completes the entity-resolution story: ``operators/linkage.py`` finds
matched PAIRS (blocked Fellegi-Sunter scoring); this module closes them
into entity CLUSTERS (reusing the min-label-propagation connected
components of ``text_dedup.duplicate_clusters``) and elects one
canonical "golden" value per field by survivorship rules — the standard
master-data-management pipeline (match → cluster → survive).

Election rule: MOST FREQUENT value wins, ties broken by the smallest
value — deterministic, engine-portable, and expressible as a per-field
(count DESC, value ASC) rank. Numeric fields also report min/max so
downstream QA sees the spread the election collapsed.

Scale posture: clustering is ONE per-block union-find shuffle
(linkage.blocked_components — linkage edges are block-confined by
construction, so no iterative fixpoint and no O(diameter) barrier
rounds; r10 cut 19.8 s → 4 s at sf0.1); survivorship is one
groupBy(cluster, field-value) per elected field plus a
cluster-partitioned rank window — clusters are tiny (bounded by the
blocking key), so every window partition is a handful of rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .linkage import blocked_components, part_linkage_pairs
from .text_dedup import duplicate_clusters


def golden_part_records(
    parts: DataFrame,
    pairs: DataFrame | None = None,
    min_members: int = 2,
    block_cols: list[str] | None = None,
) -> DataFrame:
    """Golden records over the part dimension.

    Returns one row per multi-member entity cluster: cluster_id (the
    smallest member key), n_members, member_keys (sorted), golden_brand
    and golden_type (mode, ties → min), size_min/size_max, and
    price_cents_min/max (exact int64 cents).

    ``block_cols`` is the caller's EXPLICIT declaration that the
    supplied ``pairs`` edges are confined to those block columns (every
    node appears under exactly one block key) — the precondition of the
    one-shuffle :func:`linkage.blocked_components` fast path. It is
    never inferred from the columns that happen to ride on ``pairs``:
    a relaxed-blocking caller whose frame still carries blk_* columns
    would otherwise get silently wrong clusters (r10 advisor finding).
    Internally-built pairs (``pairs=None``) are block-confined by
    construction and take the fast path automatically.
    """
    if pairs is None:
        pairs = part_linkage_pairs(parts, with_block=True)
        block_cols = ["blk_noun", "blk_brand"]
    # Unlike text near-dup components (diameter 2-4, where the plain
    # min-label fixpoint converges in a few rounds), tolerance-scored
    # linkage graphs CHAIN — a is within price-tolerance of b, b of c,
    # … — so component diameter grows with block size and the
    # iterative fixpoint needs O(diameter) cluster-wide barrier
    # rounds (r10 profile: 22 rounds ≈ 19 s at sf0.1, pointer jumping
    # powerless on chains). Linkage edges are BLOCK-CONFINED by
    # construction, so exact CC is one per-block union-find shuffle
    # instead (linkage.blocked_components; equivalence to the
    # duplicate_clusters fixpoint is pytest-pinned).
    if block_cols is not None:
        comp = blocked_components(pairs, list(block_cols))
    else:
        # caller-supplied pairs without a declared confinement
        # contract: the generic iterative fixpoint is always correct
        comp = duplicate_clusters(
            parts.select(F.col("p_partkey")),
            pairs.select(
                F.col("a_key").alias("doc_a"), F.col("b_key").alias("doc_b")
            ),
            id_col="p_partkey",
            doubling=True,
            checkpoint_every=2,
        ).select(F.col("p_partkey").alias("node"), "cluster_id")
    clusters = (
        parts.select("p_partkey")
        .join(
            comp.select(F.col("node").alias("p_partkey"), "cluster_id"),
            "p_partkey",
            "left",
        )
        .select(
            "p_partkey",
            F.coalesce(F.col("cluster_id"), F.col("p_partkey")).alias("cluster_id"),
        )
    )

    members = clusters.join(parts, "p_partkey")

    def _elect(field: str) -> DataFrame:
        counts = members.groupBy("cluster_id", field).agg(
            F.count(F.lit(1)).alias("__c")
        )
        w = Window.partitionBy("cluster_id").orderBy(
            F.col("__c").desc(), F.col(field).asc()
        )
        return (
            counts.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .select("cluster_id", F.col(field).alias(f"golden_{field[2:]}"))
        )

    rollup = members.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.sort_array(F.collect_list("p_partkey")).alias("member_keys"),
        F.min("p_size").alias("size_min"),
        F.max("p_size").alias("size_max"),
        F.min(F.round(F.col("p_retailprice") * 100).cast("long")).alias(
            "price_cents_min"
        ),
        F.max(F.round(F.col("p_retailprice") * 100).cast("long")).alias(
            "price_cents_max"
        ),
    )
    return (
        rollup.where(F.col("n_members") >= min_members)
        .join(_elect("p_brand"), "cluster_id")
        .join(_elect("p_type"), "cluster_id")
        .select(
            "cluster_id",
            "n_members",
            "member_keys",
            "golden_brand",
            "golden_type",
            "size_min",
            "size_max",
            "price_cents_min",
            "price_cents_max",
        )
        .orderBy("cluster_id")
    )


def golden_part_oracle_sql(pairs_sql: str, min_members: int = 2) -> str:
    """DuckDB twin: recursive-CTE connected components over the pair
    graph (the ``dedup_clusters`` oracle pattern) + mode election via
    (count DESC, value ASC) ranks. ``pairs_sql`` must yield
    (a_key, b_key)."""
    return f"""
    WITH RECURSIVE pairs AS (
      {pairs_sql}
    ), edges AS (
      SELECT a_key AS src, b_key AS dst FROM pairs
      UNION ALL
      SELECT b_key AS src, a_key AS dst FROM pairs
    ), cc(node, lbl) AS (
      SELECT p_partkey, p_partkey FROM part
      UNION
      SELECT e.dst, c.lbl FROM cc c JOIN edges e ON c.node = e.src
    ), clusters AS (
      SELECT node AS p_partkey, MIN(lbl) AS cluster_id FROM cc GROUP BY node
    ), members AS (
      SELECT c.cluster_id, p.* FROM clusters c JOIN part p USING (p_partkey)
    ), brand_elect AS (
      SELECT cluster_id, p_brand AS golden_brand FROM (
        SELECT cluster_id, p_brand,
               row_number() OVER (PARTITION BY cluster_id
                 ORDER BY COUNT(*) DESC, p_brand ASC) AS rn
        FROM members GROUP BY cluster_id, p_brand
      ) WHERE rn = 1
    ), type_elect AS (
      SELECT cluster_id, p_type AS golden_type FROM (
        SELECT cluster_id, p_type,
               row_number() OVER (PARTITION BY cluster_id
                 ORDER BY COUNT(*) DESC, p_type ASC) AS rn
        FROM members GROUP BY cluster_id, p_type
      ) WHERE rn = 1
    ), rollup AS (
      SELECT cluster_id, COUNT(*) AS n_members,
             list_sort(list(p_partkey)) AS member_keys,
             MIN(p_size) AS size_min, MAX(p_size) AS size_max,
             CAST(MIN(CAST(ROUND(p_retailprice * 100) AS BIGINT)) AS BIGINT) AS price_cents_min,
             CAST(MAX(CAST(ROUND(p_retailprice * 100) AS BIGINT)) AS BIGINT) AS price_cents_max
      FROM members GROUP BY cluster_id
    )
    SELECT r.cluster_id, r.n_members, r.member_keys,
           b.golden_brand, t.golden_type,
           r.size_min, r.size_max, r.price_cents_min, r.price_cents_max
    FROM rollup r
    JOIN brand_elect b USING (cluster_id)
    JOIN type_elect t USING (cluster_id)
    WHERE r.n_members >= {min_members}
    ORDER BY r.cluster_id
    """
