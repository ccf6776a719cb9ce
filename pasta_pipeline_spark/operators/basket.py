"""Market-basket co-occurrence analysis (association mining).

The affinity verb every retail/recommendation pipeline needs and no
existing catalog tier covers: which item PAIRS co-occur in one basket
more often than chance, scored by support / confidence / lift. The
reference has nothing like it; for an LLM-data pipeline the same shape
scores tag/source co-occurrence (which domains co-appear in a crawl
wave, which labels co-fire on a document).

Scale posture (the classic a-priori-pairs plan):

- baskets are deduped to (basket, item) first — one hash shuffle;
- pair generation is a SELF EQUI-JOIN on the basket key with
  ``item_a < item_b``: pair volume is sum over baskets of C(k,2),
  bounded by the basket-size cap (TPC-H orders hold ≤7 lineitems;
  a 100 TB deployment caps pathological baskets the same way
  text_dedup caps hot shingles);
- per-item counts are DIMENSION-scale (one row per distinct item) and
  ride broadcast joins back onto the pair counts;
- the basket total is a 1-row broadcast scalar (allowlisted handoff).

No cartesian anywhere; the only fact-scale shuffles are the dedup and
the basket-key self-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def basket_pair_lift(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 2,
    top_k: int = 100,
) -> DataFrame:
    """Top-``top_k`` item pairs by lift.

    lift(a,b) = N · c(a,b) / (c(a) · c(b)) over distinct
    (basket, item) memberships; pairs below ``min_pair_count``
    co-occurrences are noise and dropped before ranking. The returned
    frame is ordered by (lift, pair) so the top-k is a deterministic
    TakeOrdered, not a global sort.

    Columns: item_a, item_b, pair_count, count_a, count_b, lift_sc
    (floor(lift·1e6) — lift is a single double division of exact int64
    products, bit-identical cross-engine, floored only for rendering).
    """
    items = df.select(
        F.col(basket_col).alias("__basket"), F.col(item_col).alias("__item")
    ).distinct()
    item_counts = items.groupBy("__item").agg(F.count(F.lit(1)).alias("cnt"))
    n_baskets = items.agg(
        F.count_distinct(F.col("__basket")).alias("__n_baskets")
    )
    a = items.select(
        F.col("__basket"), F.col("__item").alias("item_a")
    )
    b = items.select(
        F.col("__basket").alias("__basket_b"), F.col("__item").alias("item_b")
    )
    pairs = (
        a.join(
            b,
            (F.col("__basket") == F.col("__basket_b"))
            & (F.col("item_a") < F.col("item_b")),
        )
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .where(F.col("pair_count") >= min_pair_count)
    )
    ca = item_counts.select(
        F.col("__item").alias("item_a"), F.col("cnt").alias("count_a")
    )
    cb = item_counts.select(
        F.col("__item").alias("item_b"), F.col("cnt").alias("count_b")
    )
    scored = (
        pairs.join(F.broadcast(ca), "item_a")
        .join(F.broadcast(cb), "item_b")
        .crossJoin(F.broadcast(n_baskets))
    )
    # N·c(ab) and c(a)·c(b) stay in int64 (documented bound: products
    # < 2^63 — at 100 TB switch the numerator to double first, same
    # value for counts < 2^26); the one division is IEEE-exact given
    # equal inputs.
    lift = (F.col("__n_baskets") * F.col("pair_count")).cast("double") / (
        F.col("count_a") * F.col("count_b")
    ).cast("double")
    return (
        scored.select(
            "item_a",
            "item_b",
            "pair_count",
            "count_a",
            "count_b",
            F.floor(lift * 1000000).cast("long").alias("lift_sc"),
        )
        .orderBy(F.col("lift_sc").desc(), "item_a", "item_b")
        .limit(top_k)
    )


def basket_pair_lift_oracle_sql(
    table: str,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 2,
    top_k: int = 100,
) -> str:
    """DuckDB twin of :func:`basket_pair_lift`."""
    return f"""
    WITH items AS (
      SELECT DISTINCT {basket_col} AS basket, {item_col} AS item FROM {table}
    ), ic AS (
      SELECT item, COUNT(*) AS cnt FROM items GROUP BY item
    ), nb AS (
      SELECT COUNT(DISTINCT basket) AS n FROM items
    ), pairs AS (
      SELECT a.item AS item_a, b.item AS item_b, COUNT(*) AS pair_count
      FROM items a JOIN items b
        ON a.basket = b.basket AND a.item < b.item
      GROUP BY a.item, b.item
      HAVING COUNT(*) >= {min_pair_count}
    )
    SELECT p.item_a, p.item_b, p.pair_count,
           ca.cnt AS count_a, cb.cnt AS count_b,
           CAST(FLOOR(CAST(nb.n * p.pair_count AS DOUBLE)
                      / CAST(ca.cnt * cb.cnt AS DOUBLE) * 1000000) AS BIGINT)
             AS lift_sc
    FROM pairs p
    JOIN ic ca ON ca.item = p.item_a
    JOIN ic cb ON cb.item = p.item_b
    CROSS JOIN nb
    ORDER BY lift_sc DESC, item_a, item_b
    LIMIT {top_k}
    """
