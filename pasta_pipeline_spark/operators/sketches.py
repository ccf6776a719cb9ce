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


def _partition_truncated_counts(
    df: DataFrame, ks: list[str], item_col: str, cap: int
) -> DataFrame:
    """Arrow-batched per-partition counting with bounded emission: for
    each input partition and key, exact local counts truncated to the
    top ``cap`` items (count DESC, item ASC) plus one NULL-item row
    carrying the truncated local mass. Emission per partition per key
    is <= cap + 1 rows regardless of the partition's distinct-item
    count, so the downstream shuffle is bounded by (cap+1) * P * keys
    — the SpaceSaving role, with exact local counts because a
    partition's distinct set is the same working set Spark's own
    map-side hash aggregation holds.

    Caveat: KEY columns must be non-null on this path (pandas NA
    grouping coerces numeric NULL keys to NaN); the default
    partition_cap=None path groups NULL keys with standard SQL
    semantics."""
    import pandas as pd

    from pyspark.sql import types as T

    fields = [df.schema[k] for k in ks]
    item_field = df.schema[item_col]
    out_schema = T.StructType(
        fields + [T.StructField("item", item_field.dataType, True),
                  T.StructField("n", T.LongType(), False)]
    )
    cols = ks + [item_col]

    def count_partition(batches):
        from collections import Counter

        counter: Counter = Counter()
        for pdf in batches:
            grouped = pdf.groupby(cols, dropna=False, sort=False).size()
            for key_tuple, n in grouped.items():
                if not isinstance(key_tuple, tuple):
                    key_tuple = (key_tuple,)
                counter[key_tuple] += int(n)
        if not counter:
            return
        per_key: dict = {}
        for key_tuple, n in counter.items():
            group, item = key_tuple[:-1], key_tuple[-1]
            per_key.setdefault(group, []).append((item, n))
        rows = []
        for group, pairs in per_key.items():
            pairs.sort(key=lambda p: (-p[1], p[0]))
            for item, n in pairs[:cap]:
                rows.append(group + (item, n))
            dropped = sum(n for _, n in pairs[cap:])
            if dropped:
                rows.append(group + (None, dropped))
        yield pd.DataFrame(rows, columns=cols[:-1] + ["item", "n"])

    return df.select(*cols).mapInPandas(count_partition, schema=out_schema)


def partial_heavy_hitters(
    df: DataFrame,
    keys: list[str] | str,
    item_col: str,
    m: int = 64,
    partition_cap: int | None | str = "auto",
) -> DataFrame:
    """Mergeable truncated-counter heavy-hitter state (SpaceSaving's
    role): per key, the ``m`` most frequent items with exact counts,
    plus the TRACKED mass of everything truncated away
    (``__dropped``). The error contract every merge preserves: a
    merged count underestimates the true count by at most the sum of
    the dropped masses folded in — the bound travels WITH the state
    instead of being a paper theorem, so downstream can decide whether
    an answer is trustworthy (`count + dropped` upper-bounds truth).

    State per key = m rows + one dropped-mass row (item NULL). One
    groupBy with partial aggregation, one bounded window for the
    truncation.

    NULL values of ``item_col`` are EXCLUDED from counting (the same
    convention as ``count(col)``): the NULL item row is reserved as
    the dropped-mass sentinel, so a genuine NULL item would otherwise
    be indistinguishable from the bound and corrupt merges.

    ``partition_cap``: the bounded-shuffle knob. The DEFAULT
    (``"auto"`` = ``4 * m``) runs an Arrow-batched per-partition
    truncation stage (SpaceSaving's role) BEFORE the exact groupBy, so
    the shuffle carries at most ``(partition_cap + 1)`` rows per
    (input partition, key) instead of the full distinct (key, item)
    set — at 100 TB that difference is the whole game, so the bounded
    path is the default and exact-shuffle is the opt-in. Per-partition
    dropped mass folds into the same travelling bound, so
    `count + dropped` still upper-bounds truth; kept counts may
    additionally underestimate by mass truncated in other partitions —
    which that bound already covers. ``partition_cap >= 4 * m`` keeps
    the extra error small (hence the auto value). Pass an explicit
    ``partition_cap=None`` for the EXACT mode: full distinct-set
    shuffle, results identical to a plain groupBy count + truncate —
    the mode to use when the state feeds a hash-compared oracle. Rows
    whose KEY columns contain NULL bypass the Arrow pre-truncation
    (pandas NA grouping would corrupt them) and are counted exactly,
    then merged into the same state.
    """
    from pyspark.sql import Window

    ks = [keys] if isinstance(keys, str) else list(keys)
    src = df.filter(F.col(item_col).isNotNull())
    if partition_cap == "auto":
        partition_cap = 4 * m
    if partition_cap is not None:
        null_key = None
        for k in ks:
            c = F.col(k).isNull()
            null_key = c if null_key is None else (null_key | c)
        clean = src.filter(~null_key)
        # NULL-key rows skip the pandas stage: counted exactly (1 row
        # per occurrence pre-shuffle — fine, NULL-key mass is edge-case
        # scale) and folded into the same downstream groupBy.
        nullkey_rows = src.filter(null_key).select(
            *ks, F.col(item_col).alias("item"), F.lit(1).cast("long").alias("n")
        )
        pre = _partition_truncated_counts(clean, ks, item_col, partition_cap)
        counts = (
            pre.unionByName(nullkey_rows)
            .groupBy(*ks, "item")
            .agg(F.sum("n").cast("long").alias("n"))
        )
        items = counts.filter(F.col("item").isNotNull())
        pre_dropped = counts.filter(F.col("item").isNull())
        w = Window.partitionBy(*ks).orderBy(F.desc("n"), F.asc("item"))
        ranked = items.withColumn("__rk", F.row_number().over(w))
        kept = ranked.filter(F.col("__rk") <= m).select(*ks, "item", "n")
        item_type = kept.schema["item"].dataType
        dropped = (
            ranked.filter(F.col("__rk") > m)
            .select(*ks, F.lit(None).cast(item_type).alias("item"), "n")
            .unionByName(pre_dropped.select(*ks, "item", "n"))
            .groupBy(*ks)
            .agg(F.sum("n").cast("long").alias("n"))
            .select(*ks, F.lit(None).cast(item_type).alias("item"), "n")
        )
        return kept.unionByName(dropped)
    counts = src.groupBy(*ks, F.col(item_col).alias("item")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    w = Window.partitionBy(*ks).orderBy(F.desc("n"), F.asc("item"))
    ranked = counts.withColumn("__rk", F.row_number().over(w))
    kept = ranked.filter(F.col("__rk") <= m).select(*ks, "item", "n")
    dropped = (
        ranked.filter(F.col("__rk") > m)
        .groupBy(*ks)
        .agg(F.sum("n").cast("long").alias("n"))
        .select(*ks, F.lit(None).cast(kept.schema["item"].dataType).alias("item"), "n")
    )
    return kept.unionByName(dropped)


def merge_heavy_hitters(
    a: DataFrame, b: DataFrame, keys: list[str] | str, m: int = 64
) -> DataFrame:
    """Merge two heavy-hitter states: counts add per item, the merged
    table re-truncates to ``m``, and everything truncated NOW joins
    the dropped mass (which also adds). Associative up to the shared
    truncation rule; the error bound (dropped mass) only grows when
    truncation actually discards counts."""
    from pyspark.sql import Window

    ks = [keys] if isinstance(keys, str) else list(keys)
    merged = (
        a.unionByName(b)
        .groupBy(*ks, "item")
        .agg(F.sum("n").cast("long").alias("n"))
    )
    items = merged.filter(F.col("item").isNotNull())
    base_dropped = merged.filter(F.col("item").isNull())
    w = Window.partitionBy(*ks).orderBy(F.desc("n"), F.asc("item"))
    ranked = items.withColumn("__rk", F.row_number().over(w))
    kept = ranked.filter(F.col("__rk") <= m).select(*ks, "item", "n")
    newly_dropped = (
        ranked.filter(F.col("__rk") > m).select(*ks, F.lit(None).cast(kept.schema["item"].dataType).alias("item"), "n")
    )
    dropped = (
        base_dropped.select(*ks, "item", "n")
        .unionByName(newly_dropped)
        .groupBy(*ks)
        .agg(F.sum("n").cast("long").alias("n"))
        .select(*ks, F.lit(None).cast(kept.schema["item"].dataType).alias("item"), "n")
    )
    return kept.unionByName(dropped)


def _cms_bucket(col: Column, row_idx: int, width: int) -> Column:
    """Row-``row_idx`` bucket of an item: md5-based 60-bit hash of
    ``"<row>:<item>"`` mod width — the same cross-engine-exact hash
    recipe as every oracle-checkable operator here (DuckDB twin:
    ``('0x' || substr(md5(CAST(r AS VARCHAR) || ':' || item), 1,
    15))::BIGINT % width``)."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{row_idx}:"), col.cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("long")
        % width
    )


def count_min_sketch(
    df: DataFrame,
    item_col: str,
    width: int = 256,
    depth: int = 4,
) -> DataFrame:
    """Count-min sketch state (Cormode & Muthukrishnan, 2005): item
    counts folded into ``depth`` independent hash rows of ``width``
    buckets — ``depth*width`` int64 cells REGARDLESS of the distinct
    item count, the fixed-memory complement to the truncated-counter
    heavy hitters (those keep exact counts for the head; CMS answers
    point queries about EVERYTHING, with one-sided error ≤ total/width
    per row, min across rows).

    State rows ``(row_idx, bucket, cnt)`` merge by addition
    (:func:`merge_cms`) — the same mergeable-int64 contract as the
    summary/histogram/heavy-hitter tier, so batch and streaming
    maintenance are the same groupBy-sum. NULL items are ignored
    (``count(col)`` convention). Every hash is the package's
    md5-based recipe, so sketch construction AND estimation replay
    exactly in SQL."""
    src = df.where(F.col(item_col).isNotNull())
    rows = src.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).cast("int").alias("row_idx"),
                        _cms_bucket(F.col(item_col), r, width).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rb")
    )
    return rows.groupBy(
        F.col("rb.row_idx").alias("row_idx"), F.col("rb.bucket").alias("bucket")
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    item_col: str = "item",
    width: int = 256,
    depth: int = 4,
) -> DataFrame:
    """Point-query estimates for ``probes``: per item, the MIN of its
    ``depth`` bucket counters (absent buckets count 0). Never
    underestimates the true count; overestimate bounded by collisions.
    One broadcast of the (depth·width-row) sketch + a projection —
    the probe side never shuffles."""
    per_row = probes.select(
        F.col(item_col).alias("item"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).cast("int").alias("row_idx"),
                        _cms_bucket(F.col(item_col), r, width).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rb"),
    ).select(
        "item", F.col("rb.row_idx").alias("row_idx"), F.col("rb.bucket").alias("bucket")
    )
    joined = per_row.join(F.broadcast(sketch), ["row_idx", "bucket"], "left")
    return (
        joined.groupBy("item")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("est"))
    )


def merge_cms(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two CMS states built with the same (width, depth): cell
    counts add — associative, commutative, and EXACTLY equal to the
    sketch of the concatenated input (counter addition distributes),
    so batch boundaries never change estimates."""
    return (
        a.unionByName(b)
        .groupBy("row_idx", "bucket")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )
