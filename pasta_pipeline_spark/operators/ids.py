"""Scalable sequential-id assignment (global row numbering).

Training-data prep constantly needs contiguous ids — shard indexes,
example ids, vocabulary slots. The naive form,
``row_number() OVER (ORDER BY k)``, funnels the whole dataset through
ONE task (an empty window partition = a single-partition sort): the
canonical accidental scale-killer. The scalable idiom:

1. range-partition by the order key (Spark samples split points),
2. count rows per partition — a metadata-scale aggregate,
3. prefix-sum those counts on the driver (P numbers, not rows),
4. broadcast the offsets back; each row's id = its partition's offset
   + its rank WITHIN the partition.

Cost: the range shuffle (unavoidable — ids must follow a total order)
plus one pid-clustering exchange for the within-partition window; no
single-task stage anywhere, no Python row path. The result is exactly
``row_number() OVER (ORDER BY order_cols...)`` — the driver-side
prefix sum is over P partition counts, the same scale class as a
lakehouse commit's file list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .util import attach_cached_deps


def assign_sequential_ids(
    df: DataFrame,
    order_cols: list[str] | str,
    out_col: str = "seq_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``out_col`` = 1-based dense position of the row in the total
    order defined by ``order_cols`` (which must be a unique composite —
    ties would make the numbering nondeterministic, so make the last
    column a key)."""
    cols = [order_cols] if isinstance(order_cols, str) else list(order_cols)
    n_parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    # Persisted BEFORE the counts collect: repartitionByRange samples its
    # split points per job (the sample seed derives from the RDD id), so
    # an unpersisted plan could land rows in DIFFERENT range partitions
    # on the second pass — the collected offsets would then describe a
    # partitioning that no longer exists, silently duplicating/skipping
    # ids. The collect materializes the cache; the id pass reads the
    # exact partitions that were counted (the same cache-then-count
    # discipline RDD.zipWithIndex relies on). Callers release the cache
    # via release_cached_deps after materializing the result.
    ranged = (
        df.repartitionByRange(n_parts, *[F.col(c) for c in cols])
        .sortWithinPartitions(*cols)
        .withColumn("__pid", F.spark_partition_id())
    ).persist()
    counts = sorted(
        (r["__pid"], r["cnt"])
        for r in ranged.groupBy("__pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    )
    offsets, acc = [], 0
    for pid, cnt in counts:
        offsets.append((pid, acc))
        acc += cnt
    off_df = df.sparkSession.createDataFrame(offsets, "__pid int, __offset long")
    w = Window.partitionBy("__pid").orderBy(*[F.col(c) for c in cols])
    result = (
        ranged.join(F.broadcast(off_df), "__pid")
        .withColumn(out_col, (F.col("__offset") + F.row_number().over(w)).cast("long"))
        .drop("__pid", "__offset")
    )
    return attach_cached_deps(result, [ranged])


def shard_manifest(
    df: DataFrame,
    order_cols: list[str] | str,
    n_shards: int,
    size_col: str | None = None,
) -> DataFrame:
    """Deterministic contiguous sharding for training output: rows take
    equal-depth shards by their global rank — shard = (rank-1)·S div N
    — and the manifest reports per-shard row counts, size sums, and
    rank ranges (contiguity is visible: max_seq of shard k + 1 =
    min_seq of shard k+1). Equal-depth by ROW COUNT, like ntile, but
    without ntile's empty-OVER() single-task sort — ranks come from
    assign_sequential_ids and the total N rides a 1-row broadcast (the
    benign scalar handoff, not a shuffle).

    Writers consume the assignment (filter by shard / partitionBy) and
    publish the manifest next to the data; a reader can then verify
    shard completeness without listing files.
    """
    with_ids = assign_sequential_ids(df, order_cols, out_col="__seq")
    total = with_ids.agg(F.count(F.lit(1)).alias("__total"))
    assigned = with_ids.crossJoin(F.broadcast(total)).withColumn(
        "shard", F.expr(f"(__seq - 1) * {n_shards} div __total").cast("int")
    )
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        F.min("__seq").alias("min_seq"),
        F.max("__seq").alias("max_seq"),
    ]
    if size_col is not None:
        aggs.append(F.sum(F.col(size_col).cast("long")).alias("total_size"))
    manifest = assigned.groupBy("shard").agg(*aggs)
    # Both the total agg and the assignment read with_ids; the persisted
    # range partitioning underneath must stay alive until the caller
    # materializes the manifest — propagate its cached deps.
    return attach_cached_deps(
        manifest, getattr(with_ids, "_pasta_cached_deps", [])
    )


def assign_grouped_sequential_ids(
    df: DataFrame,
    group_cols: list[str] | str,
    order_cols: list[str] | str,
    out_col: str = "seq_id",
    total_col: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Per-GROUP dense 1-based ranks without a per-group single task —
    the grouped generalization of :func:`assign_sequential_ids`, and
    the scale-safe replacement for
    ``row_number() OVER (PARTITION BY g ORDER BY ...)`` when one group
    dominates (the CCNet shape: per-language ranking where English is
    ~half the corpus — a plain grouped window pins the hot language to
    ONE task).

    Same four moves, keyed by (group, order) so a hot group SPANS many
    contiguous range partitions:

    1. range-partition by group_cols + order_cols,
    2. count rows per (partition, group) — metadata scale
       (P × n_groups seen per partition; range partitioning keeps each
       partition to at most a handful of groups),
    3. per-group prefix-sum across partitions on the driver,
    4. broadcast offsets; rank = offset + row_number within the
       (partition, group) slice — every task windows only ITS slice of
       the group.

    With ``total_col`` set, each row also carries its group's total row
    count (free — the driver already summed the slice counts), which is
    exactly what closed-form ntile/equal-depth arithmetic needs.
    """
    gcols = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    ocols = [order_cols] if isinstance(order_cols, str) else list(order_cols)
    n_parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    all_cols = gcols + ocols
    # persist-before-count: same determinism discipline as
    # assign_sequential_ids (range split points re-sample per job)
    ranged = (
        df.repartitionByRange(n_parts, *[F.col(c) for c in all_cols])
        .sortWithinPartitions(*all_cols)
        .withColumn("__pid", F.spark_partition_id())
    ).persist()
    slice_counts = (
        ranged.groupBy("__pid", *gcols)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    # per-group running offsets in __pid order, plus group totals
    by_group: dict[tuple, list] = {}
    for r in slice_counts:
        key = tuple(r[g] for g in gcols)
        by_group.setdefault(key, []).append((r["__pid"], r["cnt"]))
    rows = []
    for key, slices in by_group.items():
        acc = 0
        total = sum(c for _, c in slices)
        for pid, cnt in sorted(slices):
            rows.append((pid, *key, acc, total))
            acc += cnt
    schema_bits = ", ".join(
        ["__pid int"]
        + [f"{g} {dict(df.dtypes)[g]}" for g in gcols]
        + ["__offset long", "__gtotal long"]
    )
    off_df = df.sparkSession.createDataFrame(rows, schema_bits).alias("__off")
    rng = ranged.alias("__rng")
    # null-safe on the group keys: a NULL group value is its own group
    # (matching PARTITION BY semantics), not a dropped row
    cond = F.col("__rng.__pid") == F.col("__off.__pid")
    for g in gcols:
        cond = cond & F.col(f"__rng.{g}").eqNullSafe(F.col(f"__off.{g}"))
    w = Window.partitionBy("__rng.__pid", *[f"__rng.{g}" for g in gcols]).orderBy(
        *[F.col(f"__rng.{c}") for c in ocols]
    )
    result = (
        rng.join(F.broadcast(off_df), cond)
        .withColumn(out_col, (F.col("__offset") + F.row_number().over(w)).cast("long"))
        .drop(F.col("__off.__pid"), *[F.col(f"__off.{g}") for g in gcols])
    )
    if total_col is not None:
        result = result.withColumn(total_col, F.col("__gtotal"))
    result = result.drop("__pid", "__offset", "__gtotal")
    return attach_cached_deps(result, [ranged])
