"""Physical layout operators — Z-order clustering and small-file
compaction.

At 100 TB the scan cost of every query in this engine is set by
*layout*: which rows share a file (data-skipping via min/max stats)
and how many files there are (task scheduling + open() overhead). The
reference never thinks about this (Postgres owns its heap); a Spark
engine must.

- ``zvalue2`` interleaves the bits of two integer columns into one
  long whose ordering is the Z-space-filling curve: rows close in
  (a, b) land close in z, so range-partitioning + sorting by z gives
  files whose min/max footprints are tight in BOTH dimensions —
  multi-column data skipping from a single sort key. Pure bit
  expressions (shift/and/or), whole-stage codegen, no UDF — and
  exactly reproducible in any engine with integer bit ops, so it
  carries a real DuckDB oracle.
- ``zorder_layout`` applies it: range-repartition by z (contiguous,
  balanced ranges via sampling) then sort within partitions — the
  standard open-table-format OPTIMIZE ZORDER shape.
- ``compaction_partitions`` sizes a rewrite of a small-file table:
  target file count = ceil(bytes / target_file_bytes) — the weekly
  maintenance job's layout step (SURVEY O6 extension).
"""

from __future__ import annotations

import math
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue2(a: Column | str, b: Column | str, bits: int = 21) -> Column:
    """Interleave the low ``bits`` of non-negative integer columns
    ``a`` (even positions) and ``b`` (odd positions) into one long.
    2*bits must stay < 63; values are masked to ``bits`` so oversized
    inputs wrap into the curve rather than overflowing the sign bit.
    """
    if 2 * bits >= 63:
        raise ValueError("2*bits must be < 63")
    ca = (F.col(a) if isinstance(a, str) else a).cast("long")
    cb = (F.col(b) if isinstance(b, str) else b).cast("long")
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(ca, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(F.shiftleft(F.shiftright(cb, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    return reduce(lambda x, y: x.bitwiseOR(y), terms).alias("z")


def zvalue2_sql(a: str, b: str, bits: int = 21) -> str:
    """The identical computation as engine-portable SQL text (DuckDB
    oracle twin of :func:`zvalue2` — generated, not hand-kept, so the
    two cannot drift)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


def zorder_layout(
    df: DataFrame,
    col_a: str,
    col_b: str,
    n_partitions: int,
    bits: int = 21,
) -> DataFrame:
    """Cluster ``df`` for two-dimensional data skipping: range-
    partition on the Z-value (Spark samples the distribution for
    balanced contiguous ranges) and sort within each partition.
    Writing the result gives files whose (col_a, col_b) min/max
    envelopes are tight — the OPTIMIZE ZORDER shape without a table
    format."""
    with_z = df.withColumn("__z", zvalue2(col_a, col_b, bits))
    return (
        with_z.repartitionByRange(n_partitions, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )


def compaction_partitions(total_bytes: int, target_file_bytes: int = 128 * 1024 * 1024) -> int:
    """File count for a compaction rewrite: enough files to keep each
    near ``target_file_bytes``, never zero."""
    if total_bytes <= 0:
        return 1
    return max(1, math.ceil(total_bytes / target_file_bytes))


def file_zone_map(spark, path: str, cols: list[str]) -> DataFrame:
    """Per-file min/max/count manifest over a parquet directory — the
    zone map a table format keeps in metadata, materialized as a
    DataFrame so layout quality is AUDITABLE: tight, disjoint per-file
    ranges mean a range predicate prunes to few files; overlapping
    ranges mean the layout (see :func:`zorder_layout`) isn't helping.

    Built from the data (one scan, groupBy input_file_name); at 100 TB
    use the format's own stats instead — this operator is the
    format-free fallback and the verification tool.
    """
    from pyspark.sql import functions as F

    df = spark.read.parquet(path)
    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    return df.groupBy(F.input_file_name().alias("file")).agg(*aggs)


def pruned_files(zone_map: DataFrame, col: str, lo, hi) -> DataFrame:
    """Files whose [min, max] range intersects [lo, hi] — the candidate
    set a zone-map-aware reader actually opens."""
    from pyspark.sql import functions as F

    return zone_map.filter(
        (F.col(f"max_{col}") >= lo) & (F.col(f"min_{col}") <= hi)
    ).select("file")
