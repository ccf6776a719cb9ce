"""Parquet-backed mutable tables with atomic overwrite.

The reference's two Postgres tables (SURVEY.md §1.1) become
directory-per-table Parquet with a crash-safe swap protocol — the
"upsert atomicity without Delta" hard part (SURVEY.md §7):

    table/
      _CURRENT            # pointer file: name of the live version dir
      v-<uuid>/           # immutable parquet snapshot
      v-<uuid>/           # previous snapshot (kept until next write)

A write lands in a fresh version dir first, then the pointer flips via
write-temp + os.replace (atomic on POSIX). Readers resolve the pointer
then read an immutable dir, so a crash mid-write never corrupts the
live table and a crash mid-flip leaves the old pointer intact.

On a real deployment this class swaps for Delta/Iceberg tables (ACID
commit protocol, MERGE INTO, time travel); the API is kept minimal so
that swap is mechanical.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

_POINTER = "_CURRENT"


class TableStore:
    """Versioned parquet table rooted at ``path``."""

    def __init__(self, spark: SparkSession, path: str, schema: StructType | None = None):
        self.spark = spark
        self.path = path
        self.schema = schema

    # -- resolution ---------------------------------------------------

    def _pointer_path(self) -> str:
        return os.path.join(self.path, _POINTER)

    def current_version(self) -> str | None:
        try:
            with open(self._pointer_path(), encoding="utf-8") as f:
                v = f.read().strip()
            return v or None
        except FileNotFoundError:
            return None

    def exists(self) -> bool:
        return self.current_version() is not None

    # -- read ----------------------------------------------------------

    def read(self) -> DataFrame:
        """Live snapshot; empty (schema'd) DataFrame if never written."""
        v = self.current_version()
        if v is None:
            if self.schema is None:
                raise FileNotFoundError(f"table {self.path} does not exist and no schema given")
            return self.spark.createDataFrame([], self.schema)
        return self.spark.read.parquet(os.path.join(self.path, v))

    # -- write ---------------------------------------------------------

    def overwrite(self, df: DataFrame, partition_by: list[str] | None = None) -> None:
        """Write a new immutable version, then atomically flip the
        pointer.

        The version just superseded is *kept* until the next write (as
        the module docstring promises): a concurrent reader that
        resolved the pointer pre-flip still reads a complete snapshot.
        Garbage collection happens here instead — after the flip, every
        version dir other than the new live one and its immediate
        predecessor is removed, which also reclaims dirs leaked by a
        crash between the parquet write and the pointer flip."""
        old = self.current_version()
        version = f"v-{uuid.uuid4().hex[:12]}"
        target = os.path.join(self.path, version)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(target)

        os.makedirs(self.path, exist_ok=True)
        tmp = self._pointer_path() + f".tmp-{uuid.uuid4().hex[:6]}"
        with open(tmp, "w", encoding="utf-8") as f:
            f.write(version)
        os.replace(tmp, self._pointer_path())  # atomic flip

        keep = {version, old}
        for entry in os.listdir(self.path):
            if entry.startswith("v-") and entry not in keep:
                shutil.rmtree(os.path.join(self.path, entry), ignore_errors=True)

    def merge_partitioned(
        self,
        updates: DataFrame,
        key: str | list[str],
        partition_col: str,
        order_col: str | None = None,
    ) -> None:
        """Differential upsert at partition granularity — the cost-model
        fix for ``overwrite``-per-batch at scale: only the partitions
        the update batch touches are read, merged (merge.merge_upsert
        semantics), and rewritten; every untouched partition's files
        are HARDLINKED into the new version dir, so the new snapshot is
        complete and immutable without copying or rewriting a byte of
        unchanged data. Versioning, the atomic pointer flip, and GC are
        identical to ``overwrite`` — a reader mid-flip still sees a
        complete snapshot either way. This is the same copy-on-write
        shape a Delta/Iceberg MERGE produces (new files for changed
        partitions, metadata reuse for the rest), expressed on plain
        parquet; at a real deployment the class swaps for the table
        format and this method becomes ``MERGE INTO``.

        Contract: the live version must have been written with
        ``partition_by=[partition_col]``, and a key's partition value
        must be stable across upserts (partition by a key-derived
        bucket or a creation date, never a mutable attribute) —
        otherwise a key could survive in two partitions. The distinct
        partition values of the batch are collected to the driver:
        that is metadata (one scalar per touched partition), the same
        scale class as a lakehouse commit's file list.

        Non-goals (documented, not silent): schema evolution and
        concurrent writers — single-writer per table, like
        ``overwrite``.
        """
        old = self.current_version()
        if old is None:
            self.overwrite(updates, partition_by=[partition_col])
            return
        old_dir = os.path.join(self.path, old)
        prefix = f"{partition_col}="
        old_parts = {
            e for e in os.listdir(old_dir)
            if e.startswith(prefix) and os.path.isdir(os.path.join(old_dir, e))
        }
        if not old_parts:
            # live version isn't partitioned this way — full merge
            from pasta_pipeline_spark.operators.merge import merge_upsert

            merged = merge_upsert(self.read(), updates, key, order_col=order_col)
            self.overwrite(merged, partition_by=[partition_col])
            return

        touched_vals = [
            r[0] for r in updates.select(partition_col).distinct().collect()
        ]

        from pasta_pipeline_spark.operators.merge import merge_upsert

        # Null-safe touched-partition selection: isin() is three-valued
        # and silently drops NULL-partition rows from the subset, which
        # would lose every non-updated key in the NULL partition once
        # the new version's __HIVE_DEFAULT_PARTITION__ dir supersedes
        # the old one.
        non_null_vals = [v for v in touched_vals if v is not None]
        cond = F.lit(False)
        if non_null_vals:
            cond = cond | F.col(partition_col).isin(non_null_vals)
        if any(v is None for v in touched_vals):
            cond = cond | F.col(partition_col).isNull()
        target_subset = self.read().filter(cond)
        merged = merge_upsert(target_subset, updates, key, order_col=order_col)

        version = f"v-{uuid.uuid4().hex[:12]}"
        target = os.path.join(self.path, version)
        merged.write.mode("overwrite").partitionBy(partition_col).parquet(target)

        # The touched-directory set is derived from what Spark ACTUALLY
        # wrote into the new version — never reconstructed from values
        # with an f-string, because Hive dir encoding is not str(): NULL
        # becomes __HIVE_DEFAULT_PARTITION__, special characters are
        # URL-escaped, timestamps escape their colons. A reconstruction
        # mismatch would hardlink a stale copy of a genuinely-touched
        # partition NEXT TO its rewrite — duplicate rows in the new
        # snapshot. Listing the written dirs uses the same encoder that
        # produced the old dirs, so set subtraction is exact.
        written_dirs = {
            e for e in os.listdir(target)
            if e.startswith(prefix) and os.path.isdir(os.path.join(target, e))
        }

        # carry unchanged partitions forward by hardlink (copy fallback)
        for part in sorted(old_parts - written_dirs):
            src_dir = os.path.join(old_dir, part)
            dst_dir = os.path.join(target, part)
            os.makedirs(dst_dir, exist_ok=True)
            for fname in os.listdir(src_dir):
                src = os.path.join(src_dir, fname)
                dst = os.path.join(dst_dir, fname)
                if not os.path.isfile(src):
                    continue
                try:
                    os.link(src, dst)
                except OSError:
                    shutil.copy2(src, dst)

        tmp = self._pointer_path() + f".tmp-{uuid.uuid4().hex[:6]}"
        with open(tmp, "w", encoding="utf-8") as f:
            f.write(version)
        os.replace(tmp, self._pointer_path())  # atomic flip

        keep = {version, old}
        for entry in os.listdir(self.path):
            if entry.startswith("v-") and entry not in keep:
                shutil.rmtree(os.path.join(self.path, entry), ignore_errors=True)

    def compact(self, target_partitions: int) -> None:
        """Small-file compaction: rewrite the live version into
        ``target_partitions`` files. Streaming merges and incremental
        runs accrete one file per shuffle partition per run; periodic
        compaction keeps scan task counts and footer overhead bounded
        (at real scale: the table format's OPTIMIZE)."""
        self.overwrite(self.read().coalesce(target_partitions))


def write_bucketed_table(
    df, name: str, bucket_col: str, num_buckets: int = 16, sort_col: str | None = None
) -> None:
    """Bucketed managed table — the co-located-join layout (SURVEY.md
    §4: the replacement for the reference's B-tree indexes on join
    keys). Two tables bucketed on the same key with the same bucket
    count join WITHOUT a shuffle: each task reads matching bucket
    files from both sides. ``sortBy`` additionally pre-sorts within
    buckets so sort-merge joins skip their sort."""
    writer = df.write.mode("overwrite").format("parquet").bucketBy(num_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(name)
