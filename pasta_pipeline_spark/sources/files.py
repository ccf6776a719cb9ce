"""File snapshot sinks and scans — S3/S4/S5 in SURVEY.md §2.1.

Parity sources:
- CSV/JSON snapshot writes: /root/reference/dags/processors/message_scraper.py:113-128
- JSON scan with NaN→None:  /root/reference/dags/processors/db_loader.py:132-133

The reference writes one artifact file per run and re-reads it with
pandas inference. The engine writes distributed (one file per
partition) and reads back with an explicit schema — inference at 100 TB
is both slow (extra pass) and fragile.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def snapshot_path(base_dir: str, channel: str, time_range: str, ts: str, ext: str) -> str:
    """Filename templating (F15, message_scraper.py:113-118)."""
    return f"{base_dir}/{channel}_{time_range}_{ts}.{ext}"


def write_csv_snapshot(df: DataFrame, path: str) -> None:
    """S3 — per-run CSV snapshot (header, UTF-8). Arrays/maps are not
    CSV-representable; callers export them via to_json columns first."""
    df.write.mode("overwrite").option("header", True).csv(path)


def write_json_snapshot(df: DataFrame, path: str) -> None:
    """S4 — JSON-lines snapshot, non-ASCII preserved (Spark writes
    UTF-8 without escaping by default, matching ensure_ascii=False)."""
    df.write.mode("overwrite").json(path)


def read_json_snapshot(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """S5 — snapshot scan with explicit schema (replacing pandas
    read_json inference + NaN scrubbing; Spark nulls are native)."""
    return spark.read.schema(schema).json(path)


def write_orc_snapshot(df: DataFrame, path: str) -> None:
    """ORC sink — second columnar format (native Spark support), for
    interop with ORC-based warehouses."""
    df.write.mode("overwrite").orc(path)


def read_orc_snapshot(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def read_csv_with_error_channel(
    spark: SparkSession, path: str, schema: StructType
) -> DataFrame:
    """P10 — error-row handling as a side channel instead of a silent
    drop (SURVEY.md §2.2: the reference logs-and-skips malformed rows,
    message_scraper.py:88-90 / db_loader.py:197-200). Permissive-mode
    CSV scan where rows that fail the schema land with their raw text
    in ``_corrupt_record`` and nulls elsewhere; downstream filters
    route them to a quarantine table rather than losing them."""
    from pyspark.sql.types import StringType, StructField

    with_corrupt = StructType(
        schema.fields + [StructField("_corrupt_record", StringType(), True)]
    )
    return (
        spark.read.schema(with_corrupt)
        .option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
    )


def read_text_corpus(
    spark: SparkSession, path: str, whole_files: bool = True
) -> DataFrame:
    """Raw text-corpus ingest: ``(doc_path, doc_id, text, n_bytes)``.

    ``whole_files=True`` reads one document per FILE (wholetext —
    the raw-corpus layout: one article/page per file); False reads one
    document per LINE (the jsonl-adjacent layout for pre-split
    corpora). The id is the stable xxhash64 of the file path (plus the
    line's own content hash in line mode — two identical lines in one
    file stay distinct by position is NOT promised; dedup is the
    dedup ladder's job, not ingest's).

    Scale note: wholetext makes one task per file — right for
    documents, wrong for multi-GB blobs (route those through
    ``read_binary_corpus`` chunk manifests instead).
    """
    from pyspark.sql import functions as F

    df = spark.read.text(path, wholetext=whole_files).select(
        F.input_file_name().alias("doc_path"), F.col("value").alias("text")
    )
    id_src = (
        F.col("doc_path")
        if whole_files
        else F.concat(F.col("doc_path"), F.lit("#"), F.xxhash64("text").cast("string"))
    )
    return df.select(
        "doc_path",
        F.xxhash64(id_src).alias("doc_id"),
        "text",
        F.octet_length("text").cast("long").alias("n_bytes"),
    )


def read_binary_corpus(spark: SparkSession, path: str, glob: str | None = None) -> DataFrame:
    """Opaque-blob ingest via Spark's binaryFile source →
    ``(media_id, media_type, payload, n_bytes, mod_time)`` — the media
    table shape operators/multimodal.py consumes (type from the file
    extension; decode stays behind the multimodal stubs). Driver lists
    files, executors read payloads — no payload ever routes through
    the driver."""
    from pyspark.sql import functions as F

    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    ext = F.lower(F.element_at(F.split(F.col("path"), r"\."), -1))
    return df.select(
        F.xxhash64(F.col("path")).alias("media_id"),
        ext.alias("media_type"),
        F.col("content").alias("payload"),
        F.col("length").cast("long").alias("n_bytes"),
        F.col("modificationTime").alias("mod_time"),
    )
