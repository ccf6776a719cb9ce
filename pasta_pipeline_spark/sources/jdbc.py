"""Optional JDBC connector — S6 parity (SURVEY.md §2.1).

The reference reads/writes Postgres (telegraph_processor.py:69-114,
db_loader.py:117-228); the engine's canonical storage is Parquet
(sources/tables.py), but deployments that keep Postgres as an edge
system can use these adapters. Spark's JDBC source handles predicate
pushdown and partitioned parallel reads natively.

Not exercised in CI (no database in the container); the module is
import-safe without a JDBC driver — errors surface only on use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 16,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    **options: str,
) -> DataFrame:
    """Parallel JDBC scan. With ``partition_column`` + bounds, Spark
    issues ``num_partitions`` range-partitioned queries — the scan
    scales with the cluster instead of a single cursor (the
    reference's fetch is one cursor, telegraph_processor.py:93)."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned JDBC reads need lower_bound and upper_bound")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def write_jdbc_append(df: DataFrame, url: str, table: str, **options: str) -> None:
    """Append-only JDBC sink. True upsert semantics (ON CONFLICT)
    require either staging-table + MERGE on the DB side or the
    engine-side merge_upsert before an overwrite — Spark's JDBC sink
    has no native upsert; this is documented parity, not a gap."""
    writer = df.write.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.mode("append").save()
