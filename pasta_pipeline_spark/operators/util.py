"""Operator-internal utilities."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession


def ensure_package_on_workers(spark: SparkSession) -> None:
    """Ship pasta_pipeline_spark to Python workers via addPyFile.

    Cloudpickle serializes module-level functions by reference, so any
    pandas-UDF / mapInPandas / applyInPandas stage requires the worker
    interpreter to import this package. When the driver imported us by
    file path (sys.path mutation), workers inherit no such path and
    fail with ModuleNotFoundError — caught by running the driver
    contract from a foreign cwd. Zipping the package once per
    SparkContext and registering it with addPyFile makes workers
    self-sufficient regardless of how the driver found us.
    """
    sc = spark.sparkContext
    if getattr(sc, "_pasta_pkg_shipped", False):
        return
    import pasta_pipeline_spark

    pkg_dir = os.path.dirname(os.path.abspath(pasta_pipeline_spark.__file__))
    root = os.path.dirname(pkg_dir)
    base = os.path.join(
        tempfile.gettempdir(), f"pasta_pipeline_spark_pyfiles_{os.getpid()}"
    )
    archive = shutil.make_archive(base, "zip", root_dir=root, base_dir="pasta_pipeline_spark")
    sc.addPyFile(archive)
    sc._pasta_pkg_shipped = True


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition when the input arrives with fewer
    partitions than the session's parallelism.

    Small dimension files (one parquet row group) arrive as a single
    partition; a compute-heavy operator (shingling, hashing, Python
    stages) would then run on one core no matter how wide the cluster
    is — a single unsplittable row group cannot be parallelized by
    ``maxPartitionBytes``. The repartition shuffle is tiny relative to
    the compute it unlocks. At real scale inputs already have many
    partitions and this is a no-op.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
