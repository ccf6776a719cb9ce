"""SparkSession construction with scale-conscious defaults.

The local test envelope is ``local[N]`` single-JVM; the production
posture is a multi-executor cluster reading ~100 TB. Every conf set
here is chosen to be correct at both ends:

- AQE on (runtime coalescing, skew-join splitting, dynamic broadcast),
- shuffle partitions sized for the local envelope but overridable via
  env (a real cluster would set this to 2-3x total cores, or rely on
  AQE coalescing from a high initial value),
- Arrow enabled for every pandas-UDF boundary,
- partition-size caps so parquet scans split into parallel tasks even
  for a handful of files.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "pasta-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's defaults.

    Parameters mirror what a cluster deploy would set via
    ``spark-submit --conf``; in local mode we default to
    ``local[$SPARK_GRAFT_CPUS]``.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    shuffle = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # --- Driver/executor heap: in local mode the driver JVM hosts
        # every executor thread, so Spark's 1g default is the binding
        # limit for the WHOLE engine — long multi-query runs (bench,
        # scale ladder, oracle gate) accumulate broadcast/cache/codegen
        # state and OOM at 1g (bit the r8 ladder on its 41st query).
        # Only honored at JVM start; a cluster deploy sizes executors
        # via spark-submit instead.
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        )
        # --- Adaptive Query Execution: runtime re-planning --------------
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # AQE coalescing floor 1m -> 64k: BYTES are a poor proxy for
        # task cost on this engine's compute-dense shuffles (64-dim
        # cosine folds, array-set intersections ride the pair frames),
        # and the default 1 MiB floor coalesces every sub-MiB exchange
        # to ONE task — the r13 stage profile showed single-task verify
        # stages holding 25-45% of the pair tiers' wall. parallelismFirst
        # (default on) still caps split width at the session parallelism,
        # and at production scale post-shuffle partitions are hundreds of
        # MB so the floor never binds — the knob only stops byte-based
        # coalescing from serializing compute-heavy small shuffles.
        # Order-fair interleaved A/B at sf0.1 (tools/conf_ab.py, min of
        # 6): semantic_dedup 0.40x, semantic_dedup_2l 0.66x,
        # prefix_jaccard_pairs 0.78x, pricing_summary 0.91x; null-test
        # noise envelope 1.03-1.31. Override via SPARK_GRAFT_CONF.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "65536")
        # --- Shuffle sizing ---------------------------------------------
        .config("spark.sql.shuffle.partitions", str(shuffle))
        # --- Scan parallelism: split files into <=128MB tasks ------------
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # --- Arrow for every pandas-UDF / toPandas boundary --------------
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # --- Broadcast threshold: dims up to 32MB broadcast free ---------
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        # --- Timestamps: engine canon is UTC ------------------------------
        .config("spark.sql.session.timeZone", "UTC")
        # Read TIMESTAMP(NANOS) parquet columns (unsupported by Spark's
        # reader) as raw nanos-since-epoch longs; schemas.load_table
        # converts them to microsecond timestamps (DuckDB-equivalent
        # truncation).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    # Scale-dependent knobs stay parameterized (optimization-round
    # rule): SPARK_GRAFT_CONF="key=value;key=value" applies LAST, so a
    # cluster deploy (or a measurement run) can override any default
    # above without code edits — the spark-submit --conf analog.
    env_conf = os.environ.get("SPARK_GRAFT_CONF", "")
    for pair in env_conf.split(";"):
        if "=" in pair:
            k, v = pair.split("=", 1)
            builder = builder.config(k.strip(), v.strip())
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
