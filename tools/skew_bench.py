"""Skew-stress bench — measured evidence that the salted operators WIN
under key skew (r5 verdict item: salted_group_agg / salted_join_revenue
were row-identical to plain but had no fixture demonstrating the win).

Fixture: a Zipf-style fact table at sf0.1 scale (2M rows) where the
hot key owns 50% of the fact, joined to a 10k-row dimension; plus a
uniform-key control of the same size. The dimension is forced past the
broadcast threshold (autoBroadcastJoinThreshold=-1) because that is the
regime salting targets — a small-but-not-broadcastable side on a
shuffled join (the docstring contract of salted_join).

Two configurations, reported honestly side by side:

- ``aqe_on``  — stock AQE (skew-join splitting active). This is the
  first line of defense and may already absorb the join skew; the
  artifact records whatever it shows.
- ``aqe_off`` — the regime salting exists for: AQE unavailable (older
  runtimes) or inapplicable (the skewed stage feeds a downstream
  operator that needs the partitioning, so the split is suppressed).

Metrics per (config, distribution, path): wall seconds for
join → group-agg, and MAX TASK ROWS of the pre-aggregation join output
(spark_partition_id histogram — the direct measurement of whether one
task carries the hot key). Success criteria from the verdict: salted
>= 2x faster OR max-task rows >= 4x smaller on the skewed key, with
the uniform control showing plain is not degraded by more than the
replication overhead.

Usage: python tools/skew_bench.py [out.json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_FACT = 2_000_000
N_KEYS = 10_000
SALT = 32
TMP = "/root/repo/.tmp_skewbench"


def build_fixture(spark) -> None:
    from pyspark.sql import functions as F

    base = spark.range(0, N_FACT, 1, 32).select(
        F.col("id"),
        # deterministic pseudo-random stream
        F.abs(F.xxhash64(F.col("id"))).alias("h"),
        (F.abs(F.xxhash64(F.col("id") + 7)) % 1000).alias("v"),
    )
    skewed = base.select(
        F.when(F.col("h") % 2 == 0, F.lit(0))
        .otherwise(F.col("h") % N_KEYS)
        .cast("long")
        .alias("k"),
        F.col("v").cast("long"),
    )
    uniform = base.select(
        (F.col("h") % N_KEYS).cast("long").alias("k"), F.col("v").cast("long")
    )
    dim = spark.range(0, N_KEYS).select(
        F.col("id").alias("k"),
        (F.col("id") % 97).cast("long").alias("w"),
        F.concat(F.lit("attr_"), F.col("id")).alias("name"),
    )
    skewed.write.mode("overwrite").parquet(f"{TMP}/fact_skewed")
    uniform.write.mode("overwrite").parquet(f"{TMP}/fact_uniform")
    dim.write.mode("overwrite").parquet(f"{TMP}/dim")
    # Zipf-language corpus for the grouped-rank case (r6 verdict #3):
    # 'en' owns 50% of the rows, the rest spread over 20 languages —
    # the regime where row_number() PARTITION BY lang pins half the
    # corpus to ONE task.
    langs = base.select(
        F.col("id"),
        F.when(F.col("h") % 2 == 0, F.lit("en"))
        .otherwise(F.concat(F.lit("l"), (F.col("h") % 20).cast("string")))
        .alias("lang"),
        (F.abs(F.xxhash64(F.col("id") + 13)) % 1_000_000).alias("score"),
    )
    langs.write.mode("overwrite").parquet(f"{TMP}/docs_zipf")


def run_case(spark, fact_path: str, salted: bool) -> dict:
    from pyspark.sql import functions as F

    from pasta_pipeline_spark.operators.skew import salted_join

    fact = spark.read.parquet(fact_path)
    dim = spark.read.parquet(f"{TMP}/dim")
    if salted:
        joined = salted_join(fact, dim, on=["k"], salt_buckets=SALT)
    else:
        joined = fact.join(dim, "k")
    # the measured job: join -> decomposable agg (sum weighted value)
    out = joined.groupBy("name").agg(F.sum(F.col("v") * F.col("w")).alias("s"))

    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        out.write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)

    # skew measurement: rows per task of the pre-agg join output
    hist = (
        joined.withColumn("__pid", F.spark_partition_id())
        .groupBy("__pid")
        .count()
        .agg(
            F.max("count").alias("mx"),
            F.count(F.lit(1)).alias("n_tasks"),
            F.sum("count").alias("total"),
        )
        .collect()[0]
    )
    return {
        "wall_sec": round(best, 3),
        "max_task_rows": int(hist["mx"]),
        "n_tasks": int(hist["n_tasks"]),
        "total_rows": int(hist["total"]),
    }


def run_rank_case(spark, grouped: bool) -> dict:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from pasta_pipeline_spark.operators.ids import assign_grouped_sequential_ids
    from pasta_pipeline_spark.operators.util import release_cached_deps

    docs = spark.read.parquet(f"{TMP}/docs_zipf")
    if grouped:
        ranked = assign_grouped_sequential_ids(
            docs, "lang", ["score", "id"], out_col="rk"
        )
    else:
        w = Window.partitionBy("lang").orderBy("score", "id")
        ranked = docs.withColumn("rk", F.row_number().over(w).cast("long"))

    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        ranked.write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)

    # NB the per-pid count MUST aggregate rk too: with rk pruned,
    # Catalyst removes the Window node outright and
    # spark_partition_id() would measure the raw scan partitions, not
    # the window's (verified — the histogram read uniform without it)
    hist = (
        ranked.withColumn("__pid", F.spark_partition_id())
        .groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("count"), F.sum("rk").alias("rksum"))
        .agg(
            F.max("count").alias("mx"),
            F.count(F.lit(1)).alias("n_tasks"),
            F.sum("count").alias("total"),
            # rksum must survive to the FINAL agg — pruned anywhere,
            # Catalyst drops rk and eliminates the Window node
            F.sum("rksum").alias("rktot"),
        )
        .collect()[0]
    )
    # order-insensitive rank checksum — both paths must assign the
    # SAME per-language dense ranks (int64 sum of rk * (id-hash % P))
    chk = ranked.agg(
        F.sum(F.col("rk") * (F.abs(F.xxhash64("id")) % 1009)).alias("c")
    ).collect()[0]["c"]
    release_cached_deps(ranked)
    return {
        "wall_sec": round(best, 3),
        "max_task_rows": int(hist["mx"]),
        "n_tasks": int(hist["n_tasks"]),
        "total_rows": int(hist["total"]),
        "rank_checksum": int(chk),
    }


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "SKEWBENCH.json"

    from pasta_pipeline_spark.session import get_spark

    spark = get_spark("skew-bench")
    spark.sparkContext.setLogLevel("ERROR")
    build_fixture(spark)

    report: dict = {}
    try:
        for aqe in (True, False):
            spark.conf.set("spark.sql.adaptive.enabled", str(aqe).lower())
            # the no-broadcast regime salting targets
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            cfg = "aqe_on" if aqe else "aqe_off"
            report[cfg] = {}
            for dist in ("skewed", "uniform"):
                fact_path = f"{TMP}/fact_{dist}"
                plain = run_case(spark, fact_path, salted=False)
                salted = run_case(spark, fact_path, salted=True)
                report[cfg][dist] = {
                    "plain": plain,
                    "salted": salted,
                    "speedup": round(plain["wall_sec"] / salted["wall_sec"], 2),
                    "max_task_shrink": round(
                        plain["max_task_rows"] / salted["max_task_rows"], 2
                    ),
                }
                print(f"{cfg}/{dist}: {report[cfg][dist]}", file=sys.stderr)
        # grouped-rank case: row_number PARTITION BY lang (one task per
        # language) vs assign_grouped_sequential_ids (range-partition +
        # per-group driver prefix-sum) on the Zipf-language corpus.
        # AQE OFF for the measurement: coalescing would merge the small
        # language partitions and blur the per-task histogram — but it
        # can only MERGE partitions, never split the hot language's, so
        # the plain window's hot task is the same either way.
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        plain = run_rank_case(spark, grouped=False)
        grouped = run_rank_case(spark, grouped=True)
        assert plain["rank_checksum"] == grouped["rank_checksum"], (
            plain["rank_checksum"],
            grouped["rank_checksum"],
        )
        report["grouped_rank"] = {
            "plain_window": plain,
            "grouped_ids": grouped,
            "speedup": round(plain["wall_sec"] / grouped["wall_sec"], 2),
            "max_task_shrink": round(
                plain["max_task_rows"] / grouped["max_task_rows"], 2
            ),
            "ranks_identical": True,
        }
        print(f"grouped_rank: {report['grouped_rank']}", file=sys.stderr)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        shutil.rmtree(TMP, ignore_errors=True)

    doc = {
        "n_fact": N_FACT,
        "n_keys": N_KEYS,
        "hot_key_share": 0.5,
        "salt_buckets": SALT,
        "cases": report,
    }
    with open(out_path, "w", encoding="utf-8") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    print(json.dumps(doc))


if __name__ == "__main__":
    main()
