"""Capture `.explain("formatted")` for named catalog queries.

Writes one file per query to the given output directory — the
before/after plan evidence for optimization rounds (plans/r13/...).

Usage: python tools/capture_plans.py <out_dir> <suffix> [query ...]

With no query list, captures every bench.py headline query (legacy +
LLM tiers plus the shared-scan dedup tail).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_dir = sys.argv[1]
    suffix = sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import bench
    from pasta_pipeline_spark.queries.catalog import REGISTRY
    from pasta_pipeline_spark.session import get_spark

    if not names:
        names = bench.BENCH_QUERIES + bench.BENCH_QUERIES_LLM + [
            "simhash_pairs", "ngram_jaccard_pairs", "minhash_lsh_pairs"
        ]

    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in names:
        df = REGISTRY[name].spark_fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count(chr(10))} lines)")


if __name__ == "__main__":
    main()
