"""Interleaved same-session A/B of a RUNTIME SQL conf (guide §1).

The sandbox's throughput is erratic enough that cross-session
comparisons drift by 2x; runtime SQL confs can instead be toggled
per-iteration inside ONE session, interleaving A and B so box drift
cancels. Reports per-query min over the A rounds vs the B rounds.

Usage:
  python tools/conf_ab.py "key=valueB" query [query ...]
(A = session default, B = the override; 4 rounds each, interleaved.)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    kv = sys.argv[1]
    key, val_b = kv.split("=", 1)
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rounds = int(os.environ.get("AB_ROUNDS", "4"))

    from pasta_pipeline_spark.operators.util import release_cached_deps
    from pasta_pipeline_spark.queries.catalog import REGISTRY
    from pasta_pipeline_spark.session import get_spark

    spark = get_spark("conf-ab")
    spark.sparkContext.setLogLevel("ERROR")
    val_a = spark.conf.get(key, None)

    def run(name: str) -> float:
        df = REGISTRY[name].spark_fn(spark, sf_dir)
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        sec = time.time() - t0
        release_cached_deps(df)
        return sec

    warm = "/root/testdata/sf0.001"
    for name in names:
        df = REGISTRY[name].spark_fn(spark, warm)
        df.write.format("noop").mode("overwrite").save()
        release_cached_deps(df)

    def set_a():
        if val_a is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, val_a)

    a: dict[str, list[float]] = {n: [] for n in names}
    b: dict[str, list[float]] = {n: [] for n in names}
    for r in range(rounds):
        for name in names:
            # alternate within-pair order per round: the second run of
            # the same query in a row is systematically faster (codegen
            # cache warmth), ~0.5-0.9x on a null A/B — alternation makes
            # the min-over-rounds order-fair
            if r % 2 == 0:
                set_a()
                a[name].append(run(name))
                spark.conf.set(key, val_b)
                b[name].append(run(name))
            else:
                spark.conf.set(key, val_b)
                b[name].append(run(name))
                set_a()
                a[name].append(run(name))
    print(f"A: {key}={val_a!r} (default)  B: {key}={val_b!r}")
    print(f"{'query':30s} {'A_min':>7s} {'B_min':>7s} {'B/A':>6s}")
    for name in names:
        ra, rb = min(a[name]), min(b[name])
        print(f"{name:30s} {ra:7.3f} {rb:7.3f} {rb/ra:6.2f}")


if __name__ == "__main__":
    main()
