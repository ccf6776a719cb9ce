"""Fresh-process wall time for one registered catalog query.

The scale ladder runs every rung in ONE driver JVM; even with
clearCache() between queries, late readings can inflate from
accumulated JVM/session state (the r9 finding: hard_negatives read
697s in-session vs 40.4s fresh). This tool is the cross-check the r9
verdict asked to make routine: run a single query in a brand-new
process/JVM and print one JSON line, so SCALELADDER absolutes can be
validated against process-clean numbers.

Usage: python tools/fresh_query_time.py QUERY SF_DIR [runs]
Prints {"query": ..., "sf_dir": ..., "runs": N, "best_sec": ...,
"times": [...]}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2]
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    import __spark_entry__ as entry_mod
    from pasta_pipeline_spark.operators.util import release_cached_deps
    from pasta_pipeline_spark.session import get_spark

    spark = get_spark("fresh-query-time")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()

    times = []
    for _ in range(runs):
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        times.append(round(time.time() - t0, 3))
        release_cached_deps(df)
        spark.catalog.clearCache()
    print(
        json.dumps(
            {
                "query": name,
                "sf_dir": sf_dir,
                "runs": runs,
                "best_sec": min(times),
                "times": times,
            }
        )
    )


if __name__ == "__main__":
    main()
