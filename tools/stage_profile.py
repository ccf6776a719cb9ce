"""Stage-level empirical profile of one catalog query (guide §1.1).

Runs the query with the Spark UI enabled and dumps per-stage wall
time, task count, and shuffle bytes from the REST API — the
local-mode stand-in for "open the Stages tab, find where the time
goes". Stages are listed for the LAST timed iteration only (steady
state, post-JIT).

Usage: python tools/stage_profile.py [sf_dir] query [query...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    if args and os.path.isdir(args[0]):
        sf_dir, names = args[0], args[1:]
    else:
        sf_dir, names = "/root/testdata/sf0.1", args

    from pasta_pipeline_spark.operators.util import release_cached_deps
    from pasta_pipeline_spark.queries.catalog import REGISTRY
    from pasta_pipeline_spark.session import get_spark

    spark = get_spark("stage-profile", extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    def rest(path: str):
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}{path}") as r:
            return json.load(r)

    warm = "/root/testdata/sf0.001"
    for name in names:
        df = REGISTRY[name].spark_fn(spark, warm)
        df.write.format("noop").mode("overwrite").save()
        release_cached_deps(df)

    for name in names:
        # 2 warm iterations, then the profiled one
        secs = []
        for _ in range(2):
            df = REGISTRY[name].spark_fn(spark, sf_dir)
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            secs.append(time.time() - t0)
            release_cached_deps(df)
        jobs_before = {j["jobId"] for j in rest("/jobs")}
        df = REGISTRY[name].spark_fn(spark, sf_dir)
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        jobs = [j for j in rest("/jobs") if j["jobId"] not in jobs_before]
        stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
        rows = []
        total_stage_ms = 0
        for sid in stage_ids:
            try:
                infos = rest(f"/stages/{sid}")
            except Exception:
                continue
            for s in infos:
                if s["status"] not in ("COMPLETE", "FAILED"):
                    continue
                dur = 0
                if s.get("firstTaskLaunchedTime") and s.get("completionTime"):
                    from datetime import datetime

                    try:
                        t1 = datetime.strptime(s["firstTaskLaunchedTime"].replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f")
                        t2 = datetime.strptime(s["completionTime"].replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f")
                        dur = (t2 - t1).total_seconds() * 1000
                    except ValueError:
                        # unexpected REST timestamp format: keep the
                        # stage row with dur=0 instead of aborting the
                        # whole profile (r13 advisor)
                        dur = 0
                total_stage_ms += dur
                rows.append(
                    (
                        dur,
                        sid,
                        s["numCompleteTasks"],
                        s.get("shuffleReadBytes", 0),
                        s.get("shuffleWriteBytes", 0),
                        s.get("executorRunTime", 0),
                        s["name"].split("\n")[0][:70],
                    )
                )
        release_cached_deps(df)
        print(f"\n=== {name}: wall {wall:.3f}s (warm iters: {[round(x,2) for x in secs]}), "
              f"{len(jobs)} jobs, {len(rows)} stages, sum-stage {total_stage_ms/1000:.2f}s ===")
        rows.sort(reverse=True)
        print(f"{'ms':>8s} {'stage':>6s} {'tasks':>6s} {'shRead':>9s} {'shWrite':>9s} {'execMs':>8s}  name")
        for dur, sid, nt, sr, sw, ert, nm in rows[:18]:
            print(f"{dur:8.0f} {sid:6d} {nt:6d} {sr:9d} {sw:9d} {ert:8d}  {nm}")


if __name__ == "__main__":
    main()
