"""Empirical scale-ladder audit — the measured counterpart of the
plan audit.

The 100x-scale posture rests on plan reading (no cartesians, pruned
scans, bounded pair generation); this tool adds measured slopes: every
headline + dedup-tier query runs at two scale factors (default sf0.01
and sf0.1 — a 10x data ratio) and the wall-time ratio is compared to
the data ratio. A query whose time grows faster than
``flag_factor * data_ratio`` (default 1.3x) is flagged as
super-linear — the early-warning signal for an operator that would
not survive a real scale-up (quadratic pair generation, a
single-partition sort, a driver-side loop).

Ratios well BELOW the data ratio are normal at these sizes (fixed
per-query overhead — plan compile, task launch — dominates small
inputs); the audit is one-sided. Queries too fast at the large SF to
measure a slope (under ``min_big_sec``) are recorded but exempt from
flagging: at sub-second scale the ratio is timer noise.

Usage: python tools/scale_ladder.py [out.json]
Writes the JSON artifact (default SCALELADDER.json) and prints it.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMALL = "/root/testdata/sf0.01"
SF_BIG = "/root/testdata/sf0.1"
DATA_RATIO = 10.0
FLAG_FACTOR = 1.3
MIN_BIG_SEC = 1.0

#: bench.py's headline set + the dedup tail as registered catalog
#: queries (standalone form — each tier pays its own scan here, which
#: only makes the audit stricter) + the heaviest iterative/composed
#: plans the r5 verdict called out.
QUERIES = [
    "pricing_summary",
    "join_agg_nation_revenue",
    "work_selection",
    "merge_upsert",
    "keep_latest_dedup",
    "tumbling_window",
    "orphan_rewrite",
    "dedup_exact",
    "cosine_topk",
    "knn_join",
    "lang_id",
    "media_features",
    "simhash_pairs",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "edit_distance_pairs",
    "duplicated_spans",
    "dedup_clusters",
    "url_dedup",
    "semantic_dedup",
    "training_corpus",
    # round-6 additions: composite ANN, prefix-filtered joins, media
    # entropy decode, Arrow packing, selection/tiering/drift tiers
    "ivf_pq_topk",
    "prefix_jaccard_pairs",
    "media_jpeg_pixels",
    "dsir_selection",
    "greedy_pack",
    "perplexity_buckets",
    "curation_funnel",
    "length_drift_ks",
    # wave-2: from-spec media decode, perceptual dedup, search, MOSS
    "media_flac_samples",
    "image_dhash_pairs",
    "audio_fingerprint_pairs",
    "video_scene_cuts",
    "winnowing_pairs",
    "bm25_topk",
    "pretrain_pipeline",
    "media_dedup_survivors",
    # round-7: the de-skewed statistics passes (r6 verdict #1/#3)
    "equidepth_histogram",
]


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "SCALELADDER.json"

    import __spark_entry__ as entry_mod
    from pasta_pipeline_spark.operators.util import release_cached_deps
    from pasta_pipeline_spark.session import get_spark

    spark = get_spark("scale-ladder")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()

    def run(name: str, sf_dir: str) -> float:
        best = float("inf")
        dfs = []
        for _ in range(2):
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
            dfs.append(df)
        for df in dfs:
            release_cached_deps(df)
        return best

    # untimed warmup at the smallest sf: JIT/codegen + Python workers
    warm_sf = "/root/testdata/sf0.001"
    for name in QUERIES:
        df = qs[name](spark, warm_sf)
        df.write.format("noop").mode("overwrite").save()
        release_cached_deps(df)

    report: dict = {}
    flagged: list[str] = []
    for name in QUERIES:
        t_small = run(name, SF_SMALL)
        t_big = run(name, SF_BIG)
        ratio = round(t_big / t_small, 2) if t_small > 0 else None
        flag = bool(
            ratio is not None
            and t_big >= MIN_BIG_SEC
            and ratio > FLAG_FACTOR * DATA_RATIO
        )
        report[name] = {
            "t_small": round(t_small, 3),
            "t_big": round(t_big, 3),
            "ratio": ratio,
            "flag": flag,
        }
        if flag:
            flagged.append(name)
        print(
            f"{name}: {t_small:.3f}s -> {t_big:.3f}s  ratio {ratio}"
            f"{'  ** SUPER-LINEAR **' if flag else ''}",
            file=sys.stderr,
        )

    doc = {
        "sf_small": 0.01,
        "sf_big": 0.1,
        "data_ratio": DATA_RATIO,
        "flag_factor": FLAG_FACTOR,
        "min_big_sec": MIN_BIG_SEC,
        "queries": report,
        "flagged": flagged,
    }
    with open(out_path, "w", encoding="utf-8") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    print(json.dumps(doc))


if __name__ == "__main__":
    main()
