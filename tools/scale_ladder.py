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

#: Contract-scoped expected flags (r12 verdict ask #3): queries whose
#: super-linear growth is their CONTRACT's price tag, not a
#: regression — the banded recipes keep every band-collision pair by
#: construction (NOTES #66/#73), and their bounded siblings
#: (semantic_dedup_clustered / ivf_threshold_sweep) plus the
#: semantic_dedup_auto front door are measured unflagged beside them.
#: A raised flag on these lands in the artifact's ``expected_flags``
#: list with this annotation instead of ``flagged`` — recorded, never
#: hidden; any OTHER query flagging is still a real signal.
EXPECTED_FLAGS = {
    "semantic_dedup": (
        "banded-gate contract: keeps every band-collision pair at fixed "
        "recall (NOTES #66) — gate-scale-only by contract; the default "
        "path is semantic_dedup_auto (clustered above the anchor, sf10 "
        "ratio 7.7 vs banded 14.49)"
    ),
    "dedup_threshold_sweep": (
        "banded-sweep contract: profiles the banded gate's OWN pair "
        "population, keeping every gated pair (NOTES #73) — the "
        "at-scale planning instrument is ivf_threshold_sweep (sf10 "
        "ratio 5.42 vs 15.75)"
    ),
}


def _flag_dest(
    tier_key: str, name: str, row: dict, flagged: list, expected: list
) -> None:
    """Route a raised flag: contract-scoped names are annotated into
    ``expected`` (artifact's expected_flags); others into ``flagged``."""
    if name in EXPECTED_FLAGS:
        row["expected_flag"] = EXPECTED_FLAGS[name]
        expected.append(tier_key)
    else:
        flagged.append(tier_key)

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
    # round-8 (r7 verdict #3): the wave-8/9/10 tier — pair generators,
    # graph capstones, per-doc rewrites, in-plan linear algebra
    "hard_negatives",
    "golden_records",
    "entity_resolution",
    "span_corruption",
    "rake_keyphrases",
    "pca_power_iteration",
    "bitext_margin_pairs",
    "rfm_segments",
    # round-8 waves 11-19: grouped-rank consumers, pair/graph tiers,
    # in-plan training loops, fold recurrences, wide bootstrap aggs
    "stopword_discovery",
    "contrastive_positives",
    "source_dedup_funnel",
    "dup_graph_transitivity",
    "term_burstiness",
    "epoch_shuffle_audit",
    "vocab_coverage_curve",
    "logistic_quality_gd",
    "bpe_merge_learning",
    "kaplan_meier_shipping",
    "bootstrap_mean_ci",
    # r9: unigram-LM trainer (wave 23)
    "unigram_vocab",
    "unigram_fertility",
    # r9: A/B tier II (wave 26) — per-arm rank machinery
    "quantile_treatment_effect",
    # r10 (r9 verdict ask #2): the unladdered r9 tier — the corpus-
    # scale unigram joinback, the EM curve, and the remaining A/B-II
    # readouts (per-user groupBy + bounded-domain combines)
    "unigram_doc_nll",
    "unigram_em_curve",
    "srm_check",
    "post_stratified_effect",
    "ab_power_grid",
    # r10 waves 28-29: retrieval fusion + the robust/sequential A/B
    # tier + the dedup-threshold planning sweep
    "hybrid_rrf_topk",
    "retrieval_rank_agreement",
    "srm_by_segment",
    "trimmed_mean_effect",
    "group_sequential_check",
    "dedup_threshold_sweep",
    # r11 wave 30: the stored-tokenizer apply (reads the persisted
    # snapshot, not training lineage)
    "unigram_doc_nll_stored",
    # r12 wave 32: the cluster-gated SemDedup and its recall audit
    "semantic_dedup_clustered",
    "cluster_gate_recall",
    # r12 wave 33: gate observability + paper keep policy + sweep
    "ivf_cell_profile",
    "semantic_dedup_diverse",
    "ivf_threshold_sweep",
    # r13 waves 34-36: the two-level assignment, its cost profile,
    # the paper-regime recall audits, and the auto front door
    "semantic_dedup_2l",
    "ivf_assign_profile",
    "planted_ivf_recall",
    "minhash_gate_recall",
    "semantic_dedup_auto",
    "planted_minhash_recall",
]

#: sf0.1 → sf1 tier (r6 verdict #6): the expensive tail measured over
#: ANOTHER 10x of data, where super-linear behavior hides least. The
#: sf1 fixture is synthesized once from the sf0.1 tables (see
#: ensure_sf1): 10 replicas with fresh keys, texts made
#: cross-replica-DISSIMILAR by a per-replica token suffix and
#: embeddings by a per-replica random-sign isometry (intra-replica
#: geometry exactly preserved, cross-replica similarity destroyed) —
#: so the pair/ANN workload scales LINEARLY by construction and any
#: super-linear time is the operator's own doing.
SF1_DIR = "/root/repo/.tmp_sf1"
SF1_QUERIES = [
    "simhash_pairs",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "prefix_jaccard_pairs",
    "winnowing_pairs",
    "edit_distance_pairs",
    "duplicated_spans",
    "dedup_clusters",
    "semantic_dedup",
    "ivf_pq_topk",
    "dsir_selection",
    "greedy_pack",
    "perplexity_buckets",
    "bm25_topk",
    "media_jpeg_pixels",
    "media_dedup_survivors",
    "pretrain_pipeline",
    "equidepth_histogram",
    # r8: wave-8/9/10 tier over another 10x (part/orders fixtures added)
    "hard_negatives",
    "golden_records",
    "entity_resolution",
    "span_corruption",
    "rake_keyphrases",
    "pca_power_iteration",
    "bitext_margin_pairs",
    "rfm_segments",
    # r9 (verdict ask #2): the last near-band sf0.1 query without an
    # sf1 rung (reads orders — already in the fixture); plus the new
    # unigram trainer over 10x the word distribution
    "bootstrap_mean_ci",
    "unigram_vocab",
    # r10 (r9 verdict ask #2): the corpus-scale unigram joinback and
    # the per-arm rank machinery over 10x users (events fixture added
    # to ensure_sf1); golden_records re-laddered on the r10 per-block
    # union-find CC
    "unigram_doc_nll",
    "quantile_treatment_effect",
    # r10 waves 28-29: the gated-pair sweep (the one new query whose
    # cost grows with the pair population) + the per-user A/B readouts
    # over 10x users + the fusion composite over 10x docs/vectors
    "dedup_threshold_sweep",
    "trimmed_mean_effect",
    "hybrid_rrf_topk",
    # r11 (r10 verdict ask #7): the remaining r10 rows with only an
    # sf0.1 reading — the per-segment distinct set, the K-fold look
    # explosion, and the bounded-frame tau audit over 10x inputs
    "srm_by_segment",
    "group_sequential_check",
    "retrieval_rank_agreement",
    # r11 wave 30
    "unigram_doc_nll_stored",
    # r12 (r11 verdict ask #5): the composed capstone without an sf1
    # rung (pretrain_pipeline already has one) — prove the composed
    # plan doesn't multiply its stages' shuffles
    "training_corpus",
    # r12 wave 32: the cluster-gated SemDedup over 10x vectors
    "semantic_dedup_clustered",
    # r12 wave 33: the cluster-gated sweep (the banded sweep's
    # bounded-volume answer) and the IVF observability row
    "ivf_threshold_sweep",
    # r13: the two-level assignment + its exact cosine-count profile
    # (the NOTES #75(a) third-decade measurement) + the front door
    "semantic_dedup_2l",
    "ivf_assign_profile",
    "semantic_dedup_auto",
]

#: sf1 → sf10 tier (r10 verdict ask #2): DIRECT second-decade
#: evidence for the three operators the r10 ladder showed costliest.
#: Both rungs of each ratio are measured in FRESH PROCESSES
#: (tools/fresh_query_time.py), so the committed absolutes are
#: process-clean by construction — no in-session/fresh cross-check
#: needed for this tier. The sf10 fixture replicates the sf1 fixture
#: 10x with the same cross-replica-dissimilarity construction
#: (per-replica token suffixes / sign isometries), so the workload
#: scales linearly BY CONSTRUCTION and any super-linear time is the
#: operator's own.
SF10_DIR = "/root/repo/.tmp_sf10"
SF10_QUERIES = [
    "hard_negatives",
    "semantic_dedup",
    "prefix_jaccard_pairs",
    # r12 (r11 verdict ask #3): the worst sf1 ratios still unmeasured
    # at sf10 — winnowing (HOF sliding-min floor), the gated-pair
    # sweep, the CC capstone — plus the multimodal capstone
    "winnowing_pairs",
    "dedup_threshold_sweep",
    "dedup_clusters",
    "media_dedup_survivors",
    # r12 wave 32 (r11 verdict ask #1): the cluster-gated SemDedup's
    # second decade — the rung built to clear the r11 flag
    "semantic_dedup_clustered",
    # r12 wave 33: the bounded-volume sweep next to the flagged
    # banded one — same readout, cluster-gated pair population
    "ivf_threshold_sweep",
    # r13 (r12 verdict asks #1/#3): the two-level assignment's second
    # decade (the rung the n^1.25 shape was built for), the exact
    # cosine-count profile at 200k vectors, and the front door's
    # default path measured unflagged at scale
    "semantic_dedup_2l",
    "ivf_assign_profile",
    "semantic_dedup_auto",
    # r13 (r12 verdict ask #4): the remaining heavy tail's second
    # decade — worst unmeasured sf1 ratios + both composed capstones
    "rake_keyphrases",
    "edit_distance_pairs",
    "pretrain_pipeline",
    "training_corpus",
]


def ensure_sf1(spark) -> None:
    """Synthesize the sf1 fixture (documents/embeddings/lineitem) from
    sf0.1 if not already on disk. Deterministic (md5-derived signs,
    fixed suffixes) — rebuilding yields byte-identical content."""
    import hashlib

    from pyspark.sql import functions as F

    from pasta_pipeline_spark.schemas import load_table

    # all fixture tables present (r8 added part/orders — an old dir
    # missing them rebuilds everything; synthesis is deterministic)
    if all(
        os.path.isdir(os.path.join(SF1_DIR, f"{t}.parquet"))
        or os.path.isfile(os.path.join(SF1_DIR, f"{t}.parquet"))
        for t in ("documents", "embeddings", "lineitem", "part", "orders", "events")
    ):
        return
    os.makedirs(SF1_DIR, exist_ok=True)
    n_rep, dim = 10, 64

    docs = load_table(spark, SF_BIG, "documents")
    parts = []
    for k in range(n_rep):
        d = docs.select(
            (F.col("doc_id") + F.lit(k * 5000)).alias("doc_id"),
            # replica 0 keeps the original text; others suffix EVERY
            # token so no shingle matches across replicas
            (
                F.col("text")
                if k == 0
                else F.regexp_replace(F.col("text"), r"(\S+)", rf"$1x{k}")
            ).alias("text"),
            "lang", "source", "n_chars",
        )
        parts.append(d)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.mode("overwrite").parquet(
        os.path.join(SF1_DIR, "documents.parquet")
    )

    emb = load_table(spark, SF_BIG, "embeddings")
    parts = []
    for k in range(n_rep):
        if k == 0:
            e = emb
        else:
            signs = [
                1 if int(hashlib.md5(f"sf1_{k}_{i}".encode()).hexdigest()[0], 16) % 2 == 0
                else -1
                for i in range(dim)
            ]
            sign_arr = F.array(*[F.lit(float(s)) for s in signs])
            e = emb.select(
                "vec_id",
                F.zip_with(
                    F.col("embedding"), sign_arr, lambda a, b: (a * b).cast("float")
                ).alias("embedding"),
                "label",
            )
        parts.append(
            e.select((F.col("vec_id") + F.lit(k * 2000)).alias("vec_id"),
                     "embedding", "label")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(16).write.mode("overwrite").parquet(
        os.path.join(SF1_DIR, "embeddings.parquet")
    )

    li = load_table(spark, SF_BIG, "lineitem")
    parts = [
        li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(k * 150000))
        for k in range(n_rep)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.mode("overwrite").parquet(
        os.path.join(SF1_DIR, "lineitem.parquet")
    )

    # part (r8, entity-resolution tier): fresh keys per replica, and
    # every p_name token suffixed (the documents recipe) so the
    # (noun, brand) blocking key never crosses replicas — block sizes
    # stay constant as data grows, which keeps the linkage workload
    # linear BY CONSTRUCTION; super-linear time is then the operator's
    part = load_table(spark, SF_BIG, "part")
    parts = []
    for k in range(n_rep):
        p = part.withColumn("p_partkey", F.col("p_partkey") + F.lit(k * 20000))
        if k > 0:
            p = p.withColumn(
                "p_name", F.regexp_replace(F.col("p_name"), r"(\S+)", rf"$1x{k}")
            )
        parts.append(p)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(16).write.mode("overwrite").parquet(
        os.path.join(SF1_DIR, "part.parquet")
    )

    # orders (r8, RFM tier): fresh order AND customer keys per replica
    # — 10x customers with unchanged per-customer history, the linear
    # scale-up shape for a customer-dimension rollup
    orders = load_table(spark, SF_BIG, "orders")
    parts = [
        orders.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(k * 150000))
        .withColumn("o_custkey", F.col("o_custkey") + F.lit(k * 15000))
        for k in range(n_rep)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(16).write.mode("overwrite").parquet(
        os.path.join(SF1_DIR, "orders.parquet")
    )

    # events (r10, A/B-II tier): fresh event AND user keys per replica
    # — 10x users with unchanged per-user history, the linear shape
    # for per-user-groupBy readouts (SRM/QTE/post-strat); the md5 arm
    # map re-rolls per replica since the ids are new
    events = load_table(spark, SF_BIG, "events")
    parts = [
        events.withColumn("event_id", F.col("event_id") + F.lit(k * 100000))
        .withColumn("user_id", F.col("user_id") + F.lit(k * 1500))
        for k in range(n_rep)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(16).write.mode("overwrite").parquet(
        os.path.join(SF1_DIR, "events.parquet")
    )


def ensure_sf10(spark) -> None:
    """Synthesize the sf10 fixture (documents/embeddings only — the
    SF10_QUERIES inputs) from the sf1 fixture: 10 more replicas with
    fresh keys, per-replica ``y{k}`` token suffixes (no shingle ever
    matches across replicas) and per-replica random-sign isometries
    (intra-replica geometry preserved, cross-replica similarity
    destroyed). Deterministic; rebuilding yields identical content."""
    import hashlib

    from pyspark.sql import functions as F

    from pasta_pipeline_spark.schemas import load_table

    if all(
        os.path.isdir(os.path.join(SF10_DIR, f"{t}.parquet"))
        for t in ("documents", "embeddings")
    ):
        return
    ensure_sf1(spark)
    os.makedirs(SF10_DIR, exist_ok=True)
    n_rep, dim = 10, 64

    docs = load_table(spark, SF1_DIR, "documents")
    parts = []
    for k in range(n_rep):
        d = docs.select(
            (F.col("doc_id") + F.lit(k * 50000)).alias("doc_id"),
            (
                F.col("text")
                if k == 0
                else F.regexp_replace(F.col("text"), r"(\S+)", rf"$1y{k}")
            ).alias("text"),
            "lang", "source", "n_chars",
        )
        parts.append(d)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(64).write.mode("overwrite").parquet(
        os.path.join(SF10_DIR, "documents.parquet")
    )

    emb = load_table(spark, SF1_DIR, "embeddings")
    parts = []
    for k in range(n_rep):
        if k == 0:
            e = emb
        else:
            signs = [
                1
                if int(hashlib.md5(f"sf10_{k}_{i}".encode()).hexdigest()[0], 16) % 2
                == 0
                else -1
                for i in range(dim)
            ]
            sign_arr = F.array(*[F.lit(float(s)) for s in signs])
            e = emb.select(
                "vec_id",
                F.zip_with(
                    F.col("embedding"), sign_arr, lambda a, b: (a * b).cast("float")
                ).alias("embedding"),
                "label",
            )
        parts.append(
            e.select((F.col("vec_id") + F.lit(k * 20000)).alias("vec_id"),
                     "embedding", "label")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.mode("overwrite").parquet(
        os.path.join(SF10_DIR, "embeddings.parquet")
    )


def sf10_only(out_path: str) -> None:
    """Re-run ONLY the sf1→sf10 fresh-process tier and merge into an
    existing artifact (r12: two sf10 rungs changed mid-round — the
    media CC star-reduction fix and the new cluster-gated sweep — and
    re-running the full 2-hour ladder to refresh an independent,
    fresh-process-by-construction tier would measure nothing new in
    the other tiers). Every rung still runs in brand-new JVMs via
    fresh_query_time.py; the artifact records the regeneration."""
    import subprocess

    with open(out_path, encoding="utf-8") as f:
        doc = json.load(f)

    from pasta_pipeline_spark.session import get_spark

    spark = get_spark("scale-ladder-sf10")
    spark.sparkContext.setLogLevel("ERROR")
    ensure_sf10(spark)

    def fresh_time(name: str, sf_dir: str, runs: int, timeout: int) -> float:
        out = subprocess.run(
            [
                sys.executable,
                os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "fresh_query_time.py"),
                name, sf_dir, str(runs),
            ],
            capture_output=True, text=True, timeout=timeout, check=True,
        )
        return float(json.loads(out.stdout.strip().splitlines()[-1])["best_sec"])

    sf10_report: dict = {}
    flagged = [
        f for f in doc.get("flagged", [])
        if not f.startswith("sf10:") and not f.startswith("sf10-failed:")
    ]
    expected = [
        f for f in doc.get("expected_flags", []) if not f.startswith("sf10:")
    ]
    for name in SF10_QUERIES:
        try:
            t_sf1 = fresh_time(name, SF1_DIR, 2, 900)
            t_sf10 = fresh_time(name, SF10_DIR, 2, 3600)
            ratio = round(t_sf10 / t_sf1, 2) if t_sf1 > 0 else None
            flag = bool(
                ratio is not None
                and t_sf10 >= MIN_BIG_SEC
                and ratio > FLAG_FACTOR * DATA_RATIO
            )
            sf10_report[name] = {
                "t_sf1_fresh": round(t_sf1, 3),
                "t_sf10_fresh": round(t_sf10, 3),
                "ratio": ratio,
                "flag": flag,
            }
            if flag:
                _flag_dest(
                    f"sf10:{name}", name, sf10_report[name], flagged, expected
                )
            print(
                f"sf10 {name}: {t_sf1:.3f}s -> {t_sf10:.3f}s  ratio {ratio}"
                f"{'  ** SUPER-LINEAR **' if flag else ''}",
                file=sys.stderr,
            )
        except Exception as exc:
            sf10_report[name] = {"error": str(exc)}
            flagged.append(f"sf10-failed:{name}")
    doc["queries_sf10"] = sf10_report
    doc["flagged"] = flagged
    doc["expected_flags"] = expected
    doc.setdefault("notes", {})["sf10_regenerated"] = (
        "sf10 tier re-run (fresh-process both rungs, one query per new "
        "JVM) after mid-round fixes; the sf0.01/0.1 and sf1 tiers are "
        "from the full-ladder run of the same round."
    )
    with open(out_path, "w", encoding="utf-8") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    print(json.dumps(doc))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--sf10-only":
        sf10_only(sys.argv[2] if len(sys.argv) > 2 else "SCALELADDER.json")
        return
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
        # drop any cache a query persisted without registering deps —
        # the r9 run showed late sf1-tier readings inflating >10x from
        # accumulated session state in one long driver JVM (both sides
        # of a ratio inflate together, but absolutes go misleading)
        spark.catalog.clearCache()
        return best

    # untimed warmup at the smallest sf: JIT/codegen + Python workers
    warm_sf = "/root/testdata/sf0.001"
    for name in QUERIES:
        df = qs[name](spark, warm_sf)
        df.write.format("noop").mode("overwrite").save()
        release_cached_deps(df)

    report: dict = {}
    flagged: list[str] = []
    expected: list[str] = []
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
            _flag_dest(name, name, report[name], flagged, expected)
        print(
            f"{name}: {t_small:.3f}s -> {t_big:.3f}s  ratio {ratio}"
            f"{'  ** SUPER-LINEAR **' if flag else ''}",
            file=sys.stderr,
        )

    # sf0.1 → sf1 tier over the expensive tail
    ensure_sf1(spark)
    sf1_report: dict = {}
    for name in SF1_QUERIES:
        t_mid = run(name, SF_BIG)
        t_big = run(name, SF1_DIR)
        ratio = round(t_big / t_mid, 2) if t_mid > 0 else None
        flag = bool(
            ratio is not None
            and t_big >= MIN_BIG_SEC
            and ratio > FLAG_FACTOR * DATA_RATIO
        )
        sf1_report[name] = {
            "t_sf0_1": round(t_mid, 3),
            "t_sf1": round(t_big, 3),
            "ratio": ratio,
            "flag": flag,
        }
        if flag:
            _flag_dest(f"sf1:{name}", name, sf1_report[name], flagged, expected)
        print(
            f"sf1 {name}: {t_mid:.3f}s -> {t_big:.3f}s  ratio {ratio}"
            f"{'  ** SUPER-LINEAR **' if flag else ''}",
            file=sys.stderr,
        )

    # fresh-process cross-check (r9 verdict ask #1): the 3 slowest sf1
    # rungs re-measured in brand-new JVMs; committed absolutes must
    # match fresh-process numbers within ~1.5x or the in-session
    # reading is JVM-state-inflated and the artifact must not ship
    import subprocess

    slowest = sorted(
        sf1_report.items(), key=lambda kv: kv[1]["t_sf1"], reverse=True
    )[:3]
    fresh_checks: dict = {}
    for name, row in slowest:
        try:
            out = subprocess.run(
                [
                    sys.executable,
                    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "fresh_query_time.py"),
                    name,
                    SF1_DIR,
                    "2",
                ],
                capture_output=True, text=True, timeout=900, check=True,
            )
            fresh = json.loads(out.stdout.strip().splitlines()[-1])
            ratio_vs_fresh = (
                round(row["t_sf1"] / fresh["best_sec"], 2)
                if fresh["best_sec"] > 0
                else None
            )
            fresh_checks[name] = {
                "t_sf1_in_session": row["t_sf1"],
                "t_sf1_fresh_process": fresh["best_sec"],
                "in_session_over_fresh": ratio_vs_fresh,
            }
            if ratio_vs_fresh is not None and ratio_vs_fresh > 1.5:
                flagged.append(f"stale-absolute:{name}")
            print(
                f"fresh-process {name}: in-session {row['t_sf1']:.2f}s vs "
                f"fresh {fresh['best_sec']:.2f}s (x{ratio_vs_fresh})",
                file=sys.stderr,
            )
        except Exception as exc:  # record, don't hide
            fresh_checks[name] = {"error": str(exc)}
            flagged.append(f"fresh-check-failed:{name}")

    # sf1 → sf10 tier (r10 verdict ask #2): both rungs fresh-process,
    # one query per brand-new JVM, so the committed absolutes are
    # process-clean by construction.
    ensure_sf10(spark)
    sf10_report: dict = {}

    def fresh_time(name: str, sf_dir: str, runs: int, timeout: int) -> float:
        out = subprocess.run(
            [
                sys.executable,
                os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "fresh_query_time.py"),
                name, sf_dir, str(runs),
            ],
            capture_output=True, text=True, timeout=timeout, check=True,
        )
        return float(json.loads(out.stdout.strip().splitlines()[-1])["best_sec"])

    for name in SF10_QUERIES:
        try:
            t_sf1 = fresh_time(name, SF1_DIR, 2, 900)
            t_sf10 = fresh_time(name, SF10_DIR, 2, 3600)
            ratio = round(t_sf10 / t_sf1, 2) if t_sf1 > 0 else None
            flag = bool(
                ratio is not None
                and t_sf10 >= MIN_BIG_SEC
                and ratio > FLAG_FACTOR * DATA_RATIO
            )
            sf10_report[name] = {
                "t_sf1_fresh": round(t_sf1, 3),
                "t_sf10_fresh": round(t_sf10, 3),
                "ratio": ratio,
                "flag": flag,
            }
            if flag:
                _flag_dest(
                    f"sf10:{name}", name, sf10_report[name], flagged, expected
                )
            print(
                f"sf10 {name}: {t_sf1:.3f}s -> {t_sf10:.3f}s  ratio {ratio}"
                f"{'  ** SUPER-LINEAR **' if flag else ''}",
                file=sys.stderr,
            )
        except Exception as exc:  # record, don't hide
            sf10_report[name] = {"error": str(exc)}
            flagged.append(f"sf10-failed:{name}")

    doc = {
        "fresh_process_crosscheck": fresh_checks,
        "queries_sf10": sf10_report,
        "notes": {
            "sf1_auto_lsh": (
                "The r8 *_recalibrated side-rows are gone because the "
                "growth recipe is now the DEFAULT (r8 verdict ask #1): "
                "hard_negatives/semantic_dedup/bitext/cross-corpus "
                "resolve (planes, bands) from the corpus size via "
                "similarity.auto_lsh_config (planes += round(log2("
                "n/2000)), bands double per 2 extra planes), so the "
                "catalog rows above already measure the auto-calibrated "
                "plan at every sf. At the oracle gate scales auto "
                "resolves to the former fixed configs exactly."
            ),
        },
        "sf_small": 0.01,
        "sf_big": 0.1,
        "data_ratio": DATA_RATIO,
        "flag_factor": FLAG_FACTOR,
        "min_big_sec": MIN_BIG_SEC,
        "queries": report,
        "queries_sf1": sf1_report,
        "flagged": flagged,
        "expected_flags": expected,
    }
    with open(out_path, "w", encoding="utf-8") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    print(json.dumps(doc))


if __name__ == "__main__":
    main()
