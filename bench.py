"""Benchmark harness — runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {"<name>": sec, ...},
     "queries_median": {"<name>": sec, ...}, "sf": <sf>}

Each query is materialized with the noop sink (full execution, no
driver-side row materialization cost), after one small untimed warmup
to absorb JVM/codegen startup.

Comparability protocol (r6 verdict #4): every query runs N=3 timed
iterations; ``queries`` carries the per-query MIN (steady-state cost,
the headline and the total) and ``queries_median`` the median
(noise-floor visibility). Round-over-round comparisons should read
min-vs-min — single-reading swings of ±1.5 s on the pair tiers were
pure machine state in r5/r6.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

N_ITER = 3

#: idle-box gate (r8 verdict ask #3): the committed BENCH artifact was
#: load-polluted two rounds running (r7 silently, r8 with load_avg 5.17
#: recorded).  Recording the load was not enough — the tooling now
#: REFUSES to emit an artifact on a busy box instead of warning.
MAX_LOAD = float(os.environ.get("SPARK_GRAFT_MAX_LOAD", "2.0"))
IDLE_MAX_WAIT_SEC = float(os.environ.get("SPARK_GRAFT_IDLE_MAX_WAIT", "900"))
IDLE_POLL_SEC = float(os.environ.get("SPARK_GRAFT_IDLE_POLL", "20"))

#: Throughput-stability probe (r11 verdict ask #2): load average cannot
#: see a sagged box — after the r11 sf10 campaign, per-core throughput
#: sat ~1.9x low for ~20 min at load 0.03 (NOTES #67a) and the
#: committed BENCH_r11 drifted +15-25% on UNTOUCHED queries. So after
#: warmup the harness runs a pinned probe query (pricing_summary — a
#: pure scan+group-agg with no pair tiers, untouched since r4) and
#: refuses to emit an artifact until its min-of-3 lands within
#: PROBE_FACTOR of the committed reference time. The reference is the
#: median of the r10-r12 idle-box mins (0.257/0.277/0.295-0.315 s);
#: the factor is sized to refuse the documented ~1.9x sag class
#: decisively while tolerating the ~10% baseline drift the same box
#: showed across rounds (budget 0.375 s vs the sagged 0.49 s reading).
#: Re-pin the reference if the query or the fixture changes shape.
#: The probe ALWAYS runs against the pinned sf0.1 fixture regardless of
#: SPARK_GRAFT_SF_DIR (r12 advisor: the reference is an sf0.1 reading,
#: so a bench run at any other scale factor must not compare its own
#: sf's probe time against it — the gate compares like for like now).
PROBE_QUERY = "pricing_summary"
PROBE_SF_DIR = os.environ.get("SPARK_GRAFT_PROBE_SF_DIR", "/root/testdata/sf0.1")
PROBE_REF_SEC = float(os.environ.get("SPARK_GRAFT_PROBE_REF", "0.30"))
PROBE_FACTOR = float(os.environ.get("SPARK_GRAFT_PROBE_FACTOR", "1.25"))
PROBE_MAX_ATTEMPTS = int(os.environ.get("SPARK_GRAFT_PROBE_ATTEMPTS", "10"))
PROBE_RETRY_SLEEP_SEC = float(os.environ.get("SPARK_GRAFT_PROBE_SLEEP", "60"))


def wait_for_stable_throughput(
    run_probe,
    ref_sec: float = None,
    factor: float = None,
    max_attempts: int = None,
    retry_sleep: float = None,
    sleep=time.sleep,
    log=lambda msg: print(msg, file=sys.stderr),
) -> float:
    """Block until ``run_probe()`` (returns the probe's min-of-N
    seconds) lands within ``factor`` of ``ref_sec``.

    Same retry-then-refuse contract as :func:`wait_for_idle`: at most
    ``max_attempts`` probe runs, sleeping ``retry_sleep`` between
    them; if the box never stabilizes, raises ``SystemExit(3)``
    WITHOUT printing the stdout JSON line. ``SPARK_GRAFT_FORCE_BENCH=1``
    overrides (the measured probe time lands in the artifact's
    ``probe_sec`` field either way, so a forced artifact carries its
    own health reading). Returns the passing (or forced) probe time.
    """
    ref_sec = PROBE_REF_SEC if ref_sec is None else ref_sec
    factor = PROBE_FACTOR if factor is None else factor
    max_attempts = PROBE_MAX_ATTEMPTS if max_attempts is None else max_attempts
    retry_sleep = PROBE_RETRY_SLEEP_SEC if retry_sleep is None else retry_sleep
    forced = os.environ.get("SPARK_GRAFT_FORCE_BENCH") == "1"
    budget = ref_sec * factor
    t = None
    for attempt in range(1, max_attempts + 1):
        t = run_probe()
        if t <= budget or forced:
            if t > budget:
                log(
                    f"FORCED past throughput probe: {PROBE_QUERY} "
                    f"{t:.3f}s > budget {budget:.3f}s"
                )
            return round(t, 3)
        log(
            f"throughput probe {attempt}/{max_attempts}: {PROBE_QUERY} "
            f"{t:.3f}s > budget {budget:.3f}s ({factor}x of {ref_sec}s) — "
            f"box is sagged, sleeping {int(retry_sleep)}s"
        )
        if attempt < max_attempts:
            sleep(retry_sleep)
    log(
        f"REFUSED: {PROBE_QUERY} still {t:.3f}s > {budget:.3f}s after "
        f"{max_attempts} probes — not emitting a bench artifact from a "
        "throughput-sagged box (set SPARK_GRAFT_FORCE_BENCH=1 to override)"
    )
    raise SystemExit(3)


def wait_for_idle(
    threshold: float = None,
    max_wait: float = None,
    poll: float = None,
    getloadavg=os.getloadavg,
    sleep=time.sleep,
    log=lambda msg: print(msg, file=sys.stderr),
) -> float:
    """Block until the 1-min load average drops to ``threshold``.

    Retry-until-idle, then refuse: polls every ``poll`` seconds for up
    to ``max_wait`` seconds; if the box never goes idle, raises
    ``SystemExit(3)`` WITHOUT printing the stdout JSON line — so a
    driver capturing stdout gets no committable artifact from a
    polluted run. ``SPARK_GRAFT_FORCE_BENCH=1`` overrides (explicit,
    visible in the artifact's load_avg field).

    Returns the load average that passed the gate.
    """
    threshold = MAX_LOAD if threshold is None else threshold
    max_wait = IDLE_MAX_WAIT_SEC if max_wait is None else max_wait
    poll = IDLE_POLL_SEC if poll is None else poll
    forced = os.environ.get("SPARK_GRAFT_FORCE_BENCH") == "1"
    waited = 0.0
    load = round(getloadavg()[0], 2)
    while load > threshold and not forced:
        if waited >= max_wait:
            log(
                f"REFUSED: load_avg={load} still > {threshold} after "
                f"{int(waited)}s — not emitting a bench artifact from a "
                "loaded box (set SPARK_GRAFT_FORCE_BENCH=1 to override)"
            )
            raise SystemExit(3)
        log(
            f"waiting for idle box: load_avg={load} > {threshold} "
            f"(waited {int(waited)}s / max {int(max_wait)}s)"
        )
        sleep(poll)
        waited += poll
        load = round(getloadavg()[0], 2)
    return load

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

#: Headline queries: one per operator family that matters at scale.
BENCH_QUERIES = [
    "pricing_summary",         # scan + group-agg (codegen, partial agg)
    "join_agg_nation_revenue", # multi-join + broadcast dims
    "work_selection",          # distinct + anti-join + top-k
    "merge_upsert",            # union + window dedup (the custom operator)
    "keep_latest_dedup",       # window dedup
    "tumbling_window",         # event-time windows
    "orphan_rewrite",          # rewrite-on-join
    "dedup_exact",             # hash-groupBy dedup
    "cosine_topk",             # brute-force similarity
    "knn_join",                # k-NN join
    "lang_id",                 # text analysis expressions
    "media_features",          # Arrow-batched Python stage
]

#: r8 additions (verdict ask #4): the LLM-data tier now dominates the
#: catalog but the legacy headline set predates it — these three cover
#: its main shapes. Kept separate so the legacy total stays
#: round-over-round comparable.
BENCH_QUERIES_LLM = [
    "semantic_dedup",          # banded sign-LSH gate + exact cosine verify (auto-calibrated r9)
    "rfm_segments",            # range-partition ranks + closed-form ntile (wave-9 analytics)
    "pretrain_pipeline",       # composed capstone: filter+dedup+sample+pack
    "logistic_quality_gd",     # in-plan GD training: 5 unrolled full-scan steps (wave-16)
    "unigram_vocab",           # unigram-LM tokenizer training: Viterbi-EM folds (wave-23)
    "golden_records",          # linkage CC + survivorship: per-block union-find (r10)
    "hard_negatives",          # banded LSH gate + JL coarse prefilter + exact rerank (r11)
    "prefix_jaccard_pairs",    # PPJoin prefix filter + array-set verify (r11: was the
                               # slowest sf1 rung with no bench row — the golden_records
                               # invisibility lesson, applied before it bit twice)
    "semantic_dedup_clustered",  # k-means cluster gate (r12: the bounded-pair-volume
                                 # SemDedup — pays Lloyd's training at sf0.1 to bound
                                 # the second decade; see SCALELADDER sf10 tier)
    "semantic_dedup_2l",       # two-level (coarse-quantizer) assignment forced on
                               # (r13: the n^1.25 answer to the n^1.5 third-decade
                               # assignment term — see ivf_assign_profile)
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    # idle-machine protocol (r7 ask #7 recorded the load; r8 ask #3
    # enforces it): block until the box is idle, refuse if it never is.
    load_avg = wait_for_idle()

    from pasta_pipeline_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark("pasta-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()

    from pasta_pipeline_spark.operators.util import release_cached_deps

    def run(name: str, run_dir: str = None) -> list[float]:
        # N timed iterations: the first pays per-plan JIT/codegen and
        # page-cache warmup that a long-running cluster never sees per
        # query, so the MIN is the steady-state cost; the median shows
        # the noise floor. Cache releases happen after the timing loop
        # — identical logical plans share cache entries across
        # iterations, and that reuse is part of the steady state being
        # measured; the release only prevents storage accumulating
        # across *different* queries.
        samples = []
        dfs = []
        for _ in range(N_ITER):
            t0 = time.time()
            df = qs[name](spark, run_dir or sf_dir)
            df.write.format("noop").mode("overwrite").save()
            samples.append(time.time() - t0)
            dfs.append(df)
        for df in dfs:
            release_cached_deps(df)
        return samples

    # untimed warmups at the smallest sf: absorb JVM/JIT + codegen
    # startup, spin up the reusable Python workers (mapInPandas), and
    # compile every bench query's expression/shuffle paths — so the
    # timed sf0.1 runs measure the work, not first-call JIT (a
    # long-running cluster never pays per-query JIT either)
    warm_sf = "/root/testdata/sf0.001"
    qs["top_orders"](spark, sf_dir).collect()
    for warm in BENCH_QUERIES + BENCH_QUERIES_LLM + [
        "simhash_pairs", "ngram_jaccard_pairs", "minhash_lsh_pairs"
    ]:
        df = qs[warm](spark, warm_sf)
        df.write.format("noop").mode("overwrite").save()
        release_cached_deps(df)

    # throughput-stability gate (r11 verdict ask #2): after warmup —
    # so the probe measures the box, not first-call JIT — refuse to
    # proceed until the pinned probe's min-of-3 is within budget. The
    # probe runs against the PINNED sf0.1 fixture whatever sf_dir is
    # (the committed reference is an sf0.1 reading); the passing
    # reading lands in the artifact (probe_sec).
    probe_sec = wait_for_stable_throughput(
        lambda: min(run(PROBE_QUERY, PROBE_SF_DIR))
    )

    timings: dict[str, float] = {}
    medians: dict[str, float] = {}

    def record(name: str, samples: list[float]) -> None:
        timings[name] = round(min(samples), 3)
        medians[name] = round(statistics.median(samples), 3)

    for name in BENCH_QUERIES + BENCH_QUERIES_LLM:
        record(name, run(name))

    # Dedup tail on SHARED scans — a real pipeline tokenizes the
    # corpus once and derives every tier, so the bench does too: one
    # persisted (doc, toks) token table feeds SimHash (explode) and
    # the hashed shingle table (projection), which in turn feeds the
    # Jaccard and MinHash tiers. Both shared materializations are
    # their own timed line items (nothing is hidden); the per-query
    # numbers then measure each tier's own work. Same operator code
    # and parameters as the registered catalog queries (n=3, J>=0.5,
    # 64 hashes / 16 bands, hamming<=3).
    from pasta_pipeline_spark.operators.text_dedup import (
        _shingle_table,
        jaccard_pairs,
        minhash_lsh_pairs,
        simhash_pairs,
        token_table,
    )
    from pasta_pipeline_spark.schemas import load_table

    docs = load_table(spark, sf_dir, "documents")
    t0 = time.time()
    toks = token_table(docs, "doc_id", "text").persist()
    toks.write.format("noop").mode("overwrite").save()
    record("shared_token_scan", [time.time() - t0])
    t0 = time.time()
    sh = _shingle_table(docs, "doc_id", "text", 3, token_frame=toks).persist()
    sh.write.format("noop").mode("overwrite").save()
    record("shared_shingle_scan", [time.time() - t0])

    def run_shared(make) -> list[float]:
        samples = []
        for _ in range(N_ITER):
            t0 = time.time()
            make().write.format("noop").mode("overwrite").save()
            samples.append(time.time() - t0)
        return samples

    record(
        "simhash_pairs",
        run_shared(
            lambda: simhash_pairs(
                docs, "doc_id", "text", max_hamming=3, token_frame=toks
            )
        ),
    )
    record(
        "ngram_jaccard_pairs",
        run_shared(
            lambda: jaccard_pairs(
                docs, "doc_id", "text", n=3, threshold=0.5, shingle_table=sh
            )
        ),
    )
    record(
        "minhash_lsh_pairs",
        run_shared(
            lambda: minhash_lsh_pairs(
                docs,
                "doc_id",
                "text",
                n=3,
                num_hashes=64,
                bands=16,
                threshold=0.5,
                shingle_table=sh,
            ),
        ),
    )
    sh.unpersist()
    toks.unpersist()

    total = round(sum(timings.values()), 3)
    legacy_total = round(
        sum(v for k, v in timings.items() if k not in BENCH_QUERIES_LLM), 3
    )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "legacy_total": legacy_total,
                "unit": "sec",
                "queries": timings,
                "queries_median": medians,
                "n_iter": N_ITER,
                "load_avg": load_avg,
                "probe_sec": probe_sec,
                "probe_ref_sec": PROBE_REF_SEC,
                "probe_sf_dir": PROBE_SF_DIR,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
