"""Wave 28 (r10): hybrid RRF retrieval, segment-level SRM, and the
trimmed-mean treatment effect. The DuckDB hash parity runs in the
oracle gate; these pin the operator semantics."""

from __future__ import annotations

import datetime as dt
import hashlib

from pyspark.sql import functions as F


def _arm(u):
    return int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16) % 2


def test_hybrid_rrf_fuses_both_lists(spark):
    """A doc at the top of BOTH rankings must out-fuse docs that lead
    only one list; docs present in a single list still appear with the
    absent side contributing zero (the standard RRF convention); the
    fused score is the exact integer-division sum of the rank terms."""
    from pasta_pipeline_spark.operators.search import (
        RRF_K,
        RRF_SCALE,
        hybrid_rrf_topk,
    )

    docs = spark.createDataFrame(
        [
            (1, "spark join window spark join window spark"),
            (2, "spark join window"),
            (3, "join window"),
            (4, "nothing relevant here at all"),
            (5, "spark spark spark join join window window"),
        ],
        "doc_id long, text string",
    )
    # embeddings: vec 1 IS the query (lowest id); vec 2 nearly equal,
    # vec 4 similar, vec 3 orthogonal-ish, vec 5 opposite
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.5, 0.0]),
            (2, [0.99, 0.01, 0.5, 0.0]),
            (3, [0.0, 1.0, 0.0, 0.2]),
            (4, [0.9, 0.1, 0.45, 0.05]),
            (5, [-1.0, 0.0, -0.5, 0.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    rows = hybrid_rrf_topk(
        docs, emb, ["spark", "join", "window"], k=5, n_deep=4
    ).collect()
    by_id = {r["doc_id"]: r for r in rows}
    # doc 4 has no query term: lexical rank NULL, semantic rank only
    assert by_id[4]["lex_rank"] is None and by_id[4]["sem_rank"] is not None
    # every fused score replays the integer-division formula exactly
    for r in rows:
        want = 0
        for rank in (r["lex_rank"], r["sem_rank"]):
            if rank is not None:
                want += RRF_SCALE // (RRF_K + rank)
        assert r["rrf_fp"] == want
    # the doc leading both lists fuses above single-list leaders
    top = rows[0]
    assert top["lex_rank"] is not None and top["sem_rank"] is not None
    # determinism
    again = hybrid_rrf_topk(
        docs, emb, ["spark", "join", "window"], k=5, n_deep=4
    ).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]


def test_srm_by_segment_flags_only_the_broken_segment(spark):
    """A global-SRM-passing population with ONE segment whose arm-0
    users are filtered out (the segment-scoped logging-bug shape):
    only that segment flags."""
    from pasta_pipeline_spark.operators.abtest2 import srm_by_segment

    rows, eid = [], 0
    for u in range(1, 401):
        eid += 1
        rows.append((eid, dt.datetime(2024, 1, 10, 12), u, "ok_seg", 1.0))
        # the broken segment drops control users
        if _arm(u) == 1 or u <= 12:
            eid += 1
            rows.append((eid, dt.datetime(2024, 1, 11, 12), u, "bad_seg", 1.0))
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    rep = {r["segment"]: r for r in srm_by_segment(ev).collect()}
    assert not rep["ok_seg"]["srm_flag"]
    assert rep["bad_seg"]["srm_flag"]
    # user counts: segment-exposed distinct users
    assert rep["ok_seg"]["n_users"] == 400
    assert rep["bad_seg"]["n_ctrl"] <= 12


def test_trimmed_mean_kills_the_whale(spark):
    """Zero true effect plus one whale user in the treatment arm: the
    raw mean diff is whale-dominated, the 5% trimmed diff is not; the
    trim counts g = floor(n * 0.05) per arm."""
    from pasta_pipeline_spark.operators.abtest2 import trimmed_mean_effect

    rows, eid = [], 0
    whale = next(u for u in range(1, 500) if _arm(u) == 1)
    for u in range(1, 401):
        eid += 1
        v = 100.0 + (u % 7)
        if u == whale:
            v = 1_000_000.0
        rows.append((eid, dt.datetime(2024, 1, 10, 12), u, "t", v))
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    r = trimmed_mean_effect(ev).collect()[0]
    assert r["n_ctrl"] + r["n_treat"] == 400
    assert r["g_ctrl"] == r["n_ctrl"] * 5 // 100
    assert r["g_treat"] == r["n_treat"] * 5 // 100
    # trimmed diff reads near zero (value scale 100, report scale 1e4:
    # 1 value unit = 1e6); the whale would have added ~5e9 per treat user
    assert abs(r["tdiff_sc"]) < 5_000_000  # < 5 value units
    # and the whale is really gone: treat mean within a few units of 100
    assert abs(r["tmean_treat_sc"] - 100 * 100 * 10_000) < 10 * 100 * 10_000


def test_trimmed_mean_fails_closed_when_trim_consumes_arm(spark):
    """n − 2g <= 0 (a tiny arm under an aggressive trim) nulls the
    mean instead of dividing by zero or emitting nonsense."""
    from pasta_pipeline_spark.operators.abtest2 import trimmed_mean_effect

    u0 = [u for u in range(1, 100) if _arm(u) == 0][:2]
    u1 = [u for u in range(1, 100) if _arm(u) == 1][:2]
    rows = [
        (i + 1, dt.datetime(2024, 1, 10, 12), u, "t", 10.0 + i)
        for i, u in enumerate(u0 + u1)
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    r = trimmed_mean_effect(ev, trim_num=50, trim_den=100).collect()[0]
    assert r["g_ctrl"] == 1 and r["g_treat"] == 1
    assert r["tmean_ctrl_sc"] is None
    assert r["tmean_treat_sc"] is None
    assert r["tdiff_sc"] is None


def test_rank_agreement_tau_extremes(spark):
    """Identical orderings give tau = +1e6; reversing one side gives
    -1e6; counts replay the Kendall definition exactly."""
    from pasta_pipeline_spark.operators.search import retrieval_rank_agreement

    # doc k repeats 'spark' (6-k) times => lexical order 1,2,3,4;
    # embeddings: doc k has cosine decreasing in k vs the query (id 1)
    docs = spark.createDataFrame(
        [
            (1, "spark spark spark spark spark"),
            (2, "spark spark spark spark pad"),
            (3, "spark spark spark pad pad"),
            (4, "spark spark pad pad pad"),
        ],
        "doc_id long, text string",
    )
    fwd = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.9, 0.1]),
            (3, [0.8, 0.3]),
            (4, [0.7, 0.6]),
        ],
        "vec_id long, embedding array<double>",
    )
    r = retrieval_rank_agreement(docs, fwd, ["spark"], n_deep=4).collect()[0]
    assert r["n_common"] == 4
    assert r["concordant"] == 6 and r["discordant"] == 0
    assert r["tau_sc"] == 1_000_000
    # reverse the semantic geometry (id 1 stays the query and its own
    # rank-1; the remaining 3 invert) — tau drops below zero
    rev = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.7, 0.6]),
            (3, [0.8, 0.3]),
            (4, [0.9, 0.1]),
        ],
        "vec_id long, embedding array<double>",
    )
    r2 = retrieval_rank_agreement(docs, rev, ["spark"], n_deep=4).collect()[0]
    # doc 1 (the query itself) still leads BOTH lists → its 3 pairs
    # stay concordant; the other 3 pairs invert → tau exactly 0
    assert r2["concordant"] == 3 and r2["discordant"] == 3
    assert r2["tau_sc"] == 0


def test_group_sequential_boundaries_and_crossing(spark):
    """Boundary constants replay obf_boundaries_sc (strictly decreasing
    in the look index), cumulative user counts are non-decreasing, the
    final look covers everyone, and a huge planted effect crosses by
    the final look while a zero-effect split does not cross anywhere."""
    from pasta_pipeline_spark.operators.abtest2 import (
        group_sequential_check,
        obf_boundaries_sc,
    )

    def events(shift):
        rows, eid = [], 0
        for day in range(1, 21):
            for u in range(1, 201):
                eid += 1
                v = 100.0 + (u % 9)
                if _arm(u) == 1:
                    v += shift
                rows.append((eid, dt.datetime(2024, 1, day, 12), u, "t", v))
        return spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double",
        )

    null_rows = group_sequential_check(events(0.0)).collect()
    bnd = obf_boundaries_sc(4)
    assert [r["boundary_sc"] for r in null_rows] == bnd
    assert bnd == sorted(bnd, reverse=True)
    ns = [r["n_users"] for r in null_rows]
    assert ns == sorted(ns) and ns[-1] == 200
    assert not any(r["crossed"] for r in null_rows)

    eff_rows = group_sequential_check(events(50.0)).collect()
    assert eff_rows[-1]["crossed"]


def test_threshold_sweep_histogram_accounting(spark):
    """The sweep's histogram totals the gated pair population exactly,
    the suffix-cumulative column replays it, and a planted near-dup
    pair lands in the top occupied bucket."""
    from pasta_pipeline_spark.operators.similarity import (
        cosine_dup_pairs,
        cosine_threshold_sweep,
    )

    import hashlib

    def u01(seed):
        return (
            int.from_bytes(hashlib.md5(seed.encode()).digest()[:8], "big") / 2**64
        )

    rows = [
        (i, [2.0 * u01(f"sw:{i}:{d}") - 1.0 for d in range(8)])
        for i in range(120)
    ]
    rows.append((500, [c * 1.5 + 1e-9 for c in rows[0][1]]))  # near-dup of 0
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    sweep = cosine_threshold_sweep(emb, dim=8, num_planes=4, num_bands=2).collect()
    n_pairs = {r["sim_bucket"]: r["n_pairs"] for r in sweep}
    total = sum(n_pairs.values())
    gated = cosine_dup_pairs(
        emb, -2.0, use_lsh=True, dim=8, num_planes=4, num_bands=2
    ).count()
    assert total == gated > 0
    # suffix-cumulative replays the histogram
    buckets = sorted(n_pairs, reverse=True)
    cum = {r["sim_bucket"]: r["cum_pairs_ge"] for r in sweep}
    run = 0
    for b in buckets:
        run += n_pairs[b]
        assert cum[b] == run
    # the planted ~cosine-1 pair sits in the top occupied bucket (19 or 20)
    assert max(buckets) >= 19
