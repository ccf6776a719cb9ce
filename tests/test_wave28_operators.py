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
