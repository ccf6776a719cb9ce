"""Unit tests for deterministic sampling, sequence packing,
sessionization and funnels (the round-2 extension operators)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pasta_pipeline_spark.operators.sampling import (
    pack_sequences,
    sample_bucket,
    stratified_sample,
)
from pasta_pipeline_spark.operators.sessions import funnel_counts, session_stats


def test_stratified_sample_deterministic_and_weighted(spark):
    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(2000)], "id long, s string"
    )
    kept1 = stratified_sample(df, "id", {"a": 0.5}, strata_col="s", default_fraction=0.1)
    kept2 = stratified_sample(df, "id", {"a": 0.5}, strata_col="s", default_fraction=0.1)
    ids1 = sorted(r["id"] for r in kept1.collect())
    assert ids1 == sorted(r["id"] for r in kept2.collect())  # run-to-run stable
    by_s = {r["s"]: r["count"] for r in kept1.groupBy("s").count().collect()}
    # md5 buckets are uniform: 1000 draws land within loose binomial bounds
    assert 400 <= by_s["a"] <= 600
    assert 50 <= by_s.get("b", 0) <= 160


def test_stratified_sample_full_and_zero_fractions(spark):
    df = spark.createDataFrame([(i, "x") for i in range(100)], "id long, s string")
    assert stratified_sample(df, "id", {"x": 1.0}, strata_col="s").count() == 100
    assert stratified_sample(df, "id", {"x": 0.0}, strata_col="s").count() == 0
    # uniform float form
    n = stratified_sample(df, "id", 0.3).count()
    assert 15 <= n <= 45


def test_sample_bucket_matches_duckdb(spark):
    """The bucket function must be the exact md5-int60 the oracle uses."""
    import duckdb

    df = spark.range(50).select(F.col("id"), sample_bucket("id").alias("b"))
    got = {r["id"]: r["b"] for r in df.collect()}
    con = duckdb.connect()
    want = dict(
        con.execute(
            "SELECT i, ('0x' || substr(md5(CAST(i AS VARCHAR)), 1, 15))::BIGINT % 10000 "
            "FROM (SELECT unnest(generate_series(0, 49)) AS i)"
        ).fetchall()
    )
    assert got == want


def test_pack_sequences_layout(spark):
    # tokens: 300, 300, 300 → starts 0, 300, 600 with budget 512:
    # doc 1 starts in bin 0 and straddles (300..599 crosses 512);
    # doc 2 starts in bin 1; a zero-token doc occupies nothing.
    df = spark.createDataFrame(
        [(0, 300), (1, 300), (2, 300), (3, 0)], "id long, n long"
    )
    rows = {
        r["id"]: r
        for r in pack_sequences(df, "id", "n", budget=512).collect()
    }
    assert (rows[0]["start_offset"], rows[0]["bin"], rows[0]["crosses_boundary"]) == (0, 0, False)
    assert (rows[1]["start_offset"], rows[1]["bin"], rows[1]["crosses_boundary"]) == (300, 0, True)
    # doc 2 spans 600..899, fully inside bin 1 (512..1023) — no cross
    assert (rows[2]["start_offset"], rows[2]["bin"], rows[2]["crosses_boundary"]) == (600, 1, False)
    assert (rows[3]["start_offset"], rows[3]["bin"], rows[3]["crosses_boundary"]) == (900, 1, False)


def test_pack_sequences_partition_isolated(spark):
    df = spark.createDataFrame(
        [(0, "x", 500), (1, "x", 500), (2, "y", 500)], "id long, p string, n long"
    )
    rows = {
        r["id"]: r
        for r in pack_sequences(df, "id", "n", budget=512, partition_col="p").collect()
    }
    assert rows[2]["start_offset"] == 0  # y restarts its own stream
    assert rows[1]["start_offset"] == 500


def test_session_stats_gap_split(spark):
    base = 1_700_000_000
    rows = [
        # user 1: two events 10 min apart (one session), then a 2h gap
        (1, 1, base),
        (1, 2, base + 600),
        (1, 3, base + 600 + 7200),
        # user 2: single event
        (2, 4, base),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, sec long")
    got = {
        (r["user_id"], r["session_seq"]): r
        for r in session_stats(
            df, user_col="user_id", ts_col="sec",
            order_tiebreak="event_id", gap_minutes=30,
        ).collect()
    }
    assert got[(1, 1)]["n_events"] == 2
    assert got[(1, 1)]["duration_sec"] == 600
    assert got[(1, 2)]["n_events"] == 1
    assert got[(2, 1)]["n_events"] == 1
    assert len(got) == 3


def test_funnel_requires_strict_order(spark):
    rows = [
        # user 1 completes all three in order
        (1, "signup", 100), (1, "view", 200), (1, "purchase", 300),
        # user 2 viewed BEFORE signup → view doesn't count
        (2, "view", 50), (2, "signup", 100),
        # user 3 signup only
        (3, "signup", 10),
        # user 4 never signed up → counts nowhere
        (4, "view", 10), (4, "purchase", 20),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts long")
    out = funnel_counts(df, ["signup", "view", "purchase"], ts_col="ts").collect()[0]
    assert (out["n_step1"], out["n_step2"], out["n_step3"]) == (3, 1, 1)


# ---------------------------------------------------------------------------
# Document chunking (operators/chunking.py)
# ---------------------------------------------------------------------------


def test_chunk_documents_shapes(spark):
    from pasta_pipeline_spark.operators.chunking import chunk_documents

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g"),          # 7 tokens
            (2, "x y"),                    # shorter than one chunk
            (3, ""),                       # no tokens → no chunks
            (4, "   \n\t "),               # whitespace only → no chunks
        ],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, "doc_id", "text", chunk_size=4, stride=3)
    rows = {
        (r["doc_id"], r["chunk_idx"]): (r["start_token"], r["n_tokens"], r["chunk_text"])
        for r in out.collect()
    }
    # doc 1: starts at 1, 4, 7 (start <= n); last chunk is short
    assert rows[(1, 0)] == (1, 4, "a b c d")
    assert rows[(1, 1)] == (4, 4, "d e f g")
    assert rows[(1, 2)] == (7, 1, "g")
    assert rows[(2, 0)] == (1, 2, "x y")
    assert {k[0] for k in rows} == {1, 2}


def test_chunk_documents_no_overlap_default_covers_exactly(spark):
    from pasta_pipeline_spark.operators.chunking import chunk_documents

    docs = spark.createDataFrame([(1, " ".join(str(i) for i in range(12)))],
                                 "doc_id long, text string")
    out = chunk_documents(docs, "doc_id", "text", chunk_size=4).collect()
    # 12 tokens, size=stride=4 → 3 full chunks, every token exactly once
    assert [r["n_tokens"] for r in sorted(out, key=lambda r: r["chunk_idx"])] == [4, 4, 4]
    all_tokens = " ".join(
        r["chunk_text"] for r in sorted(out, key=lambda r: r["chunk_idx"])
    ).split()
    assert all_tokens == [str(i) for i in range(12)]
