"""chunk_manifest unit tests (exact boundaries, overlap, degenerate rows)."""

from __future__ import annotations

import pytest

from pasta_pipeline_spark.operators.multimodal import chunk_manifest


def _chunks(spark, rows, **kw):
    df = spark.createDataFrame(rows, "media_id long, duration_ms long")
    out = chunk_manifest(df, **kw).collect()
    got = {}
    for r in out:
        got.setdefault(r["id"], []).append((r["chunk_idx"], r["start"], r["end"], r["is_last"]))
    return {k: sorted(v) for k, v in got.items()}


def test_chunk_boundaries_and_overlap(spark):
    got = _chunks(spark, [(1, 70_000)], chunk=30_000, overlap=1_000)
    # step 29000: starts 0, 29000, 58000; last end clamps to 70000
    assert got[1] == [
        (0, 0, 30_000, False),
        (1, 29_000, 59_000, False),
        (2, 58_000, 70_000, True),
    ]
    # coverage: every instant < duration is inside some chunk
    assert got[1][-1][2] == 70_000


def test_short_media_single_chunk(spark):
    got = _chunks(spark, [(1, 5_000), (2, 30_000)], chunk=30_000, overlap=1_000)
    assert got[1] == [(0, 0, 5_000, True)]
    assert got[2] == [(0, 0, 30_000, True)]


def test_null_and_nonpositive_excluded(spark):
    got = _chunks(spark, [(1, None), (2, 0), (3, -5), (4, 1_000)])
    assert set(got) == {4}


def test_exact_step_multiple(spark):
    # duration exactly chunk + step: second chunk ends exactly at duration
    got = _chunks(spark, [(1, 59_000)], chunk=30_000, overlap=1_000)
    assert got[1] == [(0, 0, 30_000, False), (1, 29_000, 59_000, True)]


def test_overlap_validation(spark):
    df = spark.createDataFrame([(1, 100)], "media_id long, duration_ms long")
    with pytest.raises(ValueError):
        chunk_manifest(df, chunk=10, overlap=10)
