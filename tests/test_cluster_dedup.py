"""Cluster-gated SemDedup (wave 32): the IVF gate's contracts.

The banded semantic_dedup's second decade is bounded by band-collision
statistics (NOTES #66); semantic_dedup_clustered bounds pair volume by
CONSTRUCTION (Σ|cell|²/2). These tests pin the properties the oracle
corpus can't: the n_cells=1 exhaustive-equivalence, multiprobe recall
monotonicity, trainer determinism, and the auto recipe's boundaries.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _pairs_set(df):
    return {(r.id_a, r.id_b) for r in df.select("id_a", "id_b").collect()}


def test_auto_ivf_cells_boundaries():
    from pasta_pipeline_spark.operators.similarity import (
        IVF_BASE_CELLS,
        LSH_CALIBRATED_N,
        auto_ivf_cells,
    )

    assert auto_ivf_cells(100) == IVF_BASE_CELLS
    assert auto_ivf_cells(LSH_CALIBRATED_N) == IVF_BASE_CELLS
    # past the anchor: sqrt(n), never below base
    assert auto_ivf_cells(200_000) == 447  # round(sqrt(200000))
    assert auto_ivf_cells(2001) >= IVF_BASE_CELLS


def test_ivf_single_cell_is_exhaustive(spark, emb):
    """n_cells=1 puts every vector in one cell, so the gate degenerates
    to the exact all-pairs contract — equivalence against the
    brute-force cosine_dup_pairs oracle, no cluster geometry involved."""
    from pasta_pipeline_spark.operators.similarity import (
        cosine_dup_pairs,
        ivf_dup_pairs,
    )

    got = _pairs_set(ivf_dup_pairs(emb, 0.3, dim=64, n_cells=1, iterations=1))
    want = _pairs_set(cosine_dup_pairs(emb, 0.3, use_lsh=False))
    assert got == want and len(want) > 0


def test_ivf_pairs_are_true_pairs(spark, emb):
    """No false positives at any cell count: every emitted pair clears
    the exact threshold (subset of the brute-force truth)."""
    from pasta_pipeline_spark.operators.similarity import (
        cosine_dup_pairs,
        ivf_dup_pairs,
    )

    got = _pairs_set(ivf_dup_pairs(emb, 0.3, dim=64, n_cells=6, iterations=2))
    want = _pairs_set(cosine_dup_pairs(emb, 0.3, use_lsh=False))
    assert got <= want and len(got) > 0


def test_multiprobe_recall_monotone(spark, emb):
    """n_probe=2 probes a superset of each vector's cells (its top-1
    cell included), so the pair set can only grow."""
    from pasta_pipeline_spark.operators.similarity import ivf_dup_pairs

    p1 = _pairs_set(ivf_dup_pairs(emb, 0.3, dim=64, n_cells=6, n_probe=1))
    p2 = _pairs_set(ivf_dup_pairs(emb, 0.3, dim=64, n_cells=6, n_probe=2))
    assert p1 <= p2


def test_dedup_clustered_keep_contract(spark, emb):
    """kept == 0 exactly for the id_b side of the gate's pairs; the
    smallest id of every near-dup group survives."""
    from pasta_pipeline_spark.operators.similarity import (
        ivf_dup_pairs,
        semantic_dedup_clustered,
    )

    pairs = ivf_dup_pairs(emb, 0.3, dim=64, n_cells=6, iterations=2)
    dropped_want = {r.id_b for r in pairs.collect()}
    out = semantic_dedup_clustered(emb, 0.3, dim=64, n_cells=6, iterations=2)
    rows = out.collect()
    assert len(rows) == emb.count()
    dropped_got = {r.vec_id for r in rows if r.kept == 0}
    assert dropped_got == dropped_want
    # group minima survive: an id smaller than every partner it pairs
    # with is never droppable
    all_pair_ids = {r.id_a for r in pairs.collect()} | dropped_want
    if all_pair_ids:
        assert min(all_pair_ids) not in dropped_got


def test_fp_trainer_deterministic(spark, emb):
    """Two independent runs produce bit-identical centroids (fixed
    seeds, fixed-point order-free means) — the property the DuckDB
    oracle twin's bit-for-bit replay rests on."""
    from pasta_pipeline_spark.operators.similarity import train_ivf_centroids_fp

    def snap():
        return sorted(
            (r.cell_id, tuple(r.cv))
            for r in train_ivf_centroids_fp(emb, n_cells=5, iterations=2).collect()
        )

    a, b = snap(), snap()
    assert a == b
    assert len(a) == 5


def test_fp_trainer_sample_mod(spark, emb):
    """sample_mod trains on the deterministic id-subset but still
    yields n_cells centroids usable for full-corpus assignment."""
    from pasta_pipeline_spark.operators.similarity import (
        ivf_dup_pairs,
        train_ivf_centroids_fp,
    )

    cent = train_ivf_centroids_fp(emb, n_cells=4, iterations=1, sample_mod=3)
    assert cent.count() == 4
    # and the end-to-end gate accepts an explicit sample mod
    pairs = ivf_dup_pairs(
        emb, 0.3, dim=64, n_cells=4, iterations=1, train_sample_mod=3
    )
    assert pairs.count() >= 0


def test_cluster_gate_recall_report_bounds(spark, emb):
    """One row; numerator is a subset of the denominator by
    construction, so recall_sc <= 1e6; n_cells=1 ⇒ recall == 1e6."""
    from pasta_pipeline_spark.operators.similarity import (
        cluster_gate_recall_report,
    )

    row = cluster_gate_recall_report(emb, 0.3, n_cells=6).collect()[0]
    assert row.n_gated_pairs <= row.n_true_pairs
    assert row.recall_sc is None or 0 <= row.recall_sc <= 1_000_000
    full = cluster_gate_recall_report(emb, 0.3, n_cells=1, iterations=1).collect()[0]
    assert full.n_true_pairs > 0 and full.recall_sc == 1_000_000


def test_wrong_dim_vectors_fail_closed(spark, emb):
    """Vectors whose length != dim are excluded from the gate but kept
    (kept=1) in the dedup output — same contract as semantic_dedup."""
    from pasta_pipeline_spark.operators.similarity import semantic_dedup_clustered

    bad = spark.createDataFrame(
        [(999_999, [1.0, 2.0])], "vec_id long, embedding array<float>"
    )
    aug = emb.select("vec_id", "embedding").unionByName(bad)
    out = semantic_dedup_clustered(aug, 0.3, dim=64, n_cells=6)
    r = out.where(F.col("vec_id") == 999_999).collect()
    assert len(r) == 1 and r[0].kept == 1
