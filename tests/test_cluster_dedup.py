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


def test_diverse_keep_contract(spark, emb):
    """semantic_dedup_diverse drops the more-central side of every
    pair (paper keep policy): recompute the loser set from the gate's
    pairs + per-vector centroid sims and compare."""
    from pasta_pipeline_spark.operators.similarity import (
        _nearest_cells,
        dot,
        ivf_dup_pairs,
        semantic_dedup_diverse,
        train_ivf_centroids_fp,
    )
    from pyspark.sql import functions as F

    src = emb.select(
        "vec_id",
        "embedding",
        F.sqrt(dot(F.col("embedding"), F.col("embedding"))).alias("__nrm"),
    )
    cent = train_ivf_centroids_fp(emb, n_cells=6, iterations=2)
    cent = cent.select(
        "cell_id", "cv", F.sqrt(dot(F.col("cv"), F.col("cv"))).alias("__cnrm")
    )
    assigned = _nearest_cells(
        src, cent, 1, "vec_id", "embedding", carry_norm=False, emit_csim=True
    )
    cs = {r.vec_id: r["__ccsim"] for r in assigned.collect()}
    pairs = ivf_dup_pairs(emb, 0.3, dim=64, n_cells=6, iterations=2).collect()
    want = set()
    for p in pairs:
        a_wins = (cs[p.id_a], p.id_a) < (cs[p.id_b], p.id_b)
        want.add(p.id_b if a_wins else p.id_a)
    out = semantic_dedup_diverse(emb, 0.3, dim=64, n_cells=6, iterations=2)
    got = {r.vec_id for r in out.collect() if r.kept == 0}
    assert got == want and len(want) > 0


def test_cell_profile_pair_volume(spark, emb):
    """ivf_cell_profile's gate_pairs sums to exactly the candidate
    volume the n_probe=1 gate generates (threshold=-1 keeps every
    cell-confined pair)."""
    from pasta_pipeline_spark.operators.similarity import (
        ivf_cell_profile,
        ivf_dup_pairs,
    )

    prof = ivf_cell_profile(emb, dim=64, n_cells=6, iterations=2).collect()
    total = sum(r.gate_pairs for r in prof)
    assert sum(r.n_members for r in prof) == emb.count()
    all_pairs = ivf_dup_pairs(emb, -1.0, dim=64, n_cells=6, iterations=2).count()
    assert total == all_pairs and total > 0


def test_hash_cluster_edges_component_equivalent(spark):
    """hash_cluster_edges (clique->star + distinct-hash banding) must
    yield EXACTLY the components and min-id survivors the full banded
    pair frame yields — including hot identical-hash groups, the case
    it exists for (sf10: 998 distinct hashes over 500k rows)."""
    import numpy as np

    from pasta_pipeline_spark.operators.multimodal import (
        banded_hamming_pairs,
        hash_cluster_edges,
    )
    from pasta_pipeline_spark.operators.text_dedup import duplicate_clusters
    from pyspark.sql import functions as F

    rng = np.random.RandomState(11)
    rows = []
    # 40 hash values, heavy groups (up to 30 identical), 2 geometries,
    # plus near-miss hashes 1-2 bits apart to exercise rep-rep edges
    base_hashes = [int(rng.randint(0, 1 << 60)) for _ in range(40)]
    mid = 0
    for hi, h in enumerate(base_hashes):
        geom = (8 + hi % 2, 8)
        for _ in range(int(rng.randint(1, 30))):
            rows.append((mid, geom[0], geom[1], h))
            mid += 1
        if hi % 3 == 0:  # a 1-bit neighbor group
            rows.append((mid, geom[0], geom[1], h ^ 1))
            mid += 1
    df = spark.createDataFrame(
        rows, "media_id long, width int, height int, dhash long"
    )
    ids = df.select(F.col("media_id").alias("doc_id"))

    def clusters(pairs):
        out = duplicate_clusters(
            ids, pairs.select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"))
        )
        return sorted((r.doc_id, r.cluster_id, r.is_survivor) for r in out.collect())

    full = clusters(
        banded_hamming_pairs(df, ["width", "height"], "dhash", "media_id")
    )
    reduced = clusters(hash_cluster_edges(df, ["width", "height"], "dhash", "media_id"))
    assert full == reduced and len(full) == len(rows)


# ---- two-level (coarse-quantizer) assignment, wave 34 (r13) ----


def test_auto_coarse_cells_boundaries():
    from pasta_pipeline_spark.operators.similarity import auto_coarse_cells

    assert auto_coarse_cells(8) == 3       # round(sqrt(8))
    assert auto_coarse_cells(447) == 21    # the sf10 shape
    assert auto_coarse_cells(2) == 2       # floor of 2 — never a 1-group
    assert auto_coarse_cells(1) == 2


def test_two_level_single_group_equals_flat(spark, emb):
    """n_coarse=1 puts every fine cell in one coarse group, so pass 2
    scores ALL fine cells with the flat tie order — the two-level
    assignment degenerates to the flat one EXACTLY (pair sets equal),
    which pins both argmax passes and the member join against the
    flat path's semantics."""
    from pasta_pipeline_spark.operators.similarity import ivf_dup_pairs

    flat = _pairs_set(
        ivf_dup_pairs(emb, 0.3, dim=64, n_cells=6, iterations=2, two_level=False)
    )
    tl = _pairs_set(
        ivf_dup_pairs(
            emb, 0.3, dim=64, n_cells=6, iterations=2, two_level=True, n_coarse=1
        )
    )
    assert tl == flat and len(flat) > 0


def test_two_level_full_probe_equals_flat(spark, emb):
    """coarse_probe == n_coarse probes every coarse group, so the fine
    candidate set is again ALL cells — exact flat equivalence through
    the multiprobe path."""
    from pasta_pipeline_spark.operators.similarity import ivf_dup_pairs

    flat = _pairs_set(
        ivf_dup_pairs(emb, 0.3, dim=64, n_cells=6, iterations=2, two_level=False)
    )
    tl = _pairs_set(
        ivf_dup_pairs(
            emb, 0.3, dim=64, n_cells=6, iterations=2,
            two_level=True, n_coarse=3, coarse_probe=3,
        )
    )
    assert tl == flat


def test_two_level_pairs_are_true_pairs(spark, emb):
    """No false positives through the two-level route either: every
    emitted pair clears the exact threshold."""
    from pasta_pipeline_spark.operators.similarity import (
        cosine_dup_pairs,
        ivf_dup_pairs,
    )

    got = _pairs_set(
        ivf_dup_pairs(emb, 0.3, dim=64, n_cells=6, iterations=2, two_level=True)
    )
    want = _pairs_set(cosine_dup_pairs(emb, 0.3, use_lsh=False))
    assert got <= want and len(got) > 0


def test_assign_profile_consistency(spark, emb):
    """The profile's counts satisfy their own identities: flat =
    n·cells, two_level = coarse_pass + fine_pass, Σ assigned = n means
    fine_pass <= n·cells."""
    from pasta_pipeline_spark.operators.similarity import ivf_assign_profile

    row = ivf_assign_profile(emb, dim=64, n_cells=8).collect()[0]
    assert row.n_vectors == 500
    assert row.cosines_flat == row.n_vectors * row.n_cells
    assert row.cosines_coarse_pass == row.n_vectors * row.n_coarse_used
    assert row.cosines_two_level == row.cosines_coarse_pass + row.cosines_fine_pass
    assert 0 < row.cosines_fine_pass <= row.cosines_flat
    assert row.n_coarse_used <= row.n_coarse


def test_semantic_dedup_auto_below_anchor_is_banded(spark, emb):
    """At gate scale the front door routes to the banded path —
    output EXACTLY semantic_dedup's (same auto-calibrated config)."""
    from pasta_pipeline_spark.operators.similarity import (
        semantic_dedup,
        semantic_dedup_auto,
    )

    want = {(r.vec_id, r.kept) for r in semantic_dedup(
        emb, 0.4, dim=64, num_planes=None, num_bands=2
    ).collect()}
    got = {(r.vec_id, r.kept) for r in semantic_dedup_auto(
        emb, 0.4, dim=64
    ).collect()}
    assert got == want and len(got) == emb.count()


def test_semantic_dedup_auto_above_anchor_is_clustered(spark, emb):
    """Past the anchor the front door routes to the cluster gate —
    output EXACTLY semantic_dedup_clustered's (anchor forced below
    the fixture so the dispatch itself is what's under test)."""
    from pasta_pipeline_spark.operators.similarity import (
        semantic_dedup_auto,
        semantic_dedup_clustered,
    )

    want = {(r.vec_id, r.kept) for r in semantic_dedup_clustered(
        emb, 0.4, dim=64, n_cells=None
    ).collect()}
    got = {(r.vec_id, r.kept) for r in semantic_dedup_auto(
        emb, 0.4, dim=64, anchor=10
    ).collect()}
    assert got == want


def test_two_level_keep_contract(spark, emb):
    """semantic_dedup_clustered(two_level=True) keeps the same
    smallest-id-survives law over ITS gate's pairs."""
    from pasta_pipeline_spark.operators.similarity import (
        ivf_dup_pairs,
        semantic_dedup_clustered,
    )

    pairs = ivf_dup_pairs(emb, 0.3, dim=64, n_cells=6, iterations=2, two_level=True)
    dropped_want = {r.id_b for r in pairs.collect()}
    out = semantic_dedup_clustered(
        emb, 0.3, dim=64, n_cells=6, iterations=2, two_level=True
    )
    rows = out.collect()
    assert len(rows) == emb.count()
    assert {r.vec_id for r in rows if r.kept == 0} == dropped_want
