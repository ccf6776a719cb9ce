"""Equivalence pins for the r11 hot-path rewrites (r11 verdict ask #6).

The three r11 shapes — the in-join exact verify (semantic_dedup /
cosine_dup_pairs), the JL in-join coarse rank (hard_negatives), and
the PPJoin + array-set verify (prefix_jaccard_pairs) — are
oracle-pinned at gate scales, but their equivalence to the pre-r11
shapes was only implied. These tests pin old == new on seeded random
corpora LARGER than the oracle corpus (2k vectors / 800 docs with
planted near-dup structure), so future refactors can't silently
diverge where the oracle corpus doesn't bind.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

DIM = 64


@pytest.fixture(scope="module")
def rand_emb(spark):
    """2,000 seeded vectors with 200 planted near-duplicates (base +
    small noise), so the banded gates have real work."""
    rng = np.random.RandomState(42)
    base = rng.randn(1800, DIM).astype(np.float32)
    dup_src = base[rng.randint(0, 1800, 200)]
    dups = dup_src + 0.05 * rng.randn(200, DIM).astype(np.float32)
    vecs = np.vstack([base, dups.astype(np.float32)])
    labels = rng.randint(0, 8, 2000)
    rows = [
        (int(i), [float(x) for x in vecs[i]], int(labels[i])) for i in range(2000)
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


@pytest.fixture(scope="module")
def rand_docs(spark):
    """800 seeded token documents with 80 planted near-dup pairs
    (shared token prefix, small suffix edits)."""
    rng = np.random.RandomState(7)
    vocab = [f"tok{i}" for i in range(500)]
    docs = []
    for i in range(720):
        n = rng.randint(20, 60)
        docs.append(" ".join(vocab[j] for j in rng.randint(0, 500, n)))
    for i in range(80):  # near-dups of the first 80
        toks = docs[i].split()
        k = max(1, len(toks) // 10)
        for _ in range(k):
            toks[rng.randint(0, len(toks))] = vocab[rng.randint(0, 500)]
        docs.append(" ".join(toks))
    return spark.createDataFrame(
        [(int(i), d) for i, d in enumerate(docs)], "doc_id long, text string"
    )


def _pairset(df):
    return {
        (r.id_a, r.id_b, round(r.sim, 9))
        for r in df.select("id_a", "id_b", "sim").collect()
    }


def test_injoin_verify_equals_distinct_then_joinback(spark, rand_emb):
    """r11 rewrite #2: cosine_dup_pairs' in-join exact verify (vector +
    norm carried through the banding explode, distinct AFTER the
    threshold filter) must equal the pre-r11 shape: distinct the
    candidate frame first, join the corpus vectors back, then verify.
    Same pinned config on both sides."""
    from pasta_pipeline_spark.operators.similarity import (
        DEFAULT_BUCKET_CAP,
        cap_band_buckets,
        cosine_dup_pairs,
        dot,
        with_lsh_bands,
    )

    new = _pairset(
        cosine_dup_pairs(
            rand_emb, 0.9, use_lsh=True, dim=DIM, num_planes=8, num_bands=2
        )
    )

    # pre-r11 shape, reconstructed: band → distinct candidates → two
    # vector joinbacks → inline-norm cosine → threshold
    src = rand_emb.select("vec_id", "embedding")
    banded = cap_band_buckets(
        with_lsh_bands(src, "embedding", DIM, 8, 2), "vec_id", DEFAULT_BUCKET_CAP
    )
    a = banded.select(F.col("vec_id").alias("id_a"), "band", "bucket")
    b = banded.select(F.col("vec_id").alias("id_b"), "band", "bucket")
    cand = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    va = src.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    vb = src.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    sim = (
        dot(F.col("va"), F.col("vb"))
        / (
            F.sqrt(dot(F.col("va"), F.col("va")))
            * F.sqrt(dot(F.col("vb"), F.col("vb")))
        )
    ).alias("sim")
    old = _pairset(
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select("id_a", "id_b", sim)
        .filter(F.col("sim") >= 0.9)
    )
    assert new == old and len(new) > 0


def test_jl_rank_lossless_when_cap_does_not_bind(spark, rand_emb):
    """r11 rewrite #1: the JL coarse rank keeps the top jl_cand_cap
    candidates per anchor for the exact rerank. Where the cap does NOT
    bind (every anchor has fewer gated candidates), the JL path must
    equal the uncapped exact-rerank-of-every-candidate shape (the
    pre-r11 contract) byte for byte — the coarse rank may only REORDER
    the rerank's input, never change the top-k."""
    from pasta_pipeline_spark.operators.negatives import hard_negative_mining

    kw = dict(dim=DIM, k=3, num_planes=8, num_bands=2)
    new = hard_negative_mining(rand_emb, jl_cand_cap=10_000, **kw)
    old = hard_negative_mining(
        rand_emb, jl_cand_cap=None, anchor_cand_cap=None, **kw
    )
    rows_new = sorted(map(tuple, new.collect()))
    rows_old = sorted(map(tuple, old.collect()))
    assert rows_new == rows_old and len(rows_new) > 0


def test_ppjoin_array_verify_equals_exact_jaccard(spark, rand_docs):
    """r11 rewrite #3: prefix_jaccard_pairs (global-order prefix
    blocking → PPJoin positional filter → array-set verify) claims the
    same exact contract as the inverted-index jaccard_pairs: ALL pairs
    with shingle-set Jaccard >= threshold. Equality on a corpus with
    planted near-dups pins both the blocking completeness AND the
    conservative positional bound (a dropped qualifying pair would
    show here)."""
    from pasta_pipeline_spark.operators.text_dedup import (
        jaccard_pairs,
        prefix_jaccard_pairs,
    )

    def pset(df):
        return {
            (r.doc_a, r.doc_b, round(r.jaccard, 9))
            for r in df.select("doc_a", "doc_b", "jaccard").collect()
        }

    new = pset(prefix_jaccard_pairs(rand_docs, "doc_id", "text", n=3, threshold=0.5))
    old = pset(jaccard_pairs(rand_docs, "doc_id", "text", n=3, threshold=0.5))
    assert new == old and len(new) > 0
