"""Contrastive-training data prep over the embedding corpus.

Two verbs for building contrastive / metric-learning datasets:

- ``hard_negative_mining`` — for each anchor vector, the top-k most
  similar vectors with a DIFFERENT label: the "hard negatives" that
  make InfoNCE/triplet training effective (random negatives are too
  easy; the hardest same-region different-label points carry the
  gradient). Candidates are gated by shared sign-LSH band buckets
  (similarity.with_lsh_bands, the bitext/semantic-dedup scaling
  pattern — never a cartesian; a bigger corpus re-calibrates
  planes+bands per the with_lsh_bands growth recipe), only
  candidates pay the exact cosine, and the per-anchor top-k is a
  bounded anchor-partitioned window.

- ``nearest_centroid_report`` — assign every vector to its nearest
  label centroid (cosine of SUMS — the 1/n cancels, so state is
  |labels| × d int64 component sums) and cross-tab predicted vs true:
  the confusion matrix of the cheapest possible classifier, a data-
  quality screen for label noise (the embedding-space counterpart of
  source_nb_confusion).

Exactness: cosines are sequential-fold double trees (playbook #5 —
F.aggregate / list_dot_product fold in the same order); centroid
sums ride floor(v·1e7) int64 components; every emitted score is
floored to fixed point for rendering only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .similarity import (
    DEFAULT_BUCKET_CAP,
    auto_lsh_config,
    cap_band_buckets,
    dot as _dot,
    with_lsh_bands,
)


#: Default per-anchor candidate budget for the exact-cosine rerank.
#: Sized to NEVER bind at the correctness-gate scales (max observed
#: per-anchor candidate count: 136 at sf0.01, 545 at sf0.1 — measured
#: r10) so gate results are byte-identical to the uncapped contract,
#: while bounding the rerank at growth scales (sf1's ~20k-vector
#: corpus: thousands of candidates per anchor otherwise).
DEFAULT_ANCHOR_CAND_CAP = 256

#: Default per-anchor survivor budget for the JL-projected coarse
#: rank between the candidate gate and the exact rerank (r11, the
#: r10 verdict's named lever): candidates rank by the COARSE cosine
#: estimate dot(P·a, P·b)/(‖a‖‖b‖) in the 16-dim Rademacher sign
#: projection (E[⟨Pa,Pb⟩] = k·⟨a,b⟩ for ±1 entries, so the JL dot is
#: an unbiased—up to the common k factor—cosine surrogate; 16 int
#: multiplies instead of the 64-dim double fold), and only the top
#: ``c·k`` survivors pay the exact cosine. Deterministic and replayed
#: verbatim by the DuckDB oracle twin (the anchor-cap precedent), so
#: the contract stays hash-exact at any scale even where it binds;
#: recall vs the fully-exact rerank is pinned by
#: ``tests/test_bucket_cap.py``. Sized by the r11 sf0.01 sweep:
#: recall vs the fully-exact contract was 0.70 @ 32, 0.92 @ 64,
#: 0.993 @ 96 (jl_k=16) — 96 keeps the exact stage 2.7× smaller than
#: the r10 collision cap where both bound while staying ~lossless.
DEFAULT_JL_CAND_CAP = 96


def hard_negative_mining(
    embeddings: DataFrame,
    dim: int = 64,
    k: int = 3,
    num_planes: int | None = None,
    num_bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    bucket_cap: int | None = DEFAULT_BUCKET_CAP,
    same_label: bool = False,
    anchor_cand_cap: int | None = DEFAULT_ANCHOR_CAND_CAP,
    jl_cand_cap: int | None = DEFAULT_JL_CAND_CAP,
    jl_k: int = 16,
) -> DataFrame:
    """Top-``k`` different-label near neighbors per anchor — or, with
    ``same_label=True``, SAME-label neighbors: the positive-pair miner
    (the other half of a contrastive/InfoNCE training set; SimCSE-style
    supervised positives are exactly "nearest same-class example").
    Self-pairs are always excluded.

    Returns (anchor_id, rnk, neg_id, neg_label, cos_sc) for anchors
    with at least one candidate; vectors whose length != ``dim`` are
    excluded (malformed embeddings fail closed, the jl_project rule).
    Each (band, bucket) is bounded by ``bucket_cap``
    (similarity.cap_band_buckets — the hot-bucket guard; a hub-heavy
    corpus is exactly where hard-negative mining gets pointed).

    ``num_planes=None`` (the default) auto-calibrates (planes, bands)
    from the corpus size via :func:`similarity.auto_lsh_config`, base
    (4, ``num_bands``) — the growth recipe is the default, so a 100×
    corpus cannot hit the fixed-config quadratic footgun. Explicit
    ``num_planes`` pins the config (the catalog oracle replays fixed
    plane constants at the gate scale, where auto resolves to the
    same base).

    ``anchor_cand_cap`` bounds the exact-cosine rerank per anchor (the
    r9 verdict's cost finding: the exact verify on gated candidates
    dominated at sf1): candidates rank by BAND-COLLISION COUNT (more
    shared bands ⇒ higher sign-agreement ⇒ likelier truly near — the
    multiprobe-LSH ordering heuristic) with the id as tiebreak, and
    only the top ``anchor_cand_cap`` pay the exact cosine. The cap is
    the per-anchor analog of ``bucket_cap`` and is replayed verbatim
    by the DuckDB oracle twin, so the contract stays deterministic and
    hash-exact AT ANY SCALE even when the cap binds; the recall
    contract vs the uncapped rerank is pinned by
    ``tests/test_bucket_cap.py``. ``None`` disables (exact rerank of
    every gated candidate).

    ``jl_cand_cap`` (r11) is the default per-anchor candidate budget —
    the two-tier rerank the :func:`similarity.jl_ann_topk` operator
    proves out, fused into the gate: every band-collision row computes
    the COARSE cosine in the deterministic ``jl_k``-dim Rademacher
    sign projection (:func:`similarity.jl_signs`, carried through the
    banding explode — 16 int64 multiplies per collision, no
    corpus-scale join against the pair frame), the dedup groupBy keeps
    it, and ONE per-anchor window keeps the top ``jl_cand_cap`` for
    the exact cosine. Deterministic: ranked by (coarse estimate DESC,
    md5(pair), id), replayed verbatim by the oracle twin, so the
    contract stays hash-exact at any scale. It subsumes the r10
    collision-count rank (under the linear-growth recipe nearly every
    pair collides in exactly one band, so collision count carries no
    signal); ``anchor_cand_cap`` therefore applies only when
    ``jl_cand_cap=None`` (collision-ranked cap, then exact rerank of
    every survivor).
    """
    from pasta_pipeline_spark.operators.util import (
        attach_cached_deps,
        pair_verify_parallelism,
    )

    src = (
        embeddings.where(F.size(F.col(vec_col)) == dim)
        .select(
            F.col(id_col).alias("vid"),
            F.col(label_col).alias("lbl"),
            F.col(vec_col).alias("vec"),
            # one norm fold per VECTOR here instead of two per
            # CANDIDATE in the rerank — bit-identical to the inline
            # cosine (same sequential fold, same sqrt) so the DuckDB
            # twin keeps computing norms inline
            F.sqrt(_dot(F.col(vec_col), F.col(vec_col))).alias("nrm"),
        )
        .persist()
    )
    if num_planes is None:
        # linear_pair_growth (r11): top-k mining ranks its candidates,
        # so per-band occupancy shrinks as bands multiply and the gate
        # pair volume stays ~linear in n (24.3M → 12.4M pairs at sf1;
        # the band join + collision groupBy, not the exact rerank, is
        # what dominated the sf1 profile)
        num_planes, num_bands = auto_lsh_config(
            src.count(), base_planes=4, base_bands=num_bands,
            linear_pair_growth=True,
        )
    use_jl = jl_cand_cap is not None
    if (
        use_jl
        and anchor_cand_cap is not None
        and anchor_cand_cap != DEFAULT_ANCHOR_CAND_CAP
    ):
        # r11 advisor finding: the JL path (default since r11) makes
        # anchor_cand_cap a no-op, so a caller tuning the r9/r10 knob
        # silently got cap-96 JL behavior instead. Fail loud.
        import logging

        logging.getLogger(__name__).warning(
            "hard_negative_mining: anchor_cand_cap=%d is IGNORED while "
            "jl_cand_cap=%d is set (the JL coarse-rank path, the default "
            "since r11, supersedes the collision-count cap) — pass "
            "jl_cand_cap=None to use the anchor_cand_cap path",
            anchor_cand_cap,
            jl_cand_cap,
        )
    pre_band = src
    if use_jl:
        # the 16-component projection rides INTO the band join (r11
        # sf10 finding: joining a corpus-scale projection frame onto
        # the pair frame AFTER candidate generation re-shuffles the
        # multi-hundred-million-row frame twice once the projection
        # side outgrows the broadcast threshold; carried through the
        # banding explode it is a 128-byte sidecar on document-scale
        # frames and the coarse score is a per-row expression)
        from .similarity import jl_project_expr
        pre_band = src.withColumn("proj", jl_project_expr(F.col("vec"), k=jl_k, d=dim))
    banded = cap_band_buckets(
        with_lsh_bands(pre_band, "vec", dim, num_planes, num_bands),
        "vid",
        bucket_cap,
    )
    side_cols = (["proj", "nrm"] if use_jl else [])
    a = banded.select(
        F.col("vid").alias("anchor_id"),
        F.col("lbl").alias("anchor_lbl"),
        "band",
        "bucket",
        *[F.col(c).alias(c + "_a") for c in side_cols],
    )
    b = banded.select(
        F.col("vid").alias("neg_id"),
        F.col("lbl").alias("neg_label"),
        F.col("band").alias("band_b"),
        F.col("bucket").alias("bucket_b"),
        *[F.col(c).alias(c + "_b") for c in side_cols],
    )
    lbl_pred = (
        (F.col("anchor_lbl") == F.col("neg_label"))
        & (F.col("anchor_id") != F.col("neg_id"))
        if same_label
        else (F.col("anchor_lbl") != F.col("neg_label"))
    )
    joined = a.join(
        b,
        (F.col("band") == F.col("band_b"))
        & (F.col("bucket") == F.col("bucket_b"))
        & lbl_pred,
    )
    pair_md5 = F.md5(
        F.concat_ws(
            ":",
            F.col("anchor_id").cast("string"),
            F.col("neg_id").cast("string"),
        )
    )
    if use_jl:
        # coarse tier (r11): every collision row computes the JL
        # cosine estimate IN the join projection (16 multiplies — the
        # arrays never materialize past the joined row), the dedup
        # groupBy keeps it via max (it is a pure function of the pair,
        # so max = the value), and ONE per-anchor window ranks by
        # (coarse DESC, md5(pair), id) with the jl_cand_cap budget.
        # The fold is double end-to-end (terms reach ~4e15, past int64
        # comfort but folded identically in both engines — sequential
        # zip_with/list_dot_product order, NOTES #45), floored to
        # int64 for the rank. This subsumes the r10 collision-count
        # rank: under linear_pair_growth the band plane sets are
        # independent enough that nearly every pair collides in
        # exactly one band, so collision count carries no signal and
        # its md5 tiebreak degenerated to a random sample —
        # ``anchor_cand_cap`` therefore applies only to the
        # jl_cand_cap=None path.
        # static element_at sum instead of zip_with+aggregate: no
        # per-row 16-element array allocation on the collision frame,
        # and the left-associated addition order is bit-identical to
        # the fold (acc starts at 0.0; 0.0 + t1 == t1 exactly), so the
        # DuckDB list_dot_product twin still matches
        jl_dot = None
        for i in range(1, jl_k + 1):
            term = (
                F.element_at(F.col("proj_a"), i).cast("double")
                * F.element_at(F.col("proj_b"), i).cast("double")
            )
            jl_dot = term if jl_dot is None else jl_dot + term
        coarse = F.floor(jl_dot / (F.col("nrm_a") * F.col("nrm_b"))).cast("long")
        wj = Window.partitionBy("anchor_id").orderBy(
            F.col("__jl").desc(), pair_md5, F.col("neg_id").asc()
        )
        cand = (
            # ONE exchange of the pair frame: hash-partitioning on
            # anchor_id alone satisfies both the dedup groupBy
            # clustering (same anchor ⇒ same partition) and the
            # per-anchor window partitioning. Explicit width
            # (pair_verify_parallelism): the post-exchange stage ranks
            # and reranks compute-dense pair rows whose byte volume is
            # tiny — AQE's byte-based coalescing would serialize it
            # (r13 stage profile: two ~900 ms single-task stages here).
            pair_verify_parallelism(
                joined.select(
                    "anchor_id", "neg_id", "neg_label", coarse.alias("__jl")
                ),
                "anchor_id",
            )
            .groupBy("anchor_id", "neg_id", "neg_label")
            .agg(F.max("__jl").alias("__jl"))
            .withColumn("__jrn", F.row_number().over(wj))
            .where(F.col("__jrn") <= jl_cand_cap)
            .select("anchor_id", "neg_id", "neg_label")
        )
    else:
        cand = (
            pair_verify_parallelism(joined, "anchor_id")
            # collision count doubles as the dedup (one row per pair)
            # and the candidate-quality key for the per-anchor cap
            .groupBy("anchor_id", "neg_id", "neg_label")
            .agg(F.count(F.lit(1)).alias("__coll"))
        )
        if anchor_cand_cap is not None:
            # ties in collision count (the common case: most
            # candidates share exactly one band) break by md5 of the
            # PAIR — an unbiased deterministic sample, the
            # cap_band_buckets rank idiom — never by raw id, which
            # would truncate toward low ids systematically
            wc = Window.partitionBy("anchor_id").orderBy(
                F.col("__coll").desc(), pair_md5, F.col("neg_id").asc()
            )
            cand = (
                cand.withColumn("__crn", F.row_number().over(wc))
                .where(F.col("__crn") <= anchor_cand_cap)
                .drop("__crn")
            )
        cand = cand.drop("__coll")
    av = src.select(
        F.col("vid").alias("anchor_id"),
        F.col("vec").alias("av"),
        F.col("nrm").alias("na"),
    )
    bv = src.select(
        F.col("vid").alias("neg_id"),
        F.col("vec").alias("bv"),
        F.col("nrm").alias("nb"),
    )
    scored = (
        cand.join(av, "anchor_id")
        .join(bv, "neg_id")
        .withColumn(
            "cos_sc",
            F.floor(
                _dot(F.col("av"), F.col("bv"))
                / (F.col("na") * F.col("nb"))
                * 1000000
            ).cast("long"),
        )
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.col("cos_sc").desc(), F.col("neg_id").asc()
    )
    out = (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select(
            "anchor_id",
            F.col("rnk").cast("long").alias("rnk"),
            "neg_id",
            "neg_label",
            "cos_sc",
        )
        .orderBy("anchor_id", "rnk")
    )
    return attach_cached_deps(out, [src])


def nearest_centroid_report(
    embeddings: DataFrame,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Nearest-centroid confusion matrix.

    Returns (true_label, pred_label, n, share_sc) where share is the
    row share within the true label. Centroid state is |labels| × d
    int64 sums reassembled to per-label arrays (a bounded broadcast);
    each vector pays |labels| sequential-fold cosines. Ties broken by
    the smallest label; zero-norm cases fail closed (excluded).
    """
    src = embeddings.where(F.size(F.col(vec_col)) == dim).select(
        F.col(id_col).alias("vid"),
        F.col(label_col).alias("lbl"),
        F.col(vec_col).alias("vec"),
    )
    fp = src.select(
        "vid",
        "lbl",
        F.transform(
            F.col("vec"), lambda v: F.floor(v.cast("double") * 10000000).cast("long")
        ).alias("vfp"),
    )
    exploded = fp.select("lbl", F.posexplode("vfp").alias("pos", "v"))
    sums = exploded.groupBy("lbl", "pos").agg(F.sum("v").alias("s"))
    cent = sums.groupBy(F.col("lbl").alias("clbl")).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "s"))), lambda st: st["s"]
        ).alias("carr")
    )
    # |labels|-row build side: the bounded crossJoin handoff
    joined = fp.crossJoin(F.broadcast(cent))
    dot = F.aggregate(
        F.zip_with(
            F.col("vfp"), F.col("carr"), lambda x, y: x.cast("double") * y.cast("double")
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nv = F.aggregate(
        F.transform(F.col("vfp"), lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nc = F.aggregate(
        F.transform(F.col("carr"), lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    denom = F.sqrt(nv) * F.sqrt(nc)
    cos_sc = F.when(denom > 0, F.floor(dot / denom * 1000000).cast("long"))
    scored = joined.select("vid", "lbl", "clbl", cos_sc.alias("cos_sc")).where(
        F.col("cos_sc").isNotNull()
    )
    w = Window.partitionBy("vid").orderBy(F.col("cos_sc").desc(), F.col("clbl").asc())
    pred = (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(F.col("lbl").alias("true_label"), F.col("clbl").alias("pred_label"))
    )
    conf = pred.groupBy("true_label", "pred_label").agg(
        F.count(F.lit(1)).alias("n")
    )
    w_row = Window.partitionBy("true_label")
    return (
        conf.withColumn("__tot", F.sum("n").over(w_row))
        .select(
            "true_label",
            "pred_label",
            "n",
            F.floor(F.col("n").cast("double") / F.col("__tot").cast("double") * 1000000)
            .cast("long")
            .alias("share_sc"),
        )
        .orderBy("true_label", "pred_label")
    )
