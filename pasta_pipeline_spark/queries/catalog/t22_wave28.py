"""Catalog tier: wave 28 (r10) — hybrid retrieval fusion and the
robust / segment-scoped A/B readouts.

Registration stays APPEND-ONLY: this module is imported LAST by the
package __init__, so the driver's position-keyed correctness window
over the earlier tiers is untouched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pasta_pipeline_spark.operators.abtest2 import (
    srm_by_segment_oracle_sql,
    trimmed_mean_oracle_sql,
)
from pasta_pipeline_spark.queries.catalog._core import _t, _tp, register


def _hybrid_rrf_oracle() -> str:
    from pasta_pipeline_spark.operators.search import hybrid_rrf_oracle_sql

    return hybrid_rrf_oracle_sql(["spark", "join", "window"], k=10)


@register(
    "hybrid_rrf_topk",
    None,  # generated in module scope below (single source of truth)
    doc="Hybrid retrieval via Reciprocal Rank Fusion (operators/search.py "
    "hybrid_rrf_topk; Cormack 2009): BM25 lexical ranking fused with the "
    "exact-cosine semantic ranking by sum of 1/(60+rank) — the RAG-stack "
    "default that needs no cross-system score calibration. Fusion depth "
    "is a LIMITed 50-row frame per list, so rank windows are bounded "
    "handoffs; contributions are INTEGER divisions (hash-exact, no "
    "doubles). BM25 moves only query-term posting lists; cosine is one "
    "scan + TakeOrderedAndProject.",
)
def q_hybrid_rrf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.search import hybrid_rrf_topk

    docs = _tp(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    return hybrid_rrf_topk(docs, emb, ["spark", "join", "window"], k=10)


from pasta_pipeline_spark.queries.catalog._core import REGISTRY, QuerySpec  # noqa: E402

REGISTRY["hybrid_rrf_topk"] = QuerySpec(
    spark_fn=REGISTRY["hybrid_rrf_topk"].spark_fn,
    oracle=_hybrid_rrf_oracle(),
    doc=REGISTRY["hybrid_rrf_topk"].doc,
)


@register(
    "srm_by_segment",
    srm_by_segment_oracle_sql("events"),
    doc="Segment-level sample-ratio mismatch (operators/abtest2.py "
    "srm_by_segment; Fabijan 2019): per event_type, the distinct-user "
    "arm split and its chi-square flag — catches segment-scoped "
    "assignment/logging bugs a passing global SRM hides. One distinct "
    "+ one groupBy, no joins; users exposed in several segments count "
    "in each (the segment-readout population).",
)
def q_srm_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.abtest2 import srm_by_segment

    return srm_by_segment(_t(spark, sf_dir, "events"))


@register(
    "trimmed_mean_effect",
    trimmed_mean_oracle_sql("events"),
    doc="Trimmed-mean treatment effect (operators/abtest2.py "
    "trimmed_mean_effect): per arm, the mean of per-user value sums "
    "after trimming floor(5% · n) users from each end — the whale-"
    "robust readout for heavy-tailed metrics. No per-user sort: the "
    "trim folds over the exact per-arm value histogram (cumulative "
    "windows on |distinct (arm, value)| rows, the exact_quantiles "
    "state shape); int64 until the final mean; n − 2g <= 0 fails "
    "closed to NULL.",
)
def q_trimmed_mean_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.abtest2 import trimmed_mean_effect

    return trimmed_mean_effect(_t(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# Wave 29 (r10): retrieval agreement, sequential testing, threshold sweep
# ---------------------------------------------------------------------------


def _rank_agreement_oracle() -> str:
    from pasta_pipeline_spark.operators.search import rank_agreement_oracle_sql

    return rank_agreement_oracle_sql(["spark", "join", "window"])


@register(
    "retrieval_rank_agreement",
    None,  # generated below (single source of truth in operators/search.py)
    doc="Cross-system retrieval agreement audit (operators/search.py "
    "retrieval_rank_agreement): overlap + Kendall tau between the BM25 "
    "and cosine top-50 rankings — near +1 the systems are redundant, "
    "near 0 fusion adds the most, low overlap flags a misconfigured "
    "side. Integer concordant/discordant counts + integer-division tau "
    "(hash-exact); the pair compare is a self-join of the bounded "
    "common frame, never the corpus.",
)
def q_retrieval_rank_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.search import retrieval_rank_agreement

    docs = _tp(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    return retrieval_rank_agreement(docs, emb, ["spark", "join", "window"])


REGISTRY["retrieval_rank_agreement"] = QuerySpec(
    spark_fn=REGISTRY["retrieval_rank_agreement"].spark_fn,
    oracle=_rank_agreement_oracle(),
    doc=REGISTRY["retrieval_rank_agreement"].doc,
)


def _group_sequential_oracle() -> str:
    from pasta_pipeline_spark.operators.abtest2 import group_sequential_oracle_sql

    return group_sequential_oracle_sql("events")


@register(
    "group_sequential_check",
    None,  # generated below (single source of truth in operators/abtest2.py)
    doc="Group-sequential early stopping (operators/abtest2.py "
    "group_sequential_check; O'Brien-Fleming 1979): cumulative z at 4 "
    "equally-spaced interim looks vs the OBF boundary C*sqrt(K/k) — "
    "the pre-registered answer to the peeking problem. Look thresholds "
    "are integer epoch-micro arithmetic; boundaries are Python-computed "
    "integer literals identical in both engines; moments ride "
    "int64/decimal(38,0) with the IEEE-exact z tree.",
)
def q_group_sequential_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.abtest2 import group_sequential_check

    return group_sequential_check(_t(spark, sf_dir, "events"))


REGISTRY["group_sequential_check"] = QuerySpec(
    spark_fn=REGISTRY["group_sequential_check"].spark_fn,
    oracle=_group_sequential_oracle(),
    doc=REGISTRY["group_sequential_check"].doc,
)


def _threshold_sweep_oracle(
    dim: int = 64, num_planes: int = 4, num_bands: int = 2, sim_scale: int = 20
) -> str:
    """DuckDB twin of similarity.cosine_threshold_sweep: the
    _cosine_dup_lsh_oracle banded gate (same inlined deterministic
    planes + hot-bucket cap rank) with every candidate pair bucketed
    instead of thresholded, plus the suffix-cumulative window."""
    from pasta_pipeline_spark.operators.similarity import DEFAULT_BUCKET_CAP
    from pasta_pipeline_spark.queries.catalog.t04_similarity_ann import _cosine_sql
    from pasta_pipeline_spark.queries.catalog.t05_multimodal import (
        _banded_eb_sql,
        _banded_planes_sql,
    )

    cos = _cosine_sql("a.embedding::DOUBLE[]", "b.embedding::DOUBLE[]")
    return f"""
    WITH planes(band, pidx, pv) AS (VALUES
        {_banded_planes_sql(dim, num_planes, num_bands)}),{_banded_eb_sql(DEFAULT_BUCKET_CAP)},
    cand AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM eb a JOIN eb b
        ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id
    ),
    hist AS (
      SELECT CAST(FLOOR({cos} * {sim_scale}) AS BIGINT) AS sim_bucket,
             CAST(COUNT(*) AS BIGINT) AS n_pairs
      FROM cand c
      JOIN embeddings a ON a.vec_id = c.id_a
      JOIN embeddings b ON b.vec_id = c.id_b
      GROUP BY 1
    )
    SELECT sim_bucket, n_pairs,
           CAST(SUM(n_pairs) OVER (ORDER BY sim_bucket DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_pairs_ge
    FROM hist ORDER BY sim_bucket DESC"""


@register(
    "dedup_threshold_sweep",
    _threshold_sweep_oracle(),
    doc="Dedup-threshold planning sweep (similarity.cosine_threshold_"
    "sweep): every LSH-gated candidate pair pays one exact cosine, "
    "bucketed at 0.05 resolution with the suffix-cumulative 'pairs "
    "dropped at threshold b' count — the histogram read before "
    "committing a semantic-dedup threshold, over EXACTLY the pair "
    "population the dedup gate would see (same bands, same hot-bucket "
    "cap). Cumulative window over <= 41 bucket rows.",
)
def q_dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.similarity import cosine_threshold_sweep

    emb = _t(spark, sf_dir, "embeddings")
    # num_planes=None engages the auto-calibrated growth recipe with
    # base (4, 2) — at the oracle gate scales (n <= LSH_CALIBRATED_N)
    # it resolves to exactly the config the DuckDB twin inlines; at
    # bigger corpora planes/bands grow so the kept-every-pair sweep
    # stays near-linear (the semantic_dedup convention; a pinned
    # config measured 13.8x at sf1 in the r10 ladder)
    return cosine_threshold_sweep(emb, dim=64, num_planes=None, num_bands=2)
