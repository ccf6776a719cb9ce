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
