"""Catalog tier: wave 10: journeys, temporal lags, RAKE, contrastive.

Split verbatim from the r8 catalog monolith (r8 verdict ask #4).
Registration order is preserved by the package __init__ import
order; registration stays APPEND-ONLY — new queries go at the end
of the LAST tier module (or a new one imported last).
"""

from __future__ import annotations

from pasta_pipeline_spark.operators.similarity import DEFAULT_BUCKET_CAP
from pyspark.sql import DataFrame
from pyspark.sql import SparkSession
from pasta_pipeline_spark.queries.catalog._core import _t, _tp, register
from pasta_pipeline_spark.queries.catalog.t04_similarity_ann import _cosine_sql
from pasta_pipeline_spark.queries.catalog.t05_multimodal import _banded_planes_sql

# ---------------------------------------------------------------------------
# Wave 10: user journeys & temporal lags, RAKE keyphrases, contrastive
# data prep (hard negatives / nearest-centroid confusion), seasonal
# decomposition
# ---------------------------------------------------------------------------

from pasta_pipeline_spark.operators.journeys import (
    conversion_lag_oracle_sql,
    journey_paths_oracle_sql,
    shipping_lag_oracle_sql,
)
from pasta_pipeline_spark.operators.keywords import rake_oracle_sql
from pasta_pipeline_spark.operators.seasonal import weekly_seasonal_oracle_sql


@register(
    "journey_paths",
    journey_paths_oracle_sql(path_len=4, top_k=20),
    doc="Top first-4-event user-journey paths (operators/journeys.py): "
    "the sankey-input query. Per-user window is millions-of-small-groups "
    "(each user's first 4 events), then one vocabulary-scale path "
    "rollup; the grand total rides a 1-row broadcast scalar handoff. "
    "Shares floored to fixed point; ties broken by path text.",
)
def q_journey_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.journeys import user_journey_paths

    return user_journey_paths(_t(spark, sf_dir, "events"), path_len=4, top_k=20)


@register(
    "conversion_lag",
    conversion_lag_oracle_sql(),
    doc="Purchase-to-prior-view latency histogram (operators/journeys.py): "
    "the as-of join (operators/asof.py) turned into a time-to-convert "
    "distribution with cumulative share. The fact table collapses to a "
    "bounded per-hour count frame before any window; no-prior-view "
    "purchases land at lag -1. Oracle uses DuckDB's native ASOF LEFT "
    "JOIN against the same deduped view spine.",
)
def q_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.journeys import conversion_lag_profile

    return conversion_lag_profile(_t(spark, sf_dir, "events"))


@register(
    "shipping_lag_quartiles",
    shipping_lag_oracle_sql(),
    doc="Exact order-to-ship day-gap quartiles per priority "
    "(operators/journeys.py): the weighted-median cumulative-counts idiom "
    "over the bounded gap domain — the order-key join shuffles once, "
    "then quartiles come from per-(priority, gap) counts, never a "
    "fact-scale sort or approx_percentile.",
)
def q_shipping_lag_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.journeys import shipping_lag_quartiles

    return shipping_lag_quartiles(
        _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "lineitem")
    )


@register(
    "rake_keyphrases",
    rake_oracle_sql("documents", top_k=3),
    doc="RAKE keyphrase extraction (operators/keywords.py, Rose et al. "
    "2010): candidate phrases are stopword-delimited content runs "
    "(gaps-and-islands pos-minus-rank grouping), each word scores "
    "deg/freq over the corpus-level VOCABULARY-scale stats frame, and "
    "each doc keeps its top-3 phrases. Scores ride the fixed-point "
    "bridge (floor(deg*1e6/freq) int64 per occurrence) so both engines "
    "sum integers.",
)
def q_rake_keyphrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.keywords import rake_keyphrases

    return rake_keyphrases(_tp(spark, sf_dir, "documents"), top_k=3)


def _hard_negatives_oracle(
    dim: int = 64,
    k: int = 3,
    num_planes: int = 4,
    num_bands: int = 4,
    bucket_cap: int | None = DEFAULT_BUCKET_CAP,
    same_label: bool = False,
    anchor_cand_cap: int | None = None,
    jl_cand_cap: int | None = None,
    jl_k: int = 16,
) -> str:
    """DuckDB twin of negatives.hard_negative_mining: replay the banded
    sign-LSH candidate gate (deterministic inlined planes, the
    _semantic_dedup_oracle technique) with the different-label
    restriction, the per-collision JL coarse cosine (r11 — same
    inlined sign matrix as similarity.jl_project_oracle_sql), the
    MAX-dedup + per-anchor JL-ranked candidate budget with the
    floor/md5-tie ordering, then exact cosines and a per-anchor
    top-k. ``jl_cand_cap=None`` resolves to the operator's default so
    the twin replays the capped contract verbatim (``anchor_cand_cap``
    is the jl-off path's knob and is unused here, matching the
    operator)."""
    from pasta_pipeline_spark.operators.negatives import DEFAULT_JL_CAND_CAP
    from pasta_pipeline_spark.operators.similarity import JL_SCALE, jl_signs

    if jl_cand_cap is None:
        jl_cand_cap = DEFAULT_JL_CAND_CAP
    cos = _cosine_sql("sa.embedding::DOUBLE[]", "sb.embedding::DOUBLE[]")
    proj_comps = ",\n             ".join(
        "CAST(list_sum(list_transform(generate_series(1, {d}), i -> "
        "CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * {s}) AS BIGINT)"
        " * ([{row}])[i])) AS BIGINT)".format(
            d=dim, s=JL_SCALE, row=", ".join(str(x) for x in r)
        )
        for r in jl_signs(jl_k, dim)
    )
    nrm = "sqrt(list_dot_product({e}::DOUBLE[], {e}::DOUBLE[]))"
    jl_coarse = (
        "CAST(FLOOR(list_dot_product("
        "list_transform(pa.p, x -> CAST(x AS DOUBLE)), "
        "list_transform(pb.p, x -> CAST(x AS DOUBLE))) / ("
        + nrm.format(e="sa.embedding")
        + " * "
        + nrm.format(e="sb.embedding")
        + ")) AS BIGINT)"
    )
    return f"""
    WITH planes(band, pidx, pv) AS (VALUES
        {_banded_planes_sql(dim, num_planes, num_bands)}),
    src AS (
      SELECT vec_id, label, embedding FROM embeddings
      WHERE len(embedding) = {dim}
    ),
    eb0 AS (
      SELECT vec_id, band,
             CAST(SUM(CASE WHEN list_dot_product(embedding::DOUBLE[], pv) >= 0
                           THEN 1::BIGINT << pidx ELSE 0 END) AS BIGINT) AS bucket
      FROM src CROSS JOIN planes GROUP BY vec_id, embedding, band
    ),
    eb AS (
      SELECT vec_id, band, bucket FROM (
        SELECT vec_id, band, bucket,
               row_number() OVER (PARTITION BY band, bucket
                 ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS bkrn
        FROM eb0)
      WHERE bkrn <= {bucket_cap}
    ),
    proj AS (
      SELECT vec_id,
             [{proj_comps}] AS p
      FROM src
    ),
    cand0 AS (
      SELECT a.vec_id AS anchor_id, b.vec_id AS neg_id,
             sb.label AS neg_label, MAX({jl_coarse}) AS jl
      FROM eb a JOIN eb b ON a.band = b.band AND a.bucket = b.bucket
      JOIN src sa ON sa.vec_id = a.vec_id
      JOIN src sb ON sb.vec_id = b.vec_id
      JOIN proj pa ON pa.vec_id = a.vec_id
      JOIN proj pb ON pb.vec_id = b.vec_id
      WHERE {"sa.label = sb.label AND a.vec_id <> b.vec_id" if same_label else "sa.label <> sb.label"}
      GROUP BY 1, 2, 3
    ),
    cand AS (
      SELECT anchor_id, neg_id, neg_label FROM (
        SELECT anchor_id, neg_id, neg_label,
               row_number() OVER (PARTITION BY anchor_id
                 ORDER BY jl DESC,
                          md5(CAST(anchor_id AS VARCHAR) || ':'
                              || CAST(neg_id AS VARCHAR)),
                          neg_id ASC) AS jrn
        FROM cand0)
      WHERE jrn <= {jl_cand_cap}
    ),
    scored AS (
      SELECT c.anchor_id, c.neg_id, c.neg_label,
             CAST(FLOOR({cos} * 1000000) AS BIGINT) AS cos_sc
      FROM cand c
      JOIN src sa ON sa.vec_id = c.anchor_id
      JOIN src sb ON sb.vec_id = c.neg_id
    )
    SELECT anchor_id, CAST(rnk AS BIGINT) AS rnk, neg_id, neg_label, cos_sc
    FROM (
      SELECT *, row_number() OVER (PARTITION BY anchor_id
                ORDER BY cos_sc DESC, neg_id ASC) AS rnk
      FROM scored
    ) WHERE rnk <= {k}
    ORDER BY anchor_id, rnk
    """


@register(
    "hard_negatives",
    _hard_negatives_oracle(),
    doc="Hard-negative mining for contrastive training "
    "(operators/negatives.py): per anchor, the top-3 most-similar "
    "DIFFERENT-label vectors, candidates gated by OR-of-4-bands "
    "sign-LSH bucket collisions (the semantic_dedup scaling structure — "
    "recall grows with bands, candidate volume stays near-linear, never "
    "a cartesian), then capped per anchor to the top-256 by band-"
    "collision count, md5 tiebreak (r10: bounds the exact rerank; the "
    "oracle replays the cap; sized to never bind at gate scales). "
    "Only surviving candidates pay the exact fold cosine; "
    "the per-anchor top-k is an anchor-partitioned bounded window.",
)
def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.negatives import hard_negative_mining

    return hard_negative_mining(_t(spark, sf_dir, "embeddings"))


def _nearest_centroid_oracle(dim: int = 64) -> str:
    """DuckDB twin of negatives.nearest_centroid_report: same
    floor(v*1e7) int64 component sums per label, same sequential-fold
    double cosine of vector vs centroid-sum, same smallest-label tie
    break and row-share rendering."""
    return f"""
    WITH src AS (
      SELECT vec_id, label, embedding FROM embeddings
      WHERE len(embedding) = {dim}
    ),
    fp AS (
      SELECT vec_id, label,
             list_transform(embedding,
               v -> CAST(FLOOR(CAST(v AS DOUBLE) * 10000000) AS BIGINT)) AS vfp
      FROM src
    ),
    idx AS (
      SELECT label AS lbl, vfp, unnest(generate_series(1, len(vfp))) AS p
      FROM fp
    ),
    sums AS (
      SELECT lbl, p, CAST(SUM(vfp[p]) AS BIGINT) AS s
      FROM idx GROUP BY lbl, p
    ),
    cent AS (
      SELECT lbl AS clbl, array_agg(s ORDER BY p) AS carr
      FROM sums GROUP BY lbl
    ),
    scored AS (
      SELECT f.vec_id, f.label AS lbl, c.clbl,
             CASE WHEN sqrt(list_dot_product(f.vfp::DOUBLE[], f.vfp::DOUBLE[]))
                       * sqrt(list_dot_product(c.carr::DOUBLE[], c.carr::DOUBLE[])) > 0
                  THEN CAST(FLOOR(
                    list_dot_product(f.vfp::DOUBLE[], c.carr::DOUBLE[])
                    / (sqrt(list_dot_product(f.vfp::DOUBLE[], f.vfp::DOUBLE[]))
                       * sqrt(list_dot_product(c.carr::DOUBLE[], c.carr::DOUBLE[])))
                    * 1000000) AS BIGINT) END AS cos_sc
      FROM fp f CROSS JOIN cent c
    ),
    pred AS (
      SELECT lbl AS true_label, clbl AS pred_label
      FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                  ORDER BY cos_sc DESC, clbl ASC) AS rn
        FROM scored WHERE cos_sc IS NOT NULL
      ) WHERE rn = 1
    ),
    conf AS (
      SELECT true_label, pred_label, COUNT(*) AS n
      FROM pred GROUP BY true_label, pred_label
    )
    SELECT true_label, pred_label, n,
           CAST(FLOOR(CAST(n AS DOUBLE)
                / CAST(SUM(n) OVER (PARTITION BY true_label) AS DOUBLE)
                * 1000000) AS BIGINT) AS share_sc
    FROM conf ORDER BY true_label, pred_label
    """


@register(
    "nearest_centroid_confusion",
    _nearest_centroid_oracle(),
    doc="Nearest-centroid confusion matrix (operators/negatives.py): "
    "assign every vector to its nearest label centroid — cosine of "
    "SUMS, so centroid state is |labels| x d int64 fixed-point "
    "component sums broadcast back — and cross-tab predicted vs true "
    "label: the label-noise screen in embedding space "
    "(source_nb_confusion's counterpart). One explode-sum pass plus "
    "one broadcast-scored scan at any scale.",
)
def q_nearest_centroid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.negatives import nearest_centroid_report

    return nearest_centroid_report(_t(spark, sf_dir, "embeddings"))


@register(
    "weekly_seasonality",
    weekly_seasonal_oracle_sql(),
    doc="STL-lite additive seasonal decomposition of daily revenue "
    "(operators/seasonal.py): centered 7-day trend (kept x7 in int64, "
    "calendar-gap guarded), per-weekday seasonal index, residual "
    "z-outliers. The fact table collapses to per-day cents sums first, "
    "so every window is |days|-row metadata scale — the documented "
    "bounded-domain exemption to the no-empty-partition-window rule.",
)
def q_weekly_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.seasonal import weekly_seasonal_decomposition

    return weekly_seasonal_decomposition(_t(spark, sf_dir, "orders"))


