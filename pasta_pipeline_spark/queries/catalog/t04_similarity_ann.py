"""Catalog tier: embedding similarity: cosine top-k, kNN join, sign-LSH ANN.

Split verbatim from the r8 catalog monolith (r8 verdict ask #4).
Registration order is preserved by the package __init__ import
order; registration stays APPEND-ONLY — new queries go at the end
of the LAST tier module (or a new one imported last).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import SparkSession
from pasta_pipeline_spark.queries.catalog._core import _t, register

# ---------------------------------------------------------------------------
# Extension surface: embedding similarity search (SURVEY.md §7 M6)
# ---------------------------------------------------------------------------

_COSINE_TOPK_ORACLE = """
    WITH q AS (
      SELECT embedding::DOUBLE[] AS qv FROM embeddings
      WHERE vec_id = (SELECT min(vec_id) FROM embeddings)
    )
    SELECT vec_id,
           list_dot_product(embedding::DOUBLE[], qv)
             / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                * sqrt(list_dot_product(qv, qv))) AS sim
    FROM embeddings, q
    ORDER BY sim DESC, vec_id ASC
    LIMIT 10
"""


@register(
    "cosine_topk",
    _COSINE_TOPK_ORACLE,
    doc="Similarity search — exact brute-force cosine top-10 for the lowest "
    "vec_id's embedding. Bit-identical across engines: float→double casts "
    "before arithmetic + sequential fold (matches DuckDB list_dot_product).",
)
def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.similarity import cosine_topk

    emb = _t(spark, sf_dir, "embeddings")
    query = emb.orderBy("vec_id").limit(1).select(F.col("embedding").alias("qv"))
    return cosine_topk(emb, query, k=10)


_KNN_ORACLE = """
    WITH q AS (
      SELECT vec_id AS qid, embedding::DOUBLE[] AS qv FROM embeddings
      ORDER BY vec_id LIMIT 5
    ), scored AS (
      SELECT q.qid, e.vec_id,
             list_dot_product(e.embedding::DOUBLE[], q.qv)
               / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                  * sqrt(list_dot_product(q.qv, q.qv))) AS sim
      FROM embeddings e CROSS JOIN q
    )
    SELECT qid, vec_id, sim FROM (
      SELECT qid, vec_id, sim,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id ASC) AS rn
      FROM scored
    ) WHERE rn <= 5
"""


@register(
    "knn_join",
    _KNN_ORACLE,
    doc="Similarity search — exact 5-NN join for the 5 lowest vec_ids: one "
    "corpus scan with the query side broadcast, per-query window ranking.",
)
def q_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.similarity import knn_join

    emb = _t(spark, sf_dir, "embeddings")
    queries = (
        emb.orderBy("vec_id")
        .limit(5)
        .select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qv"))
    )
    return knn_join(emb, queries, k=5)


def _cosine_sql(vec: str, q: str) -> str:
    """DuckDB cosine twin of similarity.cosine (list_dot_product folds
    sequentially like F.aggregate, so the doubles are bit-identical)."""
    return (
        f"list_dot_product({vec}, {q}) / "
        f"(sqrt(list_dot_product({vec}, {vec})) * sqrt(list_dot_product({q}, {q})))"
    )


def _ann_lsh_oracle(dim: int = 64, num_planes: int = 6, k: int = 10) -> str:
    """Exact DuckDB twin of q_ann_lsh_topk: the hyperplanes are
    deterministic (splitmix64-mixed indices, similarity._hyperplane), so
    the 'approximate' path is reproducible — inline the plane constants
    as a VALUES list (same technique as _LANG_ID_ORACLE) and replay the
    bucket assignment + 1-bit multiprobe + exact rerank in SQL."""
    from pasta_pipeline_spark.operators.similarity import _hyperplane

    plane_rows = ",\n        ".join(
        f"({p}, [{', '.join(repr(c) for c in _hyperplane(dim, p))}]::DOUBLE[])"
        for p in range(num_planes)
    )
    probes = ", ".join(
        ["qbucket"] + [f"xor(qbucket, {1 << p})" for p in range(num_planes)]
    )
    return f"""
    WITH planes(pidx, pv) AS (VALUES
        {plane_rows}),
    q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings ORDER BY vec_id LIMIT 1),
    eb AS (
      SELECT vec_id, embedding,
             CAST(SUM(CASE WHEN list_dot_product(embedding::DOUBLE[], pv) >= 0
                           THEN 1::BIGINT << pidx ELSE 0 END) AS BIGINT) AS bucket
      FROM embeddings CROSS JOIN planes GROUP BY vec_id, embedding
    ),
    qb AS (
      SELECT qv,
             CAST(SUM(CASE WHEN list_dot_product(qv, pv) >= 0
                           THEN 1::BIGINT << pidx ELSE 0 END) AS BIGINT) AS qbucket
      FROM q CROSS JOIN planes GROUP BY qv
    ),
    probed AS (SELECT qv, unnest([{probes}]) AS bucket FROM qb)
    SELECT vec_id, {_cosine_sql('embedding::DOUBLE[]', 'qv')} AS sim
    FROM eb JOIN probed USING (bucket)
    ORDER BY sim DESC, vec_id ASC LIMIT {k}
    """


@register(
    "ann_lsh_topk",
    _ann_lsh_oracle(),
    doc="Similarity search — sign-LSH (6 deterministic hyperplanes → 64 "
    "buckets) ANN top-10 with 1-bit multiprobe; the 100 TB scale path (bucket "
    "join instead of full scan). Plane count scales with corpus size in a real "
    "deployment. The planes are deterministic, so the oracle replays the "
    "identical bucket assignment in DuckDB with inlined plane constants.",
)
def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.similarity import ann_topk_lsh

    emb = _t(spark, sf_dir, "embeddings")
    query = emb.orderBy("vec_id").limit(1).select(F.col("embedding").alias("qv"))
    dim = 64
    return ann_topk_lsh(emb, query, dim=dim, k=10, num_planes=6)


