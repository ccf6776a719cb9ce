"""Catalog tier: multimodal plumbing + misc relational (media features, salted agg, cosine-dup pairs, JSON).

Split verbatim from the r8 catalog monolith (r8 verdict ask #4).
Registration order is preserved by the package __init__ import
order; registration stays APPEND-ONLY — new queries go at the end
of the LAST tier module (or a new one imported last).
"""

from __future__ import annotations

from pasta_pipeline_spark.operators.similarity import DEFAULT_BUCKET_CAP
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import SparkSession
from pyspark.sql import Window
from pasta_pipeline_spark.queries.catalog._core import _t, _tp, register
from pasta_pipeline_spark.queries.catalog.t03_dedup_ladder import _JACCARD_ORACLE
from pasta_pipeline_spark.queries.catalog.t04_similarity_ann import _cosine_sql

# ---------------------------------------------------------------------------
# Extension surface: multimodal column plumbing (SURVEY.md §7 M6)
# ---------------------------------------------------------------------------

_MEDIA_ORACLE = """
    SELECT doc_id AS media_id,
           'text' AS media_type,
           CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
           md5(text) AS content_md5,
           CAST(('0x' || substr(md5(text), 1, 4))::BIGINT % 1920 + 1 AS INT) AS width,
           CAST(('0x' || substr(md5(text), 5, 4))::BIGINT % 1080 + 1 AS INT) AS height,
           CAST(NULL AS BIGINT) AS duration_ms,
           CAST(NULL AS INT) AS sample_rate
    FROM documents
"""


@register(
    "media_features",
    _MEDIA_ORACLE,
    doc="Multimodal plumbing — binary payload column (documents.text encoded to "
    "bytes) through the Arrow-batched mapInPandas decode stub: byte length, "
    "content md5, deterministic pseudo-dimensions. The Python stage is real; "
    "the codec is stubbed (no image libs in this container).",
)
def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.multimodal import extract_media_features

    docs = _tp(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text").alias("media_type"),
        F.col("text").cast("binary").alias("payload"),
    )
    return extract_media_features(media, decode="stub")


_MEDIA_REAL_ORACLE = """
    SELECT doc_id AS media_id,
           CASE WHEN doc_id % 2 = 0 THEN 'audio/wav' ELSE 'image/ppm' END AS media_type,
           CAST(CASE WHEN doc_id % 2 = 0
                THEN 44 + (400 + (doc_id % 97) * 8) * (1 + (doc_id // 2) % 2) * 2
                ELSE 9 + length(CAST(16 + doc_id % 64 AS VARCHAR))
                       + length(CAST(16 + (doc_id // 3) % 48 AS VARCHAR))
                       + 3 * (16 + doc_id % 64) * (16 + (doc_id // 3) % 48)
           END AS BIGINT) AS n_bytes,
           CAST(CASE WHEN doc_id % 2 = 1 THEN 16 + doc_id % 64 END AS INT) AS width,
           CAST(CASE WHEN doc_id % 2 = 1 THEN 16 + (doc_id // 3) % 48 END AS INT) AS height,
           CAST(CASE WHEN doc_id % 2 = 0
                THEN (400 + (doc_id % 97) * 8) * 1000 // (8000 + ((doc_id // 2) % 5) * 2000)
           END AS BIGINT) AS duration_ms,
           CAST(CASE WHEN doc_id % 2 = 0
                THEN 8000 + ((doc_id // 2) % 5) * 2000
           END AS INT) AS sample_rate
    FROM documents
"""




@register(
    "latest_events_topk",
    """
    SELECT event_id, user_id, ts
    FROM events
    ORDER BY ts DESC, event_id DESC
    LIMIT 1000
    """,
    doc="L2/L3 — the reference's scrape order: newest-first capped at 1000 "
    "(message_scraper.py:87-100); compiles to TakeOrderedAndProject (per-"
    "partition heap + driver merge of k rows, no global sort).",
)
def q_latest_events_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.topk import top_k

    events = _t(spark, sf_dir, "events")
    return top_k(events, [F.desc("ts"), F.desc("event_id")], 1000).select(
        "event_id", "user_id", "ts"
    )


@register(
    "retention_filter",
    """
    SELECT event_id
    FROM events
    WHERE NOT (ts < (SELECT max(ts) FROM events) - INTERVAL 14 DAY
               AND event_type <> 'purchase')
    """,
    doc="P9 retention delete (duplicate_remover.py:205-211): drop rows older "
    "than the retention window unless protected by status — expressed as the "
    "surviving set; 'now' frozen to max(ts) for determinism.",
)
def q_retention_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    head = events.agg(F.max("ts").alias("__head"))
    doomed = (
        F.col("ts") < F.col("__head") - F.expr("INTERVAL 14 DAYS")
    ) & (F.col("event_type") != "purchase")
    return (
        events.crossJoin(F.broadcast(head))
        .filter(~F.coalesce(doomed, F.lit(False)))
        .select("event_id")
    )


@register(
    "status_breakdown",
    """
    SELECT event_type AS status, count(*) AS n
    FROM events GROUP BY event_type ORDER BY status
    """,
    doc="P8 status predicates + per-status grouped counts (the stats surface, "
    "duplicate_remover.py:259-266 / SURVEY.md §2.4).",
)
def q_status_breakdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    return (
        events.groupBy(F.col("event_type").alias("status"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("status")
    )


@register(
    "salted_group_agg",
    """
    SELECT user_id, count(*) AS n_events,
           SUM(CAST(FLOOR(value * 10000) AS BIGINT)) / 10000.0 AS total_value
    FROM events GROUP BY user_id
    """,
    doc="Skew-resilient two-phase salted aggregation (SURVEY.md §4 posture): "
    "group by (key, salt) then recombine by key — bit-identical to a plain "
    "GROUP BY for decomposable aggregates, which is exactly what the oracle "
    "checks.",
)
def q_salted_group_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.skew import salted_agg

    events = _t(spark, sf_dir, "events")
    pre = events.select(
        "user_id", F.floor(F.col("value") * 10000).cast("long").alias("value_fp")
    )
    out = salted_agg(
        pre,
        keys=["user_id"],
        aggs={"n_events": ("count", ""), "total_fp": ("sum", "value_fp")},
        salt_buckets=16,
    )
    return out.select(
        "user_id", "n_events", (F.col("total_fp") / 10000.0).alias("total_value")
    )


@register(
    "top_revenue_orders",
    """
    SELECT o_orderkey, o_orderdate,
           SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) / 10000.0 AS revenue
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = (SELECT min(c_mktsegment) FROM customer)
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate  > TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY o_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderkey ASC
    LIMIT 10
    """,
    doc="TPC-H Q3-shaped shipping-priority query: selective dimension filter, "
    "two joins, grouped revenue, global top-k — the canonical join+agg+topk "
    "benchmark shape.",
)
def q_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")
    seg = customer.agg(F.min("c_mktsegment").alias("seg"))
    cust = customer.join(F.broadcast(seg), customer["c_mktsegment"] == F.col("seg")).select(
        "c_custkey"
    )
    disc_fp = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
    ).cast("long")
    return (
        orders.where(F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            lineitem.where(
                F.col("l_shipdate") > F.lit("1996-01-01 00:00:00").cast("timestamp")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderkey", "o_orderdate")
        .agg((F.sum(disc_fp) / 10000.0).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


def _banded_planes_sql(dim: int, num_planes: int, num_bands: int) -> str:
    """VALUES rows (band, pidx, pv) for the banded sign-LSH oracle —
    band b's plane p is the deterministic global hyperplane
    b*num_planes + p, exactly similarity.with_lsh_bands."""
    from pasta_pipeline_spark.operators.similarity import _hyperplane

    return ",\n        ".join(
        f"({band}, {p}, "
        f"[{', '.join(repr(c) for c in _hyperplane(dim, band * num_planes + p))}]"
        "::DOUBLE[])"
        for band in range(num_bands)
        for p in range(num_planes)
    )


def _banded_eb_sql(bucket_cap: int | None = None, src_table: str = "embeddings") -> str:
    """The banded-bucket CTE, optionally wrapped in the hot-bucket cap
    rank (similarity.cap_band_buckets' DuckDB twin: row_number over
    (band, bucket) ordered by md5 of the id's decimal rendering, id
    tiebreak). With ``bucket_cap`` set, the oracle replays the exact
    membership the Spark gate keeps, so the cap is hash-checked end to
    end at any scale, binding or not."""
    from pasta_pipeline_spark.operators.similarity import bucket_cap_rank_sql

    base = f"""
    eb0 AS (
      SELECT vec_id, embedding, band,
             CAST(SUM(CASE WHEN list_dot_product(embedding::DOUBLE[], pv) >= 0
                           THEN 1::BIGINT << pidx ELSE 0 END) AS BIGINT) AS bucket
      FROM {src_table} CROSS JOIN planes GROUP BY vec_id, embedding, band
    )"""
    if bucket_cap is None:
        return base.replace("eb0 AS", "eb AS")
    return (
        base
        + f""",
    eb AS (
      SELECT vec_id, embedding, band, bucket FROM (
        SELECT vec_id, embedding, band, bucket,
               row_number() OVER (PARTITION BY band, bucket
                 ORDER BY {bucket_cap_rank_sql('vec_id')}) AS bkrn
        FROM eb0)
      WHERE bkrn <= {bucket_cap}
    )"""
    )


_BANDED_EB_SQL = _banded_eb_sql()


def _cosine_dup_lsh_oracle(
    dim: int = 64,
    num_planes: int = 4,
    num_bands: int = 2,
    threshold: float = 0.4,
    bucket_cap: int | None = DEFAULT_BUCKET_CAP,
) -> str:
    """Exact DuckDB twin of the banded-LSH near-dup path: the exact
    all-pairs join *restricted to sign-LSH band-bucket collisions*
    (OR over bands, deduped), with the deterministic plane constants
    inlined. The band restriction makes the 'approximate' result
    exactly reproducible, so the hash check covers both the banding
    and the cosine arithmetic."""
    cos = _cosine_sql("a.embedding::DOUBLE[]", "b.embedding::DOUBLE[]")
    return f"""
    WITH planes(band, pidx, pv) AS (VALUES
        {_banded_planes_sql(dim, num_planes, num_bands)}),{_banded_eb_sql(bucket_cap)},
    cand AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM eb a JOIN eb b
        ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id
    )
    SELECT c.id_a, c.id_b, {cos} AS sim
    FROM cand c
    JOIN embeddings a ON a.vec_id = c.id_a
    JOIN embeddings b ON b.vec_id = c.id_b
    WHERE {cos} >= {threshold}
    """


@register(
    "cosine_dup_pairs",
    _cosine_dup_lsh_oracle(),
    doc="Embedding-cosine near-dup pairs (vector tier of the dedup ladder), "
    "banded-LSH scale path: OR of 2 independent 4-plane sign-LSH bands "
    "gates the pair join (similarity.with_lsh_bands) — near-linear at "
    "100 TB instead of the O(n²) exact self-join, and recall GROWS with "
    "bands (1-(1-q^4)^2) so scale-up tunes bands, not planes. The oracle "
    "replays the identical banding in DuckDB, so every emitted pair is "
    "hash-checked end to end; use_lsh=False is the exact baseline.",
)
def q_cosine_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.similarity import cosine_dup_pairs

    emb = _t(spark, sf_dir, "embeddings")
    return cosine_dup_pairs(
        emb, threshold=0.4, use_lsh=True, dim=64, num_planes=4, num_bands=2
    )


@register(
    "embedding_centroids",
    """
    WITH exploded AS (
      SELECT label, unnest(generate_series(1, len(embedding))) AS pos1, embedding
      FROM embeddings
    )
    SELECT label, pos1 - 1 AS pos,
           SUM(CAST(FLOOR(embedding[pos1]::DOUBLE * 10000000) AS BIGINT)) / 10000000.0 / count(*) AS centroid
    FROM exploded GROUP BY label, pos1
    """,
    doc="Per-label centroid, one row per (label, dimension) via posexplode + "
    "fixed-point mean — grouped vector aggregation without UDFs.",
)
def q_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.similarity import label_centroids

    emb = _t(spark, sf_dir, "embeddings")
    return label_centroids(emb)


@register(
    "json_extract_agg",
    """
    SELECT event_type,
           CAST(SUM(try_cast(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
           count(try_cast(json_extract_string(props, '$.k') AS INT)) AS n_with_k
    FROM events GROUP BY event_type
    """,
    doc="JSON column surface (the reactions-JSONB analog, SURVEY.md §1.2): "
    "path extraction from the events.props JSON string + grouped aggregation. "
    "Oracle uses json_extract_string (unquoted, like Spark get_json_object) "
    "with try_cast, and casts SUM to BIGINT (DuckDB HUGEINT renders as "
    "float64 through pandas, breaking the value hash).",
)
def q_json_extract_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return events.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"), F.count(k).alias("n_with_k")
    )


_ZSCORE_ORACLE = """
    WITH ex AS (
      SELECT label, vec_id, CAST(pos1 - 1 AS INT) AS pos,
             CAST(FLOOR(embedding[pos1]::DOUBLE * 10000000) AS BIGINT) AS fp
      FROM (SELECT label, vec_id, embedding,
                   unnest(generate_series(1, len(embedding))) AS pos1
            FROM embeddings)
    ), st AS (
      SELECT label, pos, SUM(fp) AS sfp, SUM(fp * fp) AS sfp2, count(*) AS n
      FROM ex GROUP BY label, pos
    )
    SELECT ex.vec_id, ex.label, ex.pos,
           (ex.fp / 10000000.0 - sfp / 10000000.0 / n)
             / sqrt(greatest(sfp2 / 100000000000000.0 / n
                             - (sfp / 10000000.0 / n) * (sfp / 10000000.0 / n), 0.0)) AS z
    FROM ex JOIN st ON ex.label = st.label AND ex.pos = st.pos
"""


@register(
    "zscore_normalize",
    _ZSCORE_ORACLE,
    doc="Per-group normalization via grouped-map applyInPandas (one Arrow "
    "frame per label group): z-score each embedding dimension within its "
    "label. Means/variances come from exact int64 fixed-point sums inside "
    "the pandas worker, so the doubles match the SQL oracle bit-for-bit.",
)
def q_zscore_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.normalize import zscore_by_label

    emb = _t(spark, sf_dir, "embeddings")
    return zscore_by_label(emb)


def _ann_ivf_oracle(n_cells: int = 16, n_probe: int = 4, k: int = 10) -> str:
    """Exact DuckDB twin of q_ann_ivf_topk: seeding, cell assignment and
    probing are all deterministic, so the whole IVF pipeline replays in
    SQL — lowest-id seed centroids, argmax-cosine assignment (cell_id
    tiebreak), n_probe nearest cells, exact rerank."""
    cos_cv = _cosine_sql("e.embedding::DOUBLE[]", "c.cv")
    cos_qc = _cosine_sql("q.qv", "c.cv")
    cos_final = _cosine_sql("cand.embedding::DOUBLE[]", "q.qv")
    return f"""
    WITH cent AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id ASC) - 1 AS INT) AS cell_id,
             embedding::DOUBLE[] AS cv
      FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id ASC LIMIT {n_cells})
    ),
    q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings ORDER BY vec_id LIMIT 1),
    assigned AS (
      SELECT vec_id, embedding, cell_id FROM (
        SELECT e.vec_id, e.embedding, c.cell_id,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                  ORDER BY {cos_cv} DESC, c.cell_id ASC) AS rk
        FROM embeddings e CROSS JOIN cent c
      ) WHERE rk = 1
    ),
    qcells AS (
      SELECT cell_id FROM (
        SELECT c.cell_id, {cos_qc} AS csim FROM q CROSS JOIN cent c
      ) ORDER BY csim DESC, cell_id ASC LIMIT {n_probe}
    ),
    cand AS (SELECT a.vec_id, a.embedding FROM assigned a JOIN qcells USING (cell_id))
    SELECT cand.vec_id, {cos_final} AS sim
    FROM cand CROSS JOIN q
    ORDER BY sim DESC, cand.vec_id ASC LIMIT {k}
    """


@register(
    "ann_ivf_topk",
    _ann_ivf_oracle(),
    doc="IVF-flavored ANN top-10: deterministic seed centroids, one-scan "
    "cell assignment, n_probe-cell search — the partition-pruned scale "
    "path; k-means training slots in without changing the query. Fully "
    "deterministic, so the oracle replays seed/assign/probe/rerank in SQL.",
)
def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.similarity import ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    query = emb.orderBy("vec_id").limit(1).select(F.col("embedding").alias("qv"))
    return ivf_topk(emb, query, k=10, n_cells=16, n_probe=4)


@register(
    "brand_revenue",
    """
    SELECT p_brand,
           count(*) AS n_items,
           SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) / 10000.0 AS revenue,
           SUM(CAST(FLOOR(p_retailprice * 10000) AS BIGINT)) / 10000.0 AS retail_value
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
    doc="Fact-to-dimension join + grouped revenue per brand (part dimension "
    "broadcast; completes scan coverage of the part table).",
)
def q_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    disc_fp = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
    ).cast("long")
    retail_fp = F.floor(F.col("p_retailprice") * 10000).cast("long")
    return (
        lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            (F.sum(disc_fp) / 10000.0).alias("revenue"),
            (F.sum(retail_fp) / 10000.0).alias("retail_value"),
        )
    )


@register(
    "supplier_nation_balance",
    """
    SELECT n_name,
           count(*) AS n_suppliers,
           SUM(CAST(FLOOR(s_acctbal * 10000) AS BIGINT)) / 10000.0 AS total_balance
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
    """,
    doc="Supplier-dimension rollup by nation (completes scan coverage of the "
    "supplier table; both sides broadcast-small).",
)
def q_supplier_nation_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    bal_fp = F.floor(F.col("s_acctbal") * 10000).cast("long")
    return (
        supplier.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            (F.sum(bal_fp) / 10000.0).alias("total_balance"),
        )
    )


@register(
    "doc_rolling_hash",
    """
    SELECT doc_id,
           list_reduce(
             list_prepend(0::BIGINT,
               list_transform(list_filter(regexp_split_to_array(lower(text), '\\s+'), y -> y <> ''),
                              t -> ('0x' || substr(md5(t), 1, 7))::BIGINT)),
             (acc, x) -> (acc * 1000003 + x) % 2147483647) AS rhash
    FROM documents
    """,
    doc="Order-sensitive polynomial rolling-hash fingerprint over the token "
    "stream (incremental-update-friendly; the streaming fingerprint tier), "
    "exact int64 arithmetic in both engines.",
)
def q_doc_rolling_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.functions.hashing import rolling_hash

    docs = _tp(spark, sf_dir, "documents")
    return docs.select("doc_id", rolling_hash("text").alias("rhash"))


@register(
    "url_validation",
    """
    SELECT doc_id, url,
           (url LIKE 'https://telegra.ph/%' AND length(url) > length('https://telegra.ph/')) AS is_valid
    FROM (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN 'https://telegra.ph/' || source || '-' || doc_id
                  WHEN doc_id % 3 = 1 THEN 'https://example.com/' || doc_id
                  ELSE 'http://telegra.ph/' || doc_id END AS url
      FROM documents
    )
    """,
    doc="P7/F8 URL validation (telegraph_processor.py:117-125) over constructed "
    "URLs: scheme https + host telegra.ph + non-trivial path. The Spark side "
    "uses try_parse_url components; the oracle the equivalent string predicate "
    "(identical on well-formed inputs by construction).",
)
def q_url_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.functions.urls import is_valid_telegraph_url

    docs = _t(spark, sf_dir, "documents")
    url = (
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit("https://telegra.ph/"), F.col("source"), F.lit("-"), F.col("doc_id")),
        )
        .when(F.col("doc_id") % 3 == 1, F.concat(F.lit("https://example.com/"), F.col("doc_id")))
        .otherwise(F.concat(F.lit("http://telegra.ph/"), F.col("doc_id")))
    )
    return docs.select(
        "doc_id", url.alias("url"), is_valid_telegraph_url(url).alias("is_valid")
    )


_CLUSTERS_ORACLE = """
    WITH RECURSIVE pairs AS (
""" + _JACCARD_ORACLE.replace("documents", "documents", 1) + """
    ), edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM pairs
    ), cc(node, lbl) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.dst, c.lbl FROM cc c JOIN edges e ON c.node = e.src
    )
    SELECT node AS doc_id, min(lbl) AS cluster_id,
           (node = min(lbl)) AS is_survivor
    FROM cc GROUP BY node
"""


@register(
    "dedup_clusters",
    _CLUSTERS_ORACLE,
    doc="Duplicate-cluster assignment: connected components over the "
    "near-dup pair graph (3-gram Jaccard >= 0.5), labeled by the smallest "
    "member id = the deterministic survivor. Spark runs iterative min-label "
    "propagation (join-based CC, the 100 TB-scale form); the oracle computes "
    "the same closure with a recursive CTE.",
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.text_dedup import duplicate_clusters, jaccard_pairs
    from pasta_pipeline_spark.operators.util import release_cached_deps

    docs = _t(spark, sf_dir, "documents")
    pairs = jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5)
    out = duplicate_clusters(docs, pairs)
    # duplicate_clusters materialized the pair plan in its fixpoint
    # loop, so the shingle cache jaccard_pairs attached can go now
    release_cached_deps(pairs)
    return out


@register(
    "cheapest_part_per_type",
    """
    SELECT p.p_partkey, p.p_type, p.p_retailprice
    FROM part p
    WHERE p.p_retailprice = (SELECT min(p2.p_retailprice) FROM part p2 WHERE p2.p_type = p.p_type)
    ORDER BY p.p_partkey
    """,
    doc="TPC-H Q2-shaped correlated-min: parts priced at their type's minimum. "
    "Spark expresses the correlated scalar subquery as a window min — one "
    "shuffle instead of a rewritten join.",
)
def q_cheapest_part_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    w = Window.partitionBy("p_type")
    return (
        part.withColumn("__min_price", F.min("p_retailprice").over(w))
        .where(F.col("p_retailprice") == F.col("__min_price"))
        .select("p_partkey", "p_type", "p_retailprice")
        .orderBy("p_partkey")
    )


@register(
    "late_order_priority",
    """
    SELECT o_orderpriority, count(*) AS n_late
    FROM orders
    WHERE EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 60 DAY
    )
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4-shaped exists-aggregate: orders with any lineitem shipped "
    "60+ days after the order date, counted per priority — semi-join feeding "
    "an aggregation.",
)
def q_late_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    late = orders.join(lineitem, cond, "left_semi")
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_late"))


@register(
    "supplier_count_per_brand",
    """
    SELECT p_brand, count(DISTINCT l_suppkey) AS n_suppliers
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
    doc="TPC-H Q16-shaped distinct-count per group: supplier diversity per "
    "brand — grouped COUNT(DISTINCT) over a dimension join (two-phase "
    "aggregation under the hood).",
)
def q_supplier_count_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(F.countDistinct("l_suppkey").alias("n_suppliers"))
    )


@register(
    "user_event_history",
    """
    SELECT user_id,
           array_to_string(list_sort(list(event_type)), ',') AS history
    FROM events GROUP BY user_id
    """,
    doc="collect_list aggregation surface: per-user event-type multiset, "
    "sorted and joined to a scalar so the comparison is deterministic and "
    "hash-friendly (array-typed outputs render differently across engines).",
)
def q_user_event_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    return events.groupBy("user_id").agg(
        F.array_join(F.array_sort(F.collect_list("event_type")), ",").alias("history")
    )


@register(
    "pivot_event_counts",
    """
    SELECT user_id,
           count(CASE WHEN event_type = 'click'    THEN 1 END) AS n_click,
           count(CASE WHEN event_type = 'view'     THEN 1 END) AS n_view,
           count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
           count(CASE WHEN event_type = 'signup'   THEN 1 END) AS n_signup,
           count(CASE WHEN event_type = 'error'    THEN 1 END) AS n_error
    FROM events GROUP BY user_id
    """,
    doc="Pivot surface: per-user counts spread across a fixed event-type "
    "column set (explicit value list keeps the output schema deterministic; "
    "Spark compiles pivot to the same conditional-aggregate form the oracle "
    "spells out).",
)
def q_pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    kinds = ["click", "view", "purchase", "signup", "error"]
    pivoted = (
        events.groupBy("user_id")
        .pivot("event_type", kinds)
        .agg(F.count(F.lit(1)))
    )
    out = pivoted.select(
        "user_id", *[F.coalesce(F.col(k), F.lit(0)).alias(f"n_{k}") for k in kinds]
    )
    return out


@register(
    "set_ops_active_users",
    """
    SELECT user_id FROM (
      SELECT user_id FROM events WHERE ts <  TIMESTAMP '2024-01-15 00:00:00'
      INTERSECT
      SELECT user_id FROM events WHERE ts >= TIMESTAMP '2024-01-15 00:00:00'
    )
    EXCEPT
    SELECT user_id FROM events
    WHERE event_type = 'error' AND ts < TIMESTAMP '2024-01-03 00:00:00'
    """,
    doc="Set-operation surface (SURVEY.md §2.7): users active in both halves "
    "of the month (INTERSECT) minus those who errored in the first two days "
    "(EXCEPT).",
)
def q_set_ops_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    cut = F.lit("2024-01-15 00:00:00").cast("timestamp")
    first_half = events.where(F.col("ts") < cut).select("user_id")
    second_half = events.where(F.col("ts") >= cut).select("user_id")
    erroring = events.where(
        (F.col("event_type") == "error")
        & (F.col("ts") < F.lit("2024-01-03 00:00:00").cast("timestamp"))
    ).select("user_id")
    return first_half.intersect(second_half).exceptAll(erroring.distinct())


@register(
    "rollup_revenue",
    """
    SELECT r_name, n_name,
           CAST(GROUPING(r_name) * 2 + GROUPING(n_name) AS INT) AS gid,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP(r_name, n_name)
    """,
    doc="ROLLUP subtotal surface: revenue at (region, nation), per-region "
    "subtotal, and grand total in ONE aggregation pass — Spark plans a "
    "single Expand + hash aggregate, not three scans; grouping id "
    "disambiguates genuine NULL keys from subtotal rows. Fixed-point "
    "cents keep every level hash-exact. Dims broadcast; one fact "
    "shuffle.",
)
def q_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    j = (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(nation, cust["c_nationkey"] == nation["n_nationkey"])
        .join(region, nation["n_regionkey"] == region["r_regionkey"])
    )
    cents = F.floor(F.col("o_totalprice") * 100).cast("long")
    return (
        j.rollup("r_name", "n_name")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.sum(cents).cast("long").alias("revenue_cents"),
            F.count(F.lit(1)).cast("long").alias("n_orders"),
        )
        .select("r_name", "n_name", "gid", "revenue_cents", "n_orders")
    )


def _edit_distance_oracle(block_cap: int = 256) -> str:
    from pasta_pipeline_spark.operators.similarity import bucket_cap_rank_sql

    return f"""
    WITH src AS (SELECT doc_id AS doc, lower(substr(text, 1, 40)) AS pfx FROM documents),
    blocks0 AS (
      SELECT doc, CAST(i AS VARCHAR) || ':' || substr(pfx, i*8+1, 8) AS bk
      FROM src CROSS JOIN (SELECT unnest(generate_series(0, 4)) AS i) g
      WHERE substr(pfx, i*8+1, 8) <> ''
    ),
    blocks AS (
      SELECT doc, bk FROM (
        SELECT doc, bk,
               row_number() OVER (PARTITION BY bk
                 ORDER BY {bucket_cap_rank_sql('doc')}) AS bkrn
        FROM blocks0)
      WHERE bkrn <= {block_cap}
    ),
    cand AS (SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
             FROM blocks a JOIN blocks b ON a.bk = b.bk AND a.doc < b.doc)
    SELECT c.doc_a, c.doc_b, levenshtein(sa.pfx, sb.pfx) AS dist
    FROM cand c JOIN src sa ON c.doc_a = sa.doc JOIN src sb ON c.doc_b = sb.doc
    WHERE levenshtein(sa.pfx, sb.pfx) <= 15
    """


@register(
    "edit_distance_pairs",
    _edit_distance_oracle(),
    doc="Edit-distance fuzzy matching (character-level dedup tier) over the "
    "whole corpus — block-gated, no id cap, no cross join: candidates must "
    "share one of 5 fixed-position 8-char slices of the lowercased 40-char "
    "prefix (inverted-index generation, hot-block fallback), then exact "
    "Levenshtein verifies. Recall is pigeonhole-exact for <= 4 "
    "substitutions. r13: each (slice, text) block is capped at 256 "
    "members by the deterministic md5-rank (cap_band_buckets' guard, "
    "replayed by the oracle) — Zipf-common prefixes previously grew "
    "blocks linearly with the corpus and Σdf² quadratically (sf10 "
    "ladder: 442 s, ratio 61.9 before the cap; 81.8 s after) — the "
    "capped candidate volume is blocks·cap²/2, linear in the corpus; "
    "fixture recall cost 14% at sf1 (low-entropy worst case).",
)
def q_edit_distance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.text_dedup import edit_distance_pairs

    docs = _t(spark, sf_dir, "documents")
    return edit_distance_pairs(
        docs, "doc_id", "text", prefix_len=40, max_dist=15, n_chunks=5,
        block_cap=256,
    )


