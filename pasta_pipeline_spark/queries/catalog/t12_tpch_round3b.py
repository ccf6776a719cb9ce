"""Catalog tier: TPC-H round 3 + extension surface, part B.

Split verbatim from the r8 catalog monolith (r8 verdict ask #4).
Registration order is preserved by the package __init__ import
order; registration stays APPEND-ONLY — new queries go at the end
of the LAST tier module (or a new one imported last).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import SparkSession
from pasta_pipeline_spark.queries.catalog._core import _t, _tp, register
from pasta_pipeline_spark.queries.catalog.t03_dedup_ladder import _JACCARD_ORACLE
from pasta_pipeline_spark.queries.catalog.t05_multimodal import _CLUSTERS_ORACLE, _MEDIA_REAL_ORACLE
from pasta_pipeline_spark.queries.catalog.t11_tpch_round3a import _URL_VARIANTS_SQL

@register(
    "url_dedup",
    f"""
    WITH src AS ({_URL_VARIANTS_SQL}),
    canon AS (
      SELECT doc_id,
             CASE WHEN regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1) <> ''
                   AND regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1) <> ''
             THEN
               lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) || '://' ||
               (CASE lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
                  WHEN 'https' THEN regexp_replace(lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)), ':443$', '')
                  WHEN 'http' THEN regexp_replace(lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)), ':80$', '')
                  ELSE lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1))
                END) ||
               regexp_replace(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1), '/+$', '') ||
               (CASE WHEN array_to_string(list_sort(list_filter(string_split(regexp_extract(url, '\\?([^#]*)', 1), '&'),
                       p -> p <> '' AND NOT regexp_matches(p, '^(utm_[^=]*|fbclid|gclid|ref_src|ref_url|mc_cid|mc_eid)='))), '&') <> ''
                 THEN '?' || array_to_string(list_sort(list_filter(string_split(regexp_extract(url, '\\?([^#]*)', 1), '&'),
                       p -> p <> '' AND NOT regexp_matches(p, '^(utm_[^=]*|fbclid|gclid|ref_src|ref_url|mc_cid|mc_eid)='))), '&')
                 ELSE '' END)
             END AS canonical_url
      FROM src
    )
    SELECT canonical_url,
           CAST(count(*) AS BIGINT) AS n_variants,
           CAST(MIN(doc_id) AS BIGINT) AS keep_id
    FROM canon GROUP BY canonical_url
    """,
    doc="URL-level dedup (the tier BEFORE text dedup in a web-corpus "
    "pipeline): crawl variants of the same page — tracking params, "
    "fragments, case-variant hosts, default ports, trailing slashes, "
    "permuted query params — collapse to one canonical URL "
    "(functions/urls.py canonicalize_url, pure expressions), then "
    "keep-first by id. Variant URLs are synthesized deterministically "
    "from doc ids so the oracle replays canonicalization bit-for-bit.",
)
def q_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.functions.urls import canonicalize_url

    docs = _t(spark, sf_dir, "documents")
    url = (
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(F.lit("https://Example.COM/path"), F.expr("doc_id div 4"),
                     F.lit("/?utm_source=x&b=2&a=1#frag")),
        )
        .when(
            F.col("doc_id") % 4 == 1,
            F.concat(F.lit("https://example.com/path"), F.expr("doc_id div 4"),
                     F.lit("?a=1&b=2")),
        )
        .when(
            F.col("doc_id") % 4 == 2,
            F.concat(F.lit("https://example.com:443/path"), F.expr("doc_id div 4"),
                     F.lit("/#section")),
        )
        .otherwise(F.concat(F.lit("http://other.net:80/p"), F.col("doc_id")))
    )
    canon = docs.select(
        "doc_id", canonicalize_url(url).alias("canonical_url")
    )
    return canon.groupBy("canonical_url").agg(
        F.count(F.lit(1)).cast("long").alias("n_variants"),
        F.min("doc_id").cast("long").alias("keep_id"),
    )


@register(
    "pseudonymize_join",
    """
    WITH c AS (
      SELECT substr(sha256('r4:' || CAST(c_custkey AS VARCHAR)), 1, 16) AS pid,
             c_acctbal
      FROM customer
    ), o AS (
      SELECT substr(sha256('r4:' || CAST(o_custkey AS VARCHAR)), 1, 16) AS pid,
             CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    )
    SELECT c.pid,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(SUM(o.cents) AS BIGINT) AS revenue_cents
    FROM c JOIN o ON c.pid = o.pid
    GROUP BY c.pid
    """,
    doc="Keyed pseudonymization that PRESERVES joins: customer and order "
    "ids are replaced by salted sha256 pseudonyms (operators/pii.py "
    "pseudonymize — JVM sha2 == DuckDB sha256 bit-for-bit) and the "
    "revenue join/aggregate still works on the pseudonymized keys — the "
    "governance contract (no raw IDs downstream, same relational "
    "algebra). One projection per side; join/agg unchanged.",
)
def q_pseudonymize_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.pii import pseudonymize

    cust = _t(spark, sf_dir, "customer").select(
        pseudonymize("c_custkey", "r4").alias("pid")
    )
    orders = _t(spark, sf_dir, "orders").select(
        pseudonymize("o_custkey", "r4").alias("pid"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    return cust.join(orders, "pid").groupBy("pid").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("cents").cast("long").alias("revenue_cents"),
    )


@register(
    "grouping_sets_revenue",
    """
    SELECT r_name, o_orderstatus,
           CAST(GROUPING(r_name) * 2 + GROUPING(o_orderstatus) AS INT) AS gid,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY GROUPING SETS ((r_name), (o_orderstatus))
    """,
    doc="Explicit GROUPING SETS (the general form ROLLUP/CUBE "
    "specialize): per-region revenue AND per-status revenue in one "
    "Expand + hash-aggregate pass — two independent breakdowns for one "
    "fact scan, the 100 TB argument for grouping sets over two "
    "queries. Spark 4 groupingSets DataFrame API; grouping-id "
    "disambiguates which set a row belongs to.",
)
def q_grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
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
        j.groupingSets([["r_name"], ["o_orderstatus"]], "r_name", "o_orderstatus")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.sum(cents).cast("long").alias("revenue_cents"),
        )
        .select("r_name", "o_orderstatus", "gid", "revenue_cents")
    )


@register(
    "dedup_weights",
    f"""
    WITH sizes AS (
      SELECT cluster_id, CAST(count(*) AS BIGINT) AS csize
      FROM ( {_CLUSTERS_ORACLE} ) GROUP BY cluster_id
    )
    SELECT c.doc_id, c.cluster_id, s.csize,
           CAST(10000 // s.csize AS BIGINT) AS weight_bp
    FROM ( {_CLUSTERS_ORACLE} ) c JOIN sizes s USING (cluster_id)
    """,
    doc="Soft dedup: instead of DROPPING duplicates, every member of a "
    "near-dup cluster gets sampling weight 1/cluster_size (integer "
    "basis points) so the GROUP contributes one document's worth of "
    "training mass while keeping variant coverage — the down-weighting "
    "alternative the SemDedup/DataComp ablations compare against "
    "hard removal. Cluster sizes from one groupBy over the connected "
    "components; weight arithmetic is integer division (both engines "
    "truncate).",
)
def q_dedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.text_dedup import (
        duplicate_clusters,
        jaccard_pairs,
    )
    from pasta_pipeline_spark.operators.util import release_cached_deps

    docs = _t(spark, sf_dir, "documents")
    pairs = jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5)
    clusters = duplicate_clusters(docs.select("doc_id"), pairs, id_col="doc_id")
    release_cached_deps(pairs)
    sizes = clusters.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("csize")
    )
    return (
        clusters.select("doc_id", "cluster_id")
        .join(sizes, "cluster_id")
        .select(
            "doc_id",
            "cluster_id",
            "csize",
            F.expr("10000 div csize").cast("long").alias("weight_bp"),
        )
    )


@register(
    "media_real_decode",
    _MEDIA_REAL_ORACLE,
    doc="REAL media decode, end-to-end hash-checked: synthesize_media "
    "builds true RIFF/WAVE files (even ids) and binary PPM images (odd "
    "ids) whose format parameters are integer functions of the id; "
    "extract_media_features(decode='real') parses the actual bytes back "
    "— WAV fmt/data chunk walk for sample rate/channels/duration, PPM "
    "header scan for dimensions — and the oracle computes the expected "
    "features from the ids alone. A decoder bug (wrong chunk offset, "
    "wrong block-align handling, header misparse) breaks the hash. "
    "operators/multimodal.py decode_wav / decode_ppm.",
)
def q_media_real_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.multimodal import (
        extract_media_features,
        synthesize_media,
    )

    docs = _tp(spark, sf_dir, "documents").select(F.col("doc_id"))
    media = synthesize_media(docs, id_col="doc_id")
    return extract_media_features(media, decode="real").select(
        "media_id", "media_type", "n_bytes", "width", "height",
        "duration_ms", "sample_rate",
    )


@register(
    "heavy_hitter_bounded",
    """
    WITH counts AS (
      SELECT l_linestatus, l_suppkey AS item, CAST(count(*) AS BIGINT) AS n
      FROM lineitem WHERE l_suppkey IS NOT NULL GROUP BY 1, 2
    ), ranked AS (
      SELECT l_linestatus, item, n,
             row_number() OVER (PARTITION BY l_linestatus
                                ORDER BY n DESC, item ASC) AS rk
      FROM counts
    )
    SELECT l_linestatus, item, n FROM ranked WHERE rk <= 8
    UNION ALL
    SELECT l_linestatus, CAST(NULL AS BIGINT) AS item,
           CAST(SUM(n) AS BIGINT) AS n
    FROM ranked WHERE rk > 8 GROUP BY l_linestatus
    """,
    doc="Heavy hitters through the BOUNDED-shuffle path (the "
    "sketches.partial_heavy_hitters default): the Arrow-batched "
    "per-partition truncation stage runs with a cap high enough that "
    "no truncation occurs at test scale, so the result is provably "
    "identical to the exact groupBy — which hash-checks the pandas "
    "counting stage itself (local count merge, per-key emission, "
    "dropped-mass sentinel plumbing) against plain SQL. The "
    "truncation *bound* under small caps is pytest-verified "
    "(test_heavy_hitter_partition_cap_bounds_shuffle).",
)
def q_heavy_hitter_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.sketches import partial_heavy_hitters

    li = _t(spark, sf_dir, "lineitem")
    return partial_heavy_hitters(
        li, "l_linestatus", "l_suppkey", m=8, partition_cap=1_000_000
    )


_MEDIA_CONTAINER_ORACLE = """
    SELECT doc_id AS media_id,
           CASE WHEN doc_id % 2 = 0 THEN 'image/png' ELSE 'audio/flac' END AS media_type,
           CAST(CASE WHEN doc_id % 2 = 0
                THEN 107 + doc_id % 100
                ELSE 72 + doc_id % 70
           END AS BIGINT) AS n_bytes,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 32 + doc_id % 256 END AS INT) AS width,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 32 + (doc_id // 5) % 128 END AS INT) AS height,
           CAST(CASE WHEN doc_id % 2 = 1
                THEN (10000 + (doc_id % 89) * 100) * 1000
                     // (8000 + (doc_id % 5) * 4000)
           END AS BIGINT) AS duration_ms,
           CAST(CASE WHEN doc_id % 2 = 1
                THEN 8000 + (doc_id % 5) * 4000
           END AS INT) AS sample_rate
    FROM documents
"""


@register(
    "media_container_decode",
    _MEDIA_CONTAINER_ORACLE,
    doc="REAL compressed-container header decode, end-to-end "
    "hash-checked: synthesize_media(variant='containers') builds PNG "
    "files with true IHDR chunks + CRC32s (even ids) and FLAC streams "
    "with a true STREAMINFO metadata block (odd ids), parameters "
    "integer functions of the id; extract_media_features(decode='real') "
    "parses the actual bytes back — big-endian IHDR walk for "
    "dimensions, STREAMINFO bit-unpack (20-bit rate / 36-bit total "
    "samples) for rate and duration — and the oracle computes the "
    "expected features from the ids alone. Only the pixel/frame DATA "
    "of these formats needs a codec library; the headers don't, so "
    "this is the honest no-dependency real tier for compressed "
    "containers. operators/multimodal.py decode_png / decode_flac.",
)
def q_media_container_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.multimodal import (
        extract_media_features,
        synthesize_media,
    )

    docs = _tp(spark, sf_dir, "documents").select(F.col("doc_id"))
    media = synthesize_media(docs, id_col="doc_id", variant="containers")
    return extract_media_features(media, decode="real").select(
        "media_id", "media_type", "n_bytes", "width", "height",
        "duration_ms", "sample_rate",
    )


_VIDEO_FRAME_ORACLE = """
    WITH geo AS (
      SELECT doc_id AS media_id,
             16 + (doc_id % 8) * 2 AS w,
             16 + ((doc_id // 7) % 8) * 2 AS h,
             5 + doc_id % 10 AS fps,
             3 + doc_id % 12 AS nf
      FROM documents
    ), g2 AS (
      SELECT media_id, w, h, fps, nf, nf * 1000 // fps AS dur FROM geo
    ), ts AS (
      SELECT media_id, w, h, fps, nf,
             unnest(generate_series(0, dur - 1, 500)) AS frame_ts_ms
      FROM g2
    ), fr AS (
      SELECT media_id, w, h,
             CAST(frame_ts_ms AS BIGINT) AS frame_ts_ms,
             least(frame_ts_ms * fps // 1000, nf - 1) AS frame_idx
      FROM ts
    ), px AS (
      SELECT media_id, frame_ts_ms, frame_idx,
             unnest(generate_series(0, w * h - 1)) AS i
      FROM fr
    )
    SELECT media_id, frame_ts_ms, CAST(frame_idx AS BIGINT) AS frame_idx,
           CAST(SUM((i * 13 + media_id + frame_idx * 31) % 256) AS BIGINT) AS luma_sum
    FROM px
    GROUP BY media_id, frame_ts_ms, frame_idx
"""


@register(
    "video_frame_sample",
    _VIDEO_FRAME_ORACLE,
    doc="REAL video frame sampling, end-to-end hash-checked: "
    "synthesize_media(variant='video') builds true YUV4MPEG2 streams "
    "(the standard uncompressed video container) with id-derived "
    "geometry/rate/frame-count and per-frame luma bytes; "
    "sample_video_frames parses the header, seeks to the frame "
    "covering each 500 ms grid point, and DECODES that frame's luma "
    "plane — the emitted luma_sum comes from the actual bytes at the "
    "actual frame offset, and the oracle recomputes it from the id "
    "recipe alone, so a seek, stride, or plane-order bug breaks the "
    "hash. The honesty upgrade frame_sample_stub documents: sampled "
    "frames are decoded, not stubbed. operators/multimodal.py "
    "decode_y4m / sample_video_frames.",
)
def q_video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.multimodal import (
        sample_video_frames,
        synthesize_media,
    )

    docs = _tp(spark, sf_dir, "documents").select(F.col("doc_id"))
    media = synthesize_media(docs, id_col="doc_id", variant="video")
    return sample_video_frames(media, every_ms=500).select(
        "media_id", "frame_ts_ms", "frame_idx", "luma_sum"
    )


@register(
    "cluster_merge_text",
    f"""
    WITH j AS (
      SELECT c.doc_id, c.cluster_id, d.n_chars, d.text
      FROM ( {_CLUSTERS_ORACLE} ) c
      JOIN documents d ON c.doc_id = d.doc_id
    ), r AS (
      SELECT *, row_number() OVER (PARTITION BY cluster_id
                                   ORDER BY n_chars DESC, doc_id) AS rk
      FROM j
    ), s AS (
      SELECT cluster_id, CAST(doc_id AS BIGINT) AS canonical_id,
             text AS canonical_text
      FROM r WHERE rk = 1
    ), m AS (
      SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members,
             CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS sum_n_chars
      FROM j GROUP BY cluster_id
    )
    SELECT s.cluster_id, s.canonical_id, s.canonical_text,
           m.n_members, m.sum_n_chars
    FROM s JOIN m USING (cluster_id)
    """,
    doc="Per-cluster survivor TEXT merge — the dedup ladder's "
    "write-back record in one pass: each 3-gram-Jaccard cluster "
    "collapses to a canonical row carrying the policy-chosen "
    "survivor's text (longest member, id tiebreak) AND the group's "
    "merged metadata (member count, byte mass). Fused into a single "
    "groupBy via max_by over a (score, -id) ordering struct — one "
    "shuffle where composing select_survivors + cluster_rollup + "
    "re-join costs three. The oracle computes the same record with a "
    "window + groupBy + join, so the fused plan is hash-checked "
    "against the composition it replaces. operators/text_dedup.py "
    "cluster_merge_text.",
)
def q_cluster_merge_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.text_dedup import (
        cluster_merge_text,
        duplicate_clusters,
        jaccard_pairs,
    )
    from pasta_pipeline_spark.operators.util import release_cached_deps

    docs = _t(spark, sf_dir, "documents")
    pairs = jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5)
    clusters = duplicate_clusters(docs.select("doc_id"), pairs, id_col="doc_id")
    release_cached_deps(pairs)
    return cluster_merge_text(
        clusters, docs.select("doc_id", "n_chars", "text"),
        score_col="n_chars", sum_cols=["n_chars"],
    )


def _psl_oracle() -> str:
    from pasta_pipeline_spark.functions.urls import PSL_MULTI_SUFFIXES

    two = ", ".join(f"'{s}'" for s in PSL_MULTI_SUFFIXES if s.count(".") == 1)
    three = ", ".join(f"'{s}'" for s in PSL_MULTI_SUFFIXES if s.count(".") == 2)
    return f"""
    WITH u AS (
      SELECT doc_id,
             CASE doc_id % 7
               WHEN 0 THEN 'news.bbc.co.uk'
               WHEN 1 THEN 'shop.books.com.au'
               WHEN 2 THEN 'cdn.assets.example.com'
               WHEN 3 THEN 'example.org'
               WHEN 4 THEN 'www.site' || CAST(doc_id // 6 AS VARCHAR) || '.co.jp'
               WHEN 5 THEN 'www.hillside.act.edu.au'
               ELSE 'deep.sub.docs.wiki.org' END AS host
      FROM documents
    ), l AS (
      SELECT doc_id, host, string_split(host, '.') AS ls, len(string_split(host, '.')) AS n
      FROM u
    )
    SELECT CASE
             WHEN n >= 4 AND array_to_string(ls[n-2:n], '.') IN ({three})
               THEN array_to_string(ls[n-3:n], '.')
             WHEN n >= 3 AND array_to_string(ls[n-1:n], '.') IN ({two})
                  AND NOT (n = 3 AND host IN ({three}))
               THEN array_to_string(ls[n-2:n], '.')
             ELSE regexp_extract(host, '([^.]+\\.[^.]+)$', 1)
           END AS domain,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM l
    GROUP BY 1
    """


@register(
    "domain_stats_psl",
    _psl_oracle(),
    doc="Public-suffix-aware registrable-domain stats — the precision "
    "upgrade over the last-two-labels rule (functions/urls.py "
    "registrable_domain_psl): news.bbc.co.uk folds into bbc.co.uk, "
    "not co.uk, so per-site crawl budgets and blocklists aggregate at "
    "the true registrant boundary. The multi-label suffix subset "
    "(publicsuffix.org, public data) is inlined into scan predicates "
    "— zero joins; the full-list path is a broadcast join "
    "(registrable_domain_join, pytest). The oracle inlines the SAME "
    "suffix list from the same constant, so the two sides cannot "
    "drift. Hosts synthesized deterministically from doc ids.",
)
def q_domain_stats_psl(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.functions.urls import registrable_domain_psl

    docs = _t(spark, sf_dir, "documents")
    host = (
        F.when(F.col("doc_id") % 7 == 0, F.lit("news.bbc.co.uk"))
        .when(F.col("doc_id") % 7 == 1, F.lit("shop.books.com.au"))
        .when(F.col("doc_id") % 7 == 2, F.lit("cdn.assets.example.com"))
        .when(F.col("doc_id") % 7 == 3, F.lit("example.org"))
        .when(
            F.col("doc_id") % 7 == 4,
            F.concat(F.lit("www.site"), F.expr("doc_id div 6"), F.lit(".co.jp")),
        )
        .when(F.col("doc_id") % 7 == 5, F.lit("www.hillside.act.edu.au"))
        .otherwise(F.lit("deep.sub.docs.wiki.org"))
    )
    return (
        docs.select(registrable_domain_psl(host).alias("domain"))
        .groupBy("domain")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )


@register(
    "pair_ttl_report",
    """
    WITH h AS (
      SELECT doc_id AS a, doc_id + 1000000 AS b, CAST(doc_id % 7 AS BIGINT) AS bt
      FROM documents
      UNION ALL
      SELECT doc_id, doc_id + 1000000,
             CAST(doc_id % 7 + 1 + doc_id % 4 AS BIGINT)
      FROM documents
    ), det AS (
      SELECT DISTINCT a, b, bt FROM h
    ), fb AS (
      SELECT a, b, bt, MIN(bt) OVER (PARTITION BY a, b) AS first_b FROM det
    ), bs AS (
      SELECT bt,
             SUM(CASE WHEN first_b = bt THEN 1 ELSE 0 END) AS n_new,
             SUM(CASE WHEN first_b < bt THEN 1 ELSE 0 END) AS n_redetected
      FROM fb GROUP BY 1
    ), marked AS (
      SELECT a, b, bt,
             CASE WHEN bt > COALESCE(MAX(bt + 2) OVER (
                    PARTITION BY a, b ORDER BY bt
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -9999) + 1
                  THEN 1 ELSE 0 END AS brk
      FROM det
    ), isl AS (
      SELECT a, b, bt,
             SUM(brk) OVER (PARTITION BY a, b ORDER BY bt
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      FROM marked
    ), iv AS (
      SELECT a, b, island, MIN(bt) AS s, MAX(bt) + 2 AS e
      FROM isl GROUP BY 1, 2, 3
    ), deltas AS (
      SELECT s AS bt, 1 AS d FROM iv
      UNION ALL
      SELECT e + 1, -1 FROM iv
    ), dsum AS (
      SELECT bt, SUM(d) AS d FROM deltas GROUP BY 1
    ), spine AS (
      SELECT unnest(generate_series((SELECT MIN(bt) FROM det),
                                    (SELECT MAX(bt) FROM det))) AS bt
    ), act AS (
      SELECT spine.bt,
             SUM(COALESCE(dsum.d, 0)) OVER (ORDER BY spine.bt
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_active
      FROM spine LEFT JOIN dsum ON spine.bt = dsum.bt
    )
    SELECT CAST(act.bt AS BIGINT) AS batch_id,
           CAST(COALESCE(bs.n_new, 0) AS BIGINT) AS n_new,
           CAST(COALESCE(bs.n_redetected, 0) AS BIGINT) AS n_redetected,
           CAST(act.n_active AS BIGINT) AS n_active
    FROM act LEFT JOIN bs ON act.bt = bs.bt
    """,
    doc="Dedup-pair lifecycle report under a TTL (operators/pair_ttl.py "
    "pair_history_report — the batch consumer of the streaming LSH "
    "index's pair history): per batch, NEW pairs, re-confirmations, "
    "and the TTL-active working set. Active counts are delta-encoded "
    "— per-pair alive-intervals merge via gaps-and-islands (the "
    "duplicated_spans idiom), each island emits +1/-1 boundary deltas, "
    "and a running sum over the batch SPINE (time-range-bounded "
    "metadata, not corpus mass) produces the counts — no detection×TTL "
    "explosion, no range join. History synthesized deterministically: "
    "two detections per pair at id-derived batches, ttl=3, so islands "
    "both merge and split.",
)
def q_pair_ttl_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.pair_ttl import pair_history_report

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    h1 = docs.select(
        F.col("doc_id").alias("doc_a"),
        (F.col("doc_id") + 1000000).alias("doc_b"),
        (F.col("doc_id") % 7).cast("long").alias("batch_id"),
    )
    h2 = docs.select(
        F.col("doc_id").alias("doc_a"),
        (F.col("doc_id") + 1000000).alias("doc_b"),
        (F.col("doc_id") % 7 + 1 + F.col("doc_id") % 4).cast("long").alias("batch_id"),
    )
    # cached det table stays attached; the harness releases after
    # materializing (the standard attach_cached_deps contract)
    return pair_history_report(h1.unionByName(h2), ttl=3)


def _divergence_oracle() -> str:
    from pasta_pipeline_spark.operators.divergence import js_excl_sql, js_term_sql

    return f"""
    WITH toks AS (
      SELECT source,
             unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                y -> y <> '')) AS tok
      FROM documents WHERE text IS NOT NULL
    ), cnts AS (
      SELECT source, tok, CAST(count(*) AS BIGINT) AS c
      FROM toks GROUP BY 1, 2
    ), tots AS (
      SELECT source, CAST(SUM(c) AS BIGINT) AS t FROM cnts GROUP BY 1
    ), d AS (
      SELECT c.source, c.tok, c.c, t.t FROM cnts c JOIN tots t USING (source)
    ), inter AS (
      SELECT a.source AS source_a, b.source AS source_b, a.t AS ta, b.t AS tb,
             CAST(SUM(CAST({js_term_sql().replace('ca', 'a.c').replace('cb', 'b.c').replace('/ta', '/a.t').replace('/tb', '/b.t')} AS BIGINT)) AS BIGINT) AS inner_fp,
             CAST(SUM(a.c) AS BIGINT) AS inter_a,
             CAST(SUM(b.c) AS BIGINT) AS inter_b,
             CAST(count(*) AS BIGINT) AS n_common_tokens
      FROM d a JOIN d b ON a.tok = b.tok AND a.source < b.source
      GROUP BY 1, 2, 3, 4
    )
    SELECT source_a, source_b, n_common_tokens,
           CAST(inner_fp + CAST({js_excl_sql()} AS BIGINT) AS BIGINT) AS js_fp
    FROM inter
    """


@register(
    "source_divergence",
    _divergence_oracle(),
    doc="Pairwise Jensen-Shannon divergence between source token "
    "distributions (operators/divergence.py) — the statistical corpus "
    "comparison a training-mix designer uses to spot redundant or "
    "drifting sources. Intersection terms come from one token "
    "equi-join (inverted-index skeleton); exclusive-vocabulary mass "
    "folds in closed form (0.5·ln2·mass) so no outer join and no "
    "union-vocab explosion. Per-token JS terms floor to fixed point "
    "BEFORE the sum (int64, order-independent) and the formula is one "
    "shared expression string — hash-exact across engines despite ln "
    "and double ratios.",
)
def q_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.divergence import source_token_divergence

    docs = _t(spark, sf_dir, "documents")
    return source_token_divergence(docs)


@register(
    "shard_rebalance",
    """
    WITH shards16 AS (
      SELECT unnest(generate_series(0, 15)) AS s
    ), shards17 AS (
      SELECT unnest(generate_series(0, 16)) AS s
    ), w16 AS (
      SELECT d.doc_id, s.s,
             ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':' || CAST(s.s AS VARCHAR)), 1, 15))::BIGINT AS wt
      FROM documents d CROSS JOIN shards16 s
    ), a16 AS (
      SELECT doc_id, s AS shard16 FROM (
        SELECT doc_id, s, row_number() OVER (PARTITION BY doc_id ORDER BY wt DESC, s) AS rk
        FROM w16
      ) WHERE rk = 1
    ), w17 AS (
      SELECT d.doc_id, s.s,
             ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':' || CAST(s.s AS VARCHAR)), 1, 15))::BIGINT AS wt
      FROM documents d CROSS JOIN shards17 s
    ), a17 AS (
      SELECT doc_id, s AS shard17 FROM (
        SELECT doc_id, s, row_number() OVER (PARTITION BY doc_id ORDER BY wt DESC, s) AS rk
        FROM w17
      ) WHERE rk = 1
    )
    SELECT CAST(a16.shard16 AS INT) AS shard_before,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(SUM(CASE WHEN a16.shard16 <> a17.shard17 THEN 1 ELSE 0 END) AS BIGINT) AS n_moved,
           CAST(SUM(CASE WHEN a16.shard16 <> a17.shard17 THEN 1 ELSE 0 END) * 10000
                // count(*) AS BIGINT) AS moved_bp
    FROM a16 JOIN a17 USING (doc_id)
    GROUP BY 1
    """,
    doc="Rendezvous-sharding resize impact (operators/sharding.py): "
    "per old shard, keys moved when growing 16 -> 17 shards under "
    "highest-random-weight assignment — ~1/17 of each shard moves, "
    "the deterministic minimum, vs ~16/17 under hash-mod-N (a "
    "full-corpus rewrite). Spark side is one array expression per row "
    "(transform + array_max, no explode/join/shuffle); the oracle "
    "replays the same md5-based 60-bit weights via an explicit "
    "shard cross join + window argmax — same assignment, different "
    "plan, hash-identical.",
)
def q_shard_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.sharding import shard_rebalance_report

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    return shard_rebalance_report(docs, "doc_id", n_before=16, n_after=17)


@register(
    "equidepth_histogram",
    """
    WITH ranked AS (
      SELECT l_extendedprice,
             ntile(8) OVER (ORDER BY l_extendedprice, l_orderkey, l_linenumber)
               AS bucket
      FROM lineitem
    )
    SELECT CAST(bucket AS INT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(FLOOR(MIN(l_extendedprice) * 100) AS BIGINT) AS lo_cents,
           CAST(FLOOR(MAX(l_extendedprice) * 100) AS BIGINT) AS hi_cents
    FROM ranked GROUP BY bucket
    """,
    doc="Equi-DEPTH histogram (each bucket holds ~the same row count; "
    "bucket BOUNDARIES adapt to the data) — the complement of the "
    "fixed-width price_histogram and the mergeable-quantile state: "
    "this is the shape ANALYZE-style statistics and range-partition "
    "planners consume. The oracle states the contract as ntile(8) "
    "over a TOTAL order (value + key tiebreaks, deterministic "
    "cross-engine); the Spark side does NOT run ntile's "
    "empty-OVER() window (which funnels the whole fact table through "
    "ONE task — the r6 verdict's lone scale-killer): global ranks "
    "come from ids.assign_sequential_ids (range partition + "
    "driver prefix-sum over P counts) and the bucket is ntile's "
    "closed-form quotient over (rank, total) — first n%k buckets "
    "get ceil(n/k) rows, the rest floor(n/k). Fixed-point cent "
    "boundaries.",
)
def q_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.ids import assign_sequential_ids
    from pasta_pipeline_spark.operators.util import attach_cached_deps

    n_buckets = 8
    li = _t(spark, sf_dir, "lineitem").select(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    ranked = assign_sequential_ids(
        li, ["l_extendedprice", "l_orderkey", "l_linenumber"], out_col="__seq"
    )
    total = ranked.agg(F.count(F.lit(1)).alias("__n"))
    # ntile(k) closed form: q = n div k rows in the tail buckets, the
    # first n mod k buckets take one extra row each (cut = rem*(q+1)
    # ranks); CaseWhen branches are lazy so the q=0 divisor is guarded.
    bucket = F.expr(
        f"""CAST(CASE
              WHEN __seq <= (__n % {n_buckets}) * (__n div {n_buckets} + 1)
              THEN (__seq - 1) div (__n div {n_buckets} + 1)
              ELSE (__n % {n_buckets})
                   + (__seq - (__n % {n_buckets}) * (__n div {n_buckets} + 1) - 1)
                     div greatest(__n div {n_buckets}, 1)
            END + 1 AS INT)"""
    )
    out = (
        ranked.crossJoin(F.broadcast(total))
        .withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.floor(F.min("l_extendedprice") * 100).cast("long").alias("lo_cents"),
            F.floor(F.max("l_extendedprice") * 100).cast("long").alias("hi_cents"),
        )
        .select("bucket", "n_rows", "lo_cents", "hi_cents")
    )
    return attach_cached_deps(out, getattr(ranked, "_pasta_cached_deps", []))


def _pq_oracle(n_subspaces: int = 4, n_codes: int = 16, k: int = 10) -> str:
    """Exact DuckDB twin of q_pq_topk: seed codebooks, L2² via the
    dot-product decomposition (list_dot_product folds sequentially
    like F.aggregate — bit-identical doubles), per-entry fixed-point
    floor, integer ADC sum."""
    sub = 64 // n_subspaces

    def l2fp(a, b):
        return (
            f"CAST(FLOOR((list_dot_product({a}, {a}) - 2 * list_dot_product({a}, {b})"
            f" + list_dot_product({b}, {b})) * 10000000) AS BIGINT)"
        )

    return f"""
    WITH ms AS (
      SELECT unnest(generate_series(0, {n_subspaces - 1})) AS m
    ), cb_src AS (
      SELECT vec_id, embedding::DOUBLE[] AS v
      FROM embeddings ORDER BY vec_id LIMIT {n_codes}
    ), cb0 AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS code, v
      FROM cb_src
    ), cb AS (
      SELECT code, m, v[(m*{sub}+1):(m*{sub}+{sub})] AS cv
      FROM cb0 CROSS JOIN ms
    ), corpus AS (
      SELECT vec_id, m, (embedding::DOUBLE[])[(m*{sub}+1):(m*{sub}+{sub})] AS sv
      FROM embeddings CROSS JOIN ms
    ), l2 AS (
      SELECT c.vec_id, c.m, b.code, {l2fp('c.sv', 'b.cv')} AS fp
      FROM corpus c JOIN cb b USING (m)
    ), enc AS (
      SELECT vec_id, m, code FROM (
        SELECT vec_id, m, code,
               ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY fp, code) AS rk
        FROM l2
      ) WHERE rk = 1
    ), q AS (
      SELECT embedding::DOUBLE[] AS qv FROM embeddings ORDER BY vec_id LIMIT 1
    ), qm AS (
      SELECT m, qv[(m*{sub}+1):(m*{sub}+{sub})] AS sv FROM q CROSS JOIN ms
    ), dt AS (
      SELECT b.m, b.code, {l2fp('qm.sv', 'b.cv')} AS qfp
      FROM qm JOIN cb b USING (m)
    )
    SELECT e.vec_id, CAST(SUM(d.qfp) AS BIGINT) AS adc_fp
    FROM enc e JOIN dt d ON e.m = d.m AND e.code = d.code
    GROUP BY e.vec_id
    ORDER BY adc_fp ASC, e.vec_id ASC LIMIT {k}
    """


@register(
    "pq_topk",
    _pq_oracle(),
    doc="Product-quantization ANN top-k (similarity.pq_topk, Jégou et "
    "al. TPAMI'11) — the memory tier below int8: 4 code bytes per "
    "64-dim vector (64x less scanned than f32) and ADC scoring (one "
    "table lookup per subspace, no per-vector dot product). Seed "
    "codebooks (first n_codes vectors' subvectors; Lloyd's slots in "
    "like ivf_topk); subspace L2² via the a·a - 2a·b + b·b "
    "decomposition (sequential folds, bit-identical to "
    "list_dot_product), floored to fixed point PER TABLE ENTRY so "
    "code assignment, the distance table, and the int64 ADC ranking "
    "all replay hash-exactly in SQL.",
)
def q_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.similarity import pq_topk

    emb = _t(spark, sf_dir, "embeddings")
    query = emb.orderBy("vec_id").limit(1).select(F.col("embedding").alias("qv"))
    return pq_topk(emb, query, k=10)



def _quality_lang_oracle() -> str:
    from pasta_pipeline_spark.operators.text_analysis import STOPWORDS

    hit_cols = []
    for lg, words in STOPWORDS.items():
        lst = ", ".join(f"'{w}'" for w in words)
        hit_cols.append(
            f"len(list_filter(toks, x -> x IN ({lst}))) AS h_{lg}"
        )
    case = " ".join(f"WHEN lang = '{lg}' THEN h_{lg}" for lg in STOPWORDS)
    best = "greatest(" + ", ".join(f"h_{lg}" for lg in STOPWORDS) + ")"
    return f"""
    WITH base AS (
      SELECT doc_id, lang, text,
             list_filter(regexp_split_to_array(lower(text), '\\s+'), y -> y <> '') AS toks
      FROM documents
    ), counted AS (
      SELECT doc_id, lang, text,
             len(toks) AS n_tok,
             length(regexp_replace(text, '\\s+', '', 'g')) AS n_nonspace,
             length(regexp_replace(text, '[^A-Za-zА-Яа-я一-鿿]+', '', 'g')) AS n_alpha,
             {", ".join(hit_cols)}
      FROM base
    ), hits AS (
      SELECT *, CASE {case} ELSE {best} END AS h FROM counted
    )
    SELECT doc_id, lang,
           CASE WHEN text IS NULL OR trim(text) = '' THEN 0.0 ELSE
             (least(CAST(n_tok AS DOUBLE) / 64.0, 1.0)
              + (CASE WHEN n_nonspace > 0 THEN CAST(n_alpha AS DOUBLE) / CAST(n_nonspace AS DOUBLE) ELSE 0.0 END)
              + (CASE WHEN n_tok > 0 THEN least(4.0 * CAST(h AS DOUBLE) / CAST(n_tok AS DOUBLE), 1.0) ELSE 0.0 END)
              + (CASE WHEN n_tok > 0
                       AND CAST(n_nonspace AS DOUBLE) / CAST(n_tok AS DOUBLE) >= 3.0
                       AND CAST(n_nonspace AS DOUBLE) / CAST(n_tok AS DOUBLE) <= 12.0
                      THEN 1.0 ELSE 0.0 END)
             ) / 4.0
           END AS score
    FROM hits
    """


@register(
    "quality_score_lang",
    _quality_lang_oracle(),
    doc="Language-aware quality score (text_analysis.quality_score_lang): "
    "the stopword component counts the DOCUMENT'S language profile "
    "instead of assuming English — the multilingual-curation fix for "
    "the classic bug where an English-stopword gate rejects every "
    "non-English document. Unprofiled languages (zh in the driver "
    "data) fall back to the best hit count across profiles. Per-lang "
    "CASE generated from the same STOPWORDS constant in both engines.",
)
def q_quality_score_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.text_analysis import quality_score_lang

    docs = _tp(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", "lang", quality_score_lang("text", "lang").alias("score")
    )


_SPLIT_SQL = (
    "(CASE WHEN ('0x' || substr(md5(CAST({c} AS VARCHAR)), 1, 15))::BIGINT % 10000 < 1000 "
    "THEN 'holdout' ELSE 'train' END)"
)


@register(
    "split_leakage",
    f"""
    WITH pairs AS ({_JACCARD_ORACLE})
    SELECT doc_a, doc_b,
           {_SPLIT_SQL.format(c='doc_a')} AS split_a,
           {_SPLIT_SQL.format(c='doc_b')} AS split_b
    FROM pairs
    WHERE {_SPLIT_SQL.format(c='doc_a')} <> {_SPLIT_SQL.format(c='doc_b')}
    """,
    doc="Train/holdout LEAKAGE measurement (operators/splits.py): "
    "near-dup pairs (3-gram Jaccard >= 0.5) whose sides land in "
    "different splits of a deterministic 10% id-hash holdout — each "
    "row is a document whose near-copy leaks across the evaluation "
    "boundary, the failure that silently inflates benchmark numbers. "
    "Split membership is the package's md5 bucket (pure function of "
    "the id, replayed exactly in SQL).",
)
def q_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.splits import split_leakage
    from pasta_pipeline_spark.operators.text_dedup import jaccard_pairs

    docs = _t(spark, sf_dir, "documents")
    pairs = jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5)
    # shingle cache attached by jaccard_pairs; harness releases it
    return split_leakage(pairs, holdout_frac=0.1)


@register(
    "cluster_split",
    f"""
    WITH clusters AS ({_CLUSTERS_ORACLE})
    SELECT doc_id, cluster_id,
           {_SPLIT_SQL.format(c='cluster_id')} AS split
    FROM clusters
    """,
    doc="Leakage-FREE split assignment (operators/splits.py "
    "cluster_split): the holdout hash is taken on the duplicate-"
    "CLUSTER id, so every member of a cluster — and therefore both "
    "sides of every near-dup pair — inherits the same split by "
    "construction (the fix for split_leakage's finding; "
    "zero-crossing property pytest-pinned). Singleton clusters "
    "degrade to the per-document split.",
)
def q_cluster_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.splits import cluster_split
    from pasta_pipeline_spark.operators.text_dedup import (
        duplicate_clusters,
        jaccard_pairs,
    )
    from pasta_pipeline_spark.operators.util import release_cached_deps

    docs = _t(spark, sf_dir, "documents")
    pairs = jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5)
    clusters = duplicate_clusters(docs.select("doc_id"), pairs, id_col="doc_id")
    release_cached_deps(pairs)
    return cluster_split(clusters, holdout_frac=0.1)


_MEDIA_CODEC_ORACLE = """
    SELECT doc_id AS media_id,
           CASE WHEN doc_id % 2 = 0 THEN 'image/jpeg' ELSE 'video/mp4' END AS media_type,
           CAST(CASE WHEN doc_id % 2 = 0
                THEN 47 + doc_id % 50
                ELSE 150 + doc_id % 80
           END AS BIGINT) AS n_bytes,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 64 + doc_id % 512 END AS INT) AS width,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 48 + (doc_id // 3) % 256 END AS INT) AS height,
           CAST(CASE WHEN doc_id % 2 = 1
                THEN (3000 + (doc_id % 77) * 100) * 1000
                     // (1000 + (doc_id % 4) * 500)
           END AS BIGINT) AS duration_ms
    FROM documents
"""


@register(
    "media_codec_headers",
    _MEDIA_CODEC_ORACLE,
    doc="REAL codec-container header decode, end-to-end hash-checked: "
    "synthesize_media(variant='codecs') builds JPEGs with a true SOF0 "
    "frame header behind a COM segment (even ids) and MP4/ISO-BMFF "
    "files with a true moov/mvhd box (odd ids); "
    "extract_media_features(decode='real') walks the actual marker/"
    "box structure back — SOF big-endian dims, mvhd "
    "timescale/duration — and the oracle computes expected features "
    "from the ids alone. With PNG/FLAC/Y4M this completes the "
    "header-level real tier for every major container; only "
    "entropy-coded PIXEL/SAMPLE decode still needs the codec "
    "library. operators/multimodal.py decode_jpeg / decode_mp4.",
)
def q_media_codec_headers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.multimodal import (
        extract_media_features,
        synthesize_media,
    )

    docs = _tp(spark, sf_dir, "documents").select(F.col("doc_id"))
    media = synthesize_media(docs, id_col="doc_id", variant="codecs")
    return extract_media_features(media, decode="real").select(
        "media_id", "media_type", "n_bytes", "width", "height", "duration_ms"
    )


#: Crawl-policy fixture shared by the robots_admission query and its
#: oracle: (host, agent, rule, pattern).
_ROBOTS_RULES = (
    ("host0.com", "*", "disallow", "/private/"),
    ("host0.com", "*", "allow", "/private/pub*"),
    ("host0.com", "*", "disallow", "/*.json$"),
    ("host1.com", "*", "disallow", "/tmp/"),
    ("host1.com", "goodbot", "disallow", "/"),
)


def _robots_oracle() -> str:
    from pasta_pipeline_spark.operators.robots import robots_pattern_regex

    rule_rows = ", ".join(
        f"('{h}', '{a}', '{r}', '{robots_pattern_regex(p)}', {len(p)})"
        for h, a, r, p in _ROBOTS_RULES
    )
    return f"""
    WITH rules(host, agent, rule, rx, spec_len) AS (
      VALUES {rule_rows}
    ), urls AS (
      SELECT 'host' || CAST(doc_id % 3 AS VARCHAR) || '.com' AS host,
             CASE doc_id % 5
               WHEN 0 THEN '/private/doc' || CAST(doc_id AS VARCHAR)
               WHEN 1 THEN '/private/pub/doc' || CAST(doc_id AS VARCHAR)
               WHEN 2 THEN '/tmp/doc' || CAST(doc_id AS VARCHAR)
               WHEN 3 THEN '/api/doc' || CAST(doc_id AS VARCHAR) || '.json'
               ELSE '/page/doc' || CAST(doc_id AS VARCHAR) END AS path
      FROM documents
    ), applicable AS (
      -- agent='*' resolution: the exact group IS the star group, so
      -- the Spark side's has_exact branching collapses to this filter
      SELECT host, rule, rx, spec_len FROM rules WHERE agent = '*'
    ), j AS (
      SELECT u.host, u.path, a.rule, a.rx, a.spec_len,
             (a.rx IS NOT NULL AND regexp_matches(u.path, a.rx)) AS hit
      FROM urls u LEFT JOIN applicable a ON u.host = a.host
    ), ranked AS (
      SELECT host, path, rule, hit,
             ROW_NUMBER() OVER (
               PARTITION BY host, path
               ORDER BY hit DESC, spec_len DESC,
                        (rule = 'disallow') ASC
             ) AS rk
      FROM j
    )
    SELECT host, path,
           (NOT (hit AND rule = 'disallow')) AS allowed
    FROM ranked WHERE rk = 1
    """


@register(
    "robots_admission",
    _robots_oracle(),
    doc="Crawl-frontier admission under RFC 9309 robots rules "
    "(operators/robots.py robots_verdict): the whole URL frontier is "
    "admitted/denied in ONE broadcast join against the parsed rules "
    "table — longest-pattern match wins, allow beats disallow on "
    "specificity ties, wildcard * and $ anchors honored, no-rule "
    "hosts allow. The oracle inlines regexes from an independent "
    "Python twin of the SQL pattern conversion, so a drift in either "
    "implementation breaks the hash. The parse side (UA-group "
    "reconstruction via windows over line numbers) is pytest-covered "
    "with a real robots.txt fixture.",
)
def q_robots_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.robots import robots_verdict

    rules = spark.createDataFrame(
        [(h, a, r, p, len(p)) for h, a, r, p in _ROBOTS_RULES],
        "host string, agent string, rule string, pattern string, spec_len long",
    )
    docs = _t(spark, sf_dir, "documents")
    urls = docs.select(
        F.concat(F.lit("host"), (F.col("doc_id") % 3).cast("string"), F.lit(".com")).alias("host"),
        F.when(F.col("doc_id") % 5 == 0,
               F.concat(F.lit("/private/doc"), F.col("doc_id").cast("string")))
        .when(F.col("doc_id") % 5 == 1,
              F.concat(F.lit("/private/pub/doc"), F.col("doc_id").cast("string")))
        .when(F.col("doc_id") % 5 == 2,
              F.concat(F.lit("/tmp/doc"), F.col("doc_id").cast("string")))
        .when(F.col("doc_id") % 5 == 3,
              F.concat(F.lit("/api/doc"), F.col("doc_id").cast("string"), F.lit(".json")))
        .otherwise(F.concat(F.lit("/page/doc"), F.col("doc_id").cast("string"))).alias("path"),
    )
    return robots_verdict(urls, rules, agent="*")


@register(
    "crawl_budget",
    """
    WITH w AS (
      SELECT source AS key, CAST(count(*) AS BIGINT) AS weight
      FROM documents GROUP BY source
    ), tot AS (
      SELECT CAST(SUM(weight) AS BIGINT) AS W FROM w
    ), base AS (
      SELECT key, weight,
             (100000 * weight) // W AS q,
             (100000 * weight) % W AS r
      FROM w CROSS JOIN tot
    ), ranked AS (
      SELECT key, weight, q, r,
             ROW_NUMBER() OVER (ORDER BY r DESC, key ASC) AS rk,
             (SELECT 100000 - SUM(q) FROM base) AS leftover
      FROM base
    )
    SELECT key, weight,
           CAST(q + (CASE WHEN rk <= leftover THEN 1 ELSE 0 END) AS BIGINT) AS budget
    FROM ranked
    """,
    doc="Crawl/token budget apportionment by largest remainder "
    "(Hamilton's method; operators/sharding.py allocate_budget): "
    "100k fetch slots split across sources proportionally to doc "
    "counts, floor quota + leftover units to the largest integer "
    "remainders (key tiebreak) — every unit assigned, zero "
    "fractional drift, all int64, SUM(budget) == total exactly. The "
    "window runs over the KEY table (sources/hosts — metadata "
    "scale), never corpus rows.",
)
def q_crawl_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.sharding import allocate_budget

    docs = _t(spark, sf_dir, "documents")
    w = docs.groupBy(F.col("source").alias("key")).agg(
        F.count(F.lit(1)).cast("long").alias("weight")
    )
    return allocate_budget(w, total=100_000)


@register(
    "sitemap_frontier",
    """
    WITH bodies AS (
      SELECT 'host' || CAST(doc_id % 4 AS VARCHAR) || '.com' AS host,
             '<?xml version="1.0"?><urlset>' ||
             '<url><loc>https://h.com/p/' || CAST(doc_id AS VARCHAR) ||
             '</loc><lastmod>2026-0' || CAST(1 + doc_id % 9 AS VARCHAR) ||
             '-01</lastmod></url>' ||
             '<url><loc> https://h.com/q/' || CAST(doc_id AS VARCHAR) ||
             ' </loc></url>' ||
             CASE WHEN doc_id % 3 = 0
               THEN '<url><lastmod>2026-01-01</lastmod></url>' ELSE '' END ||
             '</urlset>' AS sitemap_xml
      FROM documents
    ), entries AS (
      SELECT host, unnest(regexp_extract_all(sitemap_xml,
               '(?s)<(?:url|sitemap)>(.*?)</(?:url|sitemap)>', 1)) AS entry
      FROM bodies
    )
    SELECT host,
           regexp_extract(entry, '(?s)<loc>\\s*(.*?)\\s*</loc>', 1) AS loc,
           CASE WHEN regexp_extract(entry, '(?s)<lastmod>\\s*(.*?)\\s*</lastmod>', 1) <> ''
                THEN regexp_extract(entry, '(?s)<lastmod>\\s*(.*?)\\s*</lastmod>', 1)
           END AS lastmod
    FROM entries
    WHERE regexp_extract(entry, '(?s)<loc>\\s*(.*?)\\s*</loc>', 1) <> ''
    """,
    doc="Sitemap-protocol frontier ingestion (operators/sitemaps.py "
    "parse_sitemap): sitemap bodies (synthesized deterministically "
    "from doc ids — entries with lastmod, without, whitespace-padded "
    "locs, and loc-less entries that must be dropped) explode into "
    "(host, loc, lastmod) rows via portable dotall regexes — no XML "
    "library, no UDF. The discovery half of the crawl frontier; "
    "feeds canonicalize_url -> robots_verdict -> work-selection "
    "anti-join.",
)
def q_sitemap_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.sitemaps import parse_sitemap

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id").cast("string")
    xml = F.concat(
        F.lit('<?xml version="1.0"?><urlset>'),
        F.lit("<url><loc>https://h.com/p/"), d,
        F.lit("</loc><lastmod>2026-0"),
        (F.lit(1) + F.col("doc_id") % 9).cast("string"),
        F.lit("-01</lastmod></url>"),
        F.lit("<url><loc> https://h.com/q/"), d, F.lit(" </loc></url>"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.lit("<url><lastmod>2026-01-01</lastmod></url>"),
        ).otherwise(F.lit("")),
        F.lit("</urlset>"),
    )
    bodies = docs.select(
        F.concat(F.lit("host"), (F.col("doc_id") % 4).cast("string"), F.lit(".com")).alias("host"),
        xml.alias("sitemap_xml"),
    )
    return parse_sitemap(bodies)


