"""Catalog tier: TPC-H round 3 + extension surface, part A.

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
from pasta_pipeline_spark.queries.catalog._core import QuerySpec, REGISTRY, _t, _tp, register
from pasta_pipeline_spark.queries.catalog._core import _XS
from pasta_pipeline_spark.queries.catalog.t02_text_analysis import _QUALITY_ORACLE
from pasta_pipeline_spark.queries.catalog.t04_similarity_ann import _cosine_sql
from pasta_pipeline_spark.queries.catalog.t05_multimodal import _CLUSTERS_ORACLE, _banded_eb_sql, _banded_planes_sql

# ---------------------------------------------------------------------------
# TPC-H-shape relational depth, round 3: Q9/Q10/Q11/Q12/Q17/Q20 adaptations
# (partsupp/shipmode/commitdate don't exist in the testdata; supply cost is
# proxied as half the retail price, ship mode is derived deterministically
# from the line number, and Q20's availqty test becomes a majority-share
# test over each part's shipped quantity).
# ---------------------------------------------------------------------------


@register(
    "product_profit",
    """
    SELECT n_name AS nation,
           CAST(year(o_orderdate) AS INT) AS o_year,
           CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)
                  - CAST(FLOOR(p_retailprice * l_quantity * 0.5 * 10000) AS BIGINT))
             AS BIGINT) AS profit_x
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN orders   ON l_orderkey = o_orderkey
    WHERE p_name LIKE '%red%'
    GROUP BY 1, 2
    """,
    doc="TPC-H Q9 shape (product-type profit): revenue minus a supply-cost "
    "proxy (half retail price x quantity — the testdata has no partsupp), "
    "grouped by supplier nation and order year. Both cost terms are "
    "floored to int64 PER ROW before the subtraction so the profit sum "
    "is exact and order-free in both engines; part/supplier/nation "
    "dims broadcast, one shuffle join against orders.",
)
def q_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders")
    rev_x = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * F.lit(_XS)
    ).cast("long")
    cost_x = F.floor(
        F.col("p_retailprice") * F.col("l_quantity") * F.lit(0.5) * F.lit(_XS)
    ).cast("long")
    return (
        li.join(F.broadcast(part.filter(F.col("p_name").like("%red%"))),
                F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.sum(rev_x - cost_x).alias("profit_x"))
    )


@register(
    "returned_item_customers",
    """
    SELECT c_custkey, c_name, n_name AS nation,
           CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))
             AS BIGINT) AS revenue_x
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-07-01'
    GROUP BY 1, 2, 3
    ORDER BY revenue_x DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 shape (returned-item reporting): revenue lost to "
    "returns per customer for one half-year, top 20. Selective order-date "
    "predicate pushed to the orders scan; nation broadcast; the LIMIT "
    "rides a total order with the customer key as tiebreak "
    "(TakeOrderedAndProject, no global sort).",
)
def q_returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    rev_x = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * F.lit(_XS)
    ).cast("long")
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(F.sum(rev_x).alias("revenue_x"))
        .orderBy(F.desc("revenue_x"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "important_parts",
    """
    WITH v AS (
      SELECT l_partkey AS p_key,
             CAST(SUM(CAST(FLOOR(l_extendedprice * l_quantity * 10000) AS BIGINT))
               AS BIGINT) AS value_x
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      WHERE s_nationkey = 1
      GROUP BY l_partkey
    )
    SELECT p_key, value_x
    FROM v
    WHERE value_x * (SELECT CAST(count(*) AS BIGINT) FROM v)
          > 3 * (SELECT CAST(SUM(value_x) AS BIGINT) FROM v)
    """,
    doc="TPC-H Q11 shape (important stock): per-part shipped value from "
    "one nation's suppliers, keeping parts worth more than 3x the MEAN "
    "part value — partsupp's availqty x supplycost becomes quantity x "
    "price over lineitem, and Q11's fixed fraction-of-total threshold "
    "becomes a multiple-of-mean so the predicate keeps selecting rows "
    "as the part count grows with scale. The HAVING-over-grand-total "
    "is the benign 1-row scalar handoff (the per-part agg is computed "
    "once and reused for the total, the count, and the filter); the "
    "share test is an exact int64 cross-multiplication, no division.",
)
def q_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    supplier = _t(spark, sf_dir, "supplier")
    val_x = F.floor(
        F.col("l_extendedprice") * F.col("l_quantity") * F.lit(_XS)
    ).cast("long")
    v = (
        li.join(
            F.broadcast(supplier.filter(F.col("s_nationkey") == 1)),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy(F.col("l_partkey").alias("p_key"))
        .agg(F.sum(val_x).alias("value_x"))
    )
    total = v.agg(
        F.sum("value_x").cast("long").alias("__total"),
        F.count(F.lit(1)).cast("long").alias("__nparts"),
    )
    return (
        v.crossJoin(F.broadcast(total))
        .filter(F.col("value_x") * F.col("__nparts") > F.lit(3) * F.col("__total"))
        .select("p_key", "value_x")
    )


@register(
    "shipmode_priority",
    """
    SELECT CASE l_linenumber % 3 WHEN 0 THEN 'MAIL' WHEN 1 THEN 'SHIP'
           ELSE 'AIR' END AS ship_mode,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= o_orderdate + INTERVAL 60 DAY
    GROUP BY 1
    """,
    doc="TPC-H Q12 shape (shipping modes vs priority): high/low-priority "
    "line counts per ship mode for slow shipments (>=60 days after the "
    "order date — the testdata has no shipmode or receiptdate, so the "
    "mode derives deterministically from the line number). Exact "
    "timestamp interval arithmetic and integer counts in both engines.",
)
def q_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    mode = (
        F.when(F.col("l_linenumber") % 3 == 0, "MAIL")
        .when(F.col("l_linenumber") % 3 == 1, "SHIP")
        .otherwise("AIR")
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy(mode.alias("ship_mode"))
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(is_high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


@register(
    "small_quantity_revenue",
    """
    WITH w AS (
      SELECT l_partkey, p_brand,
             CAST(FLOOR(l_quantity * 10000) AS BIGINT) AS qty_x,
             CAST(FLOOR(l_extendedprice * 10000) AS BIGINT) AS price_x,
             CAST(SUM(CAST(FLOOR(l_quantity * 10000) AS BIGINT))
                  OVER (PARTITION BY l_partkey) AS BIGINT) AS sum_qty_x,
             CAST(count(*) OVER (PARTITION BY l_partkey) AS BIGINT) AS n
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      WHERE p_brand = 'Brand#3'
    )
    SELECT CAST(SUM(price_x) AS BIGINT) AS total_x,
           CAST(SUM(price_x) // 7 AS BIGINT) AS avg_yearly_x
    FROM w
    WHERE 5 * qty_x * n < sum_qty_x
    """,
    doc="TPC-H Q17 shape (small-quantity-order revenue): revenue from "
    "lineitems under 20% of their part's average quantity, one brand. "
    "The correlated AVG subquery decorrelates into a window over the "
    "SAME l_partkey partitioning (one shuffle, no self-join), and the "
    "20%-of-average test cross-multiplies in exact int64 "
    "(5*qty*n < sum) — no division anywhere until the final int-div "
    "by 7.",
)
def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    qty_x = F.floor(F.col("l_quantity") * F.lit(_XS)).cast("long")
    price_x = F.floor(F.col("l_extendedprice") * F.lit(_XS)).cast("long")
    w = Window.partitionBy("l_partkey")
    base = (
        li.join(
            F.broadcast(part.filter(F.col("p_brand") == "Brand#3")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .withColumn("qty_x", qty_x)
        .withColumn("price_x", price_x)
        .withColumn("sum_qty_x", F.sum("qty_x").over(w))
        .withColumn("n", F.count(F.lit(1)).over(w))
    )
    return (
        base.filter(F.lit(5) * F.col("qty_x") * F.col("n") < F.col("sum_qty_x"))
        .agg(F.sum("price_x").cast("long").alias("total_x"))
        .select(
            "total_x",
            F.expr("total_x div 7").cast("long").alias("avg_yearly_x"),
        )
    )


@register(
    "excess_shippers",
    """
    WITH sq AS (
      SELECT l_suppkey, l_partkey,
             CAST(SUM(CAST(FLOOR(l_quantity * 10000) AS BIGINT)) AS BIGINT) AS sup_qty_x
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      WHERE p_name LIKE 'red%'
        AND l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
      GROUP BY 1, 2
    ), tot AS (
      SELECT l_suppkey, l_partkey, sup_qty_x,
             CAST(SUM(sup_qty_x) OVER (PARTITION BY l_partkey) AS BIGINT) AS part_qty_x
      FROM sq
    )
    SELECT DISTINCT s_suppkey, s_name
    FROM tot JOIN supplier ON l_suppkey = s_suppkey
    WHERE 2 * sup_qty_x > part_qty_x
    """,
    doc="TPC-H Q20 shape (excess-stock suppliers): suppliers who shipped "
    "a MAJORITY of some red part's 1997 volume — partsupp's "
    "availqty > half-of-shipped test becomes a majority-share test over "
    "the shipped quantity itself. Per-(supplier,part) agg, then a "
    "window over the same part key (shuffle reused), exact int64 "
    "cross-multiplication, distinct supplier projection.",
)
def q_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    supplier = _t(spark, sf_dir, "supplier")
    qty_x = F.floor(F.col("l_quantity") * F.lit(_XS)).cast("long")
    sq = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(
            F.broadcast(part.filter(F.col("p_name").like("red%"))),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(qty_x).alias("sup_qty_x"))
    )
    w = Window.partitionBy("l_partkey")
    return (
        sq.withColumn("part_qty_x", F.sum("sup_qty_x").over(w))
        .filter(F.lit(2) * F.col("sup_qty_x") > F.col("part_qty_x"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name")
        .distinct()
    )


from pasta_pipeline_spark.operators.quality_filters import gopher_rules_sql as _gr_sql


@register(
    "gopher_quality_rules",
    _gr_sql(),
    doc="Gopher/C4-style rule-set quality gate (Rae et al. 2021 §A1.1): one "
    "named boolean per cleaning rule (word-count bounds, mean word length, "
    "symbol ratio, bullet/ellipsis line shares, alpha-word share, stopword "
    "gate) plus the overall pass flag — the auditable form of document "
    "filtering, complementing the blended quality_score. Single codegen "
    "projection, no shuffle; every ratio is an integer "
    "cross-multiplication; the oracle SQL is generated from the same "
    "thresholds so the two sides cannot drift.",
)
def q_gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.quality_filters import gopher_rules

    docs = _tp(spark, sf_dir, "documents")
    return gopher_rules(docs)


@register(
    "domain_blocklist_stats",
    """
    WITH u AS (
      SELECT doc_id,
             CASE doc_id % 5
               WHEN 0 THEN 'https://telegra.ph/' || source || '-' || doc_id
               WHEN 1 THEN 'https://example.com/page/' || doc_id
               WHEN 2 THEN 'https://spam.tracker.net/x?id=' || doc_id
               WHEN 3 THEN 'https://cdn.assets.example.com/obj/' || doc_id
               ELSE 'https://docs.wiki.org/a/' || doc_id END AS url
      FROM documents
    ), d AS (
      SELECT doc_id,
             regexp_extract(regexp_extract(url, '^[a-z]+://([^/:]+)', 1),
                            '([^.]+\\.[^.]+)$', 1) AS domain
      FROM u
    )
    SELECT domain,
           domain IN ('tracker.net') AS blocked,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) * 10000 // (SELECT CAST(count(*) AS BIGINT) FROM d) AS BIGINT)
             AS share_bp
    FROM d
    GROUP BY 1, 2
    """,
    doc="Per-domain corpus curation stats: registrable-domain extraction "
    "(last-two-labels; cdn.assets.example.com folds into example.com), "
    "doc counts, exact integer share in basis points, and the blocklist "
    "verdict — the site-level view a crawl pipeline filters and budgets "
    "by. URLs are constructed deterministically (url_validation's "
    "technique); Spark parses with try_parse_url(HOST), the oracle with "
    "an equivalent regex (identical on well-formed constructed input by "
    "construction). The grand total is the benign 1-row scalar handoff.",
)
def q_domain_blocklist_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.functions.urls import registrable_domain, url_host

    docs = _t(spark, sf_dir, "documents")
    url = (
        F.when(F.col("doc_id") % 5 == 0,
               F.concat(F.lit("https://telegra.ph/"), F.col("source"), F.lit("-"), F.col("doc_id")))
        .when(F.col("doc_id") % 5 == 1,
              F.concat(F.lit("https://example.com/page/"), F.col("doc_id")))
        .when(F.col("doc_id") % 5 == 2,
              F.concat(F.lit("https://spam.tracker.net/x?id="), F.col("doc_id")))
        .when(F.col("doc_id") % 5 == 3,
              F.concat(F.lit("https://cdn.assets.example.com/obj/"), F.col("doc_id")))
        .otherwise(F.concat(F.lit("https://docs.wiki.org/a/"), F.col("doc_id")))
    )
    d = docs.select(
        "doc_id", registrable_domain(url_host(url)).alias("domain")
    )
    total = d.agg(F.count(F.lit(1)).cast("long").alias("__total"))
    return (
        d.groupBy("domain")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .withColumn("blocked", F.col("domain").isin("tracker.net"))
        .crossJoin(F.broadcast(total))
        .select(
            "domain",
            "blocked",
            "n_docs",
            F.expr("n_docs * 10000 div __total").cast("long").alias("share_bp"),
        )
    )


@register(
    "bloom_prejoin_revenue",
    """
    SELECT s_suppkey, s_name,
           CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))
             AS BIGINT) AS revenue_x
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    WHERE s_acctbal >= 8000
    GROUP BY 1, 2
    """,
    doc="Approximate-membership pre-join reduction (the explicit form of "
    "Spark's runtime bloom filter): the fact side is prefiltered by a "
    "broadcast semi-join on coarse xxhash64 bucket ids built from the "
    "selective supplier subset, then the real join runs on the "
    "survivors. The bucket test has no false negatives, so the result "
    "is EXACTLY the plain join the oracle runs — the prefilter only "
    "sheds dead shuffle volume. operators/prejoin.py.",
)
def q_bloom_prejoin_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.prejoin import reduced_join

    li = _t(spark, sf_dir, "lineitem")
    supplier = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") >= 8000)
    build = supplier.select(
        F.col("s_suppkey").alias("l_suppkey"), "s_name"
    )
    rev_x = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * F.lit(_XS)
    ).cast("long")
    return (
        reduced_join(li, build, on="l_suppkey")
        .groupBy(F.col("l_suppkey").alias("s_suppkey"), F.col("s_name"))
        .agg(F.sum(rev_x).alias("revenue_x"))
    )


from pasta_pipeline_spark.operators.multimodal import chunk_manifest_sql as _cm_sql

_MEDIA_LEN_SQL = "(n_chars * 400 + (doc_id % 7) * 1000)"


@register(
    "media_chunk_manifest",
    _cm_sql(
        table=f"(SELECT doc_id, {_MEDIA_LEN_SQL} AS duration_ms FROM documents)",
        id_col="doc_id",
        length_col="duration_ms",
    ).replace("""SELECT id,
           CAST(chunk_idx AS BIGINT)""",
             """SELECT id AS doc_id,
           CAST(chunk_idx AS BIGINT)"""),
    doc="Audio/video chunk-manifest planning table: media lengths "
    "(synthesized deterministically from document stats — the container "
    "has no codecs) explode into fixed 30 s windows with 1 s overlap, "
    "exact integer chunk counts/offsets, end clamped to the length. The "
    "manifest is what the decode stage partitions on, so one long video "
    "never pins one task; the oracle SQL is generated from the same "
    "arithmetic (generate_series twin). operators/multimodal.py.",
)
def q_media_chunk_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.multimodal import chunk_manifest

    docs = _t(spark, sf_dir, "documents")
    media = docs.select(
        "doc_id",
        (F.col("n_chars") * 400 + (F.col("doc_id") % 7) * 1000).alias("duration_ms"),
    )
    return chunk_manifest(media, id_col="doc_id", length_col="duration_ms").withColumnRenamed("id", "doc_id")


# Adversarial adornments for the normalization query, shared by engine
# and oracle (playbook: one recipe generates both sides). Index = doc_id % 4.
_NORM_ADORN = [
    "",
    " café decomposed",          # e + COMBINING ACUTE -> NFC composes
    " ctrl\x07bell and\x1f unit",      # control chars stripped
    "  wide   gaps\tand\ttabs  ",      # whitespace collapse + trim
]


def _norm_adorn_sql() -> str:
    cases = []
    for i, s in enumerate(_NORM_ADORN):
        esc = "".join(f"\\x{ord(ch):02x}" if ord(ch) < 32 else ch for ch in s)
        esc = esc.replace("'", "''").replace("́", "' || chr(769) || '")
        cases.append(f"WHEN {i} THEN e'{esc}'")
    return "CASE doc_id % 4 " + " ".join(cases) + " ELSE '' END"


@register(
    "text_normalization",
    f"""
    WITH adorned AS (
      SELECT doc_id, text || {_norm_adorn_sql()} AS raw FROM documents
    )
    SELECT doc_id,
           {{clean}} AS norm_text,
           ({{clean}} IS DISTINCT FROM raw) AS changed
    FROM adorned
    """,
    doc="Unicode NFC + cleanup normalization (pre-tokenization hygiene): "
    "composed/decomposed unification via an Arrow-batched "
    "unicodedata.normalize stage (sanctioned Python stage; DuckDB twin "
    "nfc_normalize implements the same Unicode standard), then pure-"
    "expression control-char strip, whitespace collapse, trim. Inputs "
    "are adorned deterministically with decomposed accents, control "
    "bytes, and whitespace floods so every rule is exercised. "
    "operators/normalize_text.py.",
)
def q_text_normalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.normalize_text import normalize_documents

    docs = _tp(spark, sf_dir, "documents")
    adorn = F.element_at(
        F.array(*[F.lit(s) for s in _NORM_ADORN]),
        (F.col("doc_id") % 4 + 1).cast("int"),
    )
    adorned = docs.select(
        "doc_id", F.concat(F.col("text"), adorn).alias("raw")
    )
    return normalize_documents(adorned, text_col="raw", out_col="norm_text").select(
        "doc_id", "norm_text", "changed"
    )


# inject the generated clean-SQL into the oracle template
from pasta_pipeline_spark.operators.normalize_text import clean_text_sql as _ct_sql

REGISTRY["text_normalization"] = QuerySpec(
    spark_fn=REGISTRY["text_normalization"].spark_fn,
    oracle=REGISTRY["text_normalization"].oracle.replace(
        "{clean}", _ct_sql("nfc_normalize(raw)")
    ),
    doc=REGISTRY["text_normalization"].doc,
)


@register(
    "cluster_survivors",
    f"""
    SELECT c.doc_id, c.cluster_id,
           (row_number() OVER (PARTITION BY c.cluster_id
                               ORDER BY d.n_chars DESC, c.doc_id) = 1)
             AS is_survivor
    FROM ( {_CLUSTERS_ORACLE} ) c
    JOIN documents d ON c.doc_id = d.doc_id
    """,
    doc="Policy-driven dedup survivor selection: duplicate clusters "
    "(3-gram Jaccard >= 0.5 connected components) re-ranked so the "
    "LONGEST member survives (n_chars desc, id tiebreak) instead of "
    "the smallest id — the curation policy real pipelines want. One "
    "window over the cluster id. operators/text_dedup.py "
    "select_survivors.",
)
def q_cluster_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.text_dedup import (
        duplicate_clusters,
        jaccard_pairs,
        select_survivors,
    )
    from pasta_pipeline_spark.operators.util import release_cached_deps

    docs = _t(spark, sf_dir, "documents")
    pairs = jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5)
    clusters = duplicate_clusters(docs, pairs)
    release_cached_deps(pairs)
    return select_survivors(clusters, docs, score_col="n_chars")


@register(
    "byte_budget_sample",
    """
    WITH ranked AS (
      SELECT doc_id, source, n_chars,
             CAST(SUM(n_chars) OVER (PARTITION BY source
                    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_size
      FROM documents
    )
    SELECT doc_id, source, n_chars, cum_size
    FROM ranked
    WHERE cum_size - n_chars < 30000
    """,
    doc="Per-source byte-budget sampling (the training mix's token "
    "budget as an operator): docs taken in md5-shuffled order until "
    "each source's running size total passes 30 kB; a row is kept iff "
    "the total BEFORE it is under budget, so every source keeps at "
    "least one doc and overshoot is bounded by one row. One window "
    "shuffle on the source key. operators/sampling.py budget_sample.",
)
def q_byte_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.sampling import budget_sample

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    return budget_sample(
        docs, id_col="doc_id", size_col="n_chars", budget=30_000, group_col="source"
    )


@register(
    "trigram_search",
    """
    SELECT doc_id FROM documents WHERE contains(text, 'merge batch')
    """,
    doc="Index-accelerated substring search: candidates from a "
    "character-trigram inverted index (a doc can only match if it has "
    "EVERY trigram of the pattern — posting-list intersection as a "
    "gram bucket join), then exact contains() verification, so results "
    "are EXACTLY the full-scan LIKE the oracle runs. At scale the "
    "index persists partitioned by gram and the scan cost drops from "
    "corpus bytes to candidate bytes. operators/search.py.",
)
def q_trigram_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.search import substring_search

    docs = _tp(spark, sf_dir, "documents")
    return substring_search(docs, "merge batch")


@register(
    "embedding_outliers",
    """
    WITH cent AS (
      SELECT label, pos1 - 1 AS pos,
             SUM(CAST(FLOOR(embedding[pos1]::DOUBLE * 10000000) AS BIGINT)) / 10000000.0 / count(*) AS centroid
      FROM (SELECT label, unnest(generate_series(1, len(embedding))) AS pos1, embedding
            FROM embeddings)
      GROUP BY label, pos1
    ), dev AS (
      SELECT e.vec_id, e.label,
             CAST(FLOOR((e.embedding[c.pos + 1]::DOUBLE - c.centroid)
                        * (e.embedding[c.pos + 1]::DOUBLE - c.centroid)
                        * 10000000) AS BIGINT) AS d_fp
      FROM (SELECT vec_id, label, embedding FROM embeddings) e
      JOIN cent c ON e.label = c.label
    ), dist AS (
      SELECT vec_id, label, CAST(SUM(d_fp) AS BIGINT) AS dist_fp
      FROM dev GROUP BY vec_id, label
    )
    SELECT vec_id, label, dist_fp, rk FROM (
      SELECT vec_id, label, dist_fp,
             CAST(row_number() OVER (PARTITION BY label
                    ORDER BY dist_fp DESC, vec_id) AS BIGINT) AS rk
      FROM dist
    ) WHERE rk <= 5
    """,
    doc="Embedding-space outlier gate: the 5 vectors farthest from "
    "their label centroid per label (mislabeled/garbage detection). "
    "Exact fixed-point centroid reused from embedding_centroids; each "
    "dimension's squared deviation floors to int64 before the "
    "order-free sum; top-k rides (dist desc, id) — hash-stable. "
    "operators/similarity.py embedding_outliers.",
)
def q_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.similarity import embedding_outliers

    emb = _t(spark, sf_dir, "embeddings")
    return embedding_outliers(emb, k=5)


_QUALITY_WITH_SOURCE = _QUALITY_ORACLE.replace(
    "SELECT doc_id, text,", "SELECT doc_id, source, text,", 1
).replace(
    "SELECT doc_id,\n           CASE WHEN", "SELECT doc_id, source,\n           CASE WHEN", 1
)


@register(
    "quality_top_quartile",
    f"""
    WITH scored AS (
      SELECT doc_id, source, score,
             percent_rank() OVER (PARTITION BY source ORDER BY score, doc_id) AS pr
      FROM ( {_QUALITY_WITH_SOURCE} )
    )
    SELECT doc_id, source, score FROM scored WHERE pr >= 0.75
    """,
    doc="Adaptive per-source quality threshold: keep each source's top "
    "quartile by quality score (percent_rank >= 0.75 over (score, id)) "
    "— the mixing-aware alternative to one global cutoff, which would "
    "empty low-scoring sources entirely. percent_rank is "
    "(rank-1)/(n-1): integer-derived, so the double compares "
    "identically in both engines. One window shuffle on source.",
)
def q_quality_top_quartile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.text_analysis import quality_score

    docs = _tp(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", "source", quality_score("text").alias("score")
    )
    w = Window.partitionBy("source").orderBy(F.asc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("pr", F.percent_rank().over(w))
        .filter(F.col("pr") >= 0.75)
        .select("doc_id", "source", "score")
    )


@register(
    "key_skew_profile",
    """
    WITH c AS (
      SELECT l_suppkey AS key, CAST(count(*) AS BIGINT) AS n
      FROM lineitem GROUP BY l_suppkey
    ), m AS (
      SELECT CAST(SUM(n) AS BIGINT) AS total,
             CAST(MAX(n) AS BIGINT) AS max_n,
             CAST(count(*) AS BIGINT) AS n_keys
      FROM c
    )
    SELECT key, n,
           CAST(n * 10000 // total AS BIGINT) AS share_bp,
           CAST(max_n * n_keys * 10000 // total AS BIGINT) AS skew_x10000
    FROM c, m
    ORDER BY n DESC, key LIMIT 10
    """,
    doc="Shuffle-key skew profiler (the diagnostic behind choosing "
    "salting/AQE skew handling): top-10 hottest keys with exact integer "
    "share basis points, plus the skew factor max/mean x10000 "
    "(max_n * n_keys / total — >>10000 means one key dominates and a "
    "plain shuffle join will straggle). The grand total is the benign "
    "1-row scalar handoff; the top-10 rides TakeOrderedAndProject.",
)
def q_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    c = li.groupBy(F.col("l_suppkey").alias("key")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    m = c.agg(
        F.sum("n").cast("long").alias("total"),
        F.max("n").cast("long").alias("max_n"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
    )
    return (
        c.crossJoin(F.broadcast(m))
        .select(
            "key",
            "n",
            F.expr("n * 10000 div total").cast("long").alias("share_bp"),
            F.expr("max_n * n_keys * 10000 div total").cast("long").alias("skew_x10000"),
        )
        .orderBy(F.desc("n"), F.asc("key"))
        .limit(10)
    )


@register(
    "global_budget_sample",
    """
    WITH ranked AS (
      SELECT doc_id, n_chars,
             CAST(SUM(n_chars) OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_size
      FROM documents
    )
    SELECT doc_id, n_chars, cum_size
    FROM ranked
    WHERE cum_size - n_chars < 100000
    """,
    doc="Corpus-global size-budget sampling WITHOUT a single-task "
    "global sort: the running total decomposes into range partitions "
    "on the md5 order key + a driver prefix-sum of P partition totals "
    "(the sequential-ids idiom) — the oracle's single global window is "
    "exactly what this operator exists to avoid at scale. Keep rule: "
    "total BEFORE the row under 100 kB. operators/sampling.py "
    "budget_sample_global.",
)
def q_global_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.sampling import budget_sample_global

    docs = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return budget_sample_global(docs, id_col="doc_id", size_col="n_chars", budget=100_000)


def _cross_embedding_oracle(
    dim: int = 64,
    num_planes: int = 4,
    num_bands: int = 2,
    threshold: float = 0.4,
    bucket_cap: int | None = DEFAULT_BUCKET_CAP,
) -> str:
    """DuckDB twin of cross_corpus_cosine_pairs over the even/odd
    vec_id split — inlined banded plane constants, (band, bucket)
    equi-join BETWEEN the halves deduped across bands, exact cosine
    filter (cosine_dup_pairs technique)."""
    cos = _cosine_sql("t.embedding::DOUBLE[]", "e.embedding::DOUBLE[]")
    return f"""
    WITH planes(band, pidx, pv) AS (VALUES
        {_banded_planes_sql(dim, num_planes, num_bands)}),{_banded_eb_sql(bucket_cap)},
    cand AS (
      SELECT DISTINCT t.vec_id AS train_id, e.vec_id AS eval_id
      FROM eb t JOIN eb e ON t.band = e.band AND t.bucket = e.bucket
      WHERE t.vec_id % 2 = 0 AND e.vec_id % 2 = 1
    )
    SELECT c.train_id, c.eval_id, {cos} AS sim
    FROM cand c
    JOIN embeddings t ON t.vec_id = c.train_id
    JOIN embeddings e ON e.vec_id = c.eval_id
    WHERE {cos} >= {threshold}
    """


@register(
    "cross_embedding_contamination",
    _cross_embedding_oracle(),
    doc="Embedding-level train-vs-eval contamination: (train, eval) "
    "pairs with cosine >= 0.4, OR-of-2-bands sign-LSH gated BETWEEN the "
    "corpora (even/odd vec_id split stands in for the two corpora) — "
    "the semantic complement to the shingle-based contamination_check "
    "(paraphrased leakage shares no n-grams but lands in the same "
    "embedding neighborhood). Deterministic banded planes inlined in "
    "the oracle; every emitted pair hash-checked end to end. "
    "operators/similarity.py cross_corpus_cosine_pairs.",
)
def q_cross_embedding_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.similarity import cross_corpus_cosine_pairs

    emb = _t(spark, sf_dir, "embeddings")
    train = emb.filter(F.col("vec_id") % 2 == 0)
    ev = emb.filter(F.col("vec_id") % 2 == 1)
    # auto-calibrated gate (num_planes=None): resolves to the oracle's
    # (4, 2) base at gate scales, grows past LSH_CALIBRATED_N
    return cross_corpus_cosine_pairs(
        train, ev, threshold=0.4, dim=64, num_planes=None, num_bands=2
    )


_CONTAINMENT_ORACLE = """
    WITH toks AS (
      SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\\s+'), y -> y <> '') AS t FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id,
             CASE WHEN len(t) >= 3 THEN t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                  ELSE array_to_string(t, ' ') END AS s
      FROM (SELECT doc_id, t, unnest(generate_series(1, greatest(len(t) - 2, 1))) AS i FROM toks)
    ), sizes AS (
      SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
    ), common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ), both_dirs AS (
      SELECT doc_a AS doc_inner, doc_b AS doc_outer,
             CAST(n_common AS DOUBLE) / CAST(sa.n_sh AS DOUBLE) AS containment
      FROM common JOIN sizes sa ON sa.doc_id = doc_a
      UNION ALL
      SELECT doc_b AS doc_inner, doc_a AS doc_outer,
             CAST(n_common AS DOUBLE) / CAST(sb.n_sh AS DOUBLE) AS containment
      FROM common JOIN sizes sb ON sb.doc_id = doc_b
    )
    SELECT doc_inner, doc_outer, containment
    FROM both_dirs WHERE containment >= 0.8
"""


@register(
    "containment_pairs",
    _CONTAINMENT_ORACLE,
    doc="Directed shingle-containment near-dups (|A∩B|/|A| >= 0.8): the "
    "asymmetric tier Jaccard misses — a short doc wholly embedded in a "
    "long one (quote inclusion, boilerplate wrapping) scores ~1.0 on "
    "the contained side. Same inverted-index pair generation and "
    "hot-shingle fallback as ngram_jaccard_pairs; only the denominator "
    "changes, per direction. operators/text_dedup.py containment_pairs.",
)
def q_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.text_dedup import containment_pairs

    docs = _t(spark, sf_dir, "documents")
    # shingle cache rides on the frame; the runner releases it after
    # materializing (util.release_cached_deps)
    return containment_pairs(docs, "doc_id", "text", n=3, threshold=0.8)


@register(
    "mergeable_quantiles",
    """
    WITH hist AS (
      SELECT l_returnflag,
             least(greatest((CAST(FLOOR(l_extendedprice * 100) AS BIGINT) - 0)
                   // 171875, 0), 63) AS bin,
             CAST(count(*) AS BIGINT) AS bin_n
      FROM lineitem WHERE l_extendedprice IS NOT NULL GROUP BY 1, 2
    ), ranked AS (
      SELECT l_returnflag, bin, bin_n,
             CAST(SUM(bin_n) OVER (PARTITION BY l_returnflag ORDER BY bin
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n,
             CAST(SUM(bin_n) OVER (PARTITION BY l_returnflag) AS BIGINT) AS total
      FROM hist
    ), q AS (
      SELECT l_returnflag, bin AS q_bin, cum_n, total,
             row_number() OVER (PARTITION BY l_returnflag ORDER BY bin) AS rk
      FROM ranked
      WHERE cum_n >= CAST(ceil(total * 9500 / 10000.0) AS BIGINT)
    )
    SELECT l_returnflag, q_bin, cum_n, total FROM q WHERE rk = 1
    """,
    doc="Mergeable fixed-bin quantile state (t-digest's role, exactly "
    "reproducible): per-returnflag price p95 located by integer rank "
    "over a 64-bin histogram whose state merges by addition — the "
    "incrementally-maintainable quantile for streaming/100 TB, where "
    "the exact percentile would rescan the corpus. Bin width "
    "hard-coded to (110000-0)*100/64 = 171875 fixed-point units in "
    "both engines. operators/summaries.py partial_histogram / "
    "histogram_quantile_bin.",
)
def q_mergeable_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.summaries import (
        histogram_quantile_bin,
        partial_histogram,
    )

    li = _t(spark, sf_dir, "lineitem")
    hist = partial_histogram(
        li, "l_returnflag", "l_extendedprice", lo=0.0, hi=110_000.0, n_bins=64
    )
    return histogram_quantile_bin(hist, "l_returnflag", p_bp=9500)


@register(
    "heavy_hitter_state",
    """
    WITH counts AS (
      SELECT l_returnflag, l_suppkey AS item, CAST(count(*) AS BIGINT) AS n
      FROM lineitem WHERE l_suppkey IS NOT NULL GROUP BY 1, 2
    ), ranked AS (
      SELECT l_returnflag, item, n,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY n DESC, item ASC) AS rk
      FROM counts
    )
    SELECT l_returnflag, item, n FROM ranked WHERE rk <= 16
    UNION ALL
    SELECT l_returnflag, CAST(NULL AS BIGINT) AS item,
           CAST(SUM(n) AS BIGINT) AS n
    FROM ranked WHERE rk > 16 GROUP BY l_returnflag
    """,
    doc="Mergeable truncated-counter heavy-hitter state "
    "(sketches.partial_heavy_hitters): per returnflag, the 16 most "
    "frequent suppliers with exact counts plus one NULL-item row "
    "carrying the truncated mass — the travelling error bound that "
    "makes the state mergeable across batches/tables (merge contract "
    "pytest-verified; this query hash-checks the state production: "
    "deterministic (count DESC, item ASC) truncation, NULL items "
    "excluded so the sentinel is unambiguous). Pins the EXACT mode "
    "(partition_cap=None) so the state is hash-comparable; the "
    "bounded default path has its own oracle (heavy_hitter_bounded) "
    "and bound pytest.",
)
def q_heavy_hitter_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.sketches import partial_heavy_hitters

    li = _t(spark, sf_dir, "lineitem")
    return partial_heavy_hitters(
        li, "l_returnflag", "l_suppkey", m=16, partition_cap=None
    )


@register(
    "duplicated_spans",
    """
    WITH toks AS (
      SELECT doc_id AS doc,
             list_filter(regexp_split_to_array(lower(text), '\\s+'), y -> y <> '') AS t
      FROM documents
    ), src AS (
      SELECT doc, t, len(t) AS n FROM toks WHERE len(t) >= 10
    ), wins AS (
      SELECT doc, CAST(i AS BIGINT) AS start, CAST(i + 9 AS BIGINT) AS "end",
             ('0x' || substr(md5(array_to_string(t[i:i+9], ' ')), 1, 15))::BIGINT AS wh
      FROM (SELECT doc, t, unnest(generate_series(1, n - 9)) AS i FROM src)
    ), dup AS (
      SELECT wh FROM wins GROUP BY wh HAVING count(*) >= 2
    ), dwin AS (
      SELECT w.doc, w.start, w."end" FROM wins w JOIN dup USING (wh)
    ), marked AS (
      SELECT doc, start, "end",
             CASE WHEN start > COALESCE(MAX("end") OVER (
                    PARTITION BY doc ORDER BY start
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -2) + 1
                  THEN 1 ELSE 0 END AS brk
      FROM dwin
    ), isl AS (
      SELECT doc, start, "end",
             SUM(brk) OVER (PARTITION BY doc ORDER BY start
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      FROM marked
    )
    SELECT doc, CAST(MIN(start) AS BIGINT) AS span_start,
           CAST(MAX("end") AS BIGINT) AS span_end,
           CAST(count(*) AS BIGINT) AS n_windows
    FROM isl GROUP BY doc, island
    """,
    doc="Exact duplicated-substring spans (Lee et al. ExactSubstr, "
    "distributed): maximal token ranges covered by 10-token windows "
    "occurring >= 2 times corpus-wide — the sub-document tier that cuts "
    "repeated boilerplate/quotes without dropping documents. Window-hash "
    "count + gaps-and-islands merge: two linear shuffles, no pair "
    "generation, cheaper than any pairwise tier at 100 TB. "
    "operators/subdoc_dedup.py duplicated_spans.",
)
def q_duplicated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.subdoc_dedup import duplicated_spans

    docs = _t(spark, sf_dir, "documents")
    return duplicated_spans(docs, "doc_id", "text", w=10, min_count=2)


@register(
    "span_cut_rewrite",
    """
    WITH toks AS (
      SELECT doc_id AS doc,
             list_filter(regexp_split_to_array(lower(text), '\\s+'), y -> y <> '') AS t
      FROM documents
    ), tok AS (
      SELECT doc, CAST(i AS BIGINT) AS pos, t[i] AS tok
      FROM (SELECT doc, t, unnest(generate_series(1, len(t))) AS i FROM toks)
      WHERE len(t) > 0
    ), src AS (
      SELECT doc, t, len(t) AS n FROM toks WHERE len(t) >= 10
    ), wins AS (
      SELECT doc, CAST(i AS BIGINT) AS start, CAST(i + 9 AS BIGINT) AS "end",
             ('0x' || substr(md5(array_to_string(t[i:i+9], ' ')), 1, 15))::BIGINT AS wh
      FROM (SELECT doc, t, unnest(generate_series(1, n - 9)) AS i FROM src)
    ), dup AS (
      SELECT wh FROM wins GROUP BY wh HAVING count(*) >= 2
    ), dwin AS (
      SELECT w.doc, w.start, w."end" FROM wins w JOIN dup USING (wh)
    ), kept AS (
      SELECT tk.doc, tk.pos, tk.tok
      FROM tok tk
      WHERE NOT EXISTS (
        SELECT 1 FROM dwin d
        WHERE d.doc = tk.doc AND tk.pos BETWEEN d.start AND d."end"
      )
    ), totals AS (
      SELECT doc, CAST(count(*) AS BIGINT) AS n_tokens FROM tok GROUP BY doc
    ), re AS (
      SELECT doc, string_agg(tok, ' ' ORDER BY pos) AS text_kept,
             CAST(count(*) AS BIGINT) AS n_kept
      FROM kept GROUP BY doc
    )
    SELECT t.doc, COALESCE(r.text_kept, '') AS text_kept, t.n_tokens,
           CAST(t.n_tokens - COALESCE(r.n_kept, 0) AS BIGINT) AS n_removed
    FROM totals t LEFT JOIN re r ON t.doc = r.doc
    """,
    doc="The cut pass over duplicated_spans: every document rewritten "
    "with its duplicated 10-token spans removed (kept token stream, "
    "original order; fully-duplicated docs survive as empty strings so "
    "corpus row count is stable). Per-doc range anti-join of token "
    "positions against span ranges + in-array reassembly — linear in "
    "token mass, zero pair generation. "
    "operators/subdoc_dedup.py remove_duplicated_spans.",
)
def q_span_cut_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.subdoc_dedup import remove_duplicated_spans

    docs = _t(spark, sf_dir, "documents")
    return remove_duplicated_spans(docs, "doc_id", "text", w=10, min_count=2)


@register(
    "pivot_status_by_region",
    """
    SELECT r_name,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
    doc="PIVOT surface: order-status counts spread to columns per region. "
    "The value list is DECLARED (pivot('o_orderstatus', [...])) so Spark "
    "skips the extra distinct-values job a blind pivot needs — at 100 TB "
    "that implicit first pass is a full scan; declaring values makes the "
    "pivot one conditional aggregation (identical plan to the CASE-WHEN "
    "oracle).",
)
def q_pivot_status_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    j = (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(nation, cust["c_nationkey"] == nation["n_nationkey"])
        .join(region, nation["n_regionkey"] == region["r_regionkey"])
    )
    piv = (
        j.groupBy("r_name")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "r_name",
        F.coalesce(F.col("F"), F.lit(0)).cast("long").alias("n_f"),
        F.coalesce(F.col("O"), F.lit(0)).cast("long").alias("n_o"),
        F.coalesce(F.col("P"), F.lit(0)).cast("long").alias("n_p"),
    )


@register(
    "cluster_rollup",
    f"""
    SELECT c.cluster_id,
           CAST(MIN(c.doc_id) AS BIGINT) AS canonical_id,
           CAST(count(*) AS BIGINT) AS n_members,
           CAST(SUM(CAST(d.n_chars AS BIGINT)) AS BIGINT) AS sum_n_chars
    FROM ( {_CLUSTERS_ORACLE} ) c
    JOIN documents d ON c.doc_id = d.doc_id
    GROUP BY c.cluster_id
    """,
    doc="Duplicate-cluster attribute rollup: per 3-gram-Jaccard cluster, "
    "the canonical (smallest) member id, member count, and accumulated "
    "byte mass — the post-dedup merge that lets the surviving record "
    "carry the GROUP's metadata (the reference's accumulate-upsert idea "
    "at cluster granularity). One doc-id join + one cluster groupBy. "
    "operators/text_dedup.py cluster_rollup.",
)
def q_cluster_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.text_dedup import (
        cluster_rollup,
        duplicate_clusters,
        jaccard_pairs,
    )
    from pasta_pipeline_spark.operators.util import release_cached_deps

    docs = _t(spark, sf_dir, "documents")
    pairs = jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5)
    clusters = duplicate_clusters(docs.select("doc_id"), pairs, id_col="doc_id")
    # the fixpoint loop materialized the pair plan — release its cache
    release_cached_deps(pairs)
    return cluster_rollup(clusters, docs.select("doc_id", "n_chars"), ["n_chars"])


@register(
    "quantized_topk",
    """
    WITH qsrc AS (
      SELECT embedding AS qv FROM embeddings ORDER BY vec_id LIMIT 1
    ), qm AS (
      SELECT qv, list_max(list_transform(qv, x -> abs(CAST(x AS DOUBLE)))) AS mx
      FROM qsrc
    ), qq AS (
      SELECT list_transform(qv, x ->
               CAST(round(CAST(x AS DOUBLE) * (127.0 / mx)) AS BIGINT)) AS qq
      FROM qm
    ), cm AS (
      SELECT vec_id, embedding,
             list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS mx
      FROM embeddings
    ), cq AS (
      SELECT vec_id,
             list_transform(embedding, x ->
               CAST(round(CAST(x AS DOUBLE) * (127.0 / mx)) AS BIGINT)) AS cq,
             CAST(greatest(1, FLOOR((127.0 / mx) * 10000)) AS BIGINT) AS scale_fp
      FROM cm WHERE mx > 0
    ), dots AS (
      SELECT c.vec_id, c.scale_fp,
             CAST(list_sum(list_transform(generate_series(1, len(c.cq)),
                    i -> c.cq[i] * qq.qq[i])) AS BIGINT) AS qdot
      FROM cq c, qq
    )
    SELECT vec_id, qdot, scale_fp,
           CAST(qdot * 10000 // scale_fp AS BIGINT) AS score_fp
    FROM dots
    WHERE scale_fp IS NOT NULL AND scale_fp > 0
    ORDER BY score_fp DESC, vec_id
    LIMIT 10
    """,
    doc="INT8-quantized top-k (similarity.quantized_topk) — the memory-"
    "bandwidth similarity tier: symmetric int8 quantization both sides, "
    "exact int64 dot product, integer rescale by the corpus vector's "
    "scale (qdot*10000 div scale_fp; both engines truncate toward zero). "
    "The one approximate tier whose ENTIRE ranking path is hash-exact "
    "integers — quantization, dot, rescale replayed bit-for-bit in the "
    "oracle. Same one-scan broadcast plan as cosine_topk.",
)
def q_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.similarity import quantized_topk

    emb = _t(spark, sf_dir, "embeddings")
    query = emb.orderBy("vec_id").limit(1).select(F.col("embedding").alias("qv"))
    return quantized_topk(emb, query, k=10)


_URL_VARIANTS_SQL = """
      SELECT doc_id,
             CASE doc_id % 4
               WHEN 0 THEN 'https://Example.COM/path' || (doc_id // 4) || '/?utm_source=x&b=2&a=1#frag'
               WHEN 1 THEN 'https://example.com/path' || (doc_id // 4) || '?a=1&b=2'
               WHEN 2 THEN 'https://example.com:443/path' || (doc_id // 4) || '/#section'
               ELSE 'http://other.net:80/p' || doc_id
             END AS url
      FROM documents
"""


