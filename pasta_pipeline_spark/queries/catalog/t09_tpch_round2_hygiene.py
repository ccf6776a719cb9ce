"""Catalog tier: TPC-H round 2 + corpus hygiene, rolling frames, CDC, event gaps.

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
from pasta_pipeline_spark.queries.catalog._core import _t, _tp, _xsum, register
from pasta_pipeline_spark.queries.catalog._core import _XS
from pasta_pipeline_spark.queries.catalog.t03_dedup_ladder import _JACCARD_ORACLE
from pasta_pipeline_spark.queries.catalog.t04_similarity_ann import _cosine_sql
from pasta_pipeline_spark.queries.catalog.t05_multimodal import _banded_eb_sql, _banded_planes_sql

# ---------------------------------------------------------------------------
# TPC-H-shape relational depth, round 2: Q7/Q8/Q14/Q18/Q19/Q21 adaptations
# (the testdata lacks partsupp/commitdate/shipmode, so Q9/Q12/Q21-as-written
# are out of reach; Q21's exists/not-exists shape is re-derived from
# l_shipdate vs o_orderdate instead).
# ---------------------------------------------------------------------------


@register(
    "volume_shipping",
    """
    SELECT sn.n_name AS supp_nation,
           cn.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INT) AS l_year,
           SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) / 10000.0
             AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
        OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1, 2, 3
    """,
    doc="TPC-H Q7 shape: bilateral trade volume between two nations by ship "
    "year. Two broadcast copies of nation, disjunctive cross-nation "
    "predicate evaluated after both dim joins; fact-side date filter is "
    "pushed to the lineitem scan.",
)
def q_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("l_year"))
        .agg(_xsum(disc).alias("revenue"))
    )


@register(
    "market_share",
    """
    WITH rev AS (
      SELECT CAST(year(o_orderdate) AS INT) AS o_year,
             CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT) AS rev_x,
             sn.n_name AS supp_nation
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      JOIN region   ON cn.n_regionkey = r_regionkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      WHERE r_name = 'ASIA'
    )
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_5' THEN rev_x ELSE 0 END) AS BIGINT)
             AS nation_rev_x,
           CAST(SUM(rev_x) AS BIGINT) AS total_rev_x,
           CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_5' THEN rev_x ELSE 0 END) AS BIGINT)
             * 10000 // CAST(SUM(rev_x) AS BIGINT) AS BIGINT) AS share_bp
    FROM rev GROUP BY o_year
    """,
    doc="TPC-H Q8 shape: NATION_5 suppliers' share of revenue to ASIA "
    "customers per order year. The share is exact integer basis points "
    "(int64 fixed-point numerator/denominator, floor division) so the "
    "ratio is hash-stable cross-engine; numerator and denominator are "
    "also emitted raw.",
)
def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    asia = region.filter(F.col("r_name") == "ASIA")
    rev_x = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * F.lit(_XS)
    ).cast("long")
    nation_rev = F.sum(
        F.when(F.col("supp_nation") == "NATION_5", rev_x).otherwise(F.lit(0))
    )
    total_rev = F.sum(rev_x)
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(asia), F.col("cn_region") == F.col("r_regionkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(nation_rev.alias("nation_rev_x"), total_rev.alias("total_rev_x"))
        .withColumn("share_bp", F.expr("nation_rev_x * 10000 div total_rev_x"))
    )


@register(
    "promo_revenue_share",
    """
    SELECT CAST(year(l_shipdate) AS INT) AS l_year,
           CAST(SUM(CASE WHEN p_type = 'PROMO'
                    THEN CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS promo_rev_x,
           CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT)
             AS total_rev_x,
           CAST(CAST(SUM(CASE WHEN p_type = 'PROMO'
                    THEN CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)
                    ELSE 0 END) AS BIGINT) * 10000
             // CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT)
             AS BIGINT) AS promo_share_bp
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY l_year
    """,
    doc="TPC-H Q14 shape: PROMO-type parts' share of yearly revenue. "
    "Broadcast part join; share as exact integer basis points.",
)
def q_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    rev_x = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * F.lit(_XS)
    ).cast("long")
    promo_x = F.when(F.col("p_type") == "PROMO", rev_x).otherwise(F.lit(0))
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.year("l_shipdate").cast("int").alias("l_year"))
        .agg(F.sum(promo_x).alias("promo_rev_x"), F.sum(rev_x).alias("total_rev_x"))
        .withColumn("promo_share_bp", F.expr("promo_rev_x * 10000 div total_rev_x"))
    )


@register(
    "large_orders",
    """
    SELECT c_custkey, c_name, o_orderkey,
           CAST(epoch(o_orderdate) AS BIGINT) AS o_epoch,
           CAST(FLOOR(o_totalprice * 10000) AS BIGINT) AS totalprice_x,
           CAST(SUM(CAST(FLOOR(l_quantity * 10000) AS BIGINT)) AS BIGINT) AS qty_x
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(FLOOR(l_quantity * 10000) AS BIGINT)) > 150 * 10000
    )
    GROUP BY 1, 2, 3, 4, 5
    """,
    doc="TPC-H Q18 shape (large-volume orders): orders whose total quantity "
    "exceeds 150, with customer attribution. The HAVING subquery becomes "
    "a semi-join against the aggregated keys; quantities ride the "
    "fixed-point bridge end to end.",
)
def q_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    li = _t(spark, sf_dir, "lineitem")
    qty_x = F.floor(F.col("l_quantity") * F.lit(_XS)).cast("long")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(qty_x).alias("qty_x"))
        .filter(F.col("qty_x") > 150 * _XS)
        .select("l_orderkey", "qty_x")
    )
    return (
        orders.join(big, F.col("o_orderkey") == big["l_orderkey"])
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("timestamp").cast("long").alias("o_epoch"),
            F.floor(F.col("o_totalprice") * F.lit(_XS)).cast("long").alias("totalprice_x"),
            "qty_x",
        )
    )


@register(
    "disjunctive_part_revenue",
    """
    SELECT SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) / 10000.0
             AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 20)
       OR (p_brand = 'Brand#22' AND p_size BETWEEN 10 AND 30
           AND l_quantity >= 10 AND l_quantity <= 35)
       OR (p_brand = 'Brand#15' AND p_size BETWEEN 20 AND 50
           AND l_quantity >= 25 AND l_quantity <= 50)
    """,
    doc="TPC-H Q19 shape: disjunction of brand/size/quantity conjunctions. "
    "Catalyst splits the OR into a part-side residual (brand+size — "
    "evaluated inside the broadcast join) and keeps the mixed "
    "lineitem+part terms as a post-join filter; the common l_quantity "
    "range [1,50] is not pre-filterable, which is exactly the Q19 "
    "stress.",
)
def q_disjunctive_part_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    q = F.col("l_quantity")
    s = F.col("p_size")
    pred = (
        ((F.col("p_brand") == "Brand#11") & s.between(1, 15) & q.between(1, 20))
        | ((F.col("p_brand") == "Brand#22") & s.between(10, 30) & q.between(10, 35))
        | ((F.col("p_brand") == "Brand#15") & s.between(20, 50) & q.between(25, 50))
    )
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(pred)
        .agg(_xsum(disc).alias("revenue"), F.count(F.lit(1)).cast("long").alias("n_items"))
    )


@register(
    "waiting_suppliers",
    """
    WITH lo AS (
      SELECT l_orderkey, l_suppkey,
             max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 180 DAY
                      THEN 1 ELSE 0 END) AS late
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1, 2
    ), ord AS (
      SELECT l_orderkey,
             count(*) AS n_supp,
             SUM(late) AS n_late_supp
      FROM lo GROUP BY 1
    )
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM lo
    JOIN ord USING (l_orderkey)
    JOIN supplier ON lo.l_suppkey = s_suppkey
    WHERE lo.late = 1 AND ord.n_supp >= 2 AND ord.n_late_supp = 1
    GROUP BY s_name
    """,
    doc="TPC-H Q21 shape re-derived without l_commitdate: a supplier 'kept "
    "the order waiting' when it is the ONLY supplier on a multi-supplier "
    "order that shipped >180 days after the order date. The classic "
    "EXISTS / NOT EXISTS pair collapses into one per-(order,supplier) "
    "aggregate plus a per-order window over the SAME partitioning — the "
    "fact table is scanned once; the orders join's shuffle on "
    "l_orderkey is reused by the grouped agg and the window (no "
    "correlated self-joins, no second scan); supplier dim is broadcast.",
)
def q_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    supplier = _t(spark, sf_dir, "supplier")
    late = F.max(
        F.when(
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 180 DAYS"),
            F.lit(1),
        ).otherwise(F.lit(0))
    ).alias("late")
    lo = (
        li.join(orders.select("o_orderkey", "o_orderdate"),
                F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(late)
    )
    w = Window.partitionBy("l_orderkey")
    return (
        lo.withColumn("n_supp", F.count(F.lit(1)).over(w))
        .withColumn("n_late_supp", F.sum("late").over(w))
        .filter((F.col("late") == 1) & (F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
    )


# ---------------------------------------------------------------------------
# Corpus hygiene, round 2: PII redaction, encoding profile, n-gram novelty
# ---------------------------------------------------------------------------

#: Deterministic PII augmentation shared by the Spark query and the
#: oracle: the synthetic documents contain no organic PII, so both
#: engines graft identical synthetic emails/phones/IPs onto a doc_id-
#: keyed subset — detection and redaction then operate on real,
#: varied text with known-nonzero match counts.
_PII_AUG_SQL = """
    text
    || CASE WHEN doc_id % 3 = 0
            THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
            ELSE '' END
    || CASE WHEN doc_id % 4 = 0
            THEN ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
            ELSE '' END
    || CASE WHEN doc_id % 5 = 0
            THEN ' host 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                 || '.' || CAST(doc_id * 7 % 256 AS VARCHAR)
            ELSE '' END
"""


def _pii_aug_spark():
    did = F.col("doc_id")
    return F.concat(
        F.col("text"),
        F.when(
            did % 3 == 0,
            F.concat(F.lit(" contact user"), did.cast("string"), F.lit("@example.com")),
        ).otherwise(F.lit("")),
        F.when(
            did % 4 == 0,
            F.concat(
                F.lit(" call +1-555-"),
                F.lpad((did % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            did % 5 == 0,
            F.concat(
                F.lit(" host 10.0."),
                (did % 256).cast("string"),
                F.lit("."),
                ((did * 7) % 256).cast("string"),
            ),
        ).otherwise(F.lit("")),
    )


from pasta_pipeline_spark.operators.pii import (  # noqa: E402
    EMAIL_PATTERN,
    IPV4_PATTERN,
    PHONE_PATTERN,
)

_PII_ORACLE = f"""
    WITH aug AS (
      SELECT doc_id, {_PII_AUG_SQL} AS t FROM documents
    ), red AS (
      SELECT doc_id, t,
             regexp_replace(regexp_replace(regexp_replace(t,
                '{EMAIL_PATTERN}', '<EMAIL>', 'g'),
                '{PHONE_PATTERN}', '<PHONE>', 'g'),
                '{IPV4_PATTERN}', '<IP>', 'g') AS r
      FROM aug
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '{EMAIL_PATTERN}')) AS BIGINT) AS n_email,
           CAST(len(regexp_extract_all(t, '{PHONE_PATTERN}')) AS BIGINT) AS n_phone,
           CAST(len(regexp_extract_all(t, '{IPV4_PATTERN}')) AS BIGINT) AS n_ipv4,
           md5(r) AS redacted_md5,
           CAST(length(r) AS BIGINT) AS n_redacted_chars
    FROM red
"""


@register(
    "pii_scan",
    _PII_ORACLE,
    doc="PII detection + redaction (operators/pii.py): portable "
    "RE2/Java/Python regexes, fixed redaction order, all native "
    "expressions. The redacted text itself is hash-compared (md5), "
    "not just the counts — a replacement-order bug cannot hide.",
)
def q_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.pii import scan_pii

    docs = _tp(spark, sf_dir, "documents").withColumn("aug", _pii_aug_spark())
    return (
        scan_pii(docs, "doc_id", "aug")
        .select(
            "doc_id",
            F.col("n_email"),
            F.col("n_phone"),
            F.col("n_ipv4"),
            F.md5("redacted").alias("redacted_md5"),
            F.length("redacted").cast("long").alias("n_redacted_chars"),
        )
    )


@register(
    "encoding_quality",
    """
    WITH toks AS (
      SELECT doc_id, text,
             list_filter(regexp_split_to_array(text, '\\s+'), y -> y <> '') AS t
      FROM documents
    )
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS n_digits,
           CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS BIGINT) AS n_punct,
           CAST(len(regexp_extract_all(text, '[ \t\n\r]')) AS BIGINT) AS n_ws,
           CAST(len(regexp_extract_all(text, '[ \t\n\r]+')) AS BIGINT) AS n_ws_runs,
           CAST(len(regexp_extract_all(text, '[^\\x00-\\x7f]')) AS BIGINT) AS n_nonascii,
           CAST(len(regexp_extract_all(text, '�')) AS BIGINT) AS n_replacement,
           CAST(coalesce(list_max(list_transform(t, y -> length(y))), 0) AS BIGINT)
             AS max_token_chars
    FROM toks
    """,
    doc="Encoding/mojibake hygiene profile (text_analysis.encoding_profile): "
    "per-doc character-class counts, whitespace runs, U+FFFD decode-error "
    "markers, longest-token blob detector — all portable-regex native "
    "expressions.",
)
def q_encoding_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.text_analysis import encoding_profile

    docs = _tp(spark, sf_dir, "documents")
    prof = encoding_profile("text")
    return docs.select("doc_id", *[c.alias(name) for name, c in prof.items()])


@register(
    "ngram_novelty",
    """
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '\\s+'), y -> y <> '') AS t
      FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id,
             CASE WHEN len(t) >= 5
                  THEN t[i]||' '||t[i+1]||' '||t[i+2]||' '||t[i+3]||' '||t[i+4]
                  ELSE array_to_string(t, ' ') END AS s
      FROM (SELECT doc_id, t,
                   unnest(generate_series(1, greatest(len(t) - 4, 1))) AS i
            FROM toks)
    ), dfreq AS (
      SELECT s, count(*) AS df FROM sh GROUP BY s
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
           CAST(CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) * 10000
             // CAST(count(*) AS BIGINT) AS BIGINT) AS novelty_bp
    FROM sh JOIN dfreq USING (s)
    GROUP BY doc_id
    """,
    doc="Per-document 5-gram novelty (text_dedup.shingle_novelty): share of "
    "a doc's distinct shingles occurring in no other document — the "
    "global-boilerplate complement to pairwise dedup. Inverted-index "
    "skeleton without the pair explosion; exact integer basis points.",
)
def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.text_dedup import shingle_novelty

    docs = _tp(spark, sf_dir, "documents")
    return shingle_novelty(docs, "doc_id", "text", n=5)


def _semantic_dedup_oracle(
    dim: int = 64,
    num_planes: int = 4,
    num_bands: int = 2,
    threshold: float = 0.4,
    bucket_cap: int | None = DEFAULT_BUCKET_CAP,
) -> str:
    """DuckDB twin of semantic_dedup: same inlined deterministic
    banded planes as _cosine_dup_lsh_oracle, then NOT EXISTS over the
    smaller-id band-colliding neighbors."""
    cos = _cosine_sql("a.embedding::DOUBLE[]", "b.embedding::DOUBLE[]")
    return f"""
    WITH planes(band, pidx, pv) AS (VALUES
        {_banded_planes_sql(dim, num_planes, num_bands)}),{_banded_eb_sql(bucket_cap)},
    cand AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM eb a JOIN eb b
        ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id
    ),
    drops AS (
      SELECT DISTINCT c.id_b AS vec_id
      FROM cand c
      JOIN embeddings a ON a.vec_id = c.id_a
      JOIN embeddings b ON b.vec_id = c.id_b
      WHERE {cos} >= {threshold}
    )
    SELECT e.vec_id,
           CAST(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS INT) AS kept
    FROM embeddings e LEFT JOIN drops d ON e.vec_id = d.vec_id
    """


@register(
    "semantic_dedup",
    _semantic_dedup_oracle(),
    doc="SemDedup-style embedding-level dedup (similarity.semantic_dedup): "
    "smallest id of every near-dup group survives; OR-of-2-bands sign-LSH "
    "gates the pair join so the contract is deterministic AND the plan is "
    "near-linear with recall that grows as bands are added. Oracle "
    "replays the banding + NOT EXISTS in DuckDB.",
)
def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.similarity import semantic_dedup

    emb = _t(spark, sf_dir, "embeddings")
    # num_planes=None engages the auto-calibrated growth recipe
    # (similarity.auto_lsh_config): at the oracle gate scales
    # (n <= LSH_CALIBRATED_N) it resolves to exactly the (4, 2) base
    # the DuckDB twin replays; at bigger corpora planes/bands grow so
    # the plan stays near-linear (r8 verdict ask #1).
    return semantic_dedup(emb, threshold=0.4, dim=64, num_planes=None, num_bands=2)


# ---------------------------------------------------------------------------
# Round 2: time-based rolling frames and weighted sampling
# ---------------------------------------------------------------------------


@register(
    "rolling_hour_stats",
    """
    SELECT user_id,
           CAST(epoch_us(ts) AS BIGINT) AS ts_us,
           value,
           CAST(count(*) OVER w AS BIGINT) AS n_win,
           CAST(SUM(CAST(FLOOR(value * 10000) AS BIGINT)) OVER w AS BIGINT) AS sum_x,
           CAST(CAST(SUM(CAST(FLOOR(value * 10000) AS BIGINT)) OVER w AS BIGINT)
                // CAST(count(*) OVER w AS BIGINT) AS BIGINT) AS avg_x
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY CAST(epoch_us(ts) AS BIGINT)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
    doc="Trailing-1h rolling count/sum/mean per user over irregular events "
    "(timeseries.rolling_range_agg): a RANGE frame on epoch-microsecond "
    "ordering — time-distance peers, not row counts, so irregular spacing "
    "and simultaneous events behave identically cross-engine. Single "
    "sorted pass per key, no self-join; mean is exact integer fixed-point.",
)
def q_rolling_hour_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.timeseries import rolling_range_agg

    ev = _t(spark, sf_dir, "events")
    return rolling_range_agg(ev, "user_id", "ts", "value", window_sec=3600)


@register(
    "weighted_sample",
    """
    WITH scored AS (
      SELECT doc_id, lang, n_chars,
             ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT + 1)
                / 1152921504606846976.0)
               / CAST(n_chars AS DOUBLE) AS score
      FROM documents
      WHERE n_chars IS NOT NULL AND n_chars > 0
    )
    SELECT doc_id, lang, n_chars, rk FROM (
      SELECT doc_id, lang, n_chars,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY score DESC, doc_id ASC) AS rk
      FROM scored
    ) WHERE rk <= 5
    """,
    doc="Deterministic weighted sampling without replacement (sampling."
    "weighted_sample_topk, Efraimidis-Spirakis A-ES): 5 docs per language "
    "weighted by length, u = md5-uniform(doc_id), score = ln(u)/w. No RNG "
    "state — reproducible across runs and engines; ln on (0,1] is "
    "bit-stable (determinism playbook #7).",
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.sampling import weighted_sample_topk

    docs = _t(spark, sf_dir, "documents")
    return weighted_sample_topk(
        docs.select("doc_id", "lang", "n_chars"), "doc_id", "n_chars", k=5, group_col="lang"
    )


# ---------------------------------------------------------------------------
# Round 2: CDC apply, snapshot diff, cohort retention
# ---------------------------------------------------------------------------

_ORDER_COLS = "o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority"


@register(
    "cdc_apply",
    f"""
    WITH changes AS (
      SELECT {_ORDER_COLS}, 'D' AS op, 1 AS seq FROM orders WHERE o_orderkey % 10 = 0
      UNION ALL
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice + 1000, o_orderdate,
             o_orderpriority, 'U' AS op, 2 AS seq
      FROM orders WHERE o_orderkey % 7 = 0
      UNION ALL
      SELECT o_orderkey + 1000000, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
             o_orderpriority, 'I' AS op, 3 AS seq
      FROM orders WHERE o_orderkey % 13 = 0
    ), latest AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey ORDER BY seq DESC) AS rn
        FROM changes
      ) WHERE rn = 1
    ), survivors AS (
      SELECT o.* FROM orders o
      WHERE NOT EXISTS (SELECT 1 FROM latest l
                        WHERE l.o_orderkey = o.o_orderkey AND l.op = 'D')
    ), merged AS (
      SELECT {_ORDER_COLS} FROM latest WHERE op <> 'D'
      UNION ALL
      SELECT {_ORDER_COLS} FROM survivors s
      WHERE NOT EXISTS (SELECT 1 FROM latest l
                        WHERE l.o_orderkey = s.o_orderkey AND l.op <> 'D')
    )
    SELECT o_orderkey, o_custkey, o_orderstatus,
           CAST(epoch(o_orderdate) AS BIGINT) AS o_epoch,
           CAST(FLOOR(o_totalprice * 10000) AS BIGINT) AS totalprice_x
    FROM merged
    """,
    doc="CDC log apply (merge.apply_cdc): I/U/D change log collapses to the "
    "latest op per key, deletes drop the key, the rest last-writer-wins — "
    "equivalent to row-by-row replay in seq order; the upsert family "
    "member ON CONFLICT cannot express. Window + anti-join + merge, all "
    "on the same key. The log here is derived deterministically from "
    "orders (D for keys %10, U with bumped price for %7, I of shifted "
    "keys for %13 — overlaps exercise the seq collapse).",
)
def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.merge import apply_cdc

    orders = _t(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    d = orders.filter(k % 10 == 0).withColumn("op", F.lit("D")).withColumn("seq", F.lit(1))
    u = (
        orders.filter(k % 7 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") + 1000)
        .withColumn("op", F.lit("U"))
        .withColumn("seq", F.lit(2))
    )
    i = (
        orders.filter(k % 13 == 0)
        .withColumn("o_orderkey", k + 1000000)
        .withColumn("op", F.lit("I"))
        .withColumn("seq", F.lit(3))
    )
    changes = d.unionByName(u).unionByName(i)
    merged = apply_cdc(orders, changes, "o_orderkey")
    return merged.select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.col("o_orderdate").cast("timestamp").cast("long").alias("o_epoch"),
        F.floor(F.col("o_totalprice") * F.lit(_XS)).cast("long").alias("totalprice_x"),
    )


@register(
    "snapshot_diff_orders",
    """
    WITH old AS (
      SELECT * FROM orders WHERE o_orderkey % 97 <> 0
    ), new AS (
      SELECT o_orderkey, o_custkey, o_orderstatus,
             CASE WHEN o_orderkey % 89 = 0 THEN o_totalprice + 1 ELSE o_totalprice END
               AS o_totalprice,
             o_orderdate, o_orderpriority
      FROM orders WHERE o_orderkey % 83 <> 0
    )
    SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
           CASE WHEN o.o_orderkey IS NULL THEN 'added'
                WHEN n.o_orderkey IS NULL THEN 'removed'
                WHEN o.o_custkey IS NOT DISTINCT FROM n.o_custkey
                 AND o.o_orderstatus IS NOT DISTINCT FROM n.o_orderstatus
                 AND o.o_totalprice IS NOT DISTINCT FROM n.o_totalprice
                 AND o.o_orderdate IS NOT DISTINCT FROM n.o_orderdate
                 AND o.o_orderpriority IS NOT DISTINCT FROM n.o_orderpriority
                THEN 'unchanged'
                ELSE 'changed' END AS diff_status
    FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
    """,
    doc="Snapshot diff (merge.snapshot_diff): per-key added/removed/changed/"
    "unchanged between two table versions — the audit complement to the "
    "merge family (TableStore keeps the predecessor snapshot for exactly "
    "this). One full-outer join, null-safe column conjunction. Old/new "
    "are derived deterministically from orders (%97 removed from old, "
    "%83 removed from new, %89 price-bumped).",
)
def q_snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.merge import snapshot_diff

    orders = _t(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    old = orders.filter(k % 97 != 0)
    new = orders.filter(k % 83 != 0).withColumn(
        "o_totalprice",
        F.when(k % 89 == 0, F.col("o_totalprice") + 1).otherwise(F.col("o_totalprice")),
    )
    return snapshot_diff(old, new, "o_orderkey")


@register(
    "cohort_retention",
    """
    WITH activity AS (
      SELECT DISTINCT user_id,
             CAST(epoch_us(ts) // 604800000000 AS BIGINT) AS wk
      FROM events
    ), cohorts AS (
      SELECT user_id, MIN(wk) AS cwk FROM activity GROUP BY user_id
    )
    SELECT c.cwk AS cohort_week, a.wk - c.cwk AS week_offset,
           CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
    FROM activity a JOIN cohorts c ON a.user_id = c.user_id
    GROUP BY 1, 2
    """,
    doc="Cohort retention matrix (sessions.cohort_retention): users "
    "cohorted by the epoch-week of their first event; cells count "
    "distinct users active N weeks later. Integer epoch weeks — no "
    "calendar semantics to diverge cross-engine; state bounded by "
    "user x week distinct, not event volume.",
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.sessions import cohort_retention

    ev = _t(spark, sf_dir, "events")
    return cohort_retention(ev, "user_id", "ts")


# ---------------------------------------------------------------------------
# Round 2: event-gap stats, Zipf rank-frequency slope, dedup savings report
# ---------------------------------------------------------------------------


@register(
    "event_gap_stats",
    """
    WITH g AS (
      SELECT user_id,
             CAST(epoch_us(ts) AS BIGINT)
               - lag(CAST(epoch_us(ts) AS BIGINT))
                 OVER (PARTITION BY user_id ORDER BY CAST(epoch_us(ts) AS BIGINT), event_id)
               AS gap
      FROM events
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(gap) AS BIGINT) AS n_gaps,
           CAST(min(gap) AS BIGINT) AS min_gap_us,
           CAST(max(gap) AS BIGINT) AS max_gap_us,
           CASE WHEN count(gap) > 0
                THEN CAST(CAST(SUM(gap) AS BIGINT) // CAST(count(gap) AS BIGINT) AS BIGINT)
                ELSE NULL END AS avg_gap_us
    FROM g GROUP BY user_id
    """,
    doc="Inter-event gap profile per user: lag over (epoch-micros, event_id) "
    "ordering — the deterministic-tiebreak lag idiom — then integer "
    "min/max/mean. One window + one agg on the same key partitioning; "
    "single-event users surface NULL gaps, not fabricated zeros.",
)
def q_event_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy(us, F.col("event_id"))
    gap = us - F.lag(us).over(w)
    return (
        ev.select("user_id", gap.alias("gap"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count("gap").alias("n_gaps"),
            F.min("gap").alias("min_gap_us"),
            F.max("gap").alias("max_gap_us"),
            F.sum("gap").alias("_sum_gap"),
        )
        .withColumn(
            "avg_gap_us",
            F.when(F.col("n_gaps") > 0, F.expr("_sum_gap div n_gaps")).otherwise(
                F.lit(None).cast("long")
            ),
        )
        .drop("_sum_gap")
    )


@register(
    "zipf_slope",
    """
    WITH tok AS (
      SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'), y -> y <> ''))
               AS token
      FROM documents
    ), freq AS (
      SELECT token, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY token
    ), ranked AS (
      SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, token ASC) AS rk FROM freq
    ), terms AS (
      SELECT CAST(FLOOR(ln(CAST(rk AS DOUBLE)) * 1000000) AS BIGINT) AS x,
             CAST(FLOOR(ln(CAST(n AS DOUBLE)) * 1000000) AS BIGINT) AS y
      FROM ranked WHERE rk <= 100
    )
    SELECT CAST(count(*) AS BIGINT) AS n_terms,
           CAST(CAST(count(*) AS BIGINT) * CAST(SUM(x * y) AS BIGINT)
                - CAST(SUM(x) AS BIGINT) * CAST(SUM(y) AS BIGINT) AS BIGINT) AS slope_num,
           CAST(CAST(count(*) AS BIGINT) * CAST(SUM(x * x) AS BIGINT)
                - CAST(SUM(x) AS BIGINT) * CAST(SUM(x) AS BIGINT) AS BIGINT) AS slope_den,
           CAST(CAST(count(*) AS BIGINT) * CAST(SUM(x * y) AS BIGINT)
                - CAST(SUM(x) AS BIGINT) * CAST(SUM(y) AS BIGINT) AS DOUBLE)
             / CAST(CAST(count(*) AS BIGINT) * CAST(SUM(x * x) AS BIGINT)
                - CAST(SUM(x) AS BIGINT) * CAST(SUM(x) AS BIGINT) AS DOUBLE) AS slope
    FROM terms
    """,
    doc="Zipf rank-frequency slope of the corpus: OLS of ln(freq) on "
    "ln(rank) over the top-100 vocabulary (text_analysis.build_vocab "
    "ranks). A healthy natural corpus slopes ~-1; word salad flattens — "
    "a one-number corpus-health probe. Every moment sum is int64 "
    "(floor-scaled ln terms, exact integer products), so the final "
    "double is one division of two identical BIGINTs — hash-stable.",
)
def q_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.text_analysis import build_vocab

    docs = _tp(spark, sf_dir, "documents")
    vocab = build_vocab(docs, top_n=100)
    x = F.floor(F.log(F.col("token_id").cast("double")) * F.lit(1000000)).cast("long")
    y = F.floor(F.log(F.col("n_occurrences").cast("double")) * F.lit(1000000)).cast("long")
    agg = vocab.select(x.alias("x"), y.alias("y")).agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.sum(F.col("x") * F.col("y")).alias("_sxy"),
        F.sum("x").alias("_sx"),
        F.sum("y").alias("_sy"),
        F.sum(F.col("x") * F.col("x")).alias("_sxx"),
    )
    return (
        agg.withColumn("slope_num", F.expr("n_terms * _sxy - _sx * _sy"))
        .withColumn("slope_den", F.expr("n_terms * _sxx - _sx * _sx"))
        .withColumn(
            "slope", F.col("slope_num").cast("double") / F.col("slope_den").cast("double")
        )
        .select("n_terms", "slope_num", "slope_den", "slope")
    )


_DEDUP_SAVINGS_ORACLE = """
    WITH RECURSIVE pairs AS (
""" + _JACCARD_ORACLE + """
    ), edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM pairs
    ), cc(node, lbl) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.dst, c.lbl FROM cc c JOIN edges e ON c.node = e.src
    ), clusters AS (
      SELECT node AS doc_id, min(lbl) AS cluster_id FROM cc GROUP BY node
    )
    SELECT c.cluster_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(CAST(d.n_chars AS BIGINT)) AS BIGINT) AS bytes_total,
           CAST(SUM(CASE WHEN c.doc_id <> c.cluster_id THEN CAST(d.n_chars AS BIGINT)
                         ELSE 0 END) AS BIGINT) AS bytes_saved
    FROM clusters c JOIN documents d ON c.doc_id = d.doc_id
    GROUP BY c.cluster_id
    HAVING count(*) > 1
"""


@register(
    "dedup_savings",
    _DEDUP_SAVINGS_ORACLE,
    doc="Dedup savings report: per near-dup cluster (3-gram Jaccard >= 0.5 "
    "connected components), member count, total bytes, and the bytes "
    "removed when only the smallest-id survivor is kept — the number a "
    "pipeline owner actually acts on. Composition of duplicate_clusters "
    "+ one broadcast-sized join + one agg; singleton clusters are "
    "excluded (they save nothing).",
)
def q_dedup_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.text_dedup import duplicate_clusters, jaccard_pairs
    from pasta_pipeline_spark.operators.util import release_cached_deps

    docs = _t(spark, sf_dir, "documents")
    pairs = jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5)
    clusters = duplicate_clusters(docs, pairs)
    release_cached_deps(pairs)
    nchars = docs.select("doc_id", F.col("n_chars").cast("long").alias("nc"))
    return (
        clusters.join(nchars, "doc_id")
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nc").alias("bytes_total"),
            F.sum(F.when(F.col("doc_id") != F.col("cluster_id"), F.col("nc")).otherwise(0)).alias(
                "bytes_saved"
            ),
        )
        .filter(F.col("n_docs") > 1)
    )


