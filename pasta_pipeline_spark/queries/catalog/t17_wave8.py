"""Catalog tier: wave 8: robust stats, AB testing, decayed counts, tokenizer audits.

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
from pasta_pipeline_spark.queries.catalog.t04_similarity_ann import _cosine_sql
from pasta_pipeline_spark.queries.catalog.t05_multimodal import _banded_planes_sql

# ---------------------------------------------------------------------------
# Wave 8: robust stats, AB testing, decayed counts, tokenizer/corpus audits,
# skyline, record linkage, in-plan PCA, bitext mining
# ---------------------------------------------------------------------------


@register(
    "weighted_median",
    """
    WITH w AS (
      SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS qty,
             SUM(CAST(FLOOR(l_extendedprice * 10000) AS BIGINT)) AS w
      FROM lineitem GROUP BY 1, 2
    ), c AS (
      SELECT l_returnflag, qty,
             SUM(w) OVER (PARTITION BY l_returnflag ORDER BY qty) AS cum,
             SUM(w) OVER (PARTITION BY l_returnflag) AS tot
      FROM w
    )
    SELECT l_returnflag, MIN(qty) AS weighted_median_qty
    FROM c WHERE cum * 2 >= tot
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc="Per-group WEIGHTED median (l_quantity weighted by extendedprice "
    "through the fixed-point bridge): the robust-stats verb price_quantiles "
    "and winsorize don't cover — each row votes with its weight. The value "
    "domain is BOUNDED (1..50), so the first shuffle collapses the fact "
    "table to |flags|x50 rows and the cumulative windows are metadata-scale "
    "— the scale-safe shape for weighted quantiles over discrete domains "
    "(continuous domains use the range-partition rank machinery instead, "
    "see equidepth_histogram).",
)
def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    w = li.groupBy(
        "l_returnflag", F.col("l_quantity").cast("long").alias("qty")
    ).agg(F.sum(F.floor(F.col("l_extendedprice") * 10000).cast("long")).alias("w"))
    win = Window.partitionBy("l_returnflag").orderBy("qty")
    tot = Window.partitionBy("l_returnflag")
    c = w.withColumn("cum", F.sum("w").over(win)).withColumn(
        "tot", F.sum("w").over(tot)
    )
    return (
        c.where(F.col("cum") * 2 >= F.col("tot"))
        .groupBy("l_returnflag")
        .agg(F.min("qty").alias("weighted_median_qty"))
        .orderBy("l_returnflag")
    )


@register(
    "proportion_ztest",
    """
    WITH g AS (
      SELECT
        SUM(CASE WHEN o_orderpriority < '3' THEN 1 ELSE 0 END) AS n1,
        SUM(CASE WHEN o_orderpriority < '3' AND o_orderstatus = 'F' THEN 1 ELSE 0 END) AS x1,
        SUM(CASE WHEN o_orderpriority >= '3' THEN 1 ELSE 0 END) AS n2,
        SUM(CASE WHEN o_orderpriority >= '3' AND o_orderstatus = 'F' THEN 1 ELSE 0 END) AS x2
      FROM orders
    )
    SELECT CAST(n1 AS BIGINT) AS n1, CAST(x1 AS BIGINT) AS x1,
      CAST(n2 AS BIGINT) AS n2, CAST(x2 AS BIGINT) AS x2,
      CAST(FLOOR(CAST(x1 AS DOUBLE) / n1 * 1000000) AS BIGINT) AS p1_sc,
      CAST(FLOOR(CAST(x2 AS DOUBLE) / n2 * 1000000) AS BIGINT) AS p2_sc,
      CAST(FLOOR(
        (CAST(x1 AS DOUBLE) / n1 - CAST(x2 AS DOUBLE) / n2)
        / sqrt((CAST(x1 + x2 AS DOUBLE) / (n1 + n2)) * (1 - CAST(x1 + x2 AS DOUBLE) / (n1 + n2))
               * (1.0 / n1 + 1.0 / n2)) * 1000000) AS BIGINT) AS z_sc
    FROM g
    """,
    doc="Two-proportion pooled z-test (A/B-test verb, the inferential "
    "counterpart of length_drift_ks): completion rate of high- vs "
    "low-priority orders in ONE conditional-agg scan. Every double is "
    "derived from int64 counts through a fixed expression tree "
    "(divisions + one sqrt, all IEEE-correctly-rounded), so the z "
    "statistic itself is bit-identical across engines — floored to fp "
    "only for rendering. At 100 TB the statistic needs four counters: "
    "trivially map-side-combined, no shuffle beyond one row.",
)
def q_proportion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    hi = (F.col("o_orderpriority") < "3").cast("long")
    lo = (F.col("o_orderpriority") >= "3").cast("long")
    fl = (F.col("o_orderstatus") == "F").cast("long")
    g = o.agg(
        F.sum(hi).alias("n1"),
        F.sum(hi * fl).alias("x1"),
        F.sum(lo).alias("n2"),
        F.sum(lo * fl).alias("x2"),
    )
    p1 = F.col("x1").cast("double") / F.col("n1")
    p2 = F.col("x2").cast("double") / F.col("n2")
    pp = (F.col("x1") + F.col("x2")).cast("double") / (F.col("n1") + F.col("n2"))
    z = (p1 - p2) / F.sqrt(pp * (1 - pp) * (1.0 / F.col("n1") + 1.0 / F.col("n2")))
    return g.select(
        "n1", "x1", "n2", "x2",
        F.floor(p1 * 1000000).cast("long").alias("p1_sc"),
        F.floor(p2 * 1000000).cast("long").alias("p2_sc"),
        F.floor(z * 1000000).cast("long").alias("z_sc"),
    )


@register(
    "trending_decay",
    """
    WITH mx AS (SELECT CAST(FLOOR(epoch(MAX(ts))) AS BIGINT) AS ref FROM events),
    w AS (
      SELECT event_type,
        1.0 / CAST(1::BIGINT << CAST(LEAST((mx.ref - CAST(FLOOR(epoch(ts)) AS BIGINT)) // 86400, 40) AS INT) AS DOUBLE) AS wt,
        value
      FROM events, mx
    )
    SELECT event_type,
      SUM(CAST(FLOOR(wt * 10000) AS BIGINT)) / 10000.0 AS decayed_count,
      SUM(CAST(FLOOR(value * wt * 10000) AS BIGINT)) / 10000.0 AS decayed_value
    FROM w GROUP BY event_type ORDER BY event_type
    """,
    doc="Exponentially time-decayed counts/sums per event type (trending "
    "detection, half-life = 1 day): weight = 2^-age_days built by INTEGER "
    "SHIFT (1::BIGINT << k), so the weight double is exact in both engines "
    "— no pow()/exp() last-ulp roulette — then through the fixed-point "
    "bridge. The reference timestamp is a 1-row broadcast scalar "
    "(allowlisted shape); ages are nonnegative so floor-div == trunc-div. "
    "One scan, one groupBy: decayed aggregation at 100 TB costs exactly "
    "what plain aggregation costs.",
)
def q_trending_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    mx = ev.agg(F.unix_timestamp(F.max("ts")).cast("long").alias("ref"))
    j = ev.crossJoin(F.broadcast(mx)).withColumn(
        "__k",
        F.least(
            F.floor(
                (F.col("ref") - F.unix_timestamp(F.col("ts")).cast("long")) / 86400
            ),
            F.lit(40),
        ).cast("int"),
    )
    wt = F.lit(1.0) / F.expr("shiftleft(CAST(1 AS BIGINT), __k)").cast("double")
    j = j.withColumn("__wt", wt)
    return (
        j.groupBy("event_type")
        .agg(
            (F.sum(F.floor(F.col("__wt") * 10000).cast("long")) / 10000.0).alias(
                "decayed_count"
            ),
            (
                F.sum(F.floor(F.col("value") * F.col("__wt") * 10000).cast("long"))
                / 10000.0
            ).alias("decayed_value"),
        )
        .orderBy("event_type")
    )


@register(
    "tokenizer_fertility",
    r"""
    WITH d AS (
      SELECT lang, n_chars,
             len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+')) AS n_tok,
             len(regexp_extract_all(text, '\S+')) AS n_words
      FROM documents
    )
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           CAST(SUM(n_words) AS BIGINT) AS n_words,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars,
           CAST(FLOOR(CAST(SUM(n_chars) AS DOUBLE) / GREATEST(SUM(n_tok), 1) * 10000) AS BIGINT) AS chars_per_token_sc,
           CAST(FLOOR(CAST(SUM(n_tok) AS DOUBLE) / GREATEST(SUM(n_words), 1) * 10000) AS BIGINT) AS tokens_per_word_sc
    FROM d GROUP BY lang ORDER BY lang
    """,
    doc="Tokenizer fertility audit per language: chars-per-token and "
    "tokens-per-whitespace-word under an alpha/digit-run pre-tokenizer "
    "(the GPT-2-regex family's coarse shape, ASCII classes only so Java "
    "regex and RE2 agree; whole-corpus chars come from the n_chars "
    "column, sidestepping UTF-16-vs-codepoint length divergence). "
    "Fertility drives token-budget planning — a lang whose "
    "chars-per-token drops is over-segmented and over-billed. Pure "
    "expression scan + one groupBy.",
)
def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _tp(spark, sf_dir, "documents")
    toks = F.size(
        F.regexp_extract_all(F.col("text"), F.lit(r"[A-Za-z]+|[0-9]+"), 0)
    ).cast("long")
    words = F.size(F.regexp_extract_all(F.col("text"), F.lit(r"\S+"), 0)).cast("long")
    g = (
        d.select("lang", "n_chars", toks.alias("n_tok"), words.alias("n_w"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
            F.sum("n_w").alias("n_words"),
            F.sum("n_chars").alias("n_chars"),
        )
    )
    cpt = F.col("n_chars").cast("double") / F.greatest(F.col("n_tokens"), F.lit(1))
    tpw = F.col("n_tokens").cast("double") / F.greatest(F.col("n_words"), F.lit(1))
    return g.select(
        "lang", "n_docs", "n_tokens", "n_words", "n_chars",
        F.floor(cpt * 10000).cast("long").alias("chars_per_token_sc"),
        F.floor(tpw * 10000).cast("long").alias("tokens_per_word_sc"),
    ).orderBy("lang")


@register(
    "oov_rate",
    """
    WITH toks AS (
      SELECT source, lower(t) AS tok
      FROM documents, UNNEST(regexp_extract_all(text, '[A-Za-z]+')) AS u(t)
    ), vocab AS (
      SELECT tok FROM (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok) tt
      ORDER BY c DESC, tok LIMIT 20
    )
    SELECT source, COUNT(*) AS total_tokens,
           CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS oov_tokens,
           CAST(FLOOR(CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
                      / COUNT(*) * 1000000) AS BIGINT) AS oov_rate_sc
    FROM toks LEFT JOIN vocab v USING (tok)
    GROUP BY source ORDER BY source
    """,
    doc="Out-of-vocabulary rate per source against a corpus-derived top-N "
    "vocabulary (N=20 so the synthetic ~31-token corpus yields a "
    "non-trivial OOV tail): the coverage audit run before freezing a "
    "tokenizer — a source with a high OOV rate will fragment into bytes. "
    "Tokens are extracted as ASCII alpha runs from the RAW text and "
    "lowercased per-token (lowercasing whole unicode text first would "
    "risk case-folding divergence between engines). Scale: the vocab is "
    "bounded (top-N via TakeOrdered) and broadcast; the token explode is "
    "linear; one groupBy per side. The token scan is persisted — read "
    "once for vocab, once for the join.",
)
def q_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.util import attach_cached_deps

    d = _tp(spark, sf_dir, "documents")
    toks = d.select(
        "source",
        F.explode(
            F.transform(
                F.regexp_extract_all(F.col("text"), F.lit(r"[A-Za-z]+"), 0),
                lambda t: F.lower(t),
            )
        ).alias("tok"),
    ).persist()
    vocab = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("tok"))
        .limit(20)
        .select("tok")
    )
    out = (
        toks.join(F.broadcast(vocab.withColumn("__in_v", F.lit(1))), "tok", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("total_tokens"),
            F.sum(F.when(F.col("__in_v").isNull(), 1).otherwise(0)).alias(
                "oov_tokens"
            ),
        )
    )
    rate = F.col("oov_tokens").cast("double") / F.col("total_tokens")
    out = out.select(
        "source", "total_tokens", "oov_tokens",
        F.floor(rate * 1000000).cast("long").alias("oov_rate_sc"),
    ).orderBy("source")
    return attach_cached_deps(out, [toks])


@register(
    "skyline_pareto",
    """
    WITH m AS (SELECT p_size, MIN(p_retailprice) AS mp FROM part GROUP BY p_size),
    s AS (
      SELECT p_size, mp,
             MIN(mp) OVER (ORDER BY p_size DESC
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mgt
      FROM m
    )
    SELECT p.p_partkey, p.p_size,
           CAST(FLOOR(p.p_retailprice * 100) AS BIGINT) AS price_c
    FROM part p JOIN s ON p.p_size = s.p_size
    WHERE NOT (p.p_retailprice > s.mp
               OR (s.mgt IS NOT NULL AND s.mgt <= p.p_retailprice))
    ORDER BY p.p_partkey
    """,
    doc="Skyline (Pareto frontier) query: parts not dominated on "
    "(minimize retailprice, maximize size) — the classic multi-criteria "
    "OLAP operator (Borzsony/Kossmann/Stocker ICDE'01). Scale-safe "
    "staircase form instead of the naive O(n^2) NOT-EXISTS self-join: "
    "one groupBy collapses the table to <=50 (size, min-price) rows, a "
    "metadata-scale running-min window builds the dominance staircase, "
    "and a broadcast join back applies the two dominance tests (same "
    "size, strictly cheaper: mp < p; strictly larger size, no more "
    "expensive: mgt <= p). Any bounded-domain criterion pair reduces the "
    "same way; continuous domains would bucket first.",
)
def q_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    m = p.groupBy("p_size").agg(F.min("p_retailprice").alias("mp"))
    w = Window.orderBy(F.desc("p_size")).rowsBetween(Window.unboundedPreceding, -1)
    s = m.withColumn("mgt", F.min("mp").over(w))  # <=50 rows: metadata-scale
    dominated = (F.col("p_retailprice") > F.col("mp")) | (
        F.col("mgt").isNotNull() & (F.col("mgt") <= F.col("p_retailprice"))
    )
    return (
        p.join(F.broadcast(s), "p_size")
        .where(~dominated)
        .select(
            "p_partkey",
            "p_size",
            F.floor(F.col("p_retailprice") * 100).cast("long").alias("price_c"),
        )
        .orderBy("p_partkey")
    )


@register(
    "embedding_truncation_audit",
    """
    WITH r AS (
      SELECT label,
        CAST(FLOOR(sqrt(list_dot_product(embedding[1:32]::DOUBLE[], embedding[1:32]::DOUBLE[]))
                   / sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                   * 1000000) AS BIGINT) AS e_sc
      FROM embeddings
      WHERE len(embedding) = 64
        AND list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0
    )
    SELECT label, COUNT(*) AS n_vecs,
           CAST(FLOOR(CAST(SUM(e_sc) AS DOUBLE) / COUNT(*)) AS BIGINT) AS avg_energy_sc,
           MIN(e_sc) AS min_energy_sc
    FROM r GROUP BY label ORDER BY label
    """,
    doc="Matryoshka (MRL) truncation audit: per label, the energy "
    "concentrated in the first 32 of 64 dims — by the cosine identity "
    "cos(full, zero-padded-truncation) = |trunc|/|full|, this IS the "
    "retrieval similarity an index built on truncated vectors preserves. "
    "Low avg/min energy => truncation unsafe for that population. "
    "Sequential-fold dot on the slice (bit-identical to DuckDB "
    "list_dot_product over DOUBLE[]), per-row fp floor, exact int "
    "aggregation; zero-norm and wrong-width vectors excluded in BOTH "
    "engines (the jl_projection hygiene rule). One scan, one groupBy.",
)
def q_embedding_truncation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.similarity import dot

    emb = _t(spark, sf_dir, "embeddings")
    d64 = dot(F.col("embedding"), F.col("embedding"))
    tr = F.slice(F.col("embedding"), 1, 32)
    d32 = dot(tr, tr)
    e_sc = F.floor(F.sqrt(d32) / F.sqrt(d64) * 1000000).cast("long")
    r = (
        emb.where((F.size("embedding") == 64) & (d64 > 0))
        .select("label", e_sc.alias("e_sc"))
    )
    return (
        r.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.floor(F.sum("e_sc").cast("double") / F.count(F.lit(1)))
            .cast("long")
            .alias("avg_energy_sc"),
            F.min("e_sc").alias("min_energy_sc"),
        )
        .orderBy("label")
    )


@register(
    "entity_resolution",
    """
    WITH p AS (
      SELECT p_partkey, split_part(p_name, ' ', 1) AS adj,
             split_part(p_name, ' ', 2) AS noun,
             p_brand, p_size, p_retailprice
      FROM part
    ), s AS (
      SELECT a.p_partkey AS a_key, b.p_partkey AS b_key,
        CAST(CASE WHEN levenshtein(a.adj, b.adj) <= 3 THEN 2 ELSE 0 END
           + CASE WHEN ABS(a.p_size - b.p_size) <= 2 THEN 2 ELSE 0 END
           + CASE WHEN ABS(a.p_retailprice - b.p_retailprice) <= 5.0 THEN 3 ELSE 0 END
           AS BIGINT) AS score
      FROM p a JOIN p b
        ON a.noun = b.noun AND a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
    )
    SELECT a_key, b_key, score FROM s WHERE score >= 5 ORDER BY a_key, b_key
    """,
    doc="Record linkage / entity resolution (operators/linkage.py "
    "part_linkage_pairs): Fellegi-Sunter-style blocked comparison — "
    "equi-join block on (noun-token, brand), then a weighted "
    "field-agreement score (fuzzy levenshtein on the first token, "
    "numeric tolerances on size/price) and a match threshold. The "
    "blocking join is a plain shuffle equi-join (no cartesian); block "
    "cardinality controls candidates, hot blocks cap like hot shingles. "
    "Distinct from the dedup tiers: multi-FIELD agreement over typed "
    "records, not single-text similarity.",
)
def q_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.linkage import part_linkage_pairs

    return part_linkage_pairs(_t(spark, sf_dir, "part"))


def _pca_power_oracle(dim: int = 64, iters: int = 8) -> str:
    """Unrolled-CTE DuckDB twin of similarity.pca_power_iteration: the
    Gram accumulation (per-row floor(x_i*x_j*1e6), int64 sums), the
    floor(S/n) normalization, and every integer iteration step are
    replayed exactly. CTEs are MATERIALIZED — DuckDB inlines CTEs by
    default and an inlined it{t} chain re-evaluates exponentially."""
    ctes = [
        f"""dims AS MATERIALIZED (SELECT unnest(generate_series(0, {dim - 1})) AS i),
    pairs AS MATERIALIZED (SELECT a.i AS i, b.i AS j FROM dims a CROSS JOIN dims b),
    valid AS MATERIALIZED (SELECT embedding FROM embeddings WHERE len(embedding) = {dim}),
    nn AS MATERIALIZED (SELECT COUNT(*) AS n FROM valid),
    s_raw AS MATERIALIZED (
      SELECT p.i, p.j,
             SUM(CAST(FLOOR(CAST(e.embedding[p.i + 1] AS DOUBLE)
                            * CAST(e.embedding[p.j + 1] AS DOUBLE)
                            * 1000000) AS BIGINT)) AS s
      FROM valid e CROSS JOIN pairs p GROUP BY p.i, p.j),
    s AS MATERIALIZED (SELECT i, j, CAST(FLOOR(CAST(s AS DOUBLE) / nn.n) AS BIGINT) AS s
          FROM s_raw, nn),
    it0 AS MATERIALIZED (SELECT i AS dim, CAST(1000000 AS BIGINT) AS v FROM dims)"""
    ]
    for t in range(1, iters + 1):
        ctes.append(
            f"""u{t} AS MATERIALIZED (SELECT s.i AS dim, CAST(SUM(s.s * p.v) AS BIGINT) AS u
             FROM s JOIN it{t - 1} p ON s.j = p.dim GROUP BY s.i),
    m{t} AS MATERIALIZED (SELECT MAX(ABS(u)) AS m FROM u{t}),
    it{t} AS MATERIALIZED (SELECT dim, CAST(FLOOR(CAST(u AS DOUBLE) * 1000000.0 / m.m) AS BIGINT) AS v
              FROM u{t}, m{t} m)"""
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f""",
    piv AS (SELECT v AS pv FROM it{iters}
            WHERE ABS(v) = (SELECT MAX(ABS(v)) FROM it{iters})
            ORDER BY dim LIMIT 1)
    SELECT f.dim, CASE WHEN p.pv < 0 THEN -f.v ELSE f.v END AS loading_sc,
           (SELECT m FROM m{iters}) AS lambda_sc
    FROM it{iters} f, piv p ORDER BY f.dim"""
    )


@register(
    "pca_power_iteration",
    _pca_power_oracle(),
    doc="Dominant principal direction of the embedding corpus "
    "(similarity.pca_power_iteration): distributed int64 Gram matrix "
    "via ONE linear mapInPandas scan with d^2 map-side state (shuffle = "
    "partitions x 4096 rows, never rows x 4096), then 8 all-integer "
    "power-iteration steps over the metadata-scale matrix (driver-side, "
    "the Lloyd's/BPE sanctioned-collect pattern). Every step is int64 "
    "or a fixed double expression, so the unrolled-CTE DuckDB oracle "
    "reproduces the loadings bit-for-bit — an ITERATIVE numerical "
    "algorithm under the full value-hash gate. Top-PC use: embedding "
    "whitening, all-but-the-top postprocessing, drift monitoring.",
)
def q_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.similarity import pca_power_iteration

    return pca_power_iteration(_t(spark, sf_dir, "embeddings"))


def _bitext_margin_oracle(
    dim: int = 64,
    num_planes: int = 4,
    num_bands: int = 4,
    k: int = 4,
    label_a: int = 0,
    label_b: int = 1,
    min_cos_sc: int = 300_000,
    min_margin_sc: int = 1_050_000,
    bucket_cap: int | None = DEFAULT_BUCKET_CAP,
) -> str:
    """DuckDB twin of similarity.bitext_margin_pairs: replays the banded
    sign-LSH gate (inlined deterministic planes, per-bucket membership
    bounded by the cap rank — similarity.cap_band_buckets' twin), the
    fp cosine, the per-side top-k averages, and the ratio margin.
    MATERIALIZED: scored is referenced three times."""
    cos = _cosine_sql("a.embedding::DOUBLE[]", "b.embedding::DOUBLE[]")
    margin = "CAST(FLOOR(CAST(cos_sc AS DOUBLE) / denom * 1000000) AS BIGINT)"
    return f"""
    WITH planes(band, pidx, pv) AS MATERIALIZED (VALUES
        {_banded_planes_sql(dim, num_planes, num_bands)}),
    va AS MATERIALIZED (SELECT vec_id, embedding FROM embeddings
           WHERE label = {label_a} AND len(embedding) = {dim}),
    vb AS MATERIALIZED (SELECT vec_id, embedding FROM embeddings
           WHERE label = {label_b} AND len(embedding) = {dim}),
    ab0 AS MATERIALIZED (SELECT vec_id, band,
             CAST(SUM(CASE WHEN list_dot_product(embedding::DOUBLE[], pv) >= 0
                           THEN 1::BIGINT << pidx ELSE 0 END) AS BIGINT) AS bucket
           FROM va CROSS JOIN planes GROUP BY vec_id, embedding, band),
    ab AS MATERIALIZED (SELECT vec_id, band, bucket FROM (
             SELECT vec_id, band, bucket,
                    row_number() OVER (PARTITION BY band, bucket
                      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS bkrn
             FROM ab0) WHERE bkrn <= {bucket_cap}),
    bb0 AS MATERIALIZED (SELECT vec_id, band,
             CAST(SUM(CASE WHEN list_dot_product(embedding::DOUBLE[], pv) >= 0
                           THEN 1::BIGINT << pidx ELSE 0 END) AS BIGINT) AS bucket
           FROM vb CROSS JOIN planes GROUP BY vec_id, embedding, band),
    bb AS MATERIALIZED (SELECT vec_id, band, bucket FROM (
             SELECT vec_id, band, bucket,
                    row_number() OVER (PARTITION BY band, bucket
                      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS bkrn
             FROM bb0) WHERE bkrn <= {bucket_cap}),
    cand AS MATERIALIZED (SELECT DISTINCT ab.vec_id AS a_id, bb.vec_id AS b_id
             FROM ab JOIN bb ON ab.band = bb.band AND ab.bucket = bb.bucket),
    scored AS MATERIALIZED (
      SELECT c.a_id, c.b_id, CAST(FLOOR(({cos}) * 1000000) AS BIGINT) AS cos_sc
      FROM cand c JOIN va a ON a.vec_id = c.a_id JOIN vb b ON b.vec_id = c.b_id),
    ra AS MATERIALIZED (SELECT a_id, SUM(cos_sc) AS sa, COUNT(*) AS ka FROM (
             SELECT a_id, cos_sc,
                    row_number() OVER (PARTITION BY a_id ORDER BY cos_sc DESC, b_id) AS rk
             FROM scored) t WHERE rk <= {k} GROUP BY a_id),
    rb AS MATERIALIZED (SELECT b_id, SUM(cos_sc) AS sb, COUNT(*) AS kb FROM (
             SELECT b_id, cos_sc,
                    row_number() OVER (PARTITION BY b_id ORDER BY cos_sc DESC, a_id) AS rk
             FROM scored) t WHERE rk <= {k} GROUP BY b_id),
    m AS MATERIALIZED (SELECT s.a_id, s.b_id, s.cos_sc,
             (CAST(ra.sa AS DOUBLE) / ra.ka + CAST(rb.sb AS DOUBLE) / rb.kb) / 2.0 AS denom
          FROM scored s JOIN ra ON ra.a_id = s.a_id JOIN rb ON rb.b_id = s.b_id)
    SELECT a_id, b_id, cos_sc, {margin} AS margin_sc
    FROM m
    WHERE denom > 0 AND cos_sc >= {min_cos_sc} AND {margin} >= {min_margin_sc}
    ORDER BY a_id, b_id
    """


@register(
    "bitext_margin_pairs",
    _bitext_margin_oracle(),
    doc="Margin-scored bitext mining between two corpora "
    "(similarity.bitext_margin_pairs; labels stand in for languages): "
    "the CCMatrix/LASER ratio-margin criterion margin = cos(x,y) / "
    "((avgk(x)+avgk(y))/2), which suppresses embedding-space hubs that "
    "raw cosine retrieval mis-mates (Artetxe & Schwenk). Candidates "
    "gated by shared sign-LSH band buckets (both sides banded with the "
    "same global planes), exact fp cosine on candidates, per-side top-k "
    "averages as bounded window frames. Corpus growth tunes bands, not "
    "planes — the with_lsh_bands scaling law. Margins are fixed "
    "expression trees over exact ints, so the replayed oracle "
    "hash-checks banding, cosine, top-k AND margin end to end.",
)
def q_bitext_margin_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.similarity import bitext_margin_pairs

    return bitext_margin_pairs(_t(spark, sf_dir, "embeddings"))

