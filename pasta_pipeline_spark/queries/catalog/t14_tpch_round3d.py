"""Catalog tier: TPC-H round 3 + extension surface, part D.

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
from pasta_pipeline_spark.queries.catalog.t04_similarity_ann import _cosine_sql
from pasta_pipeline_spark.queries.catalog.t13_tpch_round3c import _domain_authority_oracle

@register(
    "domain_authority",
    _domain_authority_oracle(),
    doc="Crawl-side authority capstone: anchor hrefs (extract_anchors "
    "recipe) become a host co-link edge set — distinct pairs CLOSED "
    "with their reverse edges (the bipartite_edges construction: the "
    "raw referrer->target set is all-sources-to-all-sinks, where "
    "directed rank mass dies after one round) — ranked by 3 rounds "
    "of fixed-point PageRank (operators/graph.py) and joined back to "
    "host names, the signal crawl prioritization and source "
    "weighting consume. The oracle chains the iterations as CTEs "
    "like pagerank_parts; host derivation shares the regex with the "
    "SQL twin.",
)
def q_domain_authority(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.functions.urls import extract_anchors
    from pasta_pipeline_spark.operators.graph import pagerank_fixed

    docs = _tp(spark, sf_dir, "documents")
    h = F.concat(
        F.lit('<a href="https://t'), (F.col("doc_id") % 5).cast("string"),
        F.lit(".example/p"), (F.col("doc_id") % 11).cast("string"),
        F.lit('">x</a>'),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit('<a href="https://hub.example/h'),
                (F.col("doc_id") % 4).cast("string"), F.lit('">y</a>'),
            ),
        ).otherwise(F.lit("")),
    )
    hrefs = (
        docs.where(F.col("text").isNotNull())
        .select("doc_id", F.explode(extract_anchors(h)).alias("a"))
        .select("doc_id", F.col("a.href").alias("href"))
    )
    dst = F.regexp_extract("href", r"^https://([^/]+)", 1)
    pairs = (
        hrefs.select(
            F.concat(
                F.lit("s"), (F.col("doc_id") % 6).cast("string"), F.lit(".example")
            ).alias("src_host"),
            dst.alias("dst_host"),
        )
        .where(F.col("dst_host") != "")
        .distinct()
    )

    def hid(c):
        return F.conv(F.substring(F.md5(F.col(c)), 1, 15), 16, 10).cast("long")

    fwd = pairs.select(hid("src_host").alias("src"), hid("dst_host").alias("dst"))
    rev = pairs.select(hid("dst_host").alias("src"), hid("src_host").alias("dst"))
    edges = fwd.unionByName(rev)
    ranks = pagerank_fixed(edges, iterations=3)
    names = pairs.select(
        F.col("dst_host").alias("host"), hid("dst_host").alias("id")
    ).distinct()
    return ranks.join(names, "id").select("host", "rank_fp")


@register(
    "sitemap_refresh",
    """
    WITH disc AS (
      SELECT 'h' || (doc_id % 7) AS host,
             'https://h' || (doc_id % 7) || '.ex/p' || doc_id AS url,
             CASE WHEN doc_id % 5 = 4 THEN NULL
                  WHEN doc_id % 2 = 0 THEN '2026-02-15'
                  ELSE '2026-01-05T06:07:08Z' END AS lastmod
      FROM documents
    ), d AS (
      SELECT host, url,
             CASE WHEN length(lastmod) >= 10 THEN
               COALESCE(
                 CAST(epoch(TRY_CAST(substr(lastmod, 1, 19) AS TIMESTAMP)) AS BIGINT),
                 CAST(epoch(TRY_CAST(substr(lastmod, 1, 10) AS TIMESTAMP)) AS BIGINT))
             END AS lastmod_s
      FROM disc
    ), log AS (
      SELECT 'https://h' || (doc_id % 7) || '.ex/p' || doc_id AS url,
             CAST(1768867200 AS BIGINT) AS fetched_at_s
      FROM documents WHERE doc_id % 3 <> 1
    ), j AS (
      SELECT d.host, d.url, d.lastmod_s, l.fetched_at_s,
             CASE WHEN l.fetched_at_s IS NULL THEN 'new'
                  WHEN d.lastmod_s IS NOT NULL AND d.lastmod_s > l.fetched_at_s
                  THEN 'stale' END AS reason
      FROM d LEFT JOIN log l USING (url)
    )
    SELECT host, url, lastmod_s, fetched_at_s, reason FROM j
    WHERE reason IS NOT NULL
    """,
    doc="Sitemap-freshness re-crawl selection (operators/sitemaps.py "
    "refresh_selection) — the crawl-side instance of the reference's "
    "incremental time-bounded scan (S2): discovered URLs refetch "
    "when NEW (no fetch record) or STALE (lastmod newer than the "
    "recorded fetch). Synthesized lastmods cover full ISO "
    "timestamps, date-only entries (midnight UTC), and NULLs; the "
    "fetch log (2026-01-20) splits Jan lastmods (fresh, excluded) "
    "from Feb (stale). try_-parsing both engines; one URL-keyed "
    "left join.",
)
def q_sitemap_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.sitemaps import refresh_selection

    docs = _t(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://h"), (F.col("doc_id") % 7).cast("string"),
        F.lit(".ex/p"), F.col("doc_id").cast("string"),
    )
    disc = docs.select(
        F.concat(F.lit("h"), (F.col("doc_id") % 7).cast("string")).alias("host"),
        url.alias("loc"),
        F.when(F.col("doc_id") % 5 == 4, F.lit(None).cast("string"))
        .when(F.col("doc_id") % 2 == 0, F.lit("2026-02-15"))
        .otherwise(F.lit("2026-01-05T06:07:08Z"))
        .alias("lastmod"),
    )
    log = docs.where(F.col("doc_id") % 3 != 1).select(
        url.alias("url"), F.lit(1768867200).cast("long").alias("fetched_at_s")
    )
    return refresh_selection(disc, log)


@register(
    "source_concentration",
    """
    WITH groups AS (
      SELECT source AS g, CAST(COUNT(*) AS BIGINT) AS w
      FROM documents GROUP BY 1
    ), ranked AS (
      SELECT g, w,
             CAST(ROW_NUMBER() OVER (ORDER BY w ASC, g ASC) AS BIGINT) AS i
      FROM groups WHERE w > 0
    ), t AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
             CAST(SUM(w) AS BIGINT) AS total_w,
             CAST(SUM(w * CAST(FLOOR(ln(CAST(w AS DOUBLE)) * 1000000000) AS BIGINT))
               AS BIGINT) AS swl,
             CAST(SUM(i * w) AS BIGINT) AS siw
      FROM ranked
    ), h AS (
      SELECT CAST(SUM(((w * 10000) // t.total_w) * ((w * 10000) // t.total_w))
               AS BIGINT) AS hhi_bp2
      FROM ranked, t
    )
    SELECT t.n_groups, t.total_w, h.hhi_bp2,
           CAST(CAST(FLOOR(ln(CAST(t.total_w AS DOUBLE)) * 1000000000) AS BIGINT)
                - (t.swl // t.total_w) AS BIGINT) AS entropy_fp,
           CAST(CASE WHEN t.n_groups > 1
                THEN ((2 * t.siw - (t.n_groups + 1) * t.total_w) * 10000)
                     // (t.n_groups * t.total_w)
                ELSE 0 END AS BIGINT) AS gini_bp
    FROM t, h
    """,
    doc="Corpus concentration audit (operators/stats.py "
    "source_concentration): one row of diversity measures over the "
    "source distribution — Herfindahl index (sum of squared "
    "basis-point shares), Shannon entropy in fixed-point nats "
    "(ln(W) - SUM(w*lnfp(w))/W, the unigram_nll playbook), and Gini "
    "via the sorted-cumulative formula with deterministic tiebreaks "
    "— the 'is this corpus secretly one site?' gate before a mix "
    "trains. The rank window runs over the SOURCE table "
    "(metadata-scale); all-equal and monopoly extremes are "
    "pytest-pinned against hand math.",
)
def q_source_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.stats import source_concentration

    return source_concentration(_t(spark, sf_dir, "documents"))


@register(
    "calibration_report",
    """
    WITH scored AS (
      SELECT (doc_id * 37) % 10000 AS s,
             CASE WHEN (doc_id * 91) % 10000 <
                       least((doc_id * 37) % 10000 + 2000, 10000)
                  THEN 1 ELSE 0 END AS y
      FROM documents
    ), b AS (
      SELECT least((s * 10) // 10000, 9) AS bin, s, y FROM scored
    ), agg AS (
      SELECT bin,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(s) // COUNT(*) AS BIGINT) AS mean_score_bp,
             CAST((SUM(y) * 10000) // COUNT(*) AS BIGINT) AS pos_rate_bp
      FROM b GROUP BY 1
    )
    SELECT CAST(bin AS BIGINT) AS bin, n, mean_score_bp, pos_rate_bp,
           CAST(abs(mean_score_bp - pos_rate_bp) AS BIGINT) AS gap_bp
    FROM agg
    """,
    doc="Classifier-calibration audit (operators/quality_checks.py "
    "calibration_report): reliability-diagram bins for a basis-point "
    "score vs binary labels — mean score, observed positive rate, "
    "and their gap per equal-width bin, the n-weighted average being "
    "ECE (calibration_ece). The synthetic labels are deliberately "
    "MIScalibrated (+2000bp overconfidence, clamped) so the gap "
    "column carries signal. All integer arithmetic; one scan, one "
    "groupBy; hash-exact. A near-calibrated synthetic's small ECE is "
    "pytest-pinned.",
)
def q_calibration_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.quality_checks import calibration_report

    docs = _t(spark, sf_dir, "documents")
    scored = docs.select(
        ((F.col("doc_id") * 37) % 10000).alias("score_bp"),
        F.when(
            (F.col("doc_id") * 91) % 10000
            < F.least((F.col("doc_id") * 37) % 10000 + 2000, F.lit(10000)),
            F.lit(1),
        ).otherwise(F.lit(0)).alias("label"),
    )
    return calibration_report(scored, "score_bp", "label")


@register(
    "classifier_auc",
    """
    WITH scored AS (
      SELECT (doc_id * 37) % 10000 AS s,
             CASE WHEN (doc_id * 91) % 10000 <
                       least((doc_id * 37) % 10000 + 2000, 10000)
                  THEN 1 ELSE 0 END AS y
      FROM documents
    ), per_score AS (
      SELECT s, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS n_pos
      FROM scored GROUP BY 1
    ), ranked AS (
      SELECT n, n_pos,
             CAST(2 * SUM(n) OVER (ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n + 1
               AS BIGINT) AS avg2
      FROM per_score
    )
    SELECT CAST(SUM(n_pos) AS BIGINT) AS n_pos,
           CAST(SUM(n) - SUM(n_pos) AS BIGINT) AS n_neg,
           CAST(CASE WHEN SUM(n_pos) > 0 AND SUM(n) - SUM(n_pos) > 0 THEN
             ((SUM(n_pos * avg2) - SUM(n_pos) * (SUM(n_pos) + 1)) * 10000)
             // (2 * SUM(n_pos) * (SUM(n) - SUM(n_pos))) END AS BIGINT) AS auc_bp
    FROM ranked
    """,
    doc="Exact ROC AUC via the Mann-Whitney rank-sum identity with "
    "tie-averaged ranks (quality_checks.auc_report) — discrimination "
    "as the complement of the calibration audit, over the same "
    "synthetic score/label recipe. Doubled average ranks keep "
    "everything int64; the window runs over DISTINCT scores (the "
    "score's resolution, not corpus rows). Perfect / reversed / "
    "all-tied / single-class extremes are pytest-pinned at 10000 / 0 "
    "/ 5000 / NULL.",
)
def q_classifier_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.quality_checks import auc_report

    docs = _t(spark, sf_dir, "documents")
    scored = docs.select(
        ((F.col("doc_id") * 37) % 10000).alias("score_bp"),
        F.when(
            (F.col("doc_id") * 91) % 10000
            < F.least((F.col("doc_id") * 37) % 10000 + 2000, F.lit(10000)),
            F.lit(1),
        ).otherwise(F.lit(0)).alias("label"),
    )
    return auc_report(scored, "score_bp", "label")


@register(
    "lexical_diversity",
    """
    WITH base AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS tk
      FROM documents WHERE text IS NOT NULL
    ), m AS (
      SELECT doc_id, tk, len(tk) AS n,
             CASE WHEN len(tk) > 0
                  THEN (len(list_distinct(tk)) * 10000) // len(tk) END AS ttr_bp
      FROM base
    )
    SELECT doc_id, CAST(n AS BIGINT) AS n_tokens, CAST(ttr_bp AS BIGINT) AS ttr_bp,
           CAST(CASE WHEN n >= 25 THEN FLOOR(
               list_sum(list_transform(generate_series(1, n - 24),
                 s -> FLOOR(len(list_distinct(list_slice(tk, s, s + 24))) * 10000 / 25)))
               / (n - 24))
             ELSE ttr_bp END AS BIGINT) AS mattr_bp
    FROM m
    """,
    doc="Lexical diversity (text_analysis.lexical_diversity): raw "
    "type-token ratio plus MATTR (Covington-McFall moving-average "
    "TTR over 25-token windows — the length-bias-free form), both in "
    "basis points. Window TTRs are exact (slice + array_distinct, "
    "expression-only, no explode-shuffle); per-window floors sum "
    "exactly in doubles and the mean floors once — hash-exact. "
    "Short documents fall back to whole-document TTR. The "
    "keyword-stuffing/template signal repetition counts miss.",
)
def q_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.text_analysis import lexical_diversity

    return lexical_diversity(_tp(spark, sf_dir, "documents"), window=25)


@register(
    "corpus_datacard",
    """
    WITH base AS (
      SELECT doc_id, text, source, lang FROM documents WHERE text IS NOT NULL
    ), vol AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
             CAST(SUM(length(text)) AS BIGINT) AS total_chars,
             CAST(SUM(length(text)) // COUNT(*) AS BIGINT) AS mean_chars,
             CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
      FROM base
    ), tops AS (
      SELECT CAST((MAX(n) * 10000) // SUM(n) AS BIGINT) AS top_source_bp
      FROM (SELECT COUNT(*) AS n FROM base GROUP BY source)
    ), dup AS (
      SELECT CAST(SUM(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT) AS dup_docs,
             CAST(SUM(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_texts
      FROM (SELECT COUNT(*) AS n FROM base GROUP BY md5(text))
    ), groups AS (
      SELECT source AS g, CAST(COUNT(*) AS BIGINT) AS w FROM base GROUP BY 1
    ), ranked AS (
      SELECT g, w, CAST(ROW_NUMBER() OVER (ORDER BY w ASC, g ASC) AS BIGINT) AS i
      FROM groups WHERE w > 0
    ), t AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
             CAST(SUM(w) AS BIGINT) AS total_w,
             CAST(SUM(w * CAST(FLOOR(ln(CAST(w AS DOUBLE)) * 1000000000) AS BIGINT))
               AS BIGINT) AS swl,
             CAST(SUM(i * w) AS BIGINT) AS siw
      FROM ranked
    ), conc AS (
      SELECT (SELECT CAST(SUM(((w * 10000) // t.total_w) * ((w * 10000) // t.total_w))
                       AS BIGINT) FROM ranked, t) AS hhi_bp2,
             CAST(CAST(FLOOR(ln(CAST(t.total_w AS DOUBLE)) * 1000000000) AS BIGINT)
                  - (t.swl // t.total_w) AS BIGINT) AS entropy_fp,
             CAST(CASE WHEN t.n_groups > 1
                  THEN ((2 * t.siw - (t.n_groups + 1) * t.total_w) * 10000)
                       // (t.n_groups * t.total_w) ELSE 0 END AS BIGINT) AS gini_bp
      FROM t
    )
    SELECT u.metric, u.value FROM vol, tops, dup, conc,
    LATERAL (VALUES
      ('n_docs', n_docs), ('n_sources', n_sources),
      ('total_chars', total_chars), ('mean_chars', mean_chars),
      ('n_langs', n_langs), ('top_source_bp', top_source_bp),
      ('dup_docs', dup_docs), ('dup_texts', dup_texts),
      ('hhi_bp2', hhi_bp2), ('entropy_fp', entropy_fp),
      ('gini_bp', gini_bp)) AS u(metric, value)
    """,
    doc="The corpus data card (operators/stats.py corpus_datacard): "
    "one skinny (metric, value) frame of corpus-level facts — "
    "volume (docs/sources/chars/mean length), diversity (languages, "
    "top-source share, HHI/entropy/Gini concentration), exact "
    "duplication mass — every value int64 so the whole card "
    "hash-replays; metric is a stable key, so cards from two corpus "
    "versions diff like any keyed table. One corpus scan + the "
    "metadata-scale concentration window.",
)
def q_corpus_datacard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.stats import corpus_datacard

    return corpus_datacard(_t(spark, sf_dir, "documents"))


def _datacard_cte(src_pred: str, prefix: str) -> str:
    """One full data-card computation as chained CTEs over documents
    filtered by ``src_pred`` — instantiated twice by the diff oracle
    (names prefixed to avoid collisions)."""
    P = prefix
    return f"""
    {P}base AS (
      SELECT doc_id, text, source, lang FROM documents
      WHERE text IS NOT NULL AND ({src_pred})
    ), {P}vol AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
             CAST(SUM(length(text)) AS BIGINT) AS total_chars,
             CAST(SUM(length(text)) // COUNT(*) AS BIGINT) AS mean_chars,
             CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
      FROM {P}base
    ), {P}tops AS (
      SELECT CAST((MAX(n) * 10000) // SUM(n) AS BIGINT) AS top_source_bp
      FROM (SELECT COUNT(*) AS n FROM {P}base GROUP BY source)
    ), {P}dup AS (
      SELECT CAST(SUM(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT) AS dup_docs,
             CAST(SUM(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_texts
      FROM (SELECT COUNT(*) AS n FROM {P}base GROUP BY md5(text))
    ), {P}groups AS (
      SELECT source AS g, CAST(COUNT(*) AS BIGINT) AS w FROM {P}base GROUP BY 1
    ), {P}ranked AS (
      SELECT g, w, CAST(ROW_NUMBER() OVER (ORDER BY w ASC, g ASC) AS BIGINT) AS i
      FROM {P}groups WHERE w > 0
    ), {P}t AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
             CAST(SUM(w) AS BIGINT) AS total_w,
             CAST(SUM(w * CAST(FLOOR(ln(CAST(w AS DOUBLE)) * 1000000000) AS BIGINT))
               AS BIGINT) AS swl,
             CAST(SUM(i * w) AS BIGINT) AS siw
      FROM {P}ranked
    ), {P}conc AS (
      SELECT (SELECT CAST(SUM(((w * 10000) // {P}t.total_w) * ((w * 10000) // {P}t.total_w))
                       AS BIGINT) FROM {P}ranked, {P}t) AS hhi_bp2,
             CAST(CAST(FLOOR(ln(CAST({P}t.total_w AS DOUBLE)) * 1000000000) AS BIGINT)
                  - ({P}t.swl // {P}t.total_w) AS BIGINT) AS entropy_fp,
             CAST(CASE WHEN {P}t.n_groups > 1
                  THEN ((2 * {P}t.siw - ({P}t.n_groups + 1) * {P}t.total_w) * 10000)
                       // ({P}t.n_groups * {P}t.total_w) ELSE 0 END AS BIGINT) AS gini_bp
      FROM {P}t
    ), {P}card AS (
      SELECT u.metric, u.value FROM {P}vol, {P}tops, {P}dup, {P}conc,
      LATERAL (VALUES
        ('n_docs', n_docs), ('n_sources', n_sources),
        ('total_chars', total_chars), ('mean_chars', mean_chars),
        ('n_langs', n_langs), ('top_source_bp', top_source_bp),
        ('dup_docs', dup_docs), ('dup_texts', dup_texts),
        ('hhi_bp2', hhi_bp2), ('entropy_fp', entropy_fp),
        ('gini_bp', gini_bp)) AS u(metric, value)
    )"""


@register(
    "datacard_diff",
    f"""
    WITH {_datacard_cte("TRUE", "a_")},
    mean_len AS (
      SELECT SUM(length(text)) // COUNT(*) AS m FROM documents WHERE text IS NOT NULL
    ),
    {_datacard_cte("length(text) >= (SELECT m FROM mean_len)", "b_")}
    SELECT a.metric,
           a.value AS before_value,
           b.value AS after_value,
           CAST(b.value - a.value AS BIGINT) AS delta
    FROM a_card a JOIN b_card b USING (metric)
    """,
    doc="Data-card DIFF — what a curation pass changed, metric by "
    "metric: the card before vs after a keep-long-documents filter "
    "(threshold = mean length, sf-stable) joined on the metric key "
    "with integer deltas. This is the review artifact a filtering "
    "PR ships; the oracle instantiates the full card computation "
    "twice via a shared CTE generator so the two sides cannot "
    "drift. All int64, full-hash.",
)
def q_datacard_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.stats import corpus_datacard

    docs = _t(spark, sf_dir, "documents")
    base = docs.where(F.col("text").isNotNull())
    mean_len = base.agg(
        F.expr("sum(length(text)) div count(1)").alias("m")
    )
    filtered = base.crossJoin(F.broadcast(mean_len)).where(
        F.length("text") >= F.col("m")
    ).drop("m")
    before = corpus_datacard(base)
    after = corpus_datacard(filtered)
    return (
        before.withColumnRenamed("value", "before_value")
        .join(after.withColumnRenamed("value", "after_value"), "metric")
        .select(
            "metric",
            "before_value",
            "after_value",
            (F.col("after_value") - F.col("before_value")).cast("long").alias("delta"),
        )
    )


@register(
    "score_rank_normalize",
    """
    WITH scored AS (
      SELECT doc_id, source, CAST(n_chars AS BIGINT) AS score
      FROM documents WHERE n_chars IS NOT NULL
    ), per AS (
      SELECT doc_id, source, score,
             CAST(RANK() OVER (PARTITION BY source ORDER BY score ASC) AS BIGINT) AS rk,
             CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n
      FROM scored
    )
    SELECT doc_id, source, score,
           CAST(CASE WHEN n > 1 THEN ((rk - 1) * 10000) // (n - 1)
                ELSE 0 END AS BIGINT) AS rank_bp
    FROM per
    """,
    doc="Per-source percentile-rank score normalization "
    "(operators/normalize.py rank_normalize): the integer twin of "
    "percent_rank() — (rank-1)*10000 div (n-1) with RANK tie "
    "semantics per source — so 'keep the top 30%' means the same "
    "thing on every site instead of silently reweighting sources "
    "through one global threshold. One window per group; NULL "
    "scores pass through NULL (window NULL-ordering pitfall "
    "pytest-pinned).",
)
def q_score_rank_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.normalize import rank_normalize

    docs = _t(spark, sf_dir, "documents").where(F.col("n_chars").isNotNull())
    return rank_normalize(
        docs.select("doc_id", "source", F.col("n_chars").cast("long").alias("score")),
        "score",
        "source",
    )


@register(
    "brier_score",
    """
    WITH scored AS (
      SELECT (doc_id * 37) % 10000 AS s,
             CASE WHEN (doc_id * 91) % 10000 <
                       least((doc_id * 37) % 10000 + 2000, 10000)
                  THEN 1 ELSE 0 END AS y
      FROM documents
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM((s - 10000 * y) * (s - 10000 * y)) // COUNT(*) AS BIGINT)
             AS brier_e8
    FROM scored
    """,
    doc="Brier score (quality_checks.brier_score) — the proper "
    "scoring rule completing the filter-audit triple over the same "
    "synthetic score/label recipe as calibration_report and "
    "classifier_auc: mean squared basis-point error scaled by 1e8, "
    "pure int64 in one aggregate. Perfect / coin-flip / inverted "
    "extremes pytest-pinned at 0 / 2.5e7 / 1e8.",
)
def q_brier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.quality_checks import brier_score

    docs = _t(spark, sf_dir, "documents")
    scored = docs.select(
        ((F.col("doc_id") * 37) % 10000).alias("score_bp"),
        F.when(
            (F.col("doc_id") * 91) % 10000
            < F.least((F.col("doc_id") * 37) % 10000 + 2000, F.lit(10000)),
            F.lit(1),
        ).otherwise(F.lit(0)).alias("label"),
    )
    return brier_score(scored, "score_bp", "label")


@register(
    "media_gif_pixels",
    """
    WITH ids AS (
      SELECT doc_id AS media_id,
             4 + doc_id % 10 AS w,
             4 + (doc_id // 3) % 8 AS h
      FROM documents
    ), xs AS (
      SELECT media_id, w, h, unnest(generate_series(0, w - 1)) AS x FROM ids
    ), ys AS (
      SELECT media_id, w, h, x, unnest(generate_series(0, h - 1)) AS y FROM xs
    ), px AS (
      SELECT media_id, (media_id + x * 3 + y * 5) % 4 AS i FROM ys
    ), mapped AS (
      SELECT media_id,
             (media_id * 5 + i * 7) % 256 AS r,
             (media_id * 11 + i * 13) % 256 AS g,
             (media_id * 17 + i * 19) % 256 AS b
      FROM px
    )
    SELECT m.media_id,
           CAST(i.w AS INTEGER) AS width,
           CAST(i.h AS INTEGER) AS height,
           CAST(i.w * i.h AS BIGINT) AS n_pixels,
           CAST(SUM(r + g + b) AS BIGINT) AS pixel_sum,
           CAST(SUM(299 * r + 587 * g + 114 * b) AS BIGINT) AS luma_sum
    FROM mapped m JOIN ids i USING (media_id)
    GROUP BY 1, 2, 3, 4
    """,
    doc="FULL GIF pixel decode (multimodal.decode_gif_pixels): "
    "complete valid GIF89a fixtures whose LZW code streams are "
    "produced by a REAL spec-conformant encoder (variable-width "
    "3..12-bit codes, clear/EOI, KwKwK round-trip stress-tested), "
    "decoded end-to-end — de-sub-block, LZW dictionary decode, "
    "palette map — to the same integer pixel/Rec.601-luma contract "
    "as the PNG path. The oracle computes the sums from the "
    "closed-form palette+index recipe without touching a byte; with "
    "PNG/DEFLATE this makes TWO compressed pixel formats genuinely "
    "decoded, one with the entropy coder written out in full.",
)
def q_media_gif_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.multimodal import (
        decode_image_pixels,
        synthesize_media,
    )

    docs = _tp(spark, sf_dir, "documents")
    media = synthesize_media(
        docs.select(F.col("doc_id").alias("media_id")), variant="gif_full"
    )
    return decode_image_pixels(media)


@register(
    "schedule_compliance",
    """
    WITH log AS (
      SELECT 'h' || CAST(user_id % 7 AS VARCHAR) AS host,
             CAST(epoch_us(ts) // 1000000 AS BIGINT) AS fetched_at_s
      FROM events
    ), g AS (
      SELECT host,
             fetched_at_s - lag(fetched_at_s)
               OVER (PARTITION BY host ORDER BY fetched_at_s) AS gap
      FROM log
    )
    SELECT host,
           CAST(count(*) AS BIGINT) AS n_fetches,
           CAST(count(gap) AS BIGINT) AS n_gaps,
           CAST(min(gap) AS BIGINT) AS min_gap_s,
           CAST(SUM(CASE WHEN gap IS NOT NULL AND gap < 60 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_violations,
           CAST(MAX(CASE WHEN gap IS NOT NULL AND gap < 60 THEN 60 - gap END)
             AS BIGINT) AS worst_deficit_s
    FROM g GROUP BY host
    """,
    doc="Politeness compliance audit (operators/politeness.py "
    "schedule_compliance): consecutive-fetch gaps per host (events "
    "grouped into 7 hosts, epoch-second timestamps) checked against "
    "a 60s required delay — violation counts and the worst deficit. "
    "Gap values are diffs of the per-host SORTED timestamp multiset, "
    "so ties cannot make them nondeterministic. The monitoring "
    "counterpart of politeness_schedule: the schedule plans "
    "politeness, this proves the fleet obeyed it.",
)
def q_schedule_compliance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.politeness import schedule_compliance

    ev = _t(spark, sf_dir, "events")
    log = ev.select(
        F.concat(F.lit("h"), (F.col("user_id") % 7).cast("string")).alias("host"),
        F.expr("unix_micros(ts) div 1000000").cast("long").alias("fetched_at_s"),
    )
    return schedule_compliance(log, required_delay_s=60)


@register(
    "robots_sitemaps",
    """
    WITH robots AS (
      SELECT 'h' || (doc_id % 9) AS host,
             'User-agent: *' || chr(10) ||
             'Disallow: /x' || chr(10) ||
             'Sitemap: https://h' || (doc_id % 9) || '.ex/sitemap'
               || (doc_id % 4) || '.xml' || chr(10) ||
             CASE WHEN doc_id % 2 = 0
                  THEN 'sitemap: https://h' || (doc_id % 9) || '.ex/news.xml # note'
                  ELSE '' END AS robots_txt
      FROM documents
    ), lines AS (
      SELECT host, trim(regexp_replace(unnest(string_split(robots_txt, chr(10))),
                                       '#.*$', '')) AS l
      FROM robots
    )
    SELECT DISTINCT host,
           trim(regexp_extract(l, '^[Ss][Ii][Tt][Ee][Mm][Aa][Pp]\\s*:(.*)$', 1))
             AS sitemap_url
    FROM lines
    WHERE trim(regexp_extract(l, '^[Ss][Ii][Tt][Ee][Mm][Aa][Pp]\\s*:(.*)$', 1)) <> ''
    """,
    doc="Sitemap-directive extraction (robots.parse_sitemap_directives): "
    "robots.txt advertises its sitemaps globally (sitemaps.org "
    "protocol — the directive is NOT user-agent-scoped), so a flat "
    "case-insensitive line parse with comment stripping and "
    "duplicate collapse yields the (host, sitemap_url) discovery "
    "table that seeds build_frontier. Synthesized robots bodies "
    "cover mixed case, comments, and multi-directive hosts.",
)
def q_robots_sitemaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.robots import parse_sitemap_directives

    docs = _t(spark, sf_dir, "documents")
    nl = F.lit("\n")
    robots = docs.select(
        F.concat(F.lit("h"), (F.col("doc_id") % 9).cast("string")).alias("host"),
        F.concat(
            F.lit("User-agent: *"), nl,
            F.lit("Disallow: /x"), nl,
            F.lit("Sitemap: https://h"), (F.col("doc_id") % 9).cast("string"),
            F.lit(".ex/sitemap"), (F.col("doc_id") % 4).cast("string"),
            F.lit(".xml"), nl,
            F.when(
                F.col("doc_id") % 2 == 0,
                F.concat(
                    F.lit("sitemap: https://h"), (F.col("doc_id") % 9).cast("string"),
                    F.lit(".ex/news.xml # note"),
                ),
            ).otherwise(F.lit("")),
        ).alias("robots_txt"),
    )
    return parse_sitemap_directives(robots)


@register(
    "winsorized_prices",
    """
    WITH src AS (
      SELECT l_returnflag AS g,
             CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS v
      FROM lineitem WHERE l_extendedprice IS NOT NULL
    ), ranked AS (
      SELECT g, v,
             CAST(ROW_NUMBER() OVER (PARTITION BY g ORDER BY v ASC) AS BIGINT) AS rn,
             CAST(COUNT(*) OVER (PARTITION BY g) AS BIGINT) AS n
      FROM src
    ), marked AS (
      SELECT g, v, rn, n,
             greatest(1, (500 * n) // 10000) AS lo_rk,
             greatest(1, (9500 * n) // 10000) AS hi_rk
      FROM ranked
    ), bounds AS (
      SELECT g,
             MIN(CASE WHEN rn = lo_rk THEN v END) AS lo_bound,
             MIN(CASE WHEN rn = hi_rk THEN v END) AS hi_bound
      FROM marked GROUP BY g
    ), clipped AS (
      SELECT s.g, s.v, b.lo_bound, b.hi_bound,
             CASE WHEN s.v < b.lo_bound THEN b.lo_bound
                  WHEN s.v > b.hi_bound THEN b.hi_bound ELSE s.v END AS cv
      FROM src s JOIN bounds b USING (g)
    )
    SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(lo_bound) AS BIGINT) AS lo_bound,
           CAST(MIN(hi_bound) AS BIGINT) AS hi_bound,
           CAST(SUM(CASE WHEN v < lo_bound THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_lo,
           CAST(SUM(CASE WHEN v > hi_bound THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_hi,
           CAST(SUM(cv) // COUNT(*) AS BIGINT) AS wmean
    FROM clipped GROUP BY g
    """,
    doc="Winsorized robust mean (operators/robust.py "
    "winsorized_stats): per-returnflag price statistics with exact "
    "p5/p95 percentile-disc bounds (value at sorted position "
    "max(1, bp*n div 10000) — duplicate-safe row_number order), "
    "values clamped and the integer mean taken over the clamped "
    "column — the mean a skewed metric needs before outliers drive "
    "it. Fixed-point cents; one rank window per group plus a "
    "group-cardinality broadcast joinback; full-hash SQL replay.",
)
def q_winsorized_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.robust import winsorized_stats

    li = _t(spark, sf_dir, "lineitem")
    src = li.where(F.col("l_extendedprice").isNotNull()).select(
        F.col("l_returnflag").alias("g"),
        F.floor(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    return winsorized_stats(src, "cents", "g")


@register(
    "peak_concurrency",
    """
    WITH iv AS (
      SELECT event_type AS g,
             CAST(epoch_us(ts) // 1000000 AS BIGINT) AS s,
             CAST(epoch_us(ts) // 1000000 + 600 AS BIGINT) AS e
      FROM events
    ), deltas AS (
      SELECT g, s AS t, 1 AS d FROM iv
      UNION ALL
      SELECT g, e AS t, -1 AS d FROM iv
    ), per_t AS (
      SELECT g, t, CAST(SUM(d) AS BIGINT) AS d FROM deltas GROUP BY 1, 2
    ), cum AS (
      SELECT g, t,
             CAST(SUM(d) OVER (PARTITION BY g ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c
      FROM per_t
    )
    SELECT g, CAST(MAX(c) AS BIGINT) AS peak,
           CAST(MIN(CASE WHEN c = (SELECT MAX(c2.c) FROM cum c2 WHERE c2.g = cum.g)
                    THEN t END) AS BIGINT) AS at_ts
    FROM cum GROUP BY g
    """,
    doc="Peak interval concurrency (operators/timeseries.py "
    "peak_concurrency): events become 10-minute half-open activity "
    "intervals per type, and the classic +1/-1 boundary sweep — "
    "deltas aggregated PER TIMESTAMP before the running sum, so "
    "touching endpoints never double-count — yields each type's "
    "maximum simultaneous count and the earliest time it is reached. "
    "The window runs over boundary cardinality, not interval mass "
    "(the pair-TTL delta-encode idiom). Half-open and tie semantics "
    "pytest-pinned.",
)
def q_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.timeseries import peak_concurrency

    ev = _t(spark, sf_dir, "events")
    iv = ev.select(
        F.col("event_type").alias("g"),
        F.expr("unix_micros(ts) div 1000000").cast("long").alias("s"),
        (F.expr("unix_micros(ts) div 1000000") + 600).cast("long").alias("e"),
    )
    return peak_concurrency(iv, "s", "e", "g")


@register(
    "media_jpeg_pixels",
    """
    WITH ids AS (
      SELECT doc_id AS media_id,
             8 * (1 + doc_id % 3) AS w,
             8 * (1 + (doc_id // 3) % 2) AS h
      FROM documents
    ), blocks AS (
      SELECT media_id, w, h,
             unnest(generate_series(0, (w // 8) * (h // 8) - 1)) AS b
      FROM ids
    ), ycc AS (
      SELECT media_id, w, h,
             128 + (media_id * 7 + b * 13) % 200 - 100 AS y,
             (media_id * 5 + b * 11) % 120 - 60 AS cb,
             (media_id * 3 + b * 17) % 120 - 60 AS cr
      FROM blocks
    ), rgb AS (
      SELECT media_id, w, h,
        GREATEST(0, LEAST(255,
          y + ((91881 * cr + 32768 + 16777216) // 65536 - 256))) AS r,
        GREATEST(0, LEAST(255,
          y - ((22554 * cb + 46802 * cr + 32768 + 33554432) // 65536 - 512))) AS g,
        GREATEST(0, LEAST(255,
          y + ((116130 * cb + 32768 + 16777216) // 65536 - 256))) AS bl
      FROM ycc
    )
    SELECT media_id,
           CAST(w AS INTEGER) AS width,
           CAST(h AS INTEGER) AS height,
           CAST(w * h AS BIGINT) AS n_pixels,
           CAST(64 * SUM(r + g + bl) AS BIGINT) AS pixel_sum,
           CAST(64 * SUM(299 * r + 587 * g + 114 * bl) AS BIGINT) AS luma_sum
    FROM rgb
    GROUP BY 1, 2, 3, 4
    """,
    doc="FULL baseline-JPEG pixel decode (multimodal.decode_image_pixels"
    " / decode_jpeg_pixels, ITU-T T.81): complete valid JPEGs — real "
    "Huffman entropy-coded scans with Annex K tables in actual DHT "
    "segments, differential DC, EOB'd AC, byte unstuffing — "
    "synthesized from the doc_id recipe with DC-only blocks and an "
    "all-ones quant table so the dequant+IDCT+YCbCr->RGB cascade is "
    "integer-exact (a DC-only block IDCTs to the flat value DC/8). "
    "The oracle computes the SAME decoded RGB pixel/Rec.601 luma "
    "sums from the closed form (16.16 fixed-point color transform "
    "replicated with a nonnegative-bias //) without touching a byte, "
    "so any Huffman, predictor, dequant, IDCT, or color-math bug "
    "hash-mismatches. The general AC/IDCT path is differentially "
    "pytest-pinned (arbitrary blocks FDCT'd, entropy-coded, and "
    "reconstructed within the T.81 accuracy envelope). Closes the "
    "last first-class image stub: JPEG is the dominant web image "
    "format, and the decoder now covers PNG + GIF + JPEG pixels.",
)
def q_media_jpeg_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.multimodal import (
        decode_image_pixels,
        synthesize_media,
    )

    docs = _tp(spark, sf_dir, "documents")
    media = synthesize_media(
        docs.select(F.col("doc_id").alias("media_id")), variant="jpeg_full"
    )
    return decode_image_pixels(media)


def _ivfpq_oracle(
    n_cells: int = 16,
    n_probe: int = 4,
    n_subspaces: int = 4,
    n_codes: int = 16,
    dim: int = 64,
    k: int = 10,
) -> str:
    """Exact DuckDB twin of q_ivf_pq_topk — the full IVFADC cascade
    replayed in SQL: seed centroids, argmax-cosine cell assignment,
    element-wise residual subtraction (list_transform over an index
    list — per-element IEEE double ops, bit-identical to Spark's
    zip_with), residual seed codebooks, fixed-point L2² encode,
    n_probe cell ranking, per-cell query residual distance tables,
    int64 ADC sum."""
    sub = dim // n_subspaces
    cos_cv = _cosine_sql("e.embedding::DOUBLE[]", "c.cv")
    cos_qc = _cosine_sql("q.qv", "c.cv")

    def l2fp(a, b):
        return (
            f"CAST(FLOOR((list_dot_product({a}, {a}) - 2 * list_dot_product({a}, {b})"
            f" + list_dot_product({b}, {b})) * 10000000) AS BIGINT)"
        )

    return f"""
    WITH ms AS (
      SELECT unnest(generate_series(0, {n_subspaces - 1})) AS m
    ), cent AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id ASC) - 1 AS INT) AS cell_id,
             embedding::DOUBLE[] AS cv
      FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id ASC LIMIT {n_cells})
    ), q AS (
      SELECT embedding::DOUBLE[] AS qv FROM embeddings ORDER BY vec_id LIMIT 1
    ), assigned AS (
      SELECT vec_id, v, cell_id FROM (
        SELECT e.vec_id, e.embedding::DOUBLE[] AS v, c.cell_id,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                  ORDER BY {cos_cv} DESC, c.cell_id ASC) AS rk
        FROM embeddings e CROSS JOIN cent c
      ) WHERE rk = 1
    ), res AS (
      SELECT a.vec_id, a.cell_id,
             list_transform(generate_series(1, {dim}), i -> a.v[i] - c.cv[i]) AS rv
      FROM assigned a JOIN cent c USING (cell_id)
    ), cb_src AS (
      SELECT vec_id, rv FROM res ORDER BY vec_id LIMIT {n_codes}
    ), cb0 AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS code, rv
      FROM cb_src
    ), cb AS (
      SELECT code, m, rv[(m*{sub}+1):(m*{sub}+{sub})] AS cv
      FROM cb0 CROSS JOIN ms
    ), corpus AS (
      SELECT vec_id, cell_id, m, rv[(m*{sub}+1):(m*{sub}+{sub})] AS sv
      FROM res CROSS JOIN ms
    ), l2 AS (
      SELECT c.vec_id, c.cell_id, c.m, b.code, {l2fp('c.sv', 'b.cv')} AS fp
      FROM corpus c JOIN cb b USING (m)
    ), enc AS (
      SELECT vec_id, cell_id, m, code FROM (
        SELECT vec_id, cell_id, m, code,
               ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY fp, code) AS rk
        FROM l2
      ) WHERE rk = 1
    ), qcells AS (
      SELECT cell_id, cv FROM (
        SELECT c.cell_id, c.cv, {cos_qc} AS csim FROM q CROSS JOIN cent c
      ) ORDER BY csim DESC, cell_id ASC LIMIT {n_probe}
    ), qres AS (
      SELECT qc.cell_id,
             list_transform(generate_series(1, {dim}), i -> q.qv[i] - qc.cv[i]) AS qr
      FROM q CROSS JOIN qcells qc
    ), qm AS (
      SELECT cell_id, m, qr[(m*{sub}+1):(m*{sub}+{sub})] AS sv
      FROM qres CROSS JOIN ms
    ), dt AS (
      SELECT qm.cell_id, b.m, b.code, {l2fp('qm.sv', 'b.cv')} AS qfp
      FROM qm JOIN cb b USING (m)
    )
    SELECT e.vec_id, CAST(SUM(d.qfp) AS BIGINT) AS adc_fp
    FROM enc e JOIN dt d
      ON e.cell_id = d.cell_id AND e.m = d.m AND e.code = d.code
    GROUP BY e.vec_id
    ORDER BY adc_fp ASC, e.vec_id ASC LIMIT {k}
    """


@register(
    "ivf_pq_topk",
    _ivfpq_oracle(),
    doc="IVF-PQ composite ANN (similarity.ivf_pq_topk — the FAISS "
    "IVFADC production shape, Jégou et al. TPAMI'11 §V): coarse IVF "
    "cells prune the search to n_probe/n_cells of the index, and the "
    "pruned scan reads RESIDUAL product-quantization codes scored by "
    "ADC (per-cell distance tables over the query residual) — at "
    "100 TB the scan is n_probe cell partitions of 4-small-int rows, "
    "never float vectors (write_ivfpq_index partitions the codes by "
    "cell, pruning pytest-verified via PartitionFilters). Residual "
    "encoding is what lets ONE shared codebook cover all cells. "
    "Deterministic end to end — double zip_with residuals, "
    "fixed-point L2² per table entry, int64 ADC — so the whole "
    "cascade (assign -> residual -> encode -> probe -> per-cell "
    "tables -> ADC rank) hash-replays in SQL; recall vs exact top-k "
    "pytest-pinned on a clustered fixture. Lloyd's training for both "
    "quantizers slots in via train_iterations without changing the "
    "query shape.",
)
def q_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.similarity import ivf_pq_topk

    emb = _t(spark, sf_dir, "embeddings")
    query = emb.orderBy("vec_id").limit(1).select(F.col("embedding").alias("qv"))
    return ivf_pq_topk(emb, query, k=10)


#: deterministic multi-line injection — the driver's synthetic texts
#: carry no newlines or punctuation, which would leave C4's line
#:  filter unexercised; both engines append the SAME id-keyed lines
#: (kept sentence / short line / brace page / lorem page).
_C4_INJECT_SQL = (
    "text || CASE doc_id % 5"
    " WHEN 0 THEN chr(10) || 'This is a proper sentence with enough words here.'"
    "   || chr(10) || 'short line.'"
    "   || chr(10) || 'Another full sentence that also ends with punctuation today!'"
    "   || chr(10) || 'And a third complete sentence closes out the page nicely.'"
    " WHEN 1 THEN chr(10) || 'nav menu home about contact'"
    "   || chr(10) || 'One single proper sentence with enough words here.'"
    " WHEN 2 THEN chr(10) || 'var x = { a: 1 } and some trailing words to read.'"
    " WHEN 3 THEN chr(10) || 'Lorem ipsum dolor sit amet is the classic filler text.'"
    " ELSE '' END"
)


def _c4_oracle() -> str:
    from pasta_pipeline_spark.operators.quality_filters import c4_line_clean_sql

    inner = c4_line_clean_sql("src", "doc_id", "t").replace(
        "WITH base AS", ", base AS", 1
    )
    return f"WITH src AS (SELECT doc_id, {_C4_INJECT_SQL} AS t FROM documents)\n{inner}"


def _c4_inject_spark():
    """Spark twin of _C4_INJECT_SQL — the same id-keyed multi-line
    injection, shared by every line-level query."""
    nl = "\n"
    return F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.lit(
                nl + "This is a proper sentence with enough words here."
                + nl + "short line."
                + nl + "Another full sentence that also ends with punctuation today!"
                + nl + "And a third complete sentence closes out the page nicely."
            ),
        )
        .when(
            F.col("doc_id") % 5 == 1,
            F.lit(
                nl + "nav menu home about contact"
                + nl + "One single proper sentence with enough words here."
            ),
        )
        .when(
            F.col("doc_id") % 5 == 2,
            F.lit(nl + "var x = { a: 1 } and some trailing words to read."),
        )
        .when(
            F.col("doc_id") % 5 == 3,
            F.lit(nl + "Lorem ipsum dolor sit amet is the classic filler text."),
        )
        .otherwise(F.lit("")),
    )


@register(
    "c4_line_clean",
    _c4_oracle(),
    doc="C4 line-level cleaning (quality_filters.c4_line_clean, Raffel "
    "et al. 2020 §2.2): keep lines ending in terminal punctuation with "
    ">= 5 words, then page verdicts — no 'lorem ipsum', no '{', >= 3 "
    "sentences in the CLEANED text — the famous line tier BELOW the "
    "gopher_rules page table (navigation crumbs and cookie banners "
    "die per line; template pages per page). One projection, nested "
    "higher-order functions, no explode/shuffle; the oracle SQL is "
    "generated from the same constants so thresholds cannot drift; "
    "cleaned text itself is part of the hash.",
)
def q_c4_line_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.quality_filters import c4_line_clean

    docs = _tp(spark, sf_dir, "documents")
    src = docs.select("doc_id", _c4_inject_spark().alias("t"))
    return c4_line_clean(src, "doc_id", "t")


@register(
    "robots_refetch",
    """
    WITH hosts AS (
      SELECT DISTINCT 'h' || CAST(doc_id % 9 AS VARCHAR) || '.example' AS host
      FROM documents
    ), cache AS (
      SELECT 'h' || CAST(doc_id % 9 AS VARCHAR) || '.example' AS host,
             CAST(1000 + (doc_id * 37) % 500 AS BIGINT) AS fetched_at_s
      FROM documents WHERE doc_id % 9 < 6
    ), latest AS (
      SELECT host, MAX(fetched_at_s) AS last_fetch_s FROM cache GROUP BY host
    )
    SELECT h.host, l.last_fetch_s,
           CAST(1600 - l.last_fetch_s AS BIGINT) AS age_s,
           (l.last_fetch_s IS NULL OR 1600 - l.last_fetch_s > 300) AS stale
    FROM hosts h LEFT JOIN latest l USING (host)
    """,
    doc="robots.txt cache staleness audit (robots.robots_refetch_list, "
    "RFC 9309 §2.4 '24 hours' caching): which frontier hosts need a "
    "robots (re)fetch before the next wave — never-fetched hosts and "
    "entries older than max_age. Completes the crawl stack's "
    "admission-is-current contract: robots_verdict assumes fresh "
    "rules; this is what keeps them fresh. Host-cardinality frames, "
    "one broadcast-friendly left join, full-hash replay.",
)
def q_robots_refetch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.robots import robots_refetch_list

    docs = _t(spark, sf_dir, "documents")
    hosts = docs.select(
        F.concat(F.lit("h"), (F.col("doc_id") % 9).cast("string"), F.lit(".example")).alias("host")
    )
    cache = docs.where(F.col("doc_id") % 9 < 6).select(
        F.concat(F.lit("h"), (F.col("doc_id") % 9).cast("string"), F.lit(".example")).alias("host"),
        (F.lit(1000) + (F.col("doc_id") * 37) % 500).cast("long").alias("fetched_at_s"),
    )
    return robots_refetch_list(hosts, cache, now_s=1600, max_age_s=300)


@register(
    "recrawl_schedule",
    """
    WITH obs AS (
      SELECT 'https://e.example/p' || CAST(event_id % 50 AS VARCHAR) AS url,
             CAST(epoch_us(ts) // 1000000 AS BIGINT) AS lastmod_s
      FROM events
    ), agg AS (
      SELECT url,
             CAST(COUNT(DISTINCT lastmod_s) AS BIGINT) AS n_obs,
             MIN(lastmod_s) AS first_s,
             MAX(lastmod_s) AS last_s
      FROM obs GROUP BY url
    ), est AS (
      SELECT url, n_obs, last_s,
             CASE WHEN n_obs >= 2
                  THEN GREATEST((last_s - first_s) // (n_obs - 1), 3600)
                  ELSE 604800 END AS interval_s
      FROM agg
    )
    SELECT url, n_obs,
           CAST(last_s AS BIGINT) AS last_change_s,
           CAST(interval_s AS BIGINT) AS interval_s,
           CAST(last_s + interval_s AS BIGINT) AS next_due_s,
           (last_s + interval_s) <= 1500000000 AS due_now
    FROM est
    """,
    doc="Change-rate recrawl scheduling (sitemaps.recrawl_schedule): "
    "per-URL mean change interval from the observed lastmod trail "
    "(span div (n_obs-1), the uniform-rate estimator a Poisson change "
    "model reduces to), politeness-floored, with next-due timestamps "
    "and a due-now verdict — the freshness economics of a 100 TB "
    "crawl (daily refetch wastes budget on dead pages; rate "
    "estimation fixes it). One groupBy over the observation history, "
    "URL-cardinality output, pure integer arithmetic, full-hash "
    "replay.",
)
def q_recrawl_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.sitemaps import recrawl_schedule

    ev = _t(spark, sf_dir, "events")
    obs = ev.select(
        F.concat(F.lit("https://e.example/p"), (F.col("event_id") % 50).cast("string")).alias("url"),
        F.expr("unix_micros(ts) div 1000000").cast("long").alias("lastmod_s"),
    )
    return recrawl_schedule(obs, now_s=1_500_000_000)


@register(
    "url_spam_features",
    """
    WITH urls AS (
      SELECT doc_id,
             'https://sub' || CAST(doc_id % 3 AS VARCHAR) || '.h' ||
             CAST(doc_id % 97 AS VARCHAR) ||
             repeat('-a', doc_id % 4) || '.example.com/p/x/' ||
             CAST(doc_id AS VARCHAR) ||
             CASE WHEN doc_id % 4 = 0 THEN '?a=1&b=%20x&c=%2Fy' ELSE '' END AS url
      FROM documents
    ), parts AS (
      SELECT doc_id, url,
             regexp_replace(regexp_replace(
               lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)),
               '^[^@]*@', ''), ':[0-9]+$', '') AS host,
             regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+(/[^?#]*)', 1) AS path,
             regexp_extract(url, '\\?([^#]*)', 1) AS q
      FROM urls
    ), feats AS (
      SELECT doc_id, url, host,
             CAST(length(host) AS BIGINT) AS host_len,
             CAST(length(host) - length(regexp_replace(host, '[0-9]', '', 'g')) AS BIGINT) AS n_host_digits,
             CAST(length(host) - length(regexp_replace(host, '-', '', 'g')) AS BIGINT) AS n_host_hyphens,
             CAST(CASE WHEN host = '' THEN 0 ELSE len(str_split(host, '.')) END AS BIGINT) AS n_labels,
             CAST(length(path) - length(regexp_replace(path, '/', '', 'g')) AS BIGINT) AS path_depth,
             CAST(CASE WHEN q = '' THEN 0 ELSE len(str_split(q, '&')) END AS BIGINT) AS n_params,
             CAST(len(regexp_extract_all(url, '%[0-9A-Fa-f][0-9A-Fa-f]')) AS BIGINT) AS n_pct
      FROM parts
    )
    SELECT doc_id, url, host, host_len, n_host_digits, n_host_hyphens,
           n_labels, path_depth, n_params, n_pct,
           CAST(2 * n_host_digits + 3 * n_host_hyphens
                + CASE WHEN n_labels > 4 THEN 5 ELSE 0 END
                + CASE WHEN host_len > 40 THEN 5 ELSE 0 END
                + n_params + 2 * n_pct AS BIGINT) AS spam_points
    FROM feats
    """,
    doc="URL spam/trap heuristics for frontier prioritization "
    "(functions/urls.url_features, IRLbot-style): digit- and "
    "hyphen-stuffed hosts, deep subdomain chains, long hosts, "
    "parameter farms, heavy percent-encoding — integer feature "
    "columns + a weighted spam_points score a crawl budget can rank "
    "on before any content exists. Host extracted by PORTABLE regex "
    "(not engine URL functions) so the SQL twin is exact; pure "
    "expressions, one projection, weights shared via module "
    "constants.",
)
def q_url_spam_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.functions.urls import url_features

    docs = _t(spark, sf_dir, "documents")
    urls = docs.select(
        "doc_id",
        F.concat(
            F.lit("https://sub"), (F.col("doc_id") % 3).cast("string"),
            F.lit(".h"), (F.col("doc_id") % 97).cast("string"),
            F.expr("repeat('-a', CAST(doc_id % 4 AS INT))"),
            F.lit(".example.com/p/x/"), F.col("doc_id").cast("string"),
            F.when(F.col("doc_id") % 4 == 0, F.lit("?a=1&b=%20x&c=%2Fy")).otherwise(F.lit("")),
        ).alias("url"),
    )
    return url_features(urls, "url")


@register(
    "prefix_jaccard_pairs",
    _JACCARD_ORACLE,
    doc="Dedup tier 3b — the SAME exact 3-gram Jaccard >= 0.5 contract "
    "as ngram_jaccard_pairs, via PREFIX FILTERING (Chaudhuri/"
    "Bayardo/Xiao PPJoin lineage): tokens globally ordered by "
    "ascending document frequency, only each set's |x|-ceil(t|x|)+1 "
    "prefix indexed and joined (rare tokens generate the candidates; "
    "hot boilerplate shingles never do), conservative-integer prefix "
    "and length bounds so float rounding can never lose a pair, then "
    "exact intersection verify over candidate sets only. The better "
    "candidate generator at 100 TB — the inverted index's cost tracks "
    "its HOTTEST key, prefix filtering's tracks its rarest. Shares "
    "the brute-force oracle (two algorithms, one contract); "
    "equivalence with jaccard_pairs also pytest-pinned.",
)
def q_prefix_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.text_dedup import prefix_jaccard_pairs

    docs = _t(spark, sf_dir, "documents")
    return prefix_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5)


