"""Catalog tier: deterministic sampling, packing, sessions, funnels.

Split verbatim from the r8 catalog monolith (r8 verdict ask #4).
Registration order is preserved by the package __init__ import
order; registration stays APPEND-ONLY — new queries go at the end
of the LAST tier module (or a new one imported last).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import SparkSession
from pyspark.sql import Window
from pasta_pipeline_spark.queries.catalog._core import _t, _tp, _xsum, register

# ---------------------------------------------------------------------------
# Extension surface: deterministic sampling, packing, sessions, funnels
# ---------------------------------------------------------------------------


@register(
    "stratified_sample",
    """
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 10000 <
          CASE lang WHEN 'en' THEN 5000 WHEN 'zh' THEN 10000 ELSE 2000 END
    """,
    doc="Deterministic stratified corpus sampling (domain-mixing weights): "
    "keep 50% of en, 100% of zh, 20% of everything else — membership is a "
    "pure md5 function of doc_id, so the sample is reproducible across "
    "runs, partitionings and engines (no RNG, no shuffle; unlike "
    "DataFrame.sample's partition-seeded draw, this is oracle-checkable).",
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.sampling import stratified_sample

    docs = _t(spark, sf_dir, "documents")
    return stratified_sample(
        docs.select("doc_id", "lang", "n_chars"),
        id_col="doc_id",
        fractions={"en": 0.5, "zh": 1.0},
        strata_col="lang",
        default_fraction=0.2,
    )


@register(
    "pack_sequences",
    """
    WITH t AS (
      SELECT doc_id, lang,
             COALESCE(len(list_filter(regexp_split_to_array(text, '\\s+'), y -> y <> '')), 0) AS n
      FROM documents
    ), s AS (
      SELECT doc_id, lang, n,
             CAST(COALESCE(SUM(n) OVER (PARTITION BY lang ORDER BY doc_id
                                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                           0) AS BIGINT) AS start_offset
      FROM t
    )
    SELECT doc_id, lang, start_offset,
           CAST(FLOOR(start_offset / 512) AS BIGINT) AS bin,
           (n > 0 AND FLOOR((start_offset + GREATEST(n, 1) - 1) / 512) > FLOOR(start_offset / 512)) AS crosses_boundary
    FROM s
    """,
    doc="Concat-and-chunk sequence packing for training batches: documents "
    "laid out per-lang in doc_id order, context-window boundaries every 512 "
    "tokens; each doc gets its window index (start_offset // 512) and a "
    "boundary-straddle flag. One window shuffle; exact integer arithmetic.",
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.functions.text import word_count
    from pasta_pipeline_spark.operators.sampling import pack_sequences

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "lang", word_count("text").cast("long").alias("n_words")
    )
    return pack_sequences(
        docs, id_col="doc_id", tokens_col="n_words", budget=512, partition_col="lang"
    ).select("doc_id", "lang", "start_offset", "bin", "crosses_boundary")


@register(
    "session_stats",
    """
    WITH e AS (
      SELECT user_id, event_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec FROM events
    ), lagged AS (
      SELECT user_id, event_id, sec,
             LAG(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id) AS prev
      FROM e
    ), marked AS (
      SELECT user_id, event_id, sec,
             CASE WHEN prev IS NULL OR sec - prev > 1800 THEN 1 ELSE 0 END AS new_s
      FROM lagged
    ), assigned AS (
      SELECT user_id, sec,
             CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY sec, event_id
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
      FROM marked
    )
    SELECT user_id, session_seq,
           count(*) AS n_events,
           min(sec) AS start_sec,
           max(sec) AS end_sec,
           max(sec) - min(sec) AS duration_sec
    FROM assigned GROUP BY user_id, session_seq
    """,
    doc="Batch gap-based sessionization (30-min gap) + per-session rollup: "
    "lag + running-sum session assignment (the batch analog of the "
    "streaming session_window), epoch-second integer arithmetic, one "
    "window shuffle on the user key.",
)
def q_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.sessions import session_stats

    events = _t(spark, sf_dir, "events").select(
        "user_id", "event_id", F.col("ts").cast("long").alias("sec")
    )
    return session_stats(
        events, user_col="user_id", ts_col="sec",
        order_tiebreak="event_id", gap_minutes=30,
    )


@register(
    "funnel_steps",
    """
    WITH s1 AS (SELECT user_id, min(ts) AS t FROM events
                WHERE event_type = 'signup' GROUP BY user_id),
    s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s1 ON e.user_id = s1.user_id
           WHERE e.event_type = 'view' AND e.ts > s1.t GROUP BY e.user_id),
    s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s2 ON e.user_id = s2.user_id
           WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY e.user_id)
    SELECT (SELECT count(*) FROM s1) AS n_step1,
           (SELECT count(*) FROM s2) AS n_step2,
           (SELECT count(*) FROM s3) AS n_step3
    """,
    doc="Ordered funnel completion (signup → view → purchase): a user "
    "advances only with an event strictly after their previous step's "
    "completion time (min-ts chaining). Level frames shrink per step; "
    "equi-joins AQE can broadcast once levels get small.",
)
def q_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.sessions import funnel_counts

    events = _t(spark, sf_dir, "events")
    return funnel_counts(events, ["signup", "view", "purchase"])


@register(
    "price_quantiles",
    """
    SELECT l_returnflag,
           quantile_cont(l_extendedprice, 0.25) AS p25,
           quantile_cont(l_extendedprice, 0.5)  AS p50,
           quantile_cont(l_extendedprice, 0.9)  AS p90
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Grouped exact percentiles: Spark `percentile` and DuckDB "
    "`quantile_cont` share the SQL-standard interpolation (pos = p*(n-1), "
    "linear between neighbors), verified bit-identical — no fixed-point "
    "bridge needed. Exact percentile is a full sort per group; at 100 TB "
    "swap in approx_percentile (t-digest) where tolerance allows.",
)
def q_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.25)").alias("p25"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
        F.expr("percentile(l_extendedprice, 0.9)").alias("p90"),
    )


@register(
    "cube_revenue",
    """
    SELECT l_returnflag, l_linestatus,
           count(*) AS n_items,
           SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) / 10000.0 AS revenue
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="CUBE grouping sets (all 2^2 rollup combinations in one pass — "
    "completes the ROLLUP/grouping-sets family): per flag x status revenue "
    "plus both marginals and the grand total, fixed-point sums.",
)
def q_cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc_fp = F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000).cast("long")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_items"),
        (F.sum(disc_fp) / 10000.0).alias("revenue"),
    )


@register(
    "rank_windows",
    """
    SELECT o_custkey, o_orderkey,
           CAST(rank()       OVER w AS BIGINT) AS rnk,
           CAST(dense_rank() OVER w AS BIGINT) AS drnk,
           CAST(ntile(4)     OVER w AS BIGINT) AS quartile,
           percent_rank()    OVER w            AS prnk
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
    """,
    doc="Ranking-window family (rank / dense_rank / ntile / percent_rank) "
    "per customer by order value — deterministic total order via the "
    "o_orderkey tiebreak; percent_rank's (rank-1)/(n-1) double is "
    "cross-engine exact.",
)
def q_rank_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.percent_rank().over(w).alias("prnk"),
    )


@register(
    "asof_join_events",
    """
    WITH p AS (
      SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
    ), v AS (
      SELECT user_id, ts, value FROM (
        SELECT user_id, ts, value,
               row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type = 'view'
      ) WHERE rn = 1
    )
    SELECT p.event_id, p.user_id,
           CAST(FLOOR(epoch(p.ts)) AS BIGINT) AS ts_s,
           CAST(FLOOR(epoch(v.ts)) AS BIGINT) AS view_ts_s,
           v.value AS view_value
    FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
    doc="As-of join (operators/asof.py): each purchase picks up the user's "
    "latest view at-or-before it — DuckDB ASOF LEFT JOIN is the oracle. The "
    "right side is pre-deduped per (user, ts) so the matched row is unique; "
    "matched doubles pass through unhashed arithmetic.",
)
def q_asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.asof import asof_join
    from pasta_pipeline_spark.operators.dedup import keep_latest

    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    views = (
        ev.filter(F.col("event_type") == "view")
        .select("user_id", "ts", "value", "event_id")
        .transform(lambda df: keep_latest(df, ["user_id", "ts"], "event_id"))
        .select("user_id", "ts", "value")
    )
    joined = asof_join(
        purchases,
        views,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        value_cols=["value"],
        suffix="_view",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("ts").cast("long").alias("ts_s"),
        F.col("ts_view").cast("long").alias("view_ts_s"),
        F.col("value_view").alias("view_value"),
    )


@register(
    "range_join_windows",
    """
    WITH e AS (
      SELECT event_id, ts FROM events WHERE event_type = 'error' AND user_id <= 15
    ), p AS (
      SELECT ts FROM events WHERE event_type = 'purchase'
    )
    SELECT e.event_id, CAST(FLOOR(epoch(e.ts)) AS BIGINT) AS ts_s,
           CAST(count(p.ts) AS BIGINT) AS n_purchases
    FROM e LEFT JOIN p
      ON p.ts >= e.ts AND p.ts < e.ts + INTERVAL 15 MINUTE
    GROUP BY e.event_id, e.ts
    """,
    doc="Bucketized range join (operators/rangejoin.py): purchases falling "
    "inside each error's 15-minute incident window, keyless (the hard case "
    "— with no equi-key a naive BETWEEN join is a nested loop). The bin "
    "equi-join plan is asserted cartesian-free in test_asof_range.py; the "
    "DuckDB oracle runs the inequality join directly.",
)
def q_range_join_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.rangejoin import interval_point_counts

    ev = _t(spark, sf_dir, "events")
    errors = (
        ev.filter((F.col("event_type") == "error") & (F.col("user_id") <= 15))
        .select("event_id", "ts")
        .withColumn("w_end", F.col("ts") + F.expr("INTERVAL 15 MINUTES"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("ts").alias("p_ts")
    )
    counted = interval_point_counts(
        errors,
        purchases,
        interval_id="event_id",
        start_col="ts",
        end_col="w_end",
        ts_col="p_ts",
        bin_seconds=900,
        count_alias="n_purchases",
    )
    return counted.select(
        "event_id",
        F.col("ts").cast("long").alias("ts_s"),
        F.col("n_purchases").cast("long").alias("n_purchases"),
    )


@register(
    "chunk_documents",
    """
    WITH t AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(text, '\\s+'), y -> y <> '') AS toks
      FROM documents
    ), d AS (
      SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) > 0
    ), s AS (
      SELECT doc_id, toks,
             unnest(generate_series(1, n, 48)) AS start_token
      FROM d
    )
    SELECT doc_id,
           CAST((start_token - 1) / 48 AS BIGINT) AS chunk_idx,
           CAST(start_token AS BIGINT) AS start_token,
           CAST(len(toks[start_token : start_token + 63]) AS BIGINT) AS n_tokens,
           array_to_string(toks[start_token : start_token + 63], ' ') AS chunk_text
    FROM s
    """,
    doc="Overlapping token-window chunking for LLM training "
    "(operators/chunking.py): 64-token chunks every 48 tokens, all array "
    "expressions in one scan — sequence starts, posexplode, slice; no UDF, "
    "no shuffle. The oracle mirrors it with generate_series + inclusive "
    "list slicing.",
)
def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.chunking import chunk_documents

    docs = _tp(spark, sf_dir, "documents")
    return chunk_documents(
        docs, id_col="doc_id", text_col="text", chunk_size=64, stride=48
    )


@register(
    "tfidf_top_terms",
    """
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'), y -> y <> '')) AS term
      FROM documents
    ), tf AS (
      SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
    ), df AS (
      SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY term
    ), n AS (
      SELECT count(*) AS n FROM documents
    ), scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, df.df,
             CAST(FLOOR(tf.tf * ln(CAST(n.n AS DOUBLE) / df.df) * 10000) AS BIGINT) AS score_fp
      FROM tf JOIN df USING (term) CROSS JOIN n
    )
    SELECT doc_id, CAST(rnk AS BIGINT) AS rnk, term,
           CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df, score_fp
    FROM (
      SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score_fp DESC, term ASC) AS rnk
      FROM scored
    ) WHERE rnk <= 5
    """,
    doc="Top-5 TF-IDF terms per document (operators/text_analysis.py): "
    "textbook tf*ln(N/df), fixed-point-bridged score, (score, term) total "
    "order for a deterministic top-k. ln() verified bit-identical between "
    "the JVM and DuckDB on this domain.",
)
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.text_analysis import tfidf_top_terms

    docs = _tp(spark, sf_dir, "documents")
    return tfidf_top_terms(docs, id_col="doc_id", text_col="text", k=5)


@register(
    "quantize_int8",
    """
    WITH m AS (
      SELECT vec_id, embedding,
             list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS mx
      FROM embeddings
    ), s AS (
      SELECT vec_id, embedding,
             CASE WHEN mx > 0 THEN 127.0 / mx END AS scale
      FROM m
    )
    SELECT vec_id,
           CAST(i - 1 AS BIGINT) AS pos,
           CAST(round(CAST(embedding[i] AS DOUBLE) * COALESCE(scale, 0.0)) AS INTEGER) AS q,
           CAST(FLOOR(scale * 10000) AS BIGINT) AS scale_fp
    FROM s, unnest(generate_series(1, len(embedding))) t(i)
    """,
    doc="Symmetric int8 scalar quantization (operators/similarity.py): "
    "scale = 127/max|v|, round-half-away (verified identical in both "
    "engines on doubles), posexploded to exact-integer rows; the scale "
    "crosses the fixed-point bridge.",
)
def q_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.similarity import quantize_embeddings_int8

    emb = _t(spark, sf_dir, "embeddings")
    return quantize_embeddings_int8(emb, id_col="vec_id", vec_col="embedding")


@register(
    "resample_locf",
    """
    WITH b AS (
      SELECT user_id, date_trunc('hour', min(ts)) AS h0, date_trunc('hour', max(ts)) AS h1
      FROM events GROUP BY user_id
    ), grid AS (
      SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS slot FROM b
    ), agg AS (
      SELECT user_id, date_trunc('hour', ts) AS slot,
             count(*) AS n,
             CAST(SUM(CAST(FLOOR(value * 10000) AS BIGINT)) AS BIGINT) AS vfp
      FROM events GROUP BY 1, 2
    )
    SELECT g.user_id,
           CAST(epoch(g.slot) AS BIGINT) AS slot_s,
           CAST(COALESCE(a.n, 0) AS BIGINT) AS n_events,
           (a.n IS NULL) AS is_gap,
           a.vfp AS slot_value,
           CAST(last_value(a.vfp IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.slot
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS slot_value_locf
    FROM grid g LEFT JOIN agg a ON g.user_id = a.user_id AND g.slot = a.slot
    """,
    doc="Gap-fill / resample to an hourly per-user grid with "
    "last-observation-carried-forward (operators/timeseries.py): "
    "sequence()+explode manufactures each key's grid from its own bounds, "
    "one window pass fills gaps; fixed-point slot sums.",
)
def q_resample_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.timeseries import resample_locf

    ev = _t(spark, sf_dir, "events")
    out = resample_locf(
        ev,
        key_col="user_id",
        ts_col="ts",
        value_fp_agg=F.sum(F.floor(F.col("value") * 10000).cast("long")),
        slot="1 hour",
        trunc_unit="hour",
    )
    return out.select(
        "user_id",
        F.col("slot").cast("long").alias("slot_s"),
        "n_events",
        "is_gap",
        "slot_value",
        "slot_value_locf",
    )


@register(
    "price_histogram",
    """
    WITH h AS (
      SELECT CAST(FLOOR(l_extendedprice / 5000) AS BIGINT) AS bucket,
             count(*) AS n,
             CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM lineitem GROUP BY 1
    )
    SELECT bucket, CAST(n AS BIGINT) AS n, cents,
           CAST(SUM(n) OVER (ORDER BY bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n
    FROM h
    """,
    doc="Fixed-width histogram + cumulative distribution of lineitem "
    "prices: bucket = FLOOR(price/5000) (identical IEEE ops both engines; "
    "DuckDB 1.0 has no width_bucket, so the shared arithmetic IS the "
    "contract), fixed-point cents sums, running count over the global "
    "bucket order (a handful of rows — the one window where a global "
    "ORDER BY is fine).",
)
def q_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    h = li.groupBy(
        F.floor(F.col("l_extendedprice") / 5000).cast("long").alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.floor(F.col("l_extendedprice") * 100).cast("long")).alias("cents"),
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return h.select(
        "bucket", "n", "cents", F.sum("n").over(w).cast("long").alias("cum_n")
    )


@register(
    "pagerank_parts",
    """
    WITH pairs AS (
      SELECT DISTINCT l_partkey * 2 AS l, l_suppkey * 2 + 1 AS r FROM lineitem
    ), edges AS (
      SELECT l AS src, r AS dst FROM pairs
      UNION ALL
      SELECT r AS src, l AS dst FROM pairs
    ), deg AS (
      SELECT src, count(*) AS outdeg FROM edges GROUP BY src
    ), r0 AS (
      SELECT DISTINCT src AS id, CAST(1000000 AS BIGINT) AS r FROM edges
    ), it1 AS (
      SELECT e.dst AS id,
             CAST(150000 + (85 * CAST(SUM(x.r // d.outdeg) AS BIGINT)) // 100 AS BIGINT) AS r
      FROM edges e JOIN r0 x ON e.src = x.id JOIN deg d ON d.src = e.src
      GROUP BY e.dst
    ), it2 AS (
      SELECT e.dst AS id,
             CAST(150000 + (85 * CAST(SUM(x.r // d.outdeg) AS BIGINT)) // 100 AS BIGINT) AS r
      FROM edges e JOIN it1 x ON e.src = x.id JOIN deg d ON d.src = e.src
      GROUP BY e.dst
    ), it3 AS (
      SELECT e.dst AS id,
             CAST(150000 + (85 * CAST(SUM(x.r // d.outdeg) AS BIGINT)) // 100 AS BIGINT) AS r
      FROM edges e JOIN it2 x ON e.src = x.id JOIN deg d ON d.src = e.src
      GROUP BY e.dst
    )
    SELECT id, r AS rank_fp FROM it3
    """,
    doc="Fixed-point PageRank, 3 iterations, over the part↔supplier "
    "co-occurrence graph (operators/graph.py): iterative join+groupBy "
    "rounds in pure int64 arithmetic — bit-identical across engines and "
    "partitionings, so even an iterative algorithm carries an exact "
    "oracle (three chained CTEs).",
)
def q_pagerank_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.graph import bipartite_edges, pagerank_fixed

    li = _t(spark, sf_dir, "lineitem")
    edges = bipartite_edges(li, "l_partkey", "l_suppkey")
    return pagerank_fixed(edges, iterations=3)


@register(
    "repetition_metrics",
    """
    WITH t AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '\\s+'), y -> y <> '') AS tk
      FROM documents
    ), b AS (
      SELECT doc_id, tk[i] || ' ' || tk[i+1] AS g
      FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 1)) AS i
            FROM t WHERE len(tk) >= 2)
    ), c AS (
      SELECT doc_id, g, count(*) AS cnt FROM b GROUP BY doc_id, g
    ), m AS (
      SELECT doc_id,
             CAST(SUM(cnt) AS BIGINT) AS total,
             CAST(MAX(cnt) AS BIGINT) AS top,
             CAST(count(*) AS BIGINT) AS dist
      FROM c GROUP BY doc_id
    )
    SELECT doc_id, total AS n_bigrams,
           CAST((10000 * top) // total AS BIGINT) AS top2_frac_fp,
           CAST((10000 * (total - dist)) // total AS BIGINT) AS dup2_frac_fp
    FROM m
    """,
    doc="Gopher-style repetition filters (operators/text_analysis.py): "
    "top-bigram fraction and duplicate-bigram fraction per document, exact "
    "integer ratios — the within-document complement of the dedup ladder.",
)
def q_repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.text_analysis import repetition_metrics

    docs = _tp(spark, sf_dir, "documents")
    return repetition_metrics(docs)


@register(
    "contamination_check",
    """
    WITH toks AS (
      SELECT doc_id, source,
             list_filter(regexp_split_to_array(lower(text), '\\s+'), y -> y <> '') AS t
      FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id, source,
             CASE WHEN len(t) >= 5
                  THEN t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4]
                  ELSE array_to_string(t, ' ') END AS g
      FROM (SELECT doc_id, source, t,
                   unnest(generate_series(1, greatest(len(t) - 4, 1))) AS i
            FROM toks)
    ), bench AS (
      SELECT DISTINCT g FROM sh WHERE source = 'src0'
    ), corpus AS (
      SELECT doc_id, g FROM sh WHERE source <> 'src0'
    ), sizes AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams FROM corpus GROUP BY doc_id
    ), hits AS (
      SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_contaminated
      FROM corpus c JOIN bench b ON c.g = b.g
      GROUP BY c.doc_id
    )
    SELECT s.doc_id, s.n_grams,
           CAST(COALESCE(h.n_contaminated, 0) AS BIGINT) AS n_contaminated,
           CAST((10000 * COALESCE(h.n_contaminated, 0)) // s.n_grams AS BIGINT) AS contam_frac_fp
    FROM sizes s LEFT JOIN hits h ON s.doc_id = h.doc_id
    """,
    doc="Benchmark-contamination scan (operators/text_analysis.py): distinct "
    "5-token shingles of each corpus doc (source<>'src0') probed against the "
    "'benchmark' set (source='src0') — the eval-leakage check a training "
    "pipeline runs before ingest. Zero-hit docs stay in the output.",
)
def q_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.text_analysis import contamination_check

    docs = _tp(spark, sf_dir, "documents")
    return contamination_check(
        docs.filter(F.col("source") != "src0"),
        docs.filter(F.col("source") == "src0"),
        n=5,
    )


def _zorder_oracle() -> str:
    from pasta_pipeline_spark.operators.layout import zvalue2_sql

    return f"""
    SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
           CAST({zvalue2_sql("l_partkey", "l_suppkey")} AS BIGINT) AS z
    FROM lineitem
    """


@register(
    "zorder_values",
    _zorder_oracle(),
    doc="Z-order clustering key (operators/layout.py): bit-interleave of "
    "(l_partkey, l_suppkey) — the sort key whose range-partitioned layout "
    "gives two-dimensional data skipping. The oracle SQL is GENERATED from "
    "the same bit recipe (zvalue2_sql), so engine and oracle cannot drift.",
)
def q_zorder_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.layout import zvalue2

    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        F.col("l_linenumber").cast("long").alias("l_linenumber"),
        zvalue2("l_partkey", "l_suppkey").cast("long").alias("z"),
    )


@register(
    "temperature_sample",
    """
    WITH c AS (
      SELECT source, count(*) AS n FROM documents GROUP BY source
    ), s AS (
      SELECT source, n,
             CAST(FLOOR(sqrt(CAST(n AS DOUBLE)) * 1000000) AS BIGINT) AS sqrt_fp
      FROM c
    ), t AS (
      SELECT CAST(SUM(sqrt_fp) AS BIGINT) AS tot FROM s
    ), quota AS (
      SELECT source, LEAST(n, (200 * sqrt_fp) // tot) AS m FROM s CROSS JOIN t
    ), ranked AS (
      SELECT doc_id, source, lang,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rnk
      FROM documents
    )
    SELECT r.doc_id, r.source, r.lang
    FROM ranked r JOIN quota q ON r.source = q.source
    WHERE r.rnk <= q.m
    """,
    doc="Temperature-based source mixing (operators/sampling.py): per-source "
    "quotas ∝ √n via integer arithmetic on fixed-point √n (√ is correctly "
    "rounded in both engines; no float sums anywhere), rows chosen by "
    "md5-rank within source — exact quota sizes, no RNG.",
)
def q_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.sampling import temperature_sample

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "lang")
    return temperature_sample(docs, id_col="doc_id", source_col="source", target_total=200)


@register(
    "edit_distance_shift_pairs",
    """
    WITH s AS (
      SELECT doc_id, lower(substr(text, 1, 40)) AS p
      FROM documents
      WHERE text IS NOT NULL
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(levenshtein(a.p, b.p) AS BIGINT) AS dist
    FROM s a JOIN s b
      ON a.doc_id < b.doc_id
     AND abs(length(a.p) - length(b.p)) <= 2
     AND levenshtein(a.p, b.p) <= 2
    """,
    doc="PassJoin-style shifted-segment edit-distance join "
    "(text_dedup.edit_distance_pairs_shifted): complete for <=2 edits "
    "INCLUDING indels, so the oracle is the ground-truth all-pairs filter "
    "over EVERY input string — ultrashort strings (< tau+1 chars) are "
    "covered by the length-windowed supplement, not excluded — and the "
    "engine's blocking must find every true pair, not just replay "
    "itself. (The DuckDB side may brute-force at sf0.01; the Spark side "
    "never does.)",
)
def q_edit_distance_shift_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.text_dedup import edit_distance_pairs_shifted

    docs = _t(spark, sf_dir, "documents")
    return edit_distance_pairs_shifted(docs, "doc_id", "text", prefix_len=40, tau=2)


@register(
    "shipping_priority",
    """
    SELECT l.l_orderkey,
           SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT)) / 10000.0
             AS revenue,
           CAST(epoch(o.o_orderdate) AS BIGINT) AS orderdate_s,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey ASC
    LIMIT 10
    """,
    doc="TPC-H Q3 analog (shipping priority): 3-way join with selective "
    "filters on every input — customer dim broadcasts, both date filters "
    "push to the parquet scans, fixed-point revenue, deterministic top-10.",
)
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    cutoff = "1995-03-15 00:00:00"
    rev_fp = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
    ).cast("long")
    return (
        li.where(F.col("l_shipdate") > F.lit(cutoff).cast("timestamp"))
        .join(
            orders.where(F.col("o_orderdate") < F.lit(cutoff).cast("timestamp")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(cust.where(F.col("c_mktsegment") == "BUILDING")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg((F.sum(rev_fp) / 10000.0).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            # o_orderdate is TIMESTAMP_NTZ; session tz is UTC so the
            # NTZ→timestamp hop is identity, then epoch seconds
            F.col("o_orderdate").cast("timestamp").cast("long").alias("orderdate_s"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "above_avg_orders",
    """
    WITH w AS (
      SELECT o_orderkey, o_custkey,
             CAST(FLOOR(o_totalprice * 10000) AS BIGINT) AS price_fp,
             CAST(SUM(CAST(FLOOR(o_totalprice * 10000) AS BIGINT))
                  OVER (PARTITION BY o_custkey) AS BIGINT) AS sum_fp,
             CAST(count(*) OVER (PARTITION BY o_custkey) AS BIGINT) AS n
      FROM orders
    )
    SELECT o_orderkey, o_custkey, price_fp
    FROM w
    WHERE n > 1 AND price_fp * n > sum_fp
    """,
    doc="Correlated 'above this customer's average' filter, decorrelated "
    "into one window pass (the subquery a SQL user would write as "
    "o_totalprice > (SELECT avg ... WHERE same custkey)); the comparison "
    "is cross-multiplied into exact integer arithmetic — no division.",
)
def q_above_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    price_fp = F.floor(F.col("o_totalprice") * 10000).cast("long")
    return (
        orders.withColumn("price_fp", price_fp)
        .withColumn("sum_fp", F.sum("price_fp").over(w))
        .withColumn("n", F.count(F.lit(1)).over(w))
        .where((F.col("n") > 1) & (F.col("price_fp") * F.col("n") > F.col("sum_fp")))
        .select("o_orderkey", "o_custkey", "price_fp")
    )


@register(
    "char_entropy",
    """
    WITH ch AS (
      SELECT doc_id, substr(text, i, 1) AS c
      FROM (SELECT doc_id, text, unnest(generate_series(1, length(text))) AS i
            FROM documents WHERE length(text) > 0)
    ), cc AS (
      SELECT doc_id, c, count(*) AS cnt FROM ch GROUP BY doc_id, c
    ), m AS (
      SELECT doc_id,
             CAST(SUM(cnt) AS BIGINT) AS n,
             CAST(SUM(cnt * CAST(FLOOR(ln(CAST(cnt AS DOUBLE)) * 1000000000) AS BIGINT)) AS BIGINT) AS s
      FROM cc GROUP BY doc_id
    )
    SELECT doc_id, n AS n_chars_seen,
           CAST((n * CAST(FLOOR(ln(CAST(n AS DOUBLE)) * 1000000000) AS BIGINT) - s) // n AS BIGINT)
             AS entropy_fp
    FROM m
    """,
    doc="Character-entropy quality proxy (operators/text_analysis.py): "
    "H = ln(n) - sum(cnt*ln cnt)/n in nats via fixed-point ln (1e9 scale) "
    "so every sum is order-free int64; substr(i,1) explode is the "
    "engine-portable char split.",
)
def q_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.text_analysis import char_entropy

    docs = _tp(spark, sf_dir, "documents")
    return char_entropy(docs)


def _aspect_oracle() -> str:
    from pasta_pipeline_spark.operators.multimodal import aspect_bucket_sql

    return f"""
    WITH m AS (
      SELECT CAST(('0x' || substr(md5(text), 1, 4))::BIGINT % 1920 + 1 AS BIGINT) AS width,
             CAST(('0x' || substr(md5(text), 5, 4))::BIGINT % 1080 + 1 AS BIGINT) AS height
      FROM documents
    )
    SELECT {aspect_bucket_sql("width", "height")} AS bucket,
           count(*) AS n_media,
           CAST(MIN((100 * width) // height) AS BIGINT) AS min_ap,
           CAST(MAX((100 * width) // height) AS BIGINT) AS max_ap
    FROM m
    GROUP BY 1
    """


@register(
    "aspect_buckets",
    _aspect_oracle(),
    doc="Aspect-ratio bucketing for image-batch training "
    "(operators/multimodal.py): the mapInPandas decode stage feeds integer "
    "dimensions; buckets assign via (100*w) div h against fixed ladder cuts "
    "— pure integer arithmetic, SQL twin generated from the same ladder.",
)
def q_aspect_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.multimodal import (
        aspect_bucket,
        extract_media_features,
    )

    docs = _tp(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text").alias("media_type"),
        F.col("text").cast("binary").alias("payload"),
    )
    feats = extract_media_features(media, decode="stub").select(
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
    )
    ap = F.expr("(100 * width) div height")
    return (
        feats.withColumn("bucket", aspect_bucket("width", "height"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.min(ap).cast("long").alias("min_ap"),
            F.max(ap).cast("long").alias("max_ap"),
        )
    )


@register(
    "salted_join_revenue",
    """
    SELECT p.p_brand,
           count(*) AS n_items,
           SUM(CAST(FLOOR(l.l_extendedprice * 10000) AS BIGINT)) / 10000.0 AS gross
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    """,
    doc="Skew-proof salted join (operators/skew.py): big side salted via "
    "pmod(hash(row), 16), small dim replicated per salt, join on "
    "(key, salt) — row-identical to the plain join (the oracle), so the "
    "skew escape hatch is itself correctness-gated.",
)
def q_salted_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.skew import salted_join

    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    joined = salted_join(
        li.select(F.col("l_partkey").alias("p_partkey"), "l_extendedprice"),
        part,
        on=["p_partkey"],
        salt_buckets=16,
    )
    return joined.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_items"),
        _xsum(F.col("l_extendedprice")).alias("gross"),
    )


@register(
    "training_corpus",
    """
    WITH wc AS (
      SELECT doc_id, source, text,
             COALESCE(len(list_filter(regexp_split_to_array(text, '\\s+'), y -> y <> '')), 0) AS n_words
      FROM documents WHERE source <> 'src0'
    ), tk AS (
      SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\\s+'), y -> y <> '') AS tk
      FROM documents WHERE source <> 'src0'
    ), bg AS (
      SELECT doc_id, tk[i] || ' ' || tk[i+1] AS g
      FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 1)) AS i
            FROM tk WHERE len(tk) >= 2)
    ), bgc AS (
      SELECT doc_id, g, count(*) AS cnt FROM bg GROUP BY doc_id, g
    ), rep AS (
      SELECT doc_id,
             CAST((10000 * (SUM(cnt) - count(*))) // SUM(cnt) AS BIGINT) AS dup2
      FROM bgc GROUP BY doc_id
    ), quality AS (
      SELECT w.doc_id, w.source, w.text, CAST(w.n_words AS BIGINT) AS n_words
      FROM wc w LEFT JOIN rep r ON w.doc_id = r.doc_id
      WHERE w.n_words >= 20 AND COALESCE(r.dup2, 0) <= 6000
    ), dedup AS (
      SELECT doc_id, source, text, n_words FROM (
        SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        FROM quality
      ) WHERE rn = 1
    ), ctk AS (
      SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\\s+'), y -> y <> '') AS t
      FROM dedup
    ), csh AS (
      SELECT DISTINCT doc_id,
             CASE WHEN len(t) >= 5
                  THEN t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4]
                  ELSE array_to_string(t, ' ') END AS g
      FROM (SELECT doc_id, t, unnest(generate_series(1, greatest(len(t) - 4, 1))) AS i FROM ctk)
    ), btk AS (
      SELECT list_filter(regexp_split_to_array(lower(text), '\\s+'), y -> y <> '') AS t
      FROM documents WHERE source = 'src0'
    ), bsh AS (
      SELECT DISTINCT
             CASE WHEN len(t) >= 5
                  THEN t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4]
                  ELSE array_to_string(t, ' ') END AS g
      FROM (SELECT t, unnest(generate_series(1, greatest(len(t) - 4, 1))) AS i FROM btk)
    ), hits AS (
      SELECT DISTINCT c.doc_id FROM csh c JOIN bsh b ON c.g = b.g
    ), clean AS (
      SELECT * FROM dedup WHERE doc_id NOT IN (SELECT doc_id FROM hits)
    ), cs AS (
      SELECT source, count(*) AS n FROM clean GROUP BY source
    ), sq AS (
      SELECT source, n, CAST(FLOOR(sqrt(CAST(n AS DOUBLE)) * 1000000) AS BIGINT) AS sfp FROM cs
    ), tt AS (
      SELECT CAST(SUM(sfp) AS BIGINT) AS tot FROM sq
    ), quota AS (
      SELECT source, LEAST(n, (150 * sfp) // tot) AS m FROM sq CROSS JOIN tt
    ), ranked AS (
      SELECT doc_id, source, n_words,
             row_number() OVER (PARTITION BY source
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rnk
      FROM clean
    )
    SELECT r.doc_id, r.source, r.n_words
    FROM ranked r JOIN quota q ON r.source = q.source
    WHERE r.rnk <= q.m
    """,
    doc="END-TO-END training-data preparation (plans/training_data.py): "
    "quality gate (length + repetition) → exact keep-first dedup → "
    "benchmark decontamination → √n temperature mixing, as ONE lazy plan "
    "with ONE DuckDB oracle — the whole pipeline is correctness-gated, "
    "not just its stages.",
)
def q_training_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.plans.training_data import prepare_training_corpus

    docs = _tp(spark, sf_dir, "documents")
    return prepare_training_corpus(
        docs.filter(F.col("source") != "src0"),
        docs.filter(F.col("source") == "src0"),
        min_words=20,
        max_dup2_frac_fp=6000,
        target_total=150,
    )


@register(
    "constraint_checks",
    """
    WITH base AS (
      SELECT CAST(count(*) AS BIGINT) AS n_rows,
             CAST(SUM(CASE WHEN NOT COALESCE(o_totalprice > 0, FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS positive_price,
             CAST(SUM(CASE WHEN NOT COALESCE(o_orderstatus IN ('O','F','P'), FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS valid_status,
             CAST(SUM(CASE WHEN NOT COALESCE(o_custkey IS NOT NULL, FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS custkey_not_null
      FROM orders
    ), dups AS (
      SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) AS n_violations
      FROM (SELECT count(*) AS c FROM orders GROUP BY o_orderkey HAVING count(*) > 1)
    )
    SELECT 'positive_price' AS rule, positive_price AS n_violations, n_rows FROM base
    UNION ALL
    SELECT 'valid_status', valid_status, n_rows FROM base
    UNION ALL
    SELECT 'custkey_not_null', custkey_not_null, n_rows FROM base
    UNION ALL
    SELECT 'unique_orderkey', d.n_violations, b.n_rows FROM dups d CROSS JOIN base b
    """,
    doc="Declarative constraint checking (operators/quality_checks.py): the "
    "lake-side replacement for the reference's Postgres DDL constraints — "
    "all CHECK rules fold into one scan, uniqueness is its own shuffle, "
    "output is one (rule, n_violations, n_rows) row per rule.",
)
def q_constraint_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.quality_checks import check_constraints

    orders = _t(spark, sf_dir, "orders")
    return check_constraints(
        orders,
        rules={
            "positive_price": F.col("o_totalprice") > 0,
            "valid_status": F.col("o_orderstatus").isin("O", "F", "P"),
            "custkey_not_null": F.col("o_custkey").isNotNull(),
        },
        unique_keys={"unique_orderkey": ["o_orderkey"]},
    )


