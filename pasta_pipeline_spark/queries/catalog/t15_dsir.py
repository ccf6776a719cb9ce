"""Catalog tier: DSIR importance resampling + r6 extension tier.

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
from pasta_pipeline_spark.queries.catalog._core import QuerySpec, REGISTRY, _t, _tp, register
from pasta_pipeline_spark.queries.catalog.t02_text_analysis import _LANG_ID_ORACLE

# ---------------------------------------------------------------------------
# DSIR importance-resampling data selection (extension §2.12, r6)
# ---------------------------------------------------------------------------


def _dsir_oracle() -> str:
    from pasta_pipeline_spark.operators.dsir import dsir_oracle_sql

    return dsir_oracle_sql(
        target_where="source IN ('src0', 'src1', 'src2', 'src3')", k=100
    )


@register(
    "dsir_selection",
    None,  # generated below — single source of truth in operators/dsir.py
    doc="DSIR data selection (operators/dsir.py, Xie et al. arXiv:"
    "2302.03169): hashed bag-of-words importance weights — add-one-"
    "smoothed bucket multinomials fit on a target slice vs the raw "
    "corpus, per-doc log-likelihood ratio in fixed-point ln (order-"
    "free int64), deterministic top-k (zero-temperature resampling). "
    "Model state is m=4096 buckets regardless of corpus size; the "
    "only fact-scale shuffle is the per-doc aggregation; global top-k "
    "via TakeOrderedAndProject. Oracle generated from the same "
    "constants (playbook #11). No reference analog — public "
    "literature.",
)
def q_dsir_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.dsir import dsir_select

    docs = _tp(spark, sf_dir, "documents")
    return dsir_select(
        docs, F.col("source").isin("src0", "src1", "src2", "src3"), k=100
    )


REGISTRY["dsir_selection"] = QuerySpec(
    spark_fn=REGISTRY["dsir_selection"].spark_fn,
    oracle=_dsir_oracle(),
    doc=REGISTRY["dsir_selection"].doc,
)


def _greedy_pack_oracle() -> str:
    from pasta_pipeline_spark.operators.sampling import greedy_pack_oracle_sql

    return greedy_pack_oracle_sql(
        table="documents",
        id_col="doc_id",
        size_sql="len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> ''))",
        budget=256,
        group_col="source",
    )


@register(
    "greedy_pack",
    None,  # generated below — single source of truth in operators/sampling.py
    doc="NO-SPLIT greedy sequence packing (operators/sampling.py "
    "greedy_pack; Ding et al. arXiv:2404.10830 motivation): documents "
    "packed whole into 256-token context windows per source shard, "
    "next-fit with reset — a cumulative sum WITH RESET, the textbook "
    "not-window-expressible recurrence, run as ONE sanctioned Arrow "
    "applyInPandas per shard (state = one (fill,pack) pair) and "
    "replayed exactly by a per-group recursive CTE in the oracle. "
    "Oversize docs isolate; empty docs occupy zero width.",
)
def q_greedy_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.functions.text import tokenize_ws
    from pasta_pipeline_spark.operators.sampling import greedy_pack

    docs = _t(spark, sf_dir, "documents").withColumn(
        "__n_tok", F.size(tokenize_ws(F.col("text")))
    )
    return greedy_pack(docs, "doc_id", "__n_tok", budget=256, group_col="source")


REGISTRY["greedy_pack"] = QuerySpec(
    spark_fn=REGISTRY["greedy_pack"].spark_fn,
    oracle=_greedy_pack_oracle(),
    doc=REGISTRY["greedy_pack"].doc,
)


@register(
    "perplexity_buckets",
    """
    WITH tok AS (
      SELECT doc_id,
             unnest(list_transform(
               list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> ''),
               x -> lower(x))) AS token
      FROM documents WHERE text IS NOT NULL
    ), c AS (
      SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY token
    ), tt AS (
      SELECT CAST(SUM(cnt) AS BIGINT) AS T FROM c
    ), pd AS (
      SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(SUM(CAST(FLOOR(ln(CAST(c.cnt AS DOUBLE)) * 1000000000) AS BIGINT)) AS BIGINT) AS s
      FROM tok t JOIN c USING (token) GROUP BY t.doc_id
    ), nll AS (
      SELECT doc_id, n_tokens,
             CAST((n_tokens * CAST(FLOOR(ln(CAST(T AS DOUBLE)) * 1000000000) AS BIGINT) - s)
                  // n_tokens AS BIGINT) AS nll_fp
      FROM pd CROSS JOIN tt
    )
    SELECT d.doc_id, d.lang, n.n_tokens, n.nll_fp,
           CASE ntile(3) OVER (PARTITION BY d.lang ORDER BY n.nll_fp ASC, d.doc_id ASC)
                WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
    FROM documents d JOIN nll n USING (doc_id)
    """,
    doc="CCNet perplexity tiering (operators/text_analysis.py "
    "perplexity_buckets; Wenzek et al. arXiv:1911.00359): per-language "
    "head/middle/tail thirds by the corpus-fit unigram LM score — "
    "ntile(3) over a TOTAL order (nll_fp, doc_id) so the cut is "
    "deterministic and engine-identical; one per-language window "
    "shuffle, no global sort.",
)
def q_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.text_analysis import perplexity_buckets

    return perplexity_buckets(_tp(spark, sf_dir, "documents"))


def _curation_funnel_oracle() -> str:
    from pasta_pipeline_spark.operators.quality_filters import curation_funnel_sql

    return curation_funnel_sql()


@register(
    "curation_funnel",
    None,  # generated below — single source of truth in operators/quality_filters.py
    doc="Curation-funnel attrition report (operators/quality_filters.py "
    "curation_funnel): the FineWeb/RefinedWeb-style ablation table — "
    "per stage (non_empty -> Gopher word bounds -> full Gopher "
    "conjunction -> exact-dup survivor) documents in / out / dropped, "
    "as CUMULATIVE conjunctions so the report reads as the pipeline "
    "executes. One scan + one conditional aggregate; 4-row metadata "
    "output inlined from the scalar row; oracle generated from the "
    "same gopher SQL builder.",
)
def q_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.quality_filters import curation_funnel

    return curation_funnel(_tp(spark, sf_dir, "documents"))


REGISTRY["curation_funnel"] = QuerySpec(
    spark_fn=REGISTRY["curation_funnel"].spark_fn,
    oracle=_curation_funnel_oracle(),
    doc=REGISTRY["curation_funnel"].doc,
)


def _ks_drift_oracle() -> str:
    from pasta_pipeline_spark.operators.divergence import ks_drift_oracle_sql

    return ks_drift_oracle_sql(
        table="documents",
        value_sql="n_chars",
        group_a_where="source IN ('src0','src1','src2','src3','src4',"
        "'src5','src6','src7','src8','src9')",
    )


@register(
    "length_drift_ks",
    None,  # generated below — single source of truth in operators/divergence.py
    doc="EXACT two-sample Kolmogorov-Smirnov drift statistic "
    "(operators/divergence.py ks_drift): did the document-length "
    "distribution move between two corpus slices? Sup-distance "
    "evaluated at observed values with CROSS-MULTIPLIED integer "
    "ECDFs (|ca*n_b - cb*n_a| — no doubles to diverge), smallest "
    "argmax as deterministic tie-break, ks_fp in basis points via "
    "integer div. Cumulative window runs over the DISTINCT-value "
    "frame only (metadata scale), never the fact table.",
)
def q_length_drift_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.divergence import ks_drift

    docs = _t(spark, sf_dir, "documents")
    pred = F.col("source").isin(*[f"src{i}" for i in range(10)])
    return ks_drift(docs, "n_chars", pred)


REGISTRY["length_drift_ks"] = QuerySpec(
    spark_fn=REGISTRY["length_drift_ks"].spark_fn,
    oracle=_ks_drift_oracle(),
    doc=REGISTRY["length_drift_ks"].doc,
)


@register(
    "balanced_label_sample",
    """
    WITH counts AS (
      SELECT label, CAST(count(*) AS BIGINT) AS c FROM embeddings GROUP BY label
    ), floor_row AS (
      SELECT CAST(MIN(c) AS BIGINT) AS m FROM counts
    ), ranked AS (
      SELECT vec_id, label,
             CAST(row_number() OVER (
               PARTITION BY label
               ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC
             ) AS BIGINT) AS rk
      FROM embeddings
    )
    SELECT vec_id, label, rk
    FROM ranked CROSS JOIN floor_row
    WHERE rk <= m
    """,
    doc="Class-balanced downsampling (operators/sampling.py "
    "balanced_label_sample): every label keeps exactly min(class "
    "count) rows, survivors chosen in md5-shuffled order (id "
    "tiebreak) so the take is deterministic, engine-identical, and "
    "uncorrelated with data columns. Min count is a 1-row broadcast "
    "scalar; one per-label rank window is the only fact shuffle.",
)
def q_balanced_label_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.sampling import balanced_label_sample

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "label")
    return balanced_label_sample(emb, "vec_id", "label").select(
        "vec_id", "label", "rk"
    )


def _pack_efficiency_oracle() -> str:
    from pasta_pipeline_spark.operators.sampling import greedy_pack_oracle_sql

    inner = greedy_pack_oracle_sql(
        table="documents",
        id_col="doc_id",
        size_sql="len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> ''))",
        budget=256,
        group_col="source",
    )
    return f"""
    WITH packed_out AS ({inner}),
    per_pack AS (
      SELECT source, pack_id,
             CAST(SUM(n_units) AS BIGINT) AS pack_units,
             CAST(count(*) AS BIGINT) AS n_docs
      FROM packed_out GROUP BY source, pack_id
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_packs,
           CAST(SUM(n_docs) AS BIGINT) AS n_docs,
           CAST(SUM(pack_units) AS BIGINT) AS total_units,
           CAST(SUM(CASE WHEN pack_units < 256 THEN 256 - pack_units ELSE 0 END) AS BIGINT) AS padding_units,
           CAST(SUM(CASE WHEN pack_units > 256 THEN 1 ELSE 0 END) AS BIGINT) AS n_oversize,
           CAST(SUM(pack_units) * 10000 // (count(*) * 256) AS BIGINT) AS efficiency_bp
    FROM per_pack GROUP BY source
    """


@register(
    "pack_efficiency",
    None,  # generated below — single source of truth in operators/sampling.py
    doc="Packing-efficiency report over greedy_pack output (the metric "
    "Ding et al. 2404.10830 grade packing on): per source shard, "
    "packs / docs / payload units / padding waste / oversize count "
    "and occupancy in basis points — integer arithmetic end-to-end "
    "on top of the same Arrow packing stage and recursive-CTE oracle.",
)
def q_pack_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.functions.text import tokenize_ws
    from pasta_pipeline_spark.operators.sampling import greedy_pack

    docs = _t(spark, sf_dir, "documents").withColumn(
        "__n_tok", F.size(tokenize_ws(F.col("text")))
    )
    packed = greedy_pack(docs, "doc_id", "__n_tok", budget=256, group_col="source")
    per_pack = packed.groupBy("source", "pack_id").agg(
        F.sum("n_units").cast("long").alias("pack_units"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
    )
    return per_pack.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_packs"),
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.sum("pack_units").cast("long").alias("total_units"),
        F.sum(F.when(F.col("pack_units") < 256, 256 - F.col("pack_units")).otherwise(0))
        .cast("long")
        .alias("padding_units"),
        F.sum(F.when(F.col("pack_units") > 256, 1).otherwise(0))
        .cast("long")
        .alias("n_oversize"),
        F.expr("CAST(SUM(pack_units) * 10000 div (count(1) * 256) AS BIGINT)").alias(
            "efficiency_bp"
        ),
    )


REGISTRY["pack_efficiency"] = QuerySpec(
    spark_fn=REGISTRY["pack_efficiency"].spark_fn,
    oracle=_pack_efficiency_oracle(),
    doc=REGISTRY["pack_efficiency"].doc,
)


def _jl_projection_oracle() -> str:
    from pasta_pipeline_spark.operators.similarity import jl_project_oracle_sql

    return jl_project_oracle_sql("embeddings", "vec_id", "embedding")


@register(
    "jl_projection",
    None,  # generated below — single source of truth in operators/similarity.py
    doc="Johnson-Lindenstrauss sign projection (operators/similarity.py "
    "jl_project; Achlioptas 2003 Rademacher form): 64-dim embeddings "
    "to 16 int64 components via an md5-derived plan-literal +-1 "
    "matrix — the cheap dim-reduction tier in front of ANN and "
    "clustering. PURE per-row expressions: no shuffle, no join, no "
    "UDF; fixed-point floor keeps both engines bit-identical; oracle "
    "generated from the same sign matrix.",
)
def q_jl_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.similarity import jl_project

    emb = _tp(spark, sf_dir, "embeddings")
    return jl_project(emb, "vec_id", "embedding")


REGISTRY["jl_projection"] = QuerySpec(
    spark_fn=REGISTRY["jl_projection"].spark_fn,
    oracle=_jl_projection_oracle(),
    doc=REGISTRY["jl_projection"].doc,
)


def _bm25_oracle() -> str:
    from pasta_pipeline_spark.operators.search import bm25_oracle_sql

    return bm25_oracle_sql(["spark", "join", "window"], k=10)


@register(
    "bm25_topk",
    None,  # generated below — single source of truth in operators/search.py
    doc="Okapi BM25 top-k retrieval (operators/search.py bm25_topk; "
    "Robertson & Zaragoza 2009): the production keyword-search "
    "scoring function as one declarative plan — query-term posting "
    "lists are the only fact rows shuffled, doc-frequency and corpus "
    "totals ride in as broadcasts, per-term contributions FLOOR to "
    "int64 before the per-doc sum (order-free, hash-exact; shared "
    "formula string renders into both engines), global top-k via "
    "TakeOrderedAndProject.",
)
def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.search import bm25_topk

    docs = _tp(spark, sf_dir, "documents")
    return bm25_topk(docs, ["spark", "join", "window"], k=10)


REGISTRY["bm25_topk"] = QuerySpec(
    spark_fn=REGISTRY["bm25_topk"].spark_fn,
    oracle=_bm25_oracle(),
    doc=REGISTRY["bm25_topk"].doc,
)


def _phrase_search_oracle() -> str:
    from pasta_pipeline_spark.operators.search import phrase_search_oracle_sql

    return phrase_search_oracle_sql(["window", "data"])


@register(
    "phrase_search",
    None,  # generated below — single source of truth in operators/search.py
    doc="Exact positional phrase search (operators/search.py "
    "phrase_search): consecutive in-order term matching via set-based "
    "slot alignment — every occurrence rebases to its would-be phrase "
    "start and an occurrence exists where all distinct slots check in "
    "(duplicate-term phrases handled). One posexplode scan filtered "
    "to the phrase's posting lists; plan size independent of phrase "
    "length.",
)
def q_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.search import phrase_search

    docs = _tp(spark, sf_dir, "documents")
    return phrase_search(docs, ["window", "data"])


REGISTRY["phrase_search"] = QuerySpec(
    spark_fn=REGISTRY["phrase_search"].spark_fn,
    oracle=_phrase_search_oracle(),
    doc=REGISTRY["phrase_search"].doc,
)


@register(
    "event_cusum",
    """
    WITH pb AS (
      -- NB: cast to BIGINT BEFORE the //: DuckDB's // on a DOUBLE is
      -- plain division (not floor div) and the outer CAST would ROUND
      SELECT event_type, CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400 AS bucket,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ), kf AS (
      SELECT event_type, bucket, x,
             CAST((SUM(x) OVER (PARTITION BY event_type) * 10000)
                  // COUNT(x) OVER (PARTITION BY event_type) AS BIGINT) AS k_fp
      FROM pb
    ), cum AS (
      SELECT event_type, bucket,
             CAST(SUM(x * 10000 - k_fp) OVER (PARTITION BY event_type
                  ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c_fp
      FROM kf
    ), s AS (
      SELECT event_type, bucket,
             CAST(c_fp - least(MIN(c_fp) OVER (PARTITION BY event_type
                  ORDER BY bucket ROWS UNBOUNDED PRECEDING), 0) AS BIGINT) AS s_fp
      FROM cum
    ), peak AS (
      SELECT event_type, CAST(MAX(s_fp) AS BIGINT) AS s_max_fp,
             CAST(count(*) AS BIGINT) AS n_buckets
      FROM s GROUP BY event_type
    )
    SELECT s.event_type, n_buckets, s_max_fp,
           CAST(MIN(bucket) AS BIGINT) AS bucket_at_max
    FROM s JOIN peak ON s.event_type = peak.event_type AND s.s_fp = peak.s_max_fp
    GROUP BY s.event_type, n_buckets, s_max_fp
    """,
    doc="CUSUM drift chart over daily event volumes (operators/"
    "anomaly.py cusum_drift; Page 1954): the upward-drift detector an "
    "ingest monitor runs per event type. The max(0, S+y) recurrence "
    "is evaluated in CLOSED FORM — running cumsum minus running min — "
    "so two stacked windows replace what looks like a sequential "
    "reset; allowance defaults to the per-group mean in fixed point; "
    "pure int64 end-to-end. Windows partition by event type over "
    "bucket-scale series.",
)
def q_event_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.anomaly import cusum_drift

    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.expr("CAST(ts AS LONG) div 86400").cast("long").alias("day"),
        F.lit(1).cast("long").alias("one"),
    )
    return cusum_drift(ev, "day", "one", ["event_type"])


@register(
    "kwic_snippets",
    """
    WITH toks AS (
      SELECT doc_id,
             list_transform(
               list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> ''),
               x -> lower(x)) AS t
      FROM documents WHERE text IS NOT NULL
    ), posed AS (
      SELECT doc_id, unnest(generate_series(1, len(t))) AS pos, t FROM toks
    ), terms AS (
      SELECT doc_id, pos, t[pos] AS term FROM posed
    ), slotted AS (
      SELECT doc_id, pos,
             unnest(list_filter([CASE WHEN term = 'window' THEN 0 END,
                                 CASE WHEN term = 'data' THEN 1 END],
                                x -> x IS NOT NULL)) AS i
      FROM terms WHERE term IN ('window', 'data')
    ), m AS (
      SELECT doc_id, pos - i AS start, i FROM slotted WHERE pos - i >= 1
    ), occ AS (
      SELECT doc_id, start FROM m
      GROUP BY doc_id, start HAVING count(DISTINCT i) = 2
    ), hits AS (
      SELECT doc_id, CAST(MIN(start) AS BIGINT) AS first_pos FROM occ GROUP BY doc_id
    )
    SELECT h.doc_id, h.first_pos,
           array_to_string(
             list_slice(tk.t, greatest(h.first_pos - 3, 1), h.first_pos + 3),
             ' ') AS snippet
    FROM hits h JOIN toks tk USING (doc_id)
    """,
    doc="Keyword-in-context snippets (operators/search.py "
    "kwic_snippets) over phrase_search hits for 'window data': the "
    "search results page as an operator — hits (small side) broadcast "
    "back onto the corpus, token-window slice with a greatest() clamp "
    "(Spark slice throws on start<=0), space-join. NOTE the snippet "
    "is over the LOWERCASED token stream (the index's view).",
)
def q_kwic_snippets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.functions.text import tokenize_ws
    from pasta_pipeline_spark.operators.search import kwic_snippets, phrase_search

    docs = _tp(spark, sf_dir, "documents")
    hits = phrase_search(docs, ["window", "data"])
    lowered = docs.select("doc_id", F.array_join(tokenize_ws(F.col("text")), " ").alias("text"))
    return kwic_snippets(lowered, hits)


@register(
    "media_flac_samples",
    """
    WITH ids AS (
      SELECT doc_id AS media_id,
             32 + (doc_id % 5) * 8 AS n,
             doc_id % 3 AS v
      FROM documents
    ), const AS (
      SELECT media_id, n, (media_id % 3001) - 1500 AS c FROM ids WHERE v = 0
    ), samp AS (
      SELECT media_id, n, unnest(generate_series(0, n - 1)) AS i
      FROM ids WHERE v <> 0
    ), vals AS (
      SELECT media_id, n, (media_id * 31 + i * 17) % 4001 - 2000 AS s FROM samp
    ), varying AS (
      SELECT media_id, n, SUM(s) AS ssum, MIN(s) AS smin, MAX(s) AS smax
      FROM vals GROUP BY media_id, n
    )
    SELECT media_id, CAST(n AS BIGINT) AS n_samples,
           CAST(8000 AS BIGINT) AS sample_rate,
           CAST(n * c AS BIGINT) AS sample_sum,
           CAST(c AS BIGINT) AS sample_min, CAST(c AS BIGINT) AS sample_max
    FROM const
    UNION ALL
    SELECT media_id, CAST(n AS BIGINT), CAST(8000 AS BIGINT),
           CAST(ssum AS BIGINT), CAST(smin AS BIGINT), CAST(smax AS BIGINT)
    FROM varying
    """,
    doc="FULL FLAC sample decode (multimodal.decode_audio_samples / "
    "decode_flac_samples, RFC 9639): complete valid one-frame FLAC "
    "streams — CONSTANT, VERBATIM and Rice-coded FIXED-order-1 "
    "subframes cycling by id, real CRC-8 header and CRC-16 frame "
    "checksums VERIFIED during decode — synthesized from the doc_id "
    "recipe; the oracle computes the same decoded sample sums/extrema "
    "from the closed form without touching a byte, so any Rice, "
    "prediction, bit-order or CRC bug hash-mismatches. Extends the "
    "from-spec entropy-coder family (DEFLATE, LZW, T.81 Huffman) to "
    "compressed audio.",
)
def q_media_flac_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.multimodal import (
        decode_audio_samples,
        synthesize_media,
    )

    docs = _tp(spark, sf_dir, "documents")
    media = synthesize_media(
        docs.select(F.col("doc_id").alias("media_id")), variant="flac_full"
    )
    return decode_audio_samples(media)


@register(
    "image_dhash_pairs",
    """
    WITH ids AS (
      SELECT doc_id AS media_id,
             4 + doc_id % 12 AS w,
             4 + (doc_id // 3) % 10 AS h
      FROM documents
    ), comp AS (
      SELECT media_id, w, h,
             unnest(generate_series(0, least((w - 1) * h, 60) - 1)) AS i
      FROM ids
    ), pos AS (
      SELECT media_id, w, h, i, i % (w - 1) AS x, i // (w - 1) AS y
      FROM comp
    ), bits AS (
      SELECT media_id, w, h, i,
             CASE WHEN
               299 * ((media_id * 7 + y * 31 + x * 13) % 256)
               + 587 * ((media_id * 7 + y * 31 + x * 13 + 5) % 256)
               + 114 * ((media_id * 7 + y * 31 + x * 13 + 10) % 256)
               >
               299 * ((media_id * 7 + y * 31 + (x + 1) * 13) % 256)
               + 587 * ((media_id * 7 + y * 31 + (x + 1) * 13 + 5) % 256)
               + 114 * ((media_id * 7 + y * 31 + (x + 1) * 13 + 10) % 256)
             THEN 1 ELSE 0 END AS bit
      FROM pos
    ), hashes AS (
      SELECT media_id, w, h,
             CAST(SUM(bit * (CAST(1 AS BIGINT) << i)) AS BIGINT) AS dhash
      FROM bits GROUP BY media_id, w, h
    )
    SELECT a.media_id AS id_a, b.media_id AS id_b,
           CAST(bit_count(xor(a.dhash, b.dhash)) AS BIGINT) AS hamming
    FROM hashes a
    JOIN hashes b ON a.w = b.w AND a.h = b.h AND a.media_id < b.media_id
    WHERE bit_count(xor(a.dhash, b.dhash)) <= 5
    """,
    doc="Image near-duplicate pairs by perceptual dHash over REAL "
    "decoded pixels (multimodal.image_dhash / image_dhash_pairs): "
    "complete PNGs decode through DEFLATE + all five filters, the "
    "60-bit difference hash compares adjacent luma at native "
    "resolution, and pairs come from 6x10-bit BANDED equi-joins "
    "(pigeonhole: Hamming<=5 forces a shared band) with exact "
    "bit_count verify — the simhash discipline applied to pixels; "
    "no all-pairs join at any scale. The oracle computes every hash "
    "from the pixel-recipe closed form, so a decode bug anywhere in "
    "the inflate/filter cascade flips bits and hash-mismatches.",
)
def q_image_dhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.multimodal import (
        image_dhash,
        image_dhash_pairs,
        synthesize_media,
    )

    docs = _tp(spark, sf_dir, "documents")
    media = synthesize_media(
        docs.select(F.col("doc_id").alias("media_id")), variant="png_full"
    )
    return image_dhash_pairs(image_dhash(media))


@register(
    "video_scene_cuts",
    """
    WITH ids AS (
      SELECT doc_id AS media_id,
             16 + (doc_id % 8) * 2 AS w,
             16 + ((doc_id // 7) % 8) * 2 AS h,
             3 + doc_id % 12 AS n_frames
      FROM documents
    ), trans AS (
      SELECT media_id, w, h, w * h AS npx,
             unnest(generate_series(1, n_frames - 1)) AS f
      FROM ids
    ), px AS (
      SELECT media_id, f, npx,
             unnest(generate_series(0, npx - 1)) AS i
      FROM trans
    ), diffs AS (
      SELECT media_id, f, npx,
             abs((i * 13 + media_id + f * 31) % 256
                 - (i * 13 + media_id + (f - 1) * 31) % 256) AS d
      FROM px
    )
    SELECT media_id, CAST(f AS BIGINT) AS frame_idx,
           CAST(npx AS BIGINT) AS n_pixels,
           CAST(SUM(d) AS BIGINT) AS sad,
           (SUM(d) > 55 * npx) AS is_cut
    FROM diffs GROUP BY media_id, f, npx
    """,
    doc="Shot-boundary detection over REAL decoded video frames "
    "(multimodal.video_scene_cuts): consecutive Y4M luma planes "
    "compared by SAD — the standard scene-cut metric a frame-sampling "
    "pipeline thresholds — flagged at 55/pixel in pure integers. "
    "Pixel-scale input reduces to a frames-scale cut list inside the "
    "Arrow stage, so the operator runs where the bytes are and ships "
    "almost nothing. The oracle recomputes every SAD from the luma "
    "recipe closed form (per-pixel mod-256 wraparound included).",
)
def q_video_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.multimodal import (
        synthesize_media,
        video_scene_cuts,
    )

    docs = _tp(spark, sf_dir, "documents")
    media = synthesize_media(
        docs.select(F.col("doc_id").alias("media_id")), variant="video"
    )
    return video_scene_cuts(media)


def _winnowing_oracle() -> str:
    from pasta_pipeline_spark.operators.text_dedup import winnowing_oracle_sql

    return winnowing_oracle_sql()


@register(
    "winnowing_pairs",
    None,  # generated below — single source of truth in operators/text_dedup.py
    doc="Winnowing fingerprint near-dup pairs (operators/text_dedup.py "
    "winnowing_pairs; Schleimer/Wilkerson/Aiken SIGMOD 2003 — the "
    "MOSS algorithm): per-window minimum k-gram hash with rightmost "
    "tie-break selected via a plain int64 argmin encoding (no "
    "structs), giving the winnowing guarantee — any shared substring "
    "of w+k-1 tokens shares a fingerprint — at ~2/(w+1) selection "
    "density. Hot fingerprints capped before the equi-join (no "
    "quadratic boilerplate blowup).",
)
def q_winnowing_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.text_dedup import winnowing_pairs

    docs = _tp(spark, sf_dir, "documents")
    return winnowing_pairs(docs)


REGISTRY["winnowing_pairs"] = QuerySpec(
    spark_fn=REGISTRY["winnowing_pairs"].spark_fn,
    oracle=_winnowing_oracle(),
    doc=REGISTRY["winnowing_pairs"].doc,
)


@register(
    "audio_fingerprint_pairs",
    """
    WITH ids AS (
      SELECT doc_id AS media_id, 32 + (doc_id % 5) * 8 AS n, doc_id % 3 AS v
      FROM documents
    ), bits AS (
      SELECT media_id, n, unnest(generate_series(0, least(n - 1, 60) - 1)) AS i
      FROM ids WHERE v <> 0
    ), vals AS (
      SELECT media_id, n, i,
             CASE WHEN (media_id * 31 + (i + 1) * 17) % 4001
                       > (media_id * 31 + i * 17) % 4001
                  THEN 1 ELSE 0 END AS bit
      FROM bits
    ), hashes AS (
      SELECT media_id, n,
             CAST(SUM(bit * (CAST(1 AS BIGINT) << i)) AS BIGINT) AS afp
      FROM vals GROUP BY media_id, n
      UNION ALL
      SELECT media_id, n, CAST(0 AS BIGINT) FROM ids WHERE v = 0
    )
    SELECT a.media_id AS id_a, b.media_id AS id_b,
           CAST(bit_count(xor(a.afp, b.afp)) AS BIGINT) AS hamming
    FROM hashes a JOIN hashes b ON a.n = b.n AND a.media_id < b.media_id
    WHERE bit_count(xor(a.afp, b.afp)) <= 5
    """,
    doc="Audio near-duplicate pairs over FULLY DECODED FLAC "
    "(multimodal.audio_fingerprint / audio_fingerprint_pairs): the "
    "Rice/prediction/CRC cascade reconstructs the waveform, a "
    "delta-sign signature (gain- and DC-invariant) summarizes it, and "
    "pairs come from the shared banded-Hamming LSH "
    "(banded_hamming_pairs — pigeonhole equi-joins, exact bit_count "
    "verify). With this the near-dup ladder covers text, images and "
    "audio under one discipline. Oracle replays fingerprints from the "
    "sample recipe closed form — a decode bug anywhere flips bits.",
)
def q_audio_fingerprint_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.multimodal import (
        audio_fingerprint,
        audio_fingerprint_pairs,
        synthesize_media,
    )

    docs = _tp(spark, sf_dir, "documents")
    media = synthesize_media(
        docs.select(F.col("doc_id").alias("media_id")), variant="flac_full"
    )
    return audio_fingerprint_pairs(audio_fingerprint(media))


@register(
    "media_dedup_survivors",
    """
    WITH RECURSIVE ids AS (
      SELECT doc_id AS media_id,
             4 + doc_id % 12 AS w,
             4 + (doc_id // 3) % 10 AS h
      FROM documents
    ), comp AS (
      SELECT media_id, w, h,
             unnest(generate_series(0, least((w - 1) * h, 60) - 1)) AS i
      FROM ids
    ), pos AS (
      SELECT media_id, w, h, i, i % (w - 1) AS x, i // (w - 1) AS y FROM comp
    ), bits AS (
      SELECT media_id, w, h, i,
             CASE WHEN
               299 * ((media_id * 7 + y * 31 + x * 13) % 256)
               + 587 * ((media_id * 7 + y * 31 + x * 13 + 5) % 256)
               + 114 * ((media_id * 7 + y * 31 + x * 13 + 10) % 256)
               >
               299 * ((media_id * 7 + y * 31 + (x + 1) * 13) % 256)
               + 587 * ((media_id * 7 + y * 31 + (x + 1) * 13 + 5) % 256)
               + 114 * ((media_id * 7 + y * 31 + (x + 1) * 13 + 10) % 256)
             THEN 1 ELSE 0 END AS bit
      FROM pos
    ), hashes AS (
      SELECT media_id, w, h,
             CAST(SUM(bit * (CAST(1 AS BIGINT) << i)) AS BIGINT) AS dhash
      FROM bits GROUP BY media_id, w, h
    ), pairs AS (
      SELECT a.media_id AS doc_a, b.media_id AS doc_b
      FROM hashes a JOIN hashes b
        ON a.w = b.w AND a.h = b.h AND a.media_id < b.media_id
      WHERE bit_count(xor(a.dhash, b.dhash)) <= 5
    ), edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM pairs
    ), cc(node, lbl) AS (
      SELECT media_id, media_id FROM hashes
      UNION
      SELECT e.dst, c.lbl FROM cc c JOIN edges e ON c.node = e.src
    )
    SELECT node AS media_id, CAST(min(lbl) AS BIGINT) AS cluster_id,
           (node = min(lbl)) AS is_survivor
    FROM cc GROUP BY node
    """,
    doc="Multimodal dedup CAPSTONE: complete PNGs decode through the "
    "real DEFLATE + filter cascade, perceptual dHash pairs feed the "
    "SAME min-label connected-components operator the text ladder "
    "uses (duplicate_clusters), and every image lands in a cluster "
    "with its smallest-id survivor — image near-dup dedup end-to-end "
    "under one full-hash oracle (closed-form hashes + recursive-CTE "
    "transitive closure).",
)
def q_media_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.multimodal import (
        hash_cluster_edges,
        image_dhash,
        synthesize_media,
    )
    from pasta_pipeline_spark.operators.text_dedup import duplicate_clusters

    docs = _tp(spark, sf_dir, "documents")
    media = synthesize_media(
        docs.select(F.col("doc_id").alias("media_id")), variant="png_full"
    )
    hashes = image_dhash(media)
    # CC-equivalent reduced edges (r12): identical-dHash groups
    # collapse to stars + banded hamming over DISTINCT hashes only —
    # the full pair frame went quadratic when the sf10 fixture's hash
    # diversity saturated (998 distinct hashes over 500k rows =
    # 368.6M same-hash pairs); components and min-id survivors are
    # identical by the clique->star reduction, so the oracle (which
    # closes over the full pair graph) is untouched
    pairs = hash_cluster_edges(
        hashes, ["width", "height"], "dhash", "media_id"
    ).select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"))
    # image near-dup components can chain (same-geometry template
    # families), and the ladder runs this at sf0.1 inside a long-lived
    # session — truncate fixpoint lineage so the plan never compounds
    clusters = duplicate_clusters(
        hashes.select(F.col("media_id").alias("doc_id")), pairs,
        checkpoint_every=2, doubling=True,
    )
    return clusters.select(
        F.col("doc_id").alias("media_id"),
        F.col("cluster_id").cast("long").alias("cluster_id"),
        "is_survivor",
    )


def _pretrain_pipeline_oracle() -> str:
    from pasta_pipeline_spark.operators.dsir import dsir_oracle_sql
    from pasta_pipeline_spark.operators.quality_filters import gopher_rules_sql
    from pasta_pipeline_spark.operators.sampling import greedy_pack_oracle_sql

    dsir_sub = dsir_oracle_sql(
        target_where="source IN ('src0', 'src1', 'src2', 'src3')",
        k=100,
        table="kept",
    )
    pack_sub = greedy_pack_oracle_sql(
        table="sized",
        id_col="doc_id",
        size_sql="len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> ''))",
        budget=256,
        group_col="source",
    )
    return f"""
    WITH g AS ({gopher_rules_sql()}),
    surv AS (
      SELECT doc_id,
             (row_number() OVER (PARTITION BY md5(text)
                                 ORDER BY doc_id ASC) = 1) AS sv
      FROM documents
    ),
    kept AS (
      SELECT d.* FROM documents d
      JOIN g USING (doc_id) JOIN surv USING (doc_id)
      WHERE g.pass_all AND surv.sv
    ),
    selected AS (SELECT * FROM ({dsir_sub})),
    sized AS (
      SELECT d.source, d.doc_id, d.text
      FROM kept d JOIN selected USING (doc_id)
    ),
    packed AS (SELECT * FROM ({pack_sub}))
    SELECT p.source, p.doc_id, p.n_units, p.pack_id, p.offset_in_pack,
           s.weight_fp
    FROM packed p JOIN selected s USING (doc_id)
    """


@register(
    "pretrain_pipeline",
    None,  # generated below — composed from the stage generators
    doc="Pretraining data-path CAPSTONE: the four stages a real corpus "
    "runs in order — Gopher quality gate, exact-dup keep-first "
    "survivorship, DSIR target-likeness selection (top 100), and "
    "NO-SPLIT greedy packing into 256-token windows per source — as "
    "ONE composed plan under ONE full-hash oracle (the stage oracle "
    "GENERATORS nest as CTE subqueries, so the composed contract "
    "cannot drift from the per-stage ones). Output: each selected "
    "document's pack assignment plus its selection weight.",
)
def q_pretrain_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from pasta_pipeline_spark.functions.text import tokenize_ws
    from pasta_pipeline_spark.operators.dsir import dsir_select
    from pasta_pipeline_spark.operators.quality_filters import gopher_rules
    from pasta_pipeline_spark.operators.sampling import greedy_pack

    docs = _tp(spark, sf_dir, "documents")
    g = gopher_rules(docs).select("doc_id", "pass_all")
    w = Window.partitionBy(F.md5(F.col("text").cast("binary"))).orderBy(
        F.asc("doc_id")
    )
    kept = (
        docs.withColumn("__sv", F.row_number().over(w) == 1)
        .join(g, "doc_id")
        .where(F.col("pass_all") & F.col("__sv"))
        .drop("pass_all", "__sv")
    )
    selected = dsir_select(
        kept, F.col("source").isin("src0", "src1", "src2", "src3"), k=100
    )
    sized = (
        kept.join(selected.select("doc_id"), "doc_id")
        .select(
            "source", "doc_id", F.size(tokenize_ws(F.col("text"))).alias("__n_tok")
        )
    )
    packed = greedy_pack(sized, "doc_id", "__n_tok", budget=256, group_col="source")
    return packed.join(selected.select("doc_id", "weight_fp"), "doc_id").select(
        "source", "doc_id", "n_units", "pack_id", "offset_in_pack", "weight_fp"
    )


REGISTRY["pretrain_pipeline"] = QuerySpec(
    spark_fn=REGISTRY["pretrain_pipeline"].spark_fn,
    oracle=_pretrain_pipeline_oracle(),
    doc=REGISTRY["pretrain_pipeline"].doc,
)


@register(
    "license_scan",
    """
    WITH headed AS (
      SELECT doc_id,
             CASE doc_id % 5
               WHEN 0 THEN 'SPDX-License-Identifier: MIT' || chr(10) || text
               WHEN 1 THEN '// Licensed under the Apache License, Version 2.0' || chr(10) || text
               WHEN 2 THEN '# This program is free software: GNU General Public License v3' || chr(10) || text
               WHEN 3 THEN 'Copyright (c) 2024 Example Corp. All rights reserved.' || chr(10) || text
               ELSE text
             END AS text
      FROM documents
    ), flags AS (
      SELECT doc_id,
             regexp_extract(text, 'SPDX-License-Identifier: *([A-Za-z0-9.+-]+)', 1) AS spdx,
             regexp_matches(text, 'Apache License') AS apache,
             regexp_matches(text, 'General Public License|GPL') AS gpl,
             regexp_matches(text, '(?i)all rights reserved') AS arr
      FROM headed
    )
    SELECT doc_id,
           CASE WHEN spdx <> '' THEN spdx
                WHEN apache THEN 'Apache-2.0'
                WHEN gpl THEN 'GPL'
                WHEN arr THEN 'proprietary'
                ELSE 'none' END AS license,
           CASE WHEN spdx = 'MIT' OR apache THEN 'permissive'
                WHEN gpl THEN 'copyleft'
                WHEN arr THEN 'restricted'
                ELSE 'unknown' END AS category
    FROM flags
    """,
    doc="License/SPDX scanning (code-corpus curation staple): detect "
    "SPDX identifiers, Apache/GPL license mentions and all-rights-"
    "reserved notices in document headers and classify permissive / "
    "copyleft / restricted — the admission gate a code-training "
    "corpus runs before anything else. Pure portable regexes (no "
    "backrefs/lookaround, playbook #13) over synthesized headers.",
)
def q_license_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    headed = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 5 == 0,
               F.concat(F.lit("SPDX-License-Identifier: MIT\n"), F.col("text")))
        .when(F.col("doc_id") % 5 == 1,
              F.concat(F.lit("// Licensed under the Apache License, Version 2.0\n"), F.col("text")))
        .when(F.col("doc_id") % 5 == 2,
              F.concat(F.lit("# This program is free software: GNU General Public License v3\n"), F.col("text")))
        .when(F.col("doc_id") % 5 == 3,
              F.concat(F.lit("Copyright (c) 2024 Example Corp. All rights reserved.\n"), F.col("text")))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    spdx = F.regexp_extract(F.col("text"), r"SPDX-License-Identifier: *([A-Za-z0-9.+-]+)", 1)
    apache = F.col("text").rlike("Apache License")
    gpl = F.col("text").rlike("General Public License|GPL")
    arr = F.col("text").rlike("(?i)all rights reserved")
    return headed.select(
        "doc_id",
        F.when(spdx != "", spdx)
        .when(apache, F.lit("Apache-2.0"))
        .when(gpl, F.lit("GPL"))
        .when(arr, F.lit("proprietary"))
        .otherwise(F.lit("none"))
        .alias("license"),
        F.when((spdx == "MIT") | apache, F.lit("permissive"))
        .when(gpl, F.lit("copyleft"))
        .when(arr, F.lit("restricted"))
        .otherwise(F.lit("unknown"))
        .alias("category"),
    )


@register(
    "lang_confusion_audit",
    _LANG_ID_ORACLE.replace(
        "SELECT doc_id,",
        "SELECT doc_id, lang,", 1
    ).replace(
        "FROM documents", "FROM documents", 1
    ).replace(
        """    SELECT doc_id,
           CASE WHEN regexp_matches(text, '[Ѐ-ӿ]') THEN 'ru'""",
        """    , det AS (
    SELECT doc_id,
           CASE WHEN regexp_matches(text, '[Ѐ-ӿ]') THEN 'ru'""",
    ).replace(
        """                ELSE 'und' END AS detected_lang
    FROM scored
""",
        """                ELSE 'und' END AS detected_lang
    FROM scored
    )
    SELECT d.lang AS labeled_lang, det.detected_lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           (d.lang <> det.detected_lang) AS is_mismatch
    FROM det JOIN documents d USING (doc_id)
    GROUP BY d.lang, det.detected_lang
""",
    ),
    doc="Language label-noise audit (metadata QA): the confusion "
    "matrix between the corpus's claimed lang column and the "
    "deterministic detector — per (labeled, detected) pair counts "
    "with a mismatch flag, the table a curation review reads before "
    "trusting per-language mixing weights. Reuses the lang_id oracle "
    "body verbatim (one detector, two queries — cannot drift).",
)
def q_lang_confusion_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.text_analysis import detect_language

    docs = _tp(spark, sf_dir, "documents")
    det = docs.select(
        "doc_id", "lang", detect_language("text").alias("detected_lang")
    )
    return det.groupBy(
        F.col("lang").alias("labeled_lang"), "detected_lang"
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
    ).withColumn("is_mismatch", F.col("labeled_lang") != F.col("detected_lang"))


@register(
    "url_template_mining",
    """
    WITH urls AS (
      SELECT doc_id,
             'h' || CAST(doc_id % 7 AS VARCHAR) || '.example.com' AS host,
             CASE doc_id % 3
               WHEN 0 THEN '/item/' || CAST(doc_id AS VARCHAR)
               WHEN 1 THEN '/page/' || CAST(doc_id AS VARCHAR) || '/view/'
                           || CAST(doc_id % 13 AS VARCHAR)
               ELSE '/static/about'
             END AS path
      FROM documents
    ), templated AS (
      SELECT host, path,
             regexp_replace(path, '[0-9]+', '{n}', 'g') AS template
      FROM urls
    )
    SELECT host, template,
           CAST(count(*) AS BIGINT) AS n_urls,
           CAST(count(DISTINCT path) AS BIGINT) AS n_distinct,
           (count(*) > 20) AS is_trap_candidate
    FROM templated GROUP BY host, template
    """,
    doc="URL template mining (crawl-trap detection, the IRLbot/Mercator "
    "lineage): collapse digit runs to '{n}' and count URLs per (host, "
    "template) — a template generating unboundedly many distinct URLs "
    "(calendars, session ids, faceted search) shows up as one hot row "
    "a frontier budget can cap BEFORE fetching, where per-URL spam "
    "scores cannot see the aggregate explosion. Pure expressions + "
    "one groupBy.",
)
def q_url_template_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    host = F.concat(F.lit("h"), (F.col("doc_id") % 7).cast("string"), F.lit(".example.com"))
    path = (
        F.when(F.col("doc_id") % 3 == 0,
               F.concat(F.lit("/item/"), F.col("doc_id").cast("string")))
        .when(F.col("doc_id") % 3 == 1,
              F.concat(F.lit("/page/"), F.col("doc_id").cast("string"),
                       F.lit("/view/"), (F.col("doc_id") % 13).cast("string")))
        .otherwise(F.lit("/static/about"))
    )
    t = docs.select(
        host.alias("host"),
        path.alias("path"),
        F.regexp_replace(path, "[0-9]+", "{n}").alias("template"),
    )
    return t.groupBy("host", "template").agg(
        F.count(F.lit(1)).cast("long").alias("n_urls"),
        F.countDistinct("path").cast("long").alias("n_distinct"),
        (F.count(F.lit(1)) > 20).alias("is_trap_candidate"),
    )


