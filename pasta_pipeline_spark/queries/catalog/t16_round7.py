"""Catalog tier: round-7 tier.

Split verbatim from the r8 catalog monolith (r8 verdict ask #4).
Registration order is preserved by the package __init__ import
order; registration stays APPEND-ONLY — new queries go at the end
of the LAST tier module (or a new one imported last).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import SparkSession
from pasta_pipeline_spark.queries.catalog._core import QuerySpec, REGISTRY, _t, _tp, register
from pasta_pipeline_spark.queries.catalog.t04_similarity_ann import _COSINE_TOPK_ORACLE
from pasta_pipeline_spark.queries.catalog.t05_multimodal import _ann_ivf_oracle
from pasta_pipeline_spark.queries.catalog.t14_tpch_round3d import _C4_INJECT_SQL, _c4_inject_spark

# ---------------------------------------------------------------------------
# Round 7
# ---------------------------------------------------------------------------


def _dsir_bigram_oracle() -> str:
    from pasta_pipeline_spark.operators.dsir import dsir_oracle_sql

    return dsir_oracle_sql(
        target_where="source IN ('src0', 'src1', 'src2', 'src3')",
        k=100,
        features="bigram",
    )


@register(
    "dsir_bigram_selection",
    None,  # generated below — single source of truth in operators/dsir.py
    doc="DSIR selection over the paper-faithful hashed BIGRAM feature "
    "space (operators/dsir.py features='bigram'; Xie et al. arXiv:"
    "2302.03169 §2.1 hashes n-grams, not unigrams): consecutive token "
    "pairs hash into the same m=4096 buckets, making the importance "
    "model word-ORDER-sensitive while keeping model state fixed-size. "
    "Same smoothing, fixed-point ln, and deterministic top-k as "
    "dsir_selection; documents under 2 tokens contribute no features "
    "(len-guarded in both engines — the winnowing short-doc lesson). "
    "Oracle generated from the same constants.",
)
def q_dsir_bigram_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.dsir import dsir_select

    docs = _tp(spark, sf_dir, "documents")
    return dsir_select(
        docs, F.col("source").isin("src0", "src1", "src2", "src3"), k=100,
        features="bigram",
    )


REGISTRY["dsir_bigram_selection"] = QuerySpec(
    spark_fn=REGISTRY["dsir_bigram_selection"].spark_fn,
    oracle=_dsir_bigram_oracle(),
    doc=REGISTRY["dsir_bigram_selection"].doc,
)


def _bm25f_oracle() -> str:
    from pasta_pipeline_spark.operators.search import bm25f_oracle_sql

    return bm25f_oracle_sql(["spark", "join", "window"], k=10)


@register(
    "bm25_fielded",
    None,  # generated below — single source of truth in operators/search.py
    doc="BM25F fielded retrieval (operators/search.py bm25f_topk; "
    "Robertson & Zaragoza 2009 §3.3): title-field occurrences (the "
    "document's first 5 tokens — deterministic positional fields, the "
    "corpus has no field columns) weigh 3x body occurrences, "
    "saturation runs over the COMBINED weighted tf (one k1 curve per "
    "term — the property that separates BM25F from summing per-field "
    "BM25 scores), and length normalization uses weighted lengths. "
    "Same posting-list scale shape as bm25_topk; int64-floored "
    "contributions; TakeOrderedAndProject top-k.",
)
def q_bm25_fielded(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.search import bm25f_topk

    docs = _tp(spark, sf_dir, "documents")
    return bm25f_topk(docs, ["spark", "join", "window"], k=10)


REGISTRY["bm25_fielded"] = QuerySpec(
    spark_fn=REGISTRY["bm25_fielded"].spark_fn,
    oracle=_bm25f_oracle(),
    doc=REGISTRY["bm25_fielded"].doc,
)


def _minhash_error_oracle() -> str:
    from pasta_pipeline_spark.operators.text_dedup import minhash_error_oracle_sql

    return minhash_error_oracle_sql(n=3, num_hashes=64, threshold=0.5)


@register(
    "minhash_error_report",
    None,  # generated below — single source of truth in operators/text_dedup.py
    doc="MinHash estimator audit (operators/text_dedup.py "
    "minhash_error_report; Broder 1997): for every TRUE near-dup pair "
    "(exact shingle Jaccard >= 0.5), the k=64 slot-agreement estimate "
    "vs the exact value in basis points — measure the estimator on "
    "the corpus's own near-dup population before trusting a new "
    "k/bands setting (expected std ~ sqrt(J(1-J)/64) ~ 6 points at "
    "J=0.5). Signatures are md5-derived here so the WHOLE report, "
    "signatures included, replays hash-exactly in SQL; one shingle "
    "scan feeds both the exact self-join and the signature "
    "aggregation.",
)
def q_minhash_error_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.text_dedup import minhash_error_report

    docs = _t(spark, sf_dir, "documents")
    return minhash_error_report(docs, "doc_id", "text", n=3, num_hashes=64, threshold=0.5)


REGISTRY["minhash_error_report"] = QuerySpec(
    spark_fn=REGISTRY["minhash_error_report"].spark_fn,
    oracle=_minhash_error_oracle(),
    doc=REGISTRY["minhash_error_report"].doc,
)


def _nb_confusion_oracle() -> str:
    from pasta_pipeline_spark.operators.dsir import nb_confusion_oracle_sql

    return nb_confusion_oracle_sql()


@register(
    "source_nb_confusion",
    None,  # generated below — single source of truth in operators/dsir.py
    doc="Source-separability audit (operators/dsir.py "
    "nb_source_confusion): one add-one-smoothed hashed-bow multinomial "
    "per SOURCE (the multi-class generalization of the DSIR importance "
    "models), max-likelihood classification of every document, "
    "confusion matrix out. Near-diagonal = sources are "
    "distributionally distinct (mixture weights mean something); "
    "off-diagonal mass = two sources duplicate each other or labels "
    "are noisy — the source-level counterpart of lang_confusion_audit. "
    "Fixed-point ln scores; per-doc argmax via a doc-partitioned "
    "window (S rows per partition, parallel).",
)
def q_source_nb_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.dsir import nb_source_confusion

    docs = _tp(spark, sf_dir, "documents")
    return nb_source_confusion(docs)


REGISTRY["source_nb_confusion"] = QuerySpec(
    spark_fn=REGISTRY["source_nb_confusion"].spark_fn,
    oracle=_nb_confusion_oracle(),
    doc=REGISTRY["source_nb_confusion"].doc,
)


def _label_centroid_oracle() -> str:
    from pasta_pipeline_spark.operators.similarity import label_centroid_oracle_sql

    return label_centroid_oracle_sql()


@register(
    "label_centroid_similarity",
    None,  # generated below — single source of truth in operators/similarity.py
    doc="Per-label embedding centroid similarity (operators/"
    "similarity.py label_centroid_similarity): pairwise cosine between "
    "label centroids — near-parallel centroids flag populations "
    "occupying the same embedding region (merge candidates, "
    "contamination, drift), the embedding-space counterpart of "
    "source_nb_confusion. Cosine of means == cosine of SUMS (1/n "
    "cancels), so state is |labels| x d int64 component sums from ONE "
    "posexplode scan; the final ratio is a shared sequential-fold "
    "double expression (playbook #5).",
)
def q_label_centroid_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.similarity import label_centroid_similarity

    emb = _t(spark, sf_dir, "embeddings")
    return label_centroid_similarity(emb)


REGISTRY["label_centroid_similarity"] = QuerySpec(
    spark_fn=REGISTRY["label_centroid_similarity"].spark_fn,
    oracle=_label_centroid_oracle(),
    doc=REGISTRY["label_centroid_similarity"].doc,
)


@register(
    "length_quartiles_by_source",
    """
    WITH ranked AS (
      SELECT source, n_chars, doc_id,
             ntile(4) OVER (PARTITION BY source
                            ORDER BY n_chars, doc_id) AS q
      FROM documents
    )
    SELECT source, CAST(q AS INT) AS quartile,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(MIN(n_chars) AS BIGINT) AS min_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars
    FROM ranked GROUP BY source, q
    """,
    doc="Per-source document-length quartiles — equal-depth "
    "per-GROUP statistics, the grouped form of equidepth_histogram. "
    "The oracle states the contract as ntile(4) PARTITION BY source; "
    "the Spark side runs NO per-source window task (the hot-group "
    "scale-killer the r6 verdict flagged on perplexity_buckets): "
    "ranks come from ids.assign_grouped_sequential_ids "
    "(range-partition by (source, length, id) + per-group driver "
    "prefix-sum) and the quartile is ntile's closed-form quotient "
    "over (rank, group total). Identical assignment, every task "
    "bounded by a range slice.",
)
def q_length_quartiles_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.ids import assign_grouped_sequential_ids
    from pasta_pipeline_spark.operators.util import attach_cached_deps

    docs = _t(spark, sf_dir, "documents").select("source", "n_chars", "doc_id")
    ranked = assign_grouped_sequential_ids(
        docs, "source", ["n_chars", "doc_id"], out_col="__rk", total_col="__n"
    )
    q = F.expr(
        """CAST(CASE
             WHEN __rk <= (__n % 4) * (__n div 4 + 1)
             THEN (__rk - 1) div (__n div 4 + 1)
             ELSE (__n % 4) + (__rk - (__n % 4) * (__n div 4 + 1) - 1)
                  div greatest(__n div 4, 1)
           END + 1 AS INT)"""
    )
    out = (
        ranked.withColumn("quartile", q)
        .groupBy("source", "quartile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("n_chars").cast("long").alias("min_chars"),
            F.max("n_chars").cast("long").alias("max_chars"),
        )
    )
    return attach_cached_deps(out, getattr(ranked, "_pasta_cached_deps", []))


def _line_dedup_oracle() -> str:
    from pasta_pipeline_spark.operators.text_dedup import (
        global_line_dedup_oracle_sql,
    )

    inner = global_line_dedup_oracle_sql(
        max_df=400, table="src", text_col="t"
    ).lstrip()
    assert inner.startswith("WITH ")
    return (
        f"WITH src AS (SELECT doc_id, {_C4_INJECT_SQL} AS t FROM documents), "
        + inner[len("WITH "):]
    )


@register(
    "line_dedup_rewrite",
    None,  # generated below — single source of truth in operators/text_dedup.py
    doc="CCNet corpus-GLOBAL duplicate-line removal (text_dedup."
    "global_line_dedup; Wenzek et al. 1911.00359 §3.1 — dedup every "
    "paragraph by hash across shards): lines whose normalized form "
    "appears in more than max_df distinct documents (cookie banners, "
    "nav chrome — the C4-injected boilerplate lines here) are cut "
    "from every document; docs are reassembled order-preserving via "
    "ONE array_sort groupBy, no window. State is linear in DISTINCT "
    "lines (the token_distribution scale class). Complement of the "
    "group-scoped boilerplate_lines.",
)
def q_line_dedup_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.text_dedup import global_line_dedup

    docs = _tp(spark, sf_dir, "documents")
    src = docs.select("doc_id", _c4_inject_spark().alias("t"))
    return global_line_dedup(src, "doc_id", "t", max_df=400)


REGISTRY["line_dedup_rewrite"] = QuerySpec(
    spark_fn=REGISTRY["line_dedup_rewrite"].spark_fn,
    oracle=_line_dedup_oracle(),
    doc=REGISTRY["line_dedup_rewrite"].doc,
)


def _stitch_oracle() -> str:
    from pasta_pipeline_spark.operators.text_dedup import stitch_pairs_oracle_sql

    return stitch_pairs_oracle_sql(k=3)


@register(
    "stitch_pairs",
    None,  # generated below — single source of truth in operators/text_dedup.py
    doc="Pagination-stitch detection (text_dedup.stitch_pairs): doc "
    "A's last 3 tokens == doc B's first 3 tokens — one logical page "
    "split across crawl records (pagination, load-more chunks, shard "
    "boundaries). One scan derives each doc's boundary grams; "
    "candidates from a plain equi-join on the gram. Feeds a "
    "concatenating repair or the dedup ladder.",
)
def q_stitch_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.text_dedup import stitch_pairs

    docs = _t(spark, sf_dir, "documents")
    return stitch_pairs(docs, "doc_id", "text", k=3)


REGISTRY["stitch_pairs"] = QuerySpec(
    spark_fn=REGISTRY["stitch_pairs"].spark_fn,
    oracle=_stitch_oracle(),
    doc=REGISTRY["stitch_pairs"].doc,
)


@register(
    "embedding_norm_audit",
    """
    WITH n AS (
      SELECT label,
             CAST(FLOOR(sqrt(list_dot_product(embedding::DOUBLE[],
                                              embedding::DOUBLE[])) * 10000)
                  AS BIGINT) AS norm_fp,
             len(embedding) AS dim
      FROM embeddings
    )
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(SUM(CASE WHEN dim <> 64 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_malformed,
           CAST(SUM(CASE WHEN norm_fp = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_zero,
           CAST(MIN(norm_fp) AS BIGINT) AS min_norm_fp,
           CAST(MAX(norm_fp) AS BIGINT) AS max_norm_fp,
           CAST(SUM(norm_fp) AS BIGINT) AS sum_norm_fp
    FROM n GROUP BY label
    """,
    doc="Embedding hygiene audit: per-label vector-norm profile — "
    "zero-norm vectors break cosine (NaN), malformed dimensions break "
    "zip_with silently (the JL lesson), and a norm range spanning "
    "orders of magnitude means the embedder mixed normalized and "
    "unnormalized outputs. Run BEFORE the similarity tier; one scan, "
    "pure expressions, fixed-point sqrt norm (sequential-fold dot, "
    "playbook #5).",
)
def q_embedding_norm_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.similarity import dot

    emb = _t(spark, sf_dir, "embeddings")
    norm_fp = F.floor(
        F.sqrt(dot(F.col("embedding"), F.col("embedding"))) * 10000
    ).cast("long")
    return (
        emb.select(
            "label",
            norm_fp.alias("norm_fp"),
            F.size("embedding").alias("dim"),
        )
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.sum((F.col("dim") != 64).cast("long")).cast("long").alias("n_malformed"),
            F.sum((F.col("norm_fp") == 0).cast("long")).cast("long").alias("n_zero"),
            F.min("norm_fp").cast("long").alias("min_norm_fp"),
            F.max("norm_fp").cast("long").alias("max_norm_fp"),
            F.sum("norm_fp").cast("long").alias("sum_norm_fp"),
        )
    )


@register(
    "dup_degree_profile",
    """
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
    ), pairs AS (
      SELECT doc_a, doc_b FROM common
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE n_common * 2 >= (sa.n_sh + sb.n_sh - n_common)
    ), deg AS (
      SELECT d, CAST(count(*) AS BIGINT) AS degree FROM (
        SELECT doc_a AS d FROM pairs UNION ALL SELECT doc_b AS d FROM pairs
      ) GROUP BY d
    )
    SELECT degree, CAST(count(*) AS BIGINT) AS n_docs
    FROM deg GROUP BY degree
    """,
    doc="Near-dup graph degree profile: how many dup-partners each "
    "document has (exact Jaccard >= 0.5 pairs), histogrammed. The "
    "shape diagnoses the dedup workload BEFORE clustering: a long "
    "degree tail means template farms (one hub duplicating "
    "thousands — expect hot keys, pre-cluster with the banded "
    "tiers), near-uniform low degree means simple pairwise dedup "
    "suffices. Derived from the same shingle self-join as "
    "ngram_jaccard_pairs; integer cross-multiplied threshold.",
)
def q_dup_degree_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.text_dedup import jaccard_pairs

    docs = _t(spark, sf_dir, "documents")
    pairs = jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5).select(
        "doc_a", "doc_b"
    )
    deg = (
        pairs.select(F.col("doc_a").alias("d"))
        .unionAll(pairs.select(F.col("doc_b").alias("d")))
        .groupBy("d")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
    )
    return deg.groupBy("degree").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )


def _ann_recall_oracle(k: int = 10) -> str:
    return f"""
    WITH ann AS ({_ann_ivf_oracle(k=k)}),
    exact AS ({_COSINE_TOPK_ORACLE.replace("LIMIT 10", f"LIMIT {k}")})
    SELECT CAST({k} AS BIGINT) AS k,
           CAST(count(*) AS BIGINT) AS n_hits,
           CAST(count(*) * 10000 // {k} AS BIGINT) AS recall_bp
    FROM ann JOIN exact USING (vec_id)
    """


@register(
    "ann_recall_report",
    None,  # assembled below from the IVF and exact-cosine oracles
    doc="ANN quality evaluation as a first-class query: recall@10 of "
    "the IVF index (16 cells, 4 probes) against the exact cosine "
    "top-10 for the same query vector — the number an ANN deployment "
    "must report before its results are trusted, computed entirely "
    "in-engine (both rankings are deterministic, so even the RECALL "
    "is hash-oracle-able — no sampling, no tolerance). Composes the "
    "existing ivf_topk and cosine_topk plans; one join on vec_id.",
)
def q_ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.similarity import cosine_topk, ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    query = emb.orderBy("vec_id").limit(1).select(F.col("embedding").alias("qv"))
    k = 10
    ann = ivf_topk(emb, query, k=k, n_cells=16, n_probe=4).select("vec_id")
    exact = cosine_topk(emb, query, k=k).select("vec_id")
    return ann.join(exact, "vec_id").agg(
        F.lit(k).cast("long").alias("k"),
        F.count(F.lit(1)).cast("long").alias("n_hits"),
        F.expr(f"count(1) * 10000 div {k}").cast("long").alias("recall_bp"),
    )


REGISTRY["ann_recall_report"] = QuerySpec(
    spark_fn=REGISTRY["ann_recall_report"].spark_fn,
    oracle=_ann_recall_oracle(),
    doc=REGISTRY["ann_recall_report"].doc,
)


def _jl_ann_oracle() -> str:
    from pasta_pipeline_spark.operators.similarity import jl_ann_oracle_sql

    return jl_ann_oracle_sql()


@register(
    "jl_ann_topk",
    None,  # generated below — single source of truth in operators/similarity.py
    doc="JL-prefiltered ANN (operators/similarity.py jl_ann_topk): "
    "coarse squared-L2 ranking in the 16-dim sign projection (int64 "
    "expressions, 4x fewer multiplies, no floats) keeps 50 "
    "candidates; exact cosine reranks only those. The cheap-ANN "
    "composition of the JL tier — both stages deterministic, so the "
    "whole pipeline INCLUDING the prefilter is hash-oracle-able "
    "(no sampled-ANN tolerance games).",
)
def q_jl_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.similarity import jl_ann_topk

    emb = _t(spark, sf_dir, "embeddings")
    query = emb.orderBy("vec_id").limit(1).select(F.col("embedding").alias("qv"))
    return jl_ann_topk(emb, query, k=10, n_candidates=50)


REGISTRY["jl_ann_topk"] = QuerySpec(
    spark_fn=REGISTRY["jl_ann_topk"].spark_fn,
    oracle=_jl_ann_oracle(),
    doc=REGISTRY["jl_ann_topk"].doc,
)


def _sorted_pack_gain_oracle() -> str:
    from pasta_pipeline_spark.operators.sampling import greedy_pack_oracle_sql

    size_sql = "len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> ''))"
    arrival = greedy_pack_oracle_sql(
        table="documents", id_col="doc_id", size_sql=size_sql,
        budget=256, group_col="source",
    )
    srt_src = (
        "(SELECT source, doc_id, "
        f"CAST({size_sql} AS BIGINT) * 1000000 + doc_id AS ord_key, text "
        "FROM documents) srt"
    )
    by_len = greedy_pack_oracle_sql(
        table=srt_src, id_col="ord_key", size_sql=size_sql,
        budget=256, group_col="source",
    )
    eff = (
        "SELECT source, CAST(count(DISTINCT pack_id) AS BIGINT) AS n_packs, "
        "CAST(SUM(n_units) * 10000 // (count(DISTINCT pack_id) * 256) AS BIGINT)"
        " AS eff_bp FROM {src} GROUP BY source"
    )
    return f"""
    WITH arrival AS ({arrival}),
    by_len AS ({by_len}),
    ea AS ({eff.format(src="arrival")}),
    es AS ({eff.format(src="by_len")})
    SELECT ea.source,
           ea.n_packs AS n_packs_arrival, es.n_packs AS n_packs_sorted,
           ea.eff_bp AS eff_arrival_bp, es.eff_bp AS eff_sorted_bp,
           CAST(es.eff_bp - ea.eff_bp AS BIGINT) AS gain_bp
    FROM ea JOIN es USING (source)
    """


@register(
    "sorted_pack_gain",
    None,  # assembled below from the greedy_pack recursive-CTE oracle
    doc="Length-sorted packing gain (the curriculum/packing trick "
    "every training pipeline weighs): pack each source shard twice "
    "with the SAME next-fit rule — arrival order vs sorted by "
    "document length — and report packs saved and occupancy gained "
    "in basis points. Sorting feeds same-size runs to next-fit, "
    "cutting padding waste (Ding 2404.10830 discuss the trade "
    "against order randomness). Order is injected through the pack "
    "key (length-composite id), so the Arrow packing stage and the "
    "recursive-CTE oracle are both reused verbatim, twice.",
)
def q_sorted_pack_gain(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.functions.text import tokenize_ws
    from pasta_pipeline_spark.operators.sampling import greedy_pack

    docs = _t(spark, sf_dir, "documents").withColumn(
        "__n_tok", F.size(tokenize_ws(F.col("text"))).cast("long")
    )
    srt = docs.withColumn(
        "__ord", F.col("__n_tok") * 1000000 + F.col("doc_id")
    )

    def eff(packed):
        per_pack = packed.groupBy("source", "pack_id").agg(
            F.sum("n_units").cast("long").alias("pack_units")
        )
        return per_pack.groupBy("source").agg(
            F.count(F.lit(1)).cast("long").alias("n_packs"),
            F.expr(
                "CAST(SUM(pack_units) * 10000 div (count(1) * 256) AS BIGINT)"
            ).alias("eff_bp"),
        )

    ea = eff(greedy_pack(docs, "doc_id", "__n_tok", budget=256, group_col="source"))
    es = eff(greedy_pack(srt, "__ord", "__n_tok", budget=256, group_col="source"))
    return (
        ea.select(
            "source",
            F.col("n_packs").alias("n_packs_arrival"),
            F.col("eff_bp").alias("eff_arrival_bp"),
        )
        .join(
            es.select(
                "source",
                F.col("n_packs").alias("n_packs_sorted"),
                F.col("eff_bp").alias("eff_sorted_bp"),
            ),
            "source",
        )
        .select(
            "source", "n_packs_arrival", "n_packs_sorted",
            "eff_arrival_bp", "eff_sorted_bp",
            (F.col("eff_sorted_bp") - F.col("eff_arrival_bp"))
            .cast("long")
            .alias("gain_bp"),
        )
    )


REGISTRY["sorted_pack_gain"] = QuerySpec(
    spark_fn=REGISTRY["sorted_pack_gain"].spark_fn,
    oracle=_sorted_pack_gain_oracle(),
    doc=REGISTRY["sorted_pack_gain"].doc,
)


def _cdc_oracle() -> str:
    from pasta_pipeline_spark.operators.subdoc_dedup import cdc_chunks_oracle_sql

    return cdc_chunks_oracle_sql(avg_tokens=8)


@register(
    "cdc_chunks",
    None,  # generated below — single source of truth in operators/subdoc_dedup.py
    doc="Content-defined chunking (subdoc_dedup.cdc_chunks; the "
    "LBFS/rsync idea at token granularity, Muthitacharoen SOSP'01): "
    "a chunk closes after every token whose md5-60 hash is 0 mod "
    "avg_tokens, so boundaries follow CONTENT and an edit reshapes "
    "only chunks up to the next boundary (resynchronization pytest). "
    "Emits per-chunk md5 + corpus-wide copy counts — shared content "
    "at chunk granularity, between line-level and span-level dedup "
    "resolution. Doc-partitioned windows; chunk-hash count is the "
    "only cross-doc shuffle.",
)
def q_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.subdoc_dedup import cdc_chunks

    docs = _t(spark, sf_dir, "documents")
    return cdc_chunks(docs, avg_tokens=8)


REGISTRY["cdc_chunks"] = QuerySpec(
    spark_fn=REGISTRY["cdc_chunks"].spark_fn,
    oracle=_cdc_oracle(),
    doc=REGISTRY["cdc_chunks"].doc,
)


@register(
    "json_roundtrip_extract",
    """
    WITH src AS (
      SELECT doc_id,
             '{"id": ' || doc_id || ', "lang": "' || lang || '", "n": '
               || n_chars || '}' AS payload
      FROM documents
    )
    SELECT doc_id,
           CAST(json_extract(payload, '$.id') AS BIGINT) AS id2,
           CAST(json_extract_string(payload, '$.lang') AS VARCHAR) AS lang2,
           CAST(json_extract(payload, '$.n') AS BIGINT) AS n2,
           CAST(json_valid(payload) AS BOOLEAN) AS valid
    FROM src
    """,
    doc="JSON parse surface (SURVEY §2.8 P3/P4 — the reference "
    "serializes reactions/links as JSON strings; native MapType/"
    "ArrayType eliminated the need, and THIS query evidences the "
    "parse path for users who still carry JSON columns): an "
    "engine-shared JSON payload is built by one concat recipe, then "
    "Spark's from_json(explicit schema) and DuckDB's json_extract "
    "must agree field-for-field. Schema-on-read with explicit "
    "schema — never schema inference on a 100 TB scan.",
)
def q_json_roundtrip_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    payload = F.format_string(
        '{"id": %d, "lang": "%s", "n": %d}',
        F.col("doc_id"),
        F.col("lang"),
        F.col("n_chars"),
    )
    parsed = docs.select(
        "doc_id", F.from_json(payload, "id long, lang string, n long").alias("j"),
        payload.alias("p"),
    )
    return parsed.select(
        "doc_id",
        F.col("j.id").alias("id2"),
        F.col("j.lang").alias("lang2"),
        F.col("j.n").alias("n2"),
        F.col("j").isNotNull().alias("valid"),
    )


@register(
    "media_resize",
    """
    WITH ids AS (
      SELECT doc_id AS media_id,
             4 + doc_id % 12 AS w,
             4 + (doc_id // 3) % 10 AS h
      FROM documents
    ), txs AS (
      SELECT media_id, w, h, unnest(generate_series(0, 3)) AS tx FROM ids
    ), tys AS (
      SELECT media_id, w, h, tx, unnest(generate_series(0, 3)) AS ty FROM txs
    ), cs AS (
      SELECT media_id, w, h,
             (tx * w) // 4 AS x, (ty * h) // 4 AS y,
             unnest([0, 1, 2]) AS c
      FROM tys
    ), vals AS (
      SELECT media_id, w, h, c,
             (media_id * 7 + y * 31 + x * 13 + c * 5) % 256 AS v
      FROM cs
    )
    SELECT media_id,
           CAST(w AS INTEGER) AS src_width,
           CAST(h AS INTEGER) AS src_height,
           CAST(4 AS INTEGER) AS out_width,
           CAST(4 AS INTEGER) AS out_height,
           CAST(SUM(v) AS BIGINT) AS r_pixel_sum,
           CAST(SUM((CASE c WHEN 0 THEN 299 WHEN 1 THEN 587 ELSE 114 END) * v)
             AS BIGINT) AS r_luma_sum
    FROM vals GROUP BY 1, 2, 3
    """,
    doc="Image RESIZE over REAL decoded pixels (multimodal."
    "resize_image_pixels) — the preprocessing verb between decode and "
    "batching: nearest-neighbor to 4x4 with the exact floor mapping "
    "(tx*w div out_w), numpy gather per image inside one Arrow "
    "mapInPandas (no per-pixel Python). The oracle recomputes the "
    "resized pixel/luma sums from the closed-form id pixel recipe "
    "WITHOUT touching a byte — any decode/stride/mapping bug "
    "hash-mismatches (the media_png_pixels discipline, now through a "
    "geometric transform).",
)
def q_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.multimodal import (
        resize_image_pixels,
        synthesize_media,
    )

    docs = _tp(spark, sf_dir, "documents")
    media = synthesize_media(
        docs.select(F.col("doc_id").alias("media_id")), variant="png_full"
    )
    return resize_image_pixels(media, out_w=4, out_h=4)


