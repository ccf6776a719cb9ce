"""Catalog tier: text analysis: hashes, word counts, fingerprints, lang-id, quality.

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

# ---------------------------------------------------------------------------
# Extension surface: text analysis (SURVEY.md §7 M6)
# ---------------------------------------------------------------------------


@register(
    "doc_hashes",
    """
    SELECT doc_id,
           CASE WHEN text IS NULL OR text = '' THEN '' ELSE md5(text) END AS content_hash
    FROM documents
    """,
    doc="F4 content hashing (telegraph_processor.py:128-132) over documents; "
    "null/empty → '' like the reference.",
)
def q_doc_hashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.functions.hashing import md5_or_empty

    docs = _tp(spark, sf_dir, "documents")
    return docs.select("doc_id", md5_or_empty("text").alias("content_hash"))


@register(
    "doc_word_count",
    """
    SELECT doc_id,
           CAST(COALESCE(len(list_filter(regexp_split_to_array(text, '\\s+'), y -> y <> '')), 0) AS BIGINT) AS n_words
    FROM documents
    """,
    doc="F6/A5 word count (telegraph_processor.py:142-146): Python str.split() "
    "semantics — whitespace runs, no empty tokens.",
)
def q_doc_word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.functions.text import word_count

    docs = _tp(spark, sf_dir, "documents")
    return docs.select("doc_id", word_count("text").cast("long").alias("n_words"))


@register(
    "extract_pattern_tokens",
    """
    SELECT doc_id,
           CAST(COALESCE(len(list_distinct(regexp_extract_all(text, '(s[a-z]+)', 1))), 0) AS BIGINT) AS n_matches,
           list_extract(regexp_extract_all(text, '(s[a-z]+)', 1), 1) AS first_match
    FROM documents
    """,
    doc="F1/F2 extraction machinery (utils.py:4-33) exercised on real data: "
    "regexp_extract_all group capture + order-preserving dedup + first match.",
)
def q_extract_pattern_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _tp(spark, sf_dir, "documents")
    matches = F.regexp_extract_all(F.col("text"), F.lit("(s[a-z]+)"), 1)
    return docs.select(
        "doc_id",
        F.coalesce(F.size(F.array_distinct(matches)), F.lit(0)).cast("long").alias("n_matches"),
        F.get(matches, 0).alias("first_match"),
    )


@register(
    "doc_fingerprint",
    """
    SELECT doc_id,
           md5(array_to_string(list_filter(regexp_split_to_array(lower(text), '\\s+'), y -> y <> ''), ' ')) AS fingerprint
    FROM documents
    """,
    doc="Normalized document fingerprint (extension tier 1 of the dedup ladder): "
    "md5 over lowercased, whitespace-normalized token join.",
)
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.functions.hashing import content_fingerprint

    docs = _tp(spark, sf_dir, "documents")
    return docs.select("doc_id", content_fingerprint("text").alias("fingerprint"))


@register(
    "lang_stats",
    """
    SELECT lang, source, count(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(n_chars) * 10000 // count(*) AS BIGINT) / 10000.0 AS avg_chars
    FROM documents
    GROUP BY lang, source
    """,
    doc="Grouped text-corpus statistics (per-language/source profile). "
    "total_chars is cast to BIGINT in the oracle (DuckDB SUM(INT) yields "
    "HUGEINT, which pandas renders as float64); avg_chars goes through the "
    "int64 fixed-point bridge so both engines divide the same int64 by "
    "10000.0 — bitwise-identical doubles (NOTES.md playbook #1).",
)
def q_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        (F.expr("(sum(n_chars) * 10000L) div count(1)") / F.lit(10000.0)).alias(
            "avg_chars"
        ),
    )


_LANG_ID_ORACLE = """
    WITH scored AS (
      SELECT doc_id, text,
             len(list_filter(list_filter(regexp_split_to_array(lower(text), '\\s+'), y -> y <> ''),
                 x -> x IN ('the','a','and','of','to','in','is','it','that','for'))) AS h_en,
             len(list_filter(list_filter(regexp_split_to_array(lower(text), '\\s+'), y -> y <> ''),
                 x -> x IN ('der','die','das','und','ist','nicht','ein','mit','auf','zu'))) AS h_de,
             len(list_filter(list_filter(regexp_split_to_array(lower(text), '\\s+'), y -> y <> ''),
                 x -> x IN ('le','la','les','et','est','un','une','dans','pour','que'))) AS h_fr,
             len(list_filter(list_filter(regexp_split_to_array(lower(text), '\\s+'), y -> y <> ''),
                 x -> x IN ('el','la','los','las','es','un','una','en','por','para'))) AS h_es
      FROM documents
    )
    SELECT doc_id,
           CASE WHEN regexp_matches(text, '[Ѐ-ӿ]') THEN 'ru'
                WHEN regexp_matches(text, '[一-鿿]') THEN 'zh'
                WHEN greatest(h_en, h_de, h_fr, h_es) <= 0 THEN 'und'
                WHEN h_en = greatest(h_en, h_de, h_fr, h_es) THEN 'en'
                WHEN h_de = greatest(h_en, h_de, h_fr, h_es) THEN 'de'
                WHEN h_fr = greatest(h_en, h_de, h_fr, h_es) THEN 'fr'
                WHEN h_es = greatest(h_en, h_de, h_fr, h_es) THEN 'es'
                ELSE 'und' END AS detected_lang
    FROM scored
"""


@register(
    "lang_id",
    _LANG_ID_ORACLE,
    doc="Deterministic language-ID heuristic (extension): script detection "
    "(Cyrillic/CJK regex) + stopword-profile argmax with fixed tie order.",
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.text_analysis import detect_language

    docs = _tp(spark, sf_dir, "documents")
    return docs.select("doc_id", detect_language("text").alias("detected_lang"))


_QUALITY_ORACLE = """
    WITH base AS (
      SELECT doc_id, text,
             len(list_filter(regexp_split_to_array(lower(text), '\\s+'), y -> y <> '')) AS n_tok,
             length(regexp_replace(text, '\\s+', '', 'g')) AS n_nonspace,
             length(regexp_replace(text, '[^A-Za-zА-Яа-я一-鿿]+', '', 'g')) AS n_alpha,
             len(list_filter(list_filter(regexp_split_to_array(lower(text), '\\s+'), y -> y <> ''),
                 x -> x IN ('the','a','and','of','to','in','is','it','that','for'))) AS h_en
      FROM documents
    )
    SELECT doc_id,
           CASE WHEN text IS NULL OR trim(text) = '' THEN 0.0 ELSE
             (least(CAST(n_tok AS DOUBLE) / 64.0, 1.0)
              + (CASE WHEN n_nonspace > 0 THEN CAST(n_alpha AS DOUBLE) / CAST(n_nonspace AS DOUBLE) ELSE 0.0 END)
              + (CASE WHEN n_tok > 0 THEN least(4.0 * CAST(h_en AS DOUBLE) / CAST(n_tok AS DOUBLE), 1.0) ELSE 0.0 END)
              + (CASE WHEN n_tok > 0
                       AND CAST(n_nonspace AS DOUBLE) / CAST(n_tok AS DOUBLE) >= 3.0
                       AND CAST(n_nonspace AS DOUBLE) / CAST(n_tok AS DOUBLE) <= 12.0
                      THEN 1.0 ELSE 0.0 END)
             ) / 4.0
           END AS score
    FROM base
"""


@register(
    "quality_score",
    _QUALITY_ORACLE,
    doc="Deterministic document-quality heuristic (extension): length, alpha "
    "ratio, stopword ratio, mean-token-length components — all derived from "
    "integer counts so the double math is cross-engine exact.",
)
def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.text_analysis import quality_score

    docs = _tp(spark, sf_dir, "documents")
    return docs.select("doc_id", quality_score("text").alias("score"))


@register(
    "token_count_lexical",
    """
    SELECT doc_id,
           CAST(COALESCE(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')), 0) AS BIGINT) AS n_lexical
    FROM documents
    """,
    doc="BPE-ish lexical token count (extension): letter runs + digit runs + "
    "punctuation marks, a deterministic subword-budget proxy.",
)
def q_token_count_lexical(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.text_analysis import token_count_lexical

    docs = _tp(spark, sf_dir, "documents")
    return docs.select("doc_id", token_count_lexical("text").alias("n_lexical"))


