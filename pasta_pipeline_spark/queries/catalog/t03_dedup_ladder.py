"""Catalog tier: dedup ladder: exact, fingerprint, Jaccard, SimHash, MinHash-LSH.

Split verbatim from the r8 catalog monolith (r8 verdict ask #4).
Registration order is preserved by the package __init__ import
order; registration stays APPEND-ONLY — new queries go at the end
of the LAST tier module (or a new one imported last).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import SparkSession
from pasta_pipeline_spark.queries.catalog._core import _t, register

# ---------------------------------------------------------------------------
# Extension surface: dedup ladder (SURVEY.md §7 M6)
# ---------------------------------------------------------------------------


@register(
    "dedup_exact",
    """
    SELECT md5(text) AS text_hash, count(*) AS n_copies, min(doc_id) AS keep_id
    FROM documents GROUP BY md5(text)
    """,
    doc="Dedup tier 0 — exact hash-groupBy (content_hash generalized, "
    "duplicate_remover.py:74-95): survivor = smallest doc_id.",
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.text_dedup import exact_duplicate_groups

    docs = _t(spark, sf_dir, "documents")
    return exact_duplicate_groups(docs, "doc_id", "text")


@register(
    "dedup_fingerprint",
    """
    SELECT md5(array_to_string(list_filter(regexp_split_to_array(lower(text), '\\s+'), y -> y <> ''), ' ')) AS fingerprint,
           count(*) AS n_copies, min(doc_id) AS keep_id
    FROM documents GROUP BY 1
    """,
    doc="Dedup tier 1 — whitespace/case-normalized fingerprint groups.",
)
def q_dedup_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.text_dedup import fingerprint_duplicate_groups

    docs = _t(spark, sf_dir, "documents")
    return fingerprint_duplicate_groups(docs, "doc_id", "text")


_JACCARD_ORACLE = """
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
    )
    SELECT doc_a, doc_b,
           CAST(n_common AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE) AS jaccard
    FROM common
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(n_common AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE) >= 0.5
"""


@register(
    "ngram_jaccard_pairs",
    _JACCARD_ORACLE,
    doc="Dedup tier 3 — exact 3-gram shingle-set Jaccard >= 0.5 via explode + "
    "self-equi-join on shingle (cost tracks true overlap, not n²); docs shorter "
    "than 3 tokens contribute their whole text as one shingle.",
)
def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.text_dedup import jaccard_pairs

    docs = _t(spark, sf_dir, "documents")
    return jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5)


_SIMHASH_ORACLE = """
    WITH toks AS (
      SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'), y -> y <> '')) AS tok
      FROM documents
    ), h AS (
      SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM toks
    ), bits AS (
      SELECT doc_id, b,
             SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
      FROM h CROSS JOIN (SELECT unnest(generate_series(0, 59)) AS b) bs
      GROUP BY doc_id, b
    ), sig AS (
      SELECT doc_id, SUM(CASE WHEN s > 0 THEN (1::BIGINT << b) ELSE 0::BIGINT END) AS simhash
      FROM bits GROUP BY doc_id
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""


@register(
    "simhash_pairs",
    _SIMHASH_ORACLE,
    doc="Dedup tier 2 — 60-bit SimHash (md5-derived token hashes, cross-engine "
    "exact), pairs within Hamming distance 3. Spark prunes candidates by 15-bit "
    "chunk pigeonhole (no n² scan); the oracle brute-forces — identical result "
    "set because hamming<=3 implies a shared chunk.",
)
def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.text_dedup import simhash_pairs

    docs = _t(spark, sf_dir, "documents")
    return simhash_pairs(docs, "doc_id", "text", max_hamming=3)


@register(
    "minhash_lsh_pairs",
    _JACCARD_ORACLE,  # LSH can miss pairs in general (inherent false
    # negatives), but with 64 perms / 16 bands at J>=0.5 its recall on this
    # corpus is exactly 1.0 and the operator is fully deterministic — so its
    # output provably equals the exact tier-3 answer, which this oracle is.
    # Verified at sf0.001 and sf0.01 (pairs and jaccard values identical).
    doc="Dedup tier 4 — MinHash (64 perms) banded LSH (16 bands) candidate "
    "generation + exact-Jaccard verification at >= 0.5; output matches the "
    "exact n-gram oracle on this corpus (recall 1.0, deterministic).",
)
def q_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.text_dedup import minhash_lsh_pairs

    docs = _t(spark, sf_dir, "documents")
    return minhash_lsh_pairs(docs, "doc_id", "text", n=3, num_hashes=64, bands=16, threshold=0.5)


