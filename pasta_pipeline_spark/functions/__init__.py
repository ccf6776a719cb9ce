"""Scalar function layer — native Spark expressions, no UDFs.

Every helper here returns a Column built from pyspark.sql.functions,
so the whole layer stays inside whole-stage codegen (SURVEY.md §2.10).
The only Python-side code paths in the engine are HTML parsing
(``html.py``, Arrow-vectorized) and the fetch/multimodal stages under
``sources/`` and ``operators/multimodal.py``.
"""

from pasta_pipeline_spark.functions.text import (
    extract_telegraph_links,
    extract_hashtags,
    word_count,
    tokenize_ws,
)
from pasta_pipeline_spark.functions.hashing import md5_or_empty, content_fingerprint
from pasta_pipeline_spark.functions.urls import (
    extract_anchors,
    is_valid_telegraph_url,
    clean_link,
    parse_psl_lines,
    registrable_domain_psl_full,
    scalarize_link,
)
from pasta_pipeline_spark.functions.timestamps import parse_iso8601, age_predicate

__all__ = [
    "extract_telegraph_links",
    "extract_hashtags",
    "word_count",
    "tokenize_ws",
    "md5_or_empty",
    "content_fingerprint",
    "is_valid_telegraph_url",
    "clean_link",
    "scalarize_link",
    "extract_anchors",
    "parse_psl_lines",
    "registrable_domain_psl_full",
    "parse_iso8601",
    "age_predicate",
]
