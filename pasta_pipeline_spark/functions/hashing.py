"""Content hashing — F4/F5 and the document-fingerprint extension.

Parity source: /root/reference/dags/processors/telegraph_processor.py:128-139
(MD5 hexdigest of UTF-8 content; empty or null input → "").
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from pasta_pipeline_spark.functions.text import tokenize_ws


def md5_or_empty(col: Column | str) -> Column:
    """MD5 hexdigest; null/empty input → '' (not null), matching
    extract_content_hash / extract_description_hash
    (telegraph_processor.py:128-139)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.isNull() | (c == ""), F.lit("")).otherwise(F.md5(c))


def content_fingerprint(text: Column | str) -> Column:
    """Normalized document fingerprint (extension operator):
    lowercase, whitespace-tokenize, re-join with single spaces, MD5.

    Robust to whitespace/case-only edits — the cheap first tier of the
    near-duplicate ladder (exact md5 → fingerprint → MinHash-LSH).
    """
    toks = tokenize_ws(text, lowercase=True)
    normalized = F.array_join(toks, " ")
    return F.md5(normalized)
