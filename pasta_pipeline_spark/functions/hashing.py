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


def rolling_hash(text: Column | str, base: int = 1_000_003, mod: int = (1 << 31) - 1) -> Column:
    """Order-sensitive polynomial rolling hash over the token stream:
    ``h = fold(tokens, 0, (acc, t) -> (acc*B + h28(t)) mod M)`` with
    md5-derived 28-bit token hashes.

    The streaming-friendly fingerprint tier: incremental (a new chunk
    folds onto the previous hash without re-reading the document) and
    cheap to compare. All arithmetic stays under 2^52, so it is exact
    in int64 — and expressible identically in the DuckDB oracle via
    ``list_reduce`` (see queries/catalog.py).
    """
    toks = tokenize_ws(text, lowercase=True)
    h28 = lambda t: F.conv(F.substring(F.md5(t), 1, 7), 16, 10).cast("long")  # noqa: E731
    return F.aggregate(
        F.transform(toks, h28),
        F.lit(0).cast("long"),
        lambda acc, x: (acc * F.lit(base) + x) % F.lit(mod),
    )
