"""Text extraction functions — F1/F2/F6 in SURVEY.md §2.8.

Exact-parity re-expressions of the reference's pure-Python helpers
(/root/reference/dags/utils/utils.py:4-33,
 /root/reference/dags/processors/telegraph_processor.py:142-146) as
native Spark expressions. Parity notes per function document where
Python `re` and Java regex semantics could diverge and why they do not
for these patterns.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Telegraph link pattern — verbatim semantics of utils.py:8. The char
#: class `[^\s\n\])>_*}]` is valid and identical in Python re and Java
#: regex (no inline flags, no lookaround, no \b differences in play).
TELEGRAPH_LINK_PATTERN = r"https://telegra\.ph/[^\s\n\])>_*}]+"

#: Trailing punctuation strip — utils.py:13.
_TRAILING_PUNCT = "[.,\"'*_]+$"

#: Hashtag pattern — utils.py:24. ASCII letters + the Cyrillic а-я/А-Я
#: ranges + digits + underscore; literal ranges behave identically in
#: Python re and Java regex (both are code-point ranges, no Unicode
#: case folding involved because we lowercase afterwards).
HASHTAG_PATTERN = "#([a-zA-Zа-яА-Я0-9_]+)"


def extract_telegraph_links(text: Column | str) -> Column:
    """All telegra.ph links in ``text``: findall → strip trailing
    ``[.,"'*_]+`` → order-preserving dedup; null/empty text → [].

    Parity: utils.py:4-17. ``array_distinct`` keeps the first
    occurrence of each element, matching the reference's
    seen-set + append loop.
    """
    c = F.col(text) if isinstance(text, str) else text
    links = F.regexp_extract_all(c, F.lit(TELEGRAPH_LINK_PATTERN), 0)
    cleaned = F.transform(links, lambda v: F.regexp_replace(v, _TRAILING_PUNCT, ""))
    return F.coalesce(F.array_distinct(cleaned), F.array().cast("array<string>"))


def extract_hashtags(text: Column | str) -> Column:
    """Hashtags in ``text``: group-1 capture → lowercase →
    order-preserving dedup; null/empty → [].

    Parity: utils.py:20-33 (Cyrillic class preserved verbatim).
    """
    c = F.col(text) if isinstance(text, str) else text
    tags = F.regexp_extract_all(c, F.lit(HASHTAG_PATTERN), 1)
    lowered = F.transform(tags, F.lower)
    return F.coalesce(F.array_distinct(lowered), F.array().cast("array<string>"))


def word_count(text: Column | str) -> Column:
    """Whitespace-token count with Python ``str.split()`` semantics:
    leading/trailing whitespace ignored, empty/null/whitespace-only → 0.

    Parity: telegraph_processor.py:142-146 (and the word_count column
    fill at :229 — the reference counts tokens of the *raw HTML*,
    markup included; callers choose what column to count).
    """
    return F.size(tokenize_ws(text, lowercase=False)).cast("int")


def tokenize_ws(text: Column | str, lowercase: bool = True) -> Column:
    """Whitespace tokenization to array<string> (Python split
    semantics: no empty tokens). Shared by the text-analysis and
    near-dup extension operators.

    Implementation note: split + drop-empties, NOT trim-then-split —
    ``F.trim`` strips only ASCII spaces, so a trailing ``\\n`` would
    leave a phantom empty token (caught by the reference-differential
    parity tests). DuckDB-oracle twin:
    ``list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')``.
    """
    c = F.col(text) if isinstance(text, str) else text
    toks = F.filter(F.split(c, r"\s+"), lambda t: t != "")
    toks = F.coalesce(toks, F.array().cast("array<string>"))
    return F.transform(toks, F.lower) if lowercase else toks
