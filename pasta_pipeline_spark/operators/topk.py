"""Sort / limit / top-k — L1/L2/L3 in SURVEY.md §2.6.

The reference's only ordering surface is "most recent N within the
lookback window" (message_scraper.py:87-100 — Telethon iterates
newest-first with limit=1000). Spark-first: ``orderBy(...).limit(k)``
compiles to ``TakeOrderedAndProject`` — per-partition heap + driver
merge of k rows, no global sort, no full shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def top_k(df: DataFrame, order: list[Column | str], k: int) -> DataFrame:
    """Top-k by ``order`` (columns or Column expressions; pass
    ``F.desc(...)`` for descending). Callers should include a unique
    tiebreak column for deterministic results."""
    cols = [F.col(c) if isinstance(c, str) else c for c in order]
    return df.orderBy(*cols).limit(k)


def latest_messages(messages: DataFrame, n: int = 1000) -> DataFrame:
    """L2/L3 — the reference's scrape order: newest ``date`` first,
    capped (message_scraper.py:87,97). Tiebreak on message_id."""
    return top_k(messages, [F.desc("date"), F.desc("message_id")], n)
