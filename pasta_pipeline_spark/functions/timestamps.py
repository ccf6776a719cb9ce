"""Timestamp functions — F7/F13 and the age predicates P9.

Parity sources:
- ISO-8601 parse with Z fix-up: /root/reference/dags/processors/telegraph_processor.py:216-224
- interval age predicates:      /root/reference/dags/processors/duplicate_remover.py:160-165,199-215

Engine deviation (documented, SURVEY.md §2.8 F13): the reference mixes
per-row ``datetime.now()`` with statement-level ``CURRENT_TIMESTAMP``;
the engine freezes one ``run_ts`` per pipeline run so results are
deterministic and testable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def parse_iso8601(col: Column | str) -> Column:
    """Parse ISO-8601 strings, accepting the trailing-Z form; failure →
    NULL (Spark's non-ANSI to_timestamp default), matching the
    reference's warn-and-None behavior (telegraph_processor.py:216-224).
    """
    c = F.col(col) if isinstance(col, str) else col
    # try_to_timestamp: handles 'Z' and offsets natively (the
    # reference's .replace('Z', '+00:00') fix-up is unnecessary) and
    # returns NULL on parse failure even under Spark 4's default ANSI
    # mode, matching the reference's warn-and-None behavior.
    return F.try_to_timestamp(c)


def age_predicate(ts: Column | str, days: int, now: Column | None = None) -> Column:
    """``ts < now - INTERVAL <days> DAYS`` — parameterized, unlike the
    reference's %-formatted interval literal (duplicate_remover.py:199-202).

    ``now`` defaults to ``current_timestamp()``; pipelines pass a frozen
    run_ts literal for determinism.
    """
    c = F.col(ts) if isinstance(ts, str) else ts
    if not isinstance(days, int) or days < 0:
        raise ValueError(f"days must be a non-negative int, got {days!r}")
    base = now if now is not None else F.current_timestamp()
    return c < (base - F.expr(f"INTERVAL {days} DAYS"))
