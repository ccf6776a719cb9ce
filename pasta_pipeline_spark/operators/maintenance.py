"""Maintenance composite — O6 / lifecycle §3.2 of SURVEY.md.

Parity source: run_full_cleanup
(/root/reference/dags/processors/duplicate_remover.py:314-355), which
sequences stats → five cleanups → stats → summary. Each Postgres
DELETE/UPDATE becomes a pure transform here; the caller persists the
returned DataFrames atomically (plans/pipeline.py owns the table swap).

Deleted-row counts are computed as count_before - count_after, matching
the reference's ``cur.rowcount`` collection.

Documented deviation (step order): the reference nulls orphan links
*before* the failed-link and retention deletes (duplicate_remover.py:
327-329); we run the orphan rewrite *last*, against the final content
set. Links pointing at rows deleted in the current run are therefore
nulled one run earlier here, and ``cleaned_links`` counts those extra
rewrites — strictly more consistent output (no link ever survives a
run pointing at a row that run deleted), but a different per-run stats
split than the reference would report.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pasta_pipeline_spark.functions.timestamps import age_predicate
from pasta_pipeline_spark.operators.antijoin import null_out_orphans
from pasta_pipeline_spark.operators.dedup import dedup_content, keep_latest
from pasta_pipeline_spark.operators.stats import cleanup_summary

#: Give-up set for failed fetches (duplicate_remover.py:162).
FAILED_STATUSES = ("error", "timeout", "client_error", "server_error")


def remove_duplicate_messages(messages: DataFrame) -> DataFrame:
    """W1 — keep the latest processed version per message_id
    (duplicate_remover.py:28-47; see dedup.py for the reference-bug
    note on its DELETE predicate)."""
    return keep_latest(messages, "message_id", "processed_at")


def remove_duplicate_content(content: DataFrame) -> DataFrame:
    """W2 — keep the first URL per identical content_hash; null/empty
    hashes exempt (duplicate_remover.py:74-95)."""
    return dedup_content(content)


def cleanup_failed_links(content: DataFrame, now: Column | None = None) -> DataFrame:
    """Drop failed fetches that exhausted retries and have not been
    checked for 7+ days (duplicate_remover.py:158-165)."""
    doomed = (
        F.col("status").isin(*FAILED_STATUSES)
        & (F.col("retry_count") >= 3)
        & age_predicate("last_checked", 7, now=now)
    )
    return content.filter(~F.coalesce(doomed, F.lit(False)))


def cleanup_old_messages(
    messages: DataFrame, retention_days: int = 90, now: Column | None = None
) -> DataFrame:
    """Retention delete on message date (duplicate_remover.py:196-202)."""
    old = age_predicate("date", retention_days, now=now)
    return messages.filter(~F.coalesce(old, F.lit(False)))


def cleanup_old_content(
    content: DataFrame, retention_days: int = 90, now: Column | None = None
) -> DataFrame:
    """Retention delete on processed_at, success rows kept forever
    (duplicate_remover.py:205-211)."""
    old = age_predicate("processed_at", retention_days, now=now) & (
        F.col("status") != "success"
    )
    return content.filter(~F.coalesce(old, F.lit(False)))


@dataclass
class CleanupResult:
    messages: DataFrame
    content: DataFrame
    stats: dict


def _live_data_file_count(store) -> int:
    """Data files in a TableStore's live version dir (metadata and
    dot-files excluded) — the small-file metric index compaction is
    judged by."""
    import os

    v = store.current_version()
    if v is None:
        return 0
    n = 0
    for _root, _dirs, files in os.walk(os.path.join(store.path, v)):
        n += sum(1 for f in files if not f.startswith(("_", ".")))
    return n


def run_full_cleanup(
    messages: DataFrame,
    content: DataFrame,
    retention_days: int = 90,
    now: Column | None = None,
    lsh_index_store=None,
    lsh_index_buckets: int = 32,
) -> CleanupResult:
    """The weekly maintenance job (duplicate_remover.py:314-355):
    dedup both tables, null out orphan links, drop exhausted failures,
    apply retention, and report per-step deleted counts.

    ``lsh_index_store``: when the deployment also runs the streaming
    near-dup index (streaming/dedup.py lsh_index_batch), pass its
    TableStore here and the SAME maintenance job compacts the
    signature store (streaming/dedup.py compact_lsh_index — the
    lakehouse-OPTIMIZE analog): micro-batch merges accrete one file
    per touched bucket per batch, and compaction rewrites the live
    version to ~one file per bucket while preserving the ``__bkt``
    layout so subsequent merges stay differential. The stats dict
    gains ``index_files_before`` / ``index_files_after`` so the run
    report shows the reclaim, alongside the table-cleanup counts.

    Counting strategy: each step's input/output counts are actions; to
    avoid recomputing the whole lineage per count we cache the two
    final frames and derive step deltas from intermediate counts. At
    production scale the counts come from the table format's commit
    metrics instead.
    """
    m0, c0 = messages.count(), content.count()

    m1 = remove_duplicate_messages(messages)
    n_m1 = m1.count()

    c1 = remove_duplicate_content(content)
    n_c1 = c1.count()

    c2 = cleanup_failed_links(c1, now=now)
    n_c2 = c2.count()

    c3 = cleanup_old_content(c2, retention_days, now=now)
    n_c3 = c3.count()

    m2 = cleanup_old_messages(m1, retention_days, now=now)
    n_m2 = m2.count()

    # orphan rewrite last, against the final content set
    m3 = null_out_orphans(m2, c3)
    cleaned_links = (
        m2.filter(F.col("telegraph_link").isNotNull()).count()
        - m3.filter(F.col("telegraph_link").isNotNull()).count()
    )

    counts = {
        "deleted_messages": m0 - n_m1,
        "deleted_content": c0 - n_c1,
        "cleaned_links": cleaned_links,
        "deleted_failed": n_c1 - n_c2,
        "deleted_old_messages": n_m1 - n_m2,
        "deleted_old_content": n_c2 - n_c3,
    }
    stats = cleanup_summary(counts)
    if lsh_index_store is not None and lsh_index_store.exists():
        from pasta_pipeline_spark.streaming.dedup import compact_lsh_index

        # after the summary: file metrics are not deleted-row counts
        # and must not inflate total_cleaned
        stats["index_files_before"] = _live_data_file_count(lsh_index_store)
        compact_lsh_index(lsh_index_store, index_buckets=lsh_index_buckets)
        stats["index_files_after"] = _live_data_file_count(lsh_index_store)
    return CleanupResult(messages=m3, content=c3, stats=stats)
