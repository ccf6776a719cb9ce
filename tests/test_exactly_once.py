"""Intra-batch retry idempotence for the stateful foreachBatch sinks.

Structured Streaming re-runs a crashed micro-batch with the SAME batch
id and rows (at-least-once foreachBatch). These tests drive the
extracted step bodies directly and apply every micro-batch TWICE with
the same id — the worst retry case (all side effects of the first
attempt landed, then the whole step re-runs) — and assert the final
state/report is byte-identical to the single-application run. Partial
crashes (a prefix of the step's writes landed) are strictly easier:
the appends are INSERT OVERWRITE by ``__mb`` partition and the state
rows recompute against the pinned pre-version (streaming/
exactly_once.py), so a retry replaces rather than re-applies.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_pair_lifecycle_retry_is_idempotent(spark, tmp_table_dir):
    """Every micro-batch applied twice (same mb id) == applied once ==
    the batch pair_history_report, including the hard case: a retried
    batch whose first attempt CLOSED an island and merged the new open
    island into state. Without pre-version pinning the retry would
    re-derive islands against post-merge state and lose the closed
    delta; without __mb overwrite it would double-append."""
    from pasta_pipeline_spark.operators.pair_ttl import pair_history_report
    from pasta_pipeline_spark.sources.tables import TableStore
    from pasta_pipeline_spark.streaming.pair_lifecycle import (
        apply_lifecycle_batch,
        lifecycle_report,
    )

    hist = [
        (1, 2, 0), (3, 4, 0),
        (1, 2, 1),
        (5, 6, 4),
        (1, 2, 5),            # reopens past ttl=2 -> first island CLOSES
        (3, 4, 5), (3, 4, 5),
        (7, 8, 8), (1, 2, 8),
    ]
    schema = "doc_a long, doc_b long, batch_id long"
    expected = {
        tuple(r)
        for r in pair_history_report(
            spark.createDataFrame(hist, schema), ttl=2
        ).collect()
    }

    state = TableStore(spark, f"{tmp_table_dir}/rl_state")
    aux = f"{tmp_table_dir}/rl_aux"
    waves = [
        [r for r in hist if r[2] <= 1],
        [r for r in hist if 2 <= r[2] <= 5],
        [r for r in hist if r[2] > 5],
    ]
    for mb_id, wave in enumerate(waves):
        batch = spark.createDataFrame(wave, schema)
        apply_lifecycle_batch(batch, mb_id, state, aux, ttl=2)
        # simulated intra-batch retry: same id, same rows, full re-run
        apply_lifecycle_batch(batch, mb_id, state, aux, ttl=2)

    got = {tuple(r) for r in lifecycle_report(spark, state, aux).collect()}
    assert got == expected
    st = state.read().collect()
    assert len(st) == 4 and all(r["e"] >= r["s"] for r in st)

    # the delta log holds each closed island ONCE (overwrite, not
    # re-append). Closed islands in this history with ttl=2:
    # (1,2) [0,2] and (3,4) [0,1] close at wave 2; (1,2) [5,6]
    # closes at wave 3 — exactly 3 islands = 6 delta rows.
    deltas = sorted(
        (r["bt"], r["d"])
        for r in spark.read.parquet(f"{aux}/closed_deltas").collect()
    )
    assert deltas == sorted([(0, 1), (3, -1), (0, 1), (2, -1), (5, 1), (7, -1)])


def test_datacard_retry_is_idempotent(spark, tmp_table_dir):
    """Additive data-card counters survive a full re-run of each
    micro-batch: live card == batch card, with no double counting of
    n_docs / total_chars / duplication mass."""
    from pasta_pipeline_spark.operators.stats import corpus_datacard
    from pasta_pipeline_spark.sources.tables import TableStore
    from pasta_pipeline_spark.streaming.sink import (
        apply_datacard_batch,
        datacard_from_state,
    )

    schema = "doc_id long, text string, source string, lang string"
    waves = [
        [(i, f"text {i % 9}" if i % 4 else "dup text", f"s{i % 3}",
          "en" if i % 2 else "de") for i in range(40)],
        [(100 + i, f"more {i % 5}", f"s{i % 5}", "fr" if i % 3 == 0 else "en")
         for i in range(35)],
    ]
    stores = [
        TableStore(spark, f"{tmp_table_dir}/rdc_{k}")
        for k in ("src", "txt", "lang")
    ]
    marker = f"{tmp_table_dir}/rdc_marker.json"
    for mb_id, wave in enumerate(waves):
        batch = spark.createDataFrame(wave, schema)
        apply_datacard_batch(batch, mb_id, *stores, marker_path=marker)
        apply_datacard_batch(batch, mb_id, *stores, marker_path=marker)

    all_df = spark.createDataFrame(waves[0] + waves[1], schema)
    batch_card = {r["metric"]: r["value"] for r in corpus_datacard(all_df).collect()}
    live = {
        r["metric"]: r["value"]
        for r in datacard_from_state(spark, *stores).collect()
    }
    assert live == batch_card
