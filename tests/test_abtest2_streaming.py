"""A/B tier II streaming twins (r9 verdict ask #4): SRM, QTE, and
post-stratification maintained on the sufficient_stats_sink factory —
live readouts while the experiment runs must equal the batch operators
over everything ever ingested, under hostile arrival orders (late
per-user mass, strata surfacing late), with MicroBatchPin retries
idempotent."""

from __future__ import annotations

import datetime as dt

AB2_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, value double"
)


def _waves():
    """Wave 1: one event per user 1..60. Wave 2: REPEAT users (the SRM
    max-law dedup case), late value mass for users seen in wave 1 (the
    QTE sum-law repair case), and a lexicographically SMALLER stratum
    arriving late for every third user (the post-strat min-via-state
    case)."""
    w1, w2, eid = [], [], 0
    for u in range(1, 61):
        eid += 1
        w1.append((eid, dt.datetime(2024, 1, 10, 12), u, "m", 50.0 + (u % 11)))
    for u in range(1, 61):
        if u % 2 == 0:
            eid += 1
            w2.append((eid, dt.datetime(2024, 1, 12, 9), u, "m", 20.0 + (u % 7)))
        if u % 3 == 0:
            eid += 1
            # stratum "a" < "m": the user's batch-contract stratum
            # changes retroactively — only the min-from-state report
            # can get this right
            w2.append((eid, dt.datetime(2024, 1, 13, 9), u, "a", 5.0))
    return [w1, w2]


def _stream_waves(spark, tmp_table_dir, waves, sink_fn, store):
    src = f"{tmp_table_dir}/src"
    ckpt = f"{tmp_table_dir}/ckpt"
    for wave in waves:
        spark.createDataFrame(wave, AB2_SCHEMA).write.parquet(src, mode="append")
        stream = spark.readStream.schema(AB2_SCHEMA).parquet(src)
        sink_fn(stream, store, ckpt).awaitTermination(120)
    return store


def test_incremental_srm_equals_batch(spark, tmp_table_dir):
    from pasta_pipeline_spark.operators.abtest2 import srm_check
    from pasta_pipeline_spark.sources.tables import TableStore
    from pasta_pipeline_spark.streaming.sink import (
        incremental_srm_sink,
        srm_report_from_state,
    )

    waves = _waves()
    store = TableStore(spark, f"{tmp_table_dir}/srm_state")
    _stream_waves(
        spark, tmp_table_dir, waves,
        lambda s, st, ck: incremental_srm_sink(s, st, ck), store,
    )
    all_rows = spark.createDataFrame(waves[0] + waves[1], AB2_SCHEMA)
    want = [tuple(r) for r in srm_check(all_rows).collect()]
    got = [tuple(r) for r in srm_report_from_state(store).collect()]
    assert got == want
    # repeat users collapsed by the max law: state is 60 rows, not 90+
    assert store.read().count() == 60


def test_incremental_qte_equals_batch(spark, tmp_table_dir):
    from pasta_pipeline_spark.operators.abtest2 import quantile_treatment_effect
    from pasta_pipeline_spark.sources.tables import TableStore
    from pasta_pipeline_spark.streaming.sink import (
        incremental_qte_sink,
        qte_report_from_state,
    )

    waves = _waves()
    store = TableStore(spark, f"{tmp_table_dir}/qte_state")
    _stream_waves(
        spark, tmp_table_dir, waves,
        lambda s, st, ck: incremental_qte_sink(s, st, ck), store,
    )
    all_rows = spark.createDataFrame(waves[0] + waves[1], AB2_SCHEMA)
    want = [tuple(r) for r in quantile_treatment_effect(all_rows).collect()]
    got = [tuple(r) for r in qte_report_from_state(store).collect()]
    assert got == want
    # wave 2's late mass landed in user 2's sum: 50+2 then +22 → 7400
    y = {r["__u"]: r["y"] for r in store.read().collect()}
    assert y[2] == int(52.0 * 100) + int(22.0 * 100)


def test_incremental_post_strat_equals_batch(spark, tmp_table_dir):
    from pasta_pipeline_spark.operators.abtest2 import post_stratified_effect
    from pasta_pipeline_spark.sources.tables import TableStore
    from pasta_pipeline_spark.streaming.sink import (
        incremental_post_strat_sink,
        post_strat_report_from_state,
    )

    waves = _waves()
    store = TableStore(spark, f"{tmp_table_dir}/ps_state")
    _stream_waves(
        spark, tmp_table_dir, waves,
        lambda s, st, ck: incremental_post_strat_sink(
            s, st, ck, strata_col="event_type"
        ),
        store,
    )
    all_rows = spark.createDataFrame(waves[0] + waves[1], AB2_SCHEMA)
    want = [
        tuple(r)
        for r in post_stratified_effect(all_rows, strata_col="event_type").collect()
    ]
    got = [tuple(r) for r in post_strat_report_from_state(store).collect()]
    assert got == want
    # the late "a" stratum created a second state cell for user 3 …
    cells = {
        (r["__u"], r["s"]): r["y"] for r in store.read().collect()
    }
    assert (3, "m") in cells and (3, "a") in cells
    # … and the report's min-from-state reassigned the user to "a"
    # (asserted implicitly by got == want: the batch contract is MIN)


def test_ab2_suffstats_retry_idempotent(spark, tmp_table_dir):
    """Crash-mid-batch for the (user, stratum)-keyed twin: re-applying
    a batch id recomputes against the pinned pre-version — the
    COMPOSITE key path through MicroBatchPin stays exactly-once."""
    from pasta_pipeline_spark.sources.tables import TableStore
    from pasta_pipeline_spark.streaming.sink import apply_sufficient_stats_batch
    from pyspark.sql import functions as F

    waves = _waves()
    store = TableStore(spark, f"{tmp_table_dir}/ps_retry")
    marker = f"{tmp_table_dir}/ps_retry_ckpt/_post_strat_mb.json"

    def delta(batch):
        v = F.floor(F.col("value") * 100).cast("long")
        return batch.groupBy(
            F.col("user_id").alias("__u"), F.col("event_type").alias("s")
        ).agg(F.coalesce(F.sum(v), F.lit(0)).cast("long").alias("y"))

    def apply(rows, bid):
        apply_sufficient_stats_batch(
            spark.createDataFrame(rows, AB2_SCHEMA), bid, store, marker,
            delta_fn=delta, keys=["__u", "s"], merge_laws={"y": "sum"},
        )

    apply(waves[0], 0)
    once = sorted(tuple(r) for r in store.read().collect())
    apply(waves[0], 0)  # retry: no-op
    assert sorted(tuple(r) for r in store.read().collect()) == once
    apply(waves[1], 1)
    final = sorted(tuple(r) for r in store.read().collect())
    apply(waves[1], 1)  # late retry after landing: stable
    assert sorted(tuple(r) for r in store.read().collect()) == final
    total_y = sum(r["y"] for r in store.read().collect())
    want_y = sum(int(v * 100) for *_, v in waves[0] + waves[1])
    assert total_y == want_y


def test_trimmed_mean_live_from_qte_state(spark, tmp_table_dir):
    """The QTE sink's per-user state is sufficient for the trimmed
    mean too: the live trimmed readout over maintained state equals
    batch trimmed_mean_effect over everything ingested — one sink,
    two distributional readouts."""
    from pasta_pipeline_spark.operators.abtest2 import trimmed_mean_effect
    from pasta_pipeline_spark.sources.tables import TableStore
    from pasta_pipeline_spark.streaming.sink import (
        incremental_qte_sink,
        trimmed_mean_report_from_state,
    )

    waves = _waves()
    store = TableStore(spark, f"{tmp_table_dir}/qte_tm_state")
    _stream_waves(
        spark, tmp_table_dir, waves,
        lambda s, st, ck: incremental_qte_sink(s, st, ck), store,
    )
    all_rows = spark.createDataFrame(waves[0] + waves[1], AB2_SCHEMA)
    want = [tuple(r) for r in trimmed_mean_effect(all_rows).collect()]
    got = [tuple(r) for r in trimmed_mean_report_from_state(store).collect()]
    assert got == want


def test_incremental_srm_by_segment_equals_batch(spark, tmp_table_dir):
    """Per-segment SRM maintained on the (segment, user) exposure set:
    live == batch under repeat exposures across batches."""
    from pasta_pipeline_spark.operators.abtest2 import srm_by_segment
    from pasta_pipeline_spark.sources.tables import TableStore
    from pasta_pipeline_spark.streaming.sink import (
        incremental_srm_by_segment_sink,
        srm_by_segment_report_from_state,
    )

    waves = _waves()
    store = TableStore(spark, f"{tmp_table_dir}/srm_seg_state")
    _stream_waves(
        spark, tmp_table_dir, waves,
        lambda s, st, ck: incremental_srm_by_segment_sink(s, st, ck), store,
    )
    all_rows = spark.createDataFrame(waves[0] + waves[1], AB2_SCHEMA)
    want = [tuple(r) for r in srm_by_segment(all_rows).collect()]
    got = [tuple(r) for r in srm_by_segment_report_from_state(store).collect()]
    assert got == want
    # two segments ('m' everyone, 'a' the late every-third-user set);
    # repeats collapsed by the max law
    segs = {r["segment"] for r in store.read().collect()}
    assert segs == {"m", "a"}


def test_incremental_group_sequential_equals_batch(spark, tmp_table_dir):
    """Group-sequential live == batch AT EVERY INGEST POINT — the twin
    whose whole point is being read mid-experiment: after each wave
    the report over maintained (user, ts) state equals batch
    group_sequential_check over everything ingested SO FAR, including
    the hard case where wave 2 EXTENDS the time range and every
    O'Brien-Fleming look boundary moves."""
    from pasta_pipeline_spark.operators.abtest2 import group_sequential_check
    from pasta_pipeline_spark.sources.tables import TableStore
    from pasta_pipeline_spark.streaming.sink import (
        group_sequential_report_from_state,
        incremental_group_sequential_sink,
    )

    waves = _waves()
    store = TableStore(spark, f"{tmp_table_dir}/gseq_state")
    src = f"{tmp_table_dir}/gseq_src"
    ckpt = f"{tmp_table_dir}/gseq_ckpt"
    seen = []
    for wave in waves:
        spark.createDataFrame(wave, AB2_SCHEMA).write.parquet(src, mode="append")
        stream = spark.readStream.schema(AB2_SCHEMA).parquet(src)
        incremental_group_sequential_sink(stream, store, ckpt).awaitTermination(120)
        seen += wave
        all_rows = spark.createDataFrame(seen, AB2_SCHEMA)
        want = [tuple(r) for r in group_sequential_check(all_rows).collect()]
        got = [
            tuple(r) for r in group_sequential_report_from_state(store).collect()
        ]
        assert got == want  # every look row: boundary, z, crossed flag
    # state is the (user, ts) histogram: wave 1 has one ts for 60
    # users; wave 2 adds one more ts for evens and one for every third
    n_w2 = sum(1 for u in range(1, 61) if u % 2 == 0) + sum(
        1 for u in range(1, 61) if u % 3 == 0
    )
    assert store.read().count() == 60 + n_w2


def test_group_sequential_retry_idempotent(spark, tmp_table_dir):
    """Crash-mid-batch for the (user, ts)-keyed twin: re-applying a
    batch id recomputes against the pinned pre-version — exactly-once
    through MicroBatchPin for the event-histogram state."""
    from pasta_pipeline_spark.sources.tables import TableStore
    from pasta_pipeline_spark.streaming.sink import apply_sufficient_stats_batch
    from pyspark.sql import functions as F

    waves = _waves()
    store = TableStore(spark, f"{tmp_table_dir}/gseq_retry")
    marker = f"{tmp_table_dir}/gseq_retry_ckpt/_group_seq_mb.json"

    def delta(batch):
        v = F.floor(F.col("value") * 100).cast("long")
        return batch.groupBy(
            F.col("user_id").alias("__u"),
            F.unix_micros(F.col("ts")).alias("ts_us"),
        ).agg(
            F.coalesce(F.sum(F.coalesce(v, F.lit(0))), F.lit(0))
            .cast("long")
            .alias("yv")
        )

    def apply(rows, bid):
        apply_sufficient_stats_batch(
            spark.createDataFrame(rows, AB2_SCHEMA), bid, store, marker,
            delta_fn=delta, keys=["__u", "ts_us"], merge_laws={"yv": "sum"},
        )

    apply(waves[0], 0)
    once = sorted(tuple(r) for r in store.read().collect())
    apply(waves[0], 0)  # retry: no-op
    assert sorted(tuple(r) for r in store.read().collect()) == once
    apply(waves[1], 1)
    final = sorted(tuple(r) for r in store.read().collect())
    apply(waves[1], 1)
    assert sorted(tuple(r) for r in store.read().collect()) == final
    total = sum(r["yv"] for r in store.read().collect())
    want = sum(int(v * 100) for *_, v in waves[0] + waves[1])
    assert total == want
