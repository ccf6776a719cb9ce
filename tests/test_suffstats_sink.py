"""sufficient_stats_sink factory (r8 verdict ask #5): the generic
pin → keyed-delta → law-merge → derive shape, its two new twins
(isotonic calibration, Type-7 interpolated quantiles), and the retry
idempotence contract. The ported sinks (summary/histogram/holt) keep
their own pre-existing suites — unchanged behavior is their gate."""

from __future__ import annotations


ISO_WAVES = [
    # (key, score in [0, 100), label)
    [(i, float(s), y) for i, (s, y) in enumerate(
        [(5, 0), (15, 0), (15, 1), (25, 1), (35, 0), (45, 1), (55, 1)]
    )],
    [(100 + i, float(s), y) for i, (s, y) in enumerate(
        # late mass for early bins + new high bins with a violation
        [(5, 1), (25, 0), (65, 0), (75, 1), (85, 1), (95, 1), (65, 1)]
    )],
]
ISO_SCHEMA = "id long, score double, label long"

Q_WAVES = [
    [(i, v) for i, v in enumerate([10.0, 12.5, 11.0, 14.75, 10.0, 13.2])],
    [(100 + i, v) for i, v in enumerate([9.5, 15.0, 12.5, 11.8, 16.25])],
]
Q_SCHEMA = "id long, value double"


def _stream_waves(spark, tmp_table_dir, waves, schema, sink_fn, store):
    src = f"{tmp_table_dir}/src"
    ckpt = f"{tmp_table_dir}/ckpt"
    for wave in waves:
        spark.createDataFrame(wave, schema).write.parquet(src, mode="append")
        stream = spark.readStream.schema(schema).parquet(src)
        sink_fn(stream, store, ckpt).awaitTermination(120)
    return store


def test_incremental_isotonic_equals_batch(spark, tmp_table_dir):
    from pasta_pipeline_spark.operators.isotonic import isotonic_calibration
    from pasta_pipeline_spark.sources.tables import TableStore
    from pasta_pipeline_spark.streaming.sink import (
        incremental_isotonic_sink,
        isotonic_report_from_state,
    )
    from pyspark.sql import functions as F

    store = TableStore(spark, f"{tmp_table_dir}/iso_state")
    _stream_waves(
        spark, tmp_table_dir, ISO_WAVES, ISO_SCHEMA,
        lambda s, st, ck: incremental_isotonic_sink(
            s, st, ck, score_bin_sql="CAST(score / 10 AS BIGINT)",
            label_sql="label = 1",
        ),
        store,
    )
    all_rows = spark.createDataFrame(ISO_WAVES[0] + ISO_WAVES[1], ISO_SCHEMA)
    want = [
        tuple(r)
        for r in isotonic_calibration(
            all_rows, F.expr("CAST(score / 10 AS BIGINT)"), F.expr("label = 1")
        ).collect()
    ]
    got = [tuple(r) for r in isotonic_report_from_state(store).collect()]
    assert got == want
    # monotone by construction
    isos = [r[3] for r in got]
    assert isos == sorted(isos)
    # wave 2's late bin-0 positive was absorbed: bin 0 has n=2
    state = {r["bin"]: (r["n"], r["s"]) for r in store.read().collect()}
    assert state[0] == (2, 1)


def test_incremental_quantiles_equals_batch(spark, tmp_table_dir):
    from pasta_pipeline_spark.operators.exact_quantiles import (
        interpolated_quantiles,
    )
    from pasta_pipeline_spark.sources.tables import TableStore
    from pasta_pipeline_spark.streaming.sink import (
        incremental_quantiles_sink,
        quantiles_report_from_state,
    )

    store = TableStore(spark, f"{tmp_table_dir}/q_state")
    _stream_waves(
        spark, tmp_table_dir, Q_WAVES, Q_SCHEMA,
        lambda s, st, ck: incremental_quantiles_sink(s, st, ck, "value"),
        store,
    )
    all_rows = spark.createDataFrame(Q_WAVES[0] + Q_WAVES[1], Q_SCHEMA)
    want = [
        tuple(r) for r in interpolated_quantiles(all_rows, "value", "id").collect()
    ]
    got = [tuple(r) for r in quantiles_report_from_state(store).collect()]
    assert got == want
    # duplicate values collapse in the histogram: 10.0 and 12.5 repeat
    state = {r["v_fp"]: r["cnt"] for r in store.read().collect()}
    assert state[1000] == 2 and state[1250] == 2


def test_suffstats_batch_apply_retry_idempotent(spark, tmp_table_dir):
    """Crash-mid-batch contract for BOTH twins: re-applying the same
    batch_id recomputes against the pinned pre-version — state is
    byte-identical, never double-counted."""
    from pasta_pipeline_spark.operators.isotonic import isotonic_bin_moments
    from pasta_pipeline_spark.sources.tables import TableStore
    from pasta_pipeline_spark.streaming.sink import apply_sufficient_stats_batch
    from pyspark.sql import functions as F

    store = TableStore(spark, f"{tmp_table_dir}/retry_state")
    marker = f"{tmp_table_dir}/retry_ckpt/_iso_mb.json"

    def apply(batch_rows, batch_id):
        b = spark.createDataFrame(batch_rows, ISO_SCHEMA)
        apply_sufficient_stats_batch(
            b, batch_id, store, marker,
            delta_fn=lambda x: isotonic_bin_moments(
                x, F.expr("CAST(score / 10 AS BIGINT)"), F.expr("label = 1")
            ),
            keys="bin", merge_laws={"n": "sum", "s": "sum"},
        )

    apply(ISO_WAVES[0], 0)
    once = sorted(tuple(r) for r in store.read().collect())
    apply(ISO_WAVES[0], 0)  # retry: must be a no-op on state
    assert sorted(tuple(r) for r in store.read().collect()) == once
    apply(ISO_WAVES[1], 1)  # next id advances the pin and adds
    n_total = sum(r["n"] for r in store.read().collect())
    assert n_total == len(ISO_WAVES[0]) + len(ISO_WAVES[1])
    # retry of batch 1 after it landed: still stable
    final = sorted(tuple(r) for r in store.read().collect())
    apply(ISO_WAVES[1], 1)
    assert sorted(tuple(r) for r in store.read().collect()) == final


def test_merge_laws_min_max(spark):
    """The non-additive laws: min/max fold with absence as identity —
    the summary port's contract in isolation."""
    from pasta_pipeline_spark.streaming.sink import merge_keyed_state

    prev = spark.createDataFrame(
        [(1, 5, 2, 9), (2, 3, 1, 4)], "k long, n long, min_x long, max_x long"
    )
    delta = spark.createDataFrame(
        [(1, 2, 1, 11), (3, 7, 0, 0)], "k long, n long, min_x long, max_x long"
    )
    got = {
        r["k"]: (r["n"], r["min_x"], r["max_x"])
        for r in merge_keyed_state(
            prev, delta, "k", {"n": "sum", "min_x": "min", "max_x": "max"}
        ).collect()
    }
    assert got == {1: (7, 1, 11), 2: (3, 1, 4), 3: (7, 0, 0)}


AB_SCHEMA = "event_id long, ts timestamp, user_id long, value double"


def _ab_waves():
    import datetime as dt

    w1, w2 = [], []
    eid = 0
    for u in range(1, 41):
        eid += 1
        w1.append((eid, dt.datetime(2024, 1, 20, 12), u, 40.0 + u))
        eid += 1
        # wave 2 delivers the PRE-period rows late — a running-estimate
        # sink could never repair theta; the user-keyed state absorbs it
        w2.append((eid, dt.datetime(2024, 1, 5, 12), u, 30.0 + u))
        if u % 3 == 0:
            eid += 1
            w2.append((eid, dt.datetime(2024, 1, 25, 12), u, 15.5))
    return [w1, w2]


def test_incremental_cuped_equals_batch(spark, tmp_table_dir):
    from pasta_pipeline_spark.operators.stat_tests import cuped_report
    from pasta_pipeline_spark.sources.tables import TableStore
    from pasta_pipeline_spark.streaming.sink import (
        cuped_report_from_state,
        incremental_cuped_sink,
    )

    waves = _ab_waves()
    store = TableStore(spark, f"{tmp_table_dir}/cuped_state")
    _stream_waves(
        spark, tmp_table_dir, waves, AB_SCHEMA,
        lambda s, st, ck: incremental_cuped_sink(s, st, ck),
        store,
    )
    all_rows = spark.createDataFrame(waves[0] + waves[1], AB_SCHEMA)
    want = [tuple(r) for r in cuped_report(all_rows).collect()]
    got = [tuple(r) for r in cuped_report_from_state(store).collect()]
    assert got == want
    # the late pre-period mass landed: every user has nonzero x
    assert all(r["x"] > 0 for r in store.read().collect())


def test_incremental_ratio_delta_equals_batch(spark, tmp_table_dir):
    from pasta_pipeline_spark.operators.stat_tests import ratio_metric_delta
    from pasta_pipeline_spark.sources.tables import TableStore
    from pasta_pipeline_spark.streaming.sink import (
        incremental_ratio_delta_sink,
        ratio_delta_report_from_state,
    )

    waves = _ab_waves()
    store = TableStore(spark, f"{tmp_table_dir}/ratio_state")
    _stream_waves(
        spark, tmp_table_dir, waves, AB_SCHEMA,
        lambda s, st, ck: incremental_ratio_delta_sink(s, st, ck),
        store,
    )
    all_rows = spark.createDataFrame(waves[0] + waves[1], AB_SCHEMA)
    want = [tuple(r) for r in ratio_metric_delta(all_rows).collect()]
    got = [tuple(r) for r in ratio_delta_report_from_state(store).collect()]
    assert got == want
    # y counts events per user: users divisible by 3 have 3, others 2
    y = {r["__u"]: r["y"] for r in store.read().collect()}
    assert y[3] == 3 and y[1] == 2


def test_cuped_batch_apply_retry_idempotent(spark, tmp_table_dir):
    from pasta_pipeline_spark.operators.stat_tests import cuped_user_stats
    from pasta_pipeline_spark.sources.tables import TableStore
    from pasta_pipeline_spark.streaming.sink import apply_sufficient_stats_batch

    waves = _ab_waves()
    store = TableStore(spark, f"{tmp_table_dir}/cuped_retry")
    marker = f"{tmp_table_dir}/cuped_retry_ckpt/_cuped_mb.json"

    def apply(rows, bid):
        apply_sufficient_stats_batch(
            spark.createDataFrame(rows, AB_SCHEMA), bid, store, marker,
            delta_fn=lambda b: cuped_user_stats(b),
            keys="__u", merge_laws={"x": "sum", "y": "sum"},
        )

    apply(waves[0], 0)
    once = sorted(tuple(r) for r in store.read().collect())
    apply(waves[0], 0)  # crash-retry of the same batch id: no-op
    assert sorted(tuple(r) for r in store.read().collect()) == once
    apply(waves[1], 1)
    total_y = sum(r["y"] for r in store.read().collect())
    # y counts post-period value mass (floor(v*100)) — assert against
    # the direct computation
    want_y = sum(
        int(v * 100)
        for _, ts, _, v in waves[0] + waves[1]
        if ts.day >= 16
    )
    assert total_y == want_y
