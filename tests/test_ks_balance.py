"""Exact KS drift + balanced-label sampling (round 6) — unit checks;
the oracle layer pins both at sf0.01 (catalog: length_drift_ks,
balanced_label_sample)."""

from __future__ import annotations

import pyspark.sql.functions as F


class TestKsDrift:
    def test_identical_slices_score_zero(self, spark):
        # every value appears once in each slice — ECDFs coincide
        rows = [(2 * i + g, i % 7, g) for i in range(50) for g in (0, 1)]
        df = spark.createDataFrame(rows, "id long, x long, g long")
        from pasta_pipeline_spark.operators.divergence import ks_drift

        r = ks_drift(df, "x", F.col("g") == 0).collect()[0]
        assert r["ks_num"] == 0 and r["ks_fp"] == 0
        assert r["n_a"] == 50 and r["n_b"] == 50

    def test_disjoint_slices_score_max(self, spark):
        # A entirely below B ⇒ KS = 1 (10000 bp) at A's max value
        rows = [(i, 10, 1) for i in range(20)] + [(100 + i, 99, 0) for i in range(30)]
        df = spark.createDataFrame(rows, "id long, x long, g long")
        from pasta_pipeline_spark.operators.divergence import ks_drift

        r = ks_drift(df, "x", F.col("g") == 1).collect()[0]
        assert r["ks_fp"] == 10000
        assert r["x_at_max"] == 10
        assert r["ks_num"] == r["n_a"] * r["n_b"]

    def test_hand_computed_sup(self, spark):
        # A = {1,2,3}, B = {2,3,4}: sup |F_A - F_B| = 1/3 at x=1
        rows = [(1, 1, 1), (2, 2, 1), (3, 3, 1), (4, 2, 0), (5, 3, 0), (6, 4, 0)]
        df = spark.createDataFrame(rows, "id long, x long, g long")
        from pasta_pipeline_spark.operators.divergence import ks_drift

        r = ks_drift(df, "x", F.col("g") == 1).collect()[0]
        assert (r["ks_num"], r["x_at_max"]) == (3, 1)  # |1*3 - 0*3| at x=1
        assert r["ks_fp"] == 3333


class TestBalancedLabelSample:
    def test_every_class_at_min_count(self, spark):
        rows = [(i, "a") for i in range(10)]
        rows += [(100 + i, "b") for i in range(4)]
        rows += [(200 + i, "c") for i in range(7)]
        df = spark.createDataFrame(rows, "id long, label string")
        from pasta_pipeline_spark.operators.sampling import balanced_label_sample

        out = balanced_label_sample(df, "id", "label").collect()
        per = {}
        for r in out:
            per.setdefault(r["label"], set()).add(r["id"])
        assert {len(v) for v in per.values()} == {4}
        # minority class keeps everything
        assert per["b"] == {100, 101, 102, 103}

    def test_deterministic_across_runs(self, spark):
        rows = [(i, i % 3) for i in range(60)]
        df = spark.createDataFrame(rows, "id long, label int")
        from pasta_pipeline_spark.operators.sampling import balanced_label_sample

        a = {(r["id"], r["rk"]) for r in balanced_label_sample(df, "id", "label").collect()}
        b = {(r["id"], r["rk"]) for r in balanced_label_sample(df, "id", "label").collect()}
        assert a == b and len(a) == 60


def test_incremental_ks_retry_and_batch_equivalence(spark, tmp_table_dir):
    """Micro-batched KS state (each batch applied TWICE with the same
    mb id — the worst intra-batch retry) must reproduce the batch
    ks_drift report exactly."""
    from pasta_pipeline_spark.operators.divergence import ks_drift
    from pasta_pipeline_spark.sources.tables import TableStore
    from pasta_pipeline_spark.streaming.sink import (
        apply_ks_batch,
        ks_report_from_state,
    )

    rows = [(i, (i * 7) % 23 + (3 if i % 2 else 0), i % 2) for i in range(90)]
    schema = "id long, x long, g long"
    expected = {
        tuple(r)
        for r in ks_drift(
            spark.createDataFrame(rows, schema), "x", F.col("g") == 0
        ).collect()
    }

    store = TableStore(spark, f"{tmp_table_dir}/ks_state")
    marker = f"{tmp_table_dir}/ks_mb.json"
    waves = [rows[:30], rows[30:55], rows[55:]]
    for mb_id, wave in enumerate(waves):
        batch = spark.createDataFrame(wave, schema)
        apply_ks_batch(batch, mb_id, store, marker, "x", F.col("g") == 0)
        # simulated intra-batch retry: same id, same rows, full re-run
        apply_ks_batch(batch, mb_id, store, marker, "x", F.col("g") == 0)

    got = {tuple(r) for r in ks_report_from_state(store).collect()}
    assert got == expected


def test_incremental_ks_sink_e2e_stream(spark, tmp_path):
    """Real writeStream e2e: a file-source stream drains through
    incremental_ks_sink (availableNow) and the maintained report
    equals the batch ks_drift over the same rows."""
    from pasta_pipeline_spark.operators.divergence import ks_drift
    from pasta_pipeline_spark.sources.tables import TableStore
    from pasta_pipeline_spark.streaming.sink import (
        incremental_ks_sink,
        ks_report_from_state,
    )

    rows = [(i, (i * 13) % 17 + (2 if i % 2 else 0), i % 2) for i in range(80)]
    src_dir = tmp_path / "ks_src"
    src_dir.mkdir()
    df = spark.createDataFrame(rows, "id long, x long, g long")
    df.coalesce(2).write.parquet(str(src_dir), mode="overwrite")

    stream = spark.readStream.schema("id long, x long, g long").option(
        "maxFilesPerTrigger", "1"
    ).parquet(str(src_dir))
    store = TableStore(spark, str(tmp_path / "ks_store"))
    q = incremental_ks_sink(
        stream, store, "x", F.col("g") == 0, str(tmp_path / "ks_ckpt")
    )
    q.awaitTermination(120)

    expected = {tuple(r) for r in ks_drift(df, "x", F.col("g") == 0).collect()}
    got = {tuple(r) for r in ks_report_from_state(store).collect()}
    assert got == expected
