"""Wave-22 operator unit tests: delta-method ratio metric."""

from __future__ import annotations

import datetime as dt


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def test_ratio_delta_constant_ratio_zero_variance(spark):
    from pasta_pipeline_spark.operators.stat_tests import ratio_metric_delta

    # every user: 2 events of value 5 -> ratio exactly 5 in both arms,
    # zero between-user variance -> se 0, z NULL (fail closed)
    rows = []
    eid = 0
    for u in range(1, 41):
        for _ in range(2):
            eid += 1
            rows.append((eid, dt.datetime(2024, 1, 5, 8, 0, 0), u, "view", 5.0))
    r = ratio_metric_delta(_events(spark, rows)).collect()[0]
    assert r["ratio0_sc"] == r["ratio1_sc"] == 500 * 1000000  # 5.0 * scale100
    assert r["diff_sc"] == 0 and r["se_sc"] == 0 and r["z_sc"] is None
    assert r["n_ctrl"] + r["n_treat"] == 40


def test_ratio_delta_detects_heterogeneity(spark):
    from pasta_pipeline_spark.operators.stat_tests import ratio_metric_delta

    # users differ in BOTH event count and value level: the
    # delta-method SE must be positive, and the ratio must equal
    # total value / total events per arm (not mean of per-user means)
    rows = []
    eid = 0
    for u in range(1, 31):
        k = 1 + (u % 4)
        for _ in range(k):
            eid += 1
            rows.append((eid, dt.datetime(2024, 1, 5, 8, 0, 0), u, "view", float(u)))
    df = _events(spark, rows)
    r = ratio_metric_delta(df).collect()[0]
    assert r["se_sc"] > 0
    # cross-check one arm's ratio against a direct computation
    from pasta_pipeline_spark.operators.sampling import sample_bucket
    import pyspark.sql.functions as F

    arm0 = df.withColumn("arm", sample_bucket(F.col("user_id"), 2)).where(
        "arm = 0"
    )
    tot = arm0.agg(
        F.sum(F.floor(F.col("value") * 100)).alias("x"), F.count("*").alias("y")
    ).collect()[0]
    import math

    assert r["ratio0_sc"] == math.floor(tot["x"] / tot["y"] * 1000000)


def test_ratio_delta_empty_arm_fails_closed(spark):
    from pasta_pipeline_spark.operators.stat_tests import ratio_metric_delta

    # a single user lands in one arm only -> the other is empty
    rows = [(1, dt.datetime(2024, 1, 5, 8, 0, 0), 7, "view", 3.0)]
    r = ratio_metric_delta(_events(spark, rows)).collect()[0]
    assert r["diff_sc"] is None and r["z_sc"] is None
