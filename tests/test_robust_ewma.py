"""Robust stats (winsorize, MAD) and exact integer EWMA."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from pasta_pipeline_spark.operators.robust import mad_outliers, winsorize
from pasta_pipeline_spark.operators.timeseries import ewma_fold


def _ts(i):
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i)


def test_ewma_matches_hand_fold(spark):
    vals = [10.0, 20.0, 5.0, 40.0, 40.0, 0.5]
    rows = [(1, _ts(i), i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long, value double")
    out = {
        r["seq"]: r
        for r in ewma_fold(df, "user_id", "ts", "event_id", "value").collect()
    }

    # hand fold: fp = floor(v*10000); ewma = (9*prev + v) // 10 (trunc, nonneg)
    fps = [int(v * 10000) for v in vals]
    expect = [fps[0]]
    for v in fps[1:]:
        expect.append((expect[-1] * 9 + v) // 10)
    assert [out[i + 1]["ewma_fp"] for i in range(len(vals))] == expect
    assert [out[i + 1]["value_fp"] for i in range(len(vals))] == fps
    assert out[1]["event_id"] == 0 and out[len(vals)]["event_id"] == len(vals) - 1


def test_ewma_orders_by_ts_then_tiebreak(spark):
    # same timestamp: event_id breaks the tie, so the fold order is fixed
    rows = [(1, _ts(0), 2, 30.0), (1, _ts(0), 1, 10.0), (1, _ts(1), 3, 20.0)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long, value double")
    out = sorted(
        ewma_fold(df, "user_id", "ts", "event_id", "value").collect(),
        key=lambda r: r["seq"],
    )
    assert [r["event_id"] for r in out] == [1, 2, 3]
    assert out[0]["ewma_fp"] == 100000
    assert out[1]["ewma_fp"] == (100000 * 9 + 300000) // 10


def test_winsorize_bounds_and_flags(spark):
    vals = list(range(1, 21)) + [1000]  # one wild high value
    df = spark.createDataFrame(
        [(i, "g", float(v)) for i, v in enumerate(vals)], "id long, g string, v double"
    )
    out = winsorize(df, "v", ["g"], lower=0.05, upper=0.95)
    rows = out.collect()
    assert len(rows) == len(vals)
    lo, hi = rows[0]["p_lo"], rows[0]["p_hi"]
    assert all(lo <= r["v_w"] <= hi for r in rows)
    assert sum(r["clamped_high"] for r in rows) >= 1
    inside = [r for r in rows if lo <= r["v"] <= hi]
    assert all(r["v_w"] == r["v"] for r in inside)


def test_mad_flags_only_true_outliers(spark):
    base = [float(v) for v in (10, 11, 12, 13, 14, 15, 16, 17, 18, 19)]
    wild = [1000.0, -1000.0]
    df = spark.createDataFrame(
        [(i, "g", v) for i, v in enumerate(base + wild)], "id long, g string, v double"
    )
    out = mad_outliers(df, "v", ["g"], k=3.0).collect()
    assert len(out) == 1
    row = out[0]
    assert row["n_rows"] == 12
    assert row["n_outliers"] == 2  # exactly the two wild rows
    assert 10 <= row["med"] <= 19


def test_mad_multi_group_independent(spark):
    rows = [("a", float(v)) for v in range(100)] + [("b", 5.0)] * 5 + [("b", 500.0)]
    df = spark.createDataFrame(
        [(i, g, v) for i, (g, v) in enumerate(rows)], "id long, g string, v double"
    )
    out = {r["g"]: r for r in mad_outliers(df, "v", ["g"], k=3.0).collect()}
    assert out["b"]["mad"] == 0.0
    assert out["b"]["n_outliers"] == 1  # dev > 0 only for the 500 row
    assert out["a"]["n_outliers"] == 0  # uniform spread: nothing beyond 3*MAD


def test_winsorize_join_is_broadcast(spark):
    df = spark.createDataFrame(
        [(i, "g", float(i)) for i in range(50)], "id long, g string, v double"
    )
    plan = winsorize(df, "v", ["g"])._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_winsorized_stats_bounds_and_mean(spark):
    """Winsorize semantics: exact percentile-disc bounds on a known
    sequence, outliers clamped into the mean rather than dropped
    (row count stable), untouched groups report zero clips, and the
    ungrouped form works."""
    from pasta_pipeline_spark.operators.robust import winsorized_stats

    rows = [("a", i) for i in range(1, 101)] + [("a", 100000), ("a", -50000)]
    rows += [("b", 7)] * 10
    df = spark.createDataFrame(rows, "g string, v long")
    out = {r["g"]: r for r in winsorized_stats(df, "v", "g").collect()}
    a = out["a"]
    # n=102: lo rank (500*102) div 10000 = 5 -> sorted[-50000,1..100,1e5][5]=4
    assert (a["lo_bound"], a["hi_bound"]) == (4, 95)
    assert (a["n_clipped_lo"], a["n_clipped_hi"]) == (4, 6)
    assert a["n"] == 102
    # clamped mean: values 4,4,4,4,4..95 capped, outliers pulled in
    assert 45 <= a["wmean"] <= 55
    b = out["b"]
    assert (b["wmean"], b["n_clipped_lo"], b["n_clipped_hi"]) == (7, 0, 0)

    g = winsorized_stats(df.where("g = 'b'"), "v").collect()[0]
    assert g["n"] == 10 and g["wmean"] == 7
