"""rolling_range_agg and weighted_sample_topk unit tests."""

from __future__ import annotations

import math
from datetime import datetime

from pasta_pipeline_spark.operators.sampling import weighted_sample_topk
from pasta_pipeline_spark.operators.timeseries import rolling_range_agg


def test_rolling_range_frame_is_time_based(spark):
    base = datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, datetime(2024, 1, 1, 11, 0, 0), 1.0),   # 60 min before base
        (1, datetime(2024, 1, 1, 11, 30, 0), 2.0),  # 30 min before
        (1, base, 4.0),
        (1, datetime(2024, 1, 1, 14, 0, 0), 8.0),   # isolated
        (2, base, 100.0),                            # other key
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    got = {
        (r["user_id"], r["ts_us"]): r
        for r in rolling_range_agg(df, "user_id", "ts", "value", 3600).collect()
    }
    us = lambda dt: int(dt.timestamp() * 1_000_000)  # noqa: E731
    # at base: the 60-min-old row is INSIDE the inclusive [-1h, 0] frame
    r = got[(1, us(base))]
    assert r["n_win"] == 3 and r["sum_x"] == 70000 and r["avg_x"] == 23333
    # 30-min row: only itself and the 11:00 row
    r = got[(1, us(datetime(2024, 1, 1, 11, 30, 0)))]
    assert r["n_win"] == 2 and r["sum_x"] == 30000
    # isolated row: frame contains only itself
    r = got[(1, us(datetime(2024, 1, 1, 14, 0, 0)))]
    assert r["n_win"] == 1 and r["avg_x"] == 80000
    # keys don't leak
    assert got[(2, us(base))]["n_win"] == 1


def test_rolling_simultaneous_events_are_peers(spark):
    t = datetime(2024, 1, 1, 9, 0, 0)
    df = spark.createDataFrame(
        [(1, t, 1.0), (1, t, 2.0)], "user_id long, ts timestamp, value double"
    )
    rows = rolling_range_agg(df, "user_id", "ts", "value", 3600).collect()
    # RANGE frame: ties are peers — both rows see both values
    assert [r["n_win"] for r in rows] == [2, 2]
    assert all(r["sum_x"] == 30000 for r in rows)


def test_weighted_sample_every_positive_weight_can_win(spark):
    # one group, k = n: everything with positive weight survives with a
    # dense deterministic ranking; zero/NULL weights are excluded
    rows = [(i, "g", float(i)) for i in range(1, 11)] + [(99, "g", 0.0), (100, "g", None)]
    df = spark.createDataFrame(rows, "id long, g string, w double")
    got = weighted_sample_topk(df, "id", "w", k=12, group_col="g").collect()
    assert sorted(r["id"] for r in got) == list(range(1, 11))
    assert sorted(r["rk"] for r in got) == list(range(1, 11))


def test_weighted_sample_is_deterministic_and_biased(spark):
    # 500 groups, each containing one heavy (w=50) and nine light (w=1)
    # rows; the heavy row should win far more than 1/10 of groups and
    # two invocations must agree exactly
    rows = []
    for g in range(500):
        for i in range(10):
            rows.append((g * 100 + i, g, 50.0 if i == 0 else 1.0))
    df = spark.createDataFrame(rows, "id long, g long, w double")
    a = weighted_sample_topk(df, "id", "w", k=1, group_col="g").collect()
    b = weighted_sample_topk(df, "id", "w", k=1, group_col="g").collect()
    assert sorted(r["id"] for r in a) == sorted(r["id"] for r in b)
    heavy_wins = sum(1 for r in a if r["id"] % 100 == 0)
    # E[wins] with A-ES = 500 * 50/59 ≈ 424; anything > 300 shows the
    # weighting is effective (plain uniform would give ~50)
    assert heavy_wins > 300, heavy_wins


def test_weighted_sample_matches_python_reference(spark):
    import hashlib

    rows = [(i, float((i % 7) + 1)) for i in range(1, 40)]
    df = spark.createDataFrame(rows, "id long, w double")
    got = sorted(r["id"] for r in weighted_sample_topk(df, "id", "w", k=5).collect())

    def score(i, w):
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)
        return math.log((h + 1) / float(1 << 60)) / w

    expect = sorted(
        i for i, _ in sorted(rows, key=lambda t: (-score(*t), t[0]))[:5]
    )
    assert got == expect


def test_weighted_sample_ungrouped_uses_take_ordered(spark):
    """Global top-k must compile to TakeOrderedAndProject (per-partition
    heap + driver merge), not a full-corpus single-partition window."""
    df = spark.createDataFrame([(i, 1.0 + i % 5) for i in range(200)], "id long, w double")
    out = weighted_sample_topk(df, "id", "w", k=5)
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "TakeOrderedAndProject" in plan
    assert sorted(r["rk"] for r in out.collect()) == [1, 2, 3, 4, 5]


def test_budget_sample_contract(spark):
    import pytest as _pytest

    from pasta_pipeline_spark.operators.sampling import budget_sample

    rows = [(i, "g1" if i < 20 else "g2", 10) for i in range(40)]
    # g2 gets one giant doc too
    rows.append((100, "g2", 500))
    df = spark.createDataFrame(rows, "id long, g string, sz long")
    out = budget_sample(df, "id", "sz", budget=45, group_col="g").collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r["g"], []).append(r)
    # each kept row started under budget; overshoot bounded by one row
    for g, kept in by_g.items():
        tot = sum(r["sz"] for r in kept)
        assert tot - max(r["sz"] for r in kept) < 45
        assert len(kept) >= 1
    # deterministic across runs
    again = budget_sample(df, "id", "sz", budget=45, group_col="g").collect()
    assert sorted(r["id"] for r in again) == sorted(r["id"] for r in out)
    with _pytest.raises(ValueError):
        budget_sample(df, "id", "sz", budget=45, group_col=None)


def test_budget_sample_keeps_one_even_if_oversized(spark):
    from pasta_pipeline_spark.operators.sampling import budget_sample

    df = spark.createDataFrame([(1, "g", 1000)], "id long, g string, sz long")
    out = budget_sample(df, "id", "sz", budget=10, group_col="g").collect()
    assert len(out) == 1  # first row always kept: a mix never drops a source


def test_budget_sample_global_no_single_partition_and_correct(spark):
    from pasta_pipeline_spark.operators.sampling import budget_sample_global
    from pasta_pipeline_spark.operators.util import release_cached_deps

    df = spark.createDataFrame([(i, 10) for i in range(300)], "id long, sz long")
    out = budget_sample_global(df, "id", "sz", budget=95, num_partitions=6)
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "SinglePartition" not in plan
    rows = out.collect()
    release_cached_deps(out)
    # 95-byte budget over 10-byte rows: exactly 10 kept (10th starts at 90 < 95)
    assert len(rows) == 10
    assert max(r["cum_size"] for r in rows) == 100
    # deterministic selection: same ids on a rerun
    again = budget_sample_global(df, "id", "sz", budget=95, num_partitions=6)
    assert sorted(r["id"] for r in again.collect()) == sorted(r["id"] for r in rows)
    release_cached_deps(again)
