"""As-of join and bucketized range join (SURVEY.md §2.3 time-series
extensions): semantics against hand-computed fixtures and pandas
merge_asof, plus the plan-shape guarantee that neither operator ever
degenerates to a nested-loop/cartesian join."""

from __future__ import annotations

from datetime import datetime, timedelta

import pandas as pd
import pytest

from pyspark.sql import functions as F

from pasta_pipeline_spark.operators.asof import asof_join, asof_join_tolerance

T0 = datetime(2024, 1, 1, 12, 0, 0)


def _ts(minutes: float) -> datetime:
    return T0 + timedelta(minutes=minutes)


@pytest.fixture()
def trades(spark):
    return spark.createDataFrame(
        [
            (1, "A", _ts(0), 100.0),
            (2, "A", _ts(5), 101.0),
            (3, "A", _ts(10), 102.0),
            (4, "B", _ts(3), 200.0),
            (5, "C", _ts(1), 300.0),  # no quotes for C at all
        ],
        "trade_id long, sym string, ts timestamp, px double",
    )


@pytest.fixture()
def quotes(spark):
    return spark.createDataFrame(
        [
            ("A", _ts(-1), 99.5),
            ("A", _ts(5), 100.5),   # exactly at trade 2 → inclusive match
            ("A", _ts(7), 101.5),
            ("B", _ts(4), 199.5),   # after B's only trade
        ],
        "sym string, ts timestamp, bid double",
    )


def _rows(df):
    return {r["trade_id"]: (r["ts_matched"], r["bid_matched"]) for r in df.collect()}


def test_asof_backward_inclusive(spark, trades, quotes):
    out = asof_join(
        trades, quotes, on=["sym"], left_ts="ts", right_ts="ts", value_cols=["bid"]
    )
    got = _rows(out)
    assert got[1] == (_ts(-1), 99.5)   # only the -1min quote precedes
    assert got[2] == (_ts(5), 100.5)   # equal timestamp matches (inclusive)
    assert got[3] == (_ts(7), 101.5)   # latest of the three
    assert got[4] == (None, None)      # B's quote is later than its trade
    assert got[5] == (None, None)      # no C quotes → LEFT semantics
    assert out.count() == trades.count()  # every left row survives exactly once


def test_asof_matches_pandas_merge_asof(spark, trades, quotes):
    out = asof_join(
        trades, quotes, on=["sym"], left_ts="ts", right_ts="ts", value_cols=["bid"]
    )
    got = {r["trade_id"]: r["bid_matched"] for r in out.collect()}

    lp = trades.toPandas().sort_values("ts")
    rp = quotes.toPandas().sort_values("ts")
    ref = pd.merge_asof(lp, rp, on="ts", by="sym", direction="backward")
    want = {
        int(r.trade_id): (None if pd.isna(r.bid) else float(r.bid))
        for r in ref.itertuples()
    }
    assert got == want


def test_asof_forward(spark, trades, quotes):
    out = asof_join(
        trades,
        quotes,
        on=["sym"],
        left_ts="ts",
        right_ts="ts",
        value_cols=["bid"],
        direction="forward",
    )
    got = _rows(out)
    assert got[1] == (_ts(5), 100.5)   # earliest quote at-or-after 12:00
    assert got[2] == (_ts(5), 100.5)   # inclusive on the forward side too
    assert got[3] == (None, None)      # nothing after 12:10
    assert got[4] == (_ts(4), 199.5)


def test_asof_tolerance(spark, trades, quotes):
    out = asof_join_tolerance(
        trades,
        quotes,
        on=["sym"],
        left_ts="ts",
        right_ts="ts",
        value_cols=["bid"],
        tolerance_seconds=120,
    )
    got = _rows(out)
    assert got[1] == (_ts(-1), 99.5)   # 1 minute back — inside tolerance
    assert got[2] == (_ts(5), 100.5)
    assert got[3] == (None, None)      # 3 minutes back — stale, nulled
    assert got[4] == (None, None)
    assert out.count() == trades.count()  # stale match nulls values, keeps row


def test_asof_plan_single_shuffle_no_nested_loop(spark, trades, quotes):
    out = asof_join(
        trades, quotes, on=["sym"], left_ts="ts", right_ts="ts", value_cols=["bid"]
    )
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    import re

    n_exchanges = len(re.findall(r"^\(\d+\) Exchange", plan, flags=re.MULTILINE))
    assert n_exchanges == 1, f"expected 1 shuffle (union+window), got {n_exchanges}"


def test_asof_null_attribute_stays_null(spark):
    """A NULL attribute in the matched right row must surface as NULL —
    not reach back to an older non-null row (the struct-packing
    property; per-column last(ignorenulls) would get this wrong)."""
    left = spark.createDataFrame(
        [(1, "A", _ts(10))], "id long, k string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("A", _ts(1), 1.0), ("A", _ts(5), None)],
        "k string, ts timestamp, v double",
    )
    out = asof_join(left, right, on=["k"], left_ts="ts", right_ts="ts", value_cols=["v"])
    row = out.collect()[0]
    assert row["ts_matched"] == _ts(5)
    assert row["v_matched"] is None


# ---------------------------------------------------------------------------
# Bucketized range join
# ---------------------------------------------------------------------------

from pasta_pipeline_spark.operators.rangejoin import (  # noqa: E402
    interval_point_counts,
    interval_point_join,
)


@pytest.fixture()
def intervals(spark):
    return spark.createDataFrame(
        [
            (1, "A", _ts(0), _ts(10)),
            (2, "A", _ts(8), _ts(12)),    # overlaps interval 1
            (3, "B", _ts(0), _ts(10)),
            (4, "A", _ts(30), _ts(40)),   # empty window
            (5, "A", _ts(50), _ts(50)),   # zero-length → matches nothing
        ],
        "iid long, k string, w_start timestamp, w_end timestamp",
    )


@pytest.fixture()
def points(spark):
    return spark.createDataFrame(
        [
            (100, "A", _ts(0)),    # == start → included (half-open)
            (101, "A", _ts(9)),    # inside 1 and 2
            (102, "A", _ts(10)),   # == end of 1 → excluded from 1, inside 2
            (103, "B", _ts(5)),
            (104, "A", _ts(25)),   # in no interval
        ],
        "pid long, k string, ts timestamp",
    )


def test_range_join_half_open_containment(spark, intervals, points):
    pairs = interval_point_join(
        intervals, points, "w_start", "w_end", "ts", bin_seconds=300, keys=["k"]
    )
    got = sorted((r["iid"], r["pid"]) for r in pairs.collect())
    assert got == [(1, 100), (1, 101), (2, 101), (2, 102), (3, 103)]


def test_range_join_no_duplicate_pairs_across_bins(spark, intervals, points):
    # tiny bins force every interval across many buckets; each pair must
    # still appear exactly once (points live in a single bin)
    pairs = interval_point_join(
        intervals, points, "w_start", "w_end", "ts", bin_seconds=7, keys=["k"]
    )
    rows = [(r["iid"], r["pid"]) for r in pairs.collect()]
    assert len(rows) == len(set(rows))
    assert sorted(rows) == [(1, 100), (1, 101), (2, 101), (2, 102), (3, 103)]


def test_range_join_counts_keep_empty_intervals(spark, intervals, points):
    out = interval_point_counts(
        intervals,
        points,
        interval_id="iid",
        start_col="w_start",
        end_col="w_end",
        ts_col="ts",
        bin_seconds=300,
        keys=["k"],
    )
    got = {r["iid"]: r["n_points"] for r in out.collect()}
    assert got == {1: 2, 2: 2, 3: 1, 4: 0, 5: 0}


def test_range_join_plan_is_equi_no_nested_loop(spark, intervals, points):
    pairs = interval_point_join(
        intervals, points, "w_start", "w_end", "ts", bin_seconds=300, keys=["k"]
    )
    plan = pairs._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_range_join_catalog_plan_cartesian_free(spark):
    from pasta_pipeline_spark.queries.catalog import REGISTRY

    df = REGISTRY["range_join_windows"].spark_fn(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_peak_concurrency_sweep(spark):
    """Boundary-sweep semantics: overlap counting with half-open
    intervals (an end touching a start never double-counts), earliest
    peak timestamp on ties, degenerate/NULL intervals excluded, and
    the ungrouped form."""
    from pasta_pipeline_spark.operators.timeseries import peak_concurrency

    rows = [("a", 0, 10), ("a", 5, 15), ("a", 10, 20), ("a", 6, 8),
            ("b", 0, 5), ("b", 5, 10),
            ("c", 1, 1), ("c", None, 4)]
    df = spark.createDataFrame(rows, "g string, s long, e long")
    out = {r["g"]: (r["peak"], r["at_ts"])
           for r in peak_concurrency(df, "s", "e", "g").collect()}
    assert out["a"] == (3, 6)
    assert out["b"] == (1, 0)       # half-open: no touch double-count
    assert "c" not in out

    flat = peak_concurrency(df.where("g = 'a'"), "s", "e").collect()[0]
    assert (flat["peak"], flat["at_ts"]) == (3, 6)
