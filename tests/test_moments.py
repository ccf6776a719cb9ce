"""Exact-moment correlation/regression operator."""

from __future__ import annotations

import math

from pasta_pipeline_spark.operators.moments import correlation_regression


def _stats(rows):
    """Reference computation over the floored values, plain Python."""
    xs = [math.floor(x) for x, _ in rows]
    ys = [math.floor(y) for _, y in rows]
    n = len(rows)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx, syy = sum(x * x for x in xs), sum(y * y for y in ys)
    num = n * sxy - sx * sy
    denx, deny = n * sxx - sx * sx, n * syy - sy * sy
    r = num / math.sqrt(denx * deny)
    slope = num / denx
    intercept = (sy - slope * sx) / n
    return (
        math.floor(r * 1_000_000),
        math.floor(slope * 1_000_000),
        math.floor(intercept * 1_000_000),
    )


def test_regression_matches_python_reference(spark):
    rows = [(1.0, 2.2), (2.0, 3.9), (3.0, 6.1), (4.0, 8.4), (5.0, 9.7)]
    df = spark.createDataFrame([("g",) + r for r in rows], "g string, x double, y double")
    got = correlation_regression(df, "x", "y", group_by=["g"]).collect()[0]
    exp_r, exp_slope, exp_int = _stats(rows)
    assert (got["corr_fp"], got["slope_fp"], got["intercept_fp"]) == (
        exp_r,
        exp_slope,
        exp_int,
    )
    assert got["n"] == 5


def test_regression_constant_x_yields_nulls_not_nan(spark):
    df = spark.createDataFrame(
        [(2.0, 1.0), (2.0, 5.0), (2.0, 9.0)], "x double, y double"
    )
    got = correlation_regression(df, "x", "y").collect()[0]
    assert got["corr_fp"] is None and got["slope_fp"] is None
    assert got["intercept_fp"] is None


def test_regression_ignores_null_rows(spark):
    df = spark.createDataFrame(
        [(1.0, 1.0), (2.0, 2.0), (None, 9.0), (3.0, None), (3.0, 3.0)],
        "x double, y double",
    )
    got = correlation_regression(df, "x", "y").collect()[0]
    assert got["n"] == 3 and got["corr_fp"] == 1_000_000  # perfect fit y=x
