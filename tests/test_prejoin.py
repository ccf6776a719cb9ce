"""Bucket-membership pre-join reduction tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from pasta_pipeline_spark.operators.prejoin import (
    bucket_membership,
    prejoin_filter,
    reduced_join,
)


def test_prejoin_no_false_negatives_and_exact_join(spark):
    probe = spark.createDataFrame([(i, f"p{i}") for i in range(1000)], "k long, v string")
    build = spark.createDataFrame([(i * 37, f"b{i}") for i in range(20)], "k long, name string")
    direct = {(r["k"], r["name"]) for r in probe.join(build, "k").select("k", "name").collect()}
    reduced = {
        (r["k"], r["name"])
        for r in reduced_join(probe, build, on="k").select("k", "name").collect()
    }
    assert reduced == direct and len(direct) > 0


def test_prejoin_filter_keeps_all_matches_small_m(spark):
    # tiny m forces heavy false positives — matches must still all survive
    probe = spark.createDataFrame([(i,) for i in range(500)], "k long")
    build = spark.createDataFrame([(i,) for i in range(0, 500, 50)], "k long")
    kept = {r["k"] for r in prejoin_filter(probe, "k", build, "k", m=8).collect()}
    assert {i for i in range(0, 500, 50)} <= kept


def test_bucket_membership_bounded(spark):
    build = spark.createDataFrame([(i,) for i in range(10000)], "k long")
    assert bucket_membership(build, "k", m=64).count() <= 64


def test_reduced_join_rejects_outer_and_anti(spark):
    """The prefilter drops unmatched probe rows, so any join type that
    must observe them (outer/anti) is rejected, not silently wrong."""
    import pytest

    probe = spark.createDataFrame([(1,), (2,)], "k long")
    build = spark.createDataFrame([(1,)], "k long")
    for how in ("left", "left_outer", "full", "full_outer", "left_anti", "right"):
        with pytest.raises(ValueError, match="reduced_join"):
            reduced_join(probe, build, on="k", how=how)
    # semi is membership-compatible: equals the direct semi join
    direct = {r["k"] for r in probe.join(build, "k", "left_semi").collect()}
    got = {r["k"] for r in reduced_join(probe, build, on="k", how="left_semi").collect()}
    assert got == direct


def test_prejoin_plan_broadcast_semi(spark):
    probe = spark.createDataFrame([(i,) for i in range(100)], "k long")
    build = spark.createDataFrame([(i,) for i in range(5)], "k long")
    out = prejoin_filter(probe, "k", build, "k")
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "LeftSemi" in plan and "BroadcastHashJoin" in plan
