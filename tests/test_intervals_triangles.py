"""SCD2 status intervals and degree-oriented triangle counting."""

from __future__ import annotations

import datetime as dt
import itertools

from pasta_pipeline_spark.operators.graph import triangle_count
from pasta_pipeline_spark.operators.timeseries import status_intervals


def _ts(i):
    return dt.datetime(2024, 3, 1) + dt.timedelta(hours=i)


def test_status_intervals_runs_and_bounds(spark):
    rows = [
        (1, _ts(0), 10, "a"),
        (1, _ts(1), 11, "a"),
        (1, _ts(2), 12, "b"),
        (1, _ts(3), 13, "a"),
        (2, _ts(0), 20, "x"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long, st string")
    out = sorted(
        status_intervals(df, "user_id", "ts", "st", "event_id").collect(),
        key=lambda r: (r["user_id"], r["run_seq"]),
    )
    u1 = [r for r in out if r["user_id"] == 1]
    assert [(r["st"], r["n_events"]) for r in u1] == [("a", 2), ("b", 1), ("a", 1)]
    # each run's valid_to chains to the next run's valid_from; last is open
    assert u1[0]["valid_to_sec"] == u1[1]["valid_from_sec"]
    assert u1[1]["valid_to_sec"] == u1[2]["valid_from_sec"]
    assert u1[2]["valid_to_sec"] is None
    u2 = [r for r in out if r["user_id"] == 2]
    assert len(u2) == 1 and u2[0]["valid_to_sec"] is None


def test_status_intervals_same_status_reappearing_is_new_run(spark):
    rows = [(1, _ts(i), i, "a" if i % 2 == 0 else "b") for i in range(6)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long, st string")
    out = status_intervals(df, "user_id", "ts", "st", "event_id").collect()
    assert len(out) == 6  # alternating statuses never merge


def _brute_triangles(edges):
    nodes = sorted({n for e in edges for n in e})
    es = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    return sum(
        1
        for a, b, c in itertools.combinations(nodes, 3)
        if (a, b) in es and (b, c) in es and (a, c) in es
    )


def test_triangle_count_matches_bruteforce(spark):
    # K4 plus a pendant and a disconnected edge: C(4,3)=4 triangles
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (8, 9)]
    df = spark.createDataFrame(edges, "src long, dst long")
    (row,) = triangle_count(df).collect()
    assert row["n_triangles"] == _brute_triangles(edges) == 4


def test_triangle_count_ignores_direction_dups_and_loops(spark):
    edges = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 1), (2, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    (row,) = triangle_count(df).collect()
    assert row["n_triangles"] == 1


def test_triangle_count_star_has_none(spark):
    edges = [(0, i) for i in range(1, 8)]
    df = spark.createDataFrame(edges, "src long, dst long")
    (row,) = triangle_count(df).collect()
    assert row["n_triangles"] == 0


def test_triangle_count_hub_orientation(spark):
    # hub node 0 connected to everyone; ring among 1..6 adds triangles
    # only where ring edges close through the hub
    ring = [(i, i + 1) for i in range(1, 6)] + [(6, 1)]
    hub = [(0, i) for i in range(1, 7)]
    edges = ring + hub
    df = spark.createDataFrame(edges, "src long, dst long")
    (row,) = triangle_count(df).collect()
    assert row["n_triangles"] == _brute_triangles(edges) == 6
