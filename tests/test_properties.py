"""Property-based tests (SURVEY.md §5.4) — hypothesis generates the
batches; Spark round-trips are batched per example set to keep runtime
sane (one DataFrame per property, not per example)."""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import given, settings, strategies as st

from pasta_pipeline_spark.operators.merge import merge_upsert

KEYS = st.integers(min_value=0, max_value=9)
VALS = st.text(alphabet="abcxyz", min_size=0, max_size=5)
TS = st.integers(min_value=0, max_value=1000)


def _df(spark, rows):
    base = datetime(2024, 1, 1)
    data = [(k, v, base + timedelta(minutes=t)) for k, v, t in rows]
    return spark.createDataFrame(data, "id long, val string, ts timestamp")


def _state(df):
    return sorted((r["id"], r["val"]) for r in df.collect())


@settings(max_examples=15, deadline=None)
@given(
    target=st.lists(st.tuples(KEYS, VALS, TS), max_size=12, unique_by=lambda r: r[0]),
    batch=st.lists(st.tuples(KEYS, VALS, TS), max_size=12),
)
def test_merge_idempotent(spark, target, batch):
    """merge(merge(T, B), B) == merge(T, B) for any target and batch."""
    t, b = _df(spark, target), _df(spark, batch)
    once = merge_upsert(t, b, key="id", order_col="ts")
    twice = merge_upsert(once, b, key="id", order_col="ts")
    assert _state(once) == _state(twice)


@settings(max_examples=15, deadline=None)
@given(
    target=st.lists(st.tuples(KEYS, VALS, TS), max_size=10, unique_by=lambda r: r[0]),
    batch_a=st.lists(
        st.tuples(st.integers(0, 4), VALS, TS), max_size=8, unique_by=lambda r: r[0]
    ),
    batch_b=st.lists(
        st.tuples(st.integers(5, 9), VALS, TS), max_size=8, unique_by=lambda r: r[0]
    ),
)
def test_merge_commutes_for_disjoint_batches(spark, target, batch_a, batch_b):
    """Non-overlapping batches can apply in either order (SURVEY.md §5.4)."""
    t = _df(spark, target)
    ab = merge_upsert(
        merge_upsert(t, _df(spark, batch_a), key="id", order_col="ts"),
        _df(spark, batch_b),
        key="id",
        order_col="ts",
    )
    ba = merge_upsert(
        merge_upsert(t, _df(spark, batch_b), key="id", order_col="ts"),
        _df(spark, batch_a),
        key="id",
        order_col="ts",
    )
    assert _state(ab) == _state(ba)


@settings(max_examples=15, deadline=None)
@given(
    rows=st.lists(st.tuples(KEYS, VALS, TS), min_size=1, max_size=15),
)
def test_dedup_result_is_duplicate_free_and_keeps_max(spark, rows):
    """keep_latest output has one row per key, and it carries the
    maximum order value present for that key."""
    from pyspark.sql import functions as F

    from pasta_pipeline_spark.operators.dedup import keep_latest

    df = _df(spark, rows)
    out = keep_latest(df, "id", "ts", tiebreak="val")
    got = out.collect()
    assert len({r["id"] for r in got}) == len(got)
    expected_max = {
        r["id"]: r["mx"]
        for r in df.groupBy("id").agg(F.max("ts").alias("mx")).collect()
    }
    for r in got:
        assert r["ts"] == expected_max[r["id"]]
