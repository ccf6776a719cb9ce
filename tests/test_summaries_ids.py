"""Mergeable summaries and sequential-id assignment unit tests."""

from __future__ import annotations

from pasta_pipeline_spark.operators.ids import assign_sequential_ids
from pasta_pipeline_spark.operators.summaries import (
    finalize_summary,
    merge_summaries,
    partial_summary,
)


def test_summary_merge_equals_direct(spark):
    rows = [("a", float(i)) for i in range(100)] + [("b", float(i * 3)) for i in range(7)]
    df = spark.createDataFrame(rows, "k string, v double")
    direct = {
        r["k"]: r for r in finalize_summary(partial_summary(df, "k", "v")).collect()
    }
    h1 = partial_summary(df.limit(40), "k", "v")   # arbitrary split
    h2 = partial_summary(df.subtract(df.limit(40)), "k", "v")
    merged = {
        r["k"]: r for r in finalize_summary(merge_summaries(h1, h2, "k")).collect()
    }
    # int64 state merges to the identical bits; doubles therefore match
    # exactly, not approximately
    assert direct == merged


def test_summary_merge_is_associative(spark):
    a = spark.createDataFrame([("k", 1.5), ("k", 2.25)], "g string, v double")
    b = spark.createDataFrame([("k", -3.75)], "g string, v double")
    c = spark.createDataFrame([("k", 100.0), ("j", 1.0)], "g string, v double")
    sa, sb, sc = (partial_summary(x, "g", "v") for x in (a, b, c))
    left = merge_summaries(merge_summaries(sa, sb, "g"), sc, "g")
    right = merge_summaries(sa, merge_summaries(sb, sc, "g"), "g")
    key = lambda r: r["g"]  # noqa: E731
    assert sorted(left.collect(), key=key) == sorted(right.collect(), key=key)


def test_summary_disjoint_keys_pass_through(spark):
    a = partial_summary(
        spark.createDataFrame([("x", 2.0)], "g string, v double"), "g", "v"
    )
    b = partial_summary(
        spark.createDataFrame([("y", 5.0)], "g string, v double"), "g", "v"
    )
    got = {r["g"]: r for r in merge_summaries(a, b, "g").collect()}
    assert got["x"]["n"] == 1 and got["x"]["sum_x"] == 200
    assert got["y"]["n"] == 1 and got["y"]["sum_x"] == 500


def test_sequential_ids_match_global_order(spark):
    rows = [(i, f"g{i % 5}") for i in range(997)]
    df = spark.createDataFrame(rows, "id long, g string")
    got = assign_sequential_ids(df, ["g", "id"], num_partitions=7).collect()
    expect = {
        (g, i): rank + 1
        for rank, (g, i) in enumerate(sorted((r[1], r[0]) for r in rows))
    }
    assert len(got) == 997
    for r in got:
        assert r["seq_id"] == expect[(r["g"], r["id"])]


def test_sequential_ids_no_single_partition_window(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], "id long")
    out = assign_sequential_ids(df, "id", num_partitions=4)
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    # the scale-killer this operator exists to avoid: an empty window
    # partition spec compiling to Exchange SinglePartition
    assert "SinglePartition" not in plan


def test_sequential_ids_persist_pins_range_partitioning(spark):
    """The counts collect and the id pass MUST see the same range
    partitioning (repartitionByRange samples split points per job) —
    the operator persists the ranged frame and hands the cache to the
    caller for release."""
    from pasta_pipeline_spark.operators.util import release_cached_deps

    df = spark.createDataFrame([(i,) for i in range(500)], "id long")
    out = assign_sequential_ids(df, "id", num_partitions=8)
    deps = getattr(out, "_pasta_cached_deps", [])
    assert len(deps) == 1
    assert deps[0].storageLevel.useMemory or deps[0].storageLevel.useDisk
    got = sorted(r["seq_id"] for r in out.collect())
    assert got == list(range(1, 501))
    release_cached_deps(out)
    assert not (deps[0].storageLevel.useMemory or deps[0].storageLevel.useDisk)


def test_grouped_sequential_ids_match_grouped_window(spark):
    """assign_grouped_sequential_ids == row_number() OVER (PARTITION BY
    g ORDER BY v, id) — including a NULL group (its own partition, like
    SQL window semantics) and a skewed hot group."""
    from pasta_pipeline_spark.operators.ids import assign_grouped_sequential_ids

    rows = [
        (i, "en" if i % 2 == 0 else (None if i % 7 == 3 else f"l{i % 5}"), i * 37 % 101)
        for i in range(600)
    ]
    df = spark.createDataFrame(rows, "id long, g string, v long")
    got = {
        (r["g"], r["id"]): (r["rk"], r["n"])
        for r in assign_grouped_sequential_ids(
            df, "g", ["v", "id"], out_col="rk", total_col="n", num_partitions=7
        ).collect()
    }
    from collections import defaultdict

    groups = defaultdict(list)
    for i, g, v in rows:
        groups[g].append((v, i))
    expect = {}
    for g, members in groups.items():
        for rank, (v, i) in enumerate(sorted(members)):
            expect[(g, i)] = (rank + 1, len(members))
    assert got == expect


def test_grouped_sequential_ids_no_whole_group_window(spark):
    """The plan must window by (__pid, group) — never by the bare
    group (one task per group = the hot-language scale-killer)."""
    from pasta_pipeline_spark.operators.ids import assign_grouped_sequential_ids

    df = spark.createDataFrame(
        [(i, f"g{i % 3}") for i in range(100)], "id long, g string"
    )
    out = assign_grouped_sequential_ids(df, "g", "id", num_partitions=4)
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "SinglePartition" not in plan
    import re

    for m in re.finditer(r"Window \[[^\]]*\], \[([^\]]*)\]", plan):
        assert "__pid" in m.group(1)


def test_incremental_summary_sink_equals_direct(spark, tmp_path):
    """Summary maintained across two streamed batches == one-shot
    summary over all rows (merge associativity, end to end)."""
    import json as _json
    import os as _os

    from pasta_pipeline_spark.sources.tables import TableStore
    from pasta_pipeline_spark.streaming.sink import incremental_summary_sink

    src = str(tmp_path / "src")
    _os.makedirs(src)
    b1 = [{"k": "a", "v": 1.5}, {"k": "a", "v": 2.5}, {"k": "b", "v": 10.0}]
    with open(f"{src}/b1.json", "w", encoding="utf-8") as f:
        f.writelines(_json.dumps(r) + "\n" for r in b1)

    store = TableStore(spark, str(tmp_path / "summary"))
    stream = spark.readStream.schema("k string, v double").json(src)
    q = incremental_summary_sink(stream, store, "k", "v", str(tmp_path / "ck"))
    q.awaitTermination(120)

    b2 = [{"k": "a", "v": 4.0}, {"k": "c", "v": -1.0}]
    with open(f"{src}/b2.json", "w", encoding="utf-8") as f:
        f.writelines(_json.dumps(r) + "\n" for r in b2)
    stream2 = spark.readStream.schema("k string, v double").json(src)
    q2 = incremental_summary_sink(stream2, store, "k", "v", str(tmp_path / "ck"))
    q2.awaitTermination(120)

    all_rows = spark.createDataFrame(
        [(r["k"], r["v"]) for r in b1 + b2], "k string, v double"
    )
    direct = {r["k"]: r for r in partial_summary(all_rows, "k", "v").collect()}
    got = {r["k"]: r for r in store.read().collect()}
    assert set(got) == set(direct) == {"a", "b", "c"}
    for k in direct:
        for c in ("n", "sum_x", "min_x", "max_x", "sumsq_x"):
            assert got[k][c] == direct[k][c], (k, c)


def test_histogram_merge_equals_direct_and_quantile(spark):
    from pasta_pipeline_spark.operators.summaries import (
        histogram_quantile_bin,
        merge_histograms,
        partial_histogram,
    )

    rows = [("a", float(i)) for i in range(100)] + [("b", 50.0)] * 7
    df = spark.createDataFrame(rows, "k string, v double")
    direct = partial_histogram(df, "k", "v", lo=0.0, hi=100.0, n_bins=10)

    half1 = spark.createDataFrame(rows[:40], "k string, v double")
    half2 = spark.createDataFrame(rows[40:], "k string, v double")
    merged = merge_histograms(
        partial_histogram(half1, "k", "v", lo=0.0, hi=100.0, n_bins=10),
        partial_histogram(half2, "k", "v", lo=0.0, hi=100.0, n_bins=10),
        "k",
    )
    d = {(r["k"], r["bin"]): r["bin_n"] for r in direct.collect()}
    m = {(r["k"], r["bin"]): r["bin_n"] for r in merged.collect()}
    assert d == m  # merge of halves == direct, any split

    q = {r["k"]: r["q_bin"] for r in histogram_quantile_bin(direct, "k", 5000).collect()}
    assert q["a"] == 4  # median of 0..99 in 10-wide bins -> bin 4 (40..49)
    assert q["b"] == 5  # all mass at 50 -> bin 5


def test_incremental_heavy_hitter_sink_tracks_frequent_items(spark, tmp_path):
    """Streaming heavy hitters: two micro-batches merge into a bounded
    per-key top-m state whose travelling bound still holds against the
    exact counts over everything ingested."""
    import json as _json
    import os as _os

    from pyspark.sql import functions as F

    from pasta_pipeline_spark.sources.tables import TableStore
    from pasta_pipeline_spark.streaming.sink import incremental_heavy_hitter_sink

    src = str(tmp_path / "src")
    _os.makedirs(src)
    # zipf-ish: item i appears ~120/i times, split across two batches
    rows = [{"k": "g", "item": f"it{i}"} for i in range(1, 25) for _ in range(120 // i)]
    half = len(rows) // 2
    with open(f"{src}/b1.json", "w", encoding="utf-8") as f:
        f.writelines(_json.dumps(r) + "\n" for r in rows[:half])

    store = TableStore(spark, str(tmp_path / "hh"))
    mk = lambda: spark.readStream.schema("k string, item string").json(src)  # noqa: E731
    m = 6
    incremental_heavy_hitter_sink(
        mk(), store, "k", "item", checkpoint_dir=str(tmp_path / "ck"), m=m
    ).awaitTermination(120)
    with open(f"{src}/b2.json", "w", encoding="utf-8") as f:
        f.writelines(_json.dumps(r) + "\n" for r in rows[half:])
    incremental_heavy_hitter_sink(
        mk(), store, "k", "item", checkpoint_dir=str(tmp_path / "ck"), m=m
    ).awaitTermination(120)

    got = {r["item"]: r["n"] for r in store.read().collect()}
    dropped = got.pop(None)
    assert len(got) == m
    all_df = spark.createDataFrame(
        [(r["k"], r["item"]) for r in rows], "k string, item string"
    )
    exact = {
        r["item"]: r["n"]
        for r in all_df.groupBy("item").agg(F.count("*").alias("n")).collect()
    }
    err = 0
    for item, n in got.items():
        assert n <= exact[item]
        err += exact[item] - n
    assert err <= dropped
    assert got["it1"] == exact["it1"]  # the heavy head is exact


def test_histogram_clamps_out_of_range(spark):
    from pasta_pipeline_spark.operators.summaries import partial_histogram

    df = spark.createDataFrame(
        [("k", -5.0), ("k", 1000.0), ("k", 50.0)], "k string, v double"
    )
    got = {r["bin"]: r["bin_n"] for r in partial_histogram(df, "k", "v", 0.0, 100.0, 10).collect()}
    assert got == {0: 1, 9: 1, 5: 1}


def test_incremental_histogram_sink_quantiles_current(spark, tmp_path):
    import json as _json
    import os as _os

    from pasta_pipeline_spark.operators.summaries import (
        histogram_quantile_bin,
        partial_histogram,
    )
    from pasta_pipeline_spark.sources.tables import TableStore
    from pasta_pipeline_spark.streaming.sink import incremental_histogram_sink

    src = str(tmp_path / "src")
    _os.makedirs(src)
    b1 = [{"k": "a", "v": float(i)} for i in range(50)]
    b2 = [{"k": "a", "v": float(i)} for i in range(50, 100)]
    with open(f"{src}/b1.json", "w", encoding="utf-8") as f:
        f.writelines(_json.dumps(r) + "\n" for r in b1)

    store = TableStore(spark, str(tmp_path / "hist"))
    mk = lambda: spark.readStream.schema("k string, v double").json(src)  # noqa: E731
    incremental_histogram_sink(
        mk(), store, "k", "v", lo=0.0, hi=100.0,
        checkpoint_dir=str(tmp_path / "ck"), n_bins=10,
    ).awaitTermination(120)
    with open(f"{src}/b2.json", "w", encoding="utf-8") as f:
        f.writelines(_json.dumps(r) + "\n" for r in b2)
    incremental_histogram_sink(
        mk(), store, "k", "v", lo=0.0, hi=100.0,
        checkpoint_dir=str(tmp_path / "ck"), n_bins=10,
    ).awaitTermination(120)

    all_df = spark.createDataFrame([(r["k"], r["v"]) for r in b1 + b2], "k string, v double")
    direct = partial_histogram(all_df, "k", "v", lo=0.0, hi=100.0, n_bins=10)
    d = {(r["k"], r["bin"]): r["bin_n"] for r in direct.collect()}
    m = {(r["k"], r["bin"]): r["bin_n"] for r in store.read().collect()}
    assert d == m
    q = histogram_quantile_bin(store.read(), "k", 5000).collect()[0]
    assert q["q_bin"] == 4 and q["total"] == 100
