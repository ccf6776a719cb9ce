"""TableStore atomic-overwrite protocol tests."""

from __future__ import annotations

import os

from pasta_pipeline_spark.sources.tables import TableStore


def test_read_before_write_returns_empty_with_schema(spark, tmp_table_dir):
    from pasta_pipeline_spark.schemas import MESSAGE_SCHEMA

    store = TableStore(spark, f"{tmp_table_dir}/t", MESSAGE_SCHEMA)
    assert not store.exists()
    df = store.read()
    assert df.count() == 0
    assert df.schema == MESSAGE_SCHEMA


def test_overwrite_swaps_versions_atomically(spark, tmp_table_dir):
    store = TableStore(spark, f"{tmp_table_dir}/t")
    store.overwrite(spark.range(5))
    v1 = store.current_version()
    assert store.read().count() == 5

    store.overwrite(spark.range(7))
    v2 = store.current_version()
    assert v1 != v2
    assert store.read().count() == 7
    # old version dir is gone, only the live one remains
    dirs = [d for d in os.listdir(store.path) if d.startswith("v-")]
    assert dirs == [v2]


def test_overwrite_derived_from_own_read(spark, tmp_table_dir):
    """The merge path reads the table and overwrites it with a plan
    derived from that read — the version layout must make this safe
    (the new version is fully written before the pointer flips)."""
    store = TableStore(spark, f"{tmp_table_dir}/t")
    store.overwrite(spark.range(10))
    doubled = store.read().selectExpr("id * 2 AS id")
    store.overwrite(doubled)
    assert sorted(r["id"] for r in store.read().collect()) == list(range(0, 20, 2))
