"""Streaming entity-resolution / golden-record maintenance
(streaming/linkage.py): state == batch on the union, retry-idempotent,
update-convergent."""

from __future__ import annotations

from pyspark.sql import functions as F

from pasta_pipeline_spark.operators.golden import golden_part_records
from pasta_pipeline_spark.operators.linkage import PART_LINK_COLS, part_linkage_pairs
from pasta_pipeline_spark.schemas import load_table
from pasta_pipeline_spark.sources.tables import TableStore
from pasta_pipeline_spark.streaming.linkage import (
    apply_linkage_batch,
    entity_resolution_from_state,
    golden_records_from_state,
    incremental_linkage_sink,
)


def _pairs_set(df):
    return {(r["a_key"], r["b_key"], r["score"]) for r in df.collect()}


def _golden_set(df):
    return {
        (
            r["cluster_id"],
            r["n_members"],
            tuple(r["member_keys"]),
            r["golden_brand"],
            r["golden_type"],
            r["size_min"],
            r["size_max"],
            r["price_cents_min"],
            r["price_cents_max"],
        )
        for r in df.collect()
    }


def test_streamed_linkage_equals_batch_with_retries(spark, tmp_table_dir):
    """Three waves of the part dimension, every apply retried with the
    same batch id: pairs and golden records from state must equal the
    batch operators over the full table."""
    parts = load_table(spark, "/root/testdata/sf0.001", "part").select(*PART_LINK_COLS)
    parts_store = TableStore(spark, f"{tmp_table_dir}/link_parts")
    pairs_store = TableStore(spark, f"{tmp_table_dir}/link_pairs")
    marker = f"{tmp_table_dir}/_linkage_mb.json"

    for mb in range(3):
        wave = parts.where(F.col("p_partkey") % 3 == mb)
        apply_linkage_batch(wave, mb, parts_store, pairs_store, marker)
        # simulated intra-batch retry: same id, same rows, full re-run
        apply_linkage_batch(wave, mb, parts_store, pairs_store, marker)

    assert _pairs_set(entity_resolution_from_state(pairs_store)) == _pairs_set(
        part_linkage_pairs(parts)
    )
    assert _golden_set(golden_records_from_state(parts_store, pairs_store)) == _golden_set(
        golden_part_records(parts)
    )
    # state is the full dimension, once
    assert parts_store.read().count() == parts.count()


def test_reingested_key_recomputes_its_pairs(spark, tmp_table_dir):
    """An updated record converges to the batch answer over the
    CURRENT rows: stale pairs drop, new attributes re-match."""
    rows = [
        (1, "azure metallic box", "B#1", "T1", 10, 100.0),
        (2, "azura metallic box", "B#1", "T1", 11, 102.0),  # matches 1
        (3, "green metallic box", "B#2", "T1", 10, 100.0),
    ]
    schema = (
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double"
    )
    parts_store = TableStore(spark, f"{tmp_table_dir}/u_parts")
    pairs_store = TableStore(spark, f"{tmp_table_dir}/u_pairs")
    marker = f"{tmp_table_dir}/_u_mb.json"

    apply_linkage_batch(
        spark.createDataFrame(rows, schema), 0, parts_store, pairs_store, marker
    )
    assert _pairs_set(entity_resolution_from_state(pairs_store)) == {(1, 2, 7)}

    # key 2 re-ingested: brand flips to B#2 -> (1,2) must die and
    # (2,3) must be born (same block, close attrs)
    update = [(2, "greon metallic box", "B#2", "T1", 10, 101.0)]
    current = [rows[0], update[0], rows[2]]
    apply_linkage_batch(
        spark.createDataFrame(update, schema), 1, parts_store, pairs_store, marker
    )
    got = _pairs_set(entity_resolution_from_state(pairs_store))
    expected = _pairs_set(part_linkage_pairs(spark.createDataFrame(current, schema)))
    assert got == expected
    assert (2, 3, 7) in got and all(p[:2] != (1, 2) for p in got)
    assert _golden_set(
        golden_records_from_state(parts_store, pairs_store)
    ) == _golden_set(golden_part_records(spark.createDataFrame(current, schema)))


def test_linkage_sink_end_to_end_file_stream(spark, tmp_table_dir, tmp_path):
    """The real writeStream path (availableNow file source) lands the
    same state as batch."""
    parts = load_table(spark, "/root/testdata/sf0.001", "part").select(*PART_LINK_COLS)
    src = str(tmp_path / "incoming")
    parts.write.parquet(src)

    parts_store = TableStore(spark, f"{tmp_table_dir}/s_parts")
    pairs_store = TableStore(spark, f"{tmp_table_dir}/s_pairs")
    stream = spark.readStream.schema(parts.schema).parquet(src)
    q = incremental_linkage_sink(
        stream,
        parts_store,
        pairs_store,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    assert _pairs_set(entity_resolution_from_state(pairs_store)) == _pairs_set(
        part_linkage_pairs(parts)
    )
