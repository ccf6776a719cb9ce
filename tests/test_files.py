"""CSV/JSON snapshot sink + scan roundtrip (S3/S4/S5)."""

from __future__ import annotations

from datetime import datetime

from pasta_pipeline_spark.schemas import RAW_MESSAGE_SCHEMA
from pasta_pipeline_spark.sources.files import (
    read_json_snapshot,
    snapshot_path,
    write_csv_snapshot,
    write_json_snapshot,
)


def _raw(spark):
    rows = [
        (
            1,
            datetime(2024, 5, 1),
            "приветствие #тег",  # non-ASCII must survive the JSON roundtrip
            5,
            1,
            ["тег"],
            ["https://telegra.ph/A"],
            {"👍": 3},
            datetime(2024, 5, 2),
        )
    ]
    return spark.createDataFrame(rows, RAW_MESSAGE_SCHEMA)


def test_json_snapshot_roundtrip_preserves_unicode_and_types(spark, tmp_path):
    df = _raw(spark)
    path = str(tmp_path / "snap_json")
    write_json_snapshot(df, path)
    back = read_json_snapshot(spark, path, RAW_MESSAGE_SCHEMA)
    row = back.collect()[0]
    assert row["text"] == "приветствие #тег"
    assert row["hashtags"] == ["тег"]
    assert row["reactions"] == {"👍": 3}
    assert row["date"] == datetime(2024, 5, 1)
    # JSON sources mark every column nullable — compare names + types
    assert [(f.name, f.dataType) for f in back.schema.fields] == [
        (f.name, f.dataType) for f in RAW_MESSAGE_SCHEMA.fields
    ]


def test_csv_snapshot_writes_scalar_columns(spark, tmp_path):
    # CSV can't carry arrays/maps — export scalars (the reference's CSV
    # snapshot carries the pandas repr; we export clean scalar columns)
    df = _raw(spark).select("message_id", "date", "text", "views")
    path = str(tmp_path / "snap_csv")
    write_csv_snapshot(df, path)
    back = spark.read.option("header", True).csv(path)
    assert back.count() == 1
    assert back.columns == ["message_id", "date", "text", "views"]


def test_snapshot_path_templating(spark):
    # F15 parity (message_scraper.py:113-118)
    assert (
        snapshot_path("/out", "mychan", "7d", "20240601T120000", "csv")
        == "/out/mychan_7d_20240601T120000.csv"
    )


def test_orc_roundtrip(spark, tmp_path):
    from pasta_pipeline_spark.sources.files import read_orc_snapshot, write_orc_snapshot

    df = _raw(spark).select("message_id", "text", "hashtags", "reactions")
    path = str(tmp_path / "snap_orc")
    write_orc_snapshot(df, path)
    row = read_orc_snapshot(spark, path).collect()[0]
    assert row["text"] == "приветствие #тег" and row["reactions"] == {"👍": 3}


def test_csv_corrupt_record_side_channel(spark, tmp_path):
    """P10: malformed rows are quarantined, not silently dropped."""
    from pasta_pipeline_spark.sources.files import read_csv_with_error_channel
    from pyspark.sql import functions as F
    from pyspark.sql.types import IntegerType, LongType, StringType, StructField, StructType

    p = tmp_path / "in.csv"
    p.write_text("message_id,views,text\n1,10,ok row\nnot-a-number,zzz,bad row\n3,30,another\n")
    schema = StructType(
        [
            StructField("message_id", LongType(), True),
            StructField("views", IntegerType(), True),
            StructField("text", StringType(), True),
        ]
    )
    df = read_csv_with_error_channel(spark, str(p), schema).cache()
    good = df.where(F.col("_corrupt_record").isNull())
    bad = df.where(F.col("_corrupt_record").isNotNull())
    assert sorted(r["message_id"] for r in good.collect()) == [1, 3]
    assert bad.count() == 1
    assert "not-a-number" in bad.collect()[0]["_corrupt_record"]


def test_parquet_schema_drift_merge_and_fill(spark, tmp_path):
    """Schema evolution at the lake layer (a 100 TB reality the
    reference's fixed Postgres DDL never faces): a late batch adds a
    column; mergeSchema unions the schemas and back-fills NULL; an
    explicit read schema makes absent columns NULL rather than
    erroring (the S5 explicit-schema contract under drift)."""
    d = str(tmp_path / "drift")
    spark.createDataFrame(
        [(1, "a")], "id long, name string"
    ).write.mode("append").parquet(d)
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, name string, score double"
    ).write.mode("append").parquet(d)

    merged = spark.read.option("mergeSchema", "true").parquet(d)
    got = {r["id"]: (r["name"], r["score"]) for r in merged.collect()}
    assert got == {1: ("a", None), 2: ("b", 9.5)}

    explicit = spark.read.schema("id long, score double, missing string").parquet(d)
    rows = {r["id"]: (r["score"], r["missing"]) for r in explicit.collect()}
    assert rows == {1: (None, None), 2: (9.5, None)}


def test_read_text_corpus_whole_files(spark, tmp_path):
    d = tmp_path / "corpus"
    d.mkdir()
    (d / "a.txt").write_text("doc one\nwith two lines", encoding="utf-8")
    (d / "b.txt").write_text("doc two", encoding="utf-8")
    from pasta_pipeline_spark.sources.files import read_text_corpus

    got = {r["doc_path"].split("/")[-1]: r for r in read_text_corpus(spark, str(d)).collect()}
    assert set(got) == {"a.txt", "b.txt"}
    assert got["a.txt"]["text"] == "doc one\nwith two lines"
    assert got["a.txt"]["n_bytes"] == len("doc one\nwith two lines")
    assert got["a.txt"]["doc_id"] != got["b.txt"]["doc_id"]


def test_read_text_corpus_lines(spark, tmp_path):
    d = tmp_path / "lines"
    d.mkdir()
    (d / "x.txt").write_text("l1\nl2\nl3", encoding="utf-8")
    from pasta_pipeline_spark.sources.files import read_text_corpus

    rows = read_text_corpus(spark, str(d), whole_files=False).collect()
    assert sorted(r["text"] for r in rows) == ["l1", "l2", "l3"]
    assert len({r["doc_id"] for r in rows}) == 3


def test_read_binary_corpus(spark, tmp_path):
    d = tmp_path / "media"
    d.mkdir()
    (d / "img.png").write_bytes(b"\x89PNG fake bytes")
    (d / "clip.mp4").write_bytes(b"\x00\x00mp4 fake")
    from pasta_pipeline_spark.sources.files import read_binary_corpus

    got = {r["media_type"]: r for r in read_binary_corpus(spark, str(d)).collect()}
    assert set(got) == {"png", "mp4"}
    assert bytes(got["png"]["payload"]) == b"\x89PNG fake bytes"
    assert got["mp4"]["n_bytes"] == len(b"\x00\x00mp4 fake")

    only_png = read_binary_corpus(spark, str(d), glob="*.png").collect()
    assert len(only_png) == 1


def test_binary_corpus_feeds_multimodal(spark, tmp_path):
    d = tmp_path / "m2"
    d.mkdir()
    (d / "a.png").write_bytes(b"payload-a")
    from pasta_pipeline_spark.operators.multimodal import extract_media_features
    from pasta_pipeline_spark.sources.files import read_binary_corpus

    media = read_binary_corpus(spark, str(d))
    feats = extract_media_features(media).collect()
    assert len(feats) == 1 and feats[0]["n_bytes"] == 9
