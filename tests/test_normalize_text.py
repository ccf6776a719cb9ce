"""Unicode normalization stage tests."""

from __future__ import annotations

from pasta_pipeline_spark.operators.normalize_text import normalize_documents


def test_nfc_and_cleanup(spark):
    rows = [
        (1, "café time"),            # decomposed -> café
        (2, "a\x00b\x07c"),                # control chars stripped
        (3, "  a   b\t\tc  "),             # whitespace collapse + trim
        (4, "plain text"),                 # untouched
        (5, None),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r["id"]: (r["norm_text"], r["changed"]) for r in normalize_documents(df).collect()}
    assert got[1] == ("café time", True)
    assert got[2] == ("abc", True)
    assert got[3] == ("a b c", True)
    assert got[4] == ("plain text", False)
    assert got[5] == (None, False)


def test_lowercase_option(spark):
    df = spark.createDataFrame([(1, "MiXeD Case")], "id long, text string")
    r = normalize_documents(df, lowercase=True).collect()[0]
    assert r["norm_text"] == "mixed case"
