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


def test_repair_mojibake_round_trip(spark):
    """The repair table is computed from the actual encoding round
    trip, so repairing freshly corrupted text restores the original
    exactly; clean text (including text that legitimately contains
    'A-tilde' etc. NOT followed by a continuation byte) is untouched;
    3-char punctuation repairs before 2-char accent rules."""
    from pasta_pipeline_spark.operators.normalize_text import (
        MOJIBAKE_TARGETS,
        repair_mojibake,
    )

    originals = [
        "It\u2019s d\u00e9j\u00e0 vu \u2014 na\u00efve caf\u00e9 \u20ac9",
        "sch\u00f6ne Gr\u00fc\u00dfe \u00e0 bient\u00f4t",
        "\u201cquoted\u201d \u2026 done",
    ]
    def corrupt(txt):
        out = []
        for ch in txt:
            if ord(ch) < 128:
                out.append(ch)
                continue
            raw = ch.encode("utf-8")
            try:
                out.append(raw.decode("cp1252"))
            except UnicodeDecodeError:
                out.append(raw.decode("latin-1"))
        return "".join(out)

    corrupted = [corrupt(s) for s in originals]
    clean = ["plain ascii text", "uncorrupted \u00c3 alone stays"]
    rows = [(i, c) for i, c in enumerate(corrupted + clean)]
    df = spark.createDataFrame(rows, "i long, t string")
    got = {r["i"]: r["r"] for r in
           df.select("i", repair_mojibake("t").alias("r")).collect()}
    for i, orig in enumerate(originals):
        assert got[i] == orig, (got[i], orig)
    assert got[3] == clean[0]
    assert got[4] == clean[1]

    # every target round-trips individually inside a sentence
    for ch in MOJIBAKE_TARGETS:
        s = f"x {ch} y"
        moji = corrupt(s)
        df1 = spark.createDataFrame([(moji,)], "t string")
        out = df1.select(repair_mojibake("t").alias("r")).collect()[0]["r"]
        assert out == s, (ch, moji, out)
