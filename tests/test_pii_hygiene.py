"""PII redaction, encoding profile, and n-gram novelty unit tests.

The PII patterns claim portability across Java regex (Spark), RE2
(DuckDB oracle), and Python ``re`` — the differential tests here prove
the Python leg on adversarial fixtures; the catalog oracle proves the
RE2 leg on the full corpus.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from pasta_pipeline_spark.operators.pii import (
    PII_RULES,
    redact_pii,
    scan_pii,
)

FIXTURES = [
    "plain text with no pii at all",
    "reach me at alice.smith+spam@mail.example.org today",
    "two mails a@b.io and c_d%e@f-g.h.co plus junk @nope and x@y",
    "call +1-555-0042 or +44-20-7946-0958 but not 555-0042 (no prefix)",
    "server at 192.168.0.1 and 10.0.255.254, version 1.2.3 is not an ip",
    "overlap trap user@10.0.0.1 stays one email",
    "999.999.999.999 over-matches by design; 1.2.3.4.5 contains one",
    "",
    "+1 2345 678 999 spaced phone",
    "trailing email end@example.com",
]


def _py_redact(text: str) -> str:
    for _, pattern, placeholder in PII_RULES:
        text = re.sub(pattern, placeholder, text)
    return text


def test_redaction_matches_python_re(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(FIXTURES)], "id long, t string")
    got = {
        r["id"]: r["red"]
        for r in df.select("id", redact_pii("t").alias("red")).collect()
    }
    for i, t in enumerate(FIXTURES):
        assert got[i] == _py_redact(t), f"fixture {i}: {t!r}"


def test_counts_match_python_re(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(FIXTURES)], "id long, t string")
    rows = {r["id"]: r for r in scan_pii(df, "id", "t").collect()}
    for i, t in enumerate(FIXTURES):
        for name, pattern, _ in PII_RULES:
            expect = len(re.findall(pattern, t))
            assert rows[i][f"n_{name}"] == expect, f"fixture {i} {name}"


def test_redaction_order_and_numeric_tld(spark):
    df = spark.createDataFrame(
        [(1, "user@10.0.0.1 tail"), (2, "user@ex.com vs 10.0.0.1")],
        "id long, t string",
    )
    got = {r["id"]: r["r"] for r in df.select("id", redact_pii("t").alias("r")).collect()}
    # numeric host is NOT an email (alpha TLD required) — the dotted
    # quad is still caught by the IP rule
    assert got[1] == "user@<IP> tail"
    # alpha-TLD email and a standalone IP each get their own placeholder
    assert got[2] == "<EMAIL> vs <IP>"


def test_encoding_profile_fixture(spark):
    from pasta_pipeline_spark.operators.text_analysis import encoding_profile

    text = "ab 12,3!  x\tlong-tokené �\n"
    df = spark.createDataFrame([(text,)], "t string")
    prof = encoding_profile("t")
    row = df.select(*[c.alias(k) for k, c in prof.items()]).collect()[0]
    assert row["n_chars"] == len(text)
    assert row["n_digits"] == 3
    assert row["n_punct"] == 2  # ',' and '!'
    assert row["n_ws_runs"] == 5
    assert row["n_nonascii"] == 2  # é and U+FFFD
    assert row["n_replacement"] == 1
    assert row["max_token_chars"] == len("long-tokené")


def test_shingle_novelty_tiny(spark):
    from pasta_pipeline_spark.operators.text_dedup import shingle_novelty

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f"),          # shares 'a b c d e'+'b c d e f' with doc 2
            (2, "a b c d e f"),          # exact copy: zero novelty
            (3, "p q r s t u v"),        # all shingles unique
            (4, "short text"),           # whole-text fallback shingle, unique
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in shingle_novelty(docs, "doc_id", "text", n=5).collect()}
    assert rows[1]["n_shingles"] == 2 and rows[1]["n_unique"] == 0
    assert rows[1]["novelty_bp"] == 0
    assert rows[2]["novelty_bp"] == 0
    assert rows[3]["n_shingles"] == 3 and rows[3]["novelty_bp"] == 10000
    assert rows[4]["n_shingles"] == 1 and rows[4]["novelty_bp"] == 10000


def test_cross_jaccard_is_bipartite_only(spark):
    from pasta_pipeline_spark.operators.text_dedup import cross_jaccard_pairs
    from pasta_pipeline_spark.operators.util import release_cached_deps

    left = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "one two three four")],
        "doc_id long, text string",
    )
    right = spark.createDataFrame(
        [(10, "alpha beta gamma delta"), (11, "alpha beta gamma epsilon"),
         (12, "totally different words here")],
        "doc_id long, text string",
    )
    got = cross_jaccard_pairs(left, right, "doc_id", "text", n=3, threshold=0.3)
    rows = {(r["left_id"], r["right_id"]): r["jaccard"] for r in got.collect()}
    release_cached_deps(got)
    # exact duplicate across corpora
    assert rows[(1, 10)] == 1.0
    # near-dup across corpora: shingle sets {abc,bcd} vs {abe,bce}? n=3
    # over 4 tokens gives 2 shingles each sharing 1 -> 1/3
    assert abs(rows[(1, 11)] - 1 / 3) < 1e-12
    # no within-corpus pair (1,2) or (10,11) can appear by construction
    assert all(lid in (1, 2) and rid in (10, 11, 12) for lid, rid in rows)
    assert (1, 12) not in rows


def test_pseudonymize_join_preserving_and_null_safe(spark):
    from pyspark.sql import functions as F

    from pasta_pipeline_spark.operators.pii import pseudonymize, pseudonymize_columns

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (1, "c"), (None, "d")], "uid long, v string"
    )
    p = df.select(pseudonymize("uid", "s1").alias("pid"), "v")
    rows = p.collect()
    by_v = {r["v"]: r["pid"] for r in rows}
    assert by_v["a"] == by_v["c"]          # equal ids -> equal pseudonyms
    assert by_v["a"] != by_v["b"]
    assert by_v["d"] is None               # NULL stays NULL
    assert len(by_v["a"]) == 16
    # different salt breaks linkage
    p2 = {r["v"]: r["pid"] for r in df.select(pseudonymize("uid", "s2").alias("pid"), "v").collect()}
    assert p2["a"] != by_v["a"]
    # in-place column replacement keeps schema
    out = pseudonymize_columns(df, ["uid"], "s1")
    assert out.columns == ["uid", "v"]
    assert out.filter(F.col("v") == "a").collect()[0]["uid"] == by_v["a"]


def test_luhn_credit_card_validation(spark):
    """Luhn separates real card numbers from near-misses: standard
    test numbers (Visa 16-digit, Amex 15-digit, spaced/dashed forms)
    validate; single-digit corruptions fail; plain long ids fail at
    9-in-10 odds (checked explicitly); length gates hold."""
    from pasta_pipeline_spark.operators.pii import scan_credit_cards

    rows = [
        (1, "v 4111111111111111"),            # Visa test
        (2, "a 378282246310005"),              # Amex test (15)
        (3, "m 5555-5555-5555-4444 pay"),      # dashed MC test
        (4, "bad 4111111111111110"),           # corrupted check digit
        (5, "short 411111111111"),             # 12 digits: below gate
        (6, "long 41111111111111111111 x"),    # 20 digits: above gate
        (7, "id 1234567890123 ref"),           # 13-digit id, fails Luhn
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: (r["n_cc_candidates"], r["n_cc_valid"])
           for r in scan_credit_cards(df, "doc_id", "text").collect()}
    assert out[1] == (1, 1) and out[2] == (1, 1) and out[3] == (1, 1)
    assert out[4] == (1, 0)
    assert out[5] == (0, 0)       # regex gate
    assert out[7] == (1, 0)       # checksum gate
