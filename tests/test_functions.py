"""Unit tests for the scalar function layer (SURVEY.md §5.2) —
edge-case parity with the reference helpers they re-express."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from pasta_pipeline_spark.functions.hashing import md5_or_empty
from pasta_pipeline_spark.functions.text import (
    extract_hashtags,
    extract_telegraph_links,
    word_count,
)
from pasta_pipeline_spark.functions.timestamps import parse_iso8601
from pasta_pipeline_spark.functions.urls import (
    clean_link,
    is_valid_telegraph_url,
    scalarize_link,
)


def _one(spark, value, expr):
    df = spark.createDataFrame([(value,)], "v string")
    return df.select(expr(F.col("v")).alias("out")).collect()[0]["out"]


class TestExtractTelegraphLinks:
    """Parity: /root/reference/dags/utils/utils.py:4-17."""

    def test_basic_and_trailing_punct(self, spark):
        text = 'see https://telegra.ph/Foo-01-02, and https://telegra.ph/Bar-03-04."'
        assert _one(spark, text, extract_telegraph_links) == [
            "https://telegra.ph/Foo-01-02",
            "https://telegra.ph/Bar-03-04",
        ]

    def test_order_preserving_dedup(self, spark):
        text = "https://telegra.ph/A https://telegra.ph/B https://telegra.ph/A"
        assert _one(spark, text, extract_telegraph_links) == [
            "https://telegra.ph/A",
            "https://telegra.ph/B",
        ]

    def test_dedup_after_cleaning(self, spark):
        # distinct raw matches that clean to the same link collapse
        text = "https://telegra.ph/A... https://telegra.ph/A"
        assert _one(spark, text, extract_telegraph_links) == ["https://telegra.ph/A"]

    def test_stop_chars_terminate_match(self, spark):
        text = "(https://telegra.ph/X) [https://telegra.ph/Y] {https://telegra.ph/Z}"
        assert _one(spark, text, extract_telegraph_links) == [
            "https://telegra.ph/X",
            "https://telegra.ph/Y",
            "https://telegra.ph/Z",
        ]

    def test_null_and_empty(self, spark):
        assert _one(spark, None, extract_telegraph_links) == []
        assert _one(spark, "", extract_telegraph_links) == []
        assert _one(spark, "no links here", extract_telegraph_links) == []


class TestExtractHashtags:
    """Parity: /root/reference/dags/utils/utils.py:20-33."""

    def test_lowercase_and_dedup(self, spark):
        assert _one(spark, "#Foo #BAR #foo", extract_hashtags) == ["foo", "bar"]

    def test_cyrillic(self, spark):
        assert _one(spark, "#Привет #мир #ПрИвЕт", extract_hashtags) == ["привет", "мир"]

    def test_digits_underscore_boundaries(self, spark):
        assert _one(spark, "#tag_1 #2nd!stop", extract_hashtags) == ["tag_1", "2nd"]

    def test_null(self, spark):
        assert _one(spark, None, extract_hashtags) == []


class TestWordCount:
    """Parity: telegraph_processor.py:142-146 (Python str.split)."""

    def test_basic(self, spark):
        assert _one(spark, "a b  c\n d\te", word_count) == 5

    def test_whitespace_only_and_empty(self, spark):
        assert _one(spark, "   ", word_count) == 0
        assert _one(spark, "", word_count) == 0
        assert _one(spark, None, word_count) == 0

    def test_counts_markup_tokens(self, spark):
        # A5: the reference counts raw-HTML tokens, tags included
        assert _one(spark, "<p>hello world</p>", word_count) == 2


class TestLinkCleaning:
    """Parity: db_loader.py:57-78 (P2) + telegraph_processor.py:101-103."""

    def test_brace_strip(self, spark):
        assert _one(spark, "{https://telegra.ph/A}", clean_link) == "https://telegra.ph/A"

    def test_trim_and_empty(self, spark):
        assert _one(spark, "  x  ", clean_link) == "x"
        assert _one(spark, "", clean_link) is None
        assert _one(spark, "{}", clean_link) is None
        assert _one(spark, None, clean_link) is None

    def test_scalarize_takes_first(self, spark):
        df = spark.createDataFrame(
            [(["{https://telegra.ph/A}", "https://telegra.ph/B"],), ([],), (None,)],
            "v array<string>",
        )
        out = [r["out"] for r in df.select(scalarize_link(F.col("v")).alias("out")).collect()]
        assert out == ["https://telegra.ph/A", None, None]


class TestUrlValidation:
    """Parity: validate_telegraph_url (telegraph_processor.py:117-125)."""

    def test_cases(self, spark):
        cases = {
            "https://telegra.ph/Foo-01-02": True,
            "http://telegra.ph/Foo": False,        # wrong scheme
            "https://example.com/Foo": False,      # wrong host
            "https://telegra.ph/": False,          # path too short
            "https://telegra.ph": False,
            "not a url": False,
        }
        for url, expected in cases.items():
            got = _one(spark, url, lambda c: is_valid_telegraph_url(c))
            assert bool(got) == expected, url


class TestHashing:
    def test_md5_or_empty(self, spark):
        import hashlib

        assert _one(spark, "hello", md5_or_empty) == hashlib.md5(b"hello").hexdigest()
        assert _one(spark, "", md5_or_empty) == ""
        assert _one(spark, None, md5_or_empty) == ""


class TestTimestamps:
    def test_iso8601_z(self, spark):
        got = _one(spark, "2024-03-01T12:30:00Z", parse_iso8601)
        assert got == datetime(2024, 3, 1, 12, 30)

    def test_parse_failure_is_null(self, spark):
        assert _one(spark, "not-a-date", parse_iso8601) is None


def test_url_host_and_registrable_domain(spark):
    from pyspark.sql import functions as F

    from pasta_pipeline_spark.functions.urls import registrable_domain, url_host

    df = spark.createDataFrame(
        [
            (1, "https://cdn.assets.example.com/obj/1"),
            (2, "https://telegra.ph/x-1"),
            (3, "not a url"),
            (4, None),
        ],
        "id long, url string",
    )
    got = {
        r["id"]: (r["host"], r["dom"])
        for r in df.select(
            "id",
            url_host("url").alias("host"),
            registrable_domain(url_host(F.col("url"))).alias("dom"),
        ).collect()
    }
    assert got[1] == ("cdn.assets.example.com", "example.com")
    assert got[2] == ("telegra.ph", "telegra.ph")
    assert got[3][0] is None
    assert got[4][0] is None


def test_filter_blocked_domains(spark):
    from pasta_pipeline_spark.functions.urls import filter_blocked_domains

    df = spark.createDataFrame(
        [
            (1, "https://spam.tracker.net/x"),
            (2, "https://example.com/ok"),
            (3, "bad url"),
        ],
        "id long, url string",
    )
    kept = sorted(r["id"] for r in filter_blocked_domains(df, "url", ["tracker.net"]).collect())
    assert kept == [2, 3]  # malformed URLs are not silently dropped
    audit = [r["id"] for r in filter_blocked_domains(df, "url", ["tracker.net"], keep_blocked=True).collect()]
    assert audit == [1]


def test_events_ts_normalized_to_utc_micros(spark):
    """events.parquet carries TIMESTAMP(NANOS); whatever shape the
    installed Spark reads it as (nanos long, TIMESTAMP_NTZ, TIMESTAMP),
    load_table must yield a TimestampType whose epoch micros equal
    DuckDB's narrowing of the same file — independent of session tz."""
    import duckdb
    from pyspark.sql import functions as F
    from pyspark.sql.types import TimestampType

    from pasta_pipeline_spark.schemas import load_table

    sf = "/root/testdata/sf0.001"
    df = load_table(spark, sf, "events")
    assert isinstance(df.schema["ts"].dataType, TimestampType)
    got = {
        r["event_id"]: r["us"]
        for r in df.select("event_id", F.unix_micros("ts").alias("us"))
        .orderBy("event_id")
        .limit(5)
        .collect()
    }
    want = dict(
        duckdb.sql(
            f"SELECT event_id, CAST(epoch_us(ts) AS BIGINT) FROM '{sf}/events.parquet' "
            "ORDER BY event_id LIMIT 5"
        ).fetchall()
    )
    assert got == want


def test_register_views_sql_surface(spark):
    """Raw spark.sql over registered views works and inherits the
    events timestamp normalization."""
    from pasta_pipeline_spark.schemas import register_views

    register_views(spark, "/root/testdata/sf0.001")
    n = spark.sql("SELECT count(*) AS n FROM orders").collect()[0]["n"]
    assert n > 0
    joined = spark.sql(
        "SELECT n_name, count(*) AS c FROM customer "
        "JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name"
    )
    assert joined.count() > 0
    # events.ts arrives as a proper TIMESTAMP through the view
    t = spark.sql("SELECT unix_micros(ts) AS us FROM events LIMIT 1").collect()
    assert t and t[0]["us"] > 0


def test_canonicalize_url_rules(spark):
    from pasta_pipeline_spark.functions.urls import canonicalize_url

    from pyspark.sql import functions as F

    cases = [
        ("https://Example.COM:443/a/b/?utm_source=x&z=1&a=2#frag",
         "https://example.com/a/b?a=2&z=1"),
        ("http://Host.net:80/p", "http://host.net/p"),
        ("http://host.net:8080/p", "http://host.net:8080/p"),  # non-default port kept
        ("https://h.io/path///", "https://h.io/path"),
        ("https://h.io/?fbclid=abc", "https://h.io"),
        ("https://h.io/x?b=2&a=1", "https://h.io/x?a=1&b=2"),
        # bare ref= is content-bearing (GitHub branch refs) — KEPT;
        # only the ref_src/ref_url tracking variants are stripped
        ("https://github.com/u/r/blob/f?ref=main", "https://github.com/u/r/blob/f?ref=main"),
        ("https://h.io/t?ref_src=twsrc&x=1", "https://h.io/t?x=1"),
        ("not a url", None),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "u string")
    got = [r["c"] for r in df.select(canonicalize_url("u").alias("c")).collect()]
    assert got == [want for _, want in cases]

    # the strip list is a parameter: a per-corpus override applies
    custom = df.limit(0).sparkSession.createDataFrame(
        [("https://h.io/x?sid=9&a=1",)], "u string"
    ).select(canonicalize_url("u", tracking_param_re="^(sid)=").alias("c"))
    assert custom.collect()[0]["c"] == "https://h.io/x?a=1"


def test_registrable_domain_psl_and_join(spark):
    """Multi-label public suffixes resolve to the true registrant
    boundary in both the inlined-predicate and broadcast-join forms;
    single-label TLDs keep the last-two-labels rule; the join form
    stays shuffle-free on the corpus side."""
    from pasta_pipeline_spark.functions.urls import (
        psl_suffix_frame,
        registrable_domain_join,
        registrable_domain_psl,
    )

    cases = [
        ("news.bbc.co.uk", "bbc.co.uk"),
        ("co.uk", "co.uk"),                # bare suffix: fallback rule
        ("www.hillside.act.edu.au", "hillside.act.edu.au"),  # 3-label suffix
        ("act.edu.au", "edu.au"),          # 3-label suffix, no registrant → 2-label rule
        ("cdn.assets.example.com", "example.com"),
        ("example.org", "example.org"),
        ("localhost", ""),                 # single label: no registrable domain
    ]
    df = spark.createDataFrame([(h,) for h, _ in cases], "host string")
    got = [r["d"] for r in df.select(registrable_domain_psl("host").alias("d")).collect()]
    assert got == [want for _, want in cases]

    psl = psl_suffix_frame(spark)
    jg = {
        r["host"]: r["domain"]
        for r in registrable_domain_join(df, "host", psl).collect()
    }
    assert jg == dict(cases)
    plan = registrable_domain_join(df, "host", psl)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "hashpartitioning(host" not in plan  # corpus never shuffles
