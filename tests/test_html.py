"""HTML extraction stage tests — F10/F11/F12 against fixture pages
shaped like FIXTURES.md §A3 describes."""

from __future__ import annotations

from datetime import datetime

from pasta_pipeline_spark.functions.html import with_html_fields

PAGE_FULL = """<html><head>
<title>Fallback Title – Telegraph</title>
<meta property="twitter:description" content="A spooky story about nothing.">
<meta property="article:published_time" content="2023-05-01T10:00:00Z">
</head><body>
<header class="tl_article_header"><h1>Real Title</h1></header>
<p>body text</p></body></html>"""

PAGE_TITLE_ONLY = """<html><head><title>Only Title – Telegraph</title></head>
<body><p>hi</p></body></html>"""

PAGE_MRAKOPEDIA = """<html><head>
<meta property="twitter:description" content="https://mrakopedia.net/wiki/Scary_Page rest of the description">
</head><body></body></html>"""


def _extract(spark, html):
    df = spark.createDataFrame([(1, html)], "id long, content string")
    return with_html_fields(df, "content").collect()[0]


def test_header_h1_wins(spark):
    row = _extract(spark, PAGE_FULL)
    assert row["title"] == "Real Title"
    assert row["description"] == "A spooky story about nothing."
    assert row["date_published"] == datetime(2023, 5, 1, 10, 0)


def test_title_fallback_strips_suffix(spark):
    row = _extract(spark, PAGE_TITLE_ONLY)
    assert row["title"] == "Only Title"
    assert row["description"] is None
    assert row["date_published"] is None


def test_mrakopedia_prefix_strip(spark):
    # telegraph_processor.py:207-213 — strips the wiki-URL prefix and
    # keeps the remainder of the description
    row = _extract(spark, PAGE_MRAKOPEDIA)
    assert row["description"] == "rest of the description"


def test_null_and_empty_html(spark):
    df = spark.createDataFrame([(1, None), (2, "")], "id long, content string")
    rows = {r["id"]: r for r in with_html_fields(df, "content").collect()}
    assert rows[1]["title"] is None and rows[2]["title"] is None
