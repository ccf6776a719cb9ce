"""HTML field extraction — F10/F11/F12 as an Arrow-vectorized stage.

Parity source: /root/reference/dags/processors/telegraph_processor.py:194-224
(bs4-based title / twitter:description / article:published_time pulls).

HTML is not a regular language, so this is one of the engine's two
sanctioned Python stages (SURVEY.md §2.10). It uses BeautifulSoup when
available and an equivalent regex extractor otherwise (the container
ships no bs4; the regex path is the one under test and handles the
fixture shapes exactly).
"""

from __future__ import annotations

import re
from urllib.parse import unquote

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

try:  # pragma: no cover - bs4 not present in the test container
    from bs4 import BeautifulSoup  # type: ignore

    _HAS_BS4 = True
except Exception:  # pragma: no cover
    _HAS_BS4 = False

_MRAKOPEDIA_PREFIX = "https://mrakopedia.net/wiki/"

_RE_HEADER_H1 = re.compile(
    r'<header[^>]*class="[^"]*tl_article_header[^"]*"[^>]*>.*?<h1[^>]*>(.*?)</h1>',
    re.DOTALL | re.IGNORECASE,
)
_RE_TITLE = re.compile(r"<title[^>]*>(.*?)</title>", re.DOTALL | re.IGNORECASE)
_RE_META = (
    r'<meta[^>]*property="{prop}"[^>]*content="([^"]*)"'
    r'|<meta[^>]*content="([^"]*)"[^>]*property="{prop}"'
)
_RE_TWITTER_DESC = re.compile(_RE_META.format(prop="twitter:description"), re.IGNORECASE)
_RE_PUBLISHED = re.compile(_RE_META.format(prop="article:published_time"), re.IGNORECASE)
_RE_TAGS = re.compile(r"<[^>]+>")


def _strip_tags(s: str) -> str:
    return _RE_TAGS.sub("", s).strip()


def _meta_content(rx: re.Pattern, html: str) -> str | None:
    m = rx.search(html)
    if not m:
        return None
    return m.group(1) if m.group(1) is not None else m.group(2)


def _extract_title(html: str) -> str | None:
    """Header-h1 first, else <title> minus the ' – Telegraph' suffix
    (telegraph_processor.py:194-200)."""
    if _HAS_BS4:  # pragma: no cover
        soup = BeautifulSoup(html, "html.parser")
        header = soup.find("header", class_="tl_article_header")
        if header:
            h1 = header.find("h1")
            if h1:
                return h1.get_text().strip()
        if soup.title and soup.title.string:
            return soup.title.string.replace(" – Telegraph", "").strip()
        return None
    m = _RE_HEADER_H1.search(html)
    if m:
        return _strip_tags(m.group(1))
    m = _RE_TITLE.search(html)
    if m:
        return _strip_tags(m.group(1)).replace(" – Telegraph", "").strip()
    return None


def _extract_description(html: str) -> str | None:
    """twitter:description content; when it starts with the mrakopedia
    wiki prefix, the reference strips ``https://mrakopedia.net/wiki/ +
    unquote(first whitespace token after /wiki/)`` characters and keeps
    the remainder (telegraph_processor.py:203-213 — note the reference
    computes the strip length from the *decoded* page name; replicated
    verbatim for parity, quirk included)."""
    desc = _meta_content(_RE_TWITTER_DESC, html)
    if desc is None:
        return None
    desc = desc.strip()
    if desc.startswith(_MRAKOPEDIA_PREFIX):
        try:
            pasta_name = unquote(desc.split("/wiki/")[1].split()[0])
            desc = desc[len(f"{_MRAKOPEDIA_PREFIX}{pasta_name}"):].strip()
        except Exception:
            pass
    return desc


def _extract_published_raw(html: str) -> str | None:
    """article:published_time raw string; parsed to timestamp by
    parse_iso8601 on the Spark side (telegraph_processor.py:216-224)."""
    return _meta_content(_RE_PUBLISHED, html)


HTML_FIELDS_SCHEMA = StructType(
    [
        StructField("title", StringType(), True),
        StructField("description", StringType(), True),
        StructField("date_published_raw", StringType(), True),
    ]
)


def with_html_fields(df: DataFrame, html_col: str = "content") -> DataFrame:
    """Append title / description / date_published columns extracted
    from ``html_col``.

    Runs as a single Arrow-batched pandas UDF (one Python round-trip),
    then parses the published date natively. Partition-parallel: no
    state, no driver collection — safe at any scale.
    """
    from pyspark.sql.functions import pandas_udf

    from pasta_pipeline_spark.operators.util import ensure_package_on_workers

    ensure_package_on_workers(df.sparkSession)

    @pandas_udf(HTML_FIELDS_SCHEMA)
    def _extract(html: pd.Series) -> pd.DataFrame:
        titles, descs, pubs = [], [], []
        for h in html:
            if h is None or not isinstance(h, str) or not h:
                titles.append(None), descs.append(None), pubs.append(None)
                continue
            titles.append(_extract_title(h))
            descs.append(_extract_description(h))
            pubs.append(_extract_published_raw(h))
        return pd.DataFrame(
            {"title": titles, "description": descs, "date_published_raw": pubs}
        )

    from pasta_pipeline_spark.functions.timestamps import parse_iso8601

    fields = F.col("_html_fields")
    return (
        df.withColumn("_html_fields", _extract(F.col(html_col)))
        .withColumn("title", fields.getField("title"))
        .withColumn("description", fields.getField("description"))
        .withColumn("date_published", parse_iso8601(fields.getField("date_published_raw")))
        .drop("_html_fields")
    )
