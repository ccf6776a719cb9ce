"""HTML field extraction — F10/F11/F12 as an Arrow-vectorized stage.

Parity source: /root/reference/dags/processors/telegraph_processor.py:194-224
(bs4-based title / twitter:description / article:published_time pulls).

HTML is not a regular language, so this is one of the engine's two
sanctioned Python stages (SURVEY.md §2.10). The reference parses with
``BeautifulSoup(html, 'html.parser')`` — whose tokenizer IS the stdlib
``html.parser.HTMLParser``. When bs4 is available we call it exactly as
the reference does; otherwise the fallback runs a purpose-built
extractor on that same stdlib tokenizer, so quote styles (double /
single / unquoted attributes), attribute-order flips, entity decoding,
uppercase tags and malformed nesting all behave as bs4-on-html.parser
would — not as a regex approximation would (the round-1 fallback used
regexes, which silently diverged on exactly those inputs; see
tests/test_html_differential.py for the adversarial coverage).
"""

from __future__ import annotations

from html.parser import HTMLParser
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


class _TelegraphExtractor(HTMLParser):
    """One-pass extraction of the three fields the reference pulls via
    bs4 (telegraph_processor.py:194-224), on the identical tokenizer:

    - ``header_h1``: text of the first <h1> descendant of the first
      <header> whose class *list* contains ``tl_article_header``
      (bs4 class_ matching is token-wise, not substring);
    - ``title``: text content of the first <title>;
    - ``metas``: first content value per meta ``property`` (bs4
      ``find`` returns the first match in document order; a matching
      tag without a content attribute yields '' via ``.get('content',
      '')``, preserved here as None→'' at the call site).

    ``convert_charrefs=True`` (the default) decodes entities in both
    text and attribute values, as the html.parser tree builder does.
    """

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.title: str | None = None
        self.header_h1: str | None = None
        self.metas: dict[str, str | None] = {}
        self._in_title = False
        self._title_parts: list[str] = []
        self._header_depth = 0
        self._h1_depth = 0
        self._h1_parts: list[str] = []

    def handle_starttag(self, tag, attrs):
        a = dict(attrs)
        if tag == "header":
            if self._header_depth > 0:
                self._header_depth += 1
            elif "tl_article_header" in (a.get("class") or "").split():
                self._header_depth = 1
        elif tag == "h1":
            if self._h1_depth > 0:
                self._h1_depth += 1
            elif self._header_depth > 0 and self.header_h1 is None:
                self._h1_depth = 1
                self._h1_parts = []
        elif tag == "title":
            if self.title is None:
                self._in_title = True
                self._title_parts = []
        elif tag == "meta":
            prop = a.get("property")
            if prop is not None and prop not in self.metas:
                self.metas[prop] = a.get("content")

    def handle_endtag(self, tag):
        if tag == "title" and self._in_title:
            self._in_title = False
            self.title = "".join(self._title_parts)
        elif tag == "h1" and self._h1_depth > 0:
            self._h1_depth -= 1
            if self._h1_depth == 0 and self.header_h1 is None:
                self.header_h1 = "".join(self._h1_parts)
        elif tag == "header" and self._header_depth > 0:
            self._header_depth -= 1

    def handle_data(self, data):
        if self._in_title:
            self._title_parts.append(data)
        if self._h1_depth > 0:
            self._h1_parts.append(data)


def _strip_mrakopedia(desc: str) -> str:
    """The reference's wiki-prefix strip: removes ``prefix + decoded
    first whitespace token of the page name`` characters from the
    *raw* string — the strip length comes from the decoded name, a
    reference quirk replicated verbatim
    (telegraph_processor.py:207-213)."""
    if desc.startswith(_MRAKOPEDIA_PREFIX):
        try:
            pasta_name = unquote(desc.split("/wiki/")[1].split()[0])
            desc = desc[len(f"{_MRAKOPEDIA_PREFIX}{pasta_name}"):].strip()
        except Exception:
            pass
    return desc


def _extract_fields(html: str) -> tuple[str | None, str | None, str | None]:
    """(title, description, date_published_raw) with the reference's
    exact control flow (telegraph_processor.py:194-224)."""
    if _HAS_BS4:  # pragma: no cover - mirror the reference verbatim
        soup = BeautifulSoup(html, "html.parser")
        title = None
        header = soup.find("header", class_="tl_article_header")
        if header and header.find("h1"):
            title = header.find("h1").text.strip()
        elif soup.title:
            title = soup.title.text.strip().replace(" – Telegraph", "")
        description = None
        meta_description = soup.find("meta", property="twitter:description")
        if meta_description:
            description = _strip_mrakopedia(meta_description.get("content", "").strip())
        date_raw = None
        date_meta = soup.find("meta", property="article:published_time")
        if date_meta:
            date_raw = date_meta.get("content", "").strip() or None
        return title, description, date_raw

    p = _TelegraphExtractor()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass  # keep whatever was extracted before the parse error
    title = None
    if p.header_h1 is not None:
        title = p.header_h1.strip()
    elif p.title is not None:
        title = p.title.strip().replace(" – Telegraph", "")
    description = None
    if "twitter:description" in p.metas:
        description = _strip_mrakopedia((p.metas["twitter:description"] or "").strip())
    date_raw = None
    if "article:published_time" in p.metas:
        date_raw = (p.metas["article:published_time"] or "").strip() or None
    return title, description, date_raw


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
            t, d, p = _extract_fields(h)
            titles.append(t), descs.append(d), pubs.append(p)
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
