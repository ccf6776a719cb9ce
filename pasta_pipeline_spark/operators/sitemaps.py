"""Sitemap ingestion — the discovery half of the crawl frontier.

robots.txt (operators/robots.py) says what may be fetched; sitemaps
(sitemaps.org protocol, the public standard referenced by RFC 9309's
``Sitemap:`` directive) say what EXISTS and when it changed. Parsing
them at corpus scale is again a relational problem: explode each
fetched sitemap body into ``<url>`` entries, extract ``loc`` /
``lastmod`` per entry, and the result joins directly into the
frontier pipeline (canonicalize_url → robots_verdict → anti-join
against processed — each an existing operator).

Pure regexp extraction (portable ``(?s)`` non-greedy patterns — no
XML library, no UDF): sitemap XML is machine-generated and
schema-fixed, which is what makes the regex form robust here, unlike
general HTML. Entries without a ``<loc>`` are dropped; ``lastmod`` is
optional and returned as a raw string (W3C datetime — parse
downstream with the timestamp functions when needed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: One <url>…</url> entry (dotall, non-greedy) — also matches
#: <sitemap>…</sitemap> index entries via the alternation, so a
#: sitemap INDEX parses into (loc, lastmod) rows the same way and the
#: caller recurses by fetching those locs.
_ENTRY_RE = r"(?s)<(?:url|sitemap)>(.*?)</(?:url|sitemap)>"
_LOC_RE = r"(?s)<loc>\s*(.*?)\s*</loc>"
_LASTMOD_RE = r"(?s)<lastmod>\s*(.*?)\s*</lastmod>"


def parse_sitemap(
    df: DataFrame, host_col: str = "host", xml_col: str = "sitemap_xml"
) -> DataFrame:
    """Explode sitemap bodies into ``(host, loc, lastmod)`` rows —
    one per ``<url>`` (or sitemap-index ``<sitemap>``) entry with a
    non-empty ``<loc>``; ``lastmod`` NULL when absent. One projection
    + one explode; linear in sitemap bytes."""
    entries = df.select(
        F.col(host_col).alias("host"),
        F.explode(
            F.regexp_extract_all(F.col(xml_col), F.lit(_ENTRY_RE), 1)
        ).alias("entry"),
    )
    loc = F.regexp_extract("entry", _LOC_RE, 1)
    lastmod = F.regexp_extract("entry", _LASTMOD_RE, 1)
    return (
        entries.select(
            "host",
            loc.alias("loc"),
            F.when(lastmod != "", lastmod).alias("lastmod"),
        )
        .where(F.col("loc") != "")
    )
