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


def refresh_selection(
    discovered: DataFrame,
    fetch_log: DataFrame,
    url_col: str = "loc",
    lastmod_col: str = "lastmod",
    fetched_url_col: str = "url",
    fetched_at_col: str = "fetched_at_s",
) -> DataFrame:
    """Re-crawl selection from sitemap freshness: which discovered
    URLs need (re)fetching? A URL qualifies when it is NEW (no fetch
    record) or STALE (its sitemap ``lastmod`` is strictly newer than
    the recorded fetch time). The crawl-side instance of the
    reference's incremental time-bounded scan (SURVEY S2): the
    comparison key is epoch seconds on both sides — lastmod parsed
    from the sitemap's ISO-8601 form (date-only entries count as
    midnight UTC), fetch times already numeric.

    Returns ``(host, url, lastmod_s, fetched_at_s, reason)`` with
    ``reason in ('new', 'stale')``; fresh URLs (fetched, not newer)
    are excluded, as are discovered entries with unparseable lastmod
    that were already fetched (unverifiable staleness does not
    trigger a refetch storm). One left join on the URL; the fetch log
    side is keyed by URL and pre-projected."""
    # try_to_timestamp: malformed lastmod yields NULL (plain
    # to_timestamp raises under Spark 4's default ANSI mode); the
    # 10-char fallback parses date-only entries as midnight UTC
    lastmod_s = F.unix_timestamp(
        F.try_to_timestamp(F.col(lastmod_col).substr(F.lit(1), F.lit(19)))
    ).cast("long")
    d = discovered.select(
        "host",
        F.col(url_col).alias("url"),
        F.when(
            F.length(F.col(lastmod_col)) >= 10,
            F.coalesce(
                lastmod_s,
                F.unix_timestamp(
                    F.try_to_timestamp(F.col(lastmod_col).substr(F.lit(1), F.lit(10)))
                ).cast("long"),
            ),
        ).alias("lastmod_s"),
    )
    log = fetch_log.select(
        F.col(fetched_url_col).alias("url"),
        F.col(fetched_at_col).cast("long").alias("fetched_at_s"),
    )
    j = d.join(log, "url", "left")
    reason = F.when(F.col("fetched_at_s").isNull(), F.lit("new")).when(
        F.col("lastmod_s").isNotNull()
        & (F.col("lastmod_s") > F.col("fetched_at_s")),
        F.lit("stale"),
    )
    return (
        j.withColumn("reason", reason)
        .where(F.col("reason").isNotNull())
        .select("host", "url", "lastmod_s", "fetched_at_s", "reason")
    )


def recrawl_schedule(
    observations: DataFrame,
    now_s: int,
    default_interval_s: int = 604800,
    min_interval_s: int = 3600,
    url_col: str = "url",
    lastmod_col: str = "lastmod_s",
) -> DataFrame:
    """Change-rate-driven recrawl scheduling: from a history of
    observed ``(url, lastmod_s)`` values (sitemap lastmod across
    refresh fetches, or content-hash change timestamps), estimate each
    URL's change interval and schedule the next fetch —

    - ``n_obs`` distinct observed modification times;
    - ``interval_s`` = observed span div (n_obs - 1) — the mean
      change interval (the uniform-rate estimator a Poisson change
      model reduces to on a lastmod trail) — clamped below by
      ``min_interval_s`` (politeness floor); URLs observed changing
      once or never fall back to ``default_interval_s``;
    - ``next_due_s`` = last observed change + interval;
    - ``due_now`` = next_due_s <= now.

    The freshness economics of a 100 TB crawl: refetching everything
    daily wastes the budget on dead pages, weekly misses news; per-URL
    rate estimation IS the fix, and it is one groupBy over the
    observation history (url-cardinality output) with pure integer
    arithmetic — hash-replayable in SQL."""
    agg = observations.groupBy(F.col(url_col).alias("url")).agg(
        F.count_distinct(F.col(lastmod_col).cast("long")).alias("n_obs"),
        F.min(F.col(lastmod_col).cast("long")).alias("first_s"),
        F.max(F.col(lastmod_col).cast("long")).alias("last_s"),
    )
    est = F.when(
        F.col("n_obs") >= 2,
        F.greatest(
            F.expr("(last_s - first_s) div (n_obs - 1)"),
            F.lit(int(min_interval_s)),
        ),
    ).otherwise(F.lit(int(default_interval_s)))
    return agg.select(
        "url",
        F.col("n_obs").cast("long").alias("n_obs"),
        F.col("last_s").alias("last_change_s"),
        est.cast("long").alias("interval_s"),
        (F.col("last_s") + est).cast("long").alias("next_due_s"),
        ((F.col("last_s") + est) <= F.lit(int(now_s))).alias("due_now"),
    )
