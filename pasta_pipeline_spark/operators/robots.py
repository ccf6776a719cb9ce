"""robots.txt parsing and URL admission — the crawl-policy gate.

A crawl pipeline must not fetch what the site disallows; at corpus
scale that is a JOIN problem, not a per-request check: parse every
host's robots.txt once into a rules table, then admit/deny the whole
frontier in one broadcast join. Semantics follow RFC 9309 (the
Robots Exclusion Protocol, published standard):

- groups: one or more consecutive ``User-agent:`` lines followed by
  ``Allow:`` / ``Disallow:`` rules; a crawler obeys the group for its
  own token if one exists for the host, else the ``*`` group;
- matching: rule paths are byte-prefix patterns with ``*`` wildcards
  and an optional ``$`` end anchor; the MOST SPECIFIC match (longest
  pattern, in octets) wins; on a specificity tie, ``allow`` wins;
  no match at all → allowed;
- an empty ``Disallow:`` matches nothing (allows everything).

The parse is window-based DataFrame code (posexplode lines, running
group ids — no per-file Python); the matcher converts patterns to
regexes IN the rules frame (escape, ``*`` → ``.*``, anchor) and
broadcast-joins the frontier, so admission is one scan of the URLs
however large the frontier is.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def parse_robots_txt(
    df: DataFrame, host_col: str = "host", text_col: str = "robots_txt"
) -> DataFrame:
    """Parse robots.txt bodies into a rules table
    ``(host, agent, rule, pattern, spec_len)`` — one row per
    (user-agent, allow|disallow) pair, empty-Disallow rows dropped
    (they match nothing per RFC 9309). Group structure (consecutive
    UA lines share the rules that follow) is reconstructed with two
    windows over the line number; comments and unknown directives are
    ignored."""
    lines = df.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("ln", "line"),
    ).select(
        "host",
        "ln",
        F.trim(F.regexp_replace("line", "#.*$", "")).alias("l"),
    )
    # directive NAMES and user-agent tokens are case-insensitive (RFC
    # 9309 §2.2.1/§2.2.2); rule PATHS are case-SENSITIVE — so the kind
    # test runs on a lowercased copy while the value keeps its case,
    # and only UA values are folded
    low = F.lower(F.col("l"))
    typed = lines.select(
        "host",
        "ln",
        F.when(low.startswith("user-agent:"), F.lit("ua"))
        .when(low.startswith("allow:"), F.lit("allow"))
        .when(low.startswith("disallow:"), F.lit("disallow"))
        .alias("kind"),
        F.trim(F.regexp_extract("l", r"^[A-Za-z-]+:(.*)$", 1)).alias("raw_value"),
    ).where(F.col("kind").isNotNull()).select(
        "host",
        "ln",
        "kind",
        F.when(F.col("kind") == "ua", F.lower(F.col("raw_value")))
        .otherwise(F.col("raw_value"))
        .alias("value"),
    )
    w = Window.partitionBy("host").orderBy("ln")
    # a new group starts at a UA line NOT immediately preceded (among
    # directive lines) by another UA line
    grouped = typed.withColumn("prev_kind", F.lag("kind").over(w)).withColumn(
        "grp_start",
        (
            (F.col("kind") == "ua")
            & (F.coalesce(F.col("prev_kind"), F.lit("-")) != "ua")
        ).cast("int"),
    ).withColumn("grp", F.sum("grp_start").over(w))
    uas = grouped.where(F.col("kind") == "ua").select(
        "host", "grp", F.col("value").alias("agent")
    )
    rules = grouped.where(F.col("kind") != "ua").select(
        "host",
        "grp",
        F.col("kind").alias("rule"),
        F.col("value").alias("pattern"),
    ).where(F.col("pattern") != "")  # empty Disallow matches nothing
    return uas.join(rules, ["host", "grp"]).select(
        "host",
        "agent",
        "rule",
        "pattern",
        F.length("pattern").cast("long").alias("spec_len"),
    )


def _pattern_regex_expr() -> str:
    """The conversion as one SQL expression over a column named
    ``pattern`` — used by BOTH the Spark matcher (F.expr) and the
    DuckDB oracle, so the two cannot drift. '$' is not a regex
    metacharacter we escape, so a trailing '$' anchors naturally."""
    return (
        "concat('^', regexp_replace("
        "regexp_replace(pattern, '([.^+?(){}\\\\[\\\\]|\\\\\\\\])', '\\\\\\\\$1'),"
        " '\\\\*', '.*'))"
    )


def robots_pattern_regex(pattern: str) -> str:
    """Python twin of :func:`_pattern_regex_expr` (same conversion,
    computed driver-side): used by the oracle generator to inline the
    expected regexes, so the SQL conversion is pinned against an
    independent implementation — a drift in either breaks the hash."""
    import re as _re

    esc = _re.sub(r"([.^+?(){}\[\]|\\])", r"\\\1", pattern)
    return "^" + esc.replace("*", ".*")


def robots_verdict(
    urls: DataFrame,
    rules: DataFrame,
    agent: str = "*",
    host_col: str = "host",
    path_col: str = "path",
) -> DataFrame:
    """Admission verdict per frontier URL: ``(host, path, allowed)``.

    Group selection per RFC 9309: hosts with a group for ``agent``
    use ONLY that group; others fall back to the ``*`` group; hosts
    with no rules at all allow everything. Longest-pattern match wins,
    allow beats disallow on ties, no match → allowed. One broadcast
    join of the frontier against the (small) rules table."""
    agent = agent.lower()
    per_host = rules.groupBy("host").agg(
        F.max((F.col("agent") == agent).cast("int")).alias("has_exact")
    )
    applicable = (
        rules.join(per_host, "host")
        .where(
            ((F.col("has_exact") == 1) & (F.col("agent") == agent))
            | ((F.col("has_exact") == 0) & (F.col("agent") == "*"))
        )
        .select(
            F.col("host").alias("r_host"),
            "rule",
            "spec_len",
            F.expr(_pattern_regex_expr()).alias("rx"),
        )
    )
    j = urls.select(
        F.col(host_col).alias("host"), F.col(path_col).alias("path")
    ).join(
        F.broadcast(applicable),
        F.col("host") == F.col("r_host"),
        "left",
    )
    matched = j.withColumn(
        "hit", F.col("rx").isNotNull() & F.expr("path RLIKE rx")
    )
    w = Window.partitionBy("host", "path").orderBy(
        F.desc("hit"),
        F.desc("spec_len"),
        F.asc(F.col("rule") == "disallow"),  # allow wins ties
    )
    return (
        matched.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(
            "host",
            "path",
            F.when(F.col("hit") & (F.col("rule") == "disallow"), F.lit(False))
            .otherwise(F.lit(True))
            .alias("allowed"),
        )
    )


def parse_crawl_delays(
    df: DataFrame, host_col: str = "host", text_col: str = "robots_txt"
) -> DataFrame:
    """Extract ``Crawl-delay`` directives into ``(host, agent,
    delay_s)`` — the de-facto extension (not in RFC 9309, but honored
    by major non-Google crawlers and by polite corpus collection).
    Group association follows the same consecutive-UA-lines
    reconstruction as :func:`parse_robots_txt`; fractional values
    round UP (ceil — politeness errs slow); non-numeric values are
    dropped; several delays in one group keep the LARGEST. Feed the
    result to politeness_schedule's ``delay_col`` via a broadcast
    join on host (picking the crawler's agent row, '*' fallback)."""
    lines = df.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("ln", "line"),
    ).select(
        "host", "ln", F.trim(F.regexp_replace("line", "#.*$", "")).alias("l")
    )
    low = F.lower(F.col("l"))
    typed = lines.select(
        "host",
        "ln",
        F.when(low.startswith("user-agent:"), F.lit("ua"))
        .when(low.startswith("crawl-delay:"), F.lit("delay"))
        .when(low.startswith("allow:") | low.startswith("disallow:"), F.lit("rule"))
        .alias("kind"),
        F.trim(F.regexp_extract("l", r"^[A-Za-z-]+:(.*)$", 1)).alias("raw_value"),
    ).where(F.col("kind").isNotNull())
    w = Window.partitionBy("host").orderBy("ln")
    grouped = (
        typed.withColumn("prev_kind", F.lag("kind").over(w))
        .withColumn(
            "grp_start",
            (
                (F.col("kind") == "ua")
                & (F.coalesce(F.col("prev_kind"), F.lit("-")) != "ua")
            ).cast("int"),
        )
        .withColumn("grp", F.sum("grp_start").over(w))
    )
    uas = grouped.where(F.col("kind") == "ua").select(
        "host", "grp", F.lower(F.col("raw_value")).alias("agent")
    )
    delays = (
        grouped.where(F.col("kind") == "delay")
        .select(
            "host",
            "grp",
            F.ceil(F.expr("try_cast(raw_value AS DOUBLE)")).cast("long").alias("delay_s"),
        )
        .where(F.col("delay_s").isNotNull() & (F.col("delay_s") >= 0))
    )
    return (
        uas.join(delays, ["host", "grp"])
        .groupBy("host", "agent")
        .agg(F.max("delay_s").alias("delay_s"))
    )


def parse_sitemap_directives(
    df: DataFrame, host_col: str = "host", text_col: str = "robots_txt"
) -> DataFrame:
    """Extract ``Sitemap:`` directives into ``(host, sitemap_url)``
    rows — the discovery link between the policy file and the
    frontier: robots.txt advertises the sitemaps, parse_sitemap
    explodes them, build_frontier does the rest. Per the sitemaps.org
    protocol the directive is GLOBAL (not scoped to any user-agent
    group), so this is a flat line parse: case-insensitive directive
    name, full absolute URL value, comments stripped, duplicates
    collapsed. One projection + explode, linear in robots bytes."""
    lines = df.select(
        F.col(host_col).alias("host"),
        F.explode(F.split(F.col(text_col), "\n")).alias("line"),
    ).select(
        "host", F.trim(F.regexp_replace("line", "#.*$", "")).alias("l")
    )
    url = F.trim(F.regexp_extract("l", r"^[Ss][Ii][Tt][Ee][Mm][Aa][Pp]\s*:(.*)$", 1))
    return (
        lines.select("host", url.alias("sitemap_url"))
        .where(F.col("sitemap_url") != "")
        .distinct()
    )


def robots_refetch_list(
    frontier_hosts: DataFrame,
    robots_cache: DataFrame,
    now_s: int,
    max_age_s: int = 86400,
    host_col: str = "host",
    fetched_col: str = "fetched_at_s",
) -> DataFrame:
    """Which hosts need a robots.txt (re)fetch before the next crawl
    wave: every frontier host whose cached robots entry is missing or
    older than ``max_age_s`` (RFC 9309 §2.4 allows caching 'generally
    up to 24 hours'). Per host: ``(host, last_fetch_s, age_s, stale)``
    with NULL last_fetch for never-fetched hosts (always stale).

    The staleness audit the crawl stack was missing: admission
    (robots_verdict) assumes rules are CURRENT; this is the operator
    that keeps them so — run it against the frontier's host set, fetch
    the stale list, then admit. Frontier hosts dedupe first; the cache
    side aggregates to one row per host (latest fetch wins) — both
    frames are host-cardinality, one broadcast-friendly join."""
    hosts = frontier_hosts.select(F.col(host_col).alias("host")).distinct()
    cache = robots_cache.groupBy(F.col(host_col).alias("host")).agg(
        F.max(F.col(fetched_col).cast("long")).alias("last_fetch_s")
    )
    j = hosts.join(cache, "host", "left")
    age = F.lit(int(now_s)) - F.col("last_fetch_s")
    return j.select(
        "host",
        F.col("last_fetch_s"),
        age.cast("long").alias("age_s"),
        (
            F.col("last_fetch_s").isNull() | (age > F.lit(int(max_age_s)))
        ).alias("stale"),
    )
