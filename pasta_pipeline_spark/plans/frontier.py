"""Crawl-frontier capstone — the discovery-to-workload pipeline.

The crawl-side composite (the acquisition mirror of
plans/training_data.py's curation capstone): sitemap discovery →
URL canonicalization → robots admission → already-crawled anti-join →
per-host budget apportionment, each stage an existing oracle-checked
operator, composed as ONE lazy plan:

1. ``parse_sitemap``            — (host, loc, lastmod) discovery rows;
2. ``canonicalize_url``         — crawl variants collapse (tracking
   params, ports, fragments, param order); keep-first per canonical;
3. ``robots_verdict``           — RFC 9309 admission, broadcast join;
4. anti-join against the processed set — only genuinely new work;
5. ``allocate_budget``          — fetch slots per host by largest
   remainder over the surviving frontier mass, and a per-host
   row_number cap enforcing them;
6. ``politeness_schedule``      — (optional, ``schedule=True``) each
   surviving URL gets a deterministic fetch wave + timestamp under
   the per-host crawl delay, so the fetch list is directly
   executable by an uncoordinated worker fleet.

Every step is pure DataFrame plumbing: no collect, the only windows
run per host (frontier keys, not corpus mass), the rules/processed
sides broadcast. Output: the admitted, deduplicated, budget-capped
fetch list — exactly what sources/fetch.py consumes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pasta_pipeline_spark.functions.urls import canonicalize_url
from pasta_pipeline_spark.operators.robots import robots_verdict
from pasta_pipeline_spark.operators.sharding import allocate_budget
from pasta_pipeline_spark.operators.sitemaps import parse_sitemap


def build_frontier(
    sitemaps: DataFrame,
    robots_rules: DataFrame,
    processed: DataFrame,
    total_budget: int = 10_000,
    agent: str = "*",
    schedule: bool = False,
    crawl_delay_s: int = 1,
    per_host_concurrency: int = 1,
    start_ts_s: int = 0,
    crawl_delays: DataFrame | None = None,
) -> DataFrame:
    """Compose the stages; see module docstring. ``sitemaps`` is
    (host, sitemap_xml); ``robots_rules`` the parse_robots_txt shape;
    ``processed`` a single-column ``url`` frame of completed fetches.
    Returns ``(host, url, budget_rank)`` — admitted URLs with their
    per-host rank under the apportioned budget — plus
    ``(host_rank, wave, fetch_at_s)`` when ``schedule=True``.

    Composed from :func:`admit_discoveries` (stages 1-4, the per-batch
    incremental half the streaming frontier reuses) and
    :func:`frontier_workload` (stages 5-6, a pure function of the
    maintained fresh-URL set)."""
    fresh = admit_discoveries(sitemaps, robots_rules, processed, agent=agent)
    return frontier_workload(
        fresh,
        total_budget=total_budget,
        agent=agent,
        schedule=schedule,
        crawl_delay_s=crawl_delay_s,
        per_host_concurrency=per_host_concurrency,
        start_ts_s=start_ts_s,
        crawl_delays=crawl_delays,
    )


def admit_discoveries(
    sitemaps: DataFrame,
    robots_rules: DataFrame,
    processed: DataFrame,
    agent: str = "*",
) -> DataFrame:
    """Stages 1-4 of the frontier: sitemap parse -> canonicalize +
    URL-dedup -> robots admission -> processed anti-join. Returns the
    admitted FRESH ``(host, url)`` set — a pure set-valued function of
    the discoveries, which is what makes the streaming frontier exact:
    maintaining the UNION of per-batch admissions (keyed by url)
    equals admitting the union."""
    discovered = parse_sitemap(sitemaps)
    canon = (
        discovered.select(
            "host", canonicalize_url(F.col("loc")).alias("url")
        )
        .where(F.col("url").isNotNull())
        .dropDuplicates(["url"])
    )
    path = F.regexp_extract("url", r"^[a-z]+://[^/?#]*(/[^?#]*)", 1)
    with_path = canon.withColumn(
        "path", F.when(path == "", F.lit("/")).otherwise(path)
    )
    # verdicts over DISTINCT (host, path): several canonical urls can
    # share a path (query strings differ) — dedup before the verdict
    # join so no row multiplies
    verdicts = robots_verdict(
        with_path.select("host", "path").distinct(), robots_rules, agent=agent
    )
    admitted = (
        with_path.join(verdicts, ["host", "path"])
        .where(F.col("allowed"))
        .select("host", "url")
    )
    return admitted.join(
        processed.select(F.col("url")), "url", "left_anti"
    )


def frontier_workload(
    fresh: DataFrame,
    total_budget: int = 10_000,
    agent: str = "*",
    schedule: bool = False,
    crawl_delay_s: int = 1,
    per_host_concurrency: int = 1,
    start_ts_s: int = 0,
    crawl_delays: DataFrame | None = None,
) -> DataFrame:
    """Stages 5-6 of the frontier over an admitted fresh-URL set
    ``(host, url)``: per-host budget apportionment + rank cap, and the
    optional politeness schedule. Budgets depend on the WHOLE set's
    per-host mass, so this half runs over the maintained state, not
    per micro-batch — host-count-scale work either way."""
    weights = fresh.groupBy(F.col("host").alias("key")).agg(
        F.count(F.lit(1)).cast("long").alias("weight")
    )
    budgets = allocate_budget(weights, total=total_budget).select(
        F.col("key").alias("host"), F.col("budget")
    )
    w = Window.partitionBy("host").orderBy("url")
    capped = (
        fresh.withColumn("budget_rank", F.row_number().over(w))
        .join(F.broadcast(budgets), "host")
        .where(F.col("budget_rank") <= F.col("budget"))
        .select("host", "url", F.col("budget_rank").cast("long").alias("budget_rank"))
    )
    if not schedule:
        return capped
    from pasta_pipeline_spark.operators.politeness import politeness_schedule

    delay_col = None
    if crawl_delays is not None:
        # per-host robots Crawl-delay (operators/robots.py
        # parse_crawl_delays): prefer the crawler's own agent row,
        # fall back to '*', then to the default — one broadcast join
        picked = (
            crawl_delays.where(
                F.col("agent").isin(agent.lower(), "*")
            )
            .groupBy("host")
            .agg(
                F.max(
                    F.when(F.col("agent") == agent.lower(), F.col("delay_s"))
                ).alias("__own"),
                F.max(
                    F.when(F.col("agent") == "*", F.col("delay_s"))
                ).alias("__star"),
            )
            .select(
                "host", F.coalesce(F.col("__own"), F.col("__star")).alias("robots_delay_s")
            )
        )
        capped = capped.join(F.broadcast(picked), "host", "left")
        delay_col = "robots_delay_s"

    out = politeness_schedule(
        capped,
        delay_col=delay_col,
        default_delay_s=crawl_delay_s,
        per_host_concurrency=per_host_concurrency,
        start_ts_s=start_ts_s,
    )
    return out.drop("robots_delay_s") if delay_col else out
