"""Per-host politeness scheduling for the crawl frontier.

robots.txt admission (operators/robots.py) decides WHAT may be
fetched; crawl-budget apportionment (operators/sharding.py) decides
HOW MUCH per host; this operator decides WHEN: every admitted URL
gets a deterministic fetch timestamp that respects the host's
crawl-delay and a per-host concurrency cap — the schedule a polite
fetcher fleet executes without any coordination at run time (each
worker just filters its shard to ``fetch_at_s <= now``).

The reference's crawler enforced politeness operationally (~1 req/s
with client-side sleeps — message_scraper's envelope); at 100 TB
scale the schedule must be DATA, planned ahead: one window per host
assigns ranks, and the fetch time is pure integer arithmetic on the
rank. Hosts are the natural parallelism unit (window partitions by
host — millions of partitions, metadata-thin); the only inherent
serial structure is within one host, which is exactly what
politeness demands.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def politeness_schedule(
    frontier: DataFrame,
    host_col: str = "host",
    url_col: str = "url",
    delay_col: str | None = None,
    default_delay_s: int = 1,
    per_host_concurrency: int = 1,
    priority_col: str | None = None,
    start_ts_s: int = 0,
) -> DataFrame:
    """Assign each frontier URL a fetch wave and timestamp:

    - URLs rank within their host by descending ``priority_col``
      (URL-ascending tiebreak; pure URL order when no priority);
    - ``wave = (rank - 1) div per_host_concurrency`` — at most
      ``per_host_concurrency`` fetches per host per wave;
    - ``fetch_at_s = start_ts_s + wave * delay_s`` where ``delay_s``
      is the host's ``delay_col`` (e.g. parsed crawl-delay), falling
      back to ``default_delay_s`` when NULL or absent. ``delay_col``
      is per-ROW, so it is first resolved to ONE value per host —
      ``max`` over the host's non-NULL delays (the conservative,
      most-polite choice) — otherwise rows of one host carrying
      different delays (e.g. a left join's NULL→default fallback on
      some rows) would put two waves at the same wall-clock second
      and break the per-host min-gap guarantee.

    All integer arithmetic; deterministic; one window partitioned by
    host. Returns the frontier plus ``(host_rank, wave, fetch_at_s)``.
    """
    if per_host_concurrency < 1:
        raise ValueError("per_host_concurrency must be >= 1")
    order = (
        [F.desc(priority_col), F.asc(url_col)]
        if priority_col
        else [F.asc(url_col)]
    )
    w = Window.partitionBy(host_col).orderBy(*order)
    delay: Column = (
        F.coalesce(
            F.max(F.col(delay_col).cast("long")).over(
                Window.partitionBy(host_col)
            ),
            F.lit(int(default_delay_s)),
        )
        if delay_col
        else F.lit(int(default_delay_s)).cast("long")
    )
    ranked = frontier.withColumn("host_rank", F.row_number().over(w).cast("long"))
    wave = F.expr(f"(host_rank - 1) div {int(per_host_concurrency)}").cast("long")
    return ranked.withColumn("wave", wave).withColumn(
        "fetch_at_s", (F.lit(int(start_ts_s)) + F.col("wave") * delay).cast("long")
    )


def schedule_compliance(
    fetch_log: DataFrame,
    required_delay_s: int = 1,
    host_col: str = "host",
    ts_col: str = "fetched_at_s",
    delay_col: str | None = None,
) -> DataFrame:
    """Did the fleet actually behave? Per-host politeness audit over a
    fetch log: consecutive-fetch gaps (epoch-second BIGINTs, the
    deterministic (ts, host_rank-free) lag idiom) checked against the
    host's required delay — per host:

    ``(host, n_fetches, n_gaps, min_gap_s, n_violations,
    worst_deficit_s)`` where a violation is a gap strictly smaller
    than the required delay and the deficit is how much was missing.
    ``delay_col`` (per-row host delay, e.g. joined from
    parse_crawl_delays) overrides the global ``required_delay_s``.

    The monitoring counterpart of politeness_schedule: the schedule
    plans politeness, this proves it happened — per-host window +
    one aggregate, same scale shape."""
    from pyspark.sql import Window

    ts = F.col(ts_col).cast("long")
    delay = (
        F.coalesce(F.col(delay_col).cast("long"), F.lit(int(required_delay_s)))
        if delay_col
        else F.lit(int(required_delay_s)).cast("long")
    )
    w = Window.partitionBy(host_col).orderBy(ts)
    gap = ts - F.lag(ts).over(w)
    src = fetch_log.select(
        F.col(host_col).alias("host"), gap.alias("gap"), delay.alias("req")
    )
    viol = F.col("gap").isNotNull() & (F.col("gap") < F.col("req"))
    return src.groupBy("host").agg(
        F.count(F.lit(1)).cast("long").alias("n_fetches"),
        F.count("gap").cast("long").alias("n_gaps"),
        F.min("gap").cast("long").alias("min_gap_s"),
        F.sum(viol.cast("long")).cast("long").alias("n_violations"),
        F.max(F.when(viol, F.col("req") - F.col("gap"))).cast("long").alias(
            "worst_deficit_s"
        ),
    )
