"""Statistics aggregates — A2/A3/A4/A6 in SURVEY.md §2.4.

Parity source: get_cleanup_statistics
(/root/reference/dags/processors/duplicate_remover.py:236-311) — three
single-scan aggregate queries plus derived arithmetic.

Scale notes: each stat is one scan with map-side partial aggregation;
``countDistinct`` is exact (matching the reference); callers at the
100 TB tier can pass ``approx=True`` to switch to HyperLogLog
``approx_count_distinct`` (the documented scale variant, SURVEY.md A2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def message_stats(messages: DataFrame, approx: bool = False) -> DataFrame:
    """COUNT(*), COUNT(DISTINCT message_id), COUNT(telegraph_link),
    derived duplicate count — one scan (duplicate_remover.py:246-252)."""
    cd = (
        F.approx_count_distinct("message_id")
        if approx
        else F.countDistinct("message_id")
    )
    return messages.agg(
        F.count(F.lit(1)).alias("total_messages"),
        cd.alias("unique_messages"),
        F.count("telegraph_link").alias("messages_with_links"),
    ).withColumn(
        "duplicate_messages", F.col("total_messages") - F.col("unique_messages")
    )


def content_stats(content: DataFrame, approx: bool = False) -> DataFrame:
    """Conditional aggregates over the content table
    (duplicate_remover.py:259-266)."""
    cd = (
        F.approx_count_distinct("content_hash")
        if approx
        else F.countDistinct("content_hash")
    )
    return content.agg(
        F.count(F.lit(1)).alias("total_content"),
        F.count(F.when(F.col("status") == "success", 1)).alias("successful_content"),
        F.count(F.when(F.col("status") != "success", 1)).alias("failed_content"),
        cd.alias("unique_hashes"),
    )


def status_breakdown(content: DataFrame) -> DataFrame:
    """Per-status row counts — the grouped-aggregate surface implied by
    the stats report (SURVEY.md §2.4)."""
    return content.groupBy("status").agg(F.count(F.lit(1)).alias("n")).orderBy("status")


def cleanup_summary(parts: dict[str, int]) -> dict:
    """A6 — sum per-task deleted-row counts into total_cleaned
    (duplicate_remover.py:335-348). Driver-side arithmetic over already
    collected scalars; no DataFrame work."""
    total = sum(v for v in parts.values() if isinstance(v, int))
    return {**parts, "total_cleaned": total}


def source_concentration(
    df: DataFrame,
    group_col: str = "source",
    weight_col: str | None = None,
    ln_scale: int = 1_000_000_000,
) -> DataFrame:
    """Corpus concentration report over ``group_col`` — the one-row
    diversity audit a training mix needs before anything trains on
    it ("is this corpus secretly 60% one site?"):

    - ``n_groups``, ``total_w``;
    - ``hhi_bp2``: Herfindahl-Hirschman index as the int64 sum of
      squared basis-point shares (10000² = single-source monopoly);
    - ``entropy_fp``: Shannon entropy of the share distribution in
      nats, fixed-point — computed as ln(W) - SUM(w·lnfp(w))/W so
      every term is an int64 product of a weight and a fixed-point
      ln (the unigram_nll playbook), one division at the end;
    - ``gini_bp``: Gini coefficient in basis points via the sorted
      cumulative formula G = (2·Σ(i·w_i) - (n+1)·W) / (n·W) over
      weights ascending (deterministic group-name tiebreak) —
      all-equal shares → 0, monopoly → (n-1)/n.

    The window runs over the GROUP table (sources/domains —
    metadata-scale), never corpus rows; weights default to row
    counts. Zero/negative-weight groups are excluded."""
    w_expr = (
        F.count(F.lit(1)).cast("long")
        if weight_col is None
        else F.sum(F.col(weight_col)).cast("long")
    )
    groups = (
        df.groupBy(F.col(group_col).alias("g"))
        .agg(w_expr.alias("w"))
        .where(F.col("w") > 0)
    )
    win = Window.orderBy(F.asc("w"), F.asc("g"))
    ranked = groups.withColumn("i", F.row_number().over(win).cast("long"))
    lnfp = f"CAST(FLOOR(ln(CAST(w AS DOUBLE)) * {ln_scale}) AS BIGINT)"
    return _concentration_agg(ranked, lnfp, ln_scale)


def _concentration_agg(ranked: DataFrame, lnfp: str, ln_scale: int) -> DataFrame:
    totals = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum("w").cast("long").alias("total_w"),
        F.sum(F.expr(f"w * ({lnfp})")).cast("long").alias("__swl"),
        F.sum(F.expr("i * w")).cast("long").alias("__siw"),
    )
    share_bp = "(w * 10000) div total_w"
    hhi = ranked.crossJoin(F.broadcast(totals.select("total_w"))).agg(
        F.sum(F.expr(f"({share_bp}) * ({share_bp})")).cast("long").alias("hhi_bp2")
    )
    return (
        totals.crossJoin(F.broadcast(hhi))
        .select(
            "n_groups",
            "total_w",
            "hhi_bp2",
            F.expr(
                f"CAST(FLOOR(ln(CAST(total_w AS DOUBLE)) * {ln_scale}) AS BIGINT)"
                " - (__swl div total_w)"
            ).cast("long").alias("entropy_fp"),
            F.expr(
                "CASE WHEN n_groups > 1 THEN"
                " ((2 * __siw - (n_groups + 1) * total_w) * 10000)"
                " div (n_groups * total_w) ELSE 0 END"
            ).cast("long").alias("gini_bp"),
        )
    )


def corpus_datacard(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    lang_col: str | None = "lang",
) -> DataFrame:
    """The data card — one ``(metric, value)`` frame of corpus-level
    facts a curation team ships alongside a training corpus: volume
    (docs, sources, characters, mean length), diversity
    (languages, top-source share, concentration via
    :func:`source_concentration`), and exact-duplication mass
    (docs whose text repeats, distinct duplicated texts). Every value
    is int64 so the whole card hash-replays in SQL.

    Cost: one scan for the volume/dup aggregates + the
    metadata-scale concentration window; emitted as a skinny union so
    downstream can diff cards between corpus versions with
    TableStore.diff semantics (metric as the key)."""
    base = df.where(F.col(text_col).isNotNull())
    vol = base.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct(source_col).cast("long").alias("n_sources"),
        F.sum(F.length(text_col)).cast("long").alias("total_chars"),
        F.expr(f"sum(length({text_col})) div count(1)").cast("long").alias("mean_chars"),
        (
            F.countDistinct(lang_col).cast("long")
            if lang_col
            else F.lit(None).cast("long")
        ).alias("n_langs"),
    )
    top_share = (
        base.groupBy(source_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .agg(
            F.expr("(max(n) * 10000) div sum(n)").cast("long").alias("top_source_bp")
        )
    )
    dup = (
        base.groupBy(F.md5(F.col(text_col)).alias("h"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .agg(
            F.sum(F.when(F.col("n") > 1, F.col("n")).otherwise(F.lit(0)))
            .cast("long")
            .alias("dup_docs"),
            F.sum((F.col("n") > 1).cast("long")).cast("long").alias("dup_texts"),
        )
    )
    conc = source_concentration(base, group_col=source_col).select(
        "hhi_bp2", "entropy_fp", "gini_bp"
    )
    wide = (
        vol.crossJoin(F.broadcast(top_share))
        .crossJoin(F.broadcast(dup))
        .crossJoin(F.broadcast(conc))
    )
    metrics = [
        "n_docs", "n_sources", "total_chars", "mean_chars", "n_langs",
        "top_source_bp", "dup_docs", "dup_texts",
        "hhi_bp2", "entropy_fp", "gini_bp",
    ]
    stacked = ", ".join(f"'{m}', {m}" for m in metrics)
    return wide.selectExpr(
        f"stack({len(metrics)}, {stacked}) AS (metric, value)"
    )


def revenue_lorenz_deciles(orders: DataFrame) -> DataFrame:
    """Customer-revenue Lorenz curve at decile grain (r8): rank
    customers by total spend ascending and roll up equal-depth deciles
    with per-decile and cumulative revenue shares — the 80/20
    concentration read (top decile's cum complement) for the customer
    base, the money-grain sibling of the corpus-source concentration
    report.

    Scale posture: the rank comes from the range-partition +
    driver-prefix-sum machinery (operators/ids.py — never an
    empty-OVER ntile/row_number over the customer dimension); the
    decile is the closed-form quotient ((rk-1)·10 div n); the decile
    frame itself is 10 rows, so its windows are bounded.

    Returns per decile: decile, n_customers, revenue_cents,
    rev_share_sc, cum_share_sc.
    """
    from .ids import assign_sequential_ids
    from .util import attach_cached_deps

    cust = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents")
    )
    ranked = assign_sequential_ids(cust, ["cents", "custkey"], out_col="__rk")
    n = ranked.count()  # driver scalar (the ids pass already counted)
    decile = F.expr(f"(__rk - 1) * 10 div {n}") + 1
    per_dec = (
        ranked.withColumn("decile", decile.cast("long"))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("cents").alias("revenue_cents"),
        )
    )
    w_all = Window.partitionBy()  # 10-row frame
    w_cum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    out = (
        per_dec.withColumn("__total", F.sum("revenue_cents").over(w_all))
        .withColumn("__cum", F.sum("revenue_cents").over(w_cum))
        .select(
            "decile",
            "n_customers",
            "revenue_cents",
            F.floor(
                F.col("revenue_cents").cast("double")
                / F.col("__total").cast("double")
                * 1000000
            )
            .cast("long")
            .alias("rev_share_sc"),
            F.floor(
                F.col("__cum").cast("double")
                / F.col("__total").cast("double")
                * 1000000
            )
            .cast("long")
            .alias("cum_share_sc"),
        )
        .orderBy("decile")
    )
    return attach_cached_deps(out, getattr(ranked, "_pasta_cached_deps", []))


def lorenz_oracle_sql(table: str = "orders") -> str:
    """DuckDB twin of :func:`revenue_lorenz_deciles` (row_number over
    the same (cents, custkey) total order + the same closed-form
    decile quotient)."""
    return f"""
    WITH cust AS (
      SELECT o_custkey AS custkey,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM {table} GROUP BY 1
    ), ranked AS (
      SELECT *, row_number() OVER (ORDER BY cents, custkey) AS rk,
             COUNT(*) OVER () AS n
      FROM cust
    ), per_dec AS (
      SELECT (rk - 1) * 10 // n + 1 AS decile,
             COUNT(*) AS n_customers,
             CAST(SUM(cents) AS BIGINT) AS revenue_cents
      FROM ranked GROUP BY 1
    )
    SELECT CAST(decile AS BIGINT) AS decile, n_customers, revenue_cents,
      CAST(FLOOR(CAST(revenue_cents AS DOUBLE)
        / CAST(SUM(revenue_cents) OVER () AS DOUBLE) * 1000000) AS BIGINT) AS rev_share_sc,
      CAST(FLOOR(CAST(SUM(revenue_cents) OVER (ORDER BY decile
          ROWS UNBOUNDED PRECEDING) AS DOUBLE)
        / CAST(SUM(revenue_cents) OVER () AS DOUBLE) * 1000000) AS BIGINT) AS cum_share_sc
    FROM per_dec ORDER BY decile
    """
