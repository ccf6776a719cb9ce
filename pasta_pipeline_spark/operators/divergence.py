"""Corpus-distribution divergence — the statistical view of curation.

Dedup answers "are these documents the same?"; divergence answers
"are these SOURCES the same kind of text?" — the number a training-mix
designer watches when adding a new crawl slice (is it redundant with
an existing source?) and an ingestion monitor watches across time
(distribution drift). The standard measure is Jensen-Shannon
divergence over token unigram distributions: symmetric, always finite
(unlike KL with disjoint vocabulary), bounded by ln 2.

Exactness contract (the cross-engine playbook): per-token JS terms are
floored to fixed point BEFORE summation, so the aggregate is an int64
sum — order-independent and hash-identical across engines; ``ln`` and
IEEE double arithmetic on integer ratios are bit-identical in
Spark and DuckDB, and the formula is built from one shared expression
string so the two sides cannot drift.

Scale shape: one groupBy over (source, token), one self-equi-join on
the token (the inverted-index skeleton — intersection terms only;
tokens exclusive to one side are handled in closed form
``0.5·ln2·(exclusive mass)``, so no outer join and no union-vocabulary
explosion), one groupBy over source pairs. Token-distribution mass is
touched once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Fixed-point scale for JS terms (1e8: JS <= ln2 ~ 0.693, so totals
#: stay far inside int64 even summed over millions of tokens).
JS_SCALE = 100_000_000

#: Per-token JS contribution over the INTERSECTION vocabulary, with
#: the 1/2 factor folded in; p = ca/ta, q = cb/tb. Shared verbatim by
#: the Spark expression and the DuckDB oracle (``{double}`` is the
#: engine's double-cast spelling).
_JS_TERM = (
    "FLOOR(0.5 * ("
    "(CAST(ca AS DOUBLE)/ta) * ln(2*(CAST(ca AS DOUBLE)/ta)"
    "/((CAST(ca AS DOUBLE)/ta)+(CAST(cb AS DOUBLE)/tb)))"
    " + (CAST(cb AS DOUBLE)/tb) * ln(2*(CAST(cb AS DOUBLE)/tb)"
    "/((CAST(ca AS DOUBLE)/ta)+(CAST(cb AS DOUBLE)/tb)))"
    f") * {JS_SCALE})"
)

#: Closed-form contribution of tokens exclusive to either side:
#: 0.5 * ln2 * (exclusive_p_mass + exclusive_q_mass).
_JS_EXCL = (
    "FLOOR(0.5 * ln(2) * ("
    "(CAST(ta - inter_a AS DOUBLE)/ta) + (CAST(tb - inter_b AS DOUBLE)/tb)"
    f") * {JS_SCALE})"
)


def js_term_sql() -> str:
    """The per-token term in DuckDB spelling (identical text — both
    engines parse the same SQL expression grammar here)."""
    return _JS_TERM


def js_excl_sql() -> str:
    return _JS_EXCL


def source_token_divergence(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between every pair of
    sources' token unigram distributions.

    Returns ``(source_a, source_b, n_common_tokens, js_fp)`` for
    ``source_a < source_b``; ``js_fp`` is JS in 1e-8 units (0 =
    identical distributions, ~69314718 = ln 2 = disjoint). Tokens:
    lowercased whitespace split, empties dropped (the corpus-standard
    tokenization shared with the dedup tiers).

    Source pairs sharing ZERO vocabulary are omitted from the output
    (their JS is exactly ln 2 with no intersection terms to join on) —
    documented contract; real text sources always share stopwords.
    """
    toks = docs.where(F.col(text_col).isNotNull()).select(
        F.col(source_col).alias("source"),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != ""
            )
        ).alias("tok"),
    )
    cnts = toks.groupBy("source", "tok").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    tots = cnts.groupBy("source").agg(F.sum("c").cast("long").alias("t"))
    d = cnts.join(tots, "source")

    a = d.select(
        F.col("source").alias("source_a"), F.col("tok"),
        F.col("c").alias("ca"), F.col("t").alias("ta"),
    )
    b = d.select(
        F.col("source").alias("source_b"), F.col("tok"),
        F.col("c").alias("cb"), F.col("t").alias("tb"),
    )
    inter = (
        a.join(b, "tok")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b", "ta", "tb")
        .agg(
            F.sum(F.expr(_JS_TERM)).cast("long").alias("inner_fp"),
            F.sum("ca").cast("long").alias("inter_a"),
            F.sum("cb").cast("long").alias("inter_b"),
            F.count(F.lit(1)).cast("long").alias("n_common_tokens"),
        )
    )
    return inter.select(
        "source_a",
        "source_b",
        "n_common_tokens",
        (F.col("inner_fp") + F.expr(_JS_EXCL)).cast("long").alias("js_fp"),
    )


def token_distribution(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """``(tok, c)`` unigram counts of a corpus slice — the input shape
    :func:`js_between` compares. Build one per slice (a time window, a
    source, pre/post a filter change) and persist small ones; counts
    are mergeable by addition, so incremental maintenance is a
    groupBy-sum away."""
    return (
        docs.where(F.col(text_col).isNotNull())
        .select(
            F.explode(
                F.filter(
                    F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != ""
                )
            ).alias("tok")
        )
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )


def js_between(a_counts: DataFrame, b_counts: DataFrame) -> DataFrame:
    """Jensen-Shannon divergence between two token-count frames
    (``(tok, c)`` each — from :func:`token_distribution` or any
    persisted count state): ONE row ``(n_common_tokens, js_fp)``.

    The drift-detection form of :func:`source_token_divergence`:
    compare this week's ingest distribution against a frozen
    reference, or a corpus before/after a filter change — same shared
    formula, same fixed-point exactness, same intersection-join +
    closed-form-exclusive-mass shape. Fully disjoint vocabularies
    yield js_fp = ln2 exactly (the totals still join — no omission,
    unlike the pairwise form's inner join over sources)."""
    ta = a_counts.agg(F.sum("c").cast("long").alias("ta"))
    tb = b_counts.agg(F.sum("c").cast("long").alias("tb"))
    joined = (
        a_counts.select("tok", F.col("c").alias("ca"))
        .join(b_counts.select("tok", F.col("c").alias("cb")), "tok")
        .crossJoin(F.broadcast(ta))
        .crossJoin(F.broadcast(tb))
    )
    inter = joined.agg(
        F.coalesce(F.sum(F.expr(_JS_TERM)), F.lit(0)).cast("long").alias("inner_fp"),
        F.coalesce(F.sum("ca"), F.lit(0)).cast("long").alias("inter_a"),
        F.coalesce(F.sum("cb"), F.lit(0)).cast("long").alias("inter_b"),
        F.count(F.lit(1)).cast("long").alias("n_common_tokens"),
    )
    return (
        inter.crossJoin(F.broadcast(ta))
        .crossJoin(F.broadcast(tb))
        .select(
            "n_common_tokens",
            (F.col("inner_fp") + F.expr(_JS_EXCL)).cast("long").alias("js_fp"),
        )
    )


def ks_drift(
    df: DataFrame,
    value_col: str,
    group_pred,
    ks_scale: int = 10_000,
) -> DataFrame:
    """EXACT two-sample Kolmogorov–Smirnov statistic over an integer
    value column — the drift detector for "did the length / score /
    size distribution move?" between two corpus slices (old vs new
    crawl, source A vs B). ``group_pred`` is a boolean Column marking
    slice A; everything else is slice B.

    Exactness: the KS sup-distance is evaluated only at observed
    values, and the comparison is cross-multiplied —
    ``|cum_a * n_b - cum_b * n_a|`` — so it is pure int64 (no ECDF
    doubles to diverge between engines; playbook #12). The reported
    ``ks_fp`` is basis points of the true statistic:
    ``ks_num * ks_scale div (n_a * n_b)``. The argmax value is the
    SMALLEST value attaining the sup (deterministic tie-break).

    Scale shape: one groupBy over DISTINCT values (metadata-scale
    frame), one cumulative window over that distinct-value frame (the
    sanctioned distinct-score SinglePartition shape — never the fact
    table), totals ride in as a 1-row broadcast. NULL values are
    excluded (no order position).
    """
    v = F.col(value_col).cast("long")
    marked = df.where(v.isNotNull()).select(
        v.alias("x"), F.when(group_pred, 1).otherwise(0).cast("long").alias("in_a")
    )
    per_x = marked.groupBy("x").agg(
        F.sum("in_a").cast("long").alias("a"),
        F.sum(F.lit(1) - F.col("in_a")).cast("long").alias("b"),
    )
    return ks_from_counts(per_x, ks_scale=ks_scale)


def ks_from_counts(per_x: DataFrame, ks_scale: int = 10_000) -> DataFrame:
    """KS report from per-distinct-value counts ``(x, a, b)`` — the
    reduce stage of :func:`ks_drift`, public because the counts are
    ADDITIVE state: an incremental sink can maintain them across
    micro-batches (streaming/sink.py incremental_ks_sink) and rebuild
    the exact statistic at any point without rescanning."""
    from pyspark.sql import Window

    w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    cum = per_x.select(
        "x",
        F.sum("a").over(w).cast("long").alias("ca"),
        F.sum("b").over(w).cast("long").alias("cb"),
    )
    totals = per_x.agg(
        F.sum("a").cast("long").alias("n_a"), F.sum("b").cast("long").alias("n_b")
    )
    d = cum.crossJoin(F.broadcast(totals)).select(
        "x",
        "n_a",
        "n_b",
        F.abs(F.col("ca") * F.col("n_b") - F.col("cb") * F.col("n_a"))
        .cast("long")
        .alias("d_num"),
    )
    stat = d.groupBy("n_a", "n_b").agg(F.max("d_num").cast("long").alias("ks_num"))
    return (
        d.join(F.broadcast(stat), ["n_a", "n_b"])
        .where(F.col("d_num") == F.col("ks_num"))
        .groupBy("n_a", "n_b", "ks_num")
        .agg(F.min("x").cast("long").alias("x_at_max"))
        .select(
            "n_a",
            "n_b",
            "ks_num",
            "x_at_max",
            F.expr(f"(ks_num * {ks_scale}) div (n_a * n_b)")
            .cast("long")
            .alias("ks_fp"),
        )
    )


def ks_drift_oracle_sql(
    table: str,
    value_sql: str,
    group_a_where: str,
    ks_scale: int = 10_000,
) -> str:
    """DuckDB twin of :func:`ks_drift` (same integer contract)."""
    return f"""
    WITH marked AS (
      SELECT CAST(({value_sql}) AS BIGINT) AS x,
             CASE WHEN ({group_a_where}) THEN 1 ELSE 0 END AS in_a
      FROM {table} WHERE ({value_sql}) IS NOT NULL
    ), per_x AS (
      SELECT x, CAST(SUM(in_a) AS BIGINT) AS a,
             CAST(SUM(1 - in_a) AS BIGINT) AS b
      FROM marked GROUP BY x
    ), cum AS (
      SELECT x,
             CAST(SUM(a) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ca,
             CAST(SUM(b) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cb
      FROM per_x
    ), tot AS (
      SELECT CAST(SUM(a) AS BIGINT) AS n_a, CAST(SUM(b) AS BIGINT) AS n_b FROM per_x
    ), d AS (
      SELECT x, n_a, n_b,
             CAST(abs(ca * n_b - cb * n_a) AS BIGINT) AS d_num
      FROM cum CROSS JOIN tot
    )
    SELECT n_a, n_b, CAST(MAX(d_num) AS BIGINT) AS ks_num,
           CAST(MIN(CASE WHEN d_num = (SELECT MAX(d_num) FROM d) THEN x END) AS BIGINT) AS x_at_max,
           CAST(MAX(d_num) * {ks_scale} // (n_a * n_b) AS BIGINT) AS ks_fp
    FROM d GROUP BY n_a, n_b
    """
