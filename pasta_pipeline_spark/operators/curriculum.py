"""Curriculum ordering for pretraining data (r8).

Curriculum learning (Bengio et al. 2009) feeds a model easy examples
first; for a text corpus the standard cheap difficulty proxy is mean
token length (short common words → easy). This operator assigns every
document to one of ``n_phases`` curriculum phases with (approximately)
EQUAL TOKEN BUDGETS — the unit a training run actually consumes — not
equal document counts.

Scale shape: the corpus collapses to a difficulty-grain histogram
first (difficulty is mean-token-length floored to 1e-4, so its domain
is bounded by 10^4 · max-token-length values regardless of corpus
size), cumulative token sums run over that bounded frame, and each
bucket's phase is the closed-form quotient of its cumulative token
position — no fact-scale window anywhere. Documents sharing a
difficulty value share a phase (the grain of the contract).

Exactness: token counts and cumulative sums are int64; difficulty is
an integer fixed-point; the phase quotient is integer division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pasta_pipeline_spark.functions.text import tokenize_ws


def curriculum_phases(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_phases: int = 4,
) -> DataFrame:
    """Equal-token-budget curriculum phase rollup.

    Per-doc difficulty: ``floor(total_token_chars · 10^4 / n_tokens)``
    (mean token length, fixed-point). Docs bucket at difficulty grain;
    bucket phase = ``min(P−1, (cum_tokens−1)·P div total_tokens)``
    where cum_tokens is the inclusive cumulative token count in
    difficulty order — so phase 0 holds the easiest ~1/P of all
    TOKENS, not documents. Zero-token docs are excluded (fail closed).

    Returns per phase: phase, n_docs, n_tokens, difficulty_min_sc,
    difficulty_max_sc, token_share_sc.
    """
    toks = tokenize_ws(F.col(text_col))
    n_tok = F.size(toks)
    chars = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    per_doc = df.select(
        F.col(id_col),
        n_tok.cast("long").alias("n_tok"),
        chars.alias("chars"),
    ).where(F.col("n_tok") > 0)
    per_doc = per_doc.withColumn(
        "difficulty_sc",
        F.expr("chars * 10000 div n_tok"),
    )
    buckets = per_doc.groupBy("difficulty_sc").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
    )
    # bounded difficulty-domain frames (<= 1e4 * max token length rows)
    w_cum = Window.orderBy("difficulty_sc").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_all = Window.partitionBy()
    cum = buckets.withColumn("cum_tok", F.sum("n_tokens").over(w_cum)).withColumn(
        "total_tok", F.sum("n_tokens").over(w_all)
    )
    phase = F.least(
        F.lit(n_phases - 1),
        F.expr(f"(cum_tok - 1) * {n_phases} div total_tok"),
    ).cast("long")
    return (
        cum.withColumn("phase", phase)
        .groupBy("phase")
        .agg(
            F.sum("n_docs").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.min("difficulty_sc").alias("difficulty_min_sc"),
            F.max("difficulty_sc").alias("difficulty_max_sc"),
        )
        .withColumn(
            "token_share_sc",
            F.floor(
                F.col("n_tokens").cast("double")
                / F.sum("n_tokens").over(w_all).cast("double")
                * 1000000
            ).cast("long"),
        )
        .orderBy("phase")
    )


def curriculum_oracle_sql(table: str = "documents", n_phases: int = 4) -> str:
    """DuckDB twin of :func:`curriculum_phases`."""
    return f"""
    WITH per_doc AS (
      SELECT doc_id,
             CAST(len(t) AS BIGINT) AS n_tok,
             CAST(list_sum(list_transform(t, y -> length(y))) AS BIGINT) AS chars
      FROM (
        SELECT doc_id,
               list_filter(regexp_split_to_array(lower(text), '\\s+'),
                           y -> y <> '') AS t
        FROM {table}
      ) WHERE len(t) > 0
    ), d AS (
      SELECT doc_id, n_tok, chars * 10000 // n_tok AS difficulty_sc
      FROM per_doc
    ), buckets AS (
      SELECT difficulty_sc, COUNT(*) AS n_docs,
             CAST(SUM(n_tok) AS BIGINT) AS n_tokens
      FROM d GROUP BY 1
    ), cum AS (
      SELECT *,
             CAST(SUM(n_tokens) OVER (ORDER BY difficulty_sc
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tok,
             CAST(SUM(n_tokens) OVER () AS BIGINT) AS total_tok
      FROM buckets
    ), phased AS (
      SELECT *,
             LEAST({n_phases - 1}, (cum_tok - 1) * {n_phases} // total_tok) AS phase
      FROM cum
    )
    SELECT CAST(phase AS BIGINT) AS phase,
           CAST(SUM(n_docs) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           MIN(difficulty_sc) AS difficulty_min_sc,
           MAX(difficulty_sc) AS difficulty_max_sc,
           CAST(FLOOR(CAST(SUM(n_tokens) AS DOUBLE)
             / CAST(SUM(SUM(n_tokens)) OVER () AS DOUBLE) * 1000000) AS BIGINT)
             AS token_share_sc
    FROM phased GROUP BY phase ORDER BY phase
    """
