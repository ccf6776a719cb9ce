"""Curation prioritization (r8): ensemble quality scoring, quality-
aware dedup survivorship, and the per-source dedup funnel.

The FineWeb/DCLM-era curation loop ranks documents by a learned or
hand-weighted quality score and lets the SCORE — not arrival order —
decide who survives dedup and which decile ships. Three verbs:

- ``quality_ensemble_deciles`` — a fixed-weight linear ensemble over
  portable integer features (length, gate-stopword hits, mean token
  length, sentence punctuation), bucketed into equal-depth score
  deciles with per-decile profiles. The hand-weighted stand-in for a
  classifier score; the bucketing/rank machinery is what a learned
  score would ride unchanged.
- ``quality_dedup_survivors`` — lede-fingerprint dup groups (first 8
  normalized tokens: syndication/template shape) where the HIGHEST-
  SCORING member survives instead of the smallest id / latest
  timestamp: quality-aware survivorship, the curation counterpart of
  golden-record election (deterministic total order: score desc,
  doc_id asc). Grouping above the exact-text rung is what makes the
  election non-vacuous — exact twins score identically.
- ``source_dedup_funnel`` — per source, documents surviving each rung
  of the cheap dedup ladder (raw → exact text → whitespace-normalized
  text), with survival shares: the per-source ablation row that tells
  you WHICH feed is the copy farm.

Exactness: features are int64; the mean-token-length term is
``floor(double(chars·10^4) / double(n_tok))`` with the IDENTICAL
floor-double tree in the SQL twin (exact while chars·10^4 < 2^53 —
any real document); deciles ride the range-partition rank machinery +
closed-form quotient; survivor election is a (score, id) total order;
funnel survivors are min-id-per-content groups — all hash-oracle-able.

Scale: one expression scan for features; one groupBy per dedup rung;
the decile rollup is a 10-row frame; the survivor window partitions
by content hash (groups bounded by true duplicate multiplicity).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pasta_pipeline_spark.functions.text import tokenize_ws
from pasta_pipeline_spark.operators.quality_filters import STOPWORD_GATE

#: Fixed ensemble weights (score = Σ w_i · feature_i, all int64):
#: reward prose-like docs, penalize long-"word" blobs (mojibake/code).
#: Frozen so the SQL twin shares them literally.
W_CHARS = 1
W_STOP = 2000
W_MEANLEN = -1  # applied to mean-token-length fixed-point (1e4 scale)
W_PUNCT = 500


def quality_score(text_col: str = "text") -> Column:
    """The fixed-weight ensemble score as one int64 expression."""
    c = F.col(text_col)
    toks = tokenize_ws(c)
    n_tok = F.size(toks).cast("long")
    chars_sum = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    mean_len_fp = F.coalesce(
        F.when(
            n_tok > 0,
            F.floor(
                (chars_sum * 10000).cast("double") / n_tok.cast("double")
            ).cast("long"),
        ),
        F.lit(0).cast("long"),
    )
    stop_hits = F.size(
        F.array_intersect(toks, F.array(*[F.lit(s) for s in STOPWORD_GATE]))
    ).cast("long")
    punct_runs = (F.size(F.split(c, r"[.!?]")) - 1).cast("long")
    return (
        F.length(c).cast("long") * W_CHARS
        + stop_hits * W_STOP
        + mean_len_fp * W_MEANLEN
        + punct_runs * W_PUNCT
    )


def _score_sql(text_sql: str = "text") -> str:
    """The identical score as DuckDB SQL (shared literal weights)."""
    toks = (
        f"list_filter(regexp_split_to_array(lower({text_sql}), '\\s+'), y -> y <> '')"
    )
    stop_list = ", ".join(f"'{s}'" for s in STOPWORD_GATE)
    return f"""(
      CAST(length({text_sql}) AS BIGINT) * {W_CHARS}
      + CAST(len(list_filter([{stop_list}], s -> list_contains({toks}, s))) AS BIGINT) * {W_STOP}
      + COALESCE(CASE WHEN len({toks}) > 0 THEN CAST(FLOOR(
          CAST(CAST(list_sum(list_transform({toks}, y -> length(y))) AS BIGINT) * 10000 AS DOUBLE)
          / CAST(len({toks}) AS DOUBLE)) AS BIGINT) END, 0) * ({W_MEANLEN})
      + CAST(len(regexp_split_to_array({text_sql}, '[.!?]')) - 1 AS BIGINT) * {W_PUNCT}
    )"""


def quality_ensemble_deciles(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Equal-depth score deciles with per-decile profiles.

    Returns per decile: decile, n_docs, score_min, score_max,
    chars_sum — ordered. Rank machinery: range-partition +
    driver-prefix-sum ids (operators/ids.py), closed-form decile
    quotient; the rollup frame is 10 rows.
    """
    from .ids import assign_sequential_ids
    from .util import attach_cached_deps

    scored = df.select(
        F.col(id_col),
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
        quality_score(text_col).alias("score"),
    )
    ranked = assign_sequential_ids(scored, ["score", id_col], out_col="__rk")
    n = ranked.count()
    decile = (F.expr(f"(__rk - 1) * 10 div {n}") + 1).cast("long")
    out = (
        ranked.withColumn("decile", decile)
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("score").alias("score_min"),
            F.max("score").alias("score_max"),
            F.sum("n_chars").alias("chars_sum"),
        )
        .orderBy("decile")
    )
    return attach_cached_deps(out, getattr(ranked, "_pasta_cached_deps", []))


def ensemble_deciles_oracle_sql(table: str = "documents") -> str:
    """DuckDB twin of :func:`quality_ensemble_deciles`."""
    return f"""
    WITH scored AS (
      SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
             {_score_sql("text")} AS score
      FROM {table}
    ), ranked AS (
      SELECT *, row_number() OVER (ORDER BY score, doc_id) AS rk,
             COUNT(*) OVER () AS n
      FROM scored
    )
    SELECT CAST((rk - 1) * 10 // n + 1 AS BIGINT) AS decile,
           COUNT(*) AS n_docs,
           MIN(score) AS score_min, MAX(score) AS score_max,
           CAST(SUM(n_chars) AS BIGINT) AS chars_sum
    FROM ranked GROUP BY 1 ORDER BY decile
    """


def quality_dedup_survivors(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    prefix_tokens: int = 8,
) -> DataFrame:
    """Quality-aware near-dup survivorship: candidates group by their
    LEDE FINGERPRINT — md5 of the first ``prefix_tokens`` normalized
    tokens (syndicated articles and template farms share their
    opening; their bodies — and therefore their ensemble scores —
    differ), and the highest-scoring member of each group survives
    (score desc, id asc). Exact-text grouping would be vacuous (twins
    score identically); the lede rung is where election actually
    chooses. Returns only multi-member groups: (content_hash,
    n_members, survivor_id, survivor_score, runner_up_id).
    """
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != ""
    )
    lede = F.md5(F.concat_ws(" ", F.slice(toks, 1, prefix_tokens)))
    scored = df.select(
        F.col(id_col),
        lede.alias("content_hash"),
        quality_score(text_col).alias("score"),
    )
    w = Window.partitionBy("content_hash").orderBy(
        F.desc("score"), F.asc(id_col)
    )
    ranked = scored.withColumn("__rn", F.row_number().over(w)).withColumn(
        "__n", F.count(F.lit(1)).over(Window.partitionBy("content_hash"))
    )
    top2 = ranked.where(F.col("__rn") <= 2).where(F.col("__n") >= 2)
    return (
        top2.groupBy("content_hash")
        .agg(
            F.max("__n").alias("n_members"),
            F.min(F.when(F.col("__rn") == 1, F.col(id_col))).alias("survivor_id"),
            F.min(F.when(F.col("__rn") == 1, F.col("score"))).alias(
                "survivor_score"
            ),
            F.min(F.when(F.col("__rn") == 2, F.col(id_col))).alias(
                "runner_up_id"
            ),
        )
        .orderBy("content_hash")
    )


def quality_survivors_oracle_sql(
    table: str = "documents", prefix_tokens: int = 8
) -> str:
    """DuckDB twin of :func:`quality_dedup_survivors`."""
    return f"""
    WITH scored AS (
      SELECT doc_id,
             md5(array_to_string(list_slice(list_filter(
               regexp_split_to_array(lower(text), '\\s+'), y -> y <> ''),
               1, {prefix_tokens}), ' ')) AS content_hash,
             {_score_sql("text")} AS score
      FROM {table}
    ), ranked AS (
      SELECT *,
             row_number() OVER (PARTITION BY content_hash
               ORDER BY score DESC, doc_id ASC) AS rn,
             COUNT(*) OVER (PARTITION BY content_hash) AS n
      FROM scored
    )
    SELECT content_hash,
           CAST(MAX(n) AS BIGINT) AS n_members,
           MIN(CASE WHEN rn = 1 THEN doc_id END) AS survivor_id,
           MIN(CASE WHEN rn = 1 THEN score END) AS survivor_score,
           MIN(CASE WHEN rn = 2 THEN doc_id END) AS runner_up_id
    FROM ranked WHERE rn <= 2 AND n >= 2
    GROUP BY content_hash ORDER BY content_hash
    """


def source_dedup_funnel(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Per-source dedup-ladder survival: raw count, exact-text
    survivors (min id per md5(text) ACROSS the corpus, attributed to
    the survivor's source), whitespace-normalized survivors, and the
    normalized survival share. Cross-source duplicates are charged to
    the non-surviving source — exactly how a corpus-wide dedup pass
    treats a copy farm.

    Returns per source: source, n_raw, n_exact, n_norm,
    norm_share_sc.
    """
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(source_col).alias("source"),
        F.md5(F.col(text_col)).alias("h_exact"),
        F.md5(
            F.concat_ws(
                " ",
                F.filter(
                    F.split(F.lower(F.col(text_col)), r"\s+"),
                    lambda t: t != "",
                ),
            )
        ).alias("h_norm"),
    )
    raw = base.groupBy("source").agg(F.count(F.lit(1)).alias("n_raw"))

    def survivors(hcol: str, out: str) -> DataFrame:
        surv = base.groupBy(hcol).agg(F.min("id").alias("id"))
        return (
            surv.join(base.select("id", "source"), "id")
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias(out))
        )
    # left joins: a source whose every doc loses to a cross-source
    # duplicate still gets its funnel row (survivor counts 0)
    out = (
        raw.join(survivors("h_exact", "n_exact"), "source", "left")
        .join(survivors("h_norm", "n_norm"), "source", "left")
        .select(
            "source",
            "n_raw",
            F.coalesce("n_exact", F.lit(0)).alias("n_exact"),
            F.coalesce("n_norm", F.lit(0)).alias("n_norm"),
            F.floor(
                F.coalesce("n_norm", F.lit(0)).cast("double")
                / F.col("n_raw").cast("double")
                * 1000000
            )
            .cast("long")
            .alias("norm_share_sc"),
        )
        .orderBy("source")
    )
    return out


def source_funnel_oracle_sql(table: str = "documents") -> str:
    """DuckDB twin of :func:`source_dedup_funnel`."""
    norm = (
        "md5(array_to_string(list_filter("
        "regexp_split_to_array(lower(text), '\\s+'), y -> y <> ''), ' '))"
    )
    return f"""
    WITH base AS (
      SELECT doc_id AS id, source, md5(text) AS h_exact, {norm} AS h_norm
      FROM {table}
    ), raw AS (
      SELECT source, COUNT(*) AS n_raw FROM base GROUP BY 1
    ), se AS (
      SELECT b.source, COUNT(*) AS n_exact
      FROM (SELECT h_exact, MIN(id) AS id FROM base GROUP BY 1) s
      JOIN base b USING (id) GROUP BY 1
    ), sn AS (
      SELECT b.source, COUNT(*) AS n_norm
      FROM (SELECT h_norm, MIN(id) AS id FROM base GROUP BY 1) s
      JOIN base b USING (id) GROUP BY 1
    )
    SELECT source, n_raw,
      CAST(COALESCE(n_exact, 0) AS BIGINT) AS n_exact,
      CAST(COALESCE(n_norm, 0) AS BIGINT) AS n_norm,
      CAST(FLOOR(CAST(COALESCE(n_norm, 0) AS DOUBLE) / CAST(n_raw AS DOUBLE) * 1000000) AS BIGINT) AS norm_share_sc
    FROM raw LEFT JOIN se USING (source) LEFT JOIN sn USING (source)
    ORDER BY source
    """
