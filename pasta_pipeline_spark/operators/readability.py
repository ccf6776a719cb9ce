"""Readability scoring (Flesch reading ease) over the documents table.

The quality-filter family (Gopher rules, C4 line cleaning, CCNet
perplexity) gates on repetition/length/LM signals; readability adds the
classic surface-form difficulty signal used to route documents into
educational-quality tiers (the FineWeb-Edu shape: score → tier →
mixture weight).

Counting is heuristic but DETERMINISTIC and engine-portable:

- words     = count of ``\\S+`` runs,
- sentences = count of ``[.!?]+`` runs (min 1),
- syllables = count of ``[aeiouy]+`` vowel-group runs in the lowercased
  text (the standard cheap proxy; silent-e and vowel-less tokens are
  not special-cased — documented heuristic, identical in the twin).

Flesch = 206.835 − 1.015·(W/S) − 84.6·(Syl/W), a fixed double tree
over int64 counts with literal constants — bit-identical cross-engine.

One projection scan → one groupBy(lang): at 100 TB this is a pure
map-side expression pipeline plus a |langs|-row shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: difficulty tier cut points (Flesch reading-ease convention)
EASY_MIN = 70.0
HARD_MAX = 50.0


def flesch_by_lang(
    df: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Per-language readability profile.

    Returns (lang, n_docs, avg_flesch_sc, n_easy, n_standard, n_hard)
    where avg_flesch_sc is the fixed-point-bridged mean of the per-doc
    scores (floor(score·1e4) summed as int64, divided by 1e4·n at the
    end) and the tier counts bucket per-doc scores at ≥70 / (50,70) /
    ≤50.
    """
    words = F.regexp_count(F.col(text_col), F.lit(r"\S+"))
    sentences = F.greatest(
        F.regexp_count(F.col(text_col), F.lit(r"[.!?]+")), F.lit(1)
    )
    syllables = F.regexp_count(F.lower(F.col(text_col)), F.lit("[aeiouy]+"))
    scored = df.select(
        F.col(lang_col).alias("lang"),
        words.cast("long").alias("w"),
        sentences.cast("long").alias("s"),
        syllables.cast("long").alias("y"),
    ).where(F.col("w") > 0)
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * (F.col("w").cast("double") / F.col("s").cast("double"))
        - F.lit(84.6) * (F.col("y").cast("double") / F.col("w").cast("double"))
    )
    per_doc = scored.select(
        "lang",
        F.floor(flesch * 10000).cast("long").alias("f_fp"),
        flesch.alias("f"),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.floor(
                F.sum("f_fp").cast("double") / (F.count(F.lit(1)) * 10000).cast("double") * 10000
            )
            .cast("long")
            .alias("avg_flesch_sc"),
            F.sum((F.col("f") >= EASY_MIN).cast("long")).alias("n_easy"),
            F.sum(
                ((F.col("f") > HARD_MAX) & (F.col("f") < EASY_MIN)).cast("long")
            ).alias("n_standard"),
            F.sum((F.col("f") <= HARD_MAX).cast("long")).alias("n_hard"),
        )
        .orderBy("lang")
    )


def flesch_oracle_sql(table: str = "documents") -> str:
    """DuckDB twin of :func:`flesch_by_lang` — same regexes (RE2 and
    Java agree on these character-class patterns), same literal
    constants, same fixed tree."""
    return f"""
    WITH c AS (
      SELECT lang,
             CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS w,
             CAST(GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT) AS s,
             CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS y
      FROM {table}
    ), f AS (
      SELECT lang,
             206.835 - 1.015 * (CAST(w AS DOUBLE) / CAST(s AS DOUBLE))
                     - 84.6 * (CAST(y AS DOUBLE) / CAST(w AS DOUBLE)) AS fl
      FROM c WHERE w > 0
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(FLOOR(CAST(SUM(CAST(FLOOR(fl * 10000) AS BIGINT)) AS DOUBLE)
                      / CAST(COUNT(*) * 10000 AS DOUBLE) * 10000) AS BIGINT) AS avg_flesch_sc,
           CAST(SUM(CASE WHEN fl >= 70.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_easy,
           CAST(SUM(CASE WHEN fl > 50.0 AND fl < 70.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_standard,
           CAST(SUM(CASE WHEN fl <= 50.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_hard
    FROM f GROUP BY lang ORDER BY lang
    """
