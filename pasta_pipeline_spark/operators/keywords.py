"""Keyphrase extraction (RAKE — Rapid Automatic Keyword Extraction).

Rose, Engel, Cramer & Cowley (2010): candidate phrases are maximal
runs of content tokens between stopword/punctuation breaks; each word
scores deg(w)/freq(w) where freq counts occurrences and deg sums the
lengths of the phrases containing it; a phrase scores the sum of its
words' scores. The classic unsupervised keyphrase baseline — the
catalog's TF-IDF tier ranks single TERMS, this ranks multi-word
PHRASES.

Engine-portable by construction: tokenization is whitespace split +
per-token ``[^a-z0-9]`` strip (no locale-dependent word breaking), the
stopword list is a shared literal, phrase grouping is gaps-and-islands
arithmetic (pos − rank), and scores ride the fixed-point bridge
(floor(deg·1e6/freq) per token occurrence, summed as int64).

Scale posture: token explode is map-side; phrase grouping windows are
doc_id-partitioned; the word-stats frame is VOCABULARY-scale and joins
back by word (hash join, broadcastable when small). No corpus-global
window anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: shared literal stopword list (lowercased); the break set also
#: includes tokens that normalize to empty (pure punctuation/digits
#: keep: digits are content here)
RAKE_STOPWORDS = (
    "the a an and or of in on to is are was were for with as by at it "
    "this that be from has have had not but they you we he she its "
    "their our your his her them us i"
).split()


def rake_keyphrases(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 3,
) -> DataFrame:
    """Top-``top_k`` RAKE keyphrases per document.

    Returns (doc_id, rnk, phrase, score_sc) ordered by (doc_id, rnk);
    ``score_sc`` is the int64 sum of per-word floor(deg·1e6/freq).
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != "")
        ).alias("pos", "raw"),
    ).withColumn("word", F.regexp_replace(F.col("raw"), "[^a-z0-9]", ""))
    stop_arr = F.array(*[F.lit(s) for s in RAKE_STOPWORDS])
    content = toks.withColumn(
        "is_break",
        (F.col("word") == "") | F.array_contains(stop_arr, F.col("word")),
    ).where(~F.col("is_break"))
    w_rank = Window.partitionBy("doc_id").orderBy("pos")
    grouped = content.withColumn(
        "grp", F.col("pos") - F.row_number().over(w_rank)
    )
    phrases = grouped.groupBy("doc_id", "grp").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "word"))),
                lambda s: s["word"],
            ),
            " ",
        ).alias("phrase"),
        F.count(F.lit(1)).alias("plen"),
    )
    # corpus-level word statistics: freq = occurrences, deg = sum of
    # containing-phrase lengths (vocabulary-scale frame)
    occ = grouped.join(
        phrases.select("doc_id", "grp", "plen"), ["doc_id", "grp"]
    ).select("doc_id", "grp", "word", "plen")
    word_stats = occ.groupBy("word").agg(
        F.count(F.lit(1)).alias("freq"),
        F.sum("plen").alias("deg"),
    )
    scored_tokens = occ.join(word_stats, "word").withColumn(
        "tok_score", F.floor(F.col("deg") * 1000000 / F.col("freq")).cast("long")
    )
    phrase_scores = scored_tokens.groupBy("doc_id", "grp").agg(
        F.sum("tok_score").alias("score_sc")
    )
    per_phrase = (
        phrases.join(phrase_scores, ["doc_id", "grp"])
        .groupBy("doc_id", "phrase")
        .agg(F.max("score_sc").alias("score_sc"))
    )
    w_top = Window.partitionBy("doc_id").orderBy(
        F.col("score_sc").desc(), F.col("phrase").asc()
    )
    return (
        per_phrase.withColumn("rnk", F.row_number().over(w_top))
        .where(F.col("rnk") <= top_k)
        .select("doc_id", F.col("rnk").cast("long").alias("rnk"), "phrase", "score_sc")
        .orderBy("doc_id", "rnk")
    )


def rake_oracle_sql(table: str = "documents", top_k: int = 3) -> str:
    """DuckDB twin of :func:`rake_keyphrases` — same literal stopwords,
    same islands arithmetic, same fixed-point word scores."""
    stop_list = ", ".join(f"'{s}'" for s in RAKE_STOPWORDS)
    return f"""
    WITH d AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '\\s+'), y -> y <> '') AS tk
      FROM {table}
    ), idx AS (
      SELECT doc_id, tk, unnest(generate_series(1, len(tk))) AS p
      FROM d WHERE len(tk) > 0
    ), toks AS (
      SELECT doc_id, CAST(p - 1 AS BIGINT) AS pos,
             regexp_replace(tk[p], '[^a-z0-9]', '', 'g') AS word
      FROM idx
    ), content AS (
      SELECT doc_id, pos, word,
             pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
      FROM toks
      WHERE word <> '' AND word NOT IN ({stop_list})
    ), phrases AS (
      SELECT doc_id, grp,
             string_agg(word, ' ' ORDER BY pos) AS phrase,
             COUNT(*) AS plen
      FROM content GROUP BY doc_id, grp
    ), occ AS (
      SELECT c.doc_id, c.grp, c.word, p.plen
      FROM content c JOIN phrases p USING (doc_id, grp)
    ), word_stats AS (
      SELECT word, COUNT(*) AS freq, CAST(SUM(plen) AS BIGINT) AS deg
      FROM occ GROUP BY word
    ), phrase_scores AS (
      SELECT o.doc_id, o.grp,
             CAST(SUM(CAST(FLOOR(w.deg * 1000000 / w.freq) AS BIGINT)) AS BIGINT) AS score_sc
      FROM occ o JOIN word_stats w USING (word)
      GROUP BY o.doc_id, o.grp
    ), per_phrase AS (
      SELECT p.doc_id, p.phrase, MAX(s.score_sc) AS score_sc
      FROM phrases p JOIN phrase_scores s USING (doc_id, grp)
      GROUP BY p.doc_id, p.phrase
    )
    SELECT doc_id, CAST(rnk AS BIGINT) AS rnk, phrase, score_sc
    FROM (
      SELECT doc_id, phrase, score_sc,
             row_number() OVER (PARTITION BY doc_id
               ORDER BY score_sc DESC, phrase ASC) AS rnk
      FROM per_phrase
    ) WHERE rnk <= {top_k}
    ORDER BY doc_id, rnk
    """
