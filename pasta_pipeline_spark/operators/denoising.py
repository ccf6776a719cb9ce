"""Span-corruption example generation (the T5/UL2 denoising objective).

Turns documents into (input, target) training pairs: ~``noise_pct``% of
token positions are masked, adjacent masked positions merge into SPANS,
each span is replaced in the input by a sentinel token
``<extra_id_k>`` and reproduced in the target after the same sentinel —
exactly the corrupted-span objective of Raffel et al. (T5, JMLR 2020,
§3.1.4; arXiv 1910.10683).

Mask selection is a pure function of (doc_id, position) via md5 — the
same deterministic-uniform idiom as ``operators/sampling.py`` — so the
corpus can be regenerated bit-identically on any cluster layout, and
the DuckDB twin replays the exact same choices.

Scale posture: posexplode is map-side; every window and the final
reassembly group are partitioned by doc_id (well-distributed — millions
of small groups, never a hot task); the span bookkeeping is
gaps-and-islands arithmetic (pos − rank), no self-join. Three doc_id
shuffles total, each reusing the same hash partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def span_corruption_examples(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    noise_pct: int = 15,
) -> DataFrame:
    """Build denoising examples.

    Returns (doc_id, n_tokens, n_masked, n_spans, input_text,
    target_text); documents with no tokens are dropped, documents with
    no masked position keep an empty target.
    """
    toks = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(
                F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
            ).alias("pos", "tok"),
        )
    )
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("doc_id").cast("string"),
                    F.lit(":"),
                    F.col("pos").cast("string"),
                ).cast("binary")
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    flagged = toks.withColumn("masked", (h % 100) < noise_pct)

    masked = flagged.where("masked")
    w_rank = Window.partitionBy("doc_id").orderBy("pos")
    spans = masked.withColumn(
        "grp", F.col("pos") - F.row_number().over(w_rank)
    ).withColumn("span_k", F.dense_rank().over(Window.partitionBy("doc_id").orderBy("grp")))

    # input = unmasked tokens + one sentinel at each span's start position
    keep = flagged.where(~F.col("masked")).select("doc_id", "pos", "tok")
    span_heads = (
        spans.groupBy("doc_id", "span_k")
        .agg(F.min("pos").alias("pos"))
        .select("doc_id", "pos", F.concat(F.lit("<extra_id_"), (F.col("span_k") - 1).cast("string"), F.lit(">")).alias("tok"))
    )
    input_parts = keep.unionByName(span_heads)
    inputs = input_parts.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("input_text")
    )

    # target = per span: sentinel + its tokens, spans concatenated in order
    span_texts = (
        spans.groupBy("doc_id", "span_k")
        .agg(
            F.concat(
                F.lit("<extra_id_"),
                (F.col("span_k") - 1).cast("string"),
                F.lit("> "),
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                        lambda s: s["tok"],
                    ),
                    " ",
                ),
            ).alias("span_text"),
            F.count(F.lit(1)).alias("span_len"),
        )
    )
    targets = span_texts.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("span_k", "span_text"))),
                lambda s: s["span_text"],
            ),
            " ",
        ).alias("target_text"),
        F.sum("span_len").alias("n_masked"),
        F.max("span_k").cast("long").alias("n_spans"),
    )

    totals = flagged.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_tokens"))
    return (
        totals.join(inputs, "doc_id")
        .join(targets, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce(F.col("n_masked"), F.lit(0)).cast("long").alias("n_masked"),
            F.coalesce(F.col("n_spans"), F.lit(0)).cast("long").alias("n_spans"),
            "input_text",
            F.coalesce(F.col("target_text"), F.lit("")).alias("target_text"),
        )
    )


def span_corruption_oracle_sql(
    table: str = "documents", noise_pct: int = 15
) -> str:
    """DuckDB twin of :func:`span_corruption_examples` — same md5 mask
    choices, same gaps-and-islands span grouping, ordered string_agg
    reassembly."""
    return f"""
    WITH d AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(text, '\\s+'), y -> y <> '') AS tk
      FROM {table}
    ), idx AS (
      SELECT doc_id, tk, unnest(generate_series(1, len(tk))) AS p
      FROM d WHERE len(tk) > 0
    ), toks AS (
      SELECT doc_id, tk[p] AS tok, CAST(p - 1 AS BIGINT) AS pos FROM idx
    ), flagged AS (
      SELECT doc_id, pos, tok,
             (('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || CAST(pos AS VARCHAR)), 1, 15))::BIGINT % 100) < {noise_pct} AS masked
      FROM toks
    ), spans AS (
      SELECT doc_id, pos, tok,
             dense_rank() OVER (PARTITION BY doc_id ORDER BY grp) AS span_k
      FROM (
        SELECT doc_id, pos, tok,
               pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
        FROM flagged WHERE masked
      )
    ), keepers AS (
      SELECT doc_id, pos, tok FROM flagged WHERE NOT masked
      UNION ALL
      SELECT doc_id, MIN(pos) AS pos,
             '<extra_id_' || CAST(span_k - 1 AS VARCHAR) || '>' AS tok
      FROM spans GROUP BY doc_id, span_k
    ), inputs AS (
      SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS input_text
      FROM keepers GROUP BY doc_id
    ), span_texts AS (
      SELECT doc_id, span_k,
             '<extra_id_' || CAST(span_k - 1 AS VARCHAR) || '> '
               || string_agg(tok, ' ' ORDER BY pos) AS span_text,
             COUNT(*) AS span_len
      FROM spans GROUP BY doc_id, span_k
    ), targets AS (
      SELECT doc_id, string_agg(span_text, ' ' ORDER BY span_k) AS target_text,
             CAST(SUM(span_len) AS BIGINT) AS n_masked,
             CAST(MAX(span_k) AS BIGINT) AS n_spans
      FROM span_texts GROUP BY doc_id
    ), totals AS (
      SELECT doc_id, COUNT(*) AS n_tokens FROM flagged GROUP BY doc_id
    )
    SELECT t.doc_id, t.n_tokens,
           COALESCE(g.n_masked, 0) AS n_masked,
           COALESCE(g.n_spans, 0) AS n_spans,
           i.input_text,
           COALESCE(g.target_text, '') AS target_text
    FROM totals t
    JOIN inputs i USING (doc_id)
    LEFT JOIN targets g USING (doc_id)
    """
