"""Document chunking for LLM training — extension operator next to
pack_sequences (operators/sampling.py).

Where sequence packing lays whole documents end-to-end into fixed
context windows, chunking goes the other way: split each document into
(optionally overlapping) token-window chunks so long documents fit the
trainer's context. The whole transform is array expressions inside
whole-stage codegen — ``sequence`` for the chunk starts, ``posexplode``
for the fan-out, ``slice`` for the window — no UDF, no shuffle: a
chunked corpus is produced in the same scan that read it.

Scale: output fan-out is ``ceil(n_tokens / stride)`` rows per doc —
the explode happens after the scan, so input parquet is read once and
executors stream chunks out; nothing is ever materialized per-doc
beyond its own token array (bounded by the corpus's max doc length,
the same bound every tokenizer stage already lives with).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pasta_pipeline_spark.functions.text import tokenize_ws


def chunk_documents(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    chunk_size: int,
    stride: int | None = None,
    lowercase: bool = False,
) -> DataFrame:
    """Explode each document into whitespace-token chunks of
    ``chunk_size`` tokens, starting every ``stride`` tokens (defaults
    to no overlap: ``stride = chunk_size``).

    Chunk starts are generated while ``start <= n_tokens``, so the
    final chunk may be shorter than ``chunk_size``; documents with zero
    tokens produce no chunks. Output: one row per chunk with
    ``chunk_idx`` (0-based), ``start_token`` (1-based), ``n_tokens``,
    and ``chunk_text`` (tokens re-joined with single spaces —
    chunk-level token identity, not byte identity, is the contract).
    """
    if stride is None:
        stride = chunk_size
    if chunk_size <= 0 or stride <= 0:
        raise ValueError("chunk_size and stride must be positive")

    toks: Column = tokenize_ws(F.col(text_col), lowercase=lowercase)
    base = (
        docs.withColumn("__toks", toks)
        .withColumn("__n", F.size("__toks"))
        .filter(F.col("__n") > 0)
    )
    starts = F.sequence(F.lit(1), F.col("__n"), F.lit(stride))
    exploded = base.select(
        F.col(id_col),
        F.col("__toks"),
        F.posexplode(starts).alias("chunk_idx", "start_token"),
    )
    chunk = F.slice(F.col("__toks"), F.col("start_token"), chunk_size)
    return exploded.select(
        F.col(id_col),
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("start_token").cast("long").alias("start_token"),
        F.size(chunk).cast("long").alias("n_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


def packing_waste_report(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    target_len: int = 512,
) -> DataFrame:
    """Context-window padding-waste accounting (r8): if each document
    is split into ceil(n_tok / target) fixed-length training sequences
    (the no-packing baseline), how many pad tokens does each source
    cost? The number that justifies sequence packing — compare with
    ``greedy_pack``'s efficiency to quantify the win.

    Pure integer arithmetic: chunks = (n_tok + target - 1) div target,
    pad = chunks·target − n_tok; zero-token docs are excluded (fail
    closed). One expression scan + one groupBy(source).

    Returns per source: n_docs, n_tokens, n_chunks, pad_tokens,
    waste_share_sc (pad / (chunks·target), floored 1e-6).
    """
    n_tok = F.size(tokenize_ws(F.col(text_col))).cast("long")
    per_doc = df.select(
        F.col(source_col).alias("source"), n_tok.alias("n_tok")
    ).where(F.col("n_tok") > 0)
    per_doc = per_doc.withColumn(
        "n_chunks", F.expr(f"(n_tok + {target_len} - 1) div {target_len}")
    ).withColumn("pad", F.col("n_chunks") * target_len - F.col("n_tok"))
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
            F.sum("n_chunks").alias("n_chunks"),
            F.sum("pad").alias("pad_tokens"),
        )
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "n_chunks",
            "pad_tokens",
            F.floor(
                F.col("pad_tokens").cast("double")
                / (F.col("n_chunks") * target_len).cast("double")
                * 1000000
            )
            .cast("long")
            .alias("waste_share_sc"),
        )
        .orderBy("source")
    )


def packing_waste_oracle_sql(table: str = "documents", target_len: int = 512) -> str:
    """DuckDB twin of :func:`packing_waste_report`."""
    return f"""
    WITH per_doc AS (
      SELECT source,
             CAST(len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                  y -> y <> '')) AS BIGINT) AS n_tok
      FROM {table}
    ), d AS (
      SELECT source, n_tok,
             (n_tok + {target_len} - 1) // {target_len} AS n_chunks
      FROM per_doc WHERE n_tok > 0
    )
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           CAST(SUM(n_chunks) AS BIGINT) AS n_chunks,
           CAST(SUM(n_chunks * {target_len} - n_tok) AS BIGINT) AS pad_tokens,
           CAST(FLOOR(CAST(SUM(n_chunks * {target_len} - n_tok) AS DOUBLE)
             / CAST(SUM(n_chunks) * {target_len} AS DOUBLE) * 1000000) AS BIGINT)
             AS waste_share_sc
    FROM d GROUP BY source ORDER BY source
    """
