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
