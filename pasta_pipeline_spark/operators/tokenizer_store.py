"""Tokenizer-artifact persistence (r9 verdict ask #5).

A real pipeline trains a tokenizer ONCE and applies it for months; the
learned state must survive the training session. ``apply_bpe`` /
``apply_unigram`` replay from in-process objects, so these helpers
round-trip that state through :class:`~pasta_pipeline_spark.sources.
tables.TableStore` — the same persistence boundary the ANN tier uses
for its PQ codebooks (``similarity.write_ivfpq_index`` /
``incremental_pq_codes_sink`` precedent). Contract, pytest-pinned in
``tests/test_tokenizer_store.py``:

    save → load → apply  ==  in-session apply   (bit-identical)

State shapes:

- BPE: the merge sequence ``[(rank, left, right), ...]`` — bounded
  driver metadata by design (a vocabulary is 10k-100k rows even for
  production tokenizers), stored as a (rank, left, right) table. The
  load collects it back: a k-row collect, the same scale class as the
  trainers' per-round merge elections.
- Unigram-LM: the costed piece table (piece, piece_len, cnt, cost_fp)
  exactly as :func:`~pasta_pipeline_spark.operators.unigram_lm.
  unigram_train` returns it — stays a DataFrame end to end;
  ``apply_unigram`` broadcasts it into the Viterbi join, so the load
  path never touches the driver.

Versioning rides TableStore: every retrain is a new snapshot, the
predecessor stays time-travel-readable, and a serving job pins the
version it was validated against (reference upsert-pipeline semantics,
db_loader.py:166-181, re-expressed on the lake).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pasta_pipeline_spark.sources.tables import TableStore

BPE_MERGES_SCHEMA = "rank long, left string, right string"


def save_bpe_merges(
    spark: SparkSession, path: str, merges: list[tuple[int, str, str]]
) -> None:
    """Persist a learned BPE merge sequence (``learn_bpe_merges``
    output) as a versioned table; rank is the application order."""
    df = spark.createDataFrame(
        [(int(r), l, rt) for r, l, rt in merges], BPE_MERGES_SCHEMA
    )
    TableStore(spark, path).overwrite(df)


def load_bpe_merges(spark: SparkSession, path: str) -> list[tuple[int, str, str]]:
    """Read a stored merge sequence back into ``apply_bpe`` form, in
    rank order. k-row collect (vocabulary-scale driver metadata)."""
    rows = TableStore(spark, path).read().orderBy("rank").collect()
    return [(r["rank"], r["left"], r["right"]) for r in rows]


def save_unigram_vocab(spark: SparkSession, path: str, vocab: DataFrame) -> None:
    """Persist a trained unigram-LM piece table (``unigram_train``
    output: piece, piece_len, cnt, cost_fp)."""
    TableStore(spark, path).overwrite(
        vocab.select("piece", "piece_len", "cnt", "cost_fp")
    )


def load_unigram_vocab(spark: SparkSession, path: str) -> DataFrame:
    """Read a stored piece table for ``apply_unigram`` — returns the
    (piece, cost_fp) projection the Viterbi join broadcasts; never
    collects."""
    return TableStore(spark, path).read().select("piece", "cost_fp")


def load_unigram_vocab_full(spark: SparkSession, path: str) -> DataFrame:
    """The full stored piece table (piece, piece_len, cnt, cost_fp) —
    for audits/fertility reports that need counts, not just costs."""
    return TableStore(spark, path).read().select(
        "piece", "piece_len", "cnt", "cost_fp"
    )
