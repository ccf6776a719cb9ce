"""End-to-end training-data preparation plan — the LLM-pipeline
composite (SURVEY.md §2.12 capstone).

Where ``plans/pipeline.py`` restates the reference's ETL DAG, this is
the engine's OWN flagship dataflow: raw corpus in, training-ready
corpus out, every stage an operator that is individually
oracle-checked elsewhere in the catalog:

    1. quality gate      — length + repetition thresholds
                           (text_analysis.repetition_metrics)
    2. exact dedup       — keep lowest doc_id per content md5
                           (the W2 keep-first policy, dedup ladder tier 0)
    3. decontamination   — drop docs sharing any 5-gram with the
                           benchmark set (text_analysis.contamination_check)
    4. temperature mix   — √n per-source quotas, md5-rank selection
                           (sampling.temperature_sample)

The composite stays one lazy DataFrame — Catalyst sees the whole
plan, so the quality filter prunes rows before the dedup shuffle, and
nothing materializes between stages. Every stage's arithmetic is
cross-engine exact, so the ENTIRE pipeline carries a single DuckDB
oracle (queries/catalog.py::training_corpus) — end-to-end correctness,
not just per-stage.

Scale shape: stage shuffles are (doc,gram) + (doc) for repetition,
(md5) for dedup, (gram) for contamination, (source window) for the
mix — all key-partitioned, no collects, no cross joins; the benchmark
gram side is broadcast-size by definition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pasta_pipeline_spark.functions.text import word_count
from pasta_pipeline_spark.operators.sampling import temperature_sample
from pasta_pipeline_spark.operators.text_analysis import (
    contamination_check,
    repetition_metrics,
)


def prepare_training_corpus(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    min_words: int = 20,
    max_dup2_frac_fp: int = 6000,
    target_total: int = 150,
) -> DataFrame:
    """Quality-gate, dedup, decontaminate, and temperature-mix ``docs``
    into a training corpus of ~``target_total`` documents.

    Returns (id, source, n_words) — deterministic: same inputs give
    the identical corpus on any engine, partitioning, or run.
    """
    # 1. quality gate: enough words, not repetition-dominated
    sized = docs.withColumn("n_words", word_count(F.col(text_col)).cast("long"))
    rep = repetition_metrics(docs, id_col=id_col, text_col=text_col).select(
        id_col, "dup2_frac_fp"
    )
    quality = (
        sized.join(rep, id_col, "left")
        .filter(
            (F.col("n_words") >= min_words)
            & (F.coalesce(F.col("dup2_frac_fp"), F.lit(0)) <= max_dup2_frac_fp)
        )
    )

    # 2. exact dedup: keep-first (lowest id) per content hash — W2 policy
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(F.col(id_col))
    deduped = (
        quality.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )

    # 3. decontamination: no 5-gram overlap with the benchmark set
    contam = contamination_check(
        deduped, benchmark, id_col=id_col, text_col=text_col, n=5
    ).select(id_col, "n_contaminated")
    clean = (
        deduped.join(contam, id_col, "left")
        .filter(F.coalesce(F.col("n_contaminated"), F.lit(0)) == 0)
    )

    # 4. temperature mixing to the target size
    mixed = temperature_sample(
        clean.select(id_col, source_col, "n_words"),
        id_col=id_col,
        source_col=source_col,
        target_total=target_total,
    )
    return mixed.select(id_col, source_col, "n_words")
