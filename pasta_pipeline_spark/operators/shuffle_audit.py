"""Training-epoch shuffle-quality audit.

A training run reads the corpus in a deterministic pseudo-random
order per epoch (md5(epoch:id) — the same order any worker can
reproduce, no materialized permutation). The QUALITY of that shuffle
matters: long same-source runs in the stream mean correlated
gradients and source-level curriculum artifacts. This audit measures
it: per source, the run-length distribution of consecutive
same-source documents in shuffled order, against the expected mean
run length 1/(1 - p_s) under ideal Bernoulli mixing.

Scale shape — the reason this module exists: both ranks come from the
range-partition + driver-prefix-sum machinery (``operators/ids.py``),
NOT from empty-OVER or hot-partition windows. The global position
uses ``assign_sequential_ids`` over the md5 key; the per-source
position uses ``assign_grouped_sequential_ids`` (a dominant source
spans many range partitions instead of pinning one task). Islands are
then the classic gaps-and-islands difference gseq − sseq, and
everything after is a groupBy over run keys. The only windows are
over the bounded per-source frame.

Determinism: md5-derived order (engine-parity established by
``sample_bucket``), unique tiebreak by id, exact integer run lengths;
the two reported ratios are floored double trees over int64 counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def epoch_shuffle_runs(
    df: DataFrame,
    id_col: str = "doc_id",
    group_col: str = "source",
    epoch: int = 1,
) -> DataFrame:
    """Per-source run-length audit of the epoch-``epoch`` shuffle
    order. Returns one row per source, ordered: source, n_rows,
    n_runs, max_run, mean_run_sc (n_rows/n_runs), expected_run_sc
    (N/(N − n_rows) — ideal mixing), excess_sc (mean/expected; > 1e6
    means the shuffle clumps this source).
    """
    from pasta_pipeline_spark.operators.ids import (
        assign_grouped_sequential_ids,
        assign_sequential_ids,
    )

    keyed = df.select(
        F.col(id_col).alias("__id"),
        F.col(group_col).alias("__grp"),
        F.md5(
            F.concat(
                F.lit(f"e{epoch}:"), F.col(id_col).cast("string")
            ).cast("binary")
        ).alias("__k"),
    )
    g = assign_sequential_ids(keyed, ["__k", "__id"], out_col="__gseq")
    s = assign_grouped_sequential_ids(
        keyed, ["__grp"], ["__k", "__id"], out_col="__sseq"
    ).select("__id", "__sseq")
    both = g.join(s, "__id")
    runs = (
        both.withColumn("__island", F.col("__gseq") - F.col("__sseq"))
        .groupBy("__grp", "__island")
        .agg(F.count(F.lit(1)).alias("run_len"))
    )
    per_source = runs.groupBy(F.col("__grp").alias("source")).agg(
        F.sum("run_len").alias("n_rows"),
        F.count(F.lit(1)).alias("n_runs"),
        F.max("run_len").alias("max_run"),
    )
    w = Window.partitionBy()  # bounded: |sources| rows
    per_source = per_source.withColumn("__N", F.sum("n_rows").over(w))
    mean_run = F.col("n_rows").cast("double") / F.col("n_runs").cast("double")
    # single-source corpus: expected run length is unbounded -> NULL
    # (ANSI-safe: never divide by N - n_rows = 0)
    expected = F.when(
        F.col("__N") > F.col("n_rows"),
        F.col("__N").cast("double")
        / (F.col("__N") - F.col("n_rows")).cast("double"),
    )
    return per_source.select(
        "source",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_runs").cast("long").alias("n_runs"),
        F.col("max_run").cast("long").alias("max_run"),
        F.floor(mean_run * 1000000).cast("long").alias("mean_run_sc"),
        F.floor(expected * 1000000).cast("long").alias("expected_run_sc"),
        F.floor(mean_run / expected * 1000000)
        .cast("long")
        .alias("excess_sc"),
    ).orderBy("source")


def epoch_shuffle_oracle_sql(
    table: str = "documents", epoch: int = 1
) -> str:
    """DuckDB twin of :func:`epoch_shuffle_runs`."""
    return f"""
    WITH base AS (
      SELECT doc_id, source,
             md5('e{epoch}:' || CAST(doc_id AS VARCHAR)) AS k
      FROM {table}
    ), seqd AS (
      SELECT source,
             ROW_NUMBER() OVER (ORDER BY k, doc_id) AS gseq,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY k, doc_id)
               AS sseq
      FROM base
    ), runs AS (
      SELECT source, gseq - sseq AS island, COUNT(*) AS run_len
      FROM seqd GROUP BY 1, 2
    ), per_source AS (
      SELECT source, CAST(SUM(run_len) AS BIGINT) AS n_rows,
             CAST(COUNT(*) AS BIGINT) AS n_runs,
             CAST(MAX(run_len) AS BIGINT) AS max_run
      FROM runs GROUP BY 1
    )
    SELECT source, n_rows, n_runs, max_run,
      CAST(FLOOR(CAST(n_rows AS DOUBLE) / CAST(n_runs AS DOUBLE)
        * 1000000) AS BIGINT) AS mean_run_sc,
      CASE WHEN SUM(n_rows) OVER () > n_rows THEN
        CAST(FLOOR(CAST(SUM(n_rows) OVER () AS DOUBLE)
          / CAST(SUM(n_rows) OVER () - n_rows AS DOUBLE) * 1000000)
          AS BIGINT) END AS expected_run_sc,
      CASE WHEN SUM(n_rows) OVER () > n_rows THEN
        CAST(FLOOR((CAST(n_rows AS DOUBLE) / CAST(n_runs AS DOUBLE))
          / (CAST(SUM(n_rows) OVER () AS DOUBLE)
             / CAST(SUM(n_rows) OVER () - n_rows AS DOUBLE)) * 1000000)
          AS BIGINT) END AS excess_sc
    FROM per_source ORDER BY source
    """
