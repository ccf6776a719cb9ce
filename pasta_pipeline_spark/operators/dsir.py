"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169): pick raw-corpus documents whose hashed bag-of-ngrams
distribution looks like a TARGET corpus, by the log-likelihood ratio of
two smoothed bag-of-words models over a fixed hashed feature space.

This is the canonical "make CommonCrawl look like Wikipedia" selection
step of an LLM pretraining pipeline, as an operator:

- features: each token hashes into one of ``m`` buckets (portable
  md5-based hash — no engine RNG, no murmur discrepancy), so model
  state is FIXED-SIZE regardless of corpus scale;
- models: add-one-smoothed bucket multinomials fit on the target slice
  (p) and the full raw corpus (q);
- score: ``w(doc) = sum_tokens ln p(b_t) - ln q(b_t)`` — computed in
  fixed-point ln (int64, playbook #7) so sums are order-free and the
  cross-engine contract is hash-exact:

      w_fp = sum_tokens [lnfp(t_cnt+1) - lnfp(q_cnt+1)]
             + n_tokens * (lnfp(Q+m) - lnfp(P+m))

  where ``t_cnt``/``q_cnt`` are the token's bucket counts in the
  target/raw models and ``P``/``Q`` the model token totals. Every term
  is int64; the two 1-row totals ride in as broadcast scalars.

The paper resamples with Gumbel noise; the deterministic engine form
is top-k by weight (ties broken by id), which is the same selection in
the zero-temperature limit and keeps the operator oracle-checkable.
Swap in :func:`~pasta_pipeline_spark.operators.sampling.weighted_sample_topk`
over ``exp(w)`` weights for the stochastic variant.

Scale shape: one token explode feeding three groupBys (per-bucket
models are ``m``-row metadata-scale frames → AQE-broadcast joins back;
per-doc aggregation is the only fact-scale shuffle). The global top-k
is ``orderBy().limit(k)`` = TakeOrderedAndProject (per-partition heap
+ driver merge of k rows) — never an empty-partition window.

No reference analog (`/root/reference/dags/` has no selection stage);
pure public literature.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pasta_pipeline_spark.functions.text import tokenize_ws

#: Fixed-point ln scale (playbook: FLOOR(ln(x)*1e9) is bit-identical
#: across JVM and DuckDB because ln is correctly rounded on both).
LN_SCALE = 1_000_000_000

#: Default hashed-feature dimensionality (the paper uses 10k buckets;
#: any fixed m keeps model state constant-size at 100 TB).
N_BUCKETS = 4096


def _lnfp(col: Column) -> Column:
    return F.floor(F.log(col.cast("double")) * LN_SCALE).cast("long")


def hash_bucket(token: Column, m: int = N_BUCKETS) -> Column:
    """md5-based token→bucket hash, exactly replayable in SQL as
    ``('0x' || substr(md5(token), 1, 15))::BIGINT % m`` (60 bits —
    always positive, so ``%`` agrees across engines)."""
    h = F.conv(F.substring(F.md5(token.cast("binary")), 1, 15), 16, 10)
    return (h.cast("long") % m).cast("long")


def dsir_weights(
    docs: DataFrame,
    target_pred: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    m: int = N_BUCKETS,
) -> DataFrame:
    """Per-document DSIR importance weight (fixed-point int64
    ``weight_fp``; higher = more target-like). ``target_pred`` marks
    the target slice rows (e.g. ``F.col("source").isin(...)`` — the
    curated corpus whose distribution the selection should match).

    Returns ``(id_col, n_tokens, weight_fp)`` for every document with
    at least one token. Documents of tokens the target never produces
    still score finitely (add-one smoothing)."""
    tok = (
        docs.where(F.col(text_col).isNotNull())
        .select(
            F.col(id_col),
            target_pred.alias("__is_target"),
            F.explode(tokenize_ws(F.col(text_col))).alias("token"),
        )
        .withColumn("b", hash_bucket(F.col("token"), m))
    )
    # Per-(doc, bucket) sufficient statistics: the joins back to the
    # two m-row models then touch each doc's DISTINCT buckets once.
    doc_b = tok.groupBy(id_col, "b").agg(F.count(F.lit(1)).cast("long").alias("k"))
    raw = tok.groupBy("b").agg(F.count(F.lit(1)).cast("long").alias("q_cnt"))
    tgt = (
        tok.where(F.col("__is_target"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).cast("long").alias("t_cnt"))
    )
    models = raw.join(tgt, "b", "left").na.fill({"t_cnt": 0})
    totals = models.agg(
        F.sum("q_cnt").cast("long").alias("Q"),
        F.sum("t_cnt").cast("long").alias("P"),
    )
    per_doc = (
        doc_b.join(F.broadcast(models), "b")
        .groupBy(id_col)
        .agg(
            F.sum("k").cast("long").alias("n_tokens"),
            F.sum(
                F.col("k") * (_lnfp(F.col("t_cnt") + 1) - _lnfp(F.col("q_cnt") + 1))
            )
            .cast("long")
            .alias("__s"),
        )
    )
    return per_doc.crossJoin(F.broadcast(totals)).select(
        F.col(id_col),
        "n_tokens",
        (
            F.col("__s")
            + F.col("n_tokens")
            * (_lnfp(F.col("Q") + F.lit(m)) - _lnfp(F.col("P") + F.lit(m)))
        )
        .cast("long")
        .alias("weight_fp"),
    )


def dsir_select(
    docs: DataFrame,
    target_pred: Column,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    m: int = N_BUCKETS,
) -> DataFrame:
    """Top-``k`` most-target-like documents by DSIR weight
    (deterministic: weight desc, id asc), ranked. The scalable global
    top-k idiom (TakeOrderedAndProject); the ≤k survivors then pass
    through a benign single-partition rank to materialize ``rk``."""
    from pyspark.sql import Window

    weighted = dsir_weights(docs, target_pred, id_col, text_col, m)
    order = [F.desc("weight_fp"), F.asc(id_col)]
    top = weighted.orderBy(*order).limit(k)
    w = Window.orderBy(*order)  # over <= k rows — benign
    return top.withColumn("rk", F.row_number().over(w).cast("long"))


def dsir_oracle_sql(
    target_where: str,
    k: int,
    m: int = N_BUCKETS,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`dsir_select` — generated from the same
    constants so the two engines share one recipe (playbook #11).

    ``target_where`` is spliced verbatim as a SQL boolean EXPRESSION
    (the Spark side takes the matching Column predicate) — it is code
    by contract, not data; never pass untrusted strings here.  String
    LITERALS inside it must be SQL-escaped by the caller
    (:func:`pasta_pipeline_spark.operators.search.sql_quote`)."""
    lnfp = f"CAST(FLOOR(ln(CAST({{x}} AS DOUBLE)) * {LN_SCALE}) AS BIGINT)"
    return f"""
    WITH tok AS (
      SELECT {id_col}, ({target_where}) AS is_target,
             ('0x' || substr(md5(unnest(list_transform(list_filter(
                regexp_split_to_array({text_col}, '\\s+'), x -> x <> ''),
                x -> lower(x)))), 1, 15))::BIGINT
               % {m} AS b
      FROM {table} WHERE {text_col} IS NOT NULL
    ), doc_b AS (
      SELECT {id_col}, b, CAST(count(*) AS BIGINT) AS k FROM tok GROUP BY 1, 2
    ), raw AS (
      SELECT b, CAST(count(*) AS BIGINT) AS q_cnt FROM tok GROUP BY b
    ), tgt AS (
      SELECT b, CAST(count(*) AS BIGINT) AS t_cnt FROM tok WHERE is_target GROUP BY b
    ), models AS (
      SELECT raw.b, raw.q_cnt, COALESCE(tgt.t_cnt, 0) AS t_cnt
      FROM raw LEFT JOIN tgt USING (b)
    ), tot AS (
      SELECT CAST(SUM(q_cnt) AS BIGINT) AS Q, CAST(SUM(t_cnt) AS BIGINT) AS P
      FROM models
    ), pd AS (
      SELECT d.{id_col}, CAST(SUM(d.k) AS BIGINT) AS n_tokens,
             CAST(SUM(d.k * ({lnfp.format(x='mo.t_cnt + 1')}
                             - {lnfp.format(x='mo.q_cnt + 1')})) AS BIGINT) AS s
      FROM doc_b d JOIN models mo USING (b) GROUP BY d.{id_col}
    ), wt AS (
      SELECT {id_col}, n_tokens,
             CAST(s + n_tokens * ({lnfp.format(x=f'Q + {m}')}
                                  - {lnfp.format(x=f'P + {m}')}) AS BIGINT) AS weight_fp
      FROM pd CROSS JOIN tot
    )
    SELECT {id_col}, n_tokens, weight_fp,
           CAST(row_number() OVER (ORDER BY weight_fp DESC, {id_col} ASC) AS BIGINT) AS rk
    FROM wt
    ORDER BY weight_fp DESC, {id_col} ASC
    LIMIT {k}
    """
