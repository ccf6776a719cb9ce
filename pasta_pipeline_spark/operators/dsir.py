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


def _feature_array(text: Column, features: str) -> Column:
    """Token-level feature stream: ``"unigram"`` = the tokens
    themselves; ``"bigram"`` = space-joined consecutive token pairs
    (the hashed n-gram space the DSIR paper actually uses —
    word-order-sensitive, so "bank of england" and "england of bank"
    stop colliding). Documents with fewer than 2 tokens contribute no
    bigram features (empty array, matching the oracle's len guard —
    never a descending Spark sequence, playbook #14)."""
    toks = tokenize_ws(text)
    if features == "unigram":
        return toks
    if features == "bigram":
        return F.when(
            F.size(toks) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - 1),
                lambda i: F.concat_ws(" ", F.element_at(toks, i),
                                      F.element_at(toks, i + 1)),
            ),
        ).otherwise(F.array().cast("array<string>"))
    raise ValueError(f"unknown DSIR feature space: {features!r}")


def dsir_weights(
    docs: DataFrame,
    target_pred: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    m: int = N_BUCKETS,
    features: str = "unigram",
) -> DataFrame:
    """Per-document DSIR importance weight (fixed-point int64
    ``weight_fp``; higher = more target-like). ``target_pred`` marks
    the target slice rows (e.g. ``F.col("source").isin(...)`` — the
    curated corpus whose distribution the selection should match).

    ``features`` picks the hashed feature space: ``"unigram"`` or the
    paper-faithful ``"bigram"`` (Xie et al. §2.1 hash bigrams into
    10k buckets; same fixed-size-state property, order-sensitive).

    Returns ``(id_col, n_tokens, weight_fp)`` for every document with
    at least one feature. Documents of tokens the target never
    produces still score finitely (add-one smoothing)."""
    tok = (
        docs.where(F.col(text_col).isNotNull())
        .select(
            F.col(id_col),
            target_pred.alias("__is_target"),
            F.explode(_feature_array(F.col(text_col), features)).alias("token"),
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
    features: str = "unigram",
) -> DataFrame:
    """Top-``k`` most-target-like documents by DSIR weight
    (deterministic: weight desc, id asc), ranked. The scalable global
    top-k idiom (TakeOrderedAndProject); the ≤k survivors then pass
    through a benign single-partition rank to materialize ``rk``."""
    from pyspark.sql import Window

    weighted = dsir_weights(docs, target_pred, id_col, text_col, m, features)
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
    features: str = "unigram",
) -> str:
    """DuckDB twin of :func:`dsir_select` — generated from the same
    constants so the two engines share one recipe (playbook #11).

    ``target_where`` is spliced verbatim as a SQL boolean EXPRESSION
    (the Spark side takes the matching Column predicate) — it is code
    by contract, not data; never pass untrusted strings here.  String
    LITERALS inside it must be SQL-escaped by the caller
    (:func:`pasta_pipeline_spark.operators.search.sql_quote`)."""
    lnfp = f"CAST(FLOOR(ln(CAST({{x}} AS DOUBLE)) * {LN_SCALE}) AS BIGINT)"
    if features == "unigram":
        tok_cte = f"""tok AS (
      SELECT {id_col}, ({target_where}) AS is_target,
             ('0x' || substr(md5(unnest(list_transform(list_filter(
                regexp_split_to_array({text_col}, '\\s+'), x -> x <> ''),
                x -> lower(x)))), 1, 15))::BIGINT
               % {m} AS b
      FROM {table} WHERE {text_col} IS NOT NULL
    )"""
    elif features == "bigram":
        tok_cte = f"""toks AS (
      SELECT {id_col}, ({target_where}) AS is_target,
             list_transform(list_filter(
               regexp_split_to_array({text_col}, '\\s+'), x -> x <> ''),
               x -> lower(x)) AS t
      FROM {table} WHERE {text_col} IS NOT NULL
    ), posed AS (
      SELECT {id_col}, is_target, t,
             unnest(generate_series(1, len(t) - 1)) AS i
      FROM toks WHERE len(t) >= 2
    ), tok AS (
      SELECT {id_col}, is_target,
             ('0x' || substr(md5(t[i] || ' ' || t[i + 1]), 1, 15))::BIGINT
               % {m} AS b
      FROM posed
    )"""
    else:
        raise ValueError(f"unknown DSIR feature space: {features!r}")
    return f"""
    WITH {tok_cte}, doc_b AS (
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


def nb_source_confusion(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "source",
    m: int = N_BUCKETS,
) -> DataFrame:
    """Source-separability audit: fit one add-one-smoothed hashed-bow
    multinomial PER SOURCE (the multi-class generalization of the DSIR
    importance models), classify every document by maximum
    log-likelihood, and report the confusion matrix
    ``(true_label, predicted_label, n_docs)``.

    What it measures: how predictable a document's source is from its
    token distribution — near-diagonal confusion means the sources are
    distributionally distinct (mixture weights and per-source
    processing decisions are meaningful); heavy off-diagonal mass
    means two sources are near-duplicates of each other at the corpus
    level (merge them, or investigate label noise — the lang-ID
    counterpart is ``lang_confusion_audit``).

    Score arithmetic is the DSIR fixed-point ln: for class c,
    ``score(d, c) = sum_b k_b * lnfp(cnt_c(b) + 1)
    − n_tokens * lnfp(T_c + m)`` (the add-one denominator). A class
    missing a bucket contributes ``lnfp(0 + 1) = 0`` — exactly the
    smoothed numerator — so the bucket join needs no zero-filling.
    Prediction = row_number over (score desc, class asc) per doc; the
    per-doc window partitions on the document id (thousands of 
    S-row partitions — parallel, never a hot task).

    Scale shape: one token explode; per-(class, bucket) models are
    ≤ S·m metadata rows broadcast back; the only fact-scale shuffles
    are the per-(doc, bucket) and per-(doc, class) aggregations.
    Self-fit caveat (documented, inherent): each document contributed
    to its own class's model, which inflates the diagonal on tiny
    corpora; at corpus scale one document's mass is negligible.
    """
    from pyspark.sql import Window

    tok = (
        docs.where(F.col(text_col).isNotNull())
        .select(
            F.col(id_col),
            F.col(label_col).alias("c_true"),
            F.explode(tokenize_ws(F.col(text_col))).alias("token"),
        )
        .withColumn("b", hash_bucket(F.col("token"), m))
    )
    doc_b = tok.groupBy(id_col, "c_true", "b").agg(
        F.count(F.lit(1)).cast("long").alias("k")
    )
    cls = tok.groupBy(F.col("c_true").alias("c"), "b").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    totals = cls.groupBy("c").agg(F.sum("cnt").cast("long").alias("T"))
    doc_n = doc_b.groupBy(id_col, "c_true").agg(
        F.sum("k").cast("long").alias("n_tokens")
    )
    # per-(doc, class) bucket-likelihood sums; missing (c, b) = 0
    bucket_s = (
        doc_b.join(F.broadcast(cls), "b")
        .groupBy(id_col, "c")
        .agg(F.sum(F.col("k") * _lnfp(F.col("cnt") + 1)).cast("long").alias("s_b"))
    )
    scored = (
        doc_n.crossJoin(F.broadcast(totals))
        .join(bucket_s, [id_col, "c"], "left")
        .select(
            F.col(id_col),
            "c_true",
            "c",
            (
                F.coalesce(F.col("s_b"), F.lit(0))
                - F.col("n_tokens") * _lnfp(F.col("T") + F.lit(m))
            )
            .cast("long")
            .alias("s_fp"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("s_fp"), F.asc("c"))
    pred = (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(id_col, "c_true", F.col("c").alias("c_pred"))
    )
    return pred.groupBy(
        F.col("c_true").alias("true_label"), F.col("c_pred").alias("predicted_label")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_docs"))


def nb_confusion_oracle_sql(
    m: int = N_BUCKETS,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "source",
) -> str:
    """DuckDB twin of :func:`nb_source_confusion` — same hash, same
    fixed-point ln, same tie-break."""
    lnfp = f"CAST(FLOOR(ln(CAST({{x}} AS DOUBLE)) * {LN_SCALE}) AS BIGINT)"
    return f"""
    WITH tok AS (
      SELECT {id_col}, {label_col} AS c_true,
             ('0x' || substr(md5(unnest(list_transform(list_filter(
                regexp_split_to_array({text_col}, '\\s+'), x -> x <> ''),
                x -> lower(x)))), 1, 15))::BIGINT
               % {m} AS b
      FROM {table} WHERE {text_col} IS NOT NULL
    ), doc_b AS (
      SELECT {id_col}, c_true, b, CAST(count(*) AS BIGINT) AS k
      FROM tok GROUP BY 1, 2, 3
    ), cls AS (
      SELECT c_true AS c, b, CAST(count(*) AS BIGINT) AS cnt
      FROM tok GROUP BY 1, 2
    ), tot AS (
      SELECT c, CAST(SUM(cnt) AS BIGINT) AS T FROM cls GROUP BY c
    ), doc_n AS (
      SELECT {id_col}, c_true, CAST(SUM(k) AS BIGINT) AS n_tokens
      FROM doc_b GROUP BY 1, 2
    ), bucket_s AS (
      SELECT d.{id_col}, cl.c,
             CAST(SUM(d.k * {lnfp.format(x='cl.cnt + 1')}) AS BIGINT) AS s_b
      FROM doc_b d JOIN cls cl USING (b) GROUP BY 1, 2
    ), scored AS (
      SELECT n.{id_col}, n.c_true, t.c,
             CAST(COALESCE(s.s_b, 0)
                  - n.n_tokens * {lnfp.format(x=f't.T + {m}')} AS BIGINT) AS s_fp
      FROM doc_n n CROSS JOIN tot t
      LEFT JOIN bucket_s s ON s.{id_col} = n.{id_col} AND s.c = t.c
    ), pred AS (
      SELECT {id_col}, c_true, c AS c_pred FROM (
        SELECT *, row_number() OVER (PARTITION BY {id_col}
                                     ORDER BY s_fp DESC, c ASC) AS rn
        FROM scored
      ) WHERE rn = 1
    )
    SELECT c_true AS true_label, c_pred AS predicted_label,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM pred GROUP BY 1, 2
    """
