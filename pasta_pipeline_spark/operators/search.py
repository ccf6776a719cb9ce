"""Index-accelerated substring search (trigram inverted index).

A full-corpus ``LIKE '%pattern%'`` is a complete scan of every byte at
any scale; the standard index that accelerates it (pg_trgm, Lucene
wildcard) is a character-trigram inverted index: a document can only
contain the pattern if it contains EVERY trigram of the pattern, so
candidates come from intersecting posting lists — a bucket join on the
gram — and only candidates pay the verification ``contains``. Results
are EXACT (verification removes the false positives; trigram coverage
has no false negatives for patterns >= 3 chars).

At 100 TB the index is built once (:func:`trigram_index`, one explode
+ distinct) and persisted partitioned/bucketed BY GRAM, so a search
reads only its pattern's posting lists (partition pruning on gram) —
the scan cost drops from corpus bytes to candidate bytes. Built
inline here for the oracle-checked query; the build/persist split is
the TableStore pattern every other index in this repo uses.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sql_quote(s: str) -> str:
    """Render a caller-supplied string as a single-quoted SQL literal,
    doubling embedded quotes — every oracle generator that splices a
    user term into DuckDB SQL must go through this (a term containing
    ``'`` would otherwise break or inject into the generated query)."""
    return "'" + s.replace("'", "''") + "'"


def char_ngrams(text: Column | str, n: int = 3) -> Column:
    """Distinct character n-grams of a string (array<string>)."""
    c = F.col(text) if isinstance(text, str) else text
    grams = F.transform(
        F.sequence(F.lit(1), F.length(c) - (n - 1)),
        lambda i: F.substring(c, i, n),
    )
    # sequence(1, 0) DESCENDS in Spark (step defaults to -1), so short
    # strings must short-circuit to an empty array explicitly
    return F.when(
        c.isNull() | (F.length(c) < n), F.array().cast("array<string>")
    ).otherwise(F.array_distinct(grams))


def trigram_index(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """(gram, doc) inverted index — persist partitioned by gram at
    scale so searches prune to their posting lists."""
    return docs.select(
        F.col(id_col).alias("doc"),
        F.explode(char_ngrams(F.col(text_col), n)).alias("gram"),
    )


def substring_search(
    docs: DataFrame,
    pattern: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    index: DataFrame | None = None,
) -> DataFrame:
    """Documents whose text contains ``pattern`` (literal), via the
    trigram index + exact verification. Patterns shorter than ``n``
    fall back to the plain scan filter (no trigram to prune on —
    documented contract)."""
    if len(pattern) < n:
        return docs.filter(F.col(text_col).contains(pattern)).select(id_col)
    grams = sorted({pattern[i : i + n] for i in range(len(pattern) - n + 1)})
    idx = index if index is not None else trigram_index(docs, id_col, text_col, n)
    cand = (
        idx.filter(F.col("gram").isin(grams))
        .groupBy("doc")
        .agg(F.count_distinct("gram").alias("__hits"))
        .filter(F.col("__hits") == len(grams))
        .select(F.col("doc").alias(id_col))
    )
    return (
        docs.join(cand, id_col, "left_semi")
        .filter(F.col(text_col).contains(pattern))
        .select(id_col)
    )


# ---------------------------------------------------------------------------
# BM25 ranked retrieval (r6)
# ---------------------------------------------------------------------------

#: Okapi BM25 constants (the Robertson defaults; Lucene ships the same).
BM25_K1 = 1.2
BM25_B = 0.75

#: Fixed-point scale for per-term BM25 contributions: each term's
#: contribution is FLOORed to int64 BEFORE the per-doc sum, so the
#: aggregate is order-free and hash-identical across engines (the
#: playbook rule every fixed-point operator here follows).
BM25_SCALE = 1_000_000

#: One shared per-term formula, rendered into BOTH engines (moments.py
#: precedent — two engines, one expression, no drift). All inputs are
#: int64 ({tf}, {df}, {dl}, N docs, T corpus tokens); ln and double
#: ratios of int64s are IEEE-identical in the JVM and DuckDB. The idf
#: is Lucene's non-negative variant: ln(1 + (N - df + 0.5)/(df + 0.5)).
_BM25_TERM = (
    "FLOOR("
    "ln(1.0 + (CAST({N} AS DOUBLE) - CAST({df} AS DOUBLE) + 0.5)"
    " / (CAST({df} AS DOUBLE) + 0.5))"
    " * (CAST({tf} AS DOUBLE) * ({k1} + 1.0))"
    " / (CAST({tf} AS DOUBLE) + {k1} * (1.0 - {b}"
    "    + {b} * CAST({dl} AS DOUBLE) * CAST({N} AS DOUBLE) / CAST({T} AS DOUBLE)))"
    " * {scale})"
)


def bm25_term_sql(tf="tf", df="df_t", dl="dl", N="N", T="T") -> str:
    return _BM25_TERM.format(
        tf=tf, df=df, dl=dl, N=N, T=T, k1=BM25_K1, b=BM25_B, scale=BM25_SCALE
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Okapi BM25 top-``k`` retrieval for a bag-of-terms query — the
    scoring function behind every production keyword search engine
    (Robertson & Zaragoza 2009, Found. Trends IR 3(4)), as one
    declarative plan:

    - term frequencies from ONE tokenize+explode scan, filtered to the
      query terms at the scan (the only rows that shuffle — a |q|-term
      query moves |q| posting lists, not the corpus);
    - document lengths from the same scan (pre-filter aggregate);
    - document frequencies + corpus totals as metadata-scale frames
      riding in via broadcast;
    - per-term contributions FLOORed to int64 then summed per doc
      (order-free; hash-exact), global top-k via orderBy+limit
      (TakeOrderedAndProject — per-partition heaps, never a
      single-partition window).

    Returns ``(id, score_fp, n_hit_terms)`` for the k best documents
    (score desc, id asc tiebreak). Documents containing no query term
    never appear (no outer join against the corpus).
    """
    from pasta_pipeline_spark.functions.text import tokenize_ws

    terms = [t.lower() for t in query_terms]
    tok = docs.where(F.col(text_col).isNotNull()).select(
        F.col(id_col), F.explode(tokenize_ws(F.col(text_col))).alias("term")
    )
    dl = tok.groupBy(id_col).agg(F.count(F.lit(1)).cast("long").alias("dl"))
    totals = dl.agg(
        F.count(F.lit(1)).cast("long").alias("N"),
        F.sum("dl").cast("long").alias("T"),
    )
    hits = tok.where(F.col("term").isin(terms))
    tf = hits.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df_t"))
    contrib = (
        tf.join(F.broadcast(df_t), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(totals))
        .withColumn("c_fp", F.expr(bm25_term_sql()).cast("long"))
    )
    scored = contrib.groupBy(id_col).agg(
        F.sum("c_fp").cast("long").alias("score_fp"),
        F.count(F.lit(1)).cast("long").alias("n_hit_terms"),
    )
    return scored.orderBy(F.desc("score_fp"), F.asc(id_col)).limit(k)


#: BM25F field layout: the first TITLE_LEN tokens of a document act as
#: its "title" field (the corpus has no separate field columns; a
#: deterministic positional split keeps the operator oracle-able while
#: exercising the real fielded math). Integer field weights keep the
#: weighted tf/length int64 until the shared double formula.
BM25F_TITLE_LEN = 5
BM25F_W_TITLE = 3
BM25F_W_BODY = 1


def bm25f_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25F fielded retrieval (Robertson & Zaragoza 2009 §3.3 — the
    simple weighted-field variant): term occurrences in the TITLE
    field count ``BM25F_W_TITLE``× those in the body, saturation runs
    over the COMBINED weighted tf (one k1 curve per term, not per
    field — the property that distinguishes BM25F from naively summing
    per-field BM25 scores), and length normalization uses the weighted
    document length against the weighted corpus total.

    Same scale shape as :func:`bm25_topk`: one posexplode scan
    (position decides the field), query-term filter at the scan,
    metadata-scale df/totals broadcast back, int64-floored
    contributions, TakeOrderedAndProject top-k. Returns
    ``(id, score_fp, n_hit_terms)``."""
    from pasta_pipeline_spark.functions.text import tokenize_ws

    terms = [t.lower() for t in query_terms]
    wt = F.when(F.col("pos") < BM25F_TITLE_LEN, F.lit(BM25F_W_TITLE)).otherwise(
        F.lit(BM25F_W_BODY)
    )
    tok = (
        docs.where(F.col(text_col).isNotNull())
        .select(F.col(id_col), F.posexplode(tokenize_ws(F.col(text_col))).alias("pos", "term"))
        .withColumn("w", wt.cast("long"))
    )
    dl = tok.groupBy(id_col).agg(F.sum("w").cast("long").alias("dl"))
    totals = dl.agg(
        F.count(F.lit(1)).cast("long").alias("N"),
        F.sum("dl").cast("long").alias("T"),
    )
    hits = tok.where(F.col("term").isin(terms))
    tf = hits.groupBy(id_col, "term").agg(F.sum("w").cast("long").alias("tf"))
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df_t"))
    contrib = (
        tf.join(F.broadcast(df_t), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(totals))
        .withColumn("c_fp", F.expr(bm25_term_sql()).cast("long"))
    )
    scored = contrib.groupBy(id_col).agg(
        F.sum("c_fp").cast("long").alias("score_fp"),
        F.count(F.lit(1)).cast("long").alias("n_hit_terms"),
    )
    return scored.orderBy(F.desc("score_fp"), F.asc(id_col)).limit(k)


def bm25f_oracle_sql(
    query_terms: list[str],
    k: int = 10,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`bm25f_topk` — same positional field
    split, weights, and shared term formula."""
    terms = ", ".join(sql_quote(t.lower()) for t in query_terms)
    return f"""
    WITH toks AS (
      SELECT {id_col},
             list_transform(
               list_filter(regexp_split_to_array({text_col}, '\\s+'), x -> x <> ''),
               x -> lower(x)) AS t
      FROM {table} WHERE {text_col} IS NOT NULL
    ), tok AS (
      SELECT {id_col}, t[i] AS term,
             CASE WHEN i <= {BM25F_TITLE_LEN} THEN {BM25F_W_TITLE}
                  ELSE {BM25F_W_BODY} END AS w
      FROM (SELECT {id_col}, t, unnest(generate_series(1, len(t))) AS i FROM toks)
    ), dl AS (
      SELECT {id_col}, CAST(SUM(w) AS BIGINT) AS dl FROM tok GROUP BY {id_col}
    ), tot AS (
      SELECT CAST(count(*) AS BIGINT) AS N, CAST(SUM(dl) AS BIGINT) AS T FROM dl
    ), tf AS (
      SELECT {id_col}, term, CAST(SUM(w) AS BIGINT) AS tf
      FROM tok WHERE term IN ({terms}) GROUP BY {id_col}, term
    ), dft AS (
      SELECT term, CAST(count(*) AS BIGINT) AS df_t FROM tf GROUP BY term
    ), contrib AS (
      SELECT tf.{id_col},
             CAST({bm25_term_sql()} AS BIGINT) AS c_fp
      FROM tf JOIN dft USING (term) JOIN dl USING ({id_col}) CROSS JOIN tot
    )
    SELECT {id_col}, CAST(SUM(c_fp) AS BIGINT) AS score_fp,
           CAST(count(*) AS BIGINT) AS n_hit_terms
    FROM contrib GROUP BY {id_col}
    ORDER BY score_fp DESC, {id_col} ASC LIMIT {k}
    """


def bm25_oracle_sql(
    query_terms: list[str],
    k: int = 10,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`bm25_topk` — same tokenization, same
    shared term formula, same tie-break."""
    terms = ", ".join(sql_quote(t.lower()) for t in query_terms)
    return f"""
    WITH tok AS (
      SELECT {id_col},
             unnest(list_transform(
               list_filter(regexp_split_to_array({text_col}, '\\s+'), x -> x <> ''),
               x -> lower(x))) AS term
      FROM {table} WHERE {text_col} IS NOT NULL
    ), dl AS (
      SELECT {id_col}, CAST(count(*) AS BIGINT) AS dl FROM tok GROUP BY {id_col}
    ), tot AS (
      SELECT CAST(count(*) AS BIGINT) AS N, CAST(SUM(dl) AS BIGINT) AS T FROM dl
    ), tf AS (
      SELECT {id_col}, term, CAST(count(*) AS BIGINT) AS tf
      FROM tok WHERE term IN ({terms}) GROUP BY {id_col}, term
    ), dft AS (
      SELECT term, CAST(count(*) AS BIGINT) AS df_t FROM tf GROUP BY term
    ), contrib AS (
      SELECT tf.{id_col},
             CAST({bm25_term_sql()} AS BIGINT) AS c_fp
      FROM tf JOIN dft USING (term) JOIN dl USING ({id_col}) CROSS JOIN tot
    )
    SELECT {id_col}, CAST(SUM(c_fp) AS BIGINT) AS score_fp,
           CAST(count(*) AS BIGINT) AS n_hit_terms
    FROM contrib GROUP BY {id_col}
    ORDER BY score_fp DESC, {id_col} ASC
    LIMIT {k}
    """


def phrase_search(
    docs: DataFrame,
    phrase: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact phrase search via a POSITIONAL index — the op a trigram
    or BM25 bag-of-words index cannot answer: find documents where the
    query terms appear CONSECUTIVELY, in order.

    Set-based alignment (no per-term join chain, so the plan does not
    grow with phrase length): every token occurrence emits one row per
    phrase slot it could fill, rebased to the would-be phrase START
    (``pos - slot``); a start position where ALL |phrase| distinct
    slots check in is an occurrence. Duplicate terms inside the phrase
    are handled — each position emits every slot its term matches, and
    the count-distinct-slots test still requires a full alignment.

    Returns ``(id, n_occurrences, first_pos)`` (1-based token
    position), only for matching documents. Scale shape: one
    tokenize+posexplode scan filtered to the phrase's terms (posting
    lists only), one groupBy (doc, start), one groupBy doc.
    """
    from pasta_pipeline_spark.functions.text import tokenize_ws

    terms = [t.lower() for t in phrase]
    n = len(terms)
    tok = docs.where(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        F.posexplode(tokenize_ws(F.col(text_col))).alias("pos0", "term"),
    )
    slot_opts = F.array(
        *[F.when(F.col("term") == F.lit(t), F.lit(i)) for i, t in enumerate(terms)]
    )
    m = (
        tok.where(F.col("term").isin(terms))
        .select(
            F.col(id_col),
            (F.col("pos0") + 1).alias("pos"),
            F.explode(F.filter(slot_opts, lambda x: x.isNotNull())).alias("i"),
        )
        .select(F.col(id_col), (F.col("pos") - F.col("i")).alias("start"), "i")
        .where(F.col("start") >= 1)
    )
    occ = (
        m.groupBy(id_col, "start")
        .agg(F.countDistinct("i").alias("k"))
        .where(F.col("k") == n)
    )
    return occ.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_occurrences"),
        F.min("start").cast("long").alias("first_pos"),
    )


def phrase_search_oracle_sql(
    phrase: list[str],
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`phrase_search` (same slot alignment)."""
    terms = [t.lower() for t in phrase]
    n = len(terms)
    in_list = ", ".join(sql_quote(t) for t in terms)
    slots = ", ".join(
        f"CASE WHEN term = {sql_quote(t)} THEN {i} END"
        for i, t in enumerate(terms)
    )
    return f"""
    WITH toks AS (
      SELECT {id_col},
             list_transform(
               list_filter(regexp_split_to_array({text_col}, '\\s+'), x -> x <> ''),
               x -> lower(x)) AS t
      FROM {table} WHERE {text_col} IS NOT NULL
    ), posed AS (
      SELECT {id_col}, unnest(generate_series(1, len(t))) AS pos, t FROM toks
    ), terms AS (
      SELECT {id_col}, pos, t[pos] AS term FROM posed
    ), slotted AS (
      SELECT {id_col}, pos,
             unnest(list_filter([{slots}], x -> x IS NOT NULL)) AS i
      FROM terms WHERE term IN ({in_list})
    ), m AS (
      SELECT {id_col}, pos - i AS start, i FROM slotted WHERE pos - i >= 1
    ), occ AS (
      SELECT {id_col}, start FROM m
      GROUP BY {id_col}, start HAVING count(DISTINCT i) = {n}
    )
    SELECT {id_col}, CAST(count(*) AS BIGINT) AS n_occurrences,
           CAST(MIN(start) AS BIGINT) AS first_pos
    FROM occ GROUP BY {id_col}
    """


def kwic_snippets(
    docs: DataFrame,
    hits: DataFrame,
    context: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    pos_col: str = "first_pos",
) -> DataFrame:
    """Keyword-in-context snippets for search hits: join the hit list
    (``id, first_pos`` — phrase_search/bm25 output) back to the corpus
    and slice ``context`` tokens either side of the match. The search
    results page, as an operator.

    Pure expressions over the joined rows: re-tokenize, ``slice`` the
    token array (1-based, clamped to the doc start — Spark's slice
    throws on start<=0, so the start is computed with greatest()
    first), space-join. The hits frame is the small side by
    construction (top-k / matching docs) — Catalyst broadcasts it; the
    corpus is touched only for matching ids once filters push down.

    Returns ``(id, first_pos, snippet)``.
    """
    from pasta_pipeline_spark.functions.text import tokenize_ws

    toks = F.col("__toks")
    start = F.greatest(F.col(pos_col) - context, F.lit(1))
    # inclusive token window [start, first_pos + context]
    length = F.col(pos_col) + context - start + 1
    return (
        docs.select(F.col(id_col), F.col(text_col))
        .join(hits.select(F.col(id_col), F.col(pos_col)), id_col)
        .withColumn("__toks", tokenize_ws(F.col(text_col)))
        .select(
            F.col(id_col),
            F.col(pos_col).cast("long").alias(pos_col),
            F.array_join(
                F.slice(toks, start.cast("int"), length.cast("int")), " "
            ).alias("snippet"),
        )
    )


# ---------------------------------------------------------------------------
# Hybrid retrieval: reciprocal rank fusion of BM25 and embedding cosine (r10)
# ---------------------------------------------------------------------------

#: RRF constant (Cormack, Clarke & Buettcher SIGIR 2009: k=60 is the
#: published default and remarkably insensitive) and the fixed-point
#: numerator: contributions are RRF_SCALE div (k + rank) — INTEGER
#: division of int64s, so fused scores are hash-exact cross-engine
#: with no double division anywhere.
RRF_K = 60
RRF_SCALE = 1_000_000_000


def hybrid_rrf_topk(
    docs: DataFrame,
    embeddings: DataFrame,
    query_terms: list[str],
    k: int = 10,
    n_deep: int = 50,
    rrf_k: int = RRF_K,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hybrid search — the retrieval shape every modern RAG stack
    runs: a lexical ranking (Okapi BM25 over the query terms) and a
    semantic ranking (exact cosine against the query embedding — here
    the lowest-id vector, the cosine_topk convention) fused by
    Reciprocal Rank Fusion: score(d) = Σ_lists 1/(rrf_k + rank_d).
    RRF needs no score calibration between the two systems (ranks
    only), which is exactly why it is the production default for
    BM25+vector fusion.

    Each list is cut to its top ``n_deep`` BEFORE fusion (the fusion
    depth — a bounded frame by construction), so the rank windows run
    over LIMITed n_deep-row frames: the SinglePartition exchange the
    plan audit reports here is a ≤n_deep-row handoff, never the
    corpus. Returns ``(id, lex_rank, sem_rank, rrf_fp)`` for the k
    best fused documents (rrf_fp desc, id asc); a document present in
    only one list contributes only that list's term (the standard RRF
    absent-rank convention).

    Scale shape: BM25 moves only query-term posting lists; the cosine
    side is one corpus scan + TakeOrderedAndProject; fusion is a
    full-outer join of two ≤n_deep-row frames.
    """
    from pasta_pipeline_spark.operators.similarity import cosine_topk

    lex_top = bm25_topk(docs, query_terms, k=n_deep, id_col=id_col,
                        text_col=text_col)
    w_lex = Window.orderBy(F.desc("score_fp"), F.asc(id_col))
    lex = lex_top.withColumn("lex_rank", F.row_number().over(w_lex)).select(
        F.col(id_col).alias("__id"), "lex_rank"
    )
    query = (
        embeddings.orderBy(vec_id_col)
        .limit(1)
        .select(F.col(vec_col).alias("qv"))
    )
    sem_top = cosine_topk(
        embeddings, query, k=n_deep, id_col=vec_id_col, vec_col=vec_col
    )
    w_sem = Window.orderBy(F.desc("sim"), F.asc(vec_id_col))
    sem = sem_top.withColumn("sem_rank", F.row_number().over(w_sem)).select(
        F.col(vec_id_col).alias("__id"), "sem_rank"
    )
    fused = lex.join(sem, "__id", "full_outer")
    term = lambda r: F.coalesce(  # noqa: E731
        F.expr(f"CAST({RRF_SCALE} AS BIGINT) div (CAST({rrf_k} AS BIGINT) + {r})"),
        F.lit(0),
    )
    return (
        fused.select(
            F.col("__id").alias(id_col),
            F.col("lex_rank").cast("long").alias("lex_rank"),
            F.col("sem_rank").cast("long").alias("sem_rank"),
            (term("lex_rank") + term("sem_rank")).cast("long").alias("rrf_fp"),
        )
        .orderBy(F.desc("rrf_fp"), F.asc(id_col))
        .limit(k)
    )


def hybrid_rrf_oracle_sql(
    query_terms: list[str],
    k: int = 10,
    n_deep: int = 50,
    rrf_k: int = RRF_K,
    doc_table: str = "documents",
    emb_table: str = "embeddings",
) -> str:
    """DuckDB twin of :func:`hybrid_rrf_topk`: the bm25_oracle_sql CTE
    chain cut at n_deep + the cosine_topk ranking + integer-division
    RRF fusion."""
    terms = ", ".join(sql_quote(t.lower()) for t in query_terms)
    return f"""
    WITH tok AS (
      SELECT doc_id,
             unnest(list_transform(
               list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> ''),
               x -> lower(x))) AS term
      FROM {doc_table} WHERE text IS NOT NULL
    ), dl AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tok GROUP BY doc_id
    ), tot AS (
      SELECT CAST(count(*) AS BIGINT) AS N, CAST(SUM(dl) AS BIGINT) AS T FROM dl
    ), tf AS (
      SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
      FROM tok WHERE term IN ({terms}) GROUP BY doc_id, term
    ), dft AS (
      SELECT term, CAST(count(*) AS BIGINT) AS df_t FROM tf GROUP BY term
    ), contrib AS (
      SELECT tf.doc_id, CAST({bm25_term_sql()} AS BIGINT) AS c_fp
      FROM tf JOIN dft USING (term) JOIN dl USING (doc_id) CROSS JOIN tot
    ), lex_top AS (
      SELECT doc_id, CAST(SUM(c_fp) AS BIGINT) AS score_fp
      FROM contrib GROUP BY doc_id
      ORDER BY score_fp DESC, doc_id ASC LIMIT {n_deep}
    ), lex AS (
      SELECT doc_id AS id,
             ROW_NUMBER() OVER (ORDER BY score_fp DESC, doc_id ASC) AS lex_rank
      FROM lex_top
    ), q AS (
      SELECT embedding::DOUBLE[] AS qv FROM {emb_table}
      ORDER BY vec_id LIMIT 1
    ), sem_top AS (
      SELECT vec_id,
             list_dot_product(e.embedding::DOUBLE[], q.qv)
               / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                  * sqrt(list_dot_product(q.qv, q.qv))) AS sim
      FROM {emb_table} e CROSS JOIN q
      ORDER BY sim DESC, vec_id ASC LIMIT {n_deep}
    ), sem AS (
      SELECT vec_id AS id,
             ROW_NUMBER() OVER (ORDER BY sim DESC, vec_id ASC) AS sem_rank
      FROM sem_top
    )
    SELECT COALESCE(lex.id, sem.id) AS doc_id,
           CAST(lex.lex_rank AS BIGINT) AS lex_rank,
           CAST(sem.sem_rank AS BIGINT) AS sem_rank,
           CAST(COALESCE({RRF_SCALE} // ({rrf_k} + lex.lex_rank), 0)
              + COALESCE({RRF_SCALE} // ({rrf_k} + sem.sem_rank), 0)
             AS BIGINT) AS rrf_fp
    FROM lex FULL OUTER JOIN sem ON lex.id = sem.id
    ORDER BY rrf_fp DESC, doc_id ASC
    LIMIT {k}
    """


def retrieval_rank_agreement(
    docs: DataFrame,
    embeddings: DataFrame,
    query_terms: list[str],
    n_deep: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cross-system retrieval agreement audit — the observability a
    hybrid stack needs before trusting fusion: how similarly do the
    lexical (BM25) and semantic (cosine) rankings order the documents
    they BOTH retrieve? Reports overlap counts and Kendall's tau over
    the common set (ranks are distinct integers, so plain tau — no
    tie correction): tau = (C − D) / (m(m−1)/2). Near +1 the systems
    are redundant; near 0 they disagree (fusion adds the most); a
    LOW-overlap pair of lists is the signal that one system is
    misconfigured for the corpus.

    Everything is integer (concordant/discordant counts, integer
    division for tau_sc at 1e6) — hash-exact. The pair comparison is
    a self-join of the ≤n_deep-row common frame: bounded by the
    fusion depth, never the corpus. Returns ONE row: n_lex, n_sem,
    n_common, concordant, discordant, tau_sc (NULL when m < 2).
    """
    from pasta_pipeline_spark.operators.similarity import cosine_topk

    lex_top = bm25_topk(docs, query_terms, k=n_deep, id_col=id_col,
                        text_col=text_col)
    w_lex = Window.orderBy(F.desc("score_fp"), F.asc(id_col))
    lex = lex_top.withColumn("lex_rank", F.row_number().over(w_lex)).select(
        F.col(id_col).alias("__id"), "lex_rank"
    )
    query = (
        embeddings.orderBy(vec_id_col)
        .limit(1)
        .select(F.col(vec_col).alias("qv"))
    )
    sem_top = cosine_topk(
        embeddings, query, k=n_deep, id_col=vec_id_col, vec_col=vec_col
    )
    w_sem = Window.orderBy(F.desc("sim"), F.asc(vec_id_col))
    sem = sem_top.withColumn("sem_rank", F.row_number().over(w_sem)).select(
        F.col(vec_id_col).alias("__id"), "sem_rank"
    )
    common = lex.join(sem, "__id")
    a = common.select(
        F.col("__id").alias("ia"),
        F.col("lex_rank").alias("la"),
        F.col("sem_rank").alias("sa"),
    )
    b = common.select(
        F.col("__id").alias("ib"),
        F.col("lex_rank").alias("lb"),
        F.col("sem_rank").alias("sb"),
    )
    pairs = a.join(b, F.col("ia") < F.col("ib"))
    agree = F.sum(
        F.when(
            (F.col("la") - F.col("lb")) * (F.col("sa") - F.col("sb")) > 0, 1
        ).otherwise(0)
    )
    disagree = F.sum(
        F.when(
            (F.col("la") - F.col("lb")) * (F.col("sa") - F.col("sb")) < 0, 1
        ).otherwise(0)
    )
    counts = pairs.agg(
        agree.cast("long").alias("concordant"),
        disagree.cast("long").alias("discordant"),
    )
    sizes = (
        lex.agg(F.count(F.lit(1)).cast("long").alias("n_lex"))
        .crossJoin(
            F.broadcast(sem.agg(F.count(F.lit(1)).cast("long").alias("n_sem")))
        )
        .crossJoin(
            F.broadcast(
                common.agg(F.count(F.lit(1)).cast("long").alias("n_common"))
            )
        )
    )
    out = sizes.crossJoin(F.broadcast(counts))
    tau_sc = F.when(
        F.col("n_common") >= 2,
        F.expr("((concordant - discordant) * 1000000) div "
               "((n_common * (n_common - 1)) div 2)"),
    ).cast("long")
    return out.select(
        "n_lex",
        "n_sem",
        "n_common",
        F.coalesce("concordant", F.lit(0)).cast("long").alias("concordant"),
        F.coalesce("discordant", F.lit(0)).cast("long").alias("discordant"),
        tau_sc.alias("tau_sc"),
    )


def rank_agreement_oracle_sql(
    query_terms: list[str],
    n_deep: int = 50,
    doc_table: str = "documents",
    emb_table: str = "embeddings",
) -> str:
    """DuckDB twin of :func:`retrieval_rank_agreement`."""
    terms = ", ".join(sql_quote(t.lower()) for t in query_terms)
    return f"""
    WITH tok AS (
      SELECT doc_id,
             unnest(list_transform(
               list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> ''),
               x -> lower(x))) AS term
      FROM {doc_table} WHERE text IS NOT NULL
    ), dl AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tok GROUP BY doc_id
    ), tot AS (
      SELECT CAST(count(*) AS BIGINT) AS N, CAST(SUM(dl) AS BIGINT) AS T FROM dl
    ), tf AS (
      SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
      FROM tok WHERE term IN ({terms}) GROUP BY doc_id, term
    ), dft AS (
      SELECT term, CAST(count(*) AS BIGINT) AS df_t FROM tf GROUP BY term
    ), contrib AS (
      SELECT tf.doc_id, CAST({bm25_term_sql()} AS BIGINT) AS c_fp
      FROM tf JOIN dft USING (term) JOIN dl USING (doc_id) CROSS JOIN tot
    ), lex_top AS (
      SELECT doc_id, CAST(SUM(c_fp) AS BIGINT) AS score_fp
      FROM contrib GROUP BY doc_id
      ORDER BY score_fp DESC, doc_id ASC LIMIT {n_deep}
    ), lex AS (
      SELECT doc_id AS id,
             ROW_NUMBER() OVER (ORDER BY score_fp DESC, doc_id ASC) AS lex_rank
      FROM lex_top
    ), q AS (
      SELECT embedding::DOUBLE[] AS qv FROM {emb_table}
      ORDER BY vec_id LIMIT 1
    ), sem_top AS (
      SELECT vec_id,
             list_dot_product(e.embedding::DOUBLE[], q.qv)
               / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                  * sqrt(list_dot_product(q.qv, q.qv))) AS sim
      FROM {emb_table} e CROSS JOIN q
      ORDER BY sim DESC, vec_id ASC LIMIT {n_deep}
    ), sem AS (
      SELECT vec_id AS id,
             ROW_NUMBER() OVER (ORDER BY sim DESC, vec_id ASC) AS sem_rank
      FROM sem_top
    ), com AS (
      SELECT lex.id, lex.lex_rank, sem.sem_rank
      FROM lex JOIN sem ON lex.id = sem.id
    ), cnt AS (
      SELECT
        CAST(COALESCE(SUM(CASE WHEN (a.lex_rank - b.lex_rank)
          * (a.sem_rank - b.sem_rank) > 0 THEN 1 ELSE 0 END), 0) AS BIGINT)
          AS concordant,
        CAST(COALESCE(SUM(CASE WHEN (a.lex_rank - b.lex_rank)
          * (a.sem_rank - b.sem_rank) < 0 THEN 1 ELSE 0 END), 0) AS BIGINT)
          AS discordant
      FROM com a JOIN com b ON a.id < b.id
    ), sizes AS (
      SELECT (SELECT CAST(count(*) AS BIGINT) FROM lex) AS n_lex,
             (SELECT CAST(count(*) AS BIGINT) FROM sem) AS n_sem,
             (SELECT CAST(count(*) AS BIGINT) FROM com) AS n_common
    )
    SELECT n_lex, n_sem, n_common, concordant, discordant,
      CAST(CASE WHEN n_common >= 2 THEN
        ((concordant - discordant) * 1000000)
          // ((n_common * (n_common - 1)) // 2)
      END AS BIGINT) AS tau_sc
    FROM sizes CROSS JOIN cnt"""
