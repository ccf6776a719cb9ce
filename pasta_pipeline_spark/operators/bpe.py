"""In-plan BPE merge learning (Sennrich, Haddow & Birch 2016 §3.2).

Learns the first K byte-pair-encoding merges from the corpus, fully
inside the engine: the word-frequency frame starts character-split;
each round counts adjacent token pairs (weighted by word frequency),
elects the most frequent pair (deterministic tie-break: count desc,
pair asc), and re-tokenizes every word by merging that pair greedy
left-to-right — exactly the textbook algorithm, K rounds unrolled.

Exactness notes:

- The Spark merge is an ``aggregate`` HOF fold over each word's token
  array (out[-1]==a and t==b → replace last with ab, else append) —
  the canonical greedy leftmost non-overlapping substitution. The
  DuckDB twin CANNOT fold into a list (list_reduce is scalar-typed),
  so it implements the identical semantics positionally: precompute
  match positions, group consecutive matches into runs, keep
  alternate positions from each run start (run parity == greedy LTR),
  rebuild with keep/skip/emit. A plain string ``replace`` over
  delimiter-joined tokens was rejected: the shared boundary delimiter
  makes it skip the token after each match (diverges from BPE on
  same-char runs >= 4).
- Everything is exact integer counts and string equality — no doubles
  anywhere — so the learned merge table is value-hash oracle-checkable.

Scale shape: the state between rounds is the WORD-FREQUENCY frame
(vocabulary-scale, not corpus-scale — the classic BPE trick), persisted
per round (attach_cached_deps). Each round = one vocabulary groupBy
(pair counts, map-side combined) + a 1-row elected-merge broadcast
(the audited crossJoin handoff) + one expression-only re-tokenization
scan. K rounds = K small shuffles; the corpus is scanned ONCE (to
build word frequencies).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_freq_frame(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Vocabulary frame for BPE: (word, cnt, toks) with toks the
    character split — one corpus scan + one groupBy(word)."""
    from pasta_pipeline_spark.functions.text import tokenize_ws

    words = df.select(
        F.explode(tokenize_ws(F.col(text_col))).alias("word")
    ).groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    return words.withColumn(
        "toks", F.expr("regexp_extract_all(word, '.', 0)")
    )


def _pair_counts(words: DataFrame) -> DataFrame:
    """Adjacent-pair frequencies weighted by word count."""
    # guard single-token words: Spark sequence(1, 0) DESCENDS ([1, 0]),
    # it is not empty — an unguarded transform would fabricate pairs
    pairs = words.where(F.expr("size(toks) >= 2")).select(
        "cnt",
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 1),"
                " i -> struct(element_at(toks, i) AS a,"
                " element_at(toks, i + 1) AS b))"
            )
        ).alias("p"),
    )
    return pairs.select("cnt", "p.a", "p.b").groupBy("a", "b").agg(
        F.sum("cnt").alias("pcnt")
    )


_MERGE_FOLD = """
aggregate(
  toks,
  CAST(array() AS ARRAY<STRING>),
  (acc, t) -> CASE
    WHEN size(acc) > 0 AND element_at(acc, -1) = __a AND t = __b
    THEN concat(slice(acc, 1, size(acc) - 1), array(concat(__a, __b)))
    ELSE concat(acc, array(t)) END
)
"""


def bpe_learn_merges(words: DataFrame, k: int = 4) -> DataFrame:
    """Learn the first ``k`` BPE merges from a :func:`word_freq_frame`.

    Returns k rows, ordered: step (1-based), a, b, merged (= a||b),
    pair_count (the weighted adjacent-pair frequency that elected the
    merge at that step).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    from pasta_pipeline_spark.operators.util import attach_cached_deps

    deps = []
    merge_rows = []
    cur = words.persist()
    deps.append(cur)
    for step in range(1, k + 1):
        top = (
            _pair_counts(cur)
            .orderBy(F.desc("pcnt"), F.asc("a"), F.asc("b"))
            .limit(1)
            .select(
                F.col("a").alias("__a"),
                F.col("b").alias("__b"),
                F.col("pcnt").alias("__pcnt"),
            )
        )
        merge_rows.append(
            top.select(
                F.lit(step).cast("long").alias("step"),
                F.col("__a").alias("a"),
                F.col("__b").alias("b"),
                F.concat("__a", "__b").alias("merged"),
                F.col("__pcnt").cast("long").alias("pair_count"),
            )
        )
        cur = (
            cur.crossJoin(F.broadcast(top))
            .withColumn("toks", F.expr(_MERGE_FOLD))
            .select("word", "cnt", "toks")
            .persist()
        )
        deps.append(cur)
    out = merge_rows[0]
    for m in merge_rows[1:]:
        out = out.unionByName(m)
    return attach_cached_deps(out.orderBy("step"), deps)


def _bpe_cte_chain(table: str, k: int) -> str:
    """Shared WITH-clause builder for the K unrolled BPE rounds (the
    positional run-parity rewrite — see module docstring for why not
    string replace)."""
    sql = [
        f"""
    WITH w0 AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt,
             regexp_extract_all(word, '.') AS toks
      FROM (
        SELECT unnest(list_filter(regexp_split_to_array(lower(text),
                 '\\s+'), y -> y <> '')) AS word
        FROM {table}
      ) GROUP BY word
    )"""
    ]
    for s in range(1, k + 1):
        prev = f"w{s - 1}"
        sql.append(
            f""", p{s} AS (
      SELECT p[1] AS a, p[2] AS b, CAST(SUM(cnt) AS BIGINT) AS pcnt
      FROM (
        SELECT cnt, unnest(list_zip(toks, toks[2:])) AS p FROM {prev}
      ) WHERE p[2] IS NOT NULL GROUP BY 1, 2
    ), m{s} AS (
      SELECT a, b, pcnt FROM p{s}
      ORDER BY pcnt DESC, a ASC, b ASC LIMIT 1
    ), t{s} AS (
      SELECT word, cnt, unnest(toks) AS t,
             unnest(range(1, len(toks) + 1)) AS pos
      FROM {prev}
    ), mt{s} AS (
      SELECT word, cnt, pos, t, m.a, m.b,
             (t = m.a AND lead(t) OVER (PARTITION BY word ORDER BY pos)
               = m.b) AS ismatch
      FROM t{s} CROSS JOIN m{s} m
    ), r{s} AS (
      SELECT *, CASE WHEN ismatch THEN pos - ROW_NUMBER()
        OVER (PARTITION BY word, ismatch ORDER BY pos) END AS grp
      FROM mt{s}
    ), k{s} AS (
      SELECT *, COALESCE(ismatch AND (pos - MIN(pos)
        OVER (PARTITION BY word, grp)) % 2 = 0, FALSE) AS keep
      FROM r{s}
    ), f{s} AS (
      SELECT *, COALESCE(LAG(keep) OVER (PARTITION BY word ORDER BY pos),
        FALSE) AS prev_keep
      FROM k{s}
    ), w{s} AS (
      SELECT word, cnt,
             list(CASE WHEN keep THEN a || b ELSE t END ORDER BY pos)
               AS toks
      FROM f{s} WHERE keep OR NOT prev_keep GROUP BY word, cnt
    )"""
        )
    return "".join(sql)


def bpe_merges_oracle_sql(table: str = "documents", k: int = 4) -> str:
    """DuckDB twin of word_freq_frame + bpe_learn_merges."""
    selects = [
        f"""
    SELECT CAST({s} AS BIGINT) AS step, a, b, a || b AS merged,
           pcnt AS pair_count
    FROM m{s}"""
        for s in range(1, k + 1)
    ]
    return (
        _bpe_cte_chain(table, k)
        + "\n    UNION ALL".join(selects)
        + "\n    ORDER BY step"
    )


def bpe_compression_report(words: DataFrame, k: int = 4) -> DataFrame:
    """Tokens-per-word compression curve of the first ``k`` BPE
    merges: one row per step 0..k (0 = character baseline) with the
    corpus-weighted token totals — the number that says how much
    context window the subword vocab buys. Shares the learning loop
    with :func:`bpe_learn_merges`; decimal(38,0) token totals.

    Returns: step, vocab_words, total_tokens, tokens_per_word_sc.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    from pasta_pipeline_spark.operators.util import attach_cached_deps

    def stats(frame: DataFrame, step: int) -> DataFrame:
        return frame.agg(
            F.lit(step).cast("long").alias("step"),
            F.count(F.lit(1)).cast("long").alias("vocab_words"),
            F.sum(
                (F.col("cnt") * F.size("toks")).cast("decimal(38,0)")
            ).alias("__tt"),
            F.sum("cnt").alias("__wc"),
        ).select(
            "step",
            "vocab_words",
            F.col("__tt").cast("long").alias("total_tokens"),
            F.floor(
                F.col("__tt").cast("double") / F.col("__wc").cast("double")
                * 1000000
            )
            .cast("long")
            .alias("tokens_per_word_sc"),
        )

    deps = []
    cur = words.persist()
    deps.append(cur)
    out = stats(cur, 0)
    for step in range(1, k + 1):
        top = (
            _pair_counts(cur)
            .orderBy(F.desc("pcnt"), F.asc("a"), F.asc("b"))
            .limit(1)
            .select(F.col("a").alias("__a"), F.col("b").alias("__b"))
        )
        cur = (
            cur.crossJoin(F.broadcast(top))
            .withColumn("toks", F.expr(_MERGE_FOLD))
            .select("word", "cnt", "toks")
            .persist()
        )
        deps.append(cur)
        out = out.unionByName(stats(cur, step))
    return attach_cached_deps(out.orderBy("step"), deps)


def bpe_compression_oracle_sql(table: str = "documents", k: int = 4) -> str:
    """DuckDB twin of :func:`bpe_compression_report`."""
    selects = [
        f"""
    SELECT CAST({s} AS BIGINT) AS step,
           CAST(COUNT(*) AS BIGINT) AS vocab_words,
           CAST(SUM(cnt * len(toks)) AS BIGINT) AS total_tokens,
           CAST(FLOOR(CAST(SUM(cnt * len(toks)) AS DOUBLE)
             / CAST(SUM(cnt) AS DOUBLE) * 1000000) AS BIGINT)
             AS tokens_per_word_sc
    FROM w{s}"""
        for s in range(0, k + 1)
    ]
    return (
        _bpe_cte_chain(table, k)
        + "\n    UNION ALL".join(selects)
        + "\n    ORDER BY step"
    )
