"""BPE tokenizer induction — learning the vocabulary FROM the corpus.

Byte-pair encoding (Sennrich et al., ACL 2016 — the public algorithm
behind GPT/Llama-family tokenizers) is usually trained by a
single-machine script over a sample; at corpus scale the counting is
the expensive part and it is exactly what Spark is for. The classic
algorithm, expressed relationally:

1. pre-aggregate the corpus to its WORD DISTRIBUTION
   ``(word, count)`` — every later step is vocabulary-scale, not
   corpus-scale (the standard trick; word frequencies are sufficient
   statistics for BPE);
2. each word starts as its character sequence (+ ``</w>`` end marker,
   per the paper);
3. per round: count adjacent symbol pairs weighted by word count
   (explode + groupBy), collect the top slice (metadata-scale), and
   accept the maximal PROVABLY-ORDER-SAFE prefix — up to
   ``batch_size`` pairwise-symbol-disjoint pairs that strictly beat
   every conflicting candidate (the public batched-BPE trick; see
   :func:`learn_bpe_merges_batched` for the safety argument) — then
   rewrite every word's symbol array with the batch fused, pure
   ``aggregate`` fold expressions, no UDF. One driver round-trip per
   round instead of per merge; the learned sequence is IDENTICAL to
   the classic one-merge-at-a-time algorithm
   (:func:`learn_bpe_merges_sequential`, the differential reference);
4. after ``n_merges`` merges the merge table IS the tokenizer.

State is persisted and lineage-truncated per round (the fixpoint
pattern duplicate_clusters uses). ``apply_bpe`` replays the learned
merge sequence over any text — the same fold expression, so
training-time and inference-time segmentation cannot diverge.
Verified by differential pytest against an independent pure-Python
reference implementation of the paper's algorithm.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

END = "</w>"


def _merge_pair_expr(symbols: Column, left: str, right: str) -> Column:
    """Fuse every adjacent (left, right) occurrence in a symbol array:
    a left-fold that appends each symbol unless it completes the pair
    with the accumulator's tail, in which case the tail is replaced by
    the fused symbol. Leftmost-first, non-overlapping — the paper's
    replacement order."""
    merged = left + right
    return F.aggregate(
        symbols,
        F.array().cast("array<string>"),
        # try_element_at: NULL on the empty accumulator (ANSI-safe),
        # and NULL == left is never true, so the first symbol appends
        lambda acc, s: F.when(
            (F.try_element_at(acc, F.lit(-1)) == F.lit(left)) & (s == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def _word_distribution(
    docs: DataFrame, text_col: str
) -> DataFrame:
    """(word, count, symbols) — the sufficient statistics."""
    words = docs.where(F.col(text_col).isNotNull()).select(
        F.explode(
            F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != "")
        ).alias("word")
    )
    dist = words.groupBy("word").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    symbols = F.concat(
        F.split(F.col("word"), ""),  # one element per character
        F.array(F.lit(END)),
    )
    return dist.select("word", "cnt", symbols.alias("symbols"))


def learn_bpe_merges(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 10,
    batch_size: int = 8,
) -> list[tuple[int, str, str]]:
    """Learn ``n_merges`` BPE merge rules from the corpus; returns
    ``[(rank, left, right), ...]`` in application order. The default
    path is the BATCHED trainer (:func:`learn_bpe_merges_batched` —
    one driver round-trip per round of up to ``batch_size`` provably
    order-safe merges, instead of one per merge); the result is
    guaranteed identical to the sequential algorithm.
    ``batch_size=1`` degenerates to the classic per-merge loop."""
    return learn_bpe_merges_batched(docs, text_col, n_merges, batch_size)


def learn_bpe_merges_sequential(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 10,
) -> list[tuple[int, str, str]]:
    """The classic one-merge-per-round loop — kept as the exactness
    reference the batched trainer is differentially tested against.
    Driver-side state is one (pair, count) row per round — everything
    heavy stays distributed. Rounds where no adjacent pair remains
    (tiny corpora) stop early."""
    vocab = _word_distribution(docs, text_col).persist()
    merges: list[tuple[int, str, str]] = []
    for rank in range(n_merges):
        pairs = (
            vocab.select(
                "cnt",
                F.explode(
                    F.zip_with(
                        F.slice(F.col("symbols"), 1, F.size("symbols") - 1),
                        F.slice(F.col("symbols"), 2, F.size("symbols") - 1),
                        lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.desc("n"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not pairs:
            break
        left, right = pairs[0]["l"], pairs[0]["r"]
        merges.append((rank, left, right))
        new_vocab = vocab.select(
            "word", "cnt", _merge_pair_expr(F.col("symbols"), left, right).alias("symbols")
        ).localCheckpoint(eager=True)
        vocab.unpersist()
        vocab = new_vocab
    vocab.unpersist()
    return merges


def apply_bpe(
    docs: DataFrame,
    merges: list[tuple[int, str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Segment documents with a learned merge sequence: per word,
    start from characters + ``</w>`` and apply every merge in rank
    order (the same fold expression training used). Returns
    ``(id, bpe_tokens array<string>, n_tokens)``. Plan depth grows
    with the merge count — for large vocabularies, segment against
    the final VOCABULARY with a longest-match strategy instead; this
    replay form is the exactness reference."""
    words = docs.where(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        F.posexplode(
            F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != "")
        ).alias("pos", "word"),
    )
    symbols = F.concat(F.split(F.col("word"), ""), F.array(F.lit(END)))
    out = words.select(id_col, "pos", symbols.alias("symbols"))
    for _rank, left, right in merges:
        out = out.select(
            id_col, "pos", _merge_pair_expr(F.col("symbols"), left, right).alias("symbols")
        )
    return out.groupBy(id_col).agg(
        F.flatten(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("pos"), F.col("symbols")))
                ),
                lambda s: s.getField("symbols"),
            )
        ).alias(out_col)
    ).select(
        id_col, out_col, F.size(out_col).cast("long").alias("n_tokens")
    )


def apply_bpe_batched(
    docs: DataFrame,
    merges: list[tuple[int, str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Merge-replay segmentation with CONSTANT plan depth: the same
    algorithm as :func:`apply_bpe` (every learned merge applied in
    rank order, leftmost-first), executed inside one Arrow-batched
    ``mapInPandas`` stage instead of one plan operator per merge —
    the form that scales to real vocabularies (tens of thousands of
    merges would otherwise nest tens of thousands of projections).
    Per-word results are memoized within each batch (corpus word
    distributions are Zipfian; the cache hit rate is the point).
    Output equals :func:`apply_bpe` row for row — pinned by the
    equivalence pytest, which is what makes the expression form the
    exactness reference and this the production path."""
    from pasta_pipeline_spark.operators.util import (
        ensure_package_on_workers,
        ensure_parallelism,
    )

    ensure_package_on_workers(docs.sparkSession)
    ranked = [(left, right) for _rank, left, right in sorted(merges)]
    src = ensure_parallelism(
        docs.where(F.col(text_col).isNotNull()).select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.col(text_col).alias("text"),
        )
    )
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField(out_col, T.ArrayType(T.StringType()), False),
            T.StructField("n_tokens", T.LongType(), False),
        ]
    )

    def run(batches):
        import pandas as pd

        cache: dict[str, list[str]] = {}

        def segment_word(word: str) -> list[str]:
            hit = cache.get(word)
            if hit is not None:
                return hit
            syms = list(word) + [END]
            for left, right in ranked:
                out, i = [], 0
                n = len(syms)
                while i < n:
                    if i + 1 < n and syms[i] == left and syms[i + 1] == right:
                        out.append(left + right)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            cache[word] = syms
            return syms

        for pdf in batches:
            ids, toks, counts = [], [], []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                words = [w for w in str(text).lower().split() if w != ""]
                seg = [t for w in words for t in segment_word(w)]
                ids.append(did)
                toks.append(seg)
                counts.append(len(seg))
            yield pd.DataFrame(
                {"doc_id": ids, out_col: toks, "n_tokens": counts}
            )

    return src.mapInPandas(run, schema).withColumnRenamed("doc_id", id_col)


def learn_bpe_merges_batched(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 10,
    batch_size: int = 8,
    return_rounds: bool = False,
):
    """Batched BPE training — the SAME learned merge sequence as
    :func:`learn_bpe_merges`, with one driver round-trip per ROUND
    instead of per merge (the public batched-BPE trick; at a real 32k
    vocabulary the sequential form is 32k Spark jobs).

    Per round, the pair counts are computed once and the top slice
    collected (a few hundred rows — metadata-scale); the round then
    accepts the maximal SAFE prefix of the (count desc, pair asc)
    order, where safe = provably the merges sequential BPE would pick
    next, in this order:

    - accepted pairs must be pairwise NON-CHAINING: candidate (l, r)
      conflicts with an accepted (L, R) iff ``r == L`` or ``l == R``
      (two pair occurrences can only overlap by chaining — "... l r=L
      R ..." — so only then can one merge destroy the other's
      occurrences; sharing the same left or same right symbol is
      harmless, e.g. every word's end pair shares ``</w>`` as a right
      symbol without interacting). Fused-string coincidences (l, r,
      or l+r equal to an accepted fused string, or vice versa) also
      conflict, conservatively;
    - the prefix stops at the first conflicting candidate, and every
      accepted pair must beat that candidate's count STRICTLY: a
      merge of (L, R) only creates pairs involving its fused symbol,
      each bounded by an existing pair that CHAINS with (L, R) —
      (t, L) or (R, u) — which, being conflicting, sits at or below
      the stop candidate in the sort; and it only shrinks pairs that
      chain with it. Strictness also protects the (count, pair asc)
      tie-break;
    - if the fetched slice may be truncated, the last fetched count
      is a stop bound too (unseen pairs sit below it);
    - if nothing survives the guards, the round falls back to the
      plain argmax — the classic sequential step, always safe.

    So each accepted batch is exactly the next |batch| merges of the
    sequential algorithm (differential pytest pins list equality and
    the >=4x round reduction on the reference fixture). Vocabulary
    rewrite applies the whole batch as nested fold expressions in one
    projection with ONE checkpoint per round."""
    vocab = _word_distribution(docs, text_col).persist()
    merges: list[tuple[int, str, str]] = []
    fetch = max(batch_size * 4, 16)
    rounds = 0
    while len(merges) < n_merges:
        top = (
            vocab.select(
                "cnt",
                F.explode(
                    F.zip_with(
                        F.slice(F.col("symbols"), 1, F.size("symbols") - 1),
                        F.slice(F.col("symbols"), 2, F.size("symbols") - 1),
                        lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.desc("n"), F.asc("l"), F.asc("r"))
            .limit(fetch)
            .collect()
        )
        rounds += 1
        if not top:
            break
        cap = min(batch_size, n_merges - len(merges))
        accepted: list = []
        lefts: set[str] = set()
        rights: set[str] = set()
        fused: set[str] = set()
        stop_count = None
        for row in top:
            left, right = row["l"], row["r"]
            both = left + right
            chains = right in lefts or left in rights
            coincides = (
                left in fused
                or right in fused
                or both in lefts
                or both in rights
                or both in fused
            )
            if len(accepted) >= cap or chains or coincides:
                stop_count = row["n"]
                break
            accepted.append(row)
            lefts.add(left)
            rights.add(right)
            fused.add(both)
        else:
            if len(top) == fetch:
                stop_count = top[-1]["n"]
        if stop_count is not None:
            accepted = [r for r in accepted if r["n"] > stop_count]
        if not accepted:
            accepted = [top[0]]
        sym = F.col("symbols")
        for row in accepted:
            merges.append((len(merges), row["l"], row["r"]))
            sym = _merge_pair_expr(sym, row["l"], row["r"])
        new_vocab = vocab.select("word", "cnt", sym.alias("symbols")).localCheckpoint(
            eager=True
        )
        vocab.unpersist()
        vocab = new_vocab
    vocab.unpersist()
    return (merges, rounds) if return_rounds else merges


# ---------------------------------------------------------------------------
# Oracle-checkable BPE variant (r8 wave 18)
# ---------------------------------------------------------------------------
# The classic trainer above (learn_bpe_merges / apply_bpe, with the
# paper's </w> end marker and order-safe merge batching) is verified
# by differential pytest against a pure-Python reference — but its
# driver round-trips cannot be expressed as a DuckDB twin. The
# functions below are the VALUE-HASH-ORACLE-CHECKABLE variant used by
# the bpe_merge_learning / bpe_compression_curve catalog queries:
# plain character split (no end marker), strictly one merge per round
# elected by (count desc, pair asc), Spark merge as a greedy-LTR
# aggregate fold, DuckDB twin as a positional run-parity rewrite
# (string replace provably diverges on same-char runs >= 4: the shared
# boundary delimiter makes it skip the token after each match).
# Sennrich semantics differ ONLY in the end marker; both trainers are
# exact BPE on their respective symbol alphabets.


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


def _bpe_cte_chain(table: str, k: int, word_filter_sql: str = "") -> str:
    """Shared WITH-clause builder for the K unrolled BPE rounds (the
    positional run-parity rewrite — see module docstring for why not
    string replace). ``word_filter_sql`` (e.g. a length cap) lets the
    unigram-fertility oracle train on the same word population as its
    Spark twin; empty keeps the historical unfiltered chain."""
    where = f"WHERE {word_filter_sql}" if word_filter_sql else ""
    sql = [
        f"""
    WITH w0 AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt,
             regexp_extract_all(word, '.') AS toks
      FROM (
        SELECT unnest(list_filter(regexp_split_to_array(lower(text),
                 '\\s+'), y -> y <> '')) AS word
        FROM {table}
      ) {where} GROUP BY word
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
