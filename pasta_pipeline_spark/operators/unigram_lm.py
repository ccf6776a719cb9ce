"""Unigram-LM (SentencePiece-style) tokenizer training — Kudo 2018
(arXiv:1804.10959), the probabilistic counterpart of BPE (r8 verdict
ask #7), as an IN-PLAN Spark computation with a full-hash DuckDB twin.

Algorithm (Viterbi-EM, the hard-EM variant of Kudo's trainer):

1. **Seed.** From the word-distribution sufficient statistics
   (``operators/bpe.py word_freq_frame`` — (word, cnt), one corpus
   scan), count every substring of length 1..``max_piece_len`` with
   multiplicity, weighted by word frequency. The seed vocabulary is
   ALL single characters (coverage guarantee, never pruned — Kudo's
   required-character set) plus the top ``seed_multi`` multi-char
   substrings by (count desc, piece asc).
2. **EM rounds** (``rounds``, statically unrolled). E-step: Viterbi-
   segment every distinct word under piece costs
   ``cost(p) = ln_fp(total) − ln_fp(cnt(p))`` (the fixed-point-ln
   bridge of bigram_nll: FLOOR(ln(int64)·1e9) is an exact int64 both
   engines agree on, and path costs are exact integer SUMS — so the
   argmin segmentation is deterministic and hash-stable, unlike a
   float product of probabilities). M-step: re-count pieces along the
   chosen paths (word-frequency weighted); multi-char pieces that were
   never chosen are pruned (the hard-EM analog of Kudo's
   loss-contribution pruning), characters always survive with count
   floor 1.
3. **Final prune.** Keep all characters + the top ``final_multi``
   multi-char pieces by (count desc, piece asc).

Viterbi per word is a length-bounded DP expressed as ONE aggregate
fold over positions (no UDF, no driver loop): the accumulator is a
flat int64 array of ``enc_p = best_p·8 + chosen_len_p`` (the ·8+k
encoding makes the (cost, shortest-piece) tiebreak a plain ``least``).
A second fold walks the backpointers to emit the piece array.
Candidate costs reach the lambda through a per-word INT→BIGINT map
built from one explode + one broadcast-ready vocab join. The DuckDB
twin computes the SAME recurrence as RECURSIVE CTEs — zero lambdas —
because DuckDB 1.0's list_reduce misaligns captured outer columns
across rows under multithreaded execution (see
:func:`_oracle_viterbi_ctes` for the full defect notes).

Scale shape: everything after the first scan is VOCABULARY-scale
(distinct words × L×M candidate rows; piece tables of a few hundred
rows, broadcast into the joins). The corpus is scanned once for the
word distribution; EM rounds iterate over the distinct-word frame
only — at 100 TB the word frame is ~1e8 rows, each DP a bounded
O(L·M) expression. No collects, no per-row Python.

Bounds: ``max_piece_len < 8`` (the %8 backpointer encoding),
``max_word_len`` caps DP depth (longer words are excluded from
training — the standard SentencePiece max-sentencepiece-length
analog); path costs ≤ 16·ln(1e12)·1e9 ≈ 4.5e11 ≪ the 1e15 INF
sentinel, and 8·16·INF fits int64.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LN_SCALE = 1_000_000_000
INF = 10**15
INF2 = 4 * 10**15


def _check(max_piece_len: int, rounds: int) -> None:
    if not 1 <= max_piece_len <= 7:
        raise ValueError("max_piece_len must be in [1, 7] (the %8 encoding)")
    if rounds < 1:
        raise ValueError("rounds must be >= 1")


# ---------------------------------------------------------------------------
# Spark DP expression builders. The DuckDB twin implements the SAME
# recurrence but as recursive CTEs instead of a fold — see
# _oracle_viterbi_ctes for the DuckDB 1.0 defect notes.
# ---------------------------------------------------------------------------


def _dp_encs(m: int) -> str:
    """The M candidate ``(best + cost)·8 + k`` terms at fold position
    i = |acc| (the accumulator grows once per position, so its length
    IS the position — no loop variable needed)."""
    return ", ".join(
        f"IF(size(acc) >= {k}, (element_at(acc, size(acc) - {k} + 1) div 8"
        f" + coalesce(element_at(cmap, (size(acc) - 1) * {m} + {k}), {INF}L))"
        f" * 8 + {k}, {INF2}L)"
        for k in range(1, m + 1)
    )


def _dp_fold(m: int) -> str:
    return (
        "aggregate(sequence(1, length(word)), array(0L),"
        f" (acc, z) -> concat(acc, array(least({_dp_encs(m)}))))"
    )


def _bw_fold() -> str:
    """Backpointer walk: acc[1] is the current position (as a string,
    so the piece strings can share the array); each step prepends the
    piece ending at the current position and retreats by its length."""
    pos = "CAST(element_at(acc, 1) AS INT)"
    k = f"CAST(element_at(dpenc, {pos} + 1) % 8 AS INT)"
    return f"""
        aggregate(sequence(1, length(word)),
          array(CAST(length(word) AS STRING)),
          (acc, z) -> IF({pos} > 0,
            concat(array(CAST({pos} - {k} AS STRING),
                         substring(word, {pos} - {k} + 1, {k})),
                   slice(acc, 2, size(acc))),
            acc))"""


# ---------------------------------------------------------------------------
# Spark side
# ---------------------------------------------------------------------------


def _candidates(words: DataFrame, m: int) -> DataFrame:
    """(word, cnt, idx, piece): every substring of length 1..m, with
    idx = (end_pos − 1)·m + len — the DP lambda's map key."""
    return words.select(
        "word",
        "cnt",
        F.explode(
            F.expr(
                f"flatten(transform(sequence(1, length(word)),"
                f" i -> transform(sequence(1, least({m}, i)),"
                f" k -> struct((i - 1) * {m} + k AS idx,"
                f" substring(word, i - k + 1, k) AS piece))))"
            )
        ).alias("c"),
    ).select("word", "cnt", F.col("c.idx").alias("idx"), F.col("c.piece").alias("piece"))


def _with_costs(vocab: DataFrame) -> DataFrame:
    """(piece, cnt, cost_fp): cost = ln_fp(total) − ln_fp(cnt), both
    exact int64 fixed-point lns (the bigram_nll bridge)."""
    total = vocab.agg(F.sum("cnt").cast("long").alias("__tot"))
    return vocab.crossJoin(F.broadcast(total)).select(
        "piece",
        "cnt",
        F.expr(
            f"CAST(FLOOR(ln(CAST(__tot AS DOUBLE)) * {LN_SCALE}) AS BIGINT)"
            f" - CAST(FLOOR(ln(CAST(cnt AS DOUBLE)) * {LN_SCALE}) AS BIGINT)"
        ).alias("cost_fp"),
    )


def viterbi_segment(
    words: DataFrame, costed_vocab: DataFrame, max_piece_len: int = 4
) -> DataFrame:
    """Best-path segmentation of every (word, cnt) row under
    ``costed_vocab`` (piece, cost_fp): returns (word, cnt, ps
    array<string>, cost_fp total int64). Ties break toward the
    SHORTEST final piece (the ·8+k encoding), deterministically."""
    _check(max_piece_len, 1)
    cand = _candidates(words, max_piece_len)
    joined = cand.join(
        F.broadcast(costed_vocab.select("piece", "cost_fp")), "piece", "left"
    )
    # collect_list skips nulls, so absent pieces simply miss the map
    # (the DP coalesces them to INF); empty maps keep the word row
    cm = joined.groupBy("word", "cnt").agg(
        F.map_from_entries(
            F.collect_list(
                F.when(
                    F.col("cost_fp").isNotNull(), F.struct("idx", "cost_fp")
                )
            )
        ).alias("cmap")
    )
    dp = cm.withColumn("dpenc", F.expr(_dp_fold(max_piece_len)))
    seg = dp.withColumn("bw", F.expr(_bw_fold()))
    return seg.select(
        "word",
        "cnt",
        F.expr("slice(bw, 2, size(bw))").alias("ps"),
        F.expr("element_at(dpenc, length(word) + 1) div 8").alias("cost_fp"),
    )


def unigram_train(
    docs: DataFrame,
    text_col: str = "text",
    max_piece_len: int = 4,
    max_word_len: int = 16,
    rounds: int = 2,
    seed_multi: int = 160,
    final_multi: int = 96,
) -> DataFrame:
    """Train the unigram-LM vocabulary (module docstring). Returns the
    final piece table, ordered: (piece, piece_len, cnt, cost_fp)."""
    from pasta_pipeline_spark.operators.bpe import word_freq_frame
    from pasta_pipeline_spark.operators.util import attach_cached_deps

    _check(max_piece_len, rounds)
    deps = []
    words = (
        word_freq_frame(docs, text_col=text_col)
        .select("word", F.col("cnt").cast("long").alias("cnt"))
        .where(
            (F.length("word") >= 1) & (F.length("word") <= max_word_len)
        )
        .persist()
    )
    deps.append(words)

    seed_counts = (
        _candidates(words, max_piece_len)
        .groupBy("piece")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    chars = seed_counts.where(F.length("piece") == 1)
    multi = (
        seed_counts.where(F.length("piece") >= 2)
        .orderBy(F.desc("cnt"), F.asc("piece"))
        .limit(seed_multi)
    )
    vocab = chars.unionByName(multi).persist()
    deps.append(vocab)

    for _ in range(rounds):
        seg = viterbi_segment(words, _with_costs(vocab), max_piece_len)
        new_counts = (
            seg.select("cnt", F.explode("ps").alias("piece"))
            .groupBy("piece")
            .agg(F.sum("cnt").cast("long").alias("ncnt"))
        )
        # chars survive with count floor 1 (coverage); multi-char
        # pieces survive only if some best path used them (hard-EM
        # pruning). The join keys on the PREVIOUS vocab, so no piece
        # outside it can enter (paths only emit vocab pieces anyway).
        vocab = (
            vocab.join(new_counts, "piece", "left")
            .select(
                "piece",
                F.when(
                    F.length("piece") == 1,
                    F.greatest(F.coalesce("ncnt", F.lit(0)), F.lit(1)),
                )
                .otherwise(F.col("ncnt"))
                .cast("long")
                .alias("cnt"),
            )
            .where(F.col("cnt").isNotNull())
            .persist()
        )
        deps.append(vocab)

    final = vocab.where(F.length("piece") == 1).unionByName(
        # same deterministic top-k shape as the seed (TakeOrdered on a
        # few-hundred-row frame)
        vocab.where(F.length("piece") >= 2)
        .orderBy(F.desc("cnt"), F.asc("piece"))
        .limit(final_multi)
    )
    out = (
        _with_costs(final.select("piece", "cnt"))
        .select(
            "piece",
            F.length("piece").cast("long").alias("piece_len"),
            "cnt",
            "cost_fp",
        )
        .orderBy("piece")
    )
    return attach_cached_deps(out, deps)


def unigram_fertility_vs_bpe(
    docs: DataFrame,
    text_col: str = "text",
    bpe_merges: int = 4,
    **train_kwargs,
) -> DataFrame:
    """One-row tokenizer comparison on the SAME corpus: pieces-per-word
    (fertility, Ács 2019's metric) for the trained unigram-LM
    vs the k-merge BPE state — lower fertility = fewer tokens for the
    same text. BPE side reuses the classic trainer's merge fold
    (operators/bpe.py bpe_learn_merges replay); both sides weight by
    word frequency and exclude words beyond ``max_word_len`` so the
    populations match. Columns: n_words, n_pieces_unigram,
    n_pieces_bpe, fert_unigram_sc, fert_bpe_sc (·1e6)."""
    from pasta_pipeline_spark.operators.bpe import (
        bpe_learn_merges,
        word_freq_frame,
    )
    from pasta_pipeline_spark.operators.util import attach_cached_deps

    max_word_len = train_kwargs.get("max_word_len", 16)
    max_piece_len = train_kwargs.get("max_piece_len", 4)
    vocab = unigram_train(docs, text_col=text_col, **train_kwargs)

    words = (
        word_freq_frame(docs, text_col=text_col)
        .where(
            (F.length("word") >= 1) & (F.length("word") <= max_word_len)
        )
        .select("word", F.col("cnt").cast("long").alias("cnt"), "toks")
        .persist()
    )
    seg = viterbi_segment(
        words.select("word", "cnt"),
        vocab.select("piece", "cost_fp"),
        max_piece_len,
    )
    uni = seg.agg(
        F.sum("cnt").cast("long").alias("n_words"),
        F.sum(F.col("cnt") * F.size("ps")).cast("long").alias("n_pieces_unigram"),
    )

    # BPE side: apply the learned merges to the word token frames via
    # the same greedy-LTR fold the trainer uses, then count tokens
    merges = [
        (r["a"], r["b"])
        for r in bpe_learn_merges(
            words.select("word", "cnt", "toks"), k=bpe_merges
        ).collect()  # k rows — bounded by merge count (the bpe.py precedent)
    ]
    cur = words.select("word", "cnt", "toks")
    from pasta_pipeline_spark.operators.bpe import _MERGE_FOLD

    for a, b in merges:
        cur = cur.withColumn("__a", F.lit(a)).withColumn("__b", F.lit(b))
        cur = cur.withColumn("toks", F.expr(_MERGE_FOLD)).select(
            "word", "cnt", "toks"
        )
    bpe = cur.agg(
        F.sum(F.col("cnt") * F.size("toks")).cast("long").alias("n_pieces_bpe")
    )
    out = uni.crossJoin(F.broadcast(bpe)).select(
        "n_words",
        "n_pieces_unigram",
        "n_pieces_bpe",
        F.expr("(n_pieces_unigram * 1000000) div n_words").alias("fert_unigram_sc"),
        F.expr("(n_pieces_bpe * 1000000) div n_words").alias("fert_bpe_sc"),
    )
    return attach_cached_deps(out, [words] + getattr(vocab, "_pasta_cached_deps", []))


# ---------------------------------------------------------------------------
# DuckDB oracles — the same recipe, CTE by CTE; fold bodies come from
# the shared builders above so the engines cannot drift
# ---------------------------------------------------------------------------


def _oracle_words_cte(table: str, max_word_len: int) -> str:
    return f"""
    WITH RECURSIVE w0 AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM (
        SELECT unnest(list_filter(regexp_split_to_array(lower(text),
                 '\\s+'), y -> y <> '')) AS word
        FROM {table}
      ) WHERE length(word) BETWEEN 1 AND {max_word_len}
      GROUP BY word
    )"""


def _oracle_viterbi_ctes(m: int, tag: str, cm: str) -> str:
    """The Viterbi DP + backwalk as RECURSIVE CTEs (``rec{tag}``,
    ``dpfin{tag}``, ``bw{tag}``) over the candidate-cost-map CTE
    ``cm``. ``bw{tag}`` yields one (word, cnt, pos, piece) row per
    chosen piece (piece NULL on the seed row).

    Why not the same fold as Spark: DuckDB 1.0's list_reduce misaligns
    CAPTURED OUTER COLUMNS across rows under multithreaded execution
    (reproduced: a word's backwalk read another word's string; results
    changed with SET threads). An unrolled lateral-alias chain is no
    better — each alias inlines its predecessors, so the expression
    tree grows exponentially. Recursion materializes every iteration:
    linear work, zero lambdas. The recurrence is Spark's exactly —
    b{{j}} carries best[pos−j], the ·8+k encoding keeps the tiebreak,
    and ``kseq`` records one backpointer digit per position
    (max_piece_len <= 7 guarantees single digits)."""
    terms = ", ".join(
        f"CASE WHEN b{k - 1} IS NULL THEN {INF2} ELSE"
        f" (b{k - 1} + coalesce(element_at(cmap, pos * {m} + {k})[1],"
        f" {INF})) * 8 + {k} END"
        for k in range(1, m + 1)
    )
    return f""", rec{tag}(word, cnt, pos, b0, b1, b2, b3, kseq) AS (
      SELECT word, cnt, 0, CAST(0 AS BIGINT), CAST(NULL AS BIGINT),
             CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), ''
      FROM {cm}
      UNION ALL
      SELECT word, cnt, pos + 1,
             least({terms}) // 8,
             b0, b1, b2,
             kseq || CAST(least({terms}) % 8 AS VARCHAR)
      FROM (SELECT r.word, r.cnt, r.pos, r.b0, r.b1, r.b2, r.b3,
                   r.kseq, c.cmap
            FROM rec{tag} r JOIN {cm} c USING (word)
            WHERE r.pos < length(r.word))
    ), dpfin{tag} AS MATERIALIZED (
      SELECT word, cnt, b0 AS cost_fp, kseq
      FROM rec{tag} WHERE pos = length(word)
    ), bw{tag}(word, cnt, pos, piece) AS (
      SELECT word, cnt, CAST(length(word) AS INTEGER),
             CAST(NULL AS VARCHAR)
      FROM dpfin{tag}
      UNION ALL
      SELECT word, cnt, pos - k, substring(word, pos - k + 1, k)
      FROM (SELECT b.word, b.cnt, b.pos,
                   CAST(substring(d.kseq, b.pos, 1) AS INTEGER) AS k
            FROM bw{tag} b JOIN dpfin{tag} d USING (word)
            WHERE b.pos > 0)
    )"""


def _oracle_em_chain(
    max_piece_len: int,
    rounds: int,
    seed_multi: int,
    max_word_len: int = 16,
) -> str:
    """CTE chain from w0 to v{rounds} (the post-EM vocabulary)."""
    m = max_piece_len
    sql = [
        f""", cand AS MATERIALIZED (
      SELECT word, cnt, (i - 1) * {m} + k AS idx,
             substring(word, i - k + 1, k) AS piece
      FROM w0,
           unnest(range(1, length(word) + 1)) AS t1(i),
           unnest(range(1, least({m}, i) + 1)) AS t2(k)
    ), sc AS MATERIALIZED (
      SELECT piece, CAST(SUM(cnt) AS BIGINT) AS cnt FROM cand GROUP BY piece
    ), v0 AS MATERIALIZED (
      SELECT piece, cnt FROM sc WHERE length(piece) = 1
      UNION ALL
      SELECT piece, cnt FROM (
        SELECT piece, cnt FROM sc WHERE length(piece) >= 2
        ORDER BY cnt DESC, piece ASC LIMIT {seed_multi})
    )"""
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        sql.append(
            f""", tot{r} AS (SELECT CAST(SUM(cnt) AS BIGINT) AS t FROM v{p}),
    cv{r} AS (
      SELECT piece,
             CAST(FLOOR(ln(CAST(t AS DOUBLE)) * {LN_SCALE}) AS BIGINT)
             - CAST(FLOOR(ln(CAST(cnt AS DOUBLE)) * {LN_SCALE}) AS BIGINT)
               AS cost_fp
      FROM v{p} CROSS JOIN tot{r}
    ), cm{r} AS MATERIALIZED (
      SELECT word, cnt,
             map_from_entries(list({{'k': idx, 'v': cost_fp}})
               FILTER (cost_fp IS NOT NULL)) AS cmap
      FROM cand LEFT JOIN cv{r} USING (piece)
      GROUP BY word, cnt
    ){_oracle_viterbi_ctes(m, str(r), f"cm{r}")}, nc{r} AS MATERIALIZED (
      SELECT piece, CAST(SUM(cnt) AS BIGINT) AS ncnt
      FROM bw{r} WHERE piece IS NOT NULL GROUP BY piece
    ), v{r} AS MATERIALIZED (
      SELECT piece,
             CAST(CASE WHEN length(piece) = 1
                  THEN greatest(coalesce(ncnt, 0), 1)
                  ELSE ncnt END AS BIGINT) AS cnt
      FROM v{p} LEFT JOIN nc{r} USING (piece)
      WHERE length(piece) = 1 OR ncnt IS NOT NULL
    )"""
        )
    return "".join(sql)


def _oracle_final_cte(rounds: int, final_multi: int) -> str:
    return f""", fin AS MATERIALIZED (
      SELECT piece, cnt FROM v{rounds} WHERE length(piece) = 1
      UNION ALL
      SELECT piece, cnt FROM (
        SELECT piece, cnt FROM v{rounds} WHERE length(piece) >= 2
        ORDER BY cnt DESC, piece ASC LIMIT {final_multi})
    ), ftot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS t FROM fin)"""


def unigram_vocab_oracle_sql(
    table: str = "documents",
    max_piece_len: int = 4,
    max_word_len: int = 16,
    rounds: int = 2,
    seed_multi: int = 160,
    final_multi: int = 96,
) -> str:
    """DuckDB twin of :func:`unigram_train`."""
    return (
        _oracle_words_cte(table, max_word_len)
        + _oracle_em_chain(max_piece_len, rounds, seed_multi, max_word_len)
        + _oracle_final_cte(rounds, final_multi)
        + f"""
    SELECT piece, CAST(length(piece) AS BIGINT) AS piece_len, cnt,
           CAST(FLOOR(ln(CAST(t AS DOUBLE)) * {LN_SCALE}) AS BIGINT)
           - CAST(FLOOR(ln(CAST(cnt AS DOUBLE)) * {LN_SCALE}) AS BIGINT)
             AS cost_fp
    FROM fin CROSS JOIN ftot
    ORDER BY piece"""
    )


def unigram_fertility_oracle_sql(
    table: str = "documents",
    bpe_merges: int = 4,
    max_piece_len: int = 4,
    max_word_len: int = 16,
    rounds: int = 2,
    seed_multi: int = 160,
    final_multi: int = 96,
) -> str:
    """DuckDB twin of :func:`unigram_fertility_vs_bpe`: one more
    Viterbi pass under the FINAL vocabulary for the unigram token
    count, plus the k-merge BPE chain (operators/bpe.py
    _bpe_cte_chain, filtered to the same word population)."""
    from pasta_pipeline_spark.operators.bpe import _bpe_cte_chain

    m = max_piece_len
    bpe_chain = _bpe_cte_chain(
        table, bpe_merges,
        word_filter_sql=f"length(word) BETWEEN 1 AND {max_word_len}",
    )
    # splice: the BPE chain opens the WITH clause (its own w0 is the
    # same filtered word frame the unigram side uses); the Viterbi
    # CTEs are recursive, so the clause must open WITH RECURSIVE
    return (
        bpe_chain.replace("WITH w0 AS", "WITH RECURSIVE w0 AS", 1)
        + _oracle_em_chain(m, rounds, seed_multi, max_word_len).replace(
            "FROM w0,", "FROM (SELECT word, cnt FROM w0),", 1
        )
        + _oracle_final_cte(rounds, final_multi)
        + f""", cvf AS (
      SELECT piece,
             CAST(FLOOR(ln(CAST(t AS DOUBLE)) * {LN_SCALE}) AS BIGINT)
             - CAST(FLOOR(ln(CAST(cnt AS DOUBLE)) * {LN_SCALE}) AS BIGINT)
               AS cost_fp
      FROM fin CROSS JOIN ftot
    ), cmf AS MATERIALIZED (
      SELECT word, cnt,
             map_from_entries(list({{'k': idx, 'v': cost_fp}})
               FILTER (cost_fp IS NOT NULL)) AS cmap
      FROM cand LEFT JOIN cvf USING (piece)
      GROUP BY word, cnt
    ){_oracle_viterbi_ctes(m, "f", "cmf")}, uni AS (
      SELECT
        (SELECT CAST(SUM(cnt) AS BIGINT) FROM dpfinf) AS n_words,
        (SELECT CAST(SUM(cnt) AS BIGINT) FROM bwf
          WHERE piece IS NOT NULL) AS n_pieces_unigram
    ), bpe AS (
      SELECT CAST(SUM(cnt * len(toks)) AS BIGINT) AS n_pieces_bpe
      FROM w{bpe_merges}
    )
    SELECT n_words, n_pieces_unigram, n_pieces_bpe,
           (n_pieces_unigram * 1000000) // n_words AS fert_unigram_sc,
           (n_pieces_bpe * 1000000) // n_words AS fert_bpe_sc
    FROM uni CROSS JOIN bpe"""
    )


def apply_unigram(
    docs: DataFrame,
    costed_vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_piece_len: int = 4,
    max_word_len: int = 16,
) -> DataFrame:
    """Replay the trained tokenizer over DOCUMENTS (the inference
    path — train and apply share :func:`viterbi_segment`, so they
    cannot diverge, the ``apply_bpe`` discipline): per document,
    token/piece totals and the corpus-model NLL.

    Returns one row per document: (id, n_words, n_pieces, nll_fp) —
    ``nll_fp`` is the summed fixed-point path cost (−ln p at 1e9), a
    document-quality signal under the trained LM (the unigram-LM
    analog of perplexity filtering). Words beyond ``max_word_len``
    are excluded, matching training.

    Scale shape: the expensive Viterbi runs ONCE per distinct word
    (vocabulary-scale); documents join their words back against that
    segmented table — the corpus-scale stage is an explode + one
    hash join + one groupBy, all broadcast-eligible on the word side
    for realistic vocabularies.
    """
    from pasta_pipeline_spark.functions.text import tokenize_ws
    from pasta_pipeline_spark.operators.util import attach_cached_deps

    doc_words = docs.select(
        F.col(id_col), F.explode(tokenize_ws(F.col(text_col))).alias("word")
    ).where(
        (F.length("word") >= 1) & (F.length("word") <= max_word_len)
    )
    distinct_words = doc_words.select("word").distinct().withColumn(
        "cnt", F.lit(1).cast("long")
    )
    seg = viterbi_segment(distinct_words, costed_vocab, max_piece_len).select(
        "word",
        F.size("ps").cast("long").alias("w_pieces"),
        F.col("cost_fp").alias("w_nll_fp"),
    ).persist()
    out = (
        doc_words.join(seg, "word")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("w_pieces").cast("long").alias("n_pieces"),
            F.sum("w_nll_fp").cast("long").alias("nll_fp"),
        )
    )
    return attach_cached_deps(out, [seg])


def unigram_doc_nll_oracle_sql(
    table: str = "documents",
    id_sql: str = "doc_id",
    max_piece_len: int = 4,
    max_word_len: int = 16,
    rounds: int = 2,
    seed_multi: int = 160,
    final_multi: int = 96,
) -> str:
    """DuckDB twin of train-then-:func:`apply_unigram`: the training
    chain, a final Viterbi pass over the distinct corpus words under
    the final vocabulary, then the per-document joinback."""
    m = max_piece_len
    return (
        _oracle_words_cte(table, max_word_len)
        + _oracle_em_chain(m, rounds, seed_multi, max_word_len)
        + _oracle_final_cte(rounds, final_multi)
        + f""", cvf AS (
      SELECT piece,
             CAST(FLOOR(ln(CAST(t AS DOUBLE)) * {LN_SCALE}) AS BIGINT)
             - CAST(FLOOR(ln(CAST(cnt AS DOUBLE)) * {LN_SCALE}) AS BIGINT)
               AS cost_fp
      FROM fin CROSS JOIN ftot
    ), cmf AS MATERIALIZED (
      SELECT word, cnt,
             map_from_entries(list({{'k': idx, 'v': cost_fp}})
               FILTER (cost_fp IS NOT NULL)) AS cmap
      FROM cand LEFT JOIN cvf USING (piece)
      GROUP BY word, cnt
    ){_oracle_viterbi_ctes(m, "f", "cmf")}, wseg AS MATERIALIZED (
      SELECT d.word, b.w_pieces, d.cost_fp AS w_nll_fp
      FROM dpfinf d JOIN (
        SELECT word, CAST(COUNT(*) AS BIGINT) AS w_pieces
        FROM bwf WHERE piece IS NOT NULL GROUP BY word
      ) b USING (word)
    ), dw AS (
      SELECT {id_sql} AS doc_id, word
      FROM (
        SELECT {id_sql},
               unnest(list_filter(regexp_split_to_array(lower(text),
                 '\\s+'), y -> y <> '')) AS word
        FROM {table}
      ) WHERE length(word) BETWEEN 1 AND {max_word_len}
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(w_pieces) AS BIGINT) AS n_pieces,
           CAST(SUM(w_nll_fp) AS BIGINT) AS nll_fp
    FROM dw JOIN wseg USING (word)
    GROUP BY doc_id"""
    )


def unigram_em_curve(
    docs: DataFrame,
    text_col: str = "text",
    max_piece_len: int = 4,
    max_word_len: int = 16,
    rounds: int = 2,
    seed_multi: int = 160,
    final_multi: int = 96,
) -> DataFrame:
    """EM convergence curve — training observability for the unigram
    trainer: one row per E-step (em_round 1..rounds, each segmenting
    under the PREVIOUS round's vocabulary/costs) plus a final row
    (em_round rounds+1) under the pruned final vocabulary.

    Columns: em_round, vocab_size (pieces the segmentation could use),
    total_pieces (corpus-weighted), total_nll_fp (corpus-weighted sum
    of chosen path costs at the round's own cost scale). Reviewers
    read piece totals falling as multi-char pieces win Viterbi races
    and the NLL trajectory for convergence/pruning regressions — the
    loss-curve the trainer itself would otherwise not expose.

    Same scale shape as :func:`unigram_train` (vocabulary-scale after
    one corpus scan); the per-round totals are 1-row aggregates.
    """
    from pasta_pipeline_spark.operators.bpe import word_freq_frame
    from pasta_pipeline_spark.operators.util import attach_cached_deps

    _check(max_piece_len, rounds)
    deps = []
    words = (
        word_freq_frame(docs, text_col=text_col)
        .select("word", F.col("cnt").cast("long").alias("cnt"))
        .where(
            (F.length("word") >= 1) & (F.length("word") <= max_word_len)
        )
        .persist()
    )
    deps.append(words)
    seed_counts = (
        _candidates(words, max_piece_len)
        .groupBy("piece")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    chars = seed_counts.where(F.length("piece") == 1)
    multi = (
        seed_counts.where(F.length("piece") >= 2)
        .orderBy(F.desc("cnt"), F.asc("piece"))
        .limit(seed_multi)
    )
    vocab = chars.unionByName(multi).persist()
    deps.append(vocab)

    def totals(seg: DataFrame, vocab_df: DataFrame, em_round: int) -> DataFrame:
        vs = vocab_df.agg(F.count(F.lit(1)).cast("long").alias("vocab_size"))
        t = seg.agg(
            F.sum(F.col("cnt") * F.size("ps")).cast("long").alias("total_pieces"),
            F.sum(F.col("cnt") * F.col("cost_fp")).cast("long").alias("total_nll_fp"),
        )
        return (
            t.crossJoin(F.broadcast(vs))  # 1-row x 1-row
            .select(
                F.lit(em_round).cast("long").alias("em_round"),
                "vocab_size",
                "total_pieces",
                "total_nll_fp",
            )
        )

    curve = []
    for r in range(1, rounds + 1):
        seg = viterbi_segment(words, _with_costs(vocab), max_piece_len)
        curve.append(totals(seg, vocab, r))
        new_counts = (
            seg.select("cnt", F.explode("ps").alias("piece"))
            .groupBy("piece")
            .agg(F.sum("cnt").cast("long").alias("ncnt"))
        )
        vocab = (
            vocab.join(new_counts, "piece", "left")
            .select(
                "piece",
                F.when(
                    F.length("piece") == 1,
                    F.greatest(F.coalesce("ncnt", F.lit(0)), F.lit(1)),
                )
                .otherwise(F.col("ncnt"))
                .cast("long")
                .alias("cnt"),
            )
            .where(F.col("cnt").isNotNull())
            .persist()
        )
        deps.append(vocab)

    final = vocab.where(F.length("piece") == 1).unionByName(
        vocab.where(F.length("piece") >= 2)
        .orderBy(F.desc("cnt"), F.asc("piece"))
        .limit(final_multi)
    ).persist()
    deps.append(final)
    seg_f = viterbi_segment(words, _with_costs(final), max_piece_len)
    curve.append(totals(seg_f, final, rounds + 1))

    out = curve[0]
    for c in curve[1:]:
        out = out.unionByName(c)
    return attach_cached_deps(out.orderBy("em_round"), deps)


def unigram_em_curve_oracle_sql(
    table: str = "documents",
    max_piece_len: int = 4,
    max_word_len: int = 16,
    rounds: int = 2,
    seed_multi: int = 160,
    final_multi: int = 96,
) -> str:
    """DuckDB twin of :func:`unigram_em_curve` — per-round totals read
    straight off the training chain's dpfin/bw CTEs, plus the final
    pass reused from the doc-NLL oracle machinery."""
    m = max_piece_len
    selects = []
    for r in range(1, rounds + 1):
        selects.append(f"""
    SELECT CAST({r} AS BIGINT) AS em_round,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM v{r - 1}) AS vocab_size,
           (SELECT CAST(SUM(cnt) AS BIGINT) FROM bw{r}
             WHERE piece IS NOT NULL) AS total_pieces,
           (SELECT CAST(SUM(cnt * cost_fp) AS BIGINT) FROM dpfin{r})
             AS total_nll_fp""")
    selects.append(f"""
    SELECT CAST({rounds + 1} AS BIGINT) AS em_round,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM fin) AS vocab_size,
           (SELECT CAST(SUM(cnt) AS BIGINT) FROM bwf
             WHERE piece IS NOT NULL) AS total_pieces,
           (SELECT CAST(SUM(cnt * cost_fp) AS BIGINT) FROM dpfinf)
             AS total_nll_fp""")
    return (
        _oracle_words_cte(table, max_word_len)
        + _oracle_em_chain(m, rounds, seed_multi, max_word_len)
        + _oracle_final_cte(rounds, final_multi)
        + f""", cvf AS (
      SELECT piece,
             CAST(FLOOR(ln(CAST(t AS DOUBLE)) * {LN_SCALE}) AS BIGINT)
             - CAST(FLOOR(ln(CAST(cnt AS DOUBLE)) * {LN_SCALE}) AS BIGINT)
               AS cost_fp
      FROM fin CROSS JOIN ftot
    ), cmf AS MATERIALIZED (
      SELECT word, cnt,
             map_from_entries(list({{'k': idx, 'v': cost_fp}})
               FILTER (cost_fp IS NOT NULL)) AS cmap
      FROM cand LEFT JOIN cvf USING (piece)
      GROUP BY word, cnt
    ){_oracle_viterbi_ctes(m, "f", "cmf")}
    {" UNION ALL ".join(selects)}
    ORDER BY em_round"""
    )
