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
