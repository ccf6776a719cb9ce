"""Unigram-LM trainer (operators/unigram_lm.py, Kudo 2018 Viterbi-EM):
differential vs a pure-Python reference (the operators/bpe.py test
pattern), Viterbi contract units, and the fertility comparison."""

from __future__ import annotations

import math
from collections import Counter

from pyspark.sql import functions as F

from pasta_pipeline_spark.operators.unigram_lm import (
    INF,
    INF2,
    LN_SCALE,
    unigram_fertility_vs_bpe,
    unigram_train,
    viterbi_segment,
)


# -- pure-Python reference: the same Viterbi-EM, written independently
#    with dicts and loops ------------------------------------------------


def _ref_viterbi(word: str, cost: dict[str, int], m: int) -> tuple[list[str], int]:
    n = len(word)
    best = [0] * (n + 1)
    back = [0] * (n + 1)
    for i in range(1, n + 1):
        encs = []
        for k in range(1, m + 1):
            if k <= i:
                c = cost.get(word[i - k : i], INF)
                encs.append((best[i - k] + c) * 8 + k)
            else:
                encs.append(INF2)
        e = min(encs)
        best[i], back[i] = e // 8, e % 8
    ps, pos = [], n
    while pos > 0:
        k = back[pos]
        ps.insert(0, word[pos - k : pos])
        pos -= k
    return ps, best[n]


def _ref_train(
    word_freqs: dict[str, int],
    m: int,
    rounds: int,
    seed_multi: int,
    final_multi: int,
):
    def lnfp(x: int) -> int:
        return math.floor(math.log(x) * LN_SCALE)

    def costs(vocab: dict[str, int]) -> dict[str, int]:
        base = lnfp(sum(vocab.values()))
        return {p: base - lnfp(c) for p, c in vocab.items()}

    sc = Counter()
    for w, f in word_freqs.items():
        for i in range(1, len(w) + 1):
            for k in range(1, min(m, i) + 1):
                sc[w[i - k : i]] += f
    vocab = {p: c for p, c in sc.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in sc.items() if len(p) >= 2),
        key=lambda t: (-t[1], t[0]),
    )[:seed_multi]
    vocab.update(dict(multi))

    for _ in range(rounds):
        cost = costs(vocab)
        nc = Counter()
        for w, f in word_freqs.items():
            for p in _ref_viterbi(w, cost, m)[0]:
                nc[p] += f
        nxt = {}
        for p in vocab:
            if len(p) == 1:
                nxt[p] = max(nc.get(p, 0), 1)
            elif nc.get(p, 0) > 0:
                nxt[p] = nc[p]
        vocab = nxt

    fin = {p: c for p, c in vocab.items() if len(p) == 1}
    fin.update(
        dict(
            sorted(
                ((p, c) for p, c in vocab.items() if len(p) >= 2),
                key=lambda t: (-t[1], t[0]),
            )[:final_multi]
        )
    )
    cost = costs(fin)
    return sorted(
        (p, len(p), c, cost[p]) for p, c in fin.items()
    )


def _word_freqs(texts: list[str], max_word_len: int = 16) -> dict[str, int]:
    c = Counter()
    for t in texts:
        for w in t.lower().split():
            if 1 <= len(w) <= max_word_len:
                c[w] += 1
    return dict(c)


TEXTS = [
    "the cat sat on the mat",
    "the cats sat on mats",
    "a cat likes the mat",
    "concatenation catastrophe",
    "aaaa bbbb aaaabbbb abab",
]


def test_unigram_train_matches_python_reference(spark):
    docs = spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id long, text string"
    )
    kw = dict(max_piece_len=4, max_word_len=16, rounds=2, seed_multi=10, final_multi=6)
    got = sorted(tuple(r) for r in unigram_train(docs, **kw).collect())
    want = _ref_train(_word_freqs(TEXTS), 4, 2, 10, 6)
    assert got == want
    # coverage: every corpus character survives training
    chars = {p for p, ln, c, f in got if ln == 1}
    assert chars == {ch for w in _word_freqs(TEXTS) for ch in w}


def test_viterbi_prefers_cheap_long_pieces(spark):
    words = spark.createDataFrame([("hello", 1)], "word string, cnt long")
    vocab = spark.createDataFrame(
        [("h", 50), ("e", 40), ("l", 30), ("o", 45), ("he", 35), ("ll", 25), ("lo", 20)],
        "piece string, cost_fp long",
    )
    r = viterbi_segment(words, vocab).collect()[0]
    assert list(r["ps"]) == ["he", "l", "lo"]
    assert r["cost_fp"] == 35 + 30 + 20
    ref_ps, ref_cost = _ref_viterbi(
        "hello", {p: c for p, c in [("h", 50), ("e", 40), ("l", 30), ("o", 45), ("he", 35), ("ll", 25), ("lo", 20)]}, 4
    )
    assert (list(r["ps"]), r["cost_fp"]) == (ref_ps, ref_cost)


def test_viterbi_tiebreak_shortest_piece(spark):
    # "ab" as [a, b] (cost 10+10) vs ["ab"] (cost 20): equal total —
    # the 8k encoding breaks toward the SHORTER final piece (k=1),
    # same in the reference
    words = spark.createDataFrame([("ab", 1)], "word string, cnt long")
    vocab = spark.createDataFrame(
        [("a", 10), ("b", 10), ("ab", 20)], "piece string, cost_fp long"
    )
    r = viterbi_segment(words, vocab).collect()[0]
    ref_ps, _ = _ref_viterbi("ab", {"a": 10, "b": 10, "ab": 20}, 4)
    assert list(r["ps"]) == ref_ps == ["a", "b"]


def test_fertility_unigram_beats_chars(spark):
    docs = spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id long, text string"
    )
    row = unigram_fertility_vs_bpe(
        docs, bpe_merges=3, max_piece_len=4, max_word_len=16,
        rounds=2, seed_multi=10, final_multi=6,
    ).collect()[0]
    assert row["n_words"] == sum(_word_freqs(TEXTS).values())
    # multi-char pieces exist, so fertility < chars-per-word
    n_chars = sum(len(w) * f for w, f in _word_freqs(TEXTS).items())
    assert row["n_pieces_unigram"] < n_chars
    assert row["fert_unigram_sc"] == row["n_pieces_unigram"] * 1_000_000 // row["n_words"]
    # both tokenizers emit at least one piece per word
    assert row["n_pieces_unigram"] >= row["n_words"]
    assert row["n_pieces_bpe"] >= row["n_words"]


def test_em_prunes_unused_multi_pieces(spark):
    # a multi piece seeded only because it is a substring of a rare
    # word disappears after EM if no best path uses it; chars never do
    docs = spark.createDataFrame(
        [(1, "zzzz zzzz zzzz q")], "doc_id long, text string"
    )
    got = unigram_train(
        docs, max_piece_len=4, rounds=2, seed_multi=8, final_multi=8
    ).collect()
    pieces = {r["piece"] for r in got}
    assert "q" in pieces and "z" in pieces
    # 'zzzz' dominates; shorter z-runs that lose every Viterbi race
    # must have been pruned by the EM recount
    assert "zzzz" in pieces
    multi = [p for p in pieces if len(p) >= 2]
    assert multi == ["zzzz"]


def test_apply_unigram_doc_totals(spark):
    """apply_unigram (the inference replay): per-doc word/piece totals
    are consistent with a hand segmentation, and nll is the exact sum
    of the chosen path costs."""
    from pasta_pipeline_spark.operators.unigram_lm import apply_unigram

    docs = spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id long, text string"
    )
    vocab = unigram_train(
        docs, max_piece_len=4, max_word_len=16, rounds=2,
        seed_multi=10, final_multi=6,
    )
    out = {
        r["doc_id"]: (r["n_words"], r["n_pieces"], r["nll_fp"])
        for r in apply_unigram(docs, vocab.select("piece", "cost_fp")).collect()
    }
    assert set(out) == set(range(len(TEXTS)))
    # reference replay with the trained vocab's costs
    cost = {
        r["piece"]: r["cost_fp"]
        for r in vocab.collect()
    }
    for i, text in enumerate(TEXTS):
        words = [w for w in text.lower().split() if 1 <= len(w) <= 16]
        pieces = nll = 0
        for w in words:
            ps, c = _ref_viterbi(w, cost, 4)
            pieces += len(ps)
            nll += c
        assert out[i] == (len(words), pieces, nll), text


def test_em_curve_invariants(spark):
    """Structural invariants of the convergence curve: one row per
    E-step plus the final pass; vocab never grows after pruning starts;
    piece totals never undershoot the word count; the final NLL (under
    the pruned vocab's own costs) does not explode vs round 1."""
    from pasta_pipeline_spark.operators.unigram_lm import unigram_em_curve

    docs = spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id long, text string"
    )
    rows = unigram_em_curve(
        docs, max_piece_len=4, max_word_len=16, rounds=2,
        seed_multi=10, final_multi=6,
    ).collect()
    assert [r["em_round"] for r in rows] == [1, 2, 3]
    vocab_sizes = [r["vocab_size"] for r in rows]
    assert vocab_sizes[0] >= vocab_sizes[1] >= vocab_sizes[2]  # pruning
    n_words = sum(_word_freqs(TEXTS).values())
    for r in rows:
        assert r["total_pieces"] >= n_words  # >= one piece per word
        assert r["total_nll_fp"] > 0
    # hard-EM refits: round-2 NLL (under the refit costs) improves on
    # the seed-cost round
    assert rows[1]["total_nll_fp"] <= rows[0]["total_nll_fp"]
