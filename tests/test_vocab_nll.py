"""Vocabulary build + unigram-NLL quality proxy."""

from __future__ import annotations

import math

from pasta_pipeline_spark.operators.text_analysis import build_vocab, unigram_nll


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_build_vocab_counts_ids_and_tiebreak(spark):
    docs = _docs(
        spark,
        [(1, "b a a"), (2, "a b c"), (3, "A")],  # a:4 (3 docs), b:2 (2), c:1 (1)
    )
    rows = build_vocab(docs, top_n=2).orderBy("token_id").collect()
    assert [(r["token_id"], r["token"], r["n_occurrences"], r["n_docs"]) for r in rows] == [
        (1, "a", 4, 3),
        (2, "b", 2, 2),
    ]


def test_build_vocab_ties_break_alphabetically(spark):
    docs = _docs(spark, [(1, "z y z y x")])
    rows = build_vocab(docs, top_n=3).orderBy("token_id").collect()
    assert [r["token"] for r in rows] == ["y", "z", "x"]


def test_unigram_nll_matches_python_model(spark):
    texts = {1: "a a b", 2: "c b a", 3: "a a a"}
    docs = _docs(spark, list(texts.items()))
    # fit the same unigram model in plain Python
    corpus = " ".join(texts.values()).split()
    cnt = {t: corpus.count(t) for t in set(corpus)}
    T = len(corpus)
    scale = 1_000_000_000
    lnfp = lambda x: math.floor(math.log(x) * scale)
    expected = {
        d: (len(toks := texts[d].split()) * lnfp(T) - sum(lnfp(cnt[t]) for t in toks))
        // len(toks)
        for d in texts
    }
    got = {r["doc_id"]: r["nll_fp"] for r in unigram_nll(docs).collect()}
    assert got == expected
    # rare-token doc scores strictly higher than the repetitive one
    assert got[2] > got[3]


def test_unigram_nll_excludes_empty_docs(spark):
    docs = _docs(spark, [(1, "a b"), (2, "   "), (3, None)])
    assert [r["doc_id"] for r in unigram_nll(docs).collect()] == [1]
