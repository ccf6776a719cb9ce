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


def test_bigram_nll_cross_fit_discrimination(spark):
    """Reference-model bigram scoring: text conforming to the model's
    transitions scores lower than same-vocabulary text with shuffled
    transitions; OOV openers are counted and excluded from the mean;
    sub-2-token docs are excluded; an all-OOV doc reports NULL nll."""
    from pasta_pipeline_spark.operators.text_analysis import bigram_nll

    model = spark.createDataFrame(
        [(i, "the cat sat on the mat and the dog ran to the door")
         for i in range(20)],
        "doc_id long, text string",
    )
    score = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the door sat to the cat on mat"),
            (3, "xylophone qubit zonk plinth"),
            (4, "solo"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in bigram_nll(score, model_docs=model).collect()}
    assert out[1]["nll2_fp"] < out[2]["nll2_fp"]
    assert out[1]["n_oov_openers"] == 0
    assert out[3]["n_oov_openers"] == 3 and out[3]["nll2_fp"] is None
    assert 4 not in out

    # self-fit mode still runs and scores every >=2-token doc
    self_out = bigram_nll(score).collect()
    assert {r["doc_id"] for r in self_out} == {1, 2, 3}
    assert all(r["nll2_fp"] is not None for r in self_out)
