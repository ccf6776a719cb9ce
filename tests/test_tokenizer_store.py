"""Tokenizer-artifact persistence round-trip (r9 verdict ask #5):
save → load → apply must equal in-session apply, bit for bit, for
both trainers — a real pipeline trains once and applies for months
from stored state, so the persistence boundary must be lossless."""

from __future__ import annotations


def _docs(spark):
    rows = [
        (1, "low lower lowest newer new news"),
        (2, "the newest newt knew new lore"),
        (3, "lower lore low slow slower news"),
        (4, "knew newer newt the news new"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bpe_merges_roundtrip_and_apply_equivalence(spark, tmp_path):
    from pasta_pipeline_spark.operators.bpe import apply_bpe, learn_bpe_merges
    from pasta_pipeline_spark.operators.tokenizer_store import (
        load_bpe_merges,
        save_bpe_merges,
    )

    docs = _docs(spark)
    merges = learn_bpe_merges(docs, n_merges=6)
    assert merges, "trainer produced no merges"

    path = str(tmp_path / "bpe_merges")
    save_bpe_merges(spark, path, merges)
    loaded = load_bpe_merges(spark, path)
    assert loaded == [(int(r), l, rt) for r, l, rt in merges]

    in_session = sorted(map(tuple, apply_bpe(docs, merges).collect()))
    from_store = sorted(map(tuple, apply_bpe(docs, loaded).collect()))
    assert from_store == in_session


def test_bpe_store_versioning_keeps_predecessor(spark, tmp_path):
    """Retraining overwrites the live snapshot but the predecessor
    stays time-travel-readable (TableStore contract) — a serving job
    pinned to the validated version keeps working mid-retrain."""
    from pasta_pipeline_spark.operators.tokenizer_store import (
        load_bpe_merges,
        save_bpe_merges,
    )
    from pasta_pipeline_spark.sources.tables import TableStore

    path = str(tmp_path / "bpe_merges")
    save_bpe_merges(spark, path, [(0, "a", "b")])
    store = TableStore(spark, path)
    v1 = store.current_version()
    save_bpe_merges(spark, path, [(0, "a", "b"), (1, "ab", "c")])
    assert len(load_bpe_merges(spark, path)) == 2
    old = store.read(version=v1).collect()
    assert len(old) == 1 and old[0]["left"] == "a"


def test_unigram_vocab_roundtrip_and_apply_equivalence(spark, tmp_path):
    from pasta_pipeline_spark.operators.tokenizer_store import (
        load_unigram_vocab,
        load_unigram_vocab_full,
        save_unigram_vocab,
    )
    from pasta_pipeline_spark.operators.unigram_lm import (
        apply_unigram,
        unigram_train,
    )

    docs = _docs(spark)
    vocab = unigram_train(docs, rounds=1, seed_multi=40, final_multi=24)
    path = str(tmp_path / "unigram_vocab")
    save_unigram_vocab(spark, path, vocab)

    stored = sorted(map(tuple, load_unigram_vocab_full(spark, path).collect()))
    assert stored == sorted(map(tuple, vocab.collect()))

    in_session = sorted(
        map(tuple, apply_unigram(docs, vocab.select("piece", "cost_fp")).collect())
    )
    from_store = sorted(
        map(tuple, apply_unigram(docs, load_unigram_vocab(spark, path)).collect())
    )
    assert from_store == in_session
    assert in_session, "apply produced no rows"
