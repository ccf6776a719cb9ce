"""Catalog tier: wave 30 (r11).

Registration stays APPEND-ONLY: this module is imported LAST by the
package __init__, so the driver's correctness window over the earlier
325 queries is byte-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pasta_pipeline_spark.queries.catalog._core import _t, register

from pasta_pipeline_spark.operators.unigram_lm import (  # noqa: E402
    unigram_doc_nll_oracle_sql,
)

# ---------------------------------------------------------------------------
# Wave 30 (r11): the tokenizer PERSISTENCE boundary under the driver
# gate (r10 verdict ask #5) — save/load round-trips were pytest-only;
# no catalog plan read STORED tokenizer state, so the oracle gate
# never touched the persistence path.
# ---------------------------------------------------------------------------


@register(
    "unigram_doc_nll_stored",
    unigram_doc_nll_oracle_sql("documents"),
    doc="apply_unigram over a TableStore-PERSISTED vocabulary: the "
    "trained unigram-LM piece table is saved as a versioned snapshot "
    "(operators/tokenizer_store.py save_unigram_vocab) and the "
    "returned plan applies the LOADED snapshot — its Viterbi join "
    "broadcasts the STORED parquet scan, not training lineage, so the "
    "driver gate exercises the exact train-once/apply-for-months "
    "boundary a production tokenizer lives behind. Same output "
    "contract and oracle as unigram_doc_nll (store->load->apply is "
    "bit-identical to in-session apply, tests/test_tokenizer_store.py).",
)
def q_unigram_doc_nll_stored(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from pasta_pipeline_spark.operators.tokenizer_store import (
        load_unigram_vocab,
        save_unigram_vocab,
    )
    from pasta_pipeline_spark.operators.unigram_lm import (
        apply_unigram,
        unigram_train,
    )

    docs = _t(spark, sf_dir, "documents")
    # fresh per-invocation snapshot dir: the save is the point of the
    # query (eager, vocabulary-scale — a few hundred rows), and a
    # unique path keeps repeated/concurrent invocations independent
    path = tempfile.mkdtemp(prefix="pasta_unigram_store_")
    save_unigram_vocab(spark, path, unigram_train(docs))
    return apply_unigram(docs, load_unigram_vocab(spark, path))
