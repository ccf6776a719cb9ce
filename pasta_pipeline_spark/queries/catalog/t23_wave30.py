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
    "bit-identical to in-session apply, tests/test_tokenizer_store.py). "
    "NOTE: unlike every other catalog entry, plan CONSTRUCTION is "
    "eager here — the vocabulary snapshot (a few hundred rows) is "
    "trained and saved at build time; that save IS the persistence "
    "boundary under test.",
)
def q_unigram_doc_nll_stored(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.tokenizer_store import (
        load_unigram_vocab,
        save_unigram_vocab,
    )
    from pasta_pipeline_spark.operators.unigram_lm import (
        apply_unigram,
        unigram_train,
    )

    docs = _t(spark, sf_dir, "documents")
    # ONE deterministic snapshot dir per (process, sf_dir), reused and
    # overwritten across invocations (r11 advisor fix: a fresh mkdtemp
    # per plan construction leaked a temp dir on every catalog/bench/
    # gate run). TableStore.overwrite versions WITHIN the dir, so
    # repeated bench iterations stay independent while the on-disk
    # footprint is bounded to one dir per process.
    path = _unigram_store_path(sf_dir)
    save_unigram_vocab(spark, path, unigram_train(docs))
    return apply_unigram(docs, load_unigram_vocab(spark, path))


_UNIGRAM_STORE_DIRS: dict = {}


def _unigram_store_path(sf_dir: str) -> str:
    import tempfile

    if sf_dir not in _UNIGRAM_STORE_DIRS:
        _UNIGRAM_STORE_DIRS[sf_dir] = tempfile.mkdtemp(
            prefix="pasta_unigram_store_"
        )
    return _UNIGRAM_STORE_DIRS[sf_dir]


def _gate_recall_oracle(
    threshold: float = 0.4,
    dim: int = 64,
    num_planes: int = 4,
    num_bands: int = 2,
    max_n: int = 4000,
    recall_scale: int = 1_000_000,
) -> str:
    """DuckDB twin of similarity.gate_recall_report: replay the
    md5-ranked subsample, the brute-force ground truth, and the banded
    gate (inlined plane constants + bucket cap + exact verify — the
    _semantic_dedup_oracle structure) over the SAME subsample. The
    inlined base (planes, bands) is valid at the oracle gate scales
    because the Spark side resolves the config from the FULL corpus
    count (r12 advisor fix — production parity) and the gate CORPORA
    are pinned <= LSH_CALIBRATED_N by test_tooling_consistency, where
    full-corpus auto resolves to exactly this base config. If a gate
    fixture ever outgrows the calibration anchor, that test fails
    before this oracle's hash does."""
    from pasta_pipeline_spark.operators.similarity import DEFAULT_BUCKET_CAP
    from pasta_pipeline_spark.queries.catalog.t04_similarity_ann import (
        _cosine_sql,
    )
    from pasta_pipeline_spark.queries.catalog.t05_multimodal import (
        _banded_planes_sql,
    )

    cos_ab = _cosine_sql("a.embedding::DOUBLE[]", "b.embedding::DOUBLE[]")
    cos_sasb = _cosine_sql("sa.embedding::DOUBLE[]", "sb.embedding::DOUBLE[]")
    return f"""
    WITH planes(band, pidx, pv) AS (VALUES
        {_banded_planes_sql(dim, num_planes, num_bands)}),
    samp AS (
      SELECT vec_id, embedding FROM embeddings
      WHERE len(embedding) = {dim}
      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {max_n}
    ),
    tp AS (
      SELECT CAST(count(*) AS BIGINT) AS n_true_pairs
      FROM samp a JOIN samp b ON a.vec_id < b.vec_id
      WHERE {cos_ab} >= {threshold!r}
    ),
    eb0 AS (
      SELECT vec_id, band,
             CAST(SUM(CASE WHEN list_dot_product(embedding::DOUBLE[], pv) >= 0
                           THEN 1::BIGINT << pidx ELSE 0 END) AS BIGINT) AS bucket
      FROM samp CROSS JOIN planes GROUP BY vec_id, embedding, band
    ),
    eb AS (
      SELECT vec_id, band, bucket FROM (
        SELECT vec_id, band, bucket,
               row_number() OVER (PARTITION BY band, bucket
                 ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS bkrn
        FROM eb0)
      WHERE bkrn <= {DEFAULT_BUCKET_CAP}
    ),
    gp AS (
      SELECT DISTINCT a.vec_id AS ida, b.vec_id AS idb
      FROM eb a JOIN eb b ON a.band = b.band AND a.bucket = b.bucket
      WHERE a.vec_id < b.vec_id
    ),
    gt AS (
      SELECT CAST(count(*) AS BIGINT) AS n_gated_pairs
      FROM gp
      JOIN samp sa ON sa.vec_id = gp.ida
      JOIN samp sb ON sb.vec_id = gp.idb
      WHERE {cos_sasb} >= {threshold!r}
    ),
    nv AS (SELECT CAST(count(*) AS BIGINT) AS n_vectors FROM samp)
    SELECT n_vectors, n_true_pairs, n_gated_pairs,
           CASE WHEN n_true_pairs > 0 THEN
             CAST(FLOOR(CAST(n_gated_pairs AS DOUBLE)
                        / CAST(n_true_pairs AS DOUBLE)
                        * {recall_scale}) AS BIGINT) END AS recall_sc
    FROM nv CROSS JOIN tp CROSS JOIN gt
    """


@register(
    "semantic_gate_recall",
    _gate_recall_oracle(),
    doc="Measured recall of the sign-LSH dedup gate at the dedup "
    "tier's own threshold (similarity.gate_recall_report): brute-force "
    "ground truth over a bounded md5-ranked subsample vs the gated "
    "pair set with the SAME config — the observability a curation "
    "team reads before trusting LSH-gated dedup (the r11 "
    "second-decade finding made the gate's recall a measured, "
    "theta-dependent quantity, not an assumption). Gated exact-verify "
    "admits no false positives, so recall = n_gated / n_true. The "
    "quadratic ground truth is bounded by the deterministic "
    "subsample, so the audit is ~constant-cost at any corpus size.",
)
def q_semantic_gate_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.similarity import gate_recall_report

    return gate_recall_report(
        _t(spark, sf_dir, "embeddings"), threshold=0.4, num_bands=2
    )
