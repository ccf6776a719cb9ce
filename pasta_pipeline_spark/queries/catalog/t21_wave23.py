"""Catalog tier: wave 23 (r9) — unigram-LM tokenizer training.

Registration stays APPEND-ONLY: this module is imported LAST by the
package __init__, so the driver's correctness window over the earlier
311 queries is byte-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pasta_pipeline_spark.queries.catalog._core import _t, register

from pasta_pipeline_spark.operators.unigram_lm import (  # noqa: E402
    unigram_doc_nll_oracle_sql,
    unigram_fertility_oracle_sql,
    unigram_vocab_oracle_sql,
)

# ---------------------------------------------------------------------------
# Wave 23 (r9): unigram-LM (SentencePiece-style) tokenizer training —
# Kudo 2018 Viterbi-EM as an in-plan computation (r8 verdict ask #7)
# ---------------------------------------------------------------------------


@register(
    "unigram_vocab",
    unigram_vocab_oracle_sql("documents"),
    doc="Unigram-LM tokenizer training (Kudo 2018, Viterbi-EM variant): "
    "substring-seeded vocabulary, 2 statically-unrolled EM rounds where "
    "the E-step Viterbi-segments every distinct word as ONE aggregate "
    "fold (flat int64 best*8+len encoding — no UDF, no driver loop) "
    "under fixed-point-ln piece costs, M-step recounts and prunes. "
    "Oracle replays the identical recurrence as statically-unrolled "
    "lateral columns (DuckDB 1.0 list_reduce is thread-unsafe with "
    "captured columns). operators/unigram_lm.py; complements the BPE "
    "trainer (operators/bpe.py) per the r8 verdict's ask.",
)
def q_unigram_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.unigram_lm import unigram_train

    return unigram_train(_t(spark, sf_dir, "documents"))


@register(
    "unigram_fertility",
    unigram_fertility_oracle_sql("documents"),
    doc="Tokenizer fertility comparison (pieces per word, Ács 2019) on "
    "the same word population: the trained unigram-LM vs the 4-merge "
    "BPE state — the standard quality metric for comparing tokenizers. "
    "operators/unigram_lm.py unigram_fertility_vs_bpe.",
)
def q_unigram_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.unigram_lm import (
        unigram_fertility_vs_bpe,
    )

    return unigram_fertility_vs_bpe(_t(spark, sf_dir, "documents"))


@register(
    "unigram_doc_nll",
    unigram_doc_nll_oracle_sql("documents"),
    doc="apply_unigram — the trained tokenizer's inference replay over "
    "documents: per-doc word/piece totals and the summed fixed-point "
    "path NLL (the unigram-LM analog of perplexity filtering). The "
    "expensive Viterbi runs once per DISTINCT word; documents join "
    "back — corpus-scale work is one explode + hash join + groupBy. "
    "operators/unigram_lm.py apply_unigram.",
)
def q_unigram_doc_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.unigram_lm import (
        apply_unigram,
        unigram_train,
    )

    docs = _t(spark, sf_dir, "documents")
    vocab = unigram_train(docs)
    return apply_unigram(docs, vocab.select("piece", "cost_fp"))


# ---------------------------------------------------------------------------
# Wave 25 (r9): EM convergence observability for the unigram trainer
# ---------------------------------------------------------------------------

from pasta_pipeline_spark.operators.unigram_lm import (  # noqa: E402
    unigram_em_curve_oracle_sql,
)


@register(
    "unigram_em_curve",
    unigram_em_curve_oracle_sql("documents"),
    doc="EM convergence curve for the unigram-LM trainer: per E-step "
    "round (plus the final pruned pass) the usable vocabulary size, "
    "corpus-weighted piece total, and total Viterbi path NLL at the "
    "round's own cost scale — the loss curve a tokenizer-training job "
    "exposes for convergence/pruning-regression review. "
    "operators/unigram_lm.py unigram_em_curve.",
)
def q_unigram_em_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.unigram_lm import unigram_em_curve

    return unigram_em_curve(_t(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Wave 26 (r9): A/B testing tier II — the experiment-practice checks
# around the causal estimators (operators/abtest2.py)
# ---------------------------------------------------------------------------

from pasta_pipeline_spark.operators.abtest2 import (  # noqa: E402
    post_stratified_oracle_sql,
    power_grid_oracle_sql,
    qte_oracle_sql,
    srm_oracle_sql,
)


@register(
    "srm_check",
    srm_oracle_sql("events"),
    doc="Sample-ratio mismatch gate (Fabijan 2019): chi-square of the "
    "observed 50/50 user split vs design, flagged past the df=1 "
    "critical constant — the first sanity check of any experiment "
    "readout. operators/abtest2.py srm_check.",
)
def q_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.abtest2 import srm_check

    return srm_check(_t(spark, sf_dir, "events"))


@register(
    "quantile_treatment_effect",
    qte_oracle_sql("events"),
    doc="Quantile treatment effects: per grid point, the difference of "
    "the arms' Type-7 quantiles of the per-user metric — the "
    "distributional readout a mean diff hides on heavy-tailed metrics. "
    "Reuses the exact_quantiles range-partition rank machinery per arm. "
    "operators/abtest2.py quantile_treatment_effect.",
)
def q_quantile_treatment_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.abtest2 import quantile_treatment_effect

    return quantile_treatment_effect(_t(spark, sf_dir, "events"))


@register(
    "post_stratified_effect",
    post_stratified_oracle_sql("events", strata_sql="event_type"),
    doc="Post-stratification (Miratrix 2013): within-stratum effects "
    "combined under pooled stratum weights, SE from the weighted cell "
    "variances — free variance reduction when a categorical covariate "
    "explains outcomes; empty arm cells fail closed. "
    "operators/abtest2.py post_stratified_effect.",
)
def q_post_stratified_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.abtest2 import post_stratified_effect

    return post_stratified_effect(
        _t(spark, sf_dir, "events"), strata_col="event_type"
    )


@register(
    "ab_power_grid",
    power_grid_oracle_sql("events"),
    doc="Power planning off the live metric moments: required n per "
    "arm at each relative MDE via n = 2*sigma^2*(z_a+z_b)^2/delta^2 "
    "with fixed-point z literals (no normal-quantile call) — the "
    "how-long-must-this-run table from one scan. "
    "operators/abtest2.py ab_power_grid.",
)
def q_ab_power_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.abtest2 import ab_power_grid

    return ab_power_grid(_t(spark, sf_dir, "events"))
