"""Catalog tier: waves 11-22 (r8): governance, causal, privacy, GD training, BPE, survival, quantiles.

Split verbatim from the r8 catalog monolith (r8 verdict ask #4).
Registration order is preserved by the package __init__ import
order; registration stays APPEND-ONLY — new queries go at the end
of the LAST tier module (or a new one imported last).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import SparkSession
from pasta_pipeline_spark.queries.catalog._core import _t, _tp, register
from pasta_pipeline_spark.queries.catalog.t03_dedup_ladder import _JACCARD_ORACLE
from pasta_pipeline_spark.queries.catalog.t19_wave10 import _hard_negatives_oracle

# ---------------------------------------------------------------------------
# Wave 11 (r8): governance, engagement, periodicity, corpus stoplists
# ---------------------------------------------------------------------------

from pasta_pipeline_spark.operators.engagement import (  # noqa: E402
    dau_mau_oracle_sql,
    interarrival_oracle_sql,
)
from pasta_pipeline_spark.operators.governance import (  # noqa: E402
    four_fifths_oracle_sql,
    k_anonymity_oracle_sql,
)
from pasta_pipeline_spark.operators.text_analysis import (  # noqa: E402
    stopword_discovery_oracle_sql,
)
from pasta_pipeline_spark.operators.timeseries import (  # noqa: E402
    daily_acf_oracle_sql,
)


@register(
    "k_anonymity_audit",
    k_anonymity_oracle_sql("customer", ["c_nationkey", "c_mktsegment"], k=5),
    doc="k-anonymity re-identification audit (operators/governance.py, "
    "Sweeney 2002) over the (nation, market segment) quasi-identifiers "
    "of the customer table: equivalence-class size histogram with the "
    "at-risk (size < k) mass. One groupBy + a bounded distinct-size "
    "frame at any scale.",
)
def q_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.governance import k_anonymity_report

    cust = _t(spark, sf_dir, "customer")
    return k_anonymity_report(cust, ["c_nationkey", "c_mktsegment"], k=5)


@register(
    "quality_disparity",
    four_fifths_oracle_sql(
        "documents", "source", "n_chars >= 200 AND n_chars <= 20000"
    ),
    doc="Four-fifths adverse-impact screen (operators/governance.py) on "
    "a length quality gate per document source: selection rates, ratio "
    "to the best-rate source, and the EEOC 4/5 flag via the exact "
    "cross-multiplied integer test (5*pass*ref_n < 4*ref_pass*n) — the "
    "curation-bias audit for corpus filters. 1-row broadcast reference "
    "scalar (audited crossJoin handoff).",
)
def q_quality_disparity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.governance import four_fifths_disparity

    docs = _t(spark, sf_dir, "documents")
    return four_fifths_disparity(
        docs, "source", (F.col("n_chars") >= 200) & (F.col("n_chars") <= 20000)
    )


@register(
    "dau_mau_stickiness",
    dau_mau_oracle_sql(),
    doc="Per-month DAU/MAU engagement rollup (operators/engagement.py): "
    "average daily actives, monthly actives, and the stickiness ratio — "
    "pure distinct-count rollups at day/month grain, every frame "
    "bounded by the calendar.",
)
def q_dau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.engagement import dau_mau_stickiness

    return dau_mau_stickiness(_t(spark, sf_dir, "events"))


@register(
    "interarrival_profile",
    interarrival_oracle_sql(),
    doc="Per-event-type inter-arrival cadence profile (operators/"
    "engagement.py): exact epoch-microsecond gaps between a user's "
    "consecutive same-type events, p50/p90/max picked closed-form from "
    "the per-type cumulative gap histogram (bounded value-domain "
    "frames, never an empty-OVER ntile). Session-timeout tuning and "
    "bot-cadence detection.",
)
def q_interarrival_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.engagement import interarrival_profile

    return interarrival_profile(_t(spark, sf_dir, "events"))


@register(
    "acf_daily_revenue",
    daily_acf_oracle_sql("orders", "o_orderdate", "o_totalprice", max_lag=7),
    doc="Sample autocorrelation of daily revenue at calendar lags 1..7 "
    "(operators/timeseries.py): pairwise-complete Pearson r per lag via "
    "calendar-exact date_sub equi-joins of the |days|-row rollup "
    "against itself — the periodicity detector feeding "
    "weekly_seasonality. Co-moments in decimal(38,0), r as the fixed "
    "double tree.",
)
def q_acf_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.timeseries import daily_autocorrelation

    return daily_autocorrelation(
        _t(spark, sf_dir, "orders"), "o_orderdate", "o_totalprice", max_lag=7
    )


@register(
    "stopword_discovery",
    stopword_discovery_oracle_sql(),
    doc="Corpus-driven stopword candidates (operators/text_analysis.py): "
    "top-50 tokens by document frequency with df-ratio and per-doc "
    "burstiness, flagged at df >= 50% of the corpus — the language-"
    "agnostic stoplist the quality tiers would derive per language at "
    "100 TB. One explode, two term-grain groupBys, deterministic "
    "TakeOrdered.",
)
def q_stopword_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.text_analysis import stopword_discovery

    return stopword_discovery(_tp(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Wave 12 (r8): curriculum, concentration, bot cadence, contrastive positives
# ---------------------------------------------------------------------------

from pasta_pipeline_spark.operators.curriculum import (  # noqa: E402
    curriculum_oracle_sql,
)
from pasta_pipeline_spark.operators.engagement import (  # noqa: E402
    bot_cadence_oracle_sql,
)
from pasta_pipeline_spark.operators.stats import lorenz_oracle_sql  # noqa: E402


@register(
    "curriculum_phases",
    curriculum_oracle_sql(),
    doc="Equal-token-budget curriculum phases (operators/curriculum.py, "
    "Bengio et al. 2009 ordering with mean-token-length difficulty): "
    "corpus collapses to a bounded difficulty-grain histogram, "
    "cumulative token sums over that frame, closed-form phase "
    "quotient — phase 0 holds the easiest quarter of TOKENS. No "
    "fact-scale window.",
)
def q_curriculum_phases(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.curriculum import curriculum_phases

    return curriculum_phases(_tp(spark, sf_dir, "documents"))


@register(
    "revenue_lorenz_deciles",
    lorenz_oracle_sql(),
    doc="Customer-revenue Lorenz deciles (operators/stats.py): rank "
    "customers by spend via the range-partition + driver-prefix-sum id "
    "machinery (never an empty-OVER ntile), closed-form equal-depth "
    "decile quotient, per-decile + cumulative revenue shares over the "
    "10-row frame — the 80/20 concentration read.",
)
def q_revenue_lorenz_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.stats import revenue_lorenz_deciles

    return revenue_lorenz_deciles(_t(spark, sf_dir, "orders"))


@register(
    "bot_cadence",
    bot_cadence_oracle_sql(),
    doc="Per-user automation screen (operators/engagement.py): median "
    "inter-event gap from exact epoch-microsecond diffs (closed-form "
    "pick over per-user gap histograms — partitions bounded by a "
    "user's own history), events/hour over the active span, and the "
    "machine-cadence flag. Robust: a bot cannot hide a sub-second "
    "median behind long pauses.",
)
def q_bot_cadence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.engagement import bot_cadence_report

    return bot_cadence_report(_t(spark, sf_dir, "events"))


@register(
    "contrastive_positives",
    _hard_negatives_oracle(same_label=True),
    doc="Positive-pair mining for contrastive training (operators/"
    "negatives.py, same_label=True): per anchor the top-3 nearest "
    "SAME-label vectors (self excluded) through the identical capped "
    "sign-LSH gate as hard_negatives — the other half of an "
    "InfoNCE/SimCSE training set, hash-checked against the same "
    "replayed oracle with the label predicate flipped.",
)
def q_contrastive_positives(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.negatives import hard_negative_mining

    return hard_negative_mining(_t(spark, sf_dir, "embeddings"), same_label=True)


# ---------------------------------------------------------------------------
# Wave 13 (r8): curation prioritization — ensemble scoring, quality-aware
# survivorship, per-source dedup funnel
# ---------------------------------------------------------------------------

from pasta_pipeline_spark.operators.ensemble import (  # noqa: E402
    ensemble_deciles_oracle_sql,
    quality_survivors_oracle_sql,
    source_funnel_oracle_sql,
)


@register(
    "quality_ensemble_deciles",
    ensemble_deciles_oracle_sql(),
    doc="Fixed-weight quality-ensemble score deciles (operators/"
    "ensemble.py): portable int64 features (length, gate-stopword "
    "hits, mean token length via the shared floor-double tree, "
    "sentence punctuation) combined with frozen literal weights, "
    "bucketed equal-depth via the range-partition rank machinery — "
    "the hand-weighted stand-in for a FineWeb-style classifier score, "
    "riding the exact bucketing a learned score would use.",
)
def q_quality_ensemble_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.ensemble import quality_ensemble_deciles

    return quality_ensemble_deciles(_tp(spark, sf_dir, "documents"))


@register(
    "quality_dedup_survivors",
    quality_survivors_oracle_sql(),
    doc="Quality-aware near-dup survivorship (operators/ensemble.py): "
    "within each lede-fingerprint group (first 8 normalized tokens — "
    "the syndication/template shape) the highest-ensemble-score "
    "member survives (score desc, id asc); election above the exact "
    "rung, where raw-text scores actually differ — the curation "
    "counterpart of golden-record mode election. Survivor window "
    "partitions by content hash only.",
)
def q_quality_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.ensemble import quality_dedup_survivors

    return quality_dedup_survivors(_tp(spark, sf_dir, "documents"))


@register(
    "source_dedup_funnel",
    source_funnel_oracle_sql(),
    doc="Per-source dedup-ladder survival (operators/ensemble.py): raw "
    "-> exact-text -> normalized-text survivor counts with corpus-wide "
    "min-id survivorship, cross-source losses charged to the losing "
    "source — the ablation row that identifies the copy-farm feed. One "
    "groupBy per rung, left-joined so zero-survivor sources keep their "
    "row.",
)
def q_source_dedup_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.ensemble import source_dedup_funnel

    return source_dedup_funnel(_tp(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Wave 14 (r8): packing-waste accounting, dup-graph transitivity audit
# ---------------------------------------------------------------------------

from pasta_pipeline_spark.operators.chunking import (  # noqa: E402
    packing_waste_oracle_sql,
)
from pasta_pipeline_spark.operators.graph import (  # noqa: E402
    transitivity_oracle_sql,
)


@register(
    "packing_waste",
    packing_waste_oracle_sql(),
    doc="Context-window padding-waste accounting (operators/chunking.py): "
    "per source, pad tokens of the no-packing ceil(n_tok/512) baseline "
    "and the waste share — the number that justifies sequence packing "
    "(compare greedy_pack's efficiency). Pure integer arithmetic, one "
    "scan + one groupBy.",
)
def q_packing_waste(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.chunking import packing_waste_report

    return packing_waste_report(_tp(spark, sf_dir, "documents"))


@register(
    "dup_graph_transitivity",
    transitivity_oracle_sql(_JACCARD_ORACLE),
    doc="Dedup-threshold consistency audit (operators/graph.py): global "
    "transitivity 3*triangles/wedges of the exact 3-gram Jaccard>=0.5 "
    "near-dup graph. High = clean clusters (a~b, b~c implies a~c); low "
    "= chain components that transitive closure will over-merge. "
    "Triangles ride the degree-oriented wedge join (hub fan-out "
    "bounded O(sqrt(E))); final combine is two 1-row broadcast "
    "handoffs.",
)
def q_dup_graph_transitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.graph import transitivity_report
    from pasta_pipeline_spark.operators.text_dedup import jaccard_pairs

    docs = _tp(spark, sf_dir, "documents")
    pairs = jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5).select(
        "doc_a", "doc_b"
    )
    return transitivity_report(pairs)


# ---------------------------------------------------------------------------
# Wave 15 (r8): l-diversity, randomized response, term burstiness
# ---------------------------------------------------------------------------

from pasta_pipeline_spark.operators.governance import (  # noqa: E402
    l_diversity_oracle_sql,
    randomized_response_oracle_sql,
)
from pasta_pipeline_spark.operators.text_analysis import (  # noqa: E402
    term_burstiness_oracle_sql,
)


@register(
    "l_diversity_audit",
    l_diversity_oracle_sql(
        "customer",
        ["c_nationkey", "c_mktsegment"],
        "FLOOR(c_acctbal / 1000)",
        l=3,
    ),
    doc="l-diversity homogeneity-attack audit (operators/governance.py, "
    "Machanavajjhala 2007) over the same (nation, segment) "
    "quasi-identifiers as k_anonymity_audit, sensitive attribute = "
    "account-balance thousand band: per-class distinct-sensitive "
    "histogram with the at-risk (l < 3) disclosure mass — the screen "
    "k-anonymity misses when a big class is value-homogeneous. One "
    "groupBy + bounded distinct-level frame.",
)
def q_l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.governance import l_diversity_report

    cust = _t(spark, sf_dir, "customer").withColumn(
        "__sens", F.floor(F.col("c_acctbal") / 1000)
    )
    return l_diversity_report(
        cust, ["c_nationkey", "c_mktsegment"], "__sens", l=3
    )


@register(
    "randomized_response_counts",
    randomized_response_oracle_sql("events", "event_id", "event_type"),
    doc="Warner randomized-response mechanism + debias audit "
    "(operators/governance.py, Warner 1965 direct-encoding k-ary): "
    "each event reports its true type w.p. 3/4 else an md5-uniform "
    "other type; per-type noisy counts and the unbiased estimate "
    "n_hat = (c*den*(k-1) - (den-num)*n)/(num*(k-1) - (den-num)) with "
    "abs error vs truth — the local-DP utility curve, fully "
    "deterministic (noise is md5-derived) hence oracle-checkable. One "
    "broadcast spine join + one groupBy at any scale.",
)
def q_randomized_response_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.governance import (
        randomized_response_counts,
    )

    ev = _t(spark, sf_dir, "events")
    return randomized_response_counts(ev, "event_id", "event_type")


@register(
    "term_burstiness",
    term_burstiness_oracle_sql(),
    doc="Term burstiness / index of dispersion, zeros included "
    "(operators/text_analysis.py): variance-to-mean ratio of per-doc "
    "counts for the top-40 terms by collection frequency — separates "
    "bursty content words (D >> 1) from Poisson-like function words "
    "(D ~ 1); high-df high-D terms are template artifacts. int64 "
    "counts, decimal(38,0) sum-of-squares, TakeOrdered top-k, 1-row "
    "broadcast N handoff.",
)
def q_term_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.text_analysis import term_burstiness

    docs = _tp(spark, sf_dir, "documents")
    return term_burstiness(docs, "doc_id", "text", top_k=40)


# ---------------------------------------------------------------------------
# Wave 16 (r8): in-plan GD training, Kaplan-Meier survival, Holt forecast
# ---------------------------------------------------------------------------

from pasta_pipeline_spark.operators.mlplan import (  # noqa: E402
    logistic_gd_oracle_sql,
)
from pasta_pipeline_spark.operators.survival import (  # noqa: E402
    km_shipping_oracle_sql,
)
from pasta_pipeline_spark.operators.timeseries import (  # noqa: E402
    holt_revenue_oracle_sql,
)


@register(
    "logistic_quality_gd",
    logistic_gd_oracle_sql(steps=5, lr_num=2),
    doc="In-plan classifier training (operators/mlplan.py): full-batch "
    "gradient descent on a softsign-link quasi-logistic model imitating "
    "a length quality gate (the fastText-classifier distillation "
    "shape) — one moments scan standardizes features into clipped "
    "milli-sigma int64, then 5 unrolled GD steps, each one full-scan "
    "aggregate whose 1-row gradient broadcasts back. All-integer "
    "updates (decimal(38,0) accumulate, signed div parity) make the "
    "TRAINING RUN itself value-hash oracle-checkable; output is the "
    "learning curve (step, weights, accuracy: 51% -> 99%+).",
)
def q_logistic_quality_gd(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.mlplan import (
        doc_gate_features,
        logistic_gd_report,
        standardize_features,
    )

    docs = _tp(spark, sf_dir, "documents")
    feats = standardize_features(doc_gate_features(docs), ["f1", "f2"])
    return logistic_gd_report(feats, steps=5, lr_num=2)


@register(
    "kaplan_meier_shipping",
    km_shipping_oracle_sql(cutoff=90),
    doc="Kaplan-Meier product-limit survival curve (operators/"
    "survival.py, Kaplan & Meier 1958) over order-to-ship lag with "
    "administrative right-censoring at 90 days: per distinct duration "
    "the at-risk count, events, censored mass, and S(t) via the exact "
    "int64 fixed-point product fold (aggregate HOF over the bounded "
    "<=91-row frame; DuckDB twin is the same recurrence as a recursive "
    "CTE). Negative lags fail closed.",
)
def q_kaplan_meier_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.survival import (
        kaplan_meier,
        order_ship_durations,
    )

    li = _t(spark, sf_dir, "lineitem")
    od = _t(spark, sf_dir, "orders")
    return kaplan_meier(order_ship_durations(li, od), cutoff=90)


@register(
    "holt_revenue_forecast",
    holt_revenue_oracle_sql(),
    doc="Holt double exponential smoothing (operators/timeseries.py, "
    "Holt 1957): level+trend integer recurrence (alpha=3/10, "
    "beta=1/10) over daily order revenue in exact cents, one "
    "aggregate-HOF fold over the bounded day domain; returns the last "
    "30 days with level, trend, and the one-step-ahead forecast error "
    "— the ewma_fold upgrade that tracks drift. Signed truncating div "
    "agrees cross-engine; day as epoch-day BIGINT.",
)
def q_holt_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.timeseries import (
        daily_revenue_frame,
        holt_linear_fold,
    )

    od = _t(spark, sf_dir, "orders")
    return holt_linear_fold(daily_revenue_frame(od))


# ---------------------------------------------------------------------------
# Wave 17 (r8): shuffle-quality audit, CUPED, vocab coverage curve
# ---------------------------------------------------------------------------

from pasta_pipeline_spark.operators.shuffle_audit import (  # noqa: E402
    epoch_shuffle_oracle_sql,
)
from pasta_pipeline_spark.operators.stat_tests import (  # noqa: E402
    cuped_oracle_sql,
)
from pasta_pipeline_spark.operators.text_analysis import (  # noqa: E402
    vocab_coverage_oracle_sql,
)


@register(
    "epoch_shuffle_audit",
    epoch_shuffle_oracle_sql(),
    doc="Training-epoch shuffle-quality audit (operators/"
    "shuffle_audit.py): per-source run-length profile of the "
    "md5(epoch:id) read order vs the 1/(1-p) ideal-mixing expectation "
    "— long same-source runs mean correlated gradients. Both ranks "
    "ride the range-partition + driver-prefix-sum machinery "
    "(assign_sequential_ids / assign_grouped_sequential_ids), so no "
    "empty-OVER or hot-source window touches the fact table.",
)
def q_epoch_shuffle_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.shuffle_audit import epoch_shuffle_runs

    docs = _t(spark, sf_dir, "documents")
    return epoch_shuffle_runs(docs, "doc_id", "source", epoch=1)


@register(
    "cuped_adjustment",
    cuped_oracle_sql(),
    doc="CUPED variance-reduced A/B readout (operators/stat_tests.py, "
    "Deng/Xu/Kohavi/Walker 2013): per-user pre-period covariate X and "
    "post-period metric Y, pooled theta = cov/var, adjusted-metric "
    "means per md5-bucket arm, and the variance-reduction ratio. One "
    "groupBy(user) + one 1-row moment aggregate; all statistics are "
    "fixed double trees over int64/decimal sums; epoch-micros period "
    "boundary (NOTES #39).",
)
def q_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.stat_tests import cuped_report

    ev = _t(spark, sf_dir, "events")
    return cuped_report(ev)


@register(
    "vocab_coverage_curve",
    vocab_coverage_oracle_sql(),
    doc="Cumulative token-coverage curve (operators/text_analysis.py): "
    "share of all token occurrences covered by the top-k vocabulary "
    "terms at k in {10,100,1000,10000} — the Zipf-side vocab-size "
    "decision table. Global vocab rank via assign_sequential_ids "
    "(range partition + driver prefix-sum, no empty-OVER over the "
    "vocabulary), then one conditional-aggregate pass.",
)
def q_vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.text_analysis import (
        vocab_coverage_curve,
    )

    docs = _tp(spark, sf_dir, "documents")
    return vocab_coverage_curve(docs, "doc_id", "text")


# ---------------------------------------------------------------------------
# Wave 18 (r8): BPE merge learning, difference-in-differences
# ---------------------------------------------------------------------------

from pasta_pipeline_spark.operators.bpe import (  # noqa: E402
    bpe_merges_oracle_sql,
)
from pasta_pipeline_spark.operators.stat_tests import (  # noqa: E402
    did_oracle_sql,
)


@register(
    "bpe_merge_learning",
    bpe_merges_oracle_sql(k=4),
    doc="In-plan BPE merge learning (operators/bpe.py, Sennrich/"
    "Haddow/Birch 2016 §3.2): the first 4 merges learned from the "
    "corpus word-frequency frame — each round one vocabulary-scale "
    "pair-count groupBy, a 1-row elected-merge broadcast, and a "
    "greedy-LTR re-tokenization fold (aggregate HOF). The corpus is "
    "scanned ONCE; rounds iterate the vocab frame (the classic BPE "
    "trick). All-integer, value-hash oracle vs a positional "
    "run-parity DuckDB twin.",
)
def q_bpe_merge_learning(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.bpe import (
        bpe_learn_merges,
        word_freq_frame,
    )

    docs = _tp(spark, sf_dir, "documents")
    return bpe_learn_merges(word_freq_frame(docs), k=4)


@register(
    "did_estimator",
    did_oracle_sql(),
    doc="Difference-in-differences readout (operators/stat_tests.py, "
    "Card & Krueger 1994 design): 2x2 md5-arm x pre/post cell means, "
    "DiD estimate, large-sample SE and z — differences out secular "
    "drift that a naive post-only compare absorbs; the causal "
    "companion to cuped_adjustment. One conditional-aggregate scan "
    "(decimal(38,0) second moments); empty cells and zero SE fail "
    "closed to NULL on both engines.",
)
def q_did_estimator(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.stat_tests import did_report

    ev = _t(spark, sf_dir, "events")
    return did_report(ev)


# ---------------------------------------------------------------------------
# Wave 19 (r8): Poisson bootstrap CI, BPE compression curve
# ---------------------------------------------------------------------------

from pasta_pipeline_spark.operators.bootstrap import (  # noqa: E402
    bootstrap_mean_oracle_sql,
)
from pasta_pipeline_spark.operators.bpe import (  # noqa: E402
    bpe_compression_oracle_sql,
)


@register(
    "bootstrap_mean_ci",
    bootstrap_mean_oracle_sql(),
    doc="Poisson-bootstrap confidence interval (operators/bootstrap.py, "
    "Chamandy et al. 2012): 40 replicate weighted means of order value "
    "in ONE scan — per-row Poisson(1) weights from the md5-quantized "
    "inverse CDF (no exp/log), decimal(38,0) weighted sums, in-row "
    "sorted replicate vector, percentile band. THE at-scale CI "
    "technique: B is aggregation width, not a shuffle; the whole "
    "interval is value-hash oracle-checkable because the noise is "
    "deterministic.",
)
def q_bootstrap_mean_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.bootstrap import (
        poisson_bootstrap_mean_ci,
    )

    od = _t(spark, sf_dir, "orders")
    return poisson_bootstrap_mean_ci(od, "o_orderkey", "o_totalprice")


@register(
    "bpe_compression_curve",
    bpe_compression_oracle_sql(k=4),
    doc="BPE tokens-per-word compression curve (operators/bpe.py): "
    "corpus-weighted token totals at each of the first 4 learned "
    "merges (step 0 = character baseline) — how much context window "
    "the subword vocab buys; shares the learning loop and the "
    "CTE-chain oracle with bpe_merge_learning.",
)
def q_bpe_compression_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.bpe import (
        bpe_compression_report,
        word_freq_frame,
    )

    docs = _tp(spark, sf_dir, "documents")
    return bpe_compression_report(word_freq_frame(docs), k=4)


# ---------------------------------------------------------------------------
# Wave 20 (r8): HLL overlap audit, interpolated quantiles
# ---------------------------------------------------------------------------

from pasta_pipeline_spark.operators.exact_quantiles import (  # noqa: E402
    interpolated_quantiles_oracle_sql,
)
from pasta_pipeline_spark.operators.sketches import (  # noqa: E402
    hll_overlap_oracle_sql,
)


@register(
    "hll_overlap_audit",
    hll_overlap_oracle_sql(
        "events", "user_id", "event_type = 'purchase'", "event_type = 'click'"
    ),
    doc="Sketch-algebra audience overlap (operators/sketches.py): "
    "|A∩B| by inclusion-exclusion over three deterministic HLL "
    "estimates (purchase users, click users, register-wise-MAX "
    "union), audited against the exact one-groupBy overlap — the "
    "planning number for how noisy sketched intersections really "
    "are. All 1-row scalar handoffs; ≤m-row register states.",
)
def q_hll_overlap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.sketches import hll_overlap_audit

    ev = _t(spark, sf_dir, "events")
    return hll_overlap_audit(
        ev,
        "user_id",
        F.col("event_type") == "purchase",
        F.col("event_type") == "click",
    )


@register(
    "interpolated_quantiles",
    interpolated_quantiles_oracle_sql(
        "lineitem", "l_extendedprice", "l_orderkey"
    ),
    doc="Type-7 interpolated quantiles (operators/exact_quantiles.py, "
    "Hyndman & Fan 1996 — the numpy/R default) of extended price, "
    "WITHOUT a global sort task: ranks via assign_sequential_ids "
    "(range partition + driver prefix-sum), a bounded rank-grid frame "
    "broadcast-joined back, exact rational h = (n-1)p arithmetic, one "
    "interpolation double tree. Matches numpy.quantile bit-for-bit on "
    "the bridged values.",
)
def q_interpolated_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.exact_quantiles import (
        interpolated_quantiles,
    )

    li = _t(spark, sf_dir, "lineitem")
    return interpolated_quantiles(li, "l_extendedprice", "l_orderkey")


# ---------------------------------------------------------------------------
# Wave 21 (r8): isotonic calibration
# ---------------------------------------------------------------------------

from pasta_pipeline_spark.operators.isotonic import (  # noqa: E402
    isotonic_oracle_sql,
)


@register(
    "isotonic_calibration",
    isotonic_oracle_sql(
        "documents", "LEAST(n_chars // 40, 15)", "lang = 'en'"
    ),
    doc="Isotonic (PAVA) calibration of per-length-bin English rates "
    "(operators/isotonic.py, Zadrozny & Elkan 2002): best monotone "
    "step fit of empirical label rates over score bins, via the "
    "bounded maximin closed form max_j<=i min_k>=i avg(j..k) — no "
    "sequential stack, every step a bounded window/explode over the "
    "<=16-row bin frame after one fact-scan groupBy. The calibrator "
    "that turns a cheap quality score into a probability.",
)
def q_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.isotonic import isotonic_calibration

    docs = _t(spark, sf_dir, "documents")
    return isotonic_calibration(
        docs,
        F.least(F.expr("n_chars div 40"), F.lit(15)),
        F.col("lang") == "en",
    )


# ---------------------------------------------------------------------------
# Wave 22 (r8): delta-method ratio metric
# ---------------------------------------------------------------------------

from pasta_pipeline_spark.operators.stat_tests import (  # noqa: E402
    ratio_delta_oracle_sql,
)


@register(
    "ratio_metric_delta",
    ratio_delta_oracle_sql(),
    doc="Delta-method ratio-metric A/B readout (operators/"
    "stat_tests.py, Deng/Knoblich/Lu 2018): per-arm value-per-event "
    "ratio with the Taylor-expansion variance that respects USERS as "
    "the randomization unit (naive per-event variance is wrong for "
    "ratio metrics), diff, SE, z. One groupBy(user) + one "
    "conditional-moment scan; degenerate arms fail closed to NULL.",
)
def q_ratio_metric_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasta_pipeline_spark.operators.stat_tests import ratio_metric_delta

    ev = _t(spark, sf_dir, "events")
    return ratio_metric_delta(ev)
