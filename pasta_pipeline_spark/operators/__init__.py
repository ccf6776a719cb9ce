"""DataFrame operators — the engine's relational core.

All operators are pure ``DataFrame -> DataFrame`` transforms: no
side-effects, no driver-side row iteration, no ``collect()`` in any
hot path. Physical strategy (broadcast vs shuffle, codegen, AQE
re-planning) is left to Catalyst; operators only declare intent.
"""

from pasta_pipeline_spark.operators.merge import merge_upsert, upsert_accumulate
from pasta_pipeline_spark.operators.dedup import keep_latest, keep_first, dedup_exact
from pasta_pipeline_spark.operators.antijoin import (
    anti_join,
    semi_join,
    null_out_orphans,
    select_unprocessed_links,
)
from pasta_pipeline_spark.operators.topk import top_k
from pasta_pipeline_spark.operators.dedup import dedup_content
from pasta_pipeline_spark.operators.skew import salted_agg
from pasta_pipeline_spark.operators.text_dedup import (
    exact_duplicate_groups,
    winnowing_pairs,
    fingerprint_duplicate_groups,
    jaccard_pairs,
    minhash_lsh_pairs,
    simhash_pairs,
)
from pasta_pipeline_spark.operators.similarity import (
    cosine_topk,
    cosine_dup_pairs,
    knn_join,
    ann_topk_lsh,
    ivf_topk,
    label_centroids,
    semantic_dedup_clustered,
    semantic_dedup_diverse,
    ivf_dup_pairs,
    ivf_cell_profile,
    ivf_threshold_sweep,
    cluster_gate_recall_report,
    train_ivf_centroids_fp,
)
from pasta_pipeline_spark.operators.text_analysis import (
    detect_language,
    quality_score,
    token_count_lexical,
)
from pasta_pipeline_spark.operators.normalize import zscore_by_label
from pasta_pipeline_spark.operators.multimodal import (
    extract_media_features,
    frame_sample_stub,
    sample_video_frames,
)
from pasta_pipeline_spark.operators.text_dedup import cluster_merge_text
from pasta_pipeline_spark.operators.similarity import (
    pq_distortion,
    pq_topk,
    train_pq_codebooks,
)
from pasta_pipeline_spark.operators.divergence import source_token_divergence
from pasta_pipeline_spark.operators.pair_ttl import pair_history_report
from pasta_pipeline_spark.operators.sharding import (
    allocate_budget,
    rendezvous_shard,
    shard_rebalance_report,
)
from pasta_pipeline_spark.operators.divergence import js_between, token_distribution
from pasta_pipeline_spark.operators.splits import (
    assign_split,
    cluster_split,
    split_leakage,
)
from pasta_pipeline_spark.operators.robots import parse_robots_txt, robots_verdict
from pasta_pipeline_spark.operators.sitemaps import parse_sitemap
from pasta_pipeline_spark.operators.expectations import check_expectations
from pasta_pipeline_spark.operators.anomaly import ingest_anomaly
from pasta_pipeline_spark.operators.mixture import mixture_allocation
from pasta_pipeline_spark.operators.politeness import politeness_schedule
from pasta_pipeline_spark.operators.sketches import (
    bloom_build,
    bloom_probe,
    hll_estimate,
    hll_state,
    merge_bloom,
    merge_hll,
)
from pasta_pipeline_spark.operators.main_text import extract_main_text
from pasta_pipeline_spark.operators.text_analysis import (
    bigram_nll,
    confusable_stats,
    quality_score_lang,
    script_mix,
)
from pasta_pipeline_spark.operators.pii import luhn_valid, scan_credit_cards
from pasta_pipeline_spark.operators.normalize_text import (
    clean_text,
    nfc_normalize,
    normalize_documents,
    repair_mojibake,
)
from pasta_pipeline_spark.operators.text_analysis import (
    compression_ratio,
    lexical_diversity,
)
from pasta_pipeline_spark.operators.quality_checks import (
    auc_report,
    brier_score,
    calibration_ece,
    calibration_report,
)
from pasta_pipeline_spark.operators.stats import (
    corpus_datacard,
    source_concentration,
)
from pasta_pipeline_spark.operators.normalize import rank_normalize
from pasta_pipeline_spark.operators.expectations import schema_drift
from pasta_pipeline_spark.operators.politeness import schedule_compliance
from pasta_pipeline_spark.operators.multimodal import (
    decode_gif_pixels,
)
from pasta_pipeline_spark.operators.subdoc_dedup import remove_boilerplate_lines
from pasta_pipeline_spark.operators.sitemaps import refresh_selection
from pasta_pipeline_spark.operators.robots import parse_crawl_delays
from pasta_pipeline_spark.operators.multimodal import (
    decode_image_pixels,
    decode_png_pixels,
)
from pasta_pipeline_spark.operators.similarity import (
    ivf_topk_pruned,
    pq_adc_topk,
    pq_encode,
    write_ivf_partitioned,
)

from pasta_pipeline_spark.operators.dsir import dsir_select, dsir_weights
from pasta_pipeline_spark.operators.sampling import greedy_pack
from pasta_pipeline_spark.operators.text_analysis import perplexity_buckets
from pasta_pipeline_spark.operators.quality_filters import curation_funnel
from pasta_pipeline_spark.operators.divergence import ks_drift
from pasta_pipeline_spark.operators.sampling import balanced_label_sample
from pasta_pipeline_spark.operators.similarity import jl_project
from pasta_pipeline_spark.operators.similarity import jl_project_expr
from pasta_pipeline_spark.operators.search import bm25_topk, kwic_snippets, phrase_search
from pasta_pipeline_spark.operators.anomaly import cusum_drift
from pasta_pipeline_spark.operators.multimodal import (
    audio_fingerprint,
    audio_fingerprint_pairs,
    banded_hamming_pairs,
    hash_cluster_edges,
    decode_audio_samples,
    image_dhash,
    image_dhash_pairs,
    video_scene_cuts,
)
from pasta_pipeline_spark.operators.basket import basket_pair_lift
from pasta_pipeline_spark.operators.stat_tests import (
    benford_digit_test,
    dow_seasonality,
    mann_whitney_u,
    pearson_corr_matrix,
)
from pasta_pipeline_spark.operators.readability import flesch_by_lang
from pasta_pipeline_spark.operators.denoising import span_corruption_examples
from pasta_pipeline_spark.operators.golden import golden_part_records
from pasta_pipeline_spark.operators.attribution import last_touch_attribution
from pasta_pipeline_spark.operators.rfm import rfm_segments

__all__ = [
    "merge_upsert",
    "upsert_accumulate",
    "keep_latest",
    "keep_first",
    "dedup_exact",
    "dedup_content",
    "anti_join",
    "semi_join",
    "null_out_orphans",
    "select_unprocessed_links",
    "top_k",
    "salted_agg",
    "exact_duplicate_groups",
    "fingerprint_duplicate_groups",
    "jaccard_pairs",
    "minhash_lsh_pairs",
    "simhash_pairs",
    "cosine_topk",
    "cosine_dup_pairs",
    "knn_join",
    "ann_topk_lsh",
    "ivf_topk",
    "label_centroids",
    "detect_language",
    "quality_score",
    "token_count_lexical",
    "zscore_by_label",
    "extract_media_features",
    "frame_sample_stub",
    "sample_video_frames",
    "cluster_merge_text",
    "pq_topk",
    "source_token_divergence",
    "pair_history_report",
    "rendezvous_shard",
    "shard_rebalance_report",
    "allocate_budget",
    "js_between",
    "token_distribution",
    "assign_split",
    "cluster_split",
    "split_leakage",
    "parse_robots_txt",
    "robots_verdict",
    "parse_sitemap",
    "check_expectations",
    "ingest_anomaly",
    "mixture_allocation",
    "politeness_schedule",
    "train_pq_codebooks",
    "pq_distortion",
    "hll_state",
    "hll_estimate",
    "merge_hll",
    "bloom_build",
    "bloom_probe",
    "merge_bloom",
    "extract_main_text",
    "quality_score_lang",
    "script_mix",
    "bigram_nll",
    "confusable_stats",
    "luhn_valid",
    "scan_credit_cards",
    "remove_boilerplate_lines",
    "refresh_selection",
    "parse_crawl_delays",
    "decode_image_pixels",
    "decode_png_pixels",
    "ivf_topk_pruned",
    "pq_adc_topk",
    "pq_encode",
    "write_ivf_partitioned",
    "clean_text",
    "nfc_normalize",
    "normalize_documents",
    "repair_mojibake",
    "compression_ratio",
    "lexical_diversity",
    "auc_report",
    "brier_score",
    "calibration_ece",
    "calibration_report",
    "corpus_datacard",
    "source_concentration",
    "rank_normalize",
    "schema_drift",
    "schedule_compliance",
    "decode_gif_pixels",
    "dsir_select",
    "dsir_weights",
    "greedy_pack",
    "perplexity_buckets",
    "curation_funnel",
    "ks_drift",
    "balanced_label_sample",
    "jl_project",
    "jl_project_expr",
    "bm25_topk",
    "phrase_search",
    "cusum_drift",
    "kwic_snippets",
    "decode_audio_samples",
    "image_dhash",
    "image_dhash_pairs",
    "video_scene_cuts",
    "winnowing_pairs",
    "audio_fingerprint",
    "audio_fingerprint_pairs",
    "banded_hamming_pairs",
    "basket_pair_lift",
    "benford_digit_test",
    "dow_seasonality",
    "mann_whitney_u",
    "pearson_corr_matrix",
    "flesch_by_lang",
    "span_corruption_examples",
    "golden_part_records",
    "last_touch_attribution",
    "rfm_segments",
]
