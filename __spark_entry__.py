"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The real implementation lives in ``airflow_ml_pipeline_spark``; this module
exposes the engine's declared-query registry
(airflow_ml_pipeline_spark/plans/registry.py) in an explicit verification
priority order: the driver's correctness budget is a prefix of this dict.
Round-15 rotation (VERDICT r14 ask #1): every query has a committed
driver row and every oracle-backed query is green on its latest row, so
the head is the queries newly declared in round 15, then the whole
registry strictly by the age of each query's latest committed driver
row (cohorts r10 x46 -> r11 x50 -> r12 x50 -> r13 x50 -> the 50 names
the r14 driver checked last). The whole registry is listed so a query
can no longer register without a priority slot; the ordering contract
lives in tests/test_registry_order.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from airflow_ml_pipeline_spark.session import tune  # noqa: E402
from airflow_ml_pipeline_spark.plans import registry  # noqa: E402

# importing the operator modules populates the registry; a failed import is
# a build bug that must surface, not silently shrink the declared surface
import airflow_ml_pipeline_spark.operators.relational  # noqa: F401,E402
import airflow_ml_pipeline_spark.operators.relational_ext  # noqa: F401,E402
import airflow_ml_pipeline_spark.operators.events  # noqa: F401,E402
import airflow_ml_pipeline_spark.operators.temporal  # noqa: F401,E402
import airflow_ml_pipeline_spark.operators.tpch_extra  # noqa: F401,E402
import airflow_ml_pipeline_spark.operators.tpch_extra2  # noqa: F401,E402
import airflow_ml_pipeline_spark.operators.tpch_extra3  # noqa: F401,E402
import airflow_ml_pipeline_spark.operators.stats  # noqa: F401,E402
import airflow_ml_pipeline_spark.operators.textstats  # noqa: F401,E402
import airflow_ml_pipeline_spark.operators.dedup  # noqa: F401,E402
import airflow_ml_pipeline_spark.operators.similarity  # noqa: F401,E402
import airflow_ml_pipeline_spark.operators.pq  # noqa: F401,E402
import airflow_ml_pipeline_spark.operators.grouped_pandas  # noqa: F401,E402
import airflow_ml_pipeline_spark.operators.mlops  # noqa: F401,E402
import airflow_ml_pipeline_spark.operators.multimodal  # noqa: F401,E402
import airflow_ml_pipeline_spark.operators.corpus_ops  # noqa: F401,E402
import airflow_ml_pipeline_spark.operators.packing  # noqa: F401,E402
import airflow_ml_pipeline_spark.operators.manifest  # noqa: F401,E402
import airflow_ml_pipeline_spark.operators.analytics  # noqa: F401,E402
import airflow_ml_pipeline_spark.operators.quality_model  # noqa: F401,E402
import airflow_ml_pipeline_spark.operators.unigram_lm  # noqa: F401,E402
import airflow_ml_pipeline_spark.operators.selection  # noqa: F401,E402
import airflow_ml_pipeline_spark.streaming.queries  # noqa: F401,E402
import airflow_ml_pipeline_spark.streaming.ingest  # noqa: F401,E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"

#: Verification priority: the driver checks a ~50-name prefix; the list
#: covers the WHOLE registry, ordered by evidence age (zero-evidence
#: queries first, then oldest committed driver row first).
CHECK_PRIORITY = [
    # ---- round-15 rotation (VERDICT r14 ask #1) ----
    # Head: queries newly declared in round 15 (zero driver rows),
    # then the registry strictly by the age of each query's latest
    # committed driver row — cohorts r10 (46: the 50-name r10 cohort
    # minus the 4 names the r14 driver re-greened) -> r11 (50) ->
    # r12 (50) -> r13 (50) -> r14 (50: the r14-checked prefix =
    # 5 r14-new + the 41-name r9 cohort + 4 r10 names), alphabetical
    # within a cohort (the driver samples a ~50-name prefix;
    # intra-cohort order carries no evidence signal). Ordering
    # contract: tests/test_registry_order.py.
    # -- round-15 new queries (zero driver rows) --
    "embedding_covariance_matrix",
    "pq_rebalance_plan",
    "pq_index_rebalanced",
    "stream_store_deletes",
    "stream_pq_delete_ingest",
    "stream_store_compacted",
    "corpus_group_split",
    "stream_store_asof",
    "ann_ivfpq_batch_topk",
    # -- latest driver row: round 10 (46 names) --
    "cube_revenue",
    "custkeys_both_statuses",
    "custkeys_only_finished",
    "customer_moving_spend",
    "customer_order_distribution",
    "customer_supplier_nations",
    "dedup_exact_normalized",
    "disjunctive_brand_revenue",
    "doc_boilerplate_coverage",
    "doc_boilerplate_scrubbed",
    "doc_chunks_udtf",
    "doc_length_histogram",
    "doc_token_entropy_udf",
    "doc_winnowing_fingerprints",
    "embedding_norms",
    "errors_before_purchase",
    "events_hourly",
    "events_json_stats",
    "events_props_schema_parsed",
    "events_sliding_daily",
    "near_dup_clusters",
    "near_dup_incremental",
    "near_dup_pagerank",
    "near_dup_pairs_minhash",
    "near_dup_pairs_simhash",
    "orders_benford_deviation",
    "returnflag_priority_counts",
    "semantic_dedup_bucket_nn",
    "sequence_packing",
    "session_concurrency_profile",
    "simhash_fingerprints",
    "source_epoch_allocation",
    "split_leakage_audit",
    "stream_anomaly_zscore",
    "stream_dedup_ingest_fps",
    "stream_events_hourly",
    "stream_near_dup_ingest",
    "stream_session_eviction_timing",
    "stream_tumbling_eviction_timing",
    "token_heavy_hitters",
    "token_zipf_fit",
    "training_data_manifest",
    "unigram_vocab_em_pruned",
    "user_distinct_values_salted",
    "user_eventtype_map_stats",
    "user_state_scd2",
    # -- latest driver row: round 11 (50 names) --
    "ann_ivf_topk",
    "benchmark_contamination",
    "bpe_decoded_roundtrip",
    "bpe_merge_candidates",
    "churn_train_eval",
    "corpus_lang_temperature_sampled",
    "corpus_mixture_weights",
    "corpus_model_quality_filtered",
    "corpus_quality_filtered",
    "corpus_shuffled_shards",
    "corpus_stratified_sample",
    "corpus_token_budget_fill",
    "custkeys_multiset_diff",
    "customer_pareto_class",
    "dedup_corpus",
    "dedup_exact",
    "doc_dsir_weights",
    "engineered_customer_features",
    "idle_rich_customers",
    "lang_distribution",
    "large_quantity_orders",
    "monthly_order_stats",
    "nation_acctbal_profile",
    "nation_order_coverage",
    "nation_pair_volume",
    "nation_profit_by_year",
    "order_gap_days",
    "orders_by_weekday",
    "part_type_tokens",
    "pricing_summary",
    "priority_returned_orders",
    "promo_revenue_ratio",
    "regional_customer_revenue",
    "retrieval_rrf_fused",
    "returned_revenue_by_customer",
    "returnflag_median_price_disc",
    "rollup_revenue",
    "running_customer_revenue",
    "segment_price_quantiles",
    "segment_status_pivot",
    "segment_top_orders",
    "sole_supplier_returns",
    "source_boilerplate_ngrams",
    "source_boilerplate_scrubbed",
    "stream_stateful_eviction_timing",
    "supplier_volume",
    "token_counts_bpeish",
    "top_revenue_suppliers",
    "unigram_em_prune_divergence",
    "user_event_profile",
    # -- latest driver row: round 12 (50 names) --
    "brand_supplier_counts",
    "corpus_curation_funnel",
    "corpus_curriculum_schedule",
    "corpus_decontaminated",
    "corpus_doremi_mix_fill",
    "corpus_mix_budget_ablation",
    "corpus_weighted_sample",
    "curriculum_shard_manifest",
    "customer_pseudonymized",
    "customers_no_open_orders",
    "dedup_incremental",
    "doc_learnability_rho",
    "doc_length_zscore_by_lang",
    "doc_pii_scrub",
    "doc_ppl_buckets",
    "doc_quality",
    "doc_quality_model_calibration",
    "doc_quality_model_scores",
    "doc_quality_model_train",
    "doc_repetition_stats",
    "doc_top_tfidf_term",
    "doc_unigram_logprob",
    "doc_winnowing_md5",
    "dominant_part_suppliers",
    "embedding_activation_stats",
    "embedding_class_prototypes",
    "embedding_quantization_error",
    "events_daily_rollup_merge",
    "events_variant_stats",
    "label_centroids",
    "lang_temperature_rates",
    "multimodal_decode_stats",
    "nation_balance_unpivot",
    "near_dup_pairs_jaccard",
    "source_doremi_epochs",
    "source_mixture_reweighted",
    "stream_dedup_eviction_timing",
    "stream_dedup_user_event_keys",
    "stream_doc_quality_scores",
    "stream_errors_before_purchase_outer",
    "stream_errors_before_purchase_pairs",
    "stream_events_sessionized",
    "stream_events_sliding",
    "stream_stateful_running_totals",
    "stream_static_enriched_segments",
    "stream_user_value_totals",
    "synthetic_customers",
    "token_frequencies",
    "unigram_lm_segmented",
    "unigram_seed_candidates",
    # -- latest driver row: round 13 (50 names) --
    "ann_ivfpq_rerank_topk",
    "ann_ivfpq_topk",
    "ann_lsh_topk",
    "basket_brand_pairs",
    "bm25_topk",
    "bpe_encoded_corpus",
    "bpe_fertility_by_lang",
    "bpe_trained_merges",
    "brand_discount_qty_slope",
    "cdc_chunk_dedup",
    "corpus_funnel_by_source",
    "embedding_decontamination",
    "embedding_dim_stats",
    "event_value_hour_stats",
    "events_funnel",
    "events_hourly_continuous",
    "events_latest_by_key",
    "events_sessionized",
    "events_steps_to_purchase",
    "events_trailing_burst",
    "forecast_revenue_change",
    "grouping_sets_revenue",
    "lang_nchars_median_udaf",
    "langid_heuristic",
    "lineitem_distinct_stats",
    "local_supplier_revenue",
    "multimodal_dedup_by_digest",
    "multimodal_frame_samples",
    "nation_eventtype_matrix",
    "nation_market_share",
    "nation_value_concentration",
    "near_dup_canonical_by_source",
    "near_dup_cross_source_matrix",
    "orders_retention_cohort",
    "part_best_supplier",
    "part_type_edit_distance",
    "pq_code_histogram",
    "pq_quantization_error",
    "priority_order_counts",
    "purchase_last_view_asof",
    "revenue_by_segment",
    "segment_acctbal_top_decile",
    "segment_balance_flags",
    "small_quantity_revenue",
    "source_unigram_kl",
    "stream_ingest_funnel",
    "stream_semantic_dedup_ingest",
    "tokenizer_fertility_by_lang",
    "top_orders_by_revenue",
    "unigram_vocab_pruned",
    # -- latest driver row: round 14 (50 names) --
    "ab_conversion_ztest",
    "above_average_orders",
    "ann_ivfpq_adaptive_topk",
    "ann_ivfpq_filtered_topk",
    "brand_revenue",
    "corpus_boilerplate_ngrams",
    "corpus_prepared",
    "corpus_shard_skew_report",
    "corpus_sketch_stats",
    "corpus_training_mix_fill",
    "customer_drift_profile",
    "customer_fuzzy_matches",
    "customer_revenue_gini",
    "customer_rfm_segments",
    "dedup_source_priority",
    "doc_bigram_logprob",
    "doc_containment_md5",
    "doc_dup_span_coverage",
    "doc_dup_span_scrubbed",
    "doc_ngram_novelty",
    "doc_stats",
    "doc_token_entropy",
    "embedding_corr_matrix",
    "embedding_hard_negatives",
    "embedding_near_dup_pairs",
    "embedding_pca_variance",
    "embedding_split_drift",
    "event_transition_matrix",
    "events_anomaly_zscore",
    "events_dau_wau",
    "events_funnel_windowed",
    "events_gap_fill",
    "knn_cosine_bruteforce",
    "knn_cosine_bruteforce_filtered",
    "langid_confusion",
    "multimodal_features",
    "near_dup_cluster_size_histogram",
    "near_dup_jaccard_histogram",
    "packing_efficiency_report",
    "pii_prevalence_by_source",
    "pq_cell_stats",
    "quality_rule_breakdown",
    "segment_value_salted_join",
    "ship_delay_profile",
    "simhash_md5",
    "source_learnability_mix",
    "stream_pii_scrub_ingest",
    "stream_pq_encode_ingest",
    "unigram_vocab_em",
    "user_value_totals_salted",
]


def _ordered_names() -> list[str]:
    missing = [n for n in CHECK_PRIORITY if n not in registry.QUERIES]
    if missing:  # a renamed/removed query must fail loudly, not skew the order
        raise KeyError(f"CHECK_PRIORITY names not in registry: {missing}")
    rest = [n for n in registry.QUERIES if n not in set(CHECK_PRIORITY)]
    return CHECK_PRIORITY + rest


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    tune(spark)
    return registry.QUERIES["revenue_by_segment"](spark, SMOKE_SF_DIR)


def _tuned(fn: registry.QueryFn) -> registry.QueryFn:
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        tune(spark)
        return fn(spark, sf_dir)

    return wrapped


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: _tuned(registry.QUERIES[name]) for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return {
        name: registry.ORACLES[name]
        for name in _ordered_names()
        if name in registry.ORACLES
    }
