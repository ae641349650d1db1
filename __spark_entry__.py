"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The real implementation lives in ``airflow_ml_pipeline_spark``; this module
exposes the engine's declared-query registry
(airflow_ml_pipeline_spark/plans/registry.py) in an explicit verification
priority order: the driver's correctness budget is a prefix of this dict.
Round-5 rotation: no CORRECTNESS_r04.json reached the repo, so round 4's
driver evidence is unconfirmed and this prefix assumes the worst — the
round-5 additions lead, then round 4's additions, then the 11 queries
that had no driver row in rounds 1-3, then one green anchor per operator
family (the ordering contract lives in tests/test_registry_order.py).
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
import airflow_ml_pipeline_spark.operators.grouped_pandas  # noqa: F401,E402
import airflow_ml_pipeline_spark.operators.mlops  # noqa: F401,E402
import airflow_ml_pipeline_spark.operators.multimodal  # noqa: F401,E402
import airflow_ml_pipeline_spark.operators.corpus_ops  # noqa: F401,E402
import airflow_ml_pipeline_spark.operators.packing  # noqa: F401,E402
import airflow_ml_pipeline_spark.operators.manifest  # noqa: F401,E402
import airflow_ml_pipeline_spark.operators.analytics  # noqa: F401,E402
import airflow_ml_pipeline_spark.streaming.queries  # noqa: F401,E402
import airflow_ml_pipeline_spark.streaming.ingest  # noqa: F401,E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"

#: Verification priority: the first ~50 names are the round-5 target set.
#: Anything not listed follows in registry (module/line) order.
CHECK_PRIORITY = [
    # ---- round-5 rotation ----
    # No CORRECTNESS_r04.json reached the repo, so round 4's driver
    # evidence is unconfirmed; this prefix assumes the worst: (A) the
    # queries NEW this round, (B) round 4's additions, (C) the 11
    # queries with no driver row in rounds 1-3, then (D) one green
    # anchor per family (contract: tests/test_registry_order.py).
    # -- (A) new this round --
    "near_dup_pairs_simhash",  # NEW: pigeonhole-exact Hamming-band LSH
    "doc_ngram_novelty",  # NEW: first-occurrence novelty fraction
    "events_anomaly_zscore",  # NEW: trailing z-score tripwire
    "customer_pareto_class",  # NEW: ABC cut via two-phase prefix sum
    "session_concurrency_profile",  # NEW: sweep-line hourly peak
    "bpe_encoded_corpus",  # NEW: frozen-tokenizer encode, oracle-checked
    "token_heavy_hitters",  # NEW: freqItems-witnessed top-k
    "embedding_pca_variance",  # NEW: distributed PCA (rows-only)
    "near_dup_pagerank",  # NEW: canonical-doc centrality, unrolled-CTE oracle
    "orders_benford_deviation",  # NEW: first-digit forensic gate
    "customer_fuzzy_matches",  # NEW: FastSS entity resolution
    "stream_anomaly_zscore",  # NEW: stateful streaming anomaly twin
    "embedding_hard_negatives",  # NEW: contrastive-pair mining
    "basket_brand_pairs",  # NEW: market-basket association rules
    "customer_rfm_segments",  # NEW: RFM quintile segmentation
    "brand_discount_qty_slope",  # NEW: grouped OLS regression
    "events_funnel_windowed",  # NEW: time-boxed funnel
    "customer_revenue_gini",  # NEW: distributed-rank Gini coefficient
    # -- (B) round-4 additions --
    "user_distinct_values_salted",
    "doc_containment_md5",
    "dedup_source_priority",
    "doc_dup_span_coverage",
    "semantic_dedup_bucket_nn",
    "near_dup_incremental",
    "embedding_corr_matrix",
    "doc_dup_span_scrubbed",
    "stream_near_dup_ingest",
    "stream_dedup_ingest_fps",
    "bpe_trained_merges",
    "training_data_manifest",
    "split_leakage_audit",
    "cdc_chunk_dedup",
    "token_zipf_fit",
    "doc_bigram_logprob",
    "bm25_topk",
    "event_transition_matrix",
    "user_state_scd2",
    # -- (C) no driver row in rounds 1-3 (r4 evidence unconfirmed) --
    "events_gap_fill",  # also the temporal family anchor
    # -- (D) one green anchor per remaining family --
    "returnflag_priority_counts",  # relational
    "user_eventtype_map_stats",  # semi-structured
    "corpus_sketch_stats",  # sketches
    "doc_token_entropy",  # pandas-udf family twin
    "doc_stats",  # textstats
    "sequence_packing",  # serving
    "corpus_prepared",  # dedup composition
    "near_dup_clusters",  # curation
    "knn_cosine_bruteforce",  # similarity
    "customer_drift_profile",  # ml-pipeline
    "multimodal_features",  # multimodal
    "stream_events_hourly",  # streaming
    # --- tier 2: checked only if the driver budget exceeds the prefix ---
    # displaced for budget, immediately after the prefix:
    # errors_before_purchase (range-join shape re-witnessed via its
    # streaming twin), retrieval_rrf_fused (its two constituent rankings
    # are independently checked; the fusion is O(top_k) integer ranks),
    # ab_conversion_ztest (integer-count z arithmetic over a per-user
    # aggregation shape the prefix witnesses via the transition matrix
    # and SCD2)
    "errors_before_purchase",
    "retrieval_rrf_fused",
    "ab_conversion_ztest",
    # remaining (C)-block members displaced for budget, each with its
    # re-witnessing argument:
    # - orders_by_weekday / returnflag_median_price_disc /
    #   doc_length_histogram / lang_distribution / token_counts_bpeish:
    #   single-pass projection+hash-agg plan twins of prefix-checked
    #   queries (ship_delay_profile, segment_price_quantiles, doc_stats)
    # - doc_winnowing_fingerprints / simhash_fingerprints: xxhash64 fast
    #   paths whose full algebra is value-checked by the md5 twins
    #   (doc_winnowing_md5, simhash_md5, near_dup_pairs_simhash)
    # - dedup_exact_normalized: dedup_exact + a projection, family
    #   re-witnessed via corpus_prepared and the round's dedup block
    # - embedding_norms: the norm kernel is inside every checked cosine
    #   query and embedding_dim_stats
    "orders_by_weekday",
    "returnflag_median_price_disc",
    "doc_length_histogram",
    "doc_winnowing_fingerprints",
    "dedup_exact_normalized",
    "lang_distribution",
    "token_counts_bpeish",
    "simhash_fingerprints",
    "embedding_norms",
    "simhash_md5",
    "stream_stateful_running_totals",
    "events_funnel",
    "local_supplier_revenue",
    "user_value_totals_salted",
    "doc_token_entropy_udf",
    "purchase_last_view_asof",
    "pricing_summary",
    "revenue_by_segment",
    "top_orders_by_revenue",
    "regional_customer_revenue",
    "priority_returned_orders",
    "customers_no_open_orders",
    "rollup_revenue",
    "lineitem_distinct_stats",
    "custkeys_both_statuses",
    "brand_revenue",
    "order_gap_days",
    "running_customer_revenue",
    "segment_top_orders",
    "segment_status_pivot",
    "above_average_orders",
    "customer_moving_spend",
    "segment_price_quantiles",
    "monthly_order_stats",
    "grouping_sets_revenue",
    "events_props_schema_parsed",
    "events_json_stats",
    "user_event_profile",
    "events_trailing_burst",
    "events_sessionized",
    "custkeys_only_finished",
    "supplier_volume",
    "nation_acctbal_profile",
    "nation_order_coverage",
    "customer_supplier_nations",
    "part_type_tokens",
    "large_quantity_orders",
    "promo_revenue_ratio",
    "top_revenue_suppliers",
    "returned_revenue_by_customer",
    "priority_order_counts",
    "customer_order_distribution",
    "small_quantity_revenue",
    "disjunctive_brand_revenue",
    "sole_supplier_returns",
    "idle_rich_customers",
    "nation_pair_volume",
    "nation_profit_by_year",
    "event_value_hour_stats",
    "events_hourly",
    "events_sliding_daily",
    "stream_events_sessionized",
    "stream_dedup_user_event_keys",
    "stream_events_sliding",
    "stream_errors_before_purchase_pairs",
    "stream_user_value_totals",
    "stream_static_enriched_segments",
    "forecast_revenue_change",
    "nation_market_share",
    "part_best_supplier",
    "nation_value_concentration",
    "brand_supplier_counts",
    "dominant_part_suppliers",
    "orders_retention_cohort",
    "events_latest_by_key",
    "segment_value_salted_join",
    "part_type_edit_distance",
    "segment_acctbal_top_decile",
    "nation_eventtype_matrix",
    "ship_delay_profile",
    "segment_balance_flags",
    "embedding_activation_stats",
    "customer_pseudonymized",
    "embedding_dim_stats",
    "corpus_decontaminated",
    "langid_heuristic",
    "doc_unigram_logprob",
    "doc_pii_scrub",
    "multimodal_frame_samples",
    "churn_train_eval",
    "multimodal_decode_stats",
    "custkeys_multiset_diff",
    "events_variant_stats",
    "nation_balance_unpivot",
    "events_daily_rollup_merge",
    "benchmark_contamination",
    "corpus_stratified_sample",
    "doc_repetition_stats",
    "embedding_quantization_error",
    "corpus_token_budget_fill",
    "corpus_mixture_weights",
    "doc_length_zscore_by_lang",
    "token_frequencies",
    "doc_quality",
    "corpus_quality_filtered",
    "doc_top_tfidf_term",
    "corpus_shuffled_shards",
    "bpe_merge_candidates",
    "dedup_exact",
    "dedup_corpus",
    "near_dup_pairs_jaccard",
    "near_dup_pairs_minhash",
    "doc_winnowing_md5",
    "label_centroids",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "synthetic_customers",
    "engineered_customer_features",
    "embedding_near_dup_pairs",
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
