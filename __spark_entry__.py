"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The real implementation lives in ``airflow_ml_pipeline_spark``; this module
exposes the engine's declared-query registry
(airflow_ml_pipeline_spark/plans/registry.py) in an explicit verification
priority order: the driver's correctness budget is a prefix of this dict.
Round-4 rotation (closing the evidence gap): the 11 registry queries that
have never had a driver row in rounds 1-3 lead; then every query whose
code path CHANGED this round (simhash tiny-doc filter, rollup cache
re-keying, tz-independent NTZ normalization, cluster-CC restructure,
entropy twin); then one green anchor per operator family; the remainder
re-witnesses round 1's relational block, which has not had a driver row
since r1. After this round every one of the registry entries has driver
evidence in at least one CORRECTNESS_r0N.json.
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

#: Verification priority: the first ~50 names are the round-4 target set.
#: Anything not listed follows in registry (module/line) order.
CHECK_PRIORITY = [
    # the 11 registry queries never driver-witnessed in rounds 1-3
    # (round-3 VERDICT "Next round" item 1) — every one closes the
    # evidence gap for its family's remaining plan twin
    "simhash_fingerprints",
    "errors_before_purchase",
    "returnflag_median_price_disc",
    "orders_by_weekday",
    "events_gap_fill",
    "doc_winnowing_fingerprints",
    "token_counts_bpeish",
    "lang_distribution",
    "doc_length_histogram",
    "dedup_exact_normalized",
    "embedding_norms",
    # code paths CHANGED this round — re-witness green
    "simhash_md5",  # tiny-doc zero-gram filter (r3 ADVICE)
    # (events_hourly_continuous dropped from the prefix: r3-green, and its
    # r4 change was cache re-keying, not query semantics — follows in
    # registry order)
    "stream_events_hourly",  # tz-independent NTZ normalization (scan boundary)
    "purchase_last_view_asof",  # same NTZ path, batch ts arithmetic
    "near_dup_clusters",  # pointer-doubling checkpoint restructure
    "doc_token_entropy",  # rewritten as built-in expression (was pandas_udf)
    "doc_token_entropy_udf",  # the pandas_udf surface demo, kept declared
    # queries NEW this round — zero driver evidence yet, so they outrank
    # the (already r1-r3-witnessed) family anchors below
    "user_distinct_values_salted",  # NEW: value-salted exact distinct count
    "doc_containment_md5",  # NEW: asymmetric containment (quote) detection
    "dedup_source_priority",  # NEW: source-priority keep policy
    "doc_dup_span_coverage",  # NEW: substring-level duplication coverage
    "semantic_dedup_bucket_nn",  # NEW: SemDeDup cluster-then-prune, oracle-checked
    "near_dup_incremental",  # NEW: batch near-dedup vs the historical fp store
    "embedding_corr_matrix",  # NEW: one-pass Gram correlation profile
    "doc_dup_span_scrubbed",  # NEW: duplicated-span removal (apply step)
    "stream_near_dup_ingest",  # NEW: containment suppression at ingest
    "stream_dedup_ingest_fps",  # NEW: foreachBatch dedup-at-ingest store
    "bpe_trained_merges",  # NEW: iterative BPE training loop (rows-only)
    "training_data_manifest",  # NEW: per-shard handoff manifest w/ checksums
    "split_leakage_audit",  # NEW: near-dup pairs crossing the train/eval split
    "cdc_chunk_dedup",  # NEW: content-defined chunking storage dedup
    "token_zipf_fit",  # NEW: corpus-level Zipf regression sanity gate
    "doc_bigram_logprob",  # NEW: interpolated bigram LM quality score
    "bm25_topk",  # NEW: sparse (lexical) retrieval beside the dense ANN path
    "retrieval_rrf_fused",  # NEW: reciprocal-rank fusion of sparse + dense
    "event_transition_matrix",  # NEW: Markov next-event matrix
    "user_state_scd2",  # NEW: SCD2 validity intervals from the changelog
    "ab_conversion_ztest",  # NEW: two-proportion experiment readout
    # one green anchor per already-verified operator family
    "user_eventtype_map_stats",  # semi-structured (map/JSON) family
    "returnflag_priority_counts",  # conditional hash agg
    "cube_revenue",  # rollup/cube/grouping-sets (also re-benched this round)
    "corpus_sketch_stats",  # sketches / mergeable rollup
    "corpus_prepared",  # composed LSH dedup pipeline
    "doc_stats",  # text analysis
    "lang_nchars_median_udaf",  # UDAF surface
    "doc_chunks_udtf",  # UDTF surface
    "knn_cosine_bruteforce",  # similarity
    "sequence_packing",  # serving ops
    # (corpus_weighted_sample retired: curation is repped by
    # near_dup_clusters in the changed-paths block)
    # (dedup_incremental / embedding_decontamination anchors retired from
    # the prefix: their families are re-witnessed via corpus_prepared and
    # the round's new dedup/decontamination-adjacent queries above)
    "multimodal_features",  # multimodal plumbing
    "customer_drift_profile",  # ML-pipeline oracle anchor
    "stream_stateful_running_totals",  # stateful streaming
    "events_funnel",  # temporal/window family
    "local_supplier_revenue",  # TPC-H join shapes (Q5)
    "user_value_totals_salted",  # skew helpers (also skew-benched this round)
    # remainder of the ~50 budget: re-witness round 1's relational block
    # (green in r1, no driver row since)
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
    # --- tier 2: checked only if the driver's budget exceeds the prefix ---
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
