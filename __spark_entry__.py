"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The real implementation lives in ``airflow_ml_pipeline_spark``; this module
exposes the engine's declared-query registry
(airflow_ml_pipeline_spark/plans/registry.py) in an explicit verification
priority order: the driver's correctness budget is a prefix of this dict.
Round-3 rotation: entries FIXED or RESTRUCTURED this round lead (the five
watermark streaming queries un-broken by the TIMESTAMP_NTZ normalization,
the oracle-dtype and canonicalizer fixes, the reshaped embedding near-dup
and pointer-doubled cluster CC), then the ts-arithmetic batch paths the
same NTZ fix restored, then the ~29 tier-2 queries that have never had a
driver row in rounds 1-2, then one green anchor per operator family so a
regression in an already-verified family is still witnessed.
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
import airflow_ml_pipeline_spark.operators.analytics  # noqa: F401,E402
import airflow_ml_pipeline_spark.streaming.queries  # noqa: F401,E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"

#: Verification priority: the first ~50 names are the round-3 target set.
#: Anything not listed follows in registry (module/line) order.
CHECK_PRIORITY = [
    # fixed this round — witness the fixes (r02: all five erred on
    # TIMESTAMP_NTZ watermarks; map-stats hash-failed on a HUGEINT oracle;
    # multimodal_features crashed the driver canonicalizer on array cells)
    "stream_events_hourly",
    "stream_events_sessionized",
    "stream_dedup_user_event_keys",
    "stream_events_sliding",
    "stream_errors_before_purchase_pairs",
    "user_eventtype_map_stats",
    "multimodal_features",
    # ts-arithmetic batch paths restored by the same NTZ normalization
    # (r02 bench crashed at purchase_last_view_asof)
    "purchase_last_view_asof",
    "events_trailing_burst",
    "events_sessionized",
    "events_hourly_continuous",
    # restructured this round (plan/algorithm changed) — re-witness green
    "near_dup_clusters",
    "embedding_near_dup_pairs",
    "stream_stateful_running_totals",
    # never-driver-checked TPC-H shapes (Q5/Q6/Q8/Q2/Q11/Q16/Q20)
    "local_supplier_revenue",
    "forecast_revenue_change",
    "nation_market_share",
    "part_best_supplier",
    "nation_value_concentration",
    "brand_supplier_counts",
    "dominant_part_suppliers",
    # never-checked relational / temporal / semi-structured tier-2
    "events_funnel",
    "orders_retention_cohort",
    "events_latest_by_key",
    "user_value_totals_salted",
    "segment_value_salted_join",
    "corpus_weighted_sample",
    "part_type_edit_distance",
    "segment_acctbal_top_decile",
    "nation_eventtype_matrix",
    "ship_delay_profile",
    "segment_balance_flags",
    "embedding_activation_stats",
    # never-checked LLM-data tier-2
    "customer_pseudonymized",
    "embedding_dim_stats",
    "corpus_decontaminated",
    "langid_heuristic",
    "doc_unigram_logprob",
    "embedding_decontamination",
    "simhash_md5",
    "doc_pii_scrub",
    "dedup_incremental",
    "multimodal_frame_samples",
    # green anchors — one per already-verified operator family
    "returnflag_priority_counts",  # conditional hash agg (r1-fix witness)
    "corpus_sketch_stats",  # sketches / mergeable rollup
    "corpus_prepared",  # composed LSH dedup pipeline
    "doc_stats",  # text analysis
    "lang_nchars_median_udaf",  # UDAF surface
    "knn_cosine_bruteforce",  # similarity
    "customer_drift_profile",  # ML-pipeline oracle anchor
    # --- tier 2: checked only if the driver's budget exceeds the prefix ---
    # (never-checked plan twins of prefix entries + the rows-only ML
    # train/eval first, then the r01/r02-green remainder, family-grouped)
    "churn_train_eval",
    "multimodal_decode_stats",
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
    "doc_token_entropy",
    "token_frequencies",
    "doc_quality",
    "corpus_quality_filtered",
    "doc_top_tfidf_term",
    "corpus_shuffled_shards",
    "sequence_packing",
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
    "stream_user_value_totals",
    "stream_static_enriched_segments",
    "doc_chunks_udtf",
    "events_hourly",
    "events_sliding_daily",
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
