"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The real implementation lives in ``airflow_ml_pipeline_spark``; this module
exposes the engine's declared-query registry
(airflow_ml_pipeline_spark/plans/registry.py) in an explicit verification
priority order: the driver's correctness budget is a prefix of this dict, so
the prefix is arranged to cover every SURVEY.md §2 operator family —
dedup/similarity/text-analysis/streaming/ML-pipeline/multimodal first (zero
CORRECTNESS rows in round 1), then representative relational anchors, then
the remaining TPC-H-shape variants whose operator families are already
covered by an earlier entry.
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

#: Verification priority: the first ~50 names cover every operator family.
#: Anything not listed follows in registry (module/line) order.
CHECK_PRIORITY = [
    # declared-but-never-checked relational/semi-structured surfaces
    "custkeys_multiset_diff",
    "events_variant_stats",
    "user_eventtype_map_stats",
    "nation_balance_unpivot",
    # round-1 hash fix + self-verifying sketches (incl. two-level mergeable
    # rollup: decimal sum-of-sums + lossless HLL union)
    "returnflag_priority_counts",
    "corpus_sketch_stats",
    "events_daily_rollup_merge",
    # corpus-curation ops (contamination, sampling, repetition, quantization,
    # budget fill, cluster dedup, mixture weights)
    "benchmark_contamination",
    "corpus_stratified_sample",
    "doc_repetition_stats",
    "embedding_quantization_error",
    "corpus_token_budget_fill",
    "near_dup_clusters",
    "corpus_mixture_weights",
    # pandas UDF / UDTF / UDAF surface (doc_chunks_udtf: green in r01)
    "doc_length_zscore_by_lang",
    "doc_token_entropy",
    "lang_nchars_median_udaf",
    # text analysis (lang_distribution/token_counts_bpeish/langid_heuristic
    # are tier 2: per-lang grouping and token counting are exercised by the
    # UDAF/zscore queries above and the serving block below)
    "doc_stats",
    "token_frequencies",
    "doc_quality",
    "corpus_quality_filtered",
    "doc_top_tfidf_term",
    # training-data serving (deterministic shuffle/shard, concat-and-chunk
    # packing via distributed prefix sum, tokenizer merge statistics)
    "corpus_shuffled_shards",
    "sequence_packing",
    "bpe_merge_candidates",
    # dedup family (dedup_exact_normalized: same plan shape as dedup_exact,
    # follows right after the prefix)
    "dedup_exact",
    "dedup_corpus",
    "near_dup_pairs_jaccard",
    "near_dup_pairs_minhash",
    "doc_winnowing_md5",
    "corpus_prepared",
    # similarity / ANN family (embedding_norms: trivial projection twin of
    # knn_cosine_bruteforce, follows right after the prefix)
    "knn_cosine_bruteforce",
    "label_centroids",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "embedding_near_dup_pairs",
    # ML pipeline visible queries
    "synthetic_customers",
    "engineered_customer_features",
    "customer_drift_profile",
    "churn_train_eval",
    # multimodal plumbing
    "multimodal_decode_stats",
    "multimodal_features",
    # structured streaming (AvailableNow) family
    "stream_events_hourly",
    "stream_events_sessionized",
    "stream_dedup_user_event_keys",
    "stream_stateful_running_totals",
    "stream_user_value_totals",
    "stream_static_enriched_segments",
    "stream_events_sliding",
    "stream_errors_before_purchase_pairs",
    # --- tier 2: checked only if the driver's budget exceeds the prefix ---
    # (never-driver-checked variants first — incl. the rows-only fingerprint
    # twins whose oracle siblings sit in tier 1 — then the round-1-green rest
    # in registry order)
    "events_latest_by_key",
    "lang_distribution",
    "token_counts_bpeish",
    "langid_heuristic",
    "customer_pseudonymized",
    "embedding_dim_stats",
    "local_supplier_revenue",
    "forecast_revenue_change",
    "doc_length_histogram",
    "corpus_decontaminated",
    "nation_market_share",
    "part_best_supplier",
    "nation_value_concentration",
    "brand_supplier_counts",
    "dominant_part_suppliers",
    "simhash_fingerprints",
    "doc_winnowing_fingerprints",
    "events_funnel",
    "orders_retention_cohort",
    "dedup_exact_normalized",
    "embedding_norms",
    "doc_chunks_udtf",
    "orders_by_weekday",
    "part_type_edit_distance",
    "errors_before_purchase",
    "segment_acctbal_top_decile",
    "embedding_activation_stats",
    "events_gap_fill",
    "nation_eventtype_matrix",
    "ship_delay_profile",
    "returnflag_median_price_disc",
    "segment_balance_flags",
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
