"""Benchmark harness: runs the engine's declared queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": <sf>}

Each query is executed to completion (count + a cheap checksum action) —
results are NOT collected to the driver beyond the count, matching how a
production job would terminate in a sink.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

#: Headline queries: every operator family, weighted toward the
#: shuffle/join-heavy ones that dominate at scale.
HEADLINE = [
    "pricing_summary",
    "revenue_by_segment",
    "top_orders_by_revenue",
    "regional_customer_revenue",
    "priority_returned_orders",
    "rollup_revenue",
    "lineitem_distinct_stats",
    "brand_revenue",
    "supplier_volume",
    "order_gap_days",
    "running_customer_revenue",
    "segment_top_orders",
    "cube_revenue",
    "segment_status_pivot",
    "nation_balance_unpivot",
    "nation_order_coverage",
    "customer_moving_spend",
    "segment_price_quantiles",
    "returnflag_median_price_disc",
    "monthly_order_stats",
    "ship_delay_profile",
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
    "errors_before_purchase",
    "segment_acctbal_top_decile",
    "embedding_activation_stats",
    "purchase_last_view_asof",
    "events_trailing_burst",
    "events_gap_fill",
    "events_hourly",
    "events_sliding_daily",
    "events_json_stats",
    "events_sessionized",
    "events_props_schema_parsed",
    "stream_events_hourly",
    "stream_stateful_running_totals",
    "grouping_sets_revenue",
    "token_frequencies",
    "doc_quality",
    "corpus_quality_filtered",
    "doc_top_tfidf_term",
    "doc_length_zscore_by_lang",
    "doc_token_entropy",
    "doc_chunks_udtf",
    "lang_nchars_median_udaf",
    "events_variant_stats",
    "dedup_exact",
    "dedup_corpus",
    "corpus_prepared",
    "near_dup_pairs_jaccard",
    "near_dup_pairs_minhash",
    "simhash_fingerprints",
    "doc_winnowing_fingerprints",
    "doc_winnowing_md5",
    "knn_cosine_bruteforce",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "embedding_near_dup_pairs",
    "label_centroids",
    "stream_static_enriched_segments",
    "stream_errors_before_purchase_pairs",
]


def main() -> None:
    from airflow_ml_pipeline_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("bench", master=f"local[{CPUS}]")
    qs = entrymod.queries()
    names = [n for n in HEADLINE if n in qs] + [
        n for n in qs if n not in HEADLINE and os.environ.get("BENCH_ALL")
    ]

    # warm the JVM, codegen, and parquet footer caches so the first timed
    # query doesn't absorb session startup costs
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()
    from pyspark.sql import functions as F

    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").groupBy("l_returnflag").agg(
        F.count(F.lit(1))
    ).collect()

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.time()
        df = qs[name](spark, SF_DIR)
        n = df.count()
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {n} rows in {timings[name]}s", file=sys.stderr)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    out = {
        "metric": "declared_query_suite_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
