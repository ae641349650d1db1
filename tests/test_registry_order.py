"""Verification-ordering contract: the driver checks a prefix of
``__spark_entry__.queries()``, so the prefix must spend its budget where
evidence is thinnest, without ever leaving an operator family unwitnessed.

Round-8 form of the contract: newly declared queries (zero driver rows)
lead the prefix; the rest of the list covers the ENTIRE registry ordered
by evidence age, and the list must stay a superset of the registry
(VERDICT r7 ask #3 — the near_dup_canonical_by_source gap class: a query
registered but absent from CHECK_PRIORITY silently got no driver slot).
Family coverage stays CUMULATIVE — a family is covered if a
representative is either in the current prefix or already has a green
row in a committed ``CORRECTNESS_r0N.json``.
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess

import __spark_entry__ as entry
from airflow_ml_pipeline_spark.plans import registry

REPO = os.path.dirname(os.path.abspath(entry.__file__))
PREFIX = 50

#: queries with no driver row of any kind as of round-14 start. The r13
#: driver run witnessed every r12 and r13 name previously listed here
#: (CORRECTNESS_r13: 50/50 green, committed in fc8cb65), so the set is
#: pruned per the standing rotation rule — a stale entry would protect
#: queries that no longer need protection at the expense of the
#: oldest-evidence cohorts. Every query newly declared in round 14 MUST
#: be added here (and to the head of CHECK_PRIORITY) until it earns a
#: driver row.
NEVER_WITNESSED: set[str] = {
    # r15 new queries (the r14 batch earned green rows in
    # CORRECTNESS_r14.json, committed at round-15 start, so it is pruned
    # per the standing rotation rule)
    "embedding_covariance_matrix",
    "pq_rebalance_plan",
    "pq_index_rebalanced",
    "stream_store_deletes",
    "stream_pq_delete_ingest",
    "stream_store_compacted",
    "corpus_group_split",
    "stream_store_asof",
    "ann_ivfpq_batch_topk",
}

#: every operator family must have at least one representative with driver
#: evidence — in the live prefix or in committed correctness history
FAMILY_REPRESENTATIVES = {
    "relational": {"custkeys_multiset_diff", "nation_balance_unpivot",
                   "returnflag_priority_counts", "local_supplier_revenue",
                   "pricing_summary", "brand_revenue"},
    "semi_structured": {"events_variant_stats", "user_eventtype_map_stats",
                        "events_json_stats", "events_props_schema_parsed"},
    "sketches": {"corpus_sketch_stats", "events_daily_rollup_merge"},
    "pandas_udf": {"doc_length_zscore_by_lang", "doc_token_entropy",
                   "lang_nchars_median_udaf", "doc_token_entropy_udf",
                   "doc_chunks_udtf"},
    "textstats": {"doc_stats", "doc_quality", "token_frequencies",
                  "doc_top_tfidf_term", "lang_distribution",
                  "doc_length_histogram", "token_counts_bpeish"},
    "serving": {"corpus_shuffled_shards", "sequence_packing",
                "bpe_merge_candidates", "customer_pseudonymized"},
    "dedup": {"dedup_exact", "dedup_corpus", "near_dup_pairs_jaccard",
              "near_dup_pairs_minhash", "corpus_prepared",
              "dedup_exact_normalized", "simhash_fingerprints",
              "doc_winnowing_fingerprints"},
    "curation": {"benchmark_contamination", "corpus_stratified_sample",
                 "near_dup_clusters", "corpus_token_budget_fill",
                 "corpus_decontaminated"},
    "similarity": {"knn_cosine_bruteforce", "label_centroids", "ann_lsh_topk",
                   "ann_ivf_topk", "embedding_near_dup_pairs",
                   "embedding_norms"},
    "ml_pipeline": {"synthetic_customers", "engineered_customer_features",
                    "customer_drift_profile", "churn_train_eval",
                    "ab_conversion_ztest"},
    "multimodal": {"multimodal_decode_stats", "multimodal_features"},
    "temporal": {"purchase_last_view_asof", "events_trailing_burst",
                 "events_sessionized", "events_gap_fill",
                 "errors_before_purchase", "orders_by_weekday"},
    "retrieval": {"bm25_topk", "retrieval_rrf_fused"},
    "pq_index": {"ann_ivfpq_topk", "ann_ivfpq_rerank_topk",
                 "pq_quantization_error", "pq_code_histogram"},
    "quality_model": {"doc_quality_model_scores", "doc_quality_model_train",
                      "corpus_model_quality_filtered"},
    "selection": {"doc_dsir_weights", "doc_ppl_buckets",
                  "lang_temperature_rates",
                  "corpus_lang_temperature_sampled"},
    "bpe_lifecycle": {"bpe_trained_merges", "bpe_encoded_corpus",
                      "bpe_decoded_roundtrip"},
    "unigram_lm": {"unigram_seed_candidates", "unigram_lm_segmented"},
    "streaming": {f"stream_{s}" for s in (
        "events_hourly", "events_sessionized", "dedup_user_event_keys",
        "stateful_running_totals", "user_value_totals",
        "static_enriched_segments", "events_sliding",
        "errors_before_purchase_pairs", "errors_before_purchase_outer")},
}


def _committed_rows() -> dict[str, list[dict]]:
    """name -> rows across every CORRECTNESS_r0N.json tracked by git."""
    tracked = subprocess.run(
        ["git", "ls-files", "CORRECTNESS_r*.json"],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout.split()
    rows: dict[str, list[dict]] = {}
    for path in tracked:
        with open(os.path.join(REPO, path)) as f:
            for name, row in json.load(f).items():
                rows.setdefault(name, []).append(row)
    return rows


def _committed_witnessed() -> set[str]:
    """Names with ANY driver row (the 'never witnessed' ledger counts
    rows-only and even red rows as witnessed — the driver ran it)."""
    return set(_committed_rows())


def _committed_green() -> set[str]:
    """Names with a fully-green driver row: rows/schema/hash all matched
    and no error. Rows-only rows (err='no_oracle') and historical
    hash-fails do NOT count (review finding: the family-evidence guard
    must enforce the 'green row' contract it documents)."""
    return {
        name
        for name, rows in _committed_rows().items()
        if any(
            r.get("rows_match")
            and r.get("schema_match")
            and r.get("hash_match")
            and not r.get("err")
            for r in rows
        )
    }


def test_priority_names_exist_and_are_unique():
    names = entry.CHECK_PRIORITY
    assert len(names) == len(set(names))
    missing = [n for n in names if n not in registry.QUERIES]
    assert missing == []


def test_every_registered_query_has_a_priority_slot():
    """Inverse containment (VERDICT r7 ask #3): a query that registers
    without appearing in CHECK_PRIORITY gets no explicit driver slot —
    exactly how near_dup_canonical_by_source shipped with zero evidence
    in round 7. registry ⊆ CHECK_PRIORITY, checked by name."""
    unlisted = [n for n in registry.QUERIES if n not in set(entry.CHECK_PRIORITY)]
    assert unlisted == [], (
        f"registered queries missing from CHECK_PRIORITY: {unlisted} — "
        f"add each to the priority list (new queries go at the head)"
    )


def test_never_witnessed_lead_the_prefix():
    """Until every declared query has a driver row, the unwitnessed ones
    outrank everything else — they cannot be displaced by new queries."""
    ordered = list(entry.queries())
    still_unwitnessed = NEVER_WITNESSED - _committed_witnessed()
    head = set(ordered[: len(NEVER_WITNESSED)])
    assert still_unwitnessed <= head, (
        f"unwitnessed queries displaced from prefix head: "
        f"{sorted(still_unwitnessed - head)}"
    )


def test_every_family_has_driver_evidence():
    """Family coverage is cumulative: live prefix OR committed GREEN row
    (a rows-only or errored row is not evidence the family's results
    match the oracle)."""
    covered = set(list(entry.queries())[:PREFIX]) | _committed_green()
    for family, reps in FAMILY_REPRESENTATIVES.items():
        assert reps & covered, f"family {family} has no driver evidence"


def test_ordering_preserves_full_registry():
    ordered = list(entry.queries())
    assert sorted(ordered) == sorted(registry.QUERIES)
    oracles = entry.oracle_sql()
    assert sorted(oracles) == sorted(registry.ORACLES)
    # every oracled name is a declared query
    assert set(oracles) <= set(ordered)


def test_round_artifacts_are_committed():
    """Recurrence guard (VERDICT r5 "What's wrong" #1): three rounds
    running, the driver-evidence artifacts (CORRECTNESS_r0N.json /
    BENCH_r0N.json) sat untracked in the working tree, so the repo's
    verification claims had no in-git evidence. Fail the suite when a
    STALE round artifact is untracked — i.e. one with a newer round
    present on disk. The newest round's files may legitimately be
    untracked for the moment between the driver writing them and the
    round-end commit, so only strictly-older rounds fire the guard.
    """
    paths = glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")) + glob.glob(
        os.path.join(REPO, "BENCH_r*.json")
    )
    rounds = {}
    for p in paths:
        m = re.search(r"_r0*(\d+)\.json$", p)
        if m:
            rounds.setdefault(int(m.group(1)), []).append(p)
    if not rounds:
        return
    newest = max(rounds)
    tracked = set(
        subprocess.run(
            ["git", "ls-files", "CORRECTNESS_r*.json", "BENCH_r*.json"],
            cwd=REPO, capture_output=True, text=True, check=True,
        ).stdout.split()
    )
    # files that differ from HEAD are the same failure mode: the
    # COMMITTED evidence no longer matches what's on disk. `git diff
    # HEAD` catches every divergence state in one shot — unstaged edits
    # ("M "), staged edits ("M "/"MM"/"AM"), and staged-but-never-
    # committed adds ("A ") — where the porcelain-letter filter this
    # replaced missed the two-letter and add states (review finding)
    modified = set(
        subprocess.run(
            ["git", "diff", "--name-only", "HEAD", "--",
             "CORRECTNESS_r*.json", "BENCH_r*.json"],
            cwd=REPO, capture_output=True, text=True, check=True,
        ).stdout.split()
    )
    stale_unclean = [
        os.path.basename(p)
        for rnd, ps in rounds.items() if rnd < newest
        for p in ps
        if os.path.basename(p) not in tracked
        or os.path.basename(p) in modified
    ]
    assert stale_unclean == [], (
        f"stale round artifacts are untracked or modified vs git: "
        f"{stale_unclean} — commit the evidence snapshot"
    )
