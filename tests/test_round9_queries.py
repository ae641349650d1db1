"""Metamorphic cross-checks for the round-9 query batch: each new
report is constrained by the operator it reports on (layer 7 of the
evidence model) — a drift between a report and its subject fails here
even if both stay individually self-consistent."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

import __spark_entry__  # noqa: F401 — imports populate the registry
from airflow_ml_pipeline_spark.plans import registry
from airflow_ml_pipeline_spark.sources.catalog import load_table


def _rows(spark, sf_dir, name):
    return registry.QUERIES[name](spark, sf_dir).collect()


def test_funnel_by_source_sums_to_aggregate_funnel(spark, sf_dir):
    """Per-source funnel summed over sources == the aggregate funnel,
    stage by stage; survival is monotone non-increasing per source."""
    by_src = _rows(spark, sf_dir, "corpus_funnel_by_source")
    agg = {r.stage: (r.n_docs, r.n_tokens)
           for r in _rows(spark, sf_dir, "corpus_curation_funnel")}
    sums: dict[str, list[int]] = defaultdict(lambda: [0, 0])
    per = defaultdict(dict)
    for r in by_src:
        sums[r.stage][0] += r.n_docs
        sums[r.stage][1] += r.n_tokens
        per[r.source][r.stage] = r.n_docs
    assert {k: tuple(v) for k, v in sums.items()} == agg
    order = ["0_raw", "1_quality_gate", "2_exact_dedup", "3_near_dedup"]
    for src, stages in per.items():
        counts = [stages.get(s, 0) for s in order]
        assert counts == sorted(counts, reverse=True), (src, counts)


def test_jaccard_histogram_totals_match_pair_kernel(spark, sf_dir):
    """Bucket pair-counts sum to the exact kernel's pair count; every
    bucket sits in [threshold*20, 20]."""
    hist = _rows(spark, sf_dir, "near_dup_jaccard_histogram")
    pairs = _rows(spark, sf_dir, "near_dup_pairs_jaccard")
    assert sum(r.n_pairs for r in hist) == len(pairs)
    for r in hist:
        assert 10 <= r.j_bucket <= 20
        assert 0 < r.n_docs <= 2 * r.n_pairs


def test_learnability_mix_consistent_with_flags(spark, sf_dir):
    """Mixture weights re-derive from doc_learnability_rho's own flags."""
    mix = {r.source: r for r in _rows(spark, sf_dir, "source_learnability_mix")}
    flags = registry.QUERIES["doc_learnability_rho"](spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    truth = {
        r.source: (r.n, r.l)
        for r in flags.join(docs, "doc_id")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("learnable").alias("l"))
        .collect()
    }
    total = sum(l for _, l in truth.values())
    assert set(mix) == set(truth)
    for src, (n, l) in truth.items():
        assert (mix[src].n_docs, mix[src].n_learnable) == (n, l)
        assert mix[src].mix_weight_ppm == l * 10**6 // total
    assert sum(r.mix_weight_ppm for r in mix.values()) <= 10**6


def test_langid_confusion_matches_per_doc_query(spark, sf_dir):
    conf = {(r.lang_tag, r.predicted_lang): r.n_docs
            for r in _rows(spark, sf_dir, "langid_confusion")}
    per_doc = _rows(spark, sf_dir, "langid_heuristic")
    truth: dict[tuple, int] = defaultdict(int)
    for r in per_doc:
        truth[(r.lang_tag, r.predicted_lang)] += 1
    assert conf == dict(truth)


def test_pii_prevalence_matches_scrubber(spark, sf_dir):
    """Per-source totals re-derive from doc_pii_scrub's per-doc counts."""
    prev = {r.source: r for r in _rows(spark, sf_dir, "pii_prevalence_by_source")}
    scrub = registry.QUERIES["doc_pii_scrub"](spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    truth = {
        r.source: r
        for r in scrub.join(docs, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_emails").alias("e"),
            F.sum("n_phones").alias("p"),
            F.sum("n_ids").alias("i"),
        )
        .collect()
    }
    assert set(prev) == set(truth)
    for src, t in truth.items():
        r = prev[src]
        assert (r.n_docs, r.n_emails, r.n_phones, r.n_ids) == (
            t.n_docs, t.e, t.p, t.i,
        )
        assert r.n_docs_with_pii == r.n_docs  # augmentation plants PII in all


def test_stream_pii_stats_match_batch_prevalence(spark, sf_dir):
    """The streaming scrubber's per-batch counters, summed, equal the
    batch prevalence totals — stream/batch equivalence for the shared
    kernel."""
    stream = _rows(spark, sf_dir, "stream_pii_scrub_ingest")
    prev = _rows(spark, sf_dir, "pii_prevalence_by_source")
    assert sum(r.n_docs for r in stream) == sum(r.n_docs for r in prev)
    assert sum(r.n_emails for r in stream) == sum(r.n_emails for r in prev)
    assert sum(r.n_phones for r in stream) == sum(r.n_phones for r in prev)
    assert sum(r.n_ids for r in stream) == sum(r.n_ids for r in prev)


def test_packing_efficiency_consistent_with_packer(spark, sf_dir):
    rep = _rows(spark, sf_dir, "packing_efficiency_report")[0]
    packed = _rows(spark, sf_dir, "sequence_packing")
    from airflow_ml_pipeline_spark.operators.packing import SEQ_LEN

    assert rep.n_docs == len(packed)
    assert rep.total_tokens == sum(r.n_tokens for r in packed)
    assert rep.n_crossing_docs == sum(r.crosses_boundary for r in packed)
    assert 0 <= rep.pad_tokens < SEQ_LEN
    assert rep.n_seqs * SEQ_LEN == rep.total_tokens + rep.pad_tokens


def test_bpe_fertility_sums_match_encoded_corpus(spark, sf_dir):
    fert = _rows(spark, sf_dir, "bpe_fertility_by_lang")
    enc = _rows(spark, sf_dir, "bpe_encoded_corpus")
    assert sum(r.n_words for r in fert) == sum(r.n_words for r in enc)
    assert sum(r.n_bpe_tokens for r in fert) == sum(r.n_bpe_tokens for r in enc)
    for r in fert:  # a token never spans words: tokens >= words, <= chars
        assert r.n_words <= r.n_bpe_tokens <= r.n_chars


def test_shard_skew_covers_whole_corpus(spark, sf_dir):
    rep = _rows(spark, sf_dir, "corpus_shard_skew_report")
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in rep) == n_docs
    assert len(rep) <= 16 and all(0 <= r.shard <= 15 for r in rep)


def test_split_drift_counts_partition_labels(spark, sf_dir):
    rep = _rows(spark, sf_dir, "embedding_split_drift")
    emb = load_table(spark, sf_dir, "embeddings")
    per_label = {
        r.label: r.n for r in emb.groupBy("label").agg(
            F.count(F.lit(1)).alias("n")).collect()
    }
    assert {r.label: r.n_a + r.n_b for r in rep} == per_label
    assert all(r.drift_l2sq >= 0 for r in rep)


def test_quality_breakdown_pass_complements_rule_fails(spark, sf_dir):
    """n_pass can never exceed n_docs minus the largest single-rule fail
    count (a doc failing any rule fails the gate)."""
    for r in _rows(spark, sf_dir, "quality_rule_breakdown"):
        worst = max(r.n_fail_min_tokens, r.n_fail_stop_ratio_lo,
                    r.n_fail_stop_ratio_hi)
        assert r.n_pass <= r.n_docs - worst
        assert r.n_pass >= r.n_docs - (
            r.n_fail_min_tokens + r.n_fail_stop_ratio_lo
            + r.n_fail_stop_ratio_hi
        )


def test_dau_wau_python_parity(spark, sf_dir):
    """DAU/WAU re-derived with plain Python sets from the raw events."""
    ev = load_table(spark, sf_dir, "events").select(
        F.expr("unix_micros(ts) div 86400000000").alias("day"), "user_id"
    ).collect()
    daily: dict[int, set] = defaultdict(set)
    for r in ev:
        daily[r.day].add(r.user_id)
    got = {r.epoch_day: r for r in _rows(spark, sf_dir, "events_dau_wau")}
    assert set(got) == set(daily)
    for d, users in daily.items():
        wau = set()
        for back in range(7):
            wau |= daily.get(d - back, set())
        assert got[d].dau == len(users)
        assert got[d].wau == len(wau)
        assert got[d].stickiness_ppm == len(users) * 10**6 // len(wau)


def test_cluster_size_histogram_matches_clusters(spark, sf_dir):
    hist = {r.cluster_size: r for r in _rows(
        spark, sf_dir, "near_dup_cluster_size_histogram")}
    clusters = _rows(spark, sf_dir, "near_dup_clusters")
    sizes: dict[int, set] = defaultdict(set)
    for r in clusters:
        sizes[r.cluster_size].add(r.cluster_id)
    assert set(hist) == set(sizes)
    for sz, ids in sizes.items():
        assert hist[sz].n_clusters == len(ids)
        assert hist[sz].n_docs == sz * len(ids)
        assert hist[sz].n_dropped == (sz - 1) * len(ids)


def test_training_mix_fill_respects_quotas_and_ranking(spark, sf_dir):
    """The materialized mix never exceeds any source's quota, fills in
    quality order (running sums strictly increase along the rank), and
    its quotas re-derive from the mixture weights and corpus size."""
    from airflow_ml_pipeline_spark.operators.selection import MIX_FILL_PPM

    fill = _rows(spark, sf_dir, "corpus_training_mix_fill")
    mix = {r.source: r.mix_weight_ppm
           for r in _rows(spark, sf_dir, "source_learnability_mix")}
    docs = load_table(spark, sf_dir, "documents")
    total = docs.select(
        F.sum(F.size(F.split("text", " "))).alias("t")).collect()[0].t
    budget = total * MIX_FILL_PPM // 10**6
    per_src: dict[str, list] = defaultdict(list)
    for r in fill:
        per_src[r.source].append(r)
        assert r.quota_tokens == budget * mix[r.source] // 10**6
        assert r.cum_tokens <= r.quota_tokens
    for src, rows in per_src.items():
        rows.sort(key=lambda r: r.cum_tokens)
        run = 0
        for r in rows:
            run += r.n_tokens
            assert r.cum_tokens == run  # contiguous prefix, no gaps
