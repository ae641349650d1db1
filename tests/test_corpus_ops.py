"""Corpus-curation operator tests (contamination, sampling, repetition,
quantization). The DuckDB oracle check is the primary gate; these assert the
operator-level semantics and determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_ml_pipeline_spark.operators import corpus_ops
from airflow_ml_pipeline_spark.sources.catalog import load_table


def test_contamination_only_reports_train_docs_with_real_overlap(spark, sf_dir):
    res = corpus_ops.benchmark_contamination(spark, sf_dir).collect()
    eval_ids = {
        r.doc_id
        for r in load_table(spark, sf_dir, "documents")
        .filter(F.col("source") == corpus_ops.EVAL_SOURCE)
        .select("doc_id")
        .collect()
    }
    for r in res:
        assert r.doc_id not in eval_ids, "eval docs must not self-report"
        assert r.n_shared_shingles >= 1
        assert 1 <= r.n_eval_docs_hit <= len(eval_ids)


def test_contamination_catches_planted_duplicate(spark, sf_dir):
    """A training doc that IS an eval doc's near-duplicate must be flagged:
    plant one by copying an eval doc's text into a fake train row."""
    docs = load_table(spark, sf_dir, "documents")
    ev = docs.filter(
        (F.col("source") == corpus_ops.EVAL_SOURCE)
        & (F.size(F.split(F.col("text"), " ")) >= corpus_ops.CONTAM_SHINGLE_N)
    ).limit(1)
    planted = ev.select(
        F.lit(10_000_000).alias("doc_id"),
        "text",
        "lang",
        F.lit("srcX").alias("source"),
        "n_chars",
    )
    sh = docs.unionByName(planted).select(
        "doc_id",
        "source",
        F.explode(
            F.array_distinct(
                corpus_ops.ngrams(
                    corpus_ops.tokens(F.col("text")), corpus_ops.CONTAM_SHINGLE_N
                )
            )
        ).alias("shingle"),
    )
    evs = sh.filter(F.col("source") == corpus_ops.EVAL_SOURCE).select(
        F.col("doc_id").alias("eval_id"), "shingle"
    )
    tr = sh.filter(F.col("source") != corpus_ops.EVAL_SOURCE)
    hits = {
        r.doc_id
        for r in tr.join(evs, "shingle").select("doc_id").distinct().collect()
    }
    assert 10_000_000 in hits


def test_stratified_sample_exact_quota_and_deterministic(spark, sf_dir):
    s1 = corpus_ops.corpus_stratified_sample(spark, sf_dir).collect()
    s2 = corpus_ops.corpus_stratified_sample(spark, sf_dir).collect()
    assert sorted(map(tuple, s1)) == sorted(map(tuple, s2))
    per_source: dict[str, int] = {}
    for r in s1:
        per_source[r.source] = per_source.get(r.source, 0) + 1
        assert 1 <= r.sample_rank <= corpus_ops.SAMPLE_PER_SOURCE
    n_sources = (
        load_table(spark, sf_dir, "documents").select("source").distinct().count()
    )
    assert len(per_source) == n_sources
    assert all(v == corpus_ops.SAMPLE_PER_SOURCE for v in per_source.values())


def test_repetition_ratio_bounds_and_duplicated_text(spark, sf_dir):
    res = corpus_ops.doc_repetition_stats(spark, sf_dir)
    bad = res.filter(
        (F.col("dup_gram_ratio") < 0) | (F.col("dup_gram_ratio") > 1)
    ).count()
    assert bad == 0
    # a text that is one phrase repeated has a high dup ratio by construction
    rep = spark.createDataFrame(
        [(1, "spark scales out spark scales out spark scales out")],
        "doc_id long, text string",
    )
    g = corpus_ops.ngrams(corpus_ops.tokens(F.col("text")), corpus_ops.REPETITION_N)
    row = rep.select(
        (F.lit(1) - F.size(F.array_distinct(g)).cast("double") / F.size(g)).alias("r")
    ).collect()[0]
    assert row.r > 0.5


def test_token_budget_fill_matches_global_window_and_respects_budget(spark, sf_dir):
    """The distributed two-phase prefix sum must equal the naive global
    cumulative sum, and the kept set must respect the budget greedily."""
    res = {
        r.doc_id: (r.n_tokens, r.cum_tokens)
        for r in corpus_ops.corpus_token_budget_fill(spark, sf_dir).collect()
    }
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    scored = docs.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.round(
            F.size(F.array_distinct(toks)).cast("double") / F.size(toks), 6
        ).alias("score"),
    ).collect()
    running = 0
    expected: dict[int, tuple[int, int]] = {}
    for r in sorted(scored, key=lambda r: (-r.score, r.doc_id)):
        running += r.n_tokens
        if running <= corpus_ops.TOKEN_BUDGET:
            expected[r.doc_id] = (r.n_tokens, running)
    assert res == expected


def test_near_dup_clusters_match_union_find_over_exact_pairs(spark, sf_dir, request):
    """The distributed min-label propagation must agree with a driver-side
    union-find over the exact-Jaccard pair set."""
    from airflow_ml_pipeline_spark.operators import dedup

    pairs = [
        (r.doc_a, r.doc_b)
        for r in dedup.near_dup_pairs_jaccard(spark, sf_dir).collect()
    ]
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected_clusters: dict[int, int] = {x: find(x) for x in parent}
    # min-label convention: representative is the min doc_id in the component
    comp_min: dict[int, int] = {}
    for x, root in expected_clusters.items():
        comp_min[root] = min(comp_min.get(root, x), x)
    expected = {x: comp_min[root] for x, root in expected_clusters.items()}

    got = {
        r.doc_id: r.cluster_id
        for r in corpus_ops.near_dup_clusters(spark, sf_dir).collect()
    }
    assert got == expected


def test_cluster_labels_converge_on_adversarial_chain(spark):
    """Worst case for label propagation: a 200-node path graph (diameter
    199). Plain min-propagation needs ~200 rounds — far beyond
    MAX_CC_ITERATIONS — so this passes only because pointer doubling makes
    convergence O(log diameter). Every node must label to the chain head."""
    n = 200
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    labels = corpus_ops.near_dup_cluster_labels(pairs).collect()
    assert len(labels) == n
    assert {r.label for r in labels} == {0}


def test_cluster_labels_match_union_find_on_random_graphs(spark):
    """Property check: on arbitrary random edge sets the distributed CC
    labels must equal a driver-side union-find (min-id representative).
    Catches propagation bugs that hand-picked fixtures miss (multi-chain
    merges, stars colliding with paths, duplicate edges)."""
    import random

    for seed in range(5):
        rng = random.Random(seed)
        n = rng.randint(2, 60)
        m = rng.randint(1, 90)
        edges = [
            tuple(sorted(rng.sample(range(n), 2))) for _ in range(m)
        ]
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        comp_min: dict[int, int] = {}
        for x in parent:
            comp_min.setdefault(find(x), x)
            comp_min[find(x)] = min(comp_min[find(x)], x)
        expected = {x: comp_min[find(x)] for x in parent}

        pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
        got = {
            r.doc_id: r.label
            for r in corpus_ops.near_dup_cluster_labels(pairs).collect()
        }
        assert got == expected, f"seed={seed} n={n} m={m}"


def test_cluster_labels_raise_rather_than_return_partial(spark, monkeypatch):
    """If the round cap is artificially too small, the loop must fail loudly
    instead of returning partially-propagated labels."""
    import pytest

    monkeypatch.setattr(corpus_ops, "MAX_CC_ITERATIONS", 2)
    n = 200
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        corpus_ops.near_dup_cluster_labels(pairs)


def test_canonical_by_source_planted_multi_source_cluster(spark):
    """Planted clusters with known source priorities: the keeper must be
    the lowest-priority source's lowest doc_id, and the decoded
    keep_source must be exact even when priority * 10^12 + doc_id
    exceeds 2^53 (the float-mantissa cliff the old floor(double/1e12)
    decode fell off — VERDICT r7 item 1b)."""
    big = 999_999_999_999  # max encodable doc_id (headroom 10^12)
    clusters = spark.createDataFrame(
        [(10, 10), (11, 10), (12, 10), (big, 20), (21, 20)],
        "doc_id long, cluster_id long",
    )
    docs = spark.createDataFrame(
        [
            # cluster 10: src2 holds the smallest doc_id but src0 wins
            (10, "src2"), (11, "src0"), (12, "src0"),
            # cluster 20: mk = 9200000 * 10^12 + 999999999999 is a bigint
            # whose floor(double/1e12) decode rounds UP to 9200001 — the
            # competitor's source — so the old float decode misattributed
            # the keeper to the source it actually beat
            (big, "src9200000"), (21, "src9200001"),
        ],
        "doc_id long, source string",
    )
    got = {
        r.cluster_id: (r.cluster_size, r.keep_doc_id, r.keep_source, r.n_dropped)
        for r in corpus_ops.canonical_by_source(clusters, docs).collect()
    }
    assert got == {
        10: (3, 11, "src0", 2),
        20: (2, big, "src9200000", 1),
    }


def test_canonical_by_source_raises_on_unparseable_source(spark):
    """A source not shaped src<digits> must fail loudly, not be silently
    unelectable (NULL prio is skipped by MIN on both engines)."""
    import pytest
    from py4j.protocol import Py4JJavaError

    clusters = spark.createDataFrame([(1, 1), (2, 1)], "doc_id long, cluster_id long")
    docs = spark.createDataFrame(
        [(1, "src0"), (2, "commoncrawl")], "doc_id long, source string"
    )
    with pytest.raises((Py4JJavaError, Exception), match="unparseable source"):
        corpus_ops.canonical_by_source(clusters, docs).collect()


def test_canonical_by_source_rejects_off_shape_numeric_sources(spark):
    """ADVICE r8: leading zeros (src007 would parse as 7 and be
    mis-ranked/misreported), >7-digit suffixes (substring(4,10)
    truncation), and priorities whose encode overflows int64 must all
    raise, not silently win or lose under a wrong decoded identity."""
    import pytest
    from py4j.protocol import Py4JJavaError

    clusters = spark.createDataFrame([(1, 1), (2, 1)], "doc_id long, cluster_id long")
    for bad in ("src007", "src12345678", "src00", "src9999999"):
        docs = spark.createDataFrame(
            [(1, "src0"), (2, bad)], "doc_id long, source string"
        )
        with pytest.raises((Py4JJavaError, Exception), match="unparseable source"):
            corpus_ops.canonical_by_source(clusters, docs).collect()


def test_canonical_by_source_accepts_max_encodable_priority(spark):
    """Largest in-bound priority (9223370: encode stays < 2^63 for every
    doc_id < 10^12) must still round-trip exactly."""
    clusters = spark.createDataFrame([(1, 1), (2, 1)], "doc_id long, cluster_id long")
    docs = spark.createDataFrame(
        [(1, "src9223370"), (2, "src9223370")], "doc_id long, source string"
    )
    rows = corpus_ops.canonical_by_source(clusters, docs).collect()
    assert [(r.keep_doc_id, r.keep_source) for r in rows] == [(1, "src9223370")]


def test_quantization_error_small_relative_to_scale(spark, sf_dir):
    res = corpus_ops.embedding_quantization_error(spark, sf_dir)
    rows = res.collect()
    assert all(r.q_scale > 0 for r in rows)
    # int8 rounding error per element is <= scale/2 -> mse <= scale^2/4;
    # ppm bound with headroom for the round-trip arithmetic
    for r in rows:
        assert 0 <= r.mse_ppm <= (r.q_scale**2 / 4) * 1_000_000 * 1.001 + 0.001


def test_decontaminated_corpus_excludes_exactly_the_flagged_docs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    flagged = {
        r.doc_id for r in corpus_ops.benchmark_contamination(spark, sf_dir).collect()
    }
    clean = {r.doc_id for r in corpus_ops.corpus_decontaminated(spark, sf_dir).collect()}
    train = {
        r.doc_id
        for r in docs.filter(F.col("source") != corpus_ops.EVAL_SOURCE).collect()
    }
    assert clean == train - flagged
    assert flagged and clean


def test_ngram_novelty_planted(spark):
    """First copy owns its grams (novelty 1), an exact later copy owns none
    (novelty 0), an unrelated doc is fully novel, and a doc sharing half
    its grams with an earlier doc scores the shared fraction."""
    rows = [
        (1, "alpha beta gamma delta epsilon"),       # 3 distinct 3-grams
        (2, "alpha beta gamma delta epsilon"),       # exact copy of 1
        (3, "zeta eta theta iota kappa"),            # disjoint
        (4, "alpha beta gamma nu xi"),               # shares gram 1 of doc 1
        (5, "one two"),                              # < 3 tokens: no row
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in corpus_ops.ngram_novelty(docs).collect()}
    assert set(out) == {1, 2, 3, 4}
    assert out[1].novelty_ratio == 1.0
    assert out[2].novelty_ratio == 0.0
    assert out[3].novelty_ratio == 1.0
    assert out[4].n_distinct_grams == 3 and out[4].n_novel == 2
    for r in out.values():
        assert 0 <= r.n_novel <= r.n_distinct_grams


def test_ngram_novelty_corpus_invariants(spark, sf_dir):
    """Every gram has exactly one first owner: summing novel counts over
    docs equals the number of distinct grams in the corpus; the corpus's
    planted near-dup copies force some low-novelty docs."""
    out = corpus_ops.doc_ngram_novelty(spark, sf_dir).collect()
    total_novel = sum(r.n_novel for r in out)
    docs = load_table(spark, sf_dir, "documents")
    from airflow_ml_pipeline_spark.functions.text import ngrams, tokens

    n_distinct = (
        docs.select(
            F.explode(
                F.array_distinct(ngrams(tokens(F.col("text")), 3))
            ).alias("g")
        )
        .agg(F.count_distinct("g"))
        .collect()[0][0]
    )
    assert total_novel == n_distinct
    assert any(r.novelty_ratio < 0.5 for r in out)


def test_pagerank_matches_python_power_iteration(spark, sf_dir):
    """The distributed Pregel-as-joins loop equals an independent
    pure-Python power iteration with the same rounding lattice, scores
    sum to ~1, and within a clique every node gets the same score."""
    from collections import defaultdict

    from airflow_ml_pipeline_spark.operators.corpus_ops import (
        PAGERANK_DAMPING,
        PAGERANK_ITERS,
        near_dup_pagerank,
    )
    from airflow_ml_pipeline_spark.operators.dedup import near_dup_pairs_jaccard

    pairs = [(r.doc_a, r.doc_b) for r in near_dup_pairs_jaccard(spark, sf_dir).collect()]
    assert pairs, "corpus plants near-dups"
    adj = defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    n = len(adj)
    score = {v: round(1.0 / n, 10) for v in adj}
    for _ in range(PAGERANK_ITERS):
        contrib = {v: round(score[v] / len(adj[v]), 12) for v in adj}
        score = {
            v: round(
                (1 - PAGERANK_DAMPING) / n
                + PAGERANK_DAMPING * sum(contrib[u] for u in adj[v]),
                10,
            )
            for v in adj
        }
    got = {r.doc_id: (r.deg, r.pagerank) for r in near_dup_pagerank(spark, sf_dir).collect()}
    assert set(got) == set(adj)
    for v in adj:
        assert got[v][0] == len(adj[v])
        assert abs(got[v][1] - round(score[v], 6)) < 2e-6, v
    total = sum(s for _, s in got.values())
    assert abs(total - 1.0) < 1e-3


def test_cross_source_matrix_matches_driver_recount(spark, sf_dir):
    """The source-pair duplication matrix must equal a driver-side
    recount over the cluster labels (clusters are test-collectable)."""
    from collections import Counter, defaultdict

    labels = {
        r.doc_id: r.cluster_id
        for r in corpus_ops.near_dup_clusters(spark, sf_dir).collect()
    }
    src = {
        r.doc_id: r.source
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "source")
        .collect()
    }
    per_cluster: dict[int, Counter] = defaultdict(Counter)
    for doc, cl in labels.items():
        per_cluster[cl][src[doc]] += 1
    pairs: Counter = Counter()
    clusters: Counter = Counter()
    for cl, counts in per_cluster.items():
        srcs = sorted(counts)
        for i, a in enumerate(srcs):
            for b in srcs[i:]:
                n = (
                    counts[a] * (counts[a] - 1) // 2
                    if a == b
                    else counts[a] * counts[b]
                )
                if n > 0:
                    pairs[(a, b)] += n
                    clusters[(a, b)] += 1
    got = {
        (r.source_a, r.source_b): (r.n_doc_pairs, r.n_clusters)
        for r in corpus_ops.near_dup_cross_source_matrix(spark, sf_dir).collect()
    }
    assert got == {k: (pairs[k], clusters[k]) for k in pairs}


def test_canonical_by_source_random_clusters_match_recount(spark):
    """Property check: on random cluster/source assignments the arg-min
    kernel must equal a driver-side recount (min (prio, doc_id) per
    cluster) — catches encode/decode bugs planted fixtures might miss."""
    import random

    for seed in range(4):
        rng = random.Random(seed)
        n = rng.randint(3, 40)
        docs = []
        clusters = []
        for doc_id in range(n):
            clusters.append((doc_id, rng.randint(0, 5)))
            docs.append((doc_id, f"src{rng.randint(0, 9_000_000)}"))
        cl = spark.createDataFrame(clusters, "doc_id long, cluster_id long")
        dd = spark.createDataFrame(docs, "doc_id long, source string")
        expected = {}
        prio = {d: int(s[3:]) for d, s in docs}
        from collections import defaultdict

        members = defaultdict(list)
        for d, c in clusters:
            members[c].append(d)
        for c, ds in members.items():
            keep = min(ds, key=lambda d: (prio[d], d))
            expected[c] = (len(ds), keep, f"src{prio[keep]}", len(ds) - 1)
        got = {
            r.cluster_id: (r.cluster_size, r.keep_doc_id, r.keep_source, r.n_dropped)
            for r in corpus_ops.canonical_by_source(cl, dd).collect()
        }
        assert got == expected, f"seed={seed}"


def test_group_split_never_crosses_near_dup_pairs(spark, sf_dir):
    """The leakage fix's defining property: every verified near-dup
    pair lands in the SAME split (contrast split_leakage_audit, which
    finds the doc_id % 10 strawman leaking), every document is
    assigned exactly once, all three splits are non-empty, and
    cluster members share their group's assignment."""
    from airflow_ml_pipeline_spark.operators.corpus_ops import (
        corpus_group_split,
        near_dup_clusters,
    )
    from airflow_ml_pipeline_spark.operators.dedup import (
        verified_near_dup_pairs,
    )
    from airflow_ml_pipeline_spark.sources.catalog import load_spread

    assign = {
        r.doc_id: (r.group_id, r.split)
        for r in corpus_group_split(spark, sf_dir).collect()
    }
    n_docs = load_spread(spark, sf_dir, "documents").count()
    assert len(assign) == n_docs
    splits = {s for _, s in assign.values()}
    assert splits == {"train", "val", "test"}
    docs = load_spread(spark, sf_dir, "documents")
    pairs = verified_near_dup_pairs(docs).collect()
    assert pairs
    for p in pairs:
        assert assign[p.doc_a][1] == assign[p.doc_b][1], (p.doc_a, p.doc_b)
    for r in near_dup_clusters(spark, sf_dir).collect():
        assert assign[r.doc_id][0] == r.cluster_id
