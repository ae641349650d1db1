"""Data selection & mixture operators (round-7 surface, continued): the
three named techniques a pretraining-data team runs between "filter" and
"pack" — DSIR importance weighting, CCNet-style perplexity bucketing, and
temperature-based language mixing.

Engine additions from the large-scale-curation brief (the reference's
surface is the churn ML pipeline; it has no corpus-selection stage), each
re-expressed Spark-first over the shared text primitives:

- ``doc_dsir_weights`` — Data Selection via Importance Resampling (Xie et
  al., 2023): per-document log importance weight = log p_target/p_raw
  under two hashed-unigram bag-of-words LMs, where the target
  distribution is the corpus slice passing the heuristic quality gate
  (``doc_quality``'s pass rule) and raw is the whole corpus. The hashed
  feature space (``md5_bucket``, shared with the frozen quality model)
  bounds LM state at ``DSIR_BUCKETS`` regardless of corpus size.
- ``doc_ppl_buckets`` — CCNet-style head/middle/tail split (Wenzek et
  al., 2020): per-LANGUAGE terciles of the unigram-LM score
  (``doc_unigram_logprob`` — the engine's KenLM stand-in). Exact
  rank-based terciles via the per-class two-phase kernel
  (``functions/prefix.py::class_row_number``) — a plain
  ``Window.partitionBy(lang)`` is one serial task per language at 100 TB.
- ``lang_temperature_rates`` / ``corpus_lang_temperature_sampled`` —
  multinomial temperature sampling over languages (the mBERT/XLM-R/mT5
  mixing rule), at tau = 0.5 so the reweight is sqrt — IEEE-exact on both
  engines where a general pow() is not. The rates table is the artifact
  mixing pipelines feed their sampler; the sampled query applies it with
  the engine's deterministic md5 uniform draw (the
  ``corpus_weighted_sample`` skeleton), downsampling every language
  relative to the most-boosted one.

Scale shapes: DSIR is one exploded-token aggregate to a ``DSIR_BUCKETS``-
row frame broadcast back into a per-doc fold (the ``doc_unigram_logprob``
skeleton — the only full shuffle is doc-keyed); perplexity bucketing pins
the per-doc score frame with a lazy localCheckpoint (it feeds three
bounded aggregates + the rank probe — recomputing the token explode per
consumer would quadruple the heavy stage); temperature mixing never
shuffles the corpus at all (a lang-keyed aggregate broadcast into a
per-row filter). Every log value enters sums as a 6dp decimal (the
order-independent lattice shared with ``doc_unigram_logprob``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from airflow_ml_pipeline_spark.functions.compare import DEC
from airflow_ml_pipeline_spark.functions.prefix import (
    class_row_number,
    global_row_number,
)
from airflow_ml_pipeline_spark.functions.text import (
    STOPWORDS_EN,
    count_in,
    md5_bucket,
    sql_md5_bucket,
    tokens,
)
from airflow_ml_pipeline_spark.operators.textstats import (
    SQL_UNIGRAM_LP_CTES,
    doc_unigram_logprob,
    quality_gate_cond,
    sql_quality_gate,
)
from airflow_ml_pipeline_spark.plans.registry import query
from airflow_ml_pipeline_spark.sources.catalog import load_table

#: DSIR hashed-feature space. Bounds both LMs' state at 256 counters
#: however large the corpus vocabulary grows (the point of hashed DSIR);
#: the paper uses 10k buckets for web-scale n-gram vocabularies — the
#: synthetic corpus's ~200-type vocabulary saturates 256 already.
DSIR_BUCKETS = 256

#: equi-depth buckets per language for the tercile ranking.
PPL_RANK_BUCKETS = 32


def _ln6(x: Column) -> Column:
    """ln on the shared 6dp-decimal lattice (order-independent sums;
    twin: ``CAST(ln(..) AS DECIMAL(25,6))``)."""
    return F.log(x).cast(DEC)


#: the heuristic quality gate (doc_quality's pass rule) as a 0/1 SQL
#: expression over a ``documents`` row — DSIR's target-distribution label.
#: Composed from textstats' single gate definition so a threshold change
#: cannot desynchronize DSIR's target from the gate it claims to mirror.
_SQL_GATE = f"CASE WHEN {sql_quality_gate()} THEN 1 ELSE 0 END"


@query(
    "doc_dsir_weights",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id,
               {_SQL_GATE} AS gate,
               unnest(string_split(text, ' ')) AS t
        FROM documents
    ),
    bkt AS (
        SELECT doc_id, gate, {sql_md5_bucket('t', DSIR_BUCKETS)} AS b
        FROM tok
    ),
    bc AS (
        SELECT b, COUNT(*) AS c_raw, SUM(gate) AS c_tgt FROM bkt GROUP BY b
    ),
    tot AS (
        SELECT CAST(SUM(c_raw) AS BIGINT) AS n_raw,
               CAST(SUM(c_tgt) AS BIGINT) AS n_tgt
        FROM bc
    ),
    w AS (
        SELECT b,
               CAST(ln(CAST(c_tgt + 1 AS DOUBLE)) AS DECIMAL(25,6))
             - CAST(ln(CAST(c_raw + 1 AS DOUBLE)) AS DECIMAL(25,6)) AS lr
        FROM bc
    )
    SELECT bkt.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           round(CAST(SUM(w.lr)
                 + COUNT(*)
                   * (CAST(ln(CAST(n_raw + {DSIR_BUCKETS} AS DOUBLE))
                           AS DECIMAL(25,6))
                    - CAST(ln(CAST(n_tgt + {DSIR_BUCKETS} AS DOUBLE))
                           AS DECIMAL(25,6)))
                 AS DOUBLE), 6) AS dsir_logweight
    FROM bkt JOIN w USING (b) CROSS JOIN tot
    GROUP BY bkt.doc_id, n_raw, n_tgt
    """,
)
def doc_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance log-weights (Xie et al., 2023): how much more
    likely each document is under the target distribution (quality-gated
    docs) than under the raw corpus, measured by two add-one-smoothed
    hashed-unigram LMs:

        log w(d) = sum_t [ ln(c_tgt[b(t)]+1) - ln(c_raw[b(t)]+1) ]
                 + n_d * [ ln(N_raw+B) - ln(N_tgt+B) ]

    Selection keeps the top tail (or resamples proportionally); the
    weight itself is the declared, oracle-checked output.

    Scale: one token-exploded aggregate produces the B=256-row count
    frame (map-side partials; state is B counters per task however big
    the corpus); its log-ratios broadcast back into a per-doc decimal
    fold. The corpus totals enter once per document (times n_tokens), so
    they never join per token — the ``doc_unigram_logprob`` skeleton.
    Every ln is a 6dp decimal before summing (order-independent)."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select("doc_id", tokens(F.col("text")).alias("toks"))
    # the stopword/size counts MUST materialize per doc BELOW the explode:
    # written inline with the explode, Catalyst keeps the gate CASE in the
    # Project above Generate and its two HOF stopword scans re-run per
    # TOKEN row — O(len^2) per document (measured 4.5x the skeleton twin).
    # Each alias is referenced 2-3x downstream so the projection survives
    # CollapseProject (the doc_quality pattern); only integer arithmetic
    # rides above the Generate.
    counts = base.select(
        "doc_id",
        "toks",
        F.size("toks").alias("n_tok"),
        count_in(F.col("toks"), STOPWORDS_EN).alias("n_stop"),
    )
    ratio = F.col("n_stop").cast("double") / F.col("n_tok")
    gate = (
        F.when(quality_gate_cond(F.col("n_tok"), ratio), F.lit(1))
        .otherwise(F.lit(0))
        .alias("gate")
    )
    bkt = counts.select(
        "doc_id", gate, F.explode("toks").alias("t")
    ).select("doc_id", "gate", md5_bucket(F.col("t"), DSIR_BUCKETS).alias("b"))
    # bkt is consumed twice (bucket-count aggregate + per-doc fold); its
    # OUTPUT is three small ints per token — narrow enough that pinning
    # beats recomputing the explode+md5 lineage (A/B r8: 1.44 s -> 1.13 s
    # median at sf0.1; contrast the WIDE gram postings where a checkpoint
    # lost 3x — verify-skill r6 note)
    bkt = bkt.localCheckpoint(eager=False)
    bc = bkt.groupBy("b").agg(
        F.count(F.lit(1)).alias("c_raw"), F.sum("gate").alias("c_tgt")
    )
    tot = bc.agg(
        F.sum("c_raw").cast("bigint").alias("n_raw"),
        F.sum("c_tgt").cast("bigint").alias("n_tgt"),
    )
    w = bc.select(
        "b",
        (
            _ln6((F.col("c_tgt") + 1).cast("double"))
            - _ln6((F.col("c_raw") + 1).cast("double"))
        ).alias("lr"),
    )
    per_doc = (
        bkt.join(F.broadcast(w), "b")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_tokens"), F.sum("lr").alias("s_lr"))
    )
    k = _ln6((F.col("n_raw") + DSIR_BUCKETS).cast("double")) - _ln6(
        (F.col("n_tgt") + DSIR_BUCKETS).cast("double")
    )
    return per_doc.crossJoin(F.broadcast(tot)).select(
        "doc_id",
        "n_tokens",
        F.round(
            (F.col("s_lr") + F.col("n_tokens") * k).cast("double"), 6
        ).alias("dsir_logweight"),
    )


@query(
    "doc_ppl_buckets",
    oracle=f"""
    WITH {SQL_UNIGRAM_LP_CTES},
    j AS (
        SELECT l.doc_id, d.lang, l.n_tokens, l.avg_logprob
        FROM lp l JOIN documents d USING (doc_id)
    ),
    r AS (
        SELECT *,
               CAST(row_number() OVER (
                    PARTITION BY lang ORDER BY avg_logprob, doc_id)
                    AS BIGINT) AS lang_rank,
               COUNT(*) OVER (PARTITION BY lang) AS n_lang
        FROM j
    )
    SELECT doc_id, lang, n_tokens, avg_logprob, lang_rank,
           CASE CAST(floor(CAST(3 * (lang_rank - 1) AS DOUBLE)
                           / CAST(n_lang AS DOUBLE)) AS INT)
                WHEN 0 THEN 'head' WHEN 1 THEN 'middle' ELSE 'tail'
           END AS ppl_bucket
    FROM r
    """,
)
def doc_ppl_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity buckets (Wenzek et al., 2020): within each
    language, rank documents by their unigram-LM score (ascending — low
    logprob = high perplexity) and split into exact rank terciles. 'head'
    here is the WORST-scoring third (rare-token noise, boilerplate),
    'tail' the most-fluent third — curation keeps/weights buckets per
    policy downstream.

    Exactness over CCNet's histogram cutoffs: rank terciles need no
    quantile estimate, so the oracle restates them verbatim. Scale: the
    per-doc score frame is pinned with a lazy localCheckpoint — it feeds
    the cuts aggregate, the per-lang counts, and the rank probe (four
    bounded scans of a |docs|-row frame beat re-running the token-level
    vocabulary join per consumer). The ranking itself is
    ``class_row_number``: a plain ``Window.partitionBy(lang)`` is one
    task per language — five serial reducers at 100 TB — while the
    two-phase kernel keeps ~PPL_RANK_BUCKETS-way parallelism per
    language and is bit-identical to the partitioned window."""
    lp = doc_unigram_logprob(spark, sf_dir)
    langs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    j = lp.join(langs, "doc_id").localCheckpoint(eager=False)
    nl = j.groupBy("lang").agg(F.count(F.lit(1)).alias("n_lang"))
    ranked = class_row_number(
        j, "lang", "avg_logprob", [F.asc("doc_id")], PPL_RANK_BUCKETS,
        out="lang_rank",
    )
    idx = F.floor(
        (F.lit(3) * (F.col("lang_rank") - 1)).cast("double")
        / F.col("n_lang").cast("double")
    )
    return ranked.join(F.broadcast(nl), "lang").select(
        "doc_id",
        "lang",
        "n_tokens",
        "avg_logprob",
        "lang_rank",
        F.when(idx == 0, F.lit("head"))
        .when(idx == 1, F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("ppl_bucket"),
    )


#: DuckDB CTE chain producing ``rates(lang, n_tokens, p_raw, q_temp)`` —
#: the ONE statement of the temperature-mix math, shared by the rates
#: table's oracle and the sampled corpus's oracle.
_SQL_RATES_CTES = """nl AS (
        SELECT lang,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        FROM documents GROUP BY lang
    ),
    n2 AS (
        SELECT lang, n_tokens,
               CAST(round(sqrt(CAST(n_tokens AS DOUBLE)), 6)
                    AS DECIMAL(25,6)) AS sq
        FROM nl
    ),
    tot AS (
        SELECT CAST(SUM(n_tokens) AS BIGINT) AS n_total, SUM(sq) AS s_sqrt
        FROM n2
    ),
    rates AS (
        SELECT lang, n_tokens,
               round(CAST(n_tokens AS DOUBLE) / CAST(n_total AS DOUBLE), 6)
                   AS p_raw,
               round(CAST(sq AS DOUBLE) / CAST(s_sqrt AS DOUBLE), 6)
                   AS q_temp
        FROM n2 CROSS JOIN tot
    )"""


def _rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(lang, n_tokens, p_raw, q_temp): raw token share p and
    temperature-flattened target share q ∝ p^tau at tau = 0.5. sqrt is
    IEEE-correctly-rounded on both engines (a general pow() is not,
    which is why tau is pinned to 0.5); each sqrt enters the normalizing
    sum as a 6dp decimal so the total is order-independent."""
    docs = load_table(spark, sf_dir, "documents")
    nl = (
        docs.select("lang", F.size(tokens(F.col("text"))).alias("nt"))
        .groupBy("lang")
        .agg(F.sum("nt").cast("bigint").alias("n_tokens"))
    )
    n2 = nl.withColumn(
        "sq", F.round(F.sqrt(F.col("n_tokens").cast("double")), 6).cast(DEC)
    )
    tot = n2.agg(
        F.sum("n_tokens").cast("bigint").alias("n_total"),
        F.sum("sq").alias("s_sqrt"),
    )
    return n2.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_tokens",
        F.round(
            F.col("n_tokens").cast("double") / F.col("n_total").cast("double"),
            6,
        ).alias("p_raw"),
        F.round(
            F.col("sq").cast("double") / F.col("s_sqrt").cast("double"), 6
        ).alias("q_temp"),
    )


@query(
    "lang_temperature_rates",
    oracle=f"""
    WITH {_SQL_RATES_CTES}
    SELECT lang, n_tokens, p_raw, q_temp,
           round(q_temp / p_raw, 6) AS boost
    FROM rates
    """,
)
def lang_temperature_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The language-mixing table (mBERT/XLM-R/mT5 temperature rule at
    tau = 0.5): per language, the raw token share p, the flattened
    target share q ∝ sqrt(p), and the boost q/p the sampler applies
    (>1 up-weights low-resource languages, <1 down-weights dominant
    ones). O(languages) output from one lang-keyed aggregate — the
    corpus itself never shuffles."""
    rates = _rates(spark, sf_dir)
    return rates.select(
        "lang",
        "n_tokens",
        "p_raw",
        "q_temp",
        F.round(F.col("q_temp") / F.col("p_raw"), 6).alias("boost"),
    )


@query(
    "corpus_lang_temperature_sampled",
    oracle=f"""
    WITH {_SQL_RATES_CTES},
    b AS (SELECT lang, round(q_temp / p_raw, 6) AS boost FROM rates),
    m AS (SELECT MAX(boost) AS mx FROM b),
    k AS (SELECT lang, round(boost / mx, 6) AS keep_rate FROM b CROSS JOIN m)
    SELECT d.doc_id, d.lang, d.n_chars, k.keep_rate
    FROM documents d JOIN k USING (lang)
    WHERE CAST(('0x' || substr(md5('lt:' || CAST(d.doc_id AS VARCHAR)), 1, 8))
               AS BIGINT) / 4294967296.0 < k.keep_rate
    """,
)
def corpus_lang_temperature_sampled(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Applies the temperature mix: every language's keep-rate is its
    boost normalized by the maximum boost (the most-boosted language
    keeps all its documents; dominant languages are down-sampled toward
    the tau = 0.5 shares), decided per document by the engine's
    deterministic md5 uniform draw (the ``corpus_weighted_sample``
    skeleton, salted 'lt:' so this draw is independent of that query's).

    Scale: the keep-rate frame is O(languages) and broadcasts into a
    per-row filter — the corpus is scanned once for the rates aggregate
    and once for the application, with no shuffle of document rows."""
    rates = lang_temperature_rates(spark, sf_dir)
    mx = rates.agg(F.max("boost").alias("mx"))
    k = rates.crossJoin(F.broadcast(mx)).select(
        "lang", F.round(F.col("boost") / F.col("mx"), 6).alias("keep_rate")
    )
    docs = load_table(spark, sf_dir, "documents")
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("lt:"), F.col("doc_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(4294967296.0)
    )
    return (
        docs.join(F.broadcast(k), "lang")
        .filter(u < F.col("keep_rate"))
        .select("doc_id", "lang", "n_chars", "keep_rate")
    )


#: the learnability DECISION as one SQL expression over the joined
#: lp/blp frames — shared by the per-doc oracle and the mixture oracle
#: (r9 review: the CASE was duplicated; a retuned margin in one would
#: silently desync the weights from the flags they aggregate)
SQL_LEARNABLE_FLAG = (
    "CAST(CASE WHEN blp.sum_logprob / blp.n_bigrams > lp.avg_logprob"
    " THEN 1 ELSE 0 END AS BIGINT)"
)


def _sql_learnability() -> str:
    from airflow_ml_pipeline_spark.operators.textstats import (
        SQL_BIGRAM_LP_CTES,
    )

    return f"""
    WITH {SQL_UNIGRAM_LP_CTES},
    {SQL_BIGRAM_LP_CTES}
    SELECT lp.doc_id,
           lp.n_tokens,
           blp.n_bigrams,
           lp.avg_logprob AS uni_avg_logprob,
           blp.sum_logprob AS bi_sum_logprob,
           {SQL_LEARNABLE_FLAG} AS learnable
    FROM lp JOIN blp USING (doc_id)
    """


@query("doc_learnability_rho", oracle=_sql_learnability())
def doc_learnability_rho(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-model learnability contrast (the RHO-loss / JEST selection
    signal, model-free edition): score every document under BOTH corpus
    LMs the engine ships — the unigram model (context-free plausibility)
    and the interpolated bigram model (local-order plausibility) — and
    flag docs whose mean bigram logprob beats their mean unigram logprob.
    Text a stronger-context model explains BETTER than a weaker one is
    exactly the 'learnable and worth training on' region RHO-1 selects;
    text where more context does not help is noise or boilerplate. Docs
    with <2 tokens carry no bigram evidence and are omitted (the bigram
    scorer's documented contract).

    Exactness: both inputs are committed decimal-lattice sums; the flag
    compares IEEE doubles produced by the identical expression on both
    engines, and the raw components are emitted so callers derive any
    threshold they like — no new rounding boundary is introduced.

    Scale: composes the two LM lineages with one doc-keyed join — and
    builds the corpus unigram table ONCE (r15 opt): both scorers consume
    the same pinned ``corpus_vocab`` frame, so the corpus is tokenized
    for vocabulary once instead of once per scorer (the vocab is the
    only full-corpus shuffle either LM pays)."""
    from airflow_ml_pipeline_spark.operators.textstats import (
        bigram_doc_scores,
        corpus_vocab,
        unigram_doc_scores,
    )

    docs = load_table(spark, sf_dir, "documents")
    uni = corpus_vocab(docs).localCheckpoint(eager=False)
    u = unigram_doc_scores(docs, uni)
    b = bigram_doc_scores(docs, uni)
    return u.join(b, "doc_id").select(
        "doc_id",
        "n_tokens",
        "n_bigrams",
        F.col("avg_logprob").alias("uni_avg_logprob"),
        F.col("sum_logprob").alias("bi_sum_logprob"),
        (F.col("sum_logprob") / F.col("n_bigrams") > F.col("avg_logprob"))
        .cast("bigint")
        .alias("learnable"),
    )


def _sql_source_kl() -> str:
    ln6 = "CAST(ln(CAST({x} AS DOUBLE)) AS DECIMAL(25,6))"
    return f"""
    WITH tok AS (
        SELECT source, unnest(string_split(text, ' ')) AS t FROM documents
    ),
    sb AS (
        SELECT source, {sql_md5_bucket('t', DSIR_BUCKETS)} AS b,
               CAST(COUNT(*) AS BIGINT) AS c_sb
        FROM tok GROUP BY source, b
    ),
    cb AS (SELECT b, CAST(SUM(c_sb) AS BIGINT) AS c_b FROM sb GROUP BY b),
    ns AS (
        SELECT source, CAST(SUM(c_sb) AS BIGINT) AS n_s FROM sb GROUP BY source
    ),
    n AS (SELECT CAST(SUM(c_b) AS BIGINT) AS n_corpus FROM cb)
    SELECT sb.source,
           ns.n_s AS n_tokens,
           round(CAST(SUM(c_sb * ({ln6.format(x='c_sb + 1')}
                                   - {ln6.format(x='ns.n_s + ' + str(DSIR_BUCKETS))}
                                   - {ln6.format(x='c_b + 1')}
                                   + {ln6.format(x='n_corpus + ' + str(DSIR_BUCKETS))}))
                      AS DOUBLE) / ns.n_s, 6) AS kl_nats
    FROM sb
    JOIN cb USING (b)
    JOIN ns USING (source)
    CROSS JOIN n
    GROUP BY sb.source, ns.n_s
    """


@query("source_unigram_kl", oracle=_sql_source_kl())
def source_unigram_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributional distance of each source from the whole corpus:
    KL(P_source || P_corpus) over the add-one-smoothed hashed-unigram LM
    (DSIR's 256-bucket feature space) — the mixing diagnostic behind
    'which source is most unlike the rest' decisions (a high-KL source
    dominates temperature/weight tuning; a near-zero one is
    interchangeable mass). KL = (1/N_s)·Σ_b c_sb·[ln(c_sb+1) − ln(N_s+B)
    − ln(c_b+1) + ln(N+B)]: every ln is a 6dp decimal, each term is an
    integer times an exact decimal, so the sum is order-independent and
    the one double division happens once per source.

    Scale: one token-exploded aggregate to a (sources × 256)-row frame;
    everything downstream is arithmetic on that bounded frame (the
    corpus-level counts REUSE it — the corpus is scanned once)."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "source", F.explode(tokens(F.col("text"))).alias("t")
    )
    sb = tok.groupBy(
        "source", md5_bucket(F.col("t"), DSIR_BUCKETS).alias("b")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c_sb"))
    # sources x 256 rows feeding three aggregates + the final join — pin
    sb = sb.localCheckpoint(eager=False)
    cb = sb.groupBy("b").agg(F.sum("c_sb").cast("bigint").alias("c_b"))
    ns = sb.groupBy("source").agg(F.sum("c_sb").cast("bigint").alias("n_s"))
    n = cb.agg(F.sum("c_b").cast("bigint").alias("n_corpus"))
    term = F.col("c_sb") * (
        _ln6((F.col("c_sb") + 1).cast("double"))
        - _ln6((F.col("n_s") + DSIR_BUCKETS).cast("double"))
        - _ln6((F.col("c_b") + 1).cast("double"))
        + _ln6((F.col("n_corpus") + DSIR_BUCKETS).cast("double"))
    )
    return (
        sb.join(F.broadcast(cb), "b")
        .join(F.broadcast(ns), "source")
        .crossJoin(F.broadcast(n))
        .groupBy("source", "n_s")
        .agg(
            F.round((F.sum(term)).cast("double") / F.col("n_s").cast("double"), 6).alias(
                "kl_nats"
            )
        )
        .select("source", F.col("n_s").alias("n_tokens"), "kl_nats")
    )


def _sql_mix_ctes() -> str:
    """CTE chain ``lp, blp, learn, per_src, tot`` — the per-source
    learnability aggregation stated ONCE for the mixture-weight oracle
    and the training-mix materialization oracle."""
    from airflow_ml_pipeline_spark.operators.textstats import (
        SQL_BIGRAM_LP_CTES,
    )

    return f"""{SQL_UNIGRAM_LP_CTES},
    {SQL_BIGRAM_LP_CTES},
    learn AS (
        SELECT lp.doc_id,
               {SQL_LEARNABLE_FLAG} AS learnable
        FROM lp JOIN blp USING (doc_id)
    ),
    per_src AS (
        SELECT d.source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(l.learnable) AS BIGINT) AS n_learnable
        FROM learn l JOIN documents d USING (doc_id)
        GROUP BY d.source
    ),
    tot AS (SELECT CAST(SUM(n_learnable) AS BIGINT) AS t FROM per_src)"""


#: the ppm weight expression over per_src CROSS JOIN tot — shared text
SQL_MIX_PPM = (
    "CAST(CASE WHEN t > 0 THEN n_learnable * 1000000 // t"
    " ELSE 0 END AS BIGINT)"
)


def _sql_learnability_mix() -> str:
    return f"""
    WITH {_sql_mix_ctes()}
    SELECT source, n_docs, n_learnable,
           {SQL_MIX_PPM} AS mix_weight_ppm
    FROM per_src CROSS JOIN tot
    """


@query("source_learnability_mix", oracle=_sql_learnability_mix())
def source_learnability_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source mixture weights from the two-model learnability signal —
    the DoReMi/RHO-flavored composition: aggregate `doc_learnability_rho`'s
    per-doc flag by source and re-express each source's learnable-doc
    count as integer ppm of the corpus total. Sources whose documents a
    stronger-context model explains better get proportionally more
    sampling weight; boilerplate-heavy sources shrink. n_docs counts
    SCORED docs (the <2-token docs the bigram scorer omits by contract
    are absent on both engines). Integer counts and floor-division ppm —
    no float crosses the engines.

    Scale: the per-doc flag lineage is the two LM components (each one
    vocabulary aggregate + one doc aggregate); this adds one
    |sources|-keyed aggregate and a 1-row broadcast total."""
    flags = doc_learnability_rho(spark, sf_dir).select("doc_id", "learnable")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    per_src = (
        flags.join(docs, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("learnable").cast("bigint").alias("n_learnable"),
        )
        # |sources|-row frame consumed twice (total + final projection);
        # the total rides a broadcast whose build job materializes this
        # lazy checkpoint first, so both LM lineages run once — unpinned
        # they re-ran per consumer (A/B r9: 2.2 s median after)
        .localCheckpoint(eager=False)
    )
    tot = per_src.agg(
        F.coalesce(F.sum("n_learnable"), F.lit(0)).cast("bigint").alias("t")
    )
    return per_src.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_learnable",
        F.when(
            F.col("t") > 0,
            F.expr("n_learnable * 1000000 div t"),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("mix_weight_ppm"),
    )


#: fraction of the corpus's tokens the materialized training mix may
#: use, in ppm (scale-free: the budget grows with the corpus, so the
#: query exercises quota pressure at every SF instead of degenerating
#: to keep-everything at small scale)
MIX_FILL_PPM = 500_000


def _ppm_scale(expr: str, ppm, idiv: str) -> str:
    """floor((expr) * ppm / 1e6) without the large intermediate.

    Exact identity: with a = q*1e6 + r, floor(a*p/1e6) = q*p +
    floor(r*p/1e6) — so the rewrite never changes a quota by even one
    token. It matters at the 100 TB posture (ADVICE r9): the naive
    ``total_tokens * ppm`` wraps int64 above ~1.8e13 tokens — non-ANSI
    Spark wraps SILENTLY (negative quotas -> empty mix) while DuckDB
    errors. Here every intermediate is bounded by max(expr, 1e12).
    ``idiv`` is the dialect's integer-division token (Spark ``div``,
    DuckDB ``//``)."""
    return (
        f"(({expr}) {idiv} 1000000) * ({ppm})"
        f" + (({expr}) % 1000000) * ({ppm}) {idiv} 1000000"
    )


def _scaled_ratio_ppm(num: str, den: str, idiv: str) -> str:
    """floor((num) * 1e6 / (den)) without the num*1e6 intermediate.

    Two applications of the same floor-split identity as _ppm_scale,
    factoring 1e6 = 1000 * 1000 so every intermediate stays below
    max(num, den * 1000) — exact for den < 2^63/1000 (~9.2e15 tokens
    per source, far past the 100 TB posture), where the naive
    ``num * 1000000`` wraps at num ~ 9.2e12 (a single ~46 TB source).
    ``den`` must be > 0 (guard at the call site)."""
    r = f"((({num}) % ({den})) * 1000)"
    inner = (
        f"(({r}) {idiv} ({den})) * 1000"
        f" + (({r}) % ({den})) * 1000 {idiv} ({den})"
    )
    return f"((({num}) {idiv} ({den})) * 1000000 + {inner})"


def _sql_cum_ctes() -> str:
    """totc/scoredd/cum CTEs — the quota-INDEPENDENT half of the fill
    (corpus token total, quality-scored docs, per-source running sums),
    shared by the fill tail and the budget-ablation query."""
    toks = "string_split(text, ' ')"
    return f"""totc AS (
        SELECT CAST(SUM(len({toks})) AS BIGINT) AS total_tokens
        FROM documents
    ),
    scoredd AS (
        SELECT doc_id, source,
               CAST(len({toks}) AS BIGINT) AS n_tokens,
               round(CAST(len(list_distinct({toks})) AS DOUBLE)
                     / len({toks}), 6) AS score
        FROM documents
    ),
    cum AS (
        SELECT doc_id, source, n_tokens,
               CAST(SUM(n_tokens) OVER (
                    PARTITION BY source
                    ORDER BY score DESC, doc_id) AS BIGINT) AS cum_tokens
        FROM scoredd
    )"""


def _sql_fill_tail() -> str:
    """The quota application stated ONCE (totc/scoredd/cum/q CTEs + the
    final fill SELECT), downstream of ANY ``weights(source, ppm)`` CTE —
    shared by the learnability-proportional fill and the DoReMi-reweighted
    fill so the two recipes can never diverge in fill semantics."""
    return f"""{_sql_cum_ctes()},
    q AS (
        SELECT w.source,
               CAST({_ppm_scale(_ppm_scale("totc.total_tokens", MIX_FILL_PPM, "//"),
                                "w.ppm", "//")} AS BIGINT) AS quota_tokens
        FROM weights w CROSS JOIN totc
    )
    SELECT c.doc_id, c.source, c.n_tokens, c.cum_tokens, q.quota_tokens
    FROM cum c JOIN q USING (source)
    WHERE c.cum_tokens <= q.quota_tokens
    """


def _sql_mix_fill() -> str:
    return f"""
    WITH {_sql_mix_ctes()},
    weights AS (
        SELECT source, {SQL_MIX_PPM} AS ppm
        FROM per_src CROSS JOIN tot
    ),
    {_sql_fill_tail()}"""


@query("corpus_training_mix_fill", oracle=_sql_mix_fill())
def corpus_training_mix_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATERIALIZE the training mix — the capstone composition that
    turns the selection signals into an actual dataset: each source gets
    a token quota proportional to its learnability mixture weight
    (`source_learnability_mix`'s own ppm over a scale-free corpus-half
    budget), and the quota is filled with the source's highest-quality
    documents (the budget-fill diversity score) under a per-source
    running token sum. This is the operator a data-recipe paper's
    "sampled X% of source S" sentence describes; emitting the doc-level
    fill (with each doc's running position and its source's quota) makes
    the whole recipe auditable, not just its totals.

    Exactness: quotas are two chained integer floor-divisions; the
    quality score is the 6dp-rounded integer-ratio double both engines
    compute identically; running sums are bigint.

    Scale: one corpus projection (token counts + score; pinned — the
    HOF token explode feeds the total aggregate AND the ranked fill),
    the per-source running sum parallelizes across sources (at 100 TB a
    single giant source composes the bucket-grid two-phase prefix sum
    exactly like corpus_token_budget_fill — the per-source window is the
    |sources| >> cores regime's shape), and the quota/weight frames are
    |sources|-sized broadcasts over the two LM lineages."""
    mix = source_learnability_mix(spark, sf_dir).select(
        "source", "mix_weight_ppm"
    )
    docs = load_table(spark, sf_dir, "documents")
    scored = _mix_scored(docs).localCheckpoint(eager=False)
    quotas = _mix_quotas(mix, scored)
    return mix_fill_window(scored, quotas)


def _mix_scored(docs: DataFrame) -> DataFrame:
    """(doc_id, source, n_tokens, score) — the quality-ranked corpus
    projection both fill implementations consume."""
    tok = docs.select("doc_id", "source", tokens(F.col("text")).alias("toks"))
    return tok.select(
        "doc_id",
        "source",
        F.size("toks").cast("bigint").alias("n_tokens"),
        F.round(
            F.size(F.array_distinct("toks")).cast("double") / F.size("toks"),
            6,
        ).alias("score"),
    )


def _mix_quotas(mix: DataFrame, scored: DataFrame) -> DataFrame:
    """(source, quota_tokens): learnability ppm weights over the
    corpus-half budget, overflow-safe (see _ppm_scale)."""
    total = scored.agg(F.sum("n_tokens").cast("bigint").alias("total_tokens"))
    return mix.crossJoin(F.broadcast(total)).select(
        "source",
        F.expr(
            _ppm_scale(
                _ppm_scale("total_tokens", MIX_FILL_PPM, "div"),
                "mix_weight_ppm",
                "div",
            )
        )
        .cast("bigint")
        .alias("quota_tokens"),
    )


def _mix_cum(scored: DataFrame) -> DataFrame:
    """(doc_id, source, n_tokens, cum_tokens): the per-source running
    token sum under (score DESC, doc_id) — quota-independent, so budget
    ablations compute it ONCE and compare against many quotas."""
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("source")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return scored.select(
        "doc_id",
        "source",
        "n_tokens",
        F.sum("n_tokens").over(w).cast("bigint").alias("cum_tokens"),
    )


def mix_fill_window(scored: DataFrame, quotas: DataFrame) -> DataFrame:
    """Per-source window fill: running token sum under (score DESC,
    doc_id) within each source, keep while under quota. The right shape
    when |sources| >> cores (the window parallelizes across sources)."""
    return (
        _mix_cum(scored)
        .join(F.broadcast(quotas), "source")
        .filter(F.col("cum_tokens") <= F.col("quota_tokens"))
        .select("doc_id", "source", "n_tokens", "cum_tokens", "quota_tokens")
    )


def mix_fill_bucketed(scored: DataFrame, quotas: DataFrame) -> DataFrame:
    """Bucket-grid fill for the ONE-GIANT-SOURCE regime: the per-source
    window degenerates to a single serial partition when one source
    holds most of the corpus, so compose the two-phase prefix sum
    (`corpus_token_budget_fill`'s kernel) INSIDE each source — (1)
    bucket docs on the monotone score grid, (2) per-(source, bucket)
    token totals + a bucket-count-sized offset window, (3) per-row
    cumsum partitioned by (source, bucket): parallel even within one
    source. Output is row-for-row identical to `mix_fill_window` —
    score ties share a bucket, so (bucket DESC, score DESC, doc_id) is
    the same total order —
    tests/test_selection.py::test_mix_fill_bucketed_matches_window
    pins the parity on a 90%-single-source corpus (VERDICT r9 ask #7)."""
    from pyspark.sql.window import Window

    b = scored.withColumn("bucket", F.floor(F.col("score") * 100))
    bucket_tot = b.groupBy("source", "bucket").agg(
        F.sum("n_tokens").alias("btok")
    )
    w_off = (
        Window.partitionBy("source")
        .orderBy(F.desc("bucket"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = bucket_tot.select(
        "source",
        "bucket",
        F.coalesce(F.sum("btok").over(w_off), F.lit(0)).alias("offset"),
    )
    w_in = (
        Window.partitionBy("source", "bucket")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = b.join(F.broadcast(offsets), ["source", "bucket"]).select(
        "doc_id",
        "source",
        "n_tokens",
        (F.col("offset") + F.sum("n_tokens").over(w_in))
        .cast("bigint")
        .alias("cum_tokens"),
    )
    return (
        cum.join(F.broadcast(quotas), "source")
        .filter(F.col("cum_tokens") <= F.col("quota_tokens"))
        .select("doc_id", "source", "n_tokens", "cum_tokens", "quota_tokens")
    )


def _sql_epoch_tail() -> str:
    """st/totc/q CTEs + the final epochs SELECT — the epoch-allocation
    statement downstream of ANY ``weights(source, ppm)`` CTE, shared by
    the proportional and DoReMi-reweighted allocations (the
    _sql_fill_tail rule)."""
    return f"""st AS (
        SELECT source,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
                   AS source_tokens
        FROM documents GROUP BY source
    ),
    totc AS (
        SELECT CAST(SUM(source_tokens) AS BIGINT) AS total_tokens FROM st
    ),
    q AS (
        SELECT w.source,
               CAST({_ppm_scale(_ppm_scale("totc.total_tokens", MIX_FILL_PPM, "//"),
                                "w.ppm", "//")} AS BIGINT) AS quota_tokens
        FROM weights w CROSS JOIN totc
    )
    SELECT st.source, st.source_tokens, q.quota_tokens,
           CAST(CASE WHEN st.source_tokens > 0
                THEN {_scaled_ratio_ppm("q.quota_tokens",
                                        "st.source_tokens", "//")}
                ELSE 0 END AS BIGINT) AS epochs_ppm
    FROM st JOIN q USING (source)
    """


def _epoch_allocation(mix: DataFrame, scored: DataFrame) -> DataFrame:
    """The epoch-allocation composition over ANY (source, mix_weight_ppm)
    frame — quota lineage shared with the fill via ``_mix_quotas``."""
    quotas = _mix_quotas(mix, scored)
    st = scored.groupBy("source").agg(
        F.sum("n_tokens").cast("bigint").alias("source_tokens")
    )
    return st.join(F.broadcast(quotas), "source").select(
        "source",
        "source_tokens",
        "quota_tokens",
        F.when(
            F.col("source_tokens") > 0,
            F.expr(
                _scaled_ratio_ppm("quota_tokens", "source_tokens", "div")
            ),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("epochs_ppm"),
    )


@query(
    "source_epoch_allocation",
    oracle=f"""
    WITH {_sql_mix_ctes()},
    weights AS (
        SELECT source, {SQL_MIX_PPM} AS ppm
        FROM per_src CROSS JOIN tot
    ),
    {_sql_epoch_tail()}""",
)
def source_epoch_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REPEAT factor the training mix implies per source — the
    "4 epochs of Wikipedia, 0.3 epochs of web" sentence of a data
    recipe: epochs_ppm = quota_tokens / source_tokens in integer ppm. A
    value above 1e6 means the quota exceeds the source (the trainer
    repeats it — the oversampling regime the learnability weights
    produce for small high-value sources); far below 1e6 means heavy
    subsampling. Composes the SAME quota lineage as the training-mix
    fill, so the two can never disagree about what a source owes.

    Exactness: epochs_ppm = floor(quota * 1e6 / source_tokens) via the
    overflow-safe _scaled_ratio_ppm identity on both engines (the naive
    quota * 1e6 wraps int64 for quotas past ~9.2e12 tokens — exactly
    the corpora the 100 TB posture claims; the split form is exact to
    ~9.2e15 tokens per source).

    Scale: one per-source token aggregate (|sources| rows), the quota
    frame is the broadcast the mix fill already builds, and the output
    is |sources| rows — nothing data-sized moves."""
    mix = source_learnability_mix(spark, sf_dir).select(
        "source", "mix_weight_ppm"
    )
    docs = load_table(spark, sf_dir, "documents")
    scored = _mix_scored(docs).localCheckpoint(eager=False)
    return _epoch_allocation(mix, scored)


# ---------------------------------------------------------------------------
# Domain-mixture reweighting, DoReMi-lite (round 12, VERDICT r11 ask #5):
# the step between per-source quality signals and the training mix that
# the proportional learnability weights skip — DoReMi (Xie et al. 2023)
# runs multiplicative-weight updates driven by each domain's EXCESS LOSS
# (proxy-model loss minus reference-model loss) and averages the visited
# weight vectors. The lite edition freezes the two losses to the engine's
# own LM lineages (reference = interpolated bigram, proxy = unigram — the
# doc_learnability_rho contrast aggregated per source), runs a bounded
# number of exponentiated-gradient steps on the integer ppm lattice, and
# smooths with the uniform distribution exactly as the paper does.
# ---------------------------------------------------------------------------

#: bounded multiplicative-weight steps (the EM-loop convention: fixed
#: iteration count, restatable as a step-indexed relation on both engines)
DOREMI_STEPS = 8
#: exponentiated-gradient step size
DOREMI_ETA = 1.0
#: uniform smoothing mass in ppm: final = (1-c)*alpha_bar + c*uniform
DOREMI_SMOOTH_PPM = 100_000


def _sql_doremi_ctes() -> str:
    """The reweighting as DuckDB CTEs ending in ``rw(source, n_docs,
    excess_nats, alpha_bar_ppm, weight_ppm)`` — shared by the weights
    query and the reweighted-fill query (the _sql_mix_ctes rule)."""
    from airflow_ml_pipeline_spark.operators.textstats import (
        SQL_BIGRAM_LP_CTES,
    )

    return f"""{SQL_UNIGRAM_LP_CTES},
    {SQL_BIGRAM_LP_CTES},
    exc0 AS (
        SELECT d.source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               SUM(CAST(round(blp.sum_logprob / blp.n_bigrams
                              - lp.avg_logprob, 6) AS DECIMAL(25,6))) AS s
        FROM lp JOIN blp USING (doc_id) JOIN documents d USING (doc_id)
        GROUP BY d.source
    ),
    exc AS (
        SELECT source, n_docs,
               round(GREATEST(CAST(s AS DOUBLE) / n_docs, 0.0), 6)
                   AS excess_nats
        FROM exc0
    ),
    mxx AS (SELECT MAX(excess_nats) AS mx FROM exc),
    kk AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM exc),
    msteps AS (
        SELECT e.source, e.n_docs, e.excess_nats, s.t,
               CAST(round(exp({DOREMI_ETA!r} * s.t
                              * (e.excess_nats - mxx.mx)) * 1000000, 0)
                    AS BIGINT) AS m
        FROM exc e CROSS JOIN mxx
        CROSS JOIN (SELECT unnest(range(1, {DOREMI_STEPS + 1})) AS t) s
    ),
    tm AS (
        SELECT t, CAST(SUM(m) AS BIGINT) AS tot_m FROM msteps GROUP BY t
    ),
    wstep AS (
        SELECT ms.source, ms.n_docs, ms.excess_nats,
               ms.m * 1000000 // tm.tot_m AS w_ppm
        FROM msteps ms JOIN tm USING (t)
    ),
    ab AS (
        SELECT source, n_docs, excess_nats,
               CAST(SUM(w_ppm) // {DOREMI_STEPS} AS BIGINT) AS alpha_bar_ppm
        FROM wstep GROUP BY source, n_docs, excess_nats
    ),
    rw AS (
        SELECT source, n_docs, excess_nats, alpha_bar_ppm,
               CAST(({1_000_000 - DOREMI_SMOOTH_PPM} * alpha_bar_ppm)
                        // 1000000
                    + {DOREMI_SMOOTH_PPM} // kk.k AS BIGINT) AS weight_ppm
        FROM ab CROSS JOIN kk
    )"""


def _source_excess(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_docs, excess_nats): per-source mean of the per-doc
    learnability contrast (mean bigram logprob − mean unigram logprob),
    clipped at 0 — DoReMi's clip(L_proxy − L_ref, 0) with loss = −logprob.
    Each per-doc contrast is rounded to 6dp and summed on the decimal
    lattice (order-independent), so the one double division per source
    is cross-engine exact. The corpus unigram table is built once and
    shared by both scorers (r15 opt, same as doc_learnability_rho)."""
    from airflow_ml_pipeline_spark.operators.textstats import (
        bigram_doc_scores,
        corpus_vocab,
        unigram_doc_scores,
    )

    alldocs = load_table(spark, sf_dir, "documents")
    uni = corpus_vocab(alldocs).localCheckpoint(eager=False)
    u = unigram_doc_scores(alldocs, uni)
    b = bigram_doc_scores(alldocs, uni)
    docs = alldocs.select("doc_id", "source")
    per_doc = u.join(b, "doc_id").join(docs, "doc_id").select(
        "source",
        F.round(
            F.col("sum_logprob") / F.col("n_bigrams") - F.col("avg_logprob"),
            6,
        )
        .cast(DEC)
        .alias("e"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("e").alias("s"),
        )
        .select(
            "source",
            "n_docs",
            F.round(
                F.greatest(
                    F.col("s").cast("double") / F.col("n_docs"), F.lit(0.0)
                ),
                6,
            ).alias("excess_nats"),
        )
    )


def doremi_reweight(excess: DataFrame) -> DataFrame:
    """The DoReMi-lite kernel: given ``excess`` = (source, n_docs,
    excess_nats >= 0), run DOREMI_STEPS exponentiated-gradient updates
    with frozen per-domain excess losses and return (source, n_docs,
    excess_nats, alpha_bar_ppm, weight_ppm).

    With frozen losses the step-t unnormalized weight is
    exp(eta * t * excess_d); each step is max-normalized (the argmax
    domain is exactly 1, so underflow only ever zeroes hopeless
    domains), quantized to an integer in [0, 1e6] (round-to-nearest —
    exactly representable, no double→bigint truncation skew between
    engines), and normalized to ppm by integer floor division.
    alpha_bar is the step-average of the visited ppm vectors (the
    paper's iterate averaging) and the final weight mixes in
    DOREMI_SMOOTH_PPM of uniform mass. Everything after the one exp()
    per (domain, step) is int64 arithmetic — no float crosses engines
    un-rounded.

    Residual cross-engine risk (ADVICE r12): the one exp() per
    (domain, step) is evaluated by the JVM's Math.exp on the Spark
    side and by libm on the DuckDB side; a 1-ulp divergence whose
    true value lands within ~1e-10 of a .5 boundary of the 1e6
    lattice would flip m by 1 and fail oracle parity. The inputs are
    themselves 6dp-lattice values (excess_nats, eta*t exact in
    binary), so the probability per cell is negligible (~1e-10 per
    (domain, step) cell), but it is NOT zero — a one-off oracle red
    here should be diagnosed as this ulp coincidence, not a logic
    bug.

    Scale: the frame is |sources| x DOREMI_STEPS rows — pure broadcast
    arithmetic regardless of corpus size; the expensive part is the
    excess-loss input, which reuses the two LM lineages (each one
    vocabulary-sized shuffle). The excess frame is pinned — three
    consumers (max, count, step grid) would otherwise re-run its
    lineage per reference."""
    # ONE-EXPR grid (r13, VERDICT r12 ask #6): the r12 form staged the
    # grid through 2 lazy localCheckpoints + 2 broadcast cross-joins +
    # a groupBy join-back — ~1.2 s of per-call construction (py4j +
    # analysis) measured on a 2-row input, paid by all four DoReMi
    # queries. The |sources| x DOREMI_STEPS grid now folds inside ONE
    # parsed expression over a collect_list'd struct array: every total
    # is an order-independent int64 sum, per-source outputs stay keyed
    # by source inside the structs, and the arithmetic is TERM-FOR-TERM
    # the r12 chain (same exp / round / div lattice — the oracle is
    # unchanged and the planted-replay tests pin the values).
    # m_t is referenced twice (totals + weights) and mx once per m_t —
    # recomputation is |sources| x steps x 2 exp() calls on ONE row.
    mx = """aggregate(xs, cast('-Infinity' as double),
                      (mxa, xe) -> if(xe.excess_nats > mxa,
                                      xe.excess_nats, mxa))"""
    m_t = f"""transform(xs, xm -> cast(round(
                exp({DOREMI_ETA!r} * t * (xm.excess_nats - {mx}))
                * 1000000, 0) as bigint))"""
    mw = f"""zip_with(
        xs,
        aggregate(
            sequence(1, {DOREMI_STEPS}),
            transform(xs, x0 -> 0L),
            (acc, t) -> zip_with(
                acc,
                transform({m_t},
                    m -> m * 1000000 div aggregate(
                        {m_t}, 0L, (ta, m2) -> ta + m2)),
                (wa, w) -> wa + w)),
        (x, ws) -> struct(
            x.source AS source,
            x.n_docs AS n_docs,
            x.excess_nats AS excess_nats,
            cast(ws div {DOREMI_STEPS} as bigint) AS alpha_bar_ppm,
            cast(({1_000_000 - DOREMI_SMOOTH_PPM}
                  * (ws div {DOREMI_STEPS})) div 1000000
                 + {DOREMI_SMOOTH_PPM} div size(xs) as bigint)
                AS weight_ppm))"""
    return (
        excess.agg(
            F.collect_list(
                F.struct("source", "n_docs", "excess_nats")
            ).alias("xs")
        )
        .select(F.explode(F.expr(mw)).alias("r"))
        .select("r.*")
    )


@query(
    "source_mixture_reweighted",
    oracle=f"""
    WITH {_sql_doremi_ctes()}
    SELECT source, n_docs, excess_nats, alpha_bar_ppm, weight_ppm FROM rw
    """,
)
def source_mixture_reweighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Excess-loss-driven domain mixture weights (DoReMi-lite, VERDICT
    r11 ask #5): each source's weight comes from bounded multiplicative-
    weight updates on its clipped excess loss — the mean per-doc margin
    by which the stronger-context bigram LM explains the source's text
    better than the unigram LM (the doc_learnability_rho contrast
    aggregated per source). Sources a stronger model learns more from
    get exponentially upweighted relative to flat/noisy sources, then
    iterate-averaging and 10% uniform smoothing keep the mix from
    collapsing onto one domain — the paper's recipe with frozen proxy/
    reference losses. Compare `source_learnability_mix`: that query is
    PROPORTIONAL to learnable-doc counts; this one is driven by loss
    MARGINS, so a small source with a large margin can outrank a big
    source with a thin one (pinned by the planted-flip fixture in
    tests/test_selection.py).

    Exactness: per-doc contrasts are 6dp-rounded and decimal-summed;
    after one exp() per (source, step) — max-normalized so the range is
    (0, 1], quantized round-to-nearest onto the 1e-6 lattice — the
    entire update/average/smooth chain is int64 ppm arithmetic.

    Scale: the two LM lineages (one vocabulary-sized shuffle each) plus
    one |sources|-keyed aggregate; the MW iteration is a
    |sources| x DOREMI_STEPS broadcast grid — no data-sized shuffle is
    added at any corpus size."""
    return doremi_reweight(_source_excess(spark, sf_dir))


@query(
    "corpus_doremi_mix_fill",
    oracle=f"""
    WITH {_sql_doremi_ctes()},
    weights AS (SELECT source, weight_ppm AS ppm FROM rw),
    {_sql_fill_tail()}""",
)
def corpus_doremi_mix_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DoReMi-reweighted training mix MATERIALIZED: identical fill
    semantics to `corpus_training_mix_fill` (per-source token quotas
    over the corpus-half budget, filled highest-quality-first under a
    running token sum — the shared `_sql_fill_tail` statement) with the
    quota ppm coming from the excess-loss reweighting instead of the
    proportional learnability mix. The composition VERDICT r11 ask #5
    names: signals → DoReMi weights → materialized dataset.

    Scale: the reweighting adds only broadcast-sized frames on top of
    the LM lineages; the fill is the per-source window shape (bucketed
    twin available via `mix_fill_bucketed` for the one-giant-source
    regime)."""
    mix = source_mixture_reweighted(spark, sf_dir).select(
        "source", F.col("weight_ppm").alias("mix_weight_ppm")
    )
    docs = load_table(spark, sf_dir, "documents")
    scored = _mix_scored(docs).localCheckpoint(eager=False)
    quotas = _mix_quotas(mix, scored)
    return mix_fill_window(scored, quotas)


@query(
    "source_doremi_epochs",
    oracle=f"""
    WITH {_sql_doremi_ctes()},
    weights AS (SELECT source, weight_ppm AS ppm FROM rw),
    {_sql_epoch_tail()}""",
)
def source_doremi_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The repeat factor the DOREMI mix implies per source — the
    reweighted twin of `source_epoch_allocation` (epochs_ppm =
    quota / source_tokens in integer ppm, overflow-safe), completing the
    recipe symmetry: both mixes now publish BOTH artifacts (the doc-level
    fill and the epochs sentence), each pair through ONE shared quota
    statement (`_mix_quotas` / `_sql_epoch_tail`), so a recipe's fill and
    its epochs can never disagree. Under excess-loss reweighting a small
    high-margin source typically shows epochs_ppm far above 1e6 (the
    trainer repeats it — DoReMi's characteristic oversampling of
    learnable domains) while flat sources fall well below.

    Scale: the reweighting's broadcast grid over the two LM lineages +
    one |sources|-row token aggregate — nothing data-sized moves beyond
    the lineages themselves."""
    mix = source_mixture_reweighted(spark, sf_dir).select(
        "source", F.col("weight_ppm").alias("mix_weight_ppm")
    )
    docs = load_table(spark, sf_dir, "documents")
    scored = _mix_scored(docs).localCheckpoint(eager=False)
    return _epoch_allocation(mix, scored)


# ---------------------------------------------------------------------------
# Curriculum schedule (round 12): the ORDER a trainer consumes the corpus
# in — easy-to-hard phases (Bengio et al. curriculum learning; the
# difficulty proxy is the corpus's own unigram LM, the standard
# cheap stand-in) with a deterministic within-phase shuffle so each phase
# still interleaves sources/topics instead of replaying rank order.
# ---------------------------------------------------------------------------

#: number of curriculum phases (easy → hard quartiles)
CURRICULUM_PHASES = 4


def _sql_curriculum_ctes() -> str:
    """The curriculum schedule as DuckDB CTEs ending in ``sched(doc_id,
    avg_logprob, difficulty_rank, phase, order_in_phase)`` — shared by
    the schedule query and the shard-manifest composition."""
    return f"""{SQL_UNIGRAM_LP_CTES},
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM lp),
    r AS (
        SELECT doc_id, avg_logprob,
               CAST(ROW_NUMBER() OVER (ORDER BY avg_logprob DESC, doc_id)
                    AS BIGINT) AS difficulty_rank
        FROM lp
    ),
    p AS (
        SELECT r.doc_id, r.avg_logprob, r.difficulty_rank,
               CAST(((r.difficulty_rank - 1) * {CURRICULUM_PHASES}) // nn.n
                    AS BIGINT) AS phase,
               CAST(('0x' || substr(md5('cur:' || CAST(r.doc_id AS VARCHAR)),
                                    1, 8)) AS BIGINT) AS su
        FROM r CROSS JOIN nn
    ),
    sched AS (
        SELECT doc_id, avg_logprob, difficulty_rank, phase,
               CAST(ROW_NUMBER() OVER (PARTITION BY phase
                                       ORDER BY su, doc_id)
                    AS BIGINT) AS order_in_phase
        FROM p
    )"""


@query(
    "corpus_curriculum_schedule",
    oracle=f"""
    WITH {_sql_curriculum_ctes()}
    SELECT doc_id, avg_logprob, difficulty_rank, phase, order_in_phase
    FROM sched
    """,
)
def corpus_curriculum_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum training schedule: every scored document gets (1) a
    global difficulty rank — easiest first, where easy = highest mean
    unigram logprob (`doc_unigram_logprob`'s cross-engine-exact score) —
    (2) a phase = its rank quartile (0 easiest … 3 hardest; a trainer
    consumes phases in order, the easy-to-hard pacing of curriculum
    learning), and (3) a deterministic md5-shuffled position WITHIN its
    phase, so each phase interleaves sources and topics instead of
    replaying difficulty order (the salted-hash shuffle convention from
    `corpus_shuffled_shards` / `corpus_weighted_sample`; salt 'cur:'
    keeps this draw independent of theirs). The output IS the schedule:
    ORDER BY (phase, order_in_phase) is the training sequence, and it is
    reproducible across engines, runs, and cluster sizes.

    Exactness: the difficulty score is the 6dp decimal-lattice logprob;
    ranks are integer row_numbers over the (score DESC, doc_id) total
    order; phase is integer floor arithmetic; the shuffle key is the
    md5-hex-prefix integer both engines derive identically.

    Scale: the global rank runs as the two-phase bucketed kernel
    (`global_row_number`, ~n_buckets parallel windows — never one
    serial global window), and the within-phase rank uses
    `class_row_number` — CURRICULUM_PHASES is tiny, exactly the
    degenerate `Window.partitionBy` case that kernel exists for (global
    equi-depth cuts on the shuffle key keep ~n_buckets-way parallelism
    per phase). The scored frame is pinned once; everything else is
    bounded aggregates and broadcasts."""
    lp = doc_unigram_logprob(spark, sf_dir).select(
        "doc_id", "avg_logprob"
    ).localCheckpoint(eager=False)
    nn = lp.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    ranked = global_row_number(
        lp,
        "avg_logprob",
        [F.asc("doc_id")],
        32,
        descending=True,
        out="difficulty_rank",
    )
    phased = (
        ranked.crossJoin(F.broadcast(nn))
        .select(
            "doc_id",
            "avg_logprob",
            "difficulty_rank",
            F.expr(
                f"cast((difficulty_rank - 1) * {CURRICULUM_PHASES} div n"
                " as bigint)"
            ).alias("phase"),
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("cur:"), F.col("doc_id").cast("string")
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            )
            .cast("bigint")
            .alias("su"),
        )
        .localCheckpoint(eager=False)  # class_row_number scans it thrice
    )
    return class_row_number(
        phased,
        "phase",
        "su",
        [F.asc("doc_id")],
        32,
        out="order_in_phase",
    ).select(
        "doc_id", "avg_logprob", "difficulty_rank", "phase", "order_in_phase"
    )


#: shards per curriculum phase (round-robin over the within-phase order)
CURRICULUM_SHARDS = 8


@query(
    "curriculum_shard_manifest",
    oracle=f"""
    WITH {_sql_curriculum_ctes()},
    tok2 AS (
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents
    ),
    m AS (
        SELECT s.phase,
               CAST((s.order_in_phase - 1) % {CURRICULUM_SHARDS} AS BIGINT)
                   AS shard,
               s.doc_id, s.order_in_phase, t.n_tokens
        FROM sched s JOIN tok2 t USING (doc_id)
    )
    SELECT phase, shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           CAST(CAST(SUM(CAST(CAST(('0x' || substr(
                     md5(CAST(doc_id AS VARCHAR) || ':'
                         || CAST(order_in_phase AS VARCHAR)), 1, 15))
                     AS BIGINT) AS DECIMAL(38,0))) AS DECIMAL(38,0))
                AS VARCHAR) AS order_checksum
    FROM m GROUP BY phase, shard
    """,
)
def curriculum_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The resume-safe handoff artifact for the curriculum schedule:
    each (phase, shard) — shard = round-robin over the within-phase
    order, so shards stay balanced AND each preserves the schedule's
    interleaving — gets its doc/token totals and an ORDER-SENSITIVE
    checksum. `training_data_manifest`'s checksum is deliberately
    order-insensitive (membership); a curriculum consumer must also
    prove it will replay docs in the SAME order after a restart, so the
    checksum here sums POSITION-TAGGED hashes: md5(doc_id ':'
    order_in_phase) per doc — any doc moved, dropped, duplicated, or
    reordered changes the sum, yet the aggregation itself is commutative.

    Exactness: each term is a 60-bit integer (15 md5 hex chars — the
    engine-portable hash twin) summed on the DECIMAL(38,0) lattice
    (Spark's bigint SUM would wrap silently at ~1.5e8 docs per shard;
    DuckDB widens to HUGEINT — the decimal sum is exact AND
    schema-identical on both engines), emitted as a string.

    Scale: the commutative position-tagged sum is the point — an
    order-sensitive digest usually needs an ordered string_agg
    (collect_list per group: unbounded state, driver-killer at 100 TB);
    here the per-group state is one decimal accumulator with map-side
    partial aggregation, and the output is |phases| x |shards| rows."""
    sched = corpus_curriculum_schedule(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.size(tokens(F.col("text"))).cast("bigint").alias("n_tokens"),
    )
    term = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("doc_id").cast("string"),
                    F.lit(":"),
                    F.col("order_in_phase").cast("string"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    return (
        sched.join(toks, "doc_id")
        .select(
            "phase",
            ((F.col("order_in_phase") - 1) % CURRICULUM_SHARDS)
            .cast("bigint")
            .alias("shard"),
            "n_tokens",
            term.cast("decimal(38,0)").alias("term"),
        )
        .groupBy("phase", "shard")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
            F.sum("term").cast("decimal(38,0)").cast("string").alias(
                "order_checksum"
            ),
        )
    )


#: ablation grid: fraction of the corpus's tokens the mix may use, ppm
ABLATION_BUDGETS_PPM = [250_000, 500_000, 750_000]


@query(
    "corpus_mix_budget_ablation",
    oracle=f"""
    WITH {_sql_mix_ctes()},
    weights AS (
        SELECT source, {SQL_MIX_PPM} AS ppm
        FROM per_src CROSS JOIN tot
    ),
    {_sql_cum_ctes()},
    budgets AS (
        SELECT CAST(unnest({ABLATION_BUDGETS_PPM}) AS BIGINT) AS budget_ppm
    ),
    qb AS (
        SELECT b.budget_ppm, w.source,
               CAST({_ppm_scale(_ppm_scale("totc.total_tokens",
                                           "b.budget_ppm", "//"),
                                "w.ppm", "//")} AS BIGINT) AS quota_tokens
        FROM weights w CROSS JOIN totc CROSS JOIN budgets b
    )
    SELECT qb.budget_ppm, c.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs_kept,
           CAST(SUM(c.n_tokens) AS BIGINT) AS tokens_kept,
           qb.quota_tokens
    FROM cum c JOIN qb ON qb.source = c.source
    WHERE c.cum_tokens <= qb.quota_tokens
    GROUP BY qb.budget_ppm, c.source, qb.quota_tokens
    """,
)
def corpus_mix_budget_ablation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The recipe-tuning table: what the learnability-weighted training
    mix KEEPS per source at three corpus-token budgets (25% / 50% /
    75%) — the ablation a data engineer reads before committing to a
    budget ("at 25% source X contributes nothing; at 75% we exhaust
    source Y"). Same weights, same quality ranking, same quota algebra
    as `corpus_training_mix_fill` (the 50% row aggregates EXACTLY the
    committed fill's rows); only the budget varies.

    Scale: the per-source running sum — the expensive half — is
    computed ONCE (it is quota-independent, `_mix_cum`/`_sql_cum_ctes`)
    and compared against a |budgets| x |sources| broadcast quota grid;
    adding a budget costs one more broadcast row, not another window
    pass. Output is |budgets| x |sources| rows."""
    mix = source_learnability_mix(spark, sf_dir).select(
        "source", "mix_weight_ppm"
    )
    docs = load_table(spark, sf_dir, "documents")
    scored = _mix_scored(docs).localCheckpoint(eager=False)
    total = scored.agg(
        F.sum("n_tokens").cast("bigint").alias("total_tokens")
    )
    budgets = spark.range(1).select(
        F.explode(
            F.lit(ABLATION_BUDGETS_PPM).cast("array<bigint>")
        ).alias("budget_ppm")
    )
    qb = (
        mix.crossJoin(F.broadcast(total))
        .crossJoin(F.broadcast(budgets))
        .select(
            "budget_ppm",
            "source",
            F.expr(
                _ppm_scale(
                    _ppm_scale("total_tokens", "budget_ppm", "div"),
                    "mix_weight_ppm",
                    "div",
                )
            )
            .cast("bigint")
            .alias("quota_tokens"),
        )
    )
    return (
        _mix_cum(scored)
        .join(F.broadcast(qb), "source")
        .filter(F.col("cum_tokens") <= F.col("quota_tokens"))
        .groupBy("budget_ppm", "source", "quota_tokens")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs_kept"),
            F.sum("n_tokens").cast("bigint").alias("tokens_kept"),
        )
        .select(
            "budget_ppm", "source", "n_docs_kept", "tokens_kept",
            "quota_tokens",
        )
    )
