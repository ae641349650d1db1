"""Text-analysis operators over the ``documents`` table: per-document
statistics, token counting, corpus token frequencies, quality scoring, and a
language-ID heuristic (SURVEY.md §2.12 / north-star text analysis).

All hot paths are JVM-side column expressions (split/filter/transform) —
no Python UDFs — so they codegen and scale linearly with one shuffle (or
zero, for the per-document maps).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airflow_ml_pipeline_spark.functions.compare import SQL_DAVG, davg
from airflow_ml_pipeline_spark.functions.text import (
    LANG_MARKERS,
    STOPWORDS_EN,
    count_in,
    tokens,
    word_token_count,
)
from airflow_ml_pipeline_spark.plans.registry import query
from airflow_ml_pipeline_spark.sources.catalog import load_table

_SQL_STOP = ", ".join(f"'{w}'" for w in STOPWORDS_EN)

#: heuristic quality-gate thresholds. The DSIR target distribution
#: (selection.py), the learned-model calibration population and filter
#: (quality_model.py), and doc_quality/corpus_quality_filtered here all
#: claim to mirror THE SAME gate — so there is exactly one definition,
#: composed everywhere (ADVICE r7: four literal restatements would
#: silently desynchronize on a threshold change).
GATE_MIN_TOKENS = 20
GATE_STOP_LO = 0.01
GATE_STOP_HI = 0.6


def sql_quality_gate(col: str = "text") -> str:
    """DuckDB boolean predicate for the heuristic quality gate over a
    text column (>= GATE_MIN_TOKENS whitespace tokens, stopword ratio
    inside [GATE_STOP_LO, GATE_STOP_HI])."""
    toks = f"string_split({col}, ' ')"
    return (
        f"len({toks}) >= {GATE_MIN_TOKENS}\n"
        f"      AND CAST(len(list_filter({toks},\n"
        f"            t -> t IN ({_SQL_STOP}))) AS DOUBLE)\n"
        f"          / len({toks}) BETWEEN {GATE_STOP_LO!r} AND {GATE_STOP_HI!r}"
    )


def sql_gate_rules(col: str = "text") -> dict[str, str]:
    """The gate's individual rules as DuckDB predicates — the SAME
    constants as :func:`sql_quality_gate` (whose BETWEEN is exactly
    stop_ratio_lo AND stop_ratio_hi; pinned by
    tests/test_textstats_rules.py). Per-rule form exists for the
    diagnostics breakdown — the composed gate stays the one filter every
    pipeline consumer uses."""
    toks = f"string_split({col}, ' ')"
    stop_ratio = (
        f"CAST(len(list_filter({toks}, t -> t IN ({_SQL_STOP})))"
        f" AS DOUBLE) / len({toks})"
    )
    return {
        "min_tokens": f"len({toks}) >= {GATE_MIN_TOKENS}",
        "stop_ratio_lo": f"{stop_ratio} >= {GATE_STOP_LO!r}",
        "stop_ratio_hi": f"{stop_ratio} <= {GATE_STOP_HI!r}",
    }


def gate_rule_conds(n_tok, stop_ratio) -> dict:
    """The gate's individual rules as Spark conditions over precomputed
    token-count and stopword-ratio columns — the single statement both
    :func:`quality_gate_cond` (their conjunction) and the per-rule
    breakdown compose."""
    return {
        "min_tokens": n_tok >= GATE_MIN_TOKENS,
        "stop_ratio_lo": stop_ratio >= GATE_STOP_LO,
        "stop_ratio_hi": stop_ratio <= GATE_STOP_HI,
    }


def quality_gate_cond(n_tok, stop_ratio):
    """Spark twin of :func:`sql_quality_gate` over precomputed
    whitespace-token-count and stopword-ratio columns — the conjunction
    of :func:`gate_rule_conds`."""
    rules = gate_rule_conds(n_tok, stop_ratio)
    return rules["min_tokens"] & rules["stop_ratio_lo"] & rules["stop_ratio_hi"]


@query(
    "doc_stats",
    oracle="""
    SELECT doc_id, lang, source,
           CAST(length(text) AS BIGINT) AS n_chars_actual,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_unique_tokens,
           round(CAST(length(replace(text, ' ', '')) AS DOUBLE)
                 / len(string_split(text, ' ')), 4) AS avg_token_len
    FROM documents
    """,
)
def doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document stats map: char/token/unique-token counts, mean token
    length. Pure projection — zero shuffles at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    # materialize the token array once — the outer projection references it
    # 3x, and split() inside a single projection re-evaluates per reference
    # (HOF-containing trees are excluded from subexpression elimination);
    # CollapseProject keeps the stage because the alias is multiply-used
    tok = docs.select(
        "doc_id", "lang", "source", "text", tokens(F.col("text")).alias("toks")
    )
    return tok.select(
        "doc_id",
        "lang",
        "source",
        F.length("text").cast("long").alias("n_chars_actual"),
        F.size("toks").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("toks")).cast("long").alias("n_unique_tokens"),
        F.round(
            F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("double")
            / F.size("toks"),
            4,
        ).alias("avg_token_len"),
    )


@query(
    "lang_distribution",
    oracle=f"""
    SELECT lang,
           COUNT(*) AS n_docs,
           {SQL_DAVG('n_chars')} AS avg_chars,
           {SQL_DAVG("len(string_split(text, ' '))")} AS avg_tokens
    FROM documents
    GROUP BY lang
    """,
)
def lang_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition by language tag — single hash agg."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        davg(F.col("n_chars")).alias("avg_chars"),
        davg(F.size(tokens(F.col("text"))).cast("double")).alias("avg_tokens"),
    )


@query(
    "token_frequencies",
    oracle="""
    SELECT tok, COUNT(*) AS freq, COUNT(DISTINCT doc_id) AS doc_freq
    FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        FROM documents
    )
    GROUP BY tok
    """,
)
def token_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus term + document frequencies: explode → hash agg. At 100 TB
    this is the canonical word-count shuffle; partial aggregation collapses
    the per-partition token stream before the exchange."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(
            F.count(F.lit(1)).alias("freq"),
            F.countDistinct("doc_id").alias("doc_freq"),
        )
    )


@query(
    "token_counts_bpeish",
    oracle=r"""
    SELECT source,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS whitespace_tokens,
           CAST(SUM(len(regexp_extract_all(text, '[a-zA-Z0-9]+|[^a-zA-Z0-9\s]'))) AS BIGINT)
               AS regex_tokens,
           CAST(SUM(CAST(ceil(length(text) / 4.0) AS BIGINT)) AS BIGINT) AS approx_bpe_tokens
    FROM documents
    GROUP BY source
    """,
)
def token_counts_bpeish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token accounting per source: whitespace tokens, regex word/punct
    tokens, and the chars/4 BPE approximation used for LLM budget sizing."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.sum(F.size(tokens(F.col("text")))).cast("long").alias("whitespace_tokens"),
        F.sum(word_token_count(F.col("text"))).cast("long").alias("regex_tokens"),
        F.sum(F.ceil(F.length("text") / 4.0).cast("long"))
        .cast("long")
        .alias("approx_bpe_tokens"),
    )


@query(
    "doc_quality",
    oracle=f"""
    SELECT doc_id,
           round(CAST(len(list_filter(string_split(text, ' '),
                 t -> t IN ({_SQL_STOP}))) AS DOUBLE)
                 / len(string_split(text, ' ')), 4) AS stopword_ratio,
           round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                 / len(string_split(text, ' ')), 4) AS unique_ratio,
           round(LEAST(1.0, CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0), 4)
               AS length_score,
           CASE WHEN {sql_quality_gate()}
                THEN 1 ELSE 0 END AS quality_pass
    FROM documents
    """,
)
def doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality scoring (the pre-training-filter classic): stopword
    ratio, lexical diversity, length score, and a pass/fail gate. All
    integer-count ratios → engine-exact doubles."""
    docs = load_table(spark, sf_dir, "documents")
    # token array materialized once (referenced 3x downstream), then the
    # integer counts materialized once (each referenced 2-3x) — HOF trees
    # are excluded from subexpression elimination, so the single-projection
    # form re-split the text per reference
    tok = docs.select("doc_id", tokens(F.col("text")).alias("toks"))
    counts = tok.select(
        "doc_id",
        F.size("toks").alias("n_tok"),
        count_in(F.col("toks"), STOPWORDS_EN).alias("n_stop"),
        F.size(F.array_distinct("toks")).alias("n_uniq"),
    )
    n_tok = F.col("n_tok")
    stop_ratio = F.col("n_stop").cast("double") / n_tok
    return counts.select(
        "doc_id",
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(F.col("n_uniq").cast("double") / n_tok, 4).alias(
            "unique_ratio"
        ),
        F.round(F.least(F.lit(1.0), n_tok.cast("double") / 100.0), 4).alias(
            "length_score"
        ),
        F.when(quality_gate_cond(n_tok, stop_ratio), F.lit(1))
        .otherwise(F.lit(0))
        .alias("quality_pass"),
    )


def _langid_scores_sql() -> str:
    cases = []
    for lang, markers in LANG_MARKERS.items():
        lst = ", ".join(f"'{w}'" for w in markers)
        cases.append(
            f"len(list_filter(string_split(text, ' '), t -> t IN ({lst}))) AS score_{lang}"
        )
    return ", ".join(cases)


#: the marker-argmax prediction CASE — ONE statement shared by the
#: per-doc langid oracle and the confusion-matrix oracle
_SQL_LANGID_PRED = """CASE
             WHEN score_en = 0 AND score_de = 0 AND score_es = 0 AND score_fr = 0
                THEN 'unknown'
             WHEN score_en >= score_de AND score_en >= score_es AND score_en >= score_fr
                THEN 'en'
             WHEN score_de >= score_es AND score_de >= score_fr THEN 'de'
             WHEN score_es >= score_fr THEN 'es'
             ELSE 'fr'
           END"""


@query(
    "langid_heuristic",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, lang AS lang_tag, {_langid_scores_sql()}
        FROM documents
    )
    SELECT doc_id, lang_tag,
           {_SQL_LANGID_PRED} AS predicted_lang
    FROM scored
    """,
)
def langid_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language ID: integer hit counts per language, argmax with
    a fixed priority tie-break (en > de > es > fr), 'unknown' when no marker
    hits. Deterministic, engine-portable, zero-shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    # token array materialized once, then the four marker counts as
    # columns: the argmax CASE references every score 2-3x, and each
    # count_in is a HOF filter excluded from subexpression elimination —
    # the single-projection form re-split and re-scanned the text ~10x
    tok = docs.select(
        "doc_id", "lang", tokens(F.col("text")).alias("toks")
    )
    scored = tok.select(
        "doc_id",
        "lang",
        *[
            count_in(F.col("toks"), m).alias(f"s_{lang}")
            for lang, m in LANG_MARKERS.items()
        ],
    )
    scores = {lang: F.col(f"s_{lang}") for lang in LANG_MARKERS}
    all_zero = (
        (scores["en"] == 0)
        & (scores["de"] == 0)
        & (scores["es"] == 0)
        & (scores["fr"] == 0)
    )
    pred = (
        F.when(all_zero, F.lit("unknown"))
        .when(
            (scores["en"] >= scores["de"])
            & (scores["en"] >= scores["es"])
            & (scores["en"] >= scores["fr"]),
            F.lit("en"),
        )
        .when((scores["de"] >= scores["es"]) & (scores["de"] >= scores["fr"]), F.lit("de"))
        .when(scores["es"] >= scores["fr"], F.lit("es"))
        .otherwise(F.lit("fr"))
    )
    return scored.select(
        "doc_id", F.col("lang").alias("lang_tag"), pred.alias("predicted_lang")
    )


@query(
    "quality_rule_breakdown",
    oracle=f"""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN NOT ({sql_gate_rules()['min_tokens']})
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_min_tokens,
           CAST(SUM(CASE WHEN NOT ({sql_gate_rules()['stop_ratio_lo']})
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_stop_ratio_lo,
           CAST(SUM(CASE WHEN NOT ({sql_gate_rules()['stop_ratio_hi']})
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_stop_ratio_hi,
           CAST(SUM(CASE WHEN {sql_quality_gate()}
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
    FROM documents GROUP BY lang
    """,
)
def quality_rule_breakdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-rule diagnostics for the quality gate, by language: how many
    docs fail EACH rule (a doc can fail several) and how many pass the
    whole gate — the tuning table for the thresholds themselves. The
    aggregate gate says "38% dropped"; this says WHICH rule did the
    dropping and whether it discriminates by language (a stopword-ratio
    rule tuned on English is the classic multilingual false-reject).
    Rules are ``gate_rule_conds`` — the gate's own components, stated
    once; the conjunction≡gate identity is test-pinned, so the
    breakdown can never disagree with the filter.

    Scale: one scan, per-row token/ratio projection, |langs|-keyed
    aggregate with map-side partials."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    frame = docs.select(
        "lang",
        F.size(toks).alias("n_tok"),
        (count_in(toks, STOPWORDS_EN).cast("double") / F.size(toks)).alias(
            "stop_ratio"
        ),
    )
    rules = gate_rule_conds(F.col("n_tok"), F.col("stop_ratio"))
    return frame.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum((~rules["min_tokens"]).cast("int"))
        .cast("bigint")
        .alias("n_fail_min_tokens"),
        F.sum((~rules["stop_ratio_lo"]).cast("int"))
        .cast("bigint")
        .alias("n_fail_stop_ratio_lo"),
        F.sum((~rules["stop_ratio_hi"]).cast("int"))
        .cast("bigint")
        .alias("n_fail_stop_ratio_hi"),
        F.sum(
            quality_gate_cond(F.col("n_tok"), F.col("stop_ratio")).cast("int")
        )
        .cast("bigint")
        .alias("n_pass"),
    )


@query(
    "langid_confusion",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, lang AS lang_tag, {_langid_scores_sql()}
        FROM documents
    ),
    pred AS (
        SELECT lang_tag, {_SQL_LANGID_PRED} AS predicted_lang
        FROM scored
    )
    SELECT lang_tag, predicted_lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM pred
    GROUP BY lang_tag, predicted_lang
    """,
)
def langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion matrix: corpus label vs marker-argmax
    prediction, doc counts per (label, predicted) cell — the evaluation
    table that decides whether the cheap classifier is good enough to
    route documents (diagonal = agreement; the 'unknown' column is the
    abstention rate; off-diagonal cells name the confusable pairs). The
    prediction is ``langid_heuristic``'s own argmax, stated once on each
    engine, so the matrix can never drift from the per-doc query.

    Scale: the marker scoring is the same zero-shuffle projection as
    langid_heuristic; the matrix adds one |langs|^2-keyed aggregate with
    map-side partials."""
    pred = langid_heuristic(spark, sf_dir)
    return pred.groupBy("lang_tag", "predicted_lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )


@query(
    "corpus_quality_filtered",
    oracle=f"""
    SELECT doc_id, lang, source, n_chars
    FROM documents
    WHERE {sql_quality_gate()}
      AND CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
          / len(string_split(text, ' ')) >= 0.15
    """,
)
def corpus_quality_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed pre-training corpus filter: length gate + stopword-ratio
    band + lexical-diversity floor, as ONE pushed-down filter pass (the
    pipeline shape that precedes dedup in an LLM data pipeline)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    n_tok = F.size(toks)
    stop_ratio = count_in(toks, STOPWORDS_EN).cast("double") / n_tok
    unique_ratio = F.size(F.array_distinct(toks)).cast("double") / n_tok
    return docs.filter(
        quality_gate_cond(n_tok, stop_ratio) & (unique_ratio >= 0.15)
    ).select("doc_id", "lang", "source", "n_chars")


@query(
    "doc_top_tfidf_term",
    oracle="""
    WITH tf AS (
        SELECT doc_id, tok, COUNT(*) AS tf
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
        GROUP BY doc_id, tok
    ),
    df AS (
        SELECT tok, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY tok
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.tok,
               round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
        FROM tf JOIN df USING (tok) CROSS JOIN n
    )
    SELECT doc_id, tok AS top_term, tfidf
    FROM (
        SELECT doc_id, tok, tfidf,
               row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, tok) AS rk
        FROM scored
    )
    WHERE rk = 1
    """,
)
def doc_top_tfidf_term(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top TF-IDF term, fully columnar (explode → tf → df →
    idf join → window top-1). The idf factor ln(N/df) is a single-double
    computation identical across engines; tf*idf rounds at 6dp."""
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    tf = (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
    scored = tf.join(df, "tok").select(
        "doc_id",
        "tok",
        F.round(
            F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6
        ).alias("tfidf"),
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("tok"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("doc_id", F.col("tok").alias("top_term"), "tfidf")
    )


@query(
    "doc_length_histogram",
    oracle="""
    SELECT CAST(FLOOR(CAST(n_chars AS DOUBLE) / 100) * 100 AS BIGINT)
               AS bucket_lo,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS bucket_chars
    FROM documents
    GROUP BY 1
    """,
)
def doc_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width document-length histogram (100-char bins): the length
    profile a curation run reports before/after filtering. Binning is a
    scalar projection, so the whole histogram is one hash aggregation with
    map-side partials — O(bins) output rows regardless of corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        (F.floor(F.col("n_chars").cast("double") / 100) * 100)
        .cast("bigint")
        .alias("bucket_lo")
    )
    return docs.groupBy(bucket).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("bucket_chars"),
    )


#: DuckDB CTE chain producing ``lp(doc_id, n_tokens, avg_logprob)`` — the
#: per-document unigram-LM score on the shared decimal-ln lattice. The ONLY
#: SQL statement of this lineage: ``doc_unigram_logprob``'s oracle selects
#: from it verbatim, and the CCNet-style perplexity-bucket oracle
#: (``operators/selection.py``) builds its per-language ranking on top.
SQL_UNIGRAM_LP_CTES = """tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
    ),
    vocab AS (SELECT t, COUNT(*) AS cnt FROM tok GROUP BY t),
    total AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS n_corpus FROM vocab),
    lp AS (
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               round((CAST(SUM(CAST(ln(CAST(cnt AS DOUBLE)) AS DECIMAL(25,6)))
                           AS DOUBLE)
                      - COUNT(*) * CAST(CAST(ln(n_corpus) AS DECIMAL(25,6))
                           AS DOUBLE))
                     / COUNT(*), 6) AS avg_logprob
        FROM tok JOIN vocab USING (t) CROSS JOIN total
        GROUP BY doc_id, n_corpus
    )"""


@query(
    "doc_unigram_logprob",
    oracle=f"""
    WITH {SQL_UNIGRAM_LP_CTES}
    SELECT doc_id, n_tokens, avg_logprob FROM lp
    """,
)
def doc_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model quality score: per-document mean log
    probability of its tokens under the corpus's own unigram distribution
    — the cheap stand-in for the KenLM-perplexity filter every pretraining
    pipeline runs (low mean logprob = rare-token noise, boilerplate, or
    wrong-language text).

    Two aggregations: (1) the corpus vocabulary with counts — at 100 TB
    this is the only full shuffle, and its output is vocabulary-sized, so
    it broadcasts into (2) a per-document sum of per-token log counts.
    avg_logprob = (Σ ln cnt(t) - n·ln N) / n, so the corpus total N never
    needs to join per-token — it enters once per document. Each ln value
    is rounded to 6dp before the sum (decimal-exact accumulation,
    order-independent) so Spark and the oracle agree bit-for-bit."""
    return unigram_doc_scores(load_table(spark, sf_dir, "documents"))


def corpus_vocab(docs: DataFrame) -> DataFrame:
    """(t, cnt): the corpus unigram table — the ONE full-corpus token
    aggregate both LM scorers consume. Compositions that score under
    both models (learnability, DoReMi excess loss) build it once, pin it
    with a lazy localCheckpoint (vocabulary-sized output, corpus-sized
    compute — exactly the pin-pays case), and pass it to both scorers;
    standalone scorers build their own."""
    return (
        docs.select(F.explode(tokens(F.col("text"))).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def unigram_doc_scores(docs: DataFrame, uni: DataFrame | None = None) -> DataFrame:
    """Library form of ``doc_unigram_logprob`` over any (doc_id, text)
    frame; ``uni`` (default: built here) is the ``corpus_vocab`` table —
    pass a shared pinned copy when another scorer consumes it too."""
    tok = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("t"))
    vocab = corpus_vocab(docs) if uni is None else uni
    total = vocab.agg(F.sum("cnt").cast("double").alias("n_corpus"))
    ln6 = lambda c: F.log(c).cast("decimal(25,6)")  # noqa: E731
    per_doc = (
        tok.join(F.broadcast(vocab), "t")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(ln6(F.col("cnt").cast("double"))).cast("double").alias("s_ln"),
        )
    )
    return per_doc.crossJoin(F.broadcast(total)).select(
        "doc_id",
        "n_tokens",
        F.round(
            (
                F.col("s_ln")
                - F.col("n_tokens") * ln6(F.col("n_corpus")).cast("double")
            )
            / F.col("n_tokens"),
            6,
        ).alias("avg_logprob"),
    )


ZIPF_BUCKETS = 64  # equi-depth rank buckets for the vocabulary window


@query(
    "token_zipf_fit",
    oracle="""
    WITH freqs AS (
        SELECT tok, CAST(COUNT(*) AS BIGINT) AS freq
        FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        GROUP BY tok
    ),
    ranked AS (
        SELECT ln(CAST(row_number() OVER (ORDER BY freq DESC, tok)
                       AS DOUBLE)) AS x,
               ln(CAST(freq AS DOUBLE)) AS y
        FROM freqs
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_types,
           round(covar_pop(x, y) / var_pop(x), 6) AS zipf_slope,
           round(avg(y) - covar_pop(x, y) / var_pop(x) * avg(x), 6)
               AS zipf_intercept,
           round(corr(x, y) * corr(x, y), 6) AS r_squared
    FROM ranked
    """,
)
def token_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit of the corpus token distribution: least-squares slope
    of log(frequency) against log(rank). Natural-language corpora fit
    slope ~ -1 with high r² — a corpus whose slope collapses toward 0
    (uniform, synthetic spam) or whose r² craters (mixed garbage) fails
    the distributional sanity gate that runs beside per-doc quality
    filters.

    Scale shape: the word-count shuffle (map-side partials), then the
    vocabulary rank via the TIE-HEAVY two-phase bucketed window
    (``functions/prefix.py::global_row_number_tied`` — a web-scale
    corpus has 10^8+ types, too many for the single-partition global
    window this used before round 6, and frequencies are exactly the
    tie-heavy case where plain equi-depth bucketing degenerates: the
    hapax class at freq=1 is ~half the vocabulary and ties can never
    split across buckets, so it splits WITHIN the class on a
    byte-prefix surrogate of the token instead), then single-pass
    moment aggregates (covar/var/corr) — identical estimator stated on
    both engines, so the regression itself is value-checked, not just
    the counts."""
    from airflow_ml_pipeline_spark.functions.prefix import global_row_number_tied

    docs = load_table(spark, sf_dir, "documents")
    freqs = (
        docs.select(F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    ranked = global_row_number_tied(
        freqs, "freq", "tok", ZIPF_BUCKETS, descending=True
    ).select(
        F.log(F.col("rk").cast("double")).alias("x"),
        F.log(F.col("freq").cast("double")).alias("y"),
    )
    slope = F.covar_pop("x", "y") / F.var_pop("x")
    return ranked.agg(
        F.count(F.lit(1)).alias("n_types"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round(F.avg("y") - slope * F.avg("x"), 6).alias("zipf_intercept"),
        F.round(F.corr("x", "y") * F.corr("x", "y"), 6).alias("r_squared"),
    )


BIGRAM_LAMBDA = 0.8  # interpolation weight on the bigram term

#: The interpolated-bigram scoring pipeline as a reusable CTE chain
#: ending in ``blp(doc_id, n_bigrams, sum_logprob)`` — shared by
#: ``doc_bigram_logprob`` and the learnability contrast in selection.py
#: (one statement of the LM, same extraction pattern as
#: SQL_UNIGRAM_LP_CTES; CTE names are b-prefixed so both chains compose
#: in one WITH).
SQL_BIGRAM_LP_CTES = f"""btok AS (
        SELECT doc_id, string_split(text, ' ') AS ts FROM documents
    ),
    buni AS (
        SELECT t, CAST(COUNT(*) AS BIGINT) AS c1
        FROM (SELECT unnest(ts) AS t FROM btok) GROUP BY t
    ),
    btotal AS (SELECT CAST(SUM(c1) AS DOUBLE) AS n_corpus FROM buni),
    bgp AS (
        SELECT doc_id, w1, w2 FROM (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(ts)),
                          i -> struct_pack(w1 := ts[i], w2 := ts[i+1]))) AS p
            FROM btok WHERE len(ts) >= 2
        ), LATERAL (SELECT p.w1 AS w1, p.w2 AS w2)
    ),
    bbig AS (
        SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
        FROM bgp GROUP BY w1, w2
    ),
    blp AS (
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               CAST(SUM(CAST(ln(
                         {BIGRAM_LAMBDA} * (CAST(c12 AS DOUBLE)
                                            / CAST(u1.c1 AS DOUBLE))
                         + {round(1 - BIGRAM_LAMBDA, 6)}
                           * (CAST(u2.c1 AS DOUBLE) / n_corpus)
                     ) AS DECIMAL(25,6))) AS DOUBLE) AS sum_logprob
        FROM bgp
        JOIN bbig USING (w1, w2)
        JOIN buni u1 ON u1.t = bgp.w1
        JOIN buni u2 ON u2.t = bgp.w2
        CROSS JOIN btotal
        GROUP BY doc_id
    )"""


@query(
    "doc_bigram_logprob",
    oracle=f"""
    WITH {SQL_BIGRAM_LP_CTES}
    SELECT doc_id, n_bigrams, sum_logprob FROM blp
    """,
)
def doc_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated bigram language-model score per document:
    P(w2|w1) = λ·c(w1,w2)/c(w1) + (1−λ)·c(w2)/N, mean ln P over the doc's
    bigram positions — the next step up from ``doc_unigram_logprob``
    toward the KenLM-style perplexity filter (a doc of real words in
    IMPLAUSIBLE ORDER scores well under unigrams but poorly here — emit
    the decimal-exact logprob sum plus the bigram count (mean = sum/count
    for the caller; see the parity note below on why not the mean); docs
    with fewer than 2 tokens have no bigram evidence and are omitted).

    Scale shape: two vocabulary-shaped aggregations (unigram + bigram
    tables, map-side partials); the bigram table joins back on (w1, w2).
    On the test corpora both tables broadcast; at 100 TB the bigram table
    outgrows a broadcast and the same plan runs as a shuffle join keyed on
    the bigram — no step is corpus-quadratic. Per-bigram ln values are
    rounded to 6 decimals BEFORE the per-doc sum (decimal-exact,
    order-independent accumulation), the same bit-parity discipline as
    the unigram scorer."""
    return bigram_doc_scores(load_table(spark, sf_dir, "documents"))


def bigram_doc_scores(docs: DataFrame, uni: DataFrame | None = None) -> DataFrame:
    """Library form of ``doc_bigram_logprob`` over any (doc_id, text)
    frame; ``uni`` (default: built here) is the shared ``corpus_vocab``
    unigram table (t, cnt)."""
    toks = docs.select("doc_id", tokens(F.col("text")).alias("ts"))
    n = F.size("ts")
    bg = toks.filter(n >= 2).select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.slice("ts", 1, n - 1),
                F.slice("ts", 2, n - 1),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("p"),
    ).select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    if uni is None:
        uni = corpus_vocab(docs)
    uni = uni.select("t", F.col("cnt").alias("c1"))
    total = uni.agg(F.sum("c1").cast("double").alias("n_corpus"))
    big = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    p = F.lit(BIGRAM_LAMBDA) * (
        F.col("c12").cast("double") / F.col("c1_w1").cast("double")
    ) + F.lit(round(1 - BIGRAM_LAMBDA, 6)) * (
        F.col("c1_w2").cast("double") / F.col("n_corpus")
    )
    ln6 = F.log(p).cast("decimal(25,6)")
    u1 = F.broadcast(uni.select(F.col("t").alias("w1"), F.col("c1").alias("c1_w1")))
    u2 = F.broadcast(uni.select(F.col("t").alias("w2"), F.col("c1").alias("c1_w2")))
    # no broadcast hint on the bigram table: it grows with the corpus
    # (unlike the 1-row total and the vocab), and a hint overrides AQE's
    # sizing — the optimizer picks broadcast at test scale and a shuffle
    # join keyed on the bigram once the table outgrows the threshold
    return (
        bg.join(big, ["w1", "w2"])
        .join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            # the SUM stays decimal-exact then converts once to double —
            # emitting sum+count, not the mean: a mean of 6-decimal
            # decimals can land EXACTLY on a .5e-6 boundary (doc 3832 at
            # sf0.1: -3.4078655), where Spark's BigDecimal-of-the-binary
            # HALF_UP and DuckDB's decimal-rendering round() disagree by
            # 1e-6; the exact decimal sum has no such boundary
            F.sum(ln6).cast("double").alias("sum_logprob"),
        )
    )


BM25_QUERY = ("window", "merge", "batch")  # the standing lexical query
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP = 20

#: The BM25 per-(doc, term) scoring pipeline as a reusable CTE chain ending
#: in `scored(doc_id, s)` — ONE statement of the oracle shared by
#: ``bm25_topk`` and ``retrieval_rrf_fused`` so the two can never drift.
_SQL_BM25_SCORED_CTES = f"""
    tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
    ),
    doclen AS (
        SELECT doc_id, CAST(len(string_split(text, ' ')) AS DOUBLE) AS dl
        FROM documents
    ),
    stats AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
               AVG(dl) AS avgdl
        FROM doclen
    ),
    tf AS (
        SELECT doc_id, t, CAST(COUNT(*) AS DOUBLE) AS tf
        FROM tok WHERE t IN {BM25_QUERY}
        GROUP BY doc_id, t
    ),
    dft AS (
        SELECT t, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df
        FROM tok WHERE t IN {BM25_QUERY}
        GROUP BY t
    ),
    scored AS (
        SELECT tf.doc_id,
               CAST(round(
                   ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
                   * (tf * ({BM25_K1} + 1.0))
                   / (tf + {BM25_K1}
                      * (1.0 - {BM25_B} + {BM25_B} * dl / avgdl)), 6)
                   AS DECIMAL(25,6)) AS s
        FROM tf
        JOIN dft USING (t)
        JOIN doclen USING (doc_id)
        CROSS JOIN stats
    )"""


@query(
    "bm25_topk",
    oracle=f"""
    WITH {_SQL_BM25_SCORED_CTES}
    SELECT doc_id, CAST(SUM(s) AS DOUBLE) AS bm25
    FROM scored GROUP BY doc_id
    ORDER BY SUM(s) DESC, doc_id
    LIMIT {BM25_TOP}
    """,
)
def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical retrieval: BM25 top-{BM25_TOP} documents for a standing
    term query — the SPARSE retrieval path complementing the dense ANN
    ops (``knn_cosine_bruteforce``/``ann_*``); production RAG corpora run
    both and fuse. Okapi BM25 with the +1 idf variant (always positive),
    k1={BM25_K1}, b={BM25_B}.

    Scale shape: the postings scan filters to the query's terms BEFORE
    any shuffle (predicate on the exploded token — at scale this is an
    inverted-index lookup, here a pushed filter), so the aggregations
    touch only matching postings; df/avgdl are O(terms)/O(1) aggregates
    that broadcast into the per-(doc, term) scoring projection, and the
    global top-k is TakeOrderedAndProject. Per-term scores are rounded
    to 6 decimals and summed decimal-exactly per doc (the sum-not-mean
    parity discipline — see ``doc_bigram_logprob``); the final ordering
    key is that exact decimal sum, so ranking ties break identically in
    both engines (then doc_id)."""
    terms = list(BM25_QUERY)
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("t"))
    qtok = tok.filter(F.col("t").isin(terms))
    doclen = docs.select(
        "doc_id", F.size(tokens(F.col("text"))).cast("double").alias("dl")
    )
    stats = doclen.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    tf = qtok.groupBy("doc_id", "t").agg(
        F.count(F.lit(1)).cast("double").alias("tf")
    )
    df = qtok.groupBy("t").agg(
        F.countDistinct("doc_id").cast("double").alias("df")
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    tfnorm = (F.col("tf") * (BM25_K1 + 1.0)) / (
        F.col("tf")
        + BM25_K1 * (1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
    )
    s6 = F.round(idf * tfnorm, 6).cast("decimal(25,6)")
    scored = (
        tf.join(F.broadcast(df), "t")
        .join(doclen, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", s6.alias("s"))
    )
    agg = scored.groupBy("doc_id").agg(F.sum("s").alias("s_sum"))
    return (
        agg.orderBy(F.desc("s_sum"), F.asc("doc_id"))
        .limit(BM25_TOP)
        .select("doc_id", F.col("s_sum").cast("double").alias("bm25"))
    )


RRF_K = 60  # the standard reciprocal-rank-fusion damping constant


def _rrf_oracle() -> str:
    from airflow_ml_pipeline_spark.operators.similarity import (
        QUERY_VEC_ID,
        TOP_K,
    )

    from airflow_ml_pipeline_spark.operators.similarity import (
        SQL_COS_VS_QVEC,
    )

    return f"""
    WITH {_SQL_BM25_SCORED_CTES},
    bm25 AS (
        SELECT doc_id,
               CAST(row_number() OVER (ORDER BY SUM(s) DESC, doc_id)
                    AS BIGINT) AS r
        FROM scored GROUP BY doc_id
        ORDER BY SUM(s) DESC, doc_id LIMIT {BM25_TOP}
    ),
    q AS (
        SELECT CAST(embedding AS DOUBLE[]) AS qvec
        FROM embeddings WHERE vec_id = {QUERY_VEC_ID}
    ),
    dense_scored AS (
        SELECT vec_id AS doc_id, {SQL_COS_VS_QVEC} AS cos_sim
        FROM embeddings CROSS JOIN q
    ),
    dense AS (
        SELECT doc_id,
               CAST(row_number() OVER (ORDER BY cos_sim DESC, doc_id)
                    AS BIGINT) AS r
        FROM dense_scored
        ORDER BY cos_sim DESC, doc_id LIMIT {TOP_K}
    )
    SELECT COALESCE(b.doc_id, d.doc_id) AS doc_id,
           round(COALESCE(1.0 / ({RRF_K} + b.r), 0.0)
                 + COALESCE(1.0 / ({RRF_K} + d.r), 0.0), 6) AS rrf,
           CAST(CASE WHEN b.doc_id IS NULL THEN 0 ELSE 1 END AS INTEGER)
               AS in_sparse,
           CAST(CASE WHEN d.doc_id IS NULL THEN 0 ELSE 1 END AS INTEGER)
               AS in_dense
    FROM bm25 b FULL OUTER JOIN dense d ON b.doc_id = d.doc_id
    """


@query("retrieval_rrf_fused", oracle=_rrf_oracle())
def retrieval_rrf_fused(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: reciprocal-rank fusion of the sparse (BM25) and
    dense (cosine kNN over the documents' embedding twins — vec_id is the
    doc_id of the embedded document) rankings for the standing queries,
    RRF(d) = Σ_rankers 1/(k + rank_d) with k={RRF_K} — the standard
    score-free fusion RAG stacks run because BM25 scores and cosines are
    not calibrated against each other.

    Scale shape: both ranker subplans are the already-audited top-k plans
    (term-filtered postings; broadcast query vector), each ending in a
    bounded top-k — so the fusion join touches at most
    |bm25_top| + |dense_top| rows regardless of corpus size. Ranks are
    integers with engine-identical tiebreaks (exact decimal score, then
    doc_id), and the RRF sum is two fixed-order double terms, so the
    fused scores hash identically without any further rounding
    discipline."""
    from pyspark.sql.window import Window

    from airflow_ml_pipeline_spark.operators.similarity import (
        knn_cosine_bruteforce,
    )

    # re-rank deterministically from the emitted scores (bm25 is the exact
    # decimal sum cast to double; ties break on doc_id in both engines)
    sparse_r = bm25_topk(spark, sf_dir).select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("bm25"), F.asc("doc_id")))
        .cast("bigint")
        .alias("r_s"),
    )
    dense_r = knn_cosine_bruteforce(spark, sf_dir).select(
        F.col("vec_id").alias("doc_id"),
        F.row_number()
        .over(Window.orderBy(F.desc("cos_sim"), F.asc("vec_id")))
        .cast("bigint")
        .alias("r_d"),
    )
    rrf = F.round(
        F.coalesce(1.0 / (RRF_K + F.col("r_s")), F.lit(0.0))
        + F.coalesce(1.0 / (RRF_K + F.col("r_d")), F.lit(0.0)),
        6,
    )
    return sparse_r.join(dense_r, "doc_id", "full_outer").select(
        "doc_id",
        rrf.alias("rrf"),
        F.col("r_s").isNotNull().cast("int").alias("in_sparse"),
        F.col("r_d").isNotNull().cast("int").alias("in_dense"),
    )


HH_K = 10  # heavy hitters reported
HH_SUPPORT = 0.01  # freqItems support threshold (fraction of the stream)


@query(
    "token_heavy_hitters",
    oracle="""
    WITH t AS (
        SELECT unnest(string_split(text, ' ')) AS token FROM documents
    ),
    tc AS (
        SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM t WHERE token != '' GROUP BY token
    )
    SELECT token, cnt, CAST(1 AS BIGINT) AS hh_guarantee
    FROM tc ORDER BY cnt DESC, token LIMIT 10
    """,
)
def token_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters with a STREAMING-SKETCH witness — the self-verifying
    twin pattern of ``corpus_sketch_stats`` applied to frequent items:
    the exact top-10 tokens (count desc, deterministic tiebreak) are
    computed by the ordinary word-count aggregation, and each is checked
    against Spark's ``freqItems`` sketch (a Misra-Gries-family one-pass
    summary bounded by 1/support counters). The sketch guarantee is
    one-directional — every item with frequency > support * N MUST
    appear (false positives allowed, false negatives not) — so the
    emitted flag is (not above-threshold) OR found-in-sketch, which the
    oracle asserts as literal 1: a sketch dropping a true heavy hitter
    flips the flag and fails the driver hash.

    Scale shape: the exact side is the canonical word-count shuffle with
    map-side partials + TakeOrderedAndProject top-k; the sketch side is
    one pass with O(1/support) state per partition and a driver-side
    merge of bounded summaries — the shape that still works when the
    token stream is 100 TB and the exact aggregation is the thing you
    are trying to avoid (here both run, because the exact twin IS the
    verification)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(tokens(F.col("text"))).alias("token")
    ).filter(F.col("token") != "")
    # checkpoint the exact counts so the corpus token stream aggregates
    # ONCE: the total collect below materializes it, and the returned
    # top-k plan reuses the checkpointed RDD instead of re-running the
    # word-count shuffle (round-5 ADVICE: the uncached form aggregated
    # the stream twice per invocation)
    exact = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=False)
    )
    total = exact.agg(F.sum("cnt")).collect()[0][0]
    sketch_items = set(
        toks.stat.freqItems(["token"], HH_SUPPORT).collect()[0][0]
    )
    top = exact.orderBy(F.desc("cnt"), F.asc("token")).limit(HH_K)
    above = F.col("cnt") > HH_SUPPORT * float(total)
    found = F.col("token").isin(sketch_items) if sketch_items else F.lit(False)
    return top.select(
        "token",
        "cnt",
        F.when(~above | found, F.lit(1)).otherwise(F.lit(0))
        .cast("bigint")
        .alias("hh_guarantee"),
    )
