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
from airflow_ml_pipeline_spark.sources.catalog import load_table

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
    docs = load_table(spark, sf_dir, "documents")
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
    docs = load_table(spark, sf_dir, "documents")
    g = ngrams(tokens(F.col("text")), REPETITION_N)
    n = F.size(g)
    d = F.size(F.array_distinct(g))
    ratio = F.when(
        n > 0, F.round(F.lit(1) - d.cast("double") / n, 6)
    ).otherwise(F.lit(0.0))
    return docs.select(
        "doc_id",
        n.cast("bigint").alias("n_grams"),
        d.cast("bigint").alias("n_distinct_grams"),
        ratio.alias("dup_gram_ratio"),
    )


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
