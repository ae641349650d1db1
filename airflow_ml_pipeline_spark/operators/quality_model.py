"""Model-based text-quality classifier (round-7 surface, VERDICT r6 ask
#6): the learned companion to the heuristic ``doc_quality`` gate. Every
modern pretraining pipeline pairs threshold heuristics with a
fastText/CCNet-style learned quality score; this operator composes the
repo's two halves — the Spark ML churn stack and the text stack — into
train-and-apply over hashed term-frequency features of ``documents.text``.

Reference parity: the reference has no learned text filter (its ML surface
is the churn pipeline, ``src/ml_pipeline/train_model.py:52-57``); this is
an engine addition from the large-scale-curation brief, built on the same
Spark ML LogisticRegression the churn trainer uses
(``operators/training.py``).

Two declared queries:

- ``doc_quality_model_train`` (rows-only, like ``churn_train_eval``):
  fits a real Spark ML LogisticRegression on the hashed features against
  the heuristic gate's labels and returns one metrics row. Model fitting
  is iterative optimization — not SQL-expressible.
- ``doc_quality_model_scores`` (oracle-backed): applies the FROZEN
  released model — coefficients pinned below the way a shipped
  ``fasttext.bin``/``tokenizer.json`` is — as a pure deterministic
  column expression. The feature hash is md5-bucket (engine-portable,
  same idiom as ``simhash_md5``), the margin is a decimal-exact
  dot-product, so DuckDB can restate the whole scoring function and the
  driver hash-checks it end-to-end.

Scale shape: scoring is one exploded-token aggregation with map-side
partials (sum of per-token coefficients grouped by doc) against a
broadcast coefficient literal — no joins against model state, no UDFs,
whole-stage codegen throughout. Training featurization is the same
aggregation pivoted to a fixed-width array (64 doubles per doc), so the
training input is |docs| x 64 — the corpus is touched once however large
it is; the LR fit itself runs on that bounded feature frame via Spark
ML's distributed L-BFGS.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from airflow_ml_pipeline_spark.functions.text import (
    md5_bucket,
    sql_md5_bucket,
    tokens,
)
from airflow_ml_pipeline_spark.plans.registry import query
from airflow_ml_pipeline_spark.sources.catalog import load_table

#: Feature-space width. 64 buckets is deliberately small: the oracle
#: restates every coefficient as a SQL literal, and the corpus vocabulary
#: (~200 types) saturates a wider space too sparsely to learn from.
N_QUALITY_BUCKETS = 64

#: Training hyperparameters (frozen alongside the coefficients).
QUALITY_LR_PARAMS = {"maxIter": 50, "regParam": 0.01}


def quality_bucket(word: Column) -> Column:
    """md5-bucket feature hash: first 8 md5 hex chars as an integer, mod
    the bucket count — deterministic, engine-portable (DuckDB states it
    as ``CAST(('0x' || substr(md5(w),1,8)) AS BIGINT) % n``), and
    non-negative (32-bit magnitude, no sign wrap). Spark ML's HashingTF
    (murmur3, JVM-seeded) is NOT restatable in DuckDB, which would leave
    the scoring function un-oracle-checkable — the whole point of
    freezing the model is that scoring becomes a pure SQL function."""
    return md5_bucket(word, N_QUALITY_BUCKETS)


def _doc_words(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("word")
    ).filter(F.col("word") != "")


def hashed_tf_features(docs: DataFrame) -> DataFrame:
    """(doc_id, features array<double>[N_QUALITY_BUCKETS]) — the hashed
    term-frequency featurization shared by trainer and (conceptually) the
    frozen scorer. Fixed-width array via a per-doc bucket→count map; docs
    with no tokens get the zero vector."""
    counts = (
        _doc_words(docs)
        .groupBy("doc_id", quality_bucket(F.col("word")).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    per_doc = counts.groupBy("doc_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("bucket", "tf"))
        ).alias("m")
    )
    idx = F.sequence(
        F.lit(0).cast("long"), F.lit(N_QUALITY_BUCKETS - 1).cast("long")
    )
    featurized = per_doc.select(
        "doc_id",
        F.transform(
            idx,
            lambda i: F.coalesce(
                F.element_at(F.col("m"), i), F.lit(0).cast("long")
            ).cast("double"),
        ).alias("features_arr"),
    )
    zero = F.lit([0.0] * N_QUALITY_BUCKETS).cast("array<double>")
    return (
        docs.select("doc_id")
        .join(featurized, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("features_arr"), zero).alias("features_arr"),
        )
    )


def train_quality_model(
    spark: SparkSession, sf_dir: str
) -> tuple[float, list[float], DataFrame]:
    """Fit LogisticRegression(hashed TF → heuristic quality_pass label).
    Returns (intercept, coefficients, scored training frame). The label
    is the heuristic gate — the standard weak-supervision bootstrap for a
    learned quality filter (train on rule labels, deploy the smoother
    model scores)."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import array_to_vector

    from airflow_ml_pipeline_spark.operators.textstats import doc_quality

    docs = load_table(spark, sf_dir, "documents")
    labels = doc_quality(spark, sf_dir).select(
        "doc_id", F.col("quality_pass").cast("double").alias("label")
    )
    data = (
        hashed_tf_features(docs)
        .join(labels, "doc_id")
        .select(
            "doc_id",
            array_to_vector(F.col("features_arr")).alias("features"),
            "label",
        )
    )
    lr = LogisticRegression(
        featuresCol="features", labelCol="label", **QUALITY_LR_PARAMS
    )
    model = lr.fit(data)
    scored = model.transform(data)
    return float(model.intercept), list(model.coefficients), scored


@query("doc_quality_model_train")  # rows-only: iterative model fitting
def doc_quality_model_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the learned quality classifier and report one metrics row
    (n_docs, positive count, train AUC, accuracy, intercept, coefficient
    l2 norm). Rows-only like ``churn_train_eval``: L-BFGS fitting is not
    SQL-expressible; the SCORING side of the lifecycle is the
    hash-checked ``doc_quality_model_scores``."""
    intercept, coefs, scored = train_quality_model(spark, sf_dir)
    # the scored lineage (corpus scan + featurization + label query + LR
    # transform) feeds BOTH the metrics agg and the AUC evaluator below —
    # pin it once instead of recomputing the featurization twice (r7
    # review); the frame is |docs| rows of vectors, cache-sized
    scored = scored.localCheckpoint(eager=False)
    agg = scored.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("label").cast("long")).alias("n_pos"),
        F.sum(
            (F.col("prediction") == F.col("label")).cast("long")
        ).alias("n_correct"),
    ).collect()[0]
    from pyspark.ml.evaluation import BinaryClassificationEvaluator

    auc = BinaryClassificationEvaluator(
        labelCol="label", rawPredictionCol="rawPrediction"
    ).evaluate(scored)
    return spark.createDataFrame(
        [
            (
                int(agg.n_docs),
                int(agg.n_pos),
                round(float(agg.n_correct) / float(agg.n_docs), 6),
                round(float(auc), 6),
                round(float(intercept), 6),
                # coefficients arrive as numpy scalars — createDataFrame's
                # DoubleType rejects numpy.float64, so collapse to float
                round(float(sum(float(c) * float(c) for c in coefs)) ** 0.5, 6),
            )
        ],
        "n_docs bigint, n_pos bigint, train_accuracy double, "
        "train_auc double, intercept double, coef_l2norm double",
    )


#: The FROZEN released model: ``train_quality_model``'s own output on the
#: sf0.01 corpus (seedless L-BFGS on a fixed bounded feature frame is
#: reproducible), quantized to 6 dp — pinned the way a released
#: fastText/ONNX artifact is, so scoring is a pure deterministic function
#: and the DuckDB oracle can restate it with the weights as literals.
#: Regenerate via tools/freeze_quality_model.py after retraining.
QUALITY_INTERCEPT = "-3.667588"
QUALITY_COEFS: list[str] = [
    "0.114037", "0.069059", "0.000000", "0.000000",
    "0.000000", "0.062849", "0.000000", "0.000000",
    "0.000000", "0.000000", "0.143488", "0.000000",
    "0.309643", "-0.010090", "0.637614", "0.000000",
    "0.000000", "0.000000", "0.000000", "0.012209",
    "0.000000", "0.000000", "0.064068", "0.249084",
    "0.000000", "0.126971", "0.000000", "0.160195",
    "0.000000", "0.000000", "0.028616", "0.136144",
    "0.162848", "0.000000", "0.000000", "0.000000",
    "-0.084437", "0.000000", "0.000000", "0.307127",
    "0.000000", "0.175222", "0.000000", "0.000000",
    "0.000000", "0.469422", "0.000000", "0.000000",
    "0.243077", "0.131794", "0.000000", "0.000000",
    "0.000000", "0.000000", "0.000000", "0.016883",
    "0.216194", "0.881730", "0.154146", "0.000000",
    "0.000000", "0.119435", "0.000000", "0.000000",
]


def _sql_margin_ctes() -> str:
    """The frozen-model margin pipeline as DuckDB CTEs ending in
    ``m(doc_id, s)`` — THE single definition both the scoring and the
    calibration oracle compose (r7 review: the block had been duplicated,
    so a retrain applied to one oracle but not the other would make the
    two disagree about the same frozen model)."""
    coef_rows = ",\n        ".join(
        f"({i}, CAST('{c}' AS DECIMAL(12,6)))"
        for i, c in enumerate(QUALITY_COEFS)
    )
    return f"""w AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word
        FROM documents
    ),
    b AS (
        SELECT doc_id,
               {sql_md5_bucket("word", N_QUALITY_BUCKETS)} AS bucket
        FROM w WHERE word != ''
    ),
    coef(bucket, c) AS (VALUES
        {coef_rows}),
    m AS (
        SELECT b.doc_id, CAST(SUM(coef.c) AS DECIMAL(38,6)) AS s
        FROM b JOIN coef ON b.bucket = coef.bucket
        GROUP BY b.doc_id
    )"""


#: the decimal margin expression over the joined ``m.s`` column
_SQL_MARGIN = (
    f"CAST('{{intercept}}' AS DECIMAL(12,6))"
    " + COALESCE(m.s, CAST(0 AS DECIMAL(38,6)))"
).format(intercept=QUALITY_INTERCEPT)


def _sql_quality_scores() -> str:
    return f"""
    WITH {_sql_margin_ctes()}
    SELECT d.doc_id,
           CAST({_SQL_MARGIN} AS DOUBLE) AS quality_margin,
           CASE WHEN {_SQL_MARGIN} > 0 THEN 1 ELSE 0 END AS pred_quality
    FROM documents d LEFT JOIN m ON d.doc_id = m.doc_id
    """


def _sql_quality_calibration() -> str:
    # the heuristic gate composed from textstats' single definition —
    # one source of truth for the thresholds AND the stopword list
    # (ADVICE r7: four literal restatements)
    from airflow_ml_pipeline_spark.operators.textstats import sql_quality_gate

    return f"""
    WITH {_sql_margin_ctes()},
    scores AS (
        SELECT d.doc_id, CAST({_SQL_MARGIN} AS DOUBLE) AS margin
        FROM documents d LEFT JOIN m ON d.doc_id = m.doc_id
    ),
    heur AS (
        SELECT doc_id,
               CASE WHEN {sql_quality_gate()}
                    THEN 1 ELSE 0 END AS quality_pass
        FROM documents
    )
    SELECT CAST(floor(s.margin) AS BIGINT) AS margin_bin,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(h.quality_pass) AS BIGINT) AS n_heuristic_pass
    FROM scores s JOIN heur h ON s.doc_id = h.doc_id
    GROUP BY floor(s.margin)
    """


@query("doc_quality_model_calibration", oracle=_sql_quality_calibration())
def doc_quality_model_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration audit of the frozen quality model against the
    heuristic gate it was trained on: integer margin bins × (doc count,
    heuristic-pass count) — the reliability-curve input every deployed
    quality filter ships with (a well-calibrated model's pass rate rises
    monotonically with the margin; a flat or inverted bin betrays
    feature-hash saturation or label drift). Counts only — the pass RATE
    is a derived integer ratio, so the oracle stays float-boundary-free.

    Scale: composes two already-aggregated lineages (frozen-model margins
    + heuristic flags) with a doc-keyed join, then one tiny bin
    aggregation; both inputs are one corpus scan each with map-side
    partials."""
    from airflow_ml_pipeline_spark.operators.textstats import doc_quality

    scores = doc_quality_model_scores(spark, sf_dir).select(
        "doc_id", "quality_margin"
    )
    heur = doc_quality(spark, sf_dir).select("doc_id", "quality_pass")
    return (
        scores.join(heur, "doc_id")
        .groupBy(F.floor("quality_margin").alias("margin_bin"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("quality_pass").cast("bigint").alias("n_heuristic_pass"),
        )
    )


def _sql_model_filtered() -> str:
    from airflow_ml_pipeline_spark.operators.textstats import sql_quality_gate

    return f"""
    WITH {_sql_margin_ctes()},
    scores AS (
        SELECT d.doc_id, CAST({_SQL_MARGIN} AS DOUBLE) AS margin
        FROM documents d LEFT JOIN m ON d.doc_id = m.doc_id
    )
    SELECT d.doc_id, d.lang, d.source,
           CAST(length(d.text) AS BIGINT) AS n_chars,
           round(s.margin, 6) AS quality_margin
    FROM documents d
    JOIN scores s ON d.doc_id = s.doc_id
    WHERE s.margin > 0
      AND {sql_quality_gate("d.text")}
    """


@query("corpus_model_quality_filtered", oracle=_sql_model_filtered())
def corpus_model_quality_filtered(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The curation ACTION the model exists for: the corpus filtered by
    the conjunctive ensemble — learned-model margin > 0 AND the
    heuristic gate (the belt-and-suspenders policy production pipelines
    run: the model catches fluent garbage the thresholds miss, the
    thresholds catch the model's blind spots). Output is the surviving
    docs with their margin — the frame downstream packing/sharding
    consumes.

    Scale: the margin lineage is the one exploded-token aggregate, the
    heuristic flags are per-row expressions, and the final join is
    doc-keyed; nothing new shuffles beyond the scorer itself."""
    from airflow_ml_pipeline_spark.operators.textstats import doc_quality

    docs = load_table(spark, sf_dir, "documents")
    scores = doc_quality_model_scores(spark, sf_dir)
    heur = doc_quality(spark, sf_dir).select("doc_id", "quality_pass")
    return (
        docs.join(scores, "doc_id")
        .join(heur, "doc_id")
        .filter((F.col("pred_quality") == 1) & (F.col("quality_pass") == 1))
        .select(
            "doc_id",
            "lang",
            "source",
            F.length("text").cast("bigint").alias("n_chars"),
            F.round("quality_margin", 6).alias("quality_margin"),
        )
    )


def margin_fold(text: Column) -> Column:
    """The frozen-model margin as a PER-ROW JVM-side fold over the token
    array — no explode, no shuffle, no join: the stateless formulation
    that scores a document the moment it arrives (ingest-time
    filtering). Decimal addition is order-exact, so the fold equals the
    aggregate formulation bit-for-bit (metamorphic cross-check:
    tests/test_quality_model.py::test_fold_margin_equals_aggregate)."""
    coefs = F.lit(QUALITY_COEFS).cast("array<decimal(12,6)>")
    intercept = F.lit(QUALITY_INTERCEPT).cast("decimal(38,6)")
    toks = F.filter(tokens(text), lambda w: w != F.lit(""))
    return F.aggregate(
        toks,
        intercept,
        lambda acc, w: (
            acc
            + F.coalesce(
                F.element_at(coefs, (quality_bucket(w) + 1).cast("int")),
                F.lit(0).cast("decimal(12,6)"),
            )
        ).cast("decimal(38,6)"),
    )


@query("stream_doc_quality_scores", oracle=_sql_quality_scores())
def stream_doc_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-time quality scoring: the frozen model applied to a
    REPLAYED document stream (the multi-file staging the dedup ingester
    uses, one micro-batch per file) as a pure stateless projection — the
    deployment shape where a curation pipeline actually filters, scoring
    each document the micro-batch it arrives instead of re-scanning the
    corpus. Same oracle as the batch `doc_quality_model_scores`: the
    stream/batch equivalence check for model scoring.

    Scale: zero state stores, zero shuffles — the margin is a per-row
    fold (``margin_fold``), so throughput is bounded by scan + codegen
    only and the no-data batch is safely skipped (nothing watermarked)."""
    from airflow_ml_pipeline_spark.streaming.ingest import (
        stage_documents_stream,
    )
    from airflow_ml_pipeline_spark.streaming.sources import run_available_now

    arrivals = stage_documents_stream(spark, sf_dir)
    schema = spark.read.parquet(arrivals).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(arrivals)
    )
    m = margin_fold(F.col("text"))
    scored = stream.select(
        "doc_id",
        m.cast("double").alias("quality_margin"),
        F.when(m > 0, F.lit(1)).otherwise(F.lit(0)).alias("pred_quality"),
    )
    return run_available_now(
        scored, output_mode="append", skip_no_data_batch=True
    )


@query("doc_quality_model_scores", oracle=_sql_quality_scores())
def doc_quality_model_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the frozen learned quality model: per-document linear margin
    (intercept + Σ coef[bucket(word)]) and the >0 decision. The margin is
    emitted rather than the sigmoid because Σ coef·tf is DECIMAL-EXACT in
    both engines while exp() differs by ulps between the JVM and DuckDB —
    and the sigmoid is monotone, so the margin carries the same ranking
    and the same decision boundary.

    Scale: one exploded-token aggregate (map-side partials — the
    per-token coefficient lookup is an element_at against a broadcast
    64-element literal), then a broadcast-sized left join back to doc
    ids so token-less docs score at the intercept. No model state joins,
    no UDFs."""
    return score_documents(load_table(spark, sf_dir, "documents"))


def score_documents(docs: DataFrame) -> DataFrame:
    """The frozen-model scoring function over any (doc_id, text) frame —
    the body of ``doc_quality_model_scores``, factored out so the
    token-less-doc intercept path is testable on synthetic input."""
    coefs = F.lit(QUALITY_COEFS).cast("array<decimal(12,6)>")
    intercept = F.lit(QUALITY_INTERCEPT).cast("decimal(12,6)")
    margins = (
        _doc_words(docs)
        .select(
            "doc_id",
            F.element_at(coefs, (quality_bucket(F.col("word")) + 1).cast("int"))
            .alias("c"),
        )
        .groupBy("doc_id")
        .agg(F.sum("c").cast("decimal(38,6)").alias("s"))
    )
    margin = intercept + F.coalesce(
        F.col("s"), F.lit(0).cast("decimal(38,6)")
    )
    return (
        docs.select("doc_id")
        .join(margins, "doc_id", "left")
        .select(
            "doc_id",
            margin.cast("double").alias("quality_margin"),
            F.when(margin > 0, F.lit(1)).otherwise(F.lit(0)).alias(
                "pred_quality"
            ),
        )
    )
