"""Model-based text-quality classifier (round-7 surface): featurization
invariants, frozen-scorer consistency, and the freeze contract — the
frozen literals in ``quality_model.py`` must be exactly what the trainer
produces on the sf0.01 corpus (the release-artifact property the oracle's
hash-check rides on)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airflow_ml_pipeline_spark.operators.quality_model import (
    N_QUALITY_BUCKETS,
    QUALITY_COEFS,
    QUALITY_INTERCEPT,
    doc_quality_model_scores,
    doc_quality_model_train,
    hashed_tf_features,
    quality_bucket,
)
from airflow_ml_pipeline_spark.sources.catalog import load_table


def test_hashed_tf_features_shape_and_mass(spark, sf_dir):
    """Every doc gets a fixed-width vector whose mass equals its nonempty
    token count (hashing redistributes, never drops), and every doc id
    appears exactly once (the left join keeps token-less docs)."""
    docs = load_table(spark, sf_dir, "documents")
    feats = hashed_tf_features(docs).collect()
    n_docs = docs.count()
    assert len(feats) == n_docs
    tok_counts = {
        r.doc_id: r.n
        for r in docs.select(
            "doc_id",
            F.size(
                F.filter(F.split("text", " "), lambda w: w != "")
            ).alias("n"),
        ).collect()
    }
    for r in feats:
        assert len(r.features_arr) == N_QUALITY_BUCKETS
        assert sum(r.features_arr) == tok_counts[r.doc_id]


def test_quality_bucket_is_stable_and_in_range(spark):
    """The md5 bucket hash is deterministic across executions and lands
    in [0, N)."""
    words = ["spark", "merge", "the", "a", "Zipf", "0", ""]
    sdf = spark.createDataFrame([(w,) for w in words], ["word"])
    a = {r.word: r.b for r in sdf.select("word", quality_bucket(F.col("word")).alias("b")).collect()}
    b = {r.word: r.b for r in sdf.select("word", quality_bucket(F.col("word")).alias("b")).collect()}
    assert a == b
    assert all(0 <= v < N_QUALITY_BUCKETS for v in a.values())


def test_scores_margin_and_decision_are_consistent(spark, sf_dir):
    """pred_quality is exactly the margin's sign test, and every corpus
    doc is scored (left join keeps the full doc set)."""
    docs_n = load_table(spark, sf_dir, "documents").count()
    rows = doc_quality_model_scores(spark, sf_dir).collect()
    assert len(rows) == docs_n
    for r in rows:
        assert r.pred_quality == (1 if r.quality_margin > 0 else 0)


def test_tokenless_doc_scores_at_intercept(spark):
    """A doc with no nonempty tokens must SURVIVE scoring and land at the
    bare intercept — the left-join path an inner-join regression would
    break (round-7 review: the original form of this test never actually
    scored anything)."""
    from airflow_ml_pipeline_spark.operators.quality_model import (
        score_documents,
    )

    sdf = spark.createDataFrame(
        [(1, ""), (2, " "), (3, "the spark table")], ["doc_id", "text"]
    )
    rows = {r.doc_id: r for r in score_documents(sdf).collect()}
    assert set(rows) == {1, 2, 3}
    for d in (1, 2):
        assert rows[d].quality_margin == float(QUALITY_INTERCEPT)
        assert rows[d].pred_quality == 0


def test_frozen_model_is_the_trainers_output(spark):
    """Freeze contract: retraining on the sf0.01 corpus reproduces the
    committed frozen intercept/coefficients at 6 dp. Guards against the
    featurization, label heuristic, or corpus drifting under the frozen
    artifact (which would silently turn the scorer into an arbitrary
    linear functional instead of the released model)."""
    from airflow_ml_pipeline_spark.operators.quality_model import (
        train_quality_model,
    )

    intercept, coefs, _ = train_quality_model(spark, "/root/testdata/sf0.01")
    assert f"{intercept:.6f}" == QUALITY_INTERCEPT
    assert [f"{float(c):.6f}" for c in coefs] == QUALITY_COEFS


def test_train_metrics_row_beats_majority_baseline(spark, sf_dir):
    """The trainer's single metrics row is well-formed and the learned
    model separates the heuristic labels better than chance on its own
    training data (AUC > 0.5 — weak but meaningful for a 64-bucket hash
    on a tiny corpus; the point is the lifecycle runs end-to-end)."""
    row = doc_quality_model_train(spark, sf_dir).collect()
    assert len(row) == 1
    r = row[0]
    assert r.n_docs > 0 and 0 <= r.n_pos <= r.n_docs
    assert 0.0 <= r.train_accuracy <= 1.0
    assert r.train_auc > 0.5
    assert r.coef_l2norm >= 0.0


def test_fold_margin_equals_aggregate(spark, sf_dir):
    """Metamorphic cross-check between the two frozen-model
    formulations: the per-row fold (stateless streaming shape) must
    equal the explode+aggregate batch shape bit-for-bit on every corpus
    doc — decimal addition is order-exact, so any divergence is a
    formulation bug, not float noise."""
    from airflow_ml_pipeline_spark.operators.quality_model import (
        doc_quality_model_scores,
        margin_fold,
    )

    docs = load_table(spark, sf_dir, "documents")
    fold = {
        r.doc_id: (r.m, r.p)
        for r in docs.select(
            "doc_id",
            margin_fold(F.col("text")).cast("double").alias("m"),
            F.when(margin_fold(F.col("text")) > 0, F.lit(1))
            .otherwise(F.lit(0))
            .alias("p"),
        ).collect()
    }
    agg = {
        r.doc_id: (r.quality_margin, r.pred_quality)
        for r in doc_quality_model_scores(spark, sf_dir).collect()
    }
    assert fold == agg


def test_stream_scores_equal_batch(spark, sf_dir):
    """Stream/batch equivalence for model scoring: replaying the corpus
    through the multi-micro-batch ingest stage scores every document
    identically to the batch query."""
    from airflow_ml_pipeline_spark.operators.quality_model import (
        doc_quality_model_scores,
        stream_doc_quality_scores,
    )

    stream = {
        r.doc_id: (r.quality_margin, r.pred_quality)
        for r in stream_doc_quality_scores(spark, sf_dir).collect()
    }
    batch = {
        r.doc_id: (r.quality_margin, r.pred_quality)
        for r in doc_quality_model_scores(spark, sf_dir).collect()
    }
    assert stream == batch
