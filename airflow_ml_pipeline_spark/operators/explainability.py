"""Explainability: per-feature attributions + global importance (SURVEY.md
§2.9 X1-X6; reference /root/reference/src/ml_pipeline/explainability.py).

The shap package is unavailable here, so attribution is computed natively:

**Occlusion attribution** — contribution_j(x) = f(x) - f(x with feature j
replaced by the background mean μ_j); base_value = mean_background f.
For logistic regression scored in margin space this equals the analytic
linear-SHAP values (shap.LinearExplainer's interventional values) *exactly*:
margin(x) - margin(x | x_j→μ_j) = coef_j (x_j - μ_j). For tree ensembles it
is a deterministic, model-agnostic approximation scored in probability
space (documented deviation from TreeExplainer — same report shapes).

Execution: n_features+1 model.transform passes over the (≤ sample_size)
explanation sample — every pass is a distributed scoring job; nothing
row-wise ever reaches the driver except the final ≤ n_features aggregates.
Tree models additionally expose Spark ML's native ``featureImportances``
for global importance.
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.ml.functions import vector_to_array
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from airflow_ml_pipeline_spark.operators.split import sample_exact
from airflow_ml_pipeline_spark.operators.training import FEATURES_COL, assemble


def _score_col(model) -> tuple[str, int]:
    """(output column, vector index) used as the explanation score: margin
    for linear models (exact linear-SHAP), probability for the rest."""
    if type(model).__name__.startswith("LogisticRegression"):
        return "rawPrediction", 1
    return "probability", 1


def compute_shap_values(
    model: Any,
    features_df: DataFrame,
    feature_names: list[str],
    config: dict,
    background_means: dict[str, float] | None = None,
) -> dict:
    """Occlusion attributions over a capped sample (explainability.py:42-95
    contract: sample_size cap with seed 42, expected_value scalar, values
    keyed to feature_names).

    ``background_means`` overrides the occlusion baseline (normally the
    sample's own means) with frozen training-time means — the serving-path
    fix for the reference's quirk where a 1-row request is its own
    background and every contribution degenerates to zero.

    Returns {"shap_values": DataFrame[__row_id, features..., contrib_<i>...],
    "feature_names", "expected_value", "sample_size"}."""
    explain_cfg = config.get("explainability", {})
    sample_size = explain_cfg.get("sample_size", 500)

    n_rows = features_df.count()
    sample = (
        sample_exact(features_df, sample_size, seed=42)
        if n_rows > sample_size
        else features_df
    )
    sample = sample.select(*feature_names).cache()
    n_sample = sample.count()

    if background_means is not None:
        mus = {c: float(background_means[c]) for c in feature_names}
    else:
        mus = sample.agg(
            *[F.avg(c).alias(c) for c in feature_names]
        ).collect()[0].asDict()

    # one distributed scoring pass for the full rows + one per occluded
    # feature; joined back by a row id that is stable because the base
    # frame is cached before any id-dependent reuse
    base = sample.withColumn("__row_id", F.monotonically_increasing_id()).cache()
    base.count()
    result = _attach_score(model, base, feature_names, None, mus, "f_full").cache()
    if background_means is not None:
        # base value = model output at the frozen background point
        spark = features_df.sparkSession
        mean_row = spark.createDataFrame(
            [tuple(mus[c] for c in feature_names)], feature_names
        ).withColumn("__row_id", F.lit(0).cast("long"))
        expected_value = float(
            _attach_score(model, mean_row, feature_names, None, mus, "f_mu")
            .collect()[0]["f_mu"]
        )
    else:
        expected_value = float(result.agg(F.avg("f_full")).collect()[0][0])
    for j, feat in enumerate(feature_names):
        occluded = _attach_score(model, base, feature_names, feat, mus, f"f_occ_{j}")
        result = result.join(occluded.select("__row_id", f"f_occ_{j}"), "__row_id")
    # carry the input feature values alongside their contributions so
    # downstream consumers (and tests) never need to re-align rows
    contribs = base.join(result, "__row_id").select(
        "__row_id",
        *feature_names,
        *[
            (F.col("f_full") - F.col(f"f_occ_{j}")).alias(f"contrib_{j}")
            for j in range(len(feature_names))
        ],
    )
    sample.unpersist()
    return {
        "shap_values": contribs,
        "feature_names": feature_names,
        "expected_value": expected_value,
        "sample_size": n_sample,
    }


def _attach_score(
    model, base: DataFrame, feature_names: list[str], occlude: str | None, mus: dict, out: str
) -> DataFrame:
    cols = [
        (F.lit(mus[c]) if c == occlude else F.col(c)).alias(c) for c in feature_names
    ]
    frame = base.select("__row_id", *cols)
    col, idx = _score_col(model)
    scored = model.transform(assemble(frame, feature_names, keep=["__row_id"]))
    return scored.select("__row_id", vector_to_array(col)[idx].alias(out))


def generate_feature_importance(
    shap_values: DataFrame,
    feature_names: list[str],
    max_features: int | None = None,
) -> list[dict]:
    """Global importance = mean |contribution| per feature, sorted desc,
    top-N (explainability.py:98-131) — one aggregate job, driver sees only
    n_features numbers."""
    row = shap_values.agg(
        *[
            F.avg(F.abs(F.col(f"contrib_{j}"))).alias(f"imp_{j}")
            for j in range(len(feature_names))
        ]
    ).collect()[0]
    importance = [
        {"feature": name, "importance": round(float(row[f"imp_{j}"]), 6)}
        for j, name in enumerate(feature_names)
    ]
    importance.sort(key=lambda x: x["importance"], reverse=True)
    if max_features is not None:
        importance = importance[:max_features]
    return importance


def native_feature_importance(model, feature_names: list[str]) -> list[dict] | None:
    """Spark ML's impurity-based importances for tree ensembles (the
    TreeExplainer stand-in for global ranking)."""
    if not hasattr(model, "featureImportances"):
        return None
    arr = model.featureImportances.toArray()
    importance = [
        {"feature": name, "importance": round(float(v), 6)}
        for name, v in zip(feature_names, arr)
    ]
    importance.sort(key=lambda x: x["importance"], reverse=True)
    return importance


def save_explainability_report(
    shap_result: dict, importance: list[dict], output_path: str
) -> None:
    """Same JSON shape as the reference (explainability.py:134-156)."""
    report = {
        "expected_value": shap_result["expected_value"],
        "sample_size": shap_result["sample_size"],
        "feature_importance": importance,
    }
    os.makedirs(os.path.dirname(output_path) or ".", exist_ok=True)
    with open(output_path, "w") as f:
        json.dump(report, f, indent=2)


def explain_single_prediction(
    model: Any,
    preprocessor,
    input_df: DataFrame,
    feature_names: list[str],
    config: dict,
    background_means: dict[str, float] | None = None,
):
    """Serving-path explanation (explainability.py:159-214): returns a dict
    for one row, a list for several; contributions sorted by |value| desc,
    rounded to 6dp. Default background = the input batch itself (reference
    parity, including its degenerate-single-row quirk); pass the champion's
    frozen ``background_means`` for meaningful 1-row explanations.
    """
    from airflow_ml_pipeline_spark.operators.features import add_engineered_features

    engineered = add_engineered_features(
        input_df, high_value_threshold=preprocessor.high_value_threshold
    )
    feats = preprocessor.transform(engineered).select(*feature_names)

    shap_result = compute_shap_values(
        model, feats, feature_names, config, background_means=background_means
    )
    contrib_rows = shap_result["shap_values"].orderBy("__row_id").collect()

    scored = model.transform(assemble(feats, feature_names))
    has_proba = "probability" in scored.columns
    pred_rows = scored.select(
        "prediction",
        *([vector_to_array("probability")[1].alias("p1")] if has_proba else []),
    ).collect()

    results = []
    for i, (crow, prow) in enumerate(zip(contrib_rows, pred_rows)):
        contributions = [
            {
                "feature": name,
                "contribution": round(float(crow[f"contrib_{j}"]), 6),
            }
            for j, name in enumerate(feature_names)
        ]
        contributions.sort(key=lambda x: abs(x["contribution"]), reverse=True)
        result = {
            "prediction": int(prow["prediction"]),
            "base_value": round(float(shap_result["expected_value"]), 6),
            "contributions": contributions,
        }
        if has_proba:
            result["probability"] = round(float(prow["p1"]), 6)
        results.append(result)

    return results[0] if len(results) == 1 else results
