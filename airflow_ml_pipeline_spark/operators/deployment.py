"""Deployment: champion promotion, loading, inference, REST serving
(SURVEY.md §2.10 D1-D5; reference /root/reference/src/ml_pipeline/deployment.py).

Artifact layout mirrors the reference's champion directory contract
(deployment.py:16-71): previous champion archived to
``archive_YYYYmmdd_HHMMSS``, then ``model/`` (Spark ML native format —
replaces model.joblib), ``preprocessor.json`` (replaces
preprocessor.joblib), and an identical ``metadata.json``.
"""

from __future__ import annotations

import json
import os
import shutil
from datetime import datetime, timezone
from pathlib import Path

from pyspark.ml.classification import (
    GBTClassificationModel,
    LogisticRegressionModel,
    RandomForestClassificationModel,
)
from pyspark.ml.functions import vector_to_array
from pyspark.sql import DataFrame, SparkSession

from airflow_ml_pipeline_spark.operators.features import (
    Preprocessor,
    add_engineered_features,
)
from airflow_ml_pipeline_spark.operators.training import assemble

_MODEL_LOADERS = {
    "LogisticRegressionModel": LogisticRegressionModel,
    "RandomForestClassificationModel": RandomForestClassificationModel,
    "GBTClassificationModel": GBTClassificationModel,
}


def promote_model(
    model,
    preprocessor: Preprocessor,
    model_name: str,
    metrics: dict,
    feature_names: list[str],
    config: dict,
    feature_importance: list[dict] | None = None,
    background_means: dict[str, float] | None = None,
) -> str:
    """Promote the champion (D1): archive the old one, write artifacts +
    metadata.json with the reference's keys (deployment.py:55-62)."""
    champion_dir = Path(config["deployment"]["champion_model_path"])

    if champion_dir.exists():
        archive_name = f"archive_{datetime.now(timezone.utc).strftime('%Y%m%d_%H%M%S')}"
        shutil.move(str(champion_dir), str(champion_dir.parent / archive_name))

    champion_dir.mkdir(parents=True, exist_ok=True)

    model.write().overwrite().save(str(champion_dir / "model"))
    preprocessor.save(str(champion_dir / "preprocessor.json"))

    metadata = {
        "model_name": model_name,
        "promoted_at": datetime.now(timezone.utc).isoformat(),
        "metrics": {k: v for k, v in metrics.items() if isinstance(v, (int, float))},
        "feature_names": feature_names,
        "model_class": type(model).__name__,
        "model_params": {
            p.name: v for p, v in model.extractParamMap().items()
        },
    }
    if feature_importance is not None:
        metadata["feature_importance"] = feature_importance
    if background_means is not None:
        # frozen training-time feature means: the explanation background for
        # serving (fixes the reference's input-as-own-background quirk)
        metadata["background_means"] = background_means

    with open(champion_dir / "metadata.json", "w") as f:
        json.dump(metadata, f, indent=2, default=str)

    return str(champion_dir)


def load_champion(spark: SparkSession, config: dict) -> tuple:
    """Load champion artifacts (D2); FileNotFoundError when absent
    (deployment.py:74-92, exception type preserved)."""
    champion_dir = Path(config["deployment"]["champion_model_path"])
    if not champion_dir.exists():
        raise FileNotFoundError(f"No champion model found at {champion_dir}")

    with open(champion_dir / "metadata.json") as f:
        metadata = json.load(f)

    loader = _MODEL_LOADERS.get(metadata["model_class"])
    if loader is None:
        raise ValueError(f"Unknown model class: {metadata['model_class']}")
    model = loader.load(str(champion_dir / "model"))
    preprocessor = Preprocessor.load(str(champion_dir / "preprocessor.json"))
    return model, preprocessor, metadata


def predict(model, preprocessor: Preprocessor, input_df: DataFrame) -> DataFrame:
    """Batch/row inference (D3): engineered features (with the FROZEN
    high-value threshold — fixes the reference's train/serve skew) →
    preprocessor transform → model transform. Returns a DataFrame with a
    ``prediction`` column."""
    engineered = add_engineered_features(
        input_df, high_value_threshold=preprocessor.high_value_threshold
    )
    feats = preprocessor.transform(engineered)
    return model.transform(assemble(feats, preprocessor.feature_names))


def predict_proba(model, preprocessor: Preprocessor, input_df: DataFrame) -> DataFrame:
    """As D3 with the positive-class probability (D4)."""
    return predict(model, preprocessor, input_df).withColumn(
        "probability_1", vector_to_array("probability")[1]
    )


def _fast_scorer(model, preprocessor: Preprocessor):
    """Driver-side single-instance scorer: pyspark.ml classification models
    expose ``predict``/``predictProbability`` on the driver (no job
    launch), and the feature transform has a pure-Python twin
    (features.engineered_row + Preprocessor.transform_row, parity-tested).
    This is what makes the reference's low-latency serving promise real on
    Spark — the batch path costs a full Spark job (~0.5 s fixed) per
    request; this path scores in ~1 ms. Returns None when the champion
    lacks the single-instance API (then the Spark path serves)."""
    if not (hasattr(model, "predict") and hasattr(model, "predictProbability")):
        return None
    from pyspark.ml.linalg import Vectors

    from airflow_ml_pipeline_spark.operators.features import engineered_row

    def score(rows: list[dict]) -> tuple[list[int], list[float]]:
        preds, probs = [], []
        for row in rows:
            eng = engineered_row(row, preprocessor.high_value_threshold)
            vec = Vectors.dense(preprocessor.transform_row(eng))
            preds.append(int(model.predict(vec)))
            probs.append(float(model.predictProbability(vec)[1]))
        return preds, probs

    return score


def create_flask_app(spark: SparkSession, config: dict):
    """REST serving (D5): same routes, status codes and response shapes as
    the reference (deployment.py:113-178). The champion is loaded once at
    app construction. /predict scores driver-side via ``_fast_scorer``
    (single-instance model API + Python feature twin — ~1 ms/row, no Spark
    job); champions without the single-instance API fall back to the exact
    training transform path over a tiny DataFrame."""
    from flask import Flask, jsonify, request

    from airflow_ml_pipeline_spark.operators.explainability import (
        explain_single_prediction,
    )
    from airflow_ml_pipeline_spark.schemas import CUSTOMERS_INPUT

    app = Flask(__name__)
    model, preprocessor, metadata = load_champion(spark, config)
    fast_score = _fast_scorer(model, preprocessor)

    def _to_df(data) -> DataFrame:
        rows = [data] if isinstance(data, dict) else data
        return spark.createDataFrame(rows, schema=CUSTOMERS_INPUT)

    @app.route("/health", methods=["GET"])
    def health():
        return jsonify({"status": "healthy", "model": metadata["model_name"]})

    @app.route("/predict", methods=["POST"])
    def predict_endpoint():
        data = request.get_json()
        if not data:
            return jsonify({"error": "No input data provided"}), 400
        try:
            if fast_score is not None:
                rows_in = [data] if isinstance(data, dict) else data
                preds, probs = fast_score(rows_in)
                return jsonify({"predictions": preds, "probabilities": probs})
            scored = predict_proba(model, preprocessor, _to_df(data))
            rows = scored.select("prediction", "probability_1").collect()
            return jsonify(
                {
                    "predictions": [int(r.prediction) for r in rows],
                    "probabilities": [float(r.probability_1) for r in rows],
                }
            )
        except Exception as e:  # noqa: BLE001 - contract: 500 + message
            return jsonify({"error": str(e)}), 500

    @app.route("/model/info", methods=["GET"])
    def model_info():
        return jsonify(metadata)

    @app.route("/model/explain", methods=["POST"])
    def explain_endpoint():
        data = request.get_json()
        if not data:
            return jsonify({"error": "No input data provided"}), 400
        try:
            explanation = explain_single_prediction(
                model,
                preprocessor,
                _to_df(data),
                metadata.get("feature_names", []),
                config,
                background_means=metadata.get("background_means"),
            )
            return jsonify(explanation)
        except Exception as e:  # noqa: BLE001
            return jsonify({"error": str(e)}), 500

    @app.route("/model/feature-importance", methods=["GET"])
    def feature_importance_endpoint():
        importance = metadata.get("feature_importance")
        if importance is None:
            return jsonify({"error": "No feature importance data available"}), 404
        return jsonify({"feature_importance": importance})

    return app
