"""Model evaluation: metrics, comparison, champion selection (SURVEY.md §2.8
M1-M13; reference /root/reference/src/ml_pipeline/evaluation.py).

Execution design: accuracy/precision/recall/f1, the classification report,
and the confusion matrix all derive from ONE ``groupBy(label,
prediction).count()`` job (M3-M6/M8/M9 share a single shuffle of at most 4
rows). roc_auc is a second pass via BinaryClassificationEvaluator over the
probability column, with the reference's hard-label fallback when no
probability exists (evaluation.py:59-63).

Metric semantics are sklearn's binary defaults: positive class 1,
zero_division=0.
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.ml.evaluation import BinaryClassificationEvaluator
from pyspark.ml.functions import vector_to_array
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from airflow_ml_pipeline_spark.operators.training import LABEL_COL

KNOWN_METRICS = ("accuracy", "precision", "recall", "f1", "roc_auc")


def _confusion_counts(pred_df: DataFrame) -> dict[tuple[int, int], int]:
    rows = (
        pred_df.groupBy(LABEL_COL, "prediction")
        .count()
        .collect()
    )
    return {(int(r[LABEL_COL]), int(r["prediction"])): r["count"] for r in rows}


def _prf(counts: dict[tuple[int, int], int], positive: int) -> tuple[float, float, float, int]:
    """precision/recall/f1/support for one class, zero_division=0."""
    tp = counts.get((positive, positive), 0)
    fp = sum(v for (y, p), v in counts.items() if p == positive and y != positive)
    fn = sum(v for (y, p), v in counts.items() if y == positive and p != positive)
    support = sum(v for (y, _), v in counts.items() if y == positive)
    precision = tp / (tp + fp) if (tp + fp) else 0.0
    recall = tp / (tp + fn) if (tp + fn) else 0.0
    f1 = 2 * precision * recall / (precision + recall) if (precision + recall) else 0.0
    return precision, recall, f1, support


def evaluate_model(
    model: Any,
    test_df: DataFrame,
    metrics: list[str] | None = None,
) -> dict:
    """Evaluate a fitted Spark ML model; returns the reference's score dict
    (metric floats + classification_report + confusion_matrix)."""
    if metrics is None:
        metrics = list(KNOWN_METRICS)

    pred = model.transform(test_df)
    has_proba = "probability" in pred.columns
    pred = pred.select(
        LABEL_COL,
        "prediction",
        *(
            [vector_to_array("probability")[1].alias("p1")]
            if has_proba
            else []
        ),
    ).cache()

    counts = _confusion_counts(pred)
    total = sum(counts.values())
    correct = sum(v for (y, p), v in counts.items() if y == p)
    precision1, recall1, f11, _ = _prf(counts, 1)

    scores: dict[str, Any] = {}
    for name in metrics:
        if name not in KNOWN_METRICS:
            continue  # unknown-metric tolerance (M11, evaluation.py:55-57)
        if name == "accuracy":
            scores[name] = correct / total if total else 0.0
        elif name == "precision":
            scores[name] = precision1
        elif name == "recall":
            scores[name] = recall1
        elif name == "f1":
            scores[name] = f11
        elif name == "roc_auc":
            evaluator = BinaryClassificationEvaluator(
                labelCol=LABEL_COL,
                rawPredictionCol="p1" if has_proba else "prediction",
                metricName="areaUnderROC",
            )
            scores[name] = float(evaluator.evaluate(pred))

    # classification report (M8) + confusion matrix (M9), sklearn shapes
    report: dict[str, Any] = {}
    labels = sorted({y for (y, _) in counts} | {p for (_, p) in counts})
    for cls in labels:
        p, r, f1c, support = _prf(counts, cls)
        report[str(cls)] = {
            "precision": p,
            "recall": r,
            "f1-score": f1c,
            "support": support,
        }
    report["accuracy"] = correct / total if total else 0.0
    supports = [report[str(c)]["support"] for c in labels]
    for avg_name, weights in (
        ("macro avg", [1] * len(labels)),
        ("weighted avg", supports),
    ):
        wsum = sum(weights) or 1
        report[avg_name] = {
            "precision": sum(report[str(c)]["precision"] * w for c, w in zip(labels, weights)) / wsum,
            "recall": sum(report[str(c)]["recall"] * w for c, w in zip(labels, weights)) / wsum,
            "f1-score": sum(report[str(c)]["f1-score"] * w for c, w in zip(labels, weights)) / wsum,
            "support": total,
        }
    scores["classification_report"] = report
    scores["confusion_matrix"] = [
        [counts.get((y, p), 0) for p in (0, 1)] for y in (0, 1)
    ]
    pred.unpersist()
    return scores


def evaluate_all_models(
    trained_models: dict[str, dict],
    test_df: DataFrame,
    config: dict,
) -> dict[str, dict]:
    """Evaluate every trained model (M12; evaluation.py:81-122)."""
    eval_cfg = config["evaluation"]
    metrics = eval_cfg.get("metrics", list(KNOWN_METRICS))
    all_scores: dict[str, dict] = {}
    for model_name, model_info in trained_models.items():
        scores = evaluate_model(model_info["model"], test_df, metrics)
        all_scores[model_name] = {
            "metrics": scores,
            "run_id": model_info.get("run_id"),
        }
    return all_scores


def select_champion(all_scores: dict[str, dict], config: dict):
    """Threshold-filter + argmax champion selection (M10;
    evaluation.py:125-175). Returns (name, result) or None."""
    eval_cfg = config["evaluation"]
    comparison_metric = eval_cfg.get("comparison_metric", "f1")
    min_f1 = eval_cfg.get("min_f1_score", 0.0)
    min_roc_auc = eval_cfg.get("min_roc_auc", 0.0)

    qualifying = {
        name: result
        for name, result in all_scores.items()
        if result["metrics"].get("f1", 0) >= min_f1
        and result["metrics"].get("roc_auc", 0) >= min_roc_auc
    }
    if not qualifying:
        return None
    champion_name = max(
        qualifying, key=lambda name: qualifying[name]["metrics"].get(comparison_metric, 0)
    )
    return champion_name, qualifying[champion_name]


def save_evaluation_report(
    all_scores: dict[str, dict], champion_name: str, output_path: str
) -> None:
    """JSON report keeping only numeric metric values (M13;
    evaluation.py:178-204)."""
    report = {
        "champion": champion_name,
        "models": {
            name: {
                k: v
                for k, v in result["metrics"].items()
                if isinstance(v, (int, float))
            }
            for name, result in all_scores.items()
        },
    }
    os.makedirs(os.path.dirname(output_path) or ".", exist_ok=True)
    with open(output_path, "w") as f:
        json.dump(report, f, indent=2)
