"""End-to-end runner test (O6) — same return contract as the reference
(/root/reference/src/ml_pipeline/run_pipeline.py:114-121)."""

from __future__ import annotations

import json
import pathlib

from airflow_ml_pipeline_spark.plans.pipeline import run_pipeline


def test_run_pipeline_end_to_end(spark, tmp_path):
    config = {
        "data": {
            "n_samples": 500,
            "test_size": 0.2,
            "random_state": 42,
            "raw_data_path": str(tmp_path / "raw.csv"),
            "processed_data_path": str(tmp_path / "processed.csv"),
        },
        "features": {
            "numerical": [
                "tenure", "monthly_charges", "total_charges",
                "num_support_tickets", "avg_monthly_usage_gb",
            ],
            "categorical": ["contract_type", "payment_method", "internet_service"],
            "target": "churn",
            "scaling_method": "standard",
            "handle_outliers": True,
            "outlier_threshold": 3.0,
        },
        "training": {
            "models": {
                "logistic_regression": {
                    "enabled": True,
                    "params": {"C": [1.0], "penalty": ["l2"], "max_iter": [50]},
                },
                "random_forest": {"enabled": False, "params": {}},
                "xgboost": {"enabled": False, "params": {}},
            },
            "cv_folds": 2,
            "scoring_metric": "f1",
            "random_state": 42,
        },
        "evaluation": {
            "metrics": ["accuracy", "precision", "recall", "f1", "roc_auc"],
            "min_f1_score": 0.2,
            "min_roc_auc": 0.3,
            "comparison_metric": "f1",
        },
        "deployment": {
            "model_registry_path": str(tmp_path / "registry"),
            "champion_model_path": str(tmp_path / "champion"),
            "serving_port": 8099,
            "min_performance_threshold": 0.2,
        },
        "mlflow": {"experiment_name": "t", "tracking_uri": str(tmp_path / "mlruns")},
        "explainability": {"enabled": True, "sample_size": 50, "max_display_features": 5},
    }

    result = run_pipeline(spark, config=config)

    assert result["success"] is True
    assert result["champion"] == "logistic_regression"
    assert set(result["metrics"]) >= {"accuracy", "f1", "roc_auc"}
    assert all(0.0 <= v <= 1.0 for v in result["metrics"].values())

    champion = pathlib.Path(result["deploy_path"])
    assert (champion / "model").is_dir()
    assert (champion / "preprocessor.json").is_file()
    with open(champion / "metadata.json") as f:
        metadata = json.load(f)
    assert metadata["model_name"] == "logistic_regression"
    assert metadata["feature_importance"]  # explainability ran
    assert (champion.parent / "evaluation_report.json").is_file()
    assert (champion.parent / "explainability_report.json").is_file()

    # raw CSV was persisted by ingest (load-or-generate contract)
    assert (tmp_path / "raw.csv").exists()

    # thresholds too strict -> graceful failure contract
    strict = {**config, "evaluation": {**config["evaluation"], "min_f1_score": 0.999}}
    result2 = run_pipeline(spark, config=strict)
    assert result2 == {"success": False, "reason": "No model meets thresholds"}
