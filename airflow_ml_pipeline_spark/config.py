"""Pipeline configuration: YAML → dict with environment-variable overrides.

Contract parity with the reference loader
(/root/reference/src/ml_pipeline/config.py:14-56): same YAML schema
(config/pipeline_config.yaml), same override env vars
(PIPELINE_CONFIG_PATH, MLFLOW_TRACKING_URI, MLFLOW_EXPERIMENT_NAME,
PIPELINE_DATA_DIR, PIPELINE_MODELS_DIR).
"""

from __future__ import annotations

import os
from pathlib import Path

import yaml


def get_project_root() -> Path:
    return Path(__file__).resolve().parent.parent


def load_config(config_path: str | None = None) -> dict:
    """Load pipeline configuration from YAML with env overrides."""
    if config_path is None:
        config_path = os.environ.get(
            "PIPELINE_CONFIG_PATH",
            str(get_project_root() / "config" / "pipeline_config.yaml"),
        )

    with open(config_path) as f:
        config = yaml.safe_load(f)

    config["mlflow"]["tracking_uri"] = os.environ.get(
        "MLFLOW_TRACKING_URI", config["mlflow"]["tracking_uri"]
    )
    config["mlflow"]["experiment_name"] = os.environ.get(
        "MLFLOW_EXPERIMENT_NAME", config["mlflow"]["experiment_name"]
    )

    data_dir = os.environ.get("PIPELINE_DATA_DIR")
    if data_dir:
        config["data"]["raw_data_path"] = os.path.join(data_dir, "raw_customers.csv")
        config["data"]["processed_data_path"] = os.path.join(
            data_dir, "processed_features.csv"
        )

    models_dir = os.environ.get("PIPELINE_MODELS_DIR")
    if models_dir:
        config["deployment"]["model_registry_path"] = os.path.join(
            models_dir, "registry"
        )
        config["deployment"]["champion_model_path"] = os.path.join(
            models_dir, "champion"
        )

    return config
