"""Pipeline configuration: YAML → dict with environment-variable overrides.

Contract parity with the reference loader
(/root/reference/src/ml_pipeline/config.py:14-56): same YAML schema
(config/pipeline_config.yaml), same override env vars
(PIPELINE_CONFIG_PATH, MLFLOW_TRACKING_URI, MLFLOW_EXPERIMENT_NAME,
PIPELINE_DATA_DIR, PIPELINE_MODELS_DIR). The body is table-driven: each
override is declared as (env var, dotted config path, value mapper) so
adding one is a row, not a code branch.
"""

from __future__ import annotations

import os
from pathlib import Path

import yaml

#: env var -> (dotted target key, filename appended to the env value);
#: ``None`` filename means the raw env value replaces the target.
_ENV_OVERRIDES: tuple[tuple[str, str, str | None], ...] = (
    ("MLFLOW_TRACKING_URI", "mlflow.tracking_uri", None),
    ("MLFLOW_EXPERIMENT_NAME", "mlflow.experiment_name", None),
    ("PIPELINE_DATA_DIR", "data.raw_data_path", "raw_customers.csv"),
    ("PIPELINE_DATA_DIR", "data.processed_data_path", "processed_features.csv"),
    ("PIPELINE_MODELS_DIR", "deployment.model_registry_path", "registry"),
    ("PIPELINE_MODELS_DIR", "deployment.champion_model_path", "champion"),
)


def get_project_root() -> Path:
    return Path(__file__).resolve().parent.parent


def _default_config_path() -> str:
    default = get_project_root() / "config" / "pipeline_config.yaml"
    return os.environ.get("PIPELINE_CONFIG_PATH", str(default))


def _set_path(config: dict, dotted: str, value: str) -> None:
    *parents, leaf = dotted.split(".")
    node = config
    for key in parents:
        node = node[key]
    node[leaf] = value


def load_config(config_path: str | None = None) -> dict:
    """Load pipeline configuration from YAML with env overrides."""
    path = config_path if config_path is not None else _default_config_path()
    config = yaml.safe_load(Path(path).read_text())
    for env_var, dotted, filename in _ENV_OVERRIDES:
        raw = os.environ.get(env_var)
        if raw is None:
            continue
        _set_path(config, dotted, raw if filename is None else os.path.join(raw, filename))
    return config
