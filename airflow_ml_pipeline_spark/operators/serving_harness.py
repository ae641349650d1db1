"""Serving harness: train-promote-serve bootstrap shared by the real-HTTP
route tests (tests/test_serving_http.py) and the serving latency bench
(tools/serve_bench.py).

The reference's only serving topology promise is single-model low-latency
REST (reference deployment.py:113-178); this harness stands the Spark
engine's Flask app (operators/deployment.py::create_flask_app) up on a real
loopback socket so both the route contract and the p50/p95 latencies are
measured through genuine HTTP, not a test client shim.
"""

from __future__ import annotations

import json
import threading
import urllib.request
from dataclasses import dataclass


def serving_config(tmp_dir: str, n_samples: int = 300) -> dict:
    """Minimal LR-only pipeline config (same schema as the reference's
    pipeline_config.yaml) rooted at ``tmp_dir``."""
    return {
        "data": {
            "n_samples": n_samples,
            "test_size": 0.2,
            "random_state": 42,
            "raw_data_path": f"{tmp_dir}/raw.csv",
            "processed_data_path": f"{tmp_dir}/processed.csv",
        },
        "features": {
            "numerical": [
                "tenure",
                "monthly_charges",
                "total_charges",
                "num_support_tickets",
                "avg_monthly_usage_gb",
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
            "min_f1_score": 0.1,
            "min_roc_auc": 0.1,
            "comparison_metric": "f1",
        },
        "deployment": {
            "model_registry_path": f"{tmp_dir}/registry",
            "champion_model_path": f"{tmp_dir}/champion",
            "serving_port": 0,
            "min_performance_threshold": 0.1,
        },
        "mlflow": {"experiment_name": "serve", "tracking_uri": f"{tmp_dir}/mlruns"},
        "explainability": {
            "enabled": False,
            "sample_size": 50,
            "max_display_features": 5,
        },
    }


SAMPLE_ROW = {
    "tenure": 12,
    "contract_type": "month-to-month",
    "payment_method": "electronic_check",
    "internet_service": "fiber",
    "monthly_charges": 70.5,
    "total_charges": 846.0,
    "num_support_tickets": 2,
    "avg_monthly_usage_gb": 35.2,
}


@dataclass
class ServingHandle:
    base_url: str
    champion_path: str
    _server: object
    _thread: threading.Thread

    def post(self, route: str, payload) -> tuple[int, dict]:
        req = urllib.request.Request(
            f"{self.base_url}{route}",
            data=json.dumps(payload).encode(),  # None -> "null" (a VALID json
            # body that parses to nothing — exercises the app's own 400 path,
            # not werkzeug's HTML BadRequest for unparseable bodies)
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        try:
            with urllib.request.urlopen(req) as resp:
                return resp.status, json.loads(resp.read())
        except urllib.error.HTTPError as e:
            return e.code, json.loads(e.read())

    def get(self, route: str) -> tuple[int, dict]:
        with urllib.request.urlopen(f"{self.base_url}{route}") as resp:
            return resp.status, json.loads(resp.read())

    def shutdown(self) -> None:
        self._server.shutdown()
        self._thread.join(timeout=10)


def train_and_serve(spark, tmp_dir: str, n_samples: int = 300) -> ServingHandle:
    """Generate → features → LR fit → promote → serve over real HTTP on an
    ephemeral loopback port. Returns a handle with post/get/shutdown."""
    from werkzeug.serving import make_server

    from airflow_ml_pipeline_spark.operators import (
        deployment,
        features,
        generate,
        split,
        training,
    )

    config = serving_config(tmp_dir, n_samples)
    customers = generate.generate_synthetic_data(
        spark, n_samples=n_samples, random_state=42
    )
    fdf, prep, names = features.build_features(customers, config, fit=True)
    ml_df = training.assemble(fdf, names)
    train_df, _ = split.stratified_split(ml_df, "label", 0.2, 42)
    models = training.train_all_models(train_df, config)
    model = models["logistic_regression"]["model"]
    deployment.promote_model(
        model,
        prep,
        "logistic_regression",
        {"f1": 0.5, "roc_auc": 0.5},
        names,
        config,
    )
    app = deployment.create_flask_app(spark, config)
    server = make_server("127.0.0.1", 0, app, threaded=True)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    return ServingHandle(
        base_url=f"http://127.0.0.1:{server.server_port}",
        champion_path=config["deployment"]["champion_model_path"],
        _server=server,
        _thread=thread,
    )
