"""Daily quality-check runner contract (reference data_quality_dag.py):
skip-on-missing-file, validation + drift key shape, and the scheduled
cadence/retry wiring."""

from __future__ import annotations

from datetime import datetime, timedelta

from airflow_ml_pipeline_spark.operators.generate import ingest_data
from airflow_ml_pipeline_spark.plans.quality import (
    quality_schedule,
    run_quality_check,
)

NUMERIC = [
    "tenure",
    "monthly_charges",
    "total_charges",
    "num_support_tickets",
    "avg_monthly_usage_gb",
]


def _config(tmp_path, n=300):
    return {
        "data": {
            "n_samples": n,
            "random_state": 42,
            "raw_data_path": str(tmp_path / "raw.csv"),
            "processed_data_path": str(tmp_path / "processed.csv"),
        },
        "features": {"numerical": NUMERIC},
    }


def test_missing_file_skips(spark, tmp_path):
    out = run_quality_check(spark, _config(tmp_path))
    assert out == {"status": "skipped", "reason": "no data file"}


def test_quality_check_shape_and_drift_keys(spark, tmp_path):
    config = _config(tmp_path)
    ingest_data(spark, config)  # writes the raw CSV (load-or-generate)
    out = run_quality_check(spark, config)
    assert out["passed"] is True
    assert set(out["checks"]) >= {
        "no_missing_values",
        "no_duplicates",
        "schema_valid",
        "sufficient_samples",
    }
    drift = out["drift"]
    for col in NUMERIC:
        assert set(drift[col]) == {"mean", "std", "null_pct"}
        assert drift[col]["null_pct"] == 0.0
        assert drift[col]["std"] > 0
    assert 0.0 < drift["churn_rate"] < 1.0
    assert drift["imbalance_warning"] is False


def test_quality_schedule_wiring(spark, tmp_path):
    config = _config(tmp_path)
    ingest_data(spark, config)
    sp = quality_schedule(spark, config)
    assert sp.cron == "0 6 * * *"
    assert sp.policy.retries == 1
    assert sp.policy.retry_delay == timedelta(minutes=2)
    sp.last_checked = datetime(2024, 3, 1, 0, 0)
    out = sp.tick(datetime(2024, 3, 1, 7, 0))  # past 06:00 -> due
    assert out is not None and out["passed"] is True
