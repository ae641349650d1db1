"""Daily data-quality runner — parity with the reference's second DAG
(dags/data_quality_dag.py:27-92): load the raw customer CSV (skip
gracefully when absent), run the V1-V8 validation job, compute the drift
report in the reference's exact key shape, and return the combined dict.

Spark-first notes: one CSV scan feeds BOTH the validation aggregate and
the drift aggregate (two wide agg jobs over the same lazy scan — the
reference makes two pandas passes as well); nothing is collected beyond
the per-column aggregate rows. ``quality_schedule`` wires the runner into
the O4/O5 control plane with the reference's cadence and retry policy
(daily 06:00 UTC, retries=1, delay 2 min — data_quality_dag.py:20-24,72).
"""

from __future__ import annotations

import os
from datetime import timedelta

from pyspark.sql import SparkSession

from airflow_ml_pipeline_spark import schemas
from airflow_ml_pipeline_spark.operators.validate import (
    drift_profile,
    validate_data,
)
from airflow_ml_pipeline_spark.plans.schedule import (
    RetryPolicy,
    ScheduledPipeline,
)
from airflow_ml_pipeline_spark.sources.catalog import read_csv


def run_quality_check(spark: SparkSession, config: dict) -> dict:
    """Reference contract (data_quality_dag.py:27-64): returns
    ``{"status": "skipped", "reason": "no data file"}`` when the raw file
    is absent; otherwise the validation dict (raising ValueError on
    failed critical checks, same as V1-V8) with a ``"drift"`` key holding
    ``{col: {mean, std, null_pct}}`` per configured numeric column plus a
    top-level ``churn_rate`` with the same extreme-imbalance warning
    bounds."""
    raw_path = config["data"]["raw_data_path"]
    if not os.path.exists(raw_path):
        return {"status": "skipped", "reason": "no data file"}

    df = read_csv(spark, raw_path, schemas.CUSTOMERS)
    results = validate_data(df)

    numeric = [c for c in config["features"]["numerical"] if c in df.columns]
    profile = drift_profile(df, numeric, target="churn")
    drift: dict = {
        col: {
            "mean": stats["mean"],
            "std": stats["std"],
            "null_pct": stats["null_fraction"],
        }
        for col, stats in profile["columns"].items()
    }
    if "target_rate" in profile:
        drift["churn_rate"] = profile["target_rate"]
        drift["imbalance_warning"] = profile["imbalance_warning"]
    results["drift"] = drift
    return results


def quality_schedule(spark: SparkSession, config: dict) -> ScheduledPipeline:
    """The data-quality DAG's cadence + retry policy on the O4/O5 control
    plane: daily at 06:00, retries=1 with a 2-minute delay."""
    return ScheduledPipeline(
        cron="0 6 * * *",
        policy=RetryPolicy(retries=1, retry_delay=timedelta(minutes=2)),
        runner=lambda: run_quality_check(spark, config),
    )
